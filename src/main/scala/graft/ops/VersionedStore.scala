package graft.ops

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Shared primitives for versioned on-disk artifacts (state-table
  * snapshots, keeper models, PCA models): immutable `<prefix>N`
  * directories published by atomic rename of a per-attempt staging
  * dir. One definition so every artifact store shares the same
  * commit discipline:
  *
  *  - all path ops go through the Hadoop FileSystem of the dir's
  *    scheme, never `java.io.File` — artifacts live on the CLUSTER
  *    filesystem, and driver-local path ops silently look at the
  *    wrong disk under a remote `fs.defaultFS`;
  *  - staging dirs carry a per-attempt UUID, so a zombie attempt and
  *    its retry can never interleave writes inside one staging dir;
  *    crashed attempts leave orphans that [[vacuumStaging]] reclaims
  *    by age;
  *  - the publish rename goes through `FileContext` with
  *    `Rename.NONE` semantics: renaming onto an existing target
  *    THROWS instead of nesting the staging dir inside it (plain
  *    `FileSystem.rename` into an existing directory silently moves
  *    the source INSIDE the target — a corpus-scale duplicate buried
  *    in an immutable version). A lost race against a concurrent
  *    writer of the same version is a success, because versions are
  *    deterministic recomputations. Directory rename is atomic on
  *    HDFS/local; object stores need a committer-backed variant —
  *    the standard caveat of every rename-based commit protocol;
  *  - version discovery accepts only `<prefix><digits>` — stray
  *    backup/temp directories are ignored, not tripped over.
  */
object VersionedStore {

  private val StagingMark = ".staging-"

  def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Committed versions under `dir` whose name is `<prefix><digits>`. */
  def listVersions(spark: SparkSession, dir: String,
                   prefix: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, dir)
    val re = ("^" + java.util.regex.Pattern.quote(prefix) + "(\\d+)$").r
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case re(n) => Some(n.toLong)
        case _     => None
      })
  }

  /** The full commit choreography, once: skip if `name` is already
    * published (immutable versions — a replay's recomputation is
    * byte-equivalent), else write the artifact into a fresh staging
    * dir via `write` and atomically publish it. Returns true when
    * this call published (false = already existed or lost the race).
    */
  def commit(spark: SparkSession, dir: String, name: String)
            (write: Path => Unit): Boolean = {
    val (fs, root) = fsOf(spark, dir)
    val target = new Path(root, name)
    if (fs.exists(target)) return false
    val staging = new Path(root,
      s"$StagingMark$name-${java.util.UUID.randomUUID()}")
    write(staging)
    val fc = FileContext.getFileContext(target.toUri,
      spark.sessionState.newHadoopConf())
    try {
      // Rename.NONE: existing target ⇒ FileAlreadyExistsException,
      // never a silent nest of staging inside the published version
      fc.rename(fs.makeQualified(staging), fs.makeQualified(target),
        Options.Rename.NONE)
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: java.nio.file.FileAlreadyExistsException =>
        fs.delete(staging, true): Unit // lost the race — content identical
        false
    }
  }

  /** Reclaim orphaned staging dirs older than `olderThanMs` (default
    * 24h) — the leftovers of crashed attempts, which nothing else
    * deletes (publish only removes its OWN staging, and version
    * vacuums only match version names). The age threshold keeps a
    * concurrent live attempt's staging safe; call from periodic
    * maintenance (e.g. the state table's vacuum).
    */
  def vacuumStaging(spark: SparkSession, dir: String,
                    olderThanMs: Long = 24L * 3600 * 1000): Unit = {
    val (fs, root) = fsOf(spark, dir)
    if (!fs.exists(root)) return
    val cutoff = System.currentTimeMillis() - olderThanMs
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(StagingMark)
        && s.getModificationTime < cutoff)
      .foreach(s => fs.delete(s.getPath, true): Unit)
  }
}
