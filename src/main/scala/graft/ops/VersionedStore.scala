package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
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
  *  - directory rename is atomic on HDFS/local (object stores need a
  *    committer-backed variant — the standard caveat of every
  *    rename-based commit protocol); a LOST rename race against a
  *    concurrent writer of the same immutable version is a success,
  *    because versions are deterministic recomputations;
  *  - version discovery accepts only `<prefix><digits>` — stray
  *    backup/temp directories are ignored, not tripped over.
  */
object VersionedStore {

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

  /** Fresh per-attempt staging path for version dir `name`. */
  def stagingFor(root: Path, name: String): Path =
    new Path(root, s".staging-$name-${java.util.UUID.randomUUID()}")

  /** Atomic publish of a fully-written staging dir: one rename wins;
    * a lost race against a concurrent writer of the same immutable
    * version is a success, any other rename failure raises. */
  def publish(fs: FileSystem, staging: Path, target: Path): Unit =
    if (!fs.rename(staging, target)) {
      val lost = fs.exists(target)
      fs.delete(staging, true): Unit
      if (!lost)
        throw new java.io.IOException(s"cannot publish $staging -> $target")
    }
}
