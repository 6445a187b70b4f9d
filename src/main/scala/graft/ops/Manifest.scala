package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level statistics manifest + manifest-driven scan pruning —
  * the Iceberg/Delta data-skipping pattern re-expressed on plain
  * parquet directories.
  *
  * Parquet row-group stats prune *after* a file is opened; at 100 TB
  * the win that matters is never opening the file at all. A manifest
  * is a tiny table (one row per data file: row count + min/max per
  * tracked column) that the planner consults *before* the scan: a
  * range predicate keeps only the files whose [min,max] interval
  * intersects it. With a layout that clusters the tracked columns
  * ([[Layout.writeZOrdered]], `repartitionByRange` + sort), file
  * intervals are narrow and disjoint, and a selective predicate reads
  * a handful of files out of tens of thousands.
  *
  * Scale posture: the manifest is O(files) — ~100k rows for 100 TB of
  * 1 GB files — so filtering it and collecting the surviving paths on
  * the driver is exactly the planning step every table format performs;
  * the pruning filter runs distributed only in the degenerate sense
  * that it is a Catalyst plan over a broadcast-sized frame. Manifests
  * are published through [[VersionedStore]] (atomic rename, immutable
  * `v=N` versions), so a reader never sees a half-written manifest and
  * a recomputation of the same version is a no-op.
  */
object Manifest {

  val VersionPrefix = "v="

  private def minCol(c: String) = s"min_$c"
  private def maxCol(c: String) = s"max_$c"
  private def bloomCol(c: String) = s"bloom_$c"

  /** The per-file stats aggregation — one definition for the full
    * build and the incremental update's fresh-files branch. */
  private def statsOf(df: DataFrame, statsCols: Seq[String]): DataFrame = {
    require(statsCols.nonEmpty, "at least one stats column")
    val aggs = Seq(count(lit(1)).as("n_rows"),
      first(col("__fsize")).as("file_bytes")) ++
      statsCols.flatMap(c =>
        Seq(min(col(c)).as(minCol(c)), max(col(c)).as(maxCol(c))))
    df.select(col("_metadata.file_path").as("file_path") +:
        col("_metadata.file_size").as("__fsize") +:
        statsCols.map(col): _*)
      .groupBy("file_path")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** One row per data file under `dataDir`: `file_path`, `n_rows`,
    * `file_bytes`, and `min_<c>`/`max_<c>` for each tracked column.
    * One distributed scan of the tracked columns (column-pruned: the
    * scan reads only `statsCols`); the `_metadata.file_path` grouping
    * key is Spark's public hidden file-metadata column, so no
    * per-file driver loop touches the filesystem. In production this
    * runs incrementally on the files a write just produced, not the
    * whole table.
    */
  def build(spark: SparkSession, dataDir: String,
            statsCols: Seq[String]): DataFrame =
    statsOf(spark.read.parquet(dataDir), statsCols)

  /** Build and publish the manifest as the next immutable version
    * under `manifestDir` (atomic-rename commit, lost races are
    * no-ops). Returns the published version number.
    */
  def write(spark: SparkSession, dataDir: String, manifestDir: String,
            statsCols: Seq[String]): Long = {
    val next = VersionedStore.listVersions(spark, manifestDir, VersionPrefix)
      .foldLeft(0L)(math.max) + 1
    VersionedStore.commit(spark, manifestDir, s"$VersionPrefix$next") {
      staging =>
        build(spark, dataDir, statsCols)
          .coalesce(1) // O(files) rows — a manifest is one small file
          .write.parquet(staging.toString)
    }
    next
  }

  /** The latest committed manifest, if any. */
  def load(spark: SparkSession, manifestDir: String): Option[DataFrame] =
    VersionedStore.listVersions(spark, manifestDir, VersionPrefix)
      .sorted.lastOption
      .map(n => spark.read.parquet(s"$manifestDir/$VersionPrefix$n"))

  /** Incremental maintenance: stat only the files NOT yet in the
    * latest manifest and publish their stats unioned with it — the
    * per-write upkeep a 100 TB table actually pays (one scan of the
    * NEW files; the old manifest is read as the tiny table it is,
    * never the data under it). Data files are immutable once written
    * (every writer here publishes by atomic rename), so old rows
    * never go stale; a deleted/compacted file's row is dropped
    * because pruning only ever ADMITS files, and admitting a dead
    * path would fail the read — callers that rewrite data run the
    * full [[write]] instead. Returns the published version (the
    * current one when no new files exist — idempotent upkeep).
    */
  /** Canonical URI form: `_metadata.file_path` says `file:/x` where
    * `inputFiles` says `file:///x` — same file, different spelling.
    */
  private def canon(p: String): String =
    new org.apache.hadoop.fs.Path(p).toString

  def update(spark: SparkSession, dataDir: String, manifestDir: String,
             statsCols: Seq[String]): Long =
    updateWith(spark, dataDir, manifestDir)(statsOf(_, statsCols))

  /** [[update]] for a bloom-indexed manifest: the fresh files get the
    * same stats + `bloom_<c>` schema as [[buildWithBloom]], so the
    * incremental union stays schema-compatible (a plain [[update]]
    * against a bloom manifest fails loudly on the column mismatch —
    * the tracked-column set is fixed per manifest dir).
    */
  def updateWithBloom(spark: SparkSession, dataDir: String,
                      manifestDir: String, statsCols: Seq[String],
                      bloomCols: Seq[String],
                      expectedPerFile: Long = 100000L,
                      fpp: Double = 0.03): Long =
    updateWith(spark, dataDir, manifestDir)(
      bloomStatsOf(_, statsCols, bloomCols, expectedPerFile, fpp))

  /** The shared incremental-upkeep choreography: diff the data dir's
    * files against the latest manifest, stat ONLY the new ones with
    * `stats`, publish the union as the next version. */
  private def updateWith(spark: SparkSession, dataDir: String,
                         manifestDir: String)
                        (stats: DataFrame => DataFrame): Long = {
    val current = load(spark, manifestDir)
    val versions = VersionedStore.listVersions(spark, manifestDir, VersionPrefix)
    val known: Set[String] = current match {
      case Some(m) => m.select("file_path").collect()
        .map(r => canon(r.getString(0))).toSet
      case None => Set.empty
    }
    val newFiles = spark.read.parquet(dataDir).inputFiles
      .filterNot(f => known(canon(f))).toSeq.sorted
    if (newFiles.isEmpty && current.isDefined)
      return versions.max
    val fresh =
      if (newFiles.isEmpty) stats(spark.read.parquet(dataDir))
      else stats(spark.read.parquet(newFiles: _*))
    val next = versions.foldLeft(0L)(math.max) + 1
    VersionedStore.commit(spark, manifestDir, s"$VersionPrefix$next") {
      staging =>
        // allowMissingColumns: a manifest published before a schema
        // widening (e.g. pre-file_bytes versions) upkeeps instead of
        // bricking — its old rows carry nulls for the new columns,
        // and size-dependent consumers ([[compactionPlan]]) skip
        // null-sized rows until a full [[write]] refreshes them
        current.map(_.unionByName(fresh, allowMissingColumns = true))
          .getOrElse(fresh)
          .coalesce(1)
          .write.parquet(staging.toString)
    }
    next
  }

  /** Paths of the files whose `[min_c, max_c]` interval intersects
    * `[lo, hi]` — the candidate set for a `c BETWEEN lo AND hi`
    * predicate. Files whose stats are null (every row null in `c`)
    * are dropped: a null cell can never satisfy a range predicate.
    */
  def pruneFiles(manifest: DataFrame, c: String,
                 lo: Any, hi: Any): Seq[String] =
    manifest
      .filter(col(maxCol(c)) >= lit(lo) && col(minCol(c)) <= lit(hi))
      .select("file_path")
      .collect().map(_.getString(0)).toSeq.sorted

  /** Exact equivalent of
    * `spark.read.parquet(dataDir).where(col(c).between(lo, hi))`
    * that opens only the files the manifest admits. The residual
    * predicate is still applied (file intervals overlap the range;
    * individual rows may not), so results are identical to the full
    * scan by construction. An empty candidate set still returns the
    * correct (empty) frame with the table schema — the footer-only
    * degenerate read.
    */
  def readPruned(spark: SparkSession, dataDir: String, manifest: DataFrame,
                 c: String, lo: Any, hi: Any): DataFrame = {
    val files = pruneFiles(manifest, c, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(dataDir).where(lit(false))
      else spark.read.parquet(files: _*)
    base.where(col(c).between(lit(lo), lit(hi)))
  }

  /** Small-file compaction plan off the manifest alone — never
    * listing or opening a data file. Directory-per-batch sinks
    * (AppendSink, StateTable versions) accumulate files far below
    * the ~1 GB scan-efficient size; this bins the under-threshold
    * files into contiguous byte-budgeted rewrite jobs (prefix-sum
    * bucketing over the deterministic path order — the shardPlan
    * discipline), each job one bounded-input `spark.read(files)
    * .write` task. Files already at or above `smallBytes` are left
    * alone (rewriting them buys nothing); a single file never splits
    * across jobs, so a job can exceed the budget only by the final
    * file's tail — bounded by `smallBytes`, not by corpus skew.
    * Output: one row per job (job id, file count, total bytes,
    * path range) — the work order a maintenance fleet executes.
    * Rows with a null `file_bytes` (a manifest version written
    * before sizes were tracked) are skipped; run a full [[write]]
    * to refresh them.
    */
  /** Per-small-file job assignment — ONE definition shared by the
    * plan report and the executing [[compact]], so the work order a
    * fleet prints and the rewrite it runs can never disagree. */
  private def jobsOf(manifest: DataFrame, smallBytes: Long,
                     budgetBytes: Long): DataFrame = {
    require(smallBytes > 0 && budgetBytes >= smallBytes,
      s"need 0 < smallBytes ($smallBytes) <= budgetBytes ($budgetBytes)")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("file_path")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    manifest
      .filter(col("file_bytes") < smallBytes)
      .select(col("file_path"), col("file_bytes"), col("n_rows"))
      // the window runs over the SMALL-FILE manifest subset — an
      // O(files) planning table, not data (the one place a global
      // ordered window is the right tool)
      .withColumn("prior", coalesce(sum("file_bytes").over(w), lit(0L)))
      .withColumn("job", (col("prior") / budgetBytes).cast("long"))
  }

  def compactionPlan(manifest: DataFrame, smallBytes: Long,
                     budgetBytes: Long): DataFrame =
    jobsOf(manifest, smallBytes, budgetBytes)
      .groupBy("job")
      .agg(count(lit(1)).as("n_files"),
        sum("file_bytes").as("total_bytes"),
        sum("n_rows").as("n_rows"),
        min("file_path").as("first_file"),
        max("file_path").as("last_file"))

  /** EXECUTE a [[compactionPlan]]: rewrite each job's small files as
    * ONE parquet file committed under `outDir/job<K>` through the
    * VersionedStore atomic rename — a crashed or replayed job is a
    * no-op, and a reader never sees a partial rewrite. Healthy files
    * are never touched or copied: the compacted table is (original
    * minus the subsumed small files) ∪ the job outputs, and the
    * returned frame records exactly that mapping (one row per job:
    * the file list it subsumed, the path it wrote, rows moved).
    *
    * The per-job loop is driver-side over the PLAN table — O(jobs),
    * bounded by `small-file bytes / budgetBytes`, the table a
    * maintenance fleet shards across workers — while each job's
    * read+rewrite is a distributed scan of just its files. Nothing
    * here rescans the healthy bulk of the table.
    */
  def compact(spark: SparkSession, manifest: DataFrame, outDir: String,
              smallBytes: Long, budgetBytes: Long): DataFrame = {
    import spark.implicits._
    val jobs = jobsOf(manifest, smallBytes, budgetBytes)
      .groupBy("job").agg(collect_list(col("file_path")).as("files"))
      .collect() // O(jobs) — the plan table, never data
    val done = jobs.toSeq.map { r =>
      val job = r.getAs[Long]("job")
      val files = r.getAs[scala.collection.Seq[String]]("files").toSeq.sorted
      VersionedStore.commit(spark, outDir, s"job$job") { staging =>
        spark.read.parquet(files: _*).coalesce(1)
          .write.parquet(staging.toString)
      }
      (job, files, files.size.toLong, s"$outDir/job$job")
    }
    done.toDF("job", "subsumed_files", "n_files", "out_path")
  }

  // ------------------------------------------------------------------
  // Per-file bloom index: point-lookup pruning where min/max can't.
  //
  // Range stats prune when the layout CLUSTERS the column; a point
  // lookup on an unclustered high-cardinality key (doc_id in an
  // arrival-ordered corpus, user_id in an event log) intersects every
  // file's [min,max] and the manifest admits everything. A per-file
  // bloom over xxhash64(key) closes that gap: ~1 byte per row of
  // manifest instead of opening the file — at 3% fpp a needle query
  // opens the one true file plus ~3% of the rest, vs 100% with range
  // stats alone. The bits are Spark's own OR-merged sketch
  // (order-independent ⇒ deterministic), and false positives only ADD
  // candidate files — the residual predicate keeps the read exact.
  // ------------------------------------------------------------------

  /** [[build]] plus a `bloom_<c>` column per `bloomCols` entry: the
    * file's bloom filter over `xxhash64(c)`. `expectedPerFile` sizes
    * the bits (manifest grows ~`-rows·ln(fpp)/ln²2` bits per file —
    * the sizing lever between manifest weight and fpp).
    */
  def buildWithBloom(spark: SparkSession, dataDir: String,
                     statsCols: Seq[String], bloomCols: Seq[String],
                     expectedPerFile: Long = 100000L,
                     fpp: Double = 0.03): DataFrame =
    bloomStatsOf(spark.read.parquet(dataDir), statsCols, bloomCols,
      expectedPerFile, fpp)

  /** [[statsOf]] plus the bloom columns — shared by the full build
    * and the incremental update's fresh-files branch. */
  private def bloomStatsOf(df: DataFrame, statsCols: Seq[String],
                           bloomCols: Seq[String], expectedPerFile: Long,
                           fpp: Double): DataFrame = {
    require(statsCols.nonEmpty, "at least one stats column")
    require(bloomCols.nonEmpty, "at least one bloom column")
    // the same build construction as BloomPrefilter.keyBloom — the
    // hash convention and sizing MUST stay bit-identical with the
    // driver-side pointHash probe, so the coupling is structural
    val aggs = (Seq(count(lit(1)).as("n_rows"),
      first(col("__fsize")).as("file_bytes")) ++
      statsCols.flatMap(c =>
        Seq(min(col(c)).as(minCol(c)), max(col(c)).as(maxCol(c))))) ++
      bloomCols.map(c =>
        BloomPrefilter.bloomAgg(col(c), expectedPerFile, fpp).as(bloomCol(c)))
    df.select(col("_metadata.file_path").as("file_path") +:
        col("_metadata.file_size").as("__fsize") +:
        (statsCols ++ bloomCols).distinct.map(col): _*)
      .groupBy("file_path")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Driver-side mirror of the executor hash: `value` cast to the
    * column's type, then the same seed-42 xxhash64 the bloom was
    * built over.
    */
  private def pointHash(value: Any,
                        dt: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, XxHash64}
    XxHash64(Seq(Cast(Literal(value), dt)), 42L)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Long]
  }

  /** The admitted-files frame behind [[pruneFilesPoint]]: manifest
    * rows whose `bloom_<c>` might contain the pre-hashed needle,
    * projected to `file_path` ONLY. The membership test runs
    * in-cluster as a filter over the manifest frame (the same shape
    * [[pruneFiles]] uses for range stats) — the bloom bytes are
    * deserialized and probed where the manifest rows live, and only
    * the admitted paths ever reach the driver. The driver-side
    * alternative (collect every row's bloom, probe locally) pulls
    * O(files) × ~KB of sketch bytes per needle query — hundreds of
    * MB of driver heap at millions of files — for a test that is a
    * pure per-row predicate.
    */
  private[graft] def pointCandidates(manifest: DataFrame, c: String,
                                     h: Long): DataFrame = {
    val probe = udf((bytes: Array[Byte]) =>
      bytes != null && org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bytes))
        .mightContainLong(h))
    manifest.filter(probe(col(bloomCol(c)))).select("file_path")
  }

  /** Files whose `bloom_<c>` might contain `value` (typed `dt`, the
    * data column's type — hashing an INT literal against a BIGINT
    * column's bloom would silently admit nothing). The manifest is
    * the O(files) planning table and this membership walk IS the
    * planning step — but only the ADMITTED `file_path`s are
    * collected; the bloom bytes stay in-cluster (see
    * [[pointCandidates]]). Null blooms (all-null files) are
    * dropped: a null cell never equals a point value.
    */
  def pruneFilesPoint(manifest: DataFrame, c: String, value: Any,
                      dt: org.apache.spark.sql.types.DataType): Seq[String] =
    pointCandidates(manifest, c, pointHash(value, dt))
      .collect().map(_.getString(0)).toSeq.sorted

  /** Exact equivalent of
    * `spark.read.parquet(dataDir).where(col(c) === value)` that opens
    * only the files whose bloom admits the value — the needle query
    * over an unclustered key. False positives are removed by the
    * residual equality predicate; false negatives cannot happen, so
    * the result is identical to the full scan by construction.
    */
  def readPoint(spark: SparkSession, dataDir: String, manifest: DataFrame,
                c: String, value: Any,
                dtHint: Option[org.apache.spark.sql.types.DataType] = None)
      : DataFrame = {
    // a caller that knows the column type passes it and skips the
    // footer/listing pass a schema inference costs on a large dir
    val dt = dtHint.getOrElse(spark.read.parquet(dataDir).schema(c).dataType)
    val files = pruneFilesPoint(manifest, c, value, dt)
    val base =
      if (files.isEmpty) spark.read.parquet(dataDir).where(lit(false))
      else spark.read.parquet(files: _*)
    base.where(col(c) === lit(value))
  }
}
