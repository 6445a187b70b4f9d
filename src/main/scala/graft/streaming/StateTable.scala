package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.cdc.Changelog

/** Versioned parquet state table fed by a streaming changelog — the
  * "save the enriched document back into MapR-DB" half of the
  * reference's loop (README.md:24-28), without a mutable store:
  * every micro-batch merges its last-writer-wins summary into the
  * previous snapshot and writes a new `v=<batchId>` directory (a
  * mini-LSM; readers always see a complete consistent version).
  * Tombstones are retained in the table (consumers filter on
  * `last_op`), so a delete followed by a re-insert replays correctly.
  *
  * Replay safety: batch N always merges into the highest version
  * strictly below N — if the sink wrote `v=N` but the checkpoint
  * commit failed, the re-run rebuilds `v=N` from the same base
  * instead of double-counting its own output. Versions are published
  * by atomic rename of a hidden staging directory, so a concurrent
  * reader can never list a half-written snapshot.
  */
object StateTable {

  private val VersionPrefix = "v="
  private val ZPrefix = "z="

  // commit discipline (cluster-FS ops, per-attempt staging, atomic
  // publish, numeric-only discovery) is the shared
  // [[graft.ops.VersionedStore]] — one definition across every
  // versioned artifact in the repo
  import graft.ops.VersionedStore.{commit, fsOf, listVersions, vacuumStaging}

  private def versions(spark: SparkSession, dir: String): Seq[Long] =
    listVersions(spark, dir, VersionPrefix)

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).maxOption

  /** Highest committed version strictly below `maxExclusive` — the
    * replay-safe merge base for micro-batch `maxExclusive`.
    */
  private[streaming] def versionBefore(spark: SparkSession, dir: String,
                                       maxExclusive: Long): Option[Long] =
    versions(spark, dir).filter(_ < maxExclusive).maxOption

  private def emptySnapshot(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id STRING, last_seq BIGINT, last_op STRING, " +
          "last_field STRING, last_payload STRING, n_changes BIGINT"))

  private def readVersion(spark: SparkSession, dir: String, v: Option[Long]): DataFrame =
    v match {
      // prefer the Z-ordered rewrite when one exists for exactly this
      // version — content-identical, just clustered for data skipping.
      // One existence probe, not a directory listing: this runs once
      // per micro-batch inside commitBatch, and an O(versions) LIST
      // per read adds up on object-store-backed state dirs
      case Some(n) if {
        val (fs, root) = fsOf(spark, dir)
        fs.exists(new org.apache.hadoop.fs.Path(root, s"$ZPrefix$n"))
      } => spark.read.parquet(s"$dir/$ZPrefix$n")
      case Some(n) => spark.read.parquet(s"$dir/$VersionPrefix$n")
      case None    => emptySnapshot(spark)
    }

  /** Current snapshot (tombstones included); empty frame if none. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir, latestVersion(spark, dir))

  /** ANTI-ENTROPY digest of the table's LIVE rows (tombstones out,
    * matching [[Changelog.latestState]]'s live view) — the same
    * commutative [[Changelog.digestOfState]] the batch replay
    * produces, so "did the streaming materialization converge to the
    * batch answer" is a comparison of two |op-classes|-row frames:
    * equal digests ⇔ byte-equal state, no row shipping, any shard
    * order. The check the reference's save-back loop never had.
    */
  def digest(spark: SparkSession, dir: String): DataFrame =
    Changelog.digestOfState(
      read(spark, dir).filter(col("last_op") =!= Changelog.Delete))

  /** Time travel: the complete state as of a PAST micro-batch —
    * versions are immutable, so yesterday's snapshot is still exactly
    * yesterday's snapshot (debugging a bad merge, reproducing a
    * downstream job's input, auditing what a consumer saw). None when
    * `version` was never committed or vacuum reclaimed it; reads the
    * Z-ordered rewrite when one exists for exactly that version
    * (content-identical, just clustered).
    */
  def readAt(spark: SparkSession, dir: String,
             version: Long): Option[DataFrame] =
    if (versions(spark, dir).contains(version))
      Some(readVersion(spark, dir, Some(version)))
    else None

  /** Live documents of the current snapshot. */
  def readLive(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir).filter(col("last_op") =!= Changelog.Delete)

  private def summarize(batch: DataFrame): DataFrame =
    batch.groupBy("doc_id")
      .agg(max("seq").as("last_seq"),
        max_by(col("op"), col("seq")).as("last_op"),
        max_by(col("field_path"), col("seq")).as("last_field"),
        max_by(col("payload"), col("seq")).as("last_payload"),
        count(lit(1)).as("n_changes"))

  /** Merge a batch summary into the previous snapshot: later seq
    * wins field-wise, change counts accumulate.
    */
  private[streaming] def merge(prev: DataFrame, update: DataFrame): DataFrame = {
    val p = prev.select(col("doc_id"), col("last_seq").as("p_seq"),
      col("last_op").as("p_op"), col("last_field").as("p_field"),
      col("last_payload").as("p_payload"), col("n_changes").as("p_n"))
    val u = update.select(col("doc_id"), col("last_seq").as("u_seq"),
      col("last_op").as("u_op"), col("last_field").as("u_field"),
      col("last_payload").as("u_payload"), col("n_changes").as("u_n"))
    p.join(u, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        greatest(col("p_seq"), col("u_seq")).as("last_seq"),
        when(col("u_seq").isNull || col("p_seq") > col("u_seq"), col("p_op"))
          .otherwise(col("u_op")).as("last_op"),
        when(col("u_seq").isNull || col("p_seq") > col("u_seq"), col("p_field"))
          .otherwise(col("u_field")).as("last_field"),
        when(col("u_seq").isNull || col("p_seq") > col("u_seq"), col("p_payload"))
          .otherwise(col("u_payload")).as("last_payload"),
        (coalesce(col("p_n"), lit(0L)) + coalesce(col("u_n"), lit(0L))).as("n_changes"))
  }

  /** Idempotent merge-and-publish of one micro-batch (also usable
    * directly from a caller-owned `foreachBatch`).
    */
  def commitBatch(batch: DataFrame, batchId: Long, stateDir: String): Unit = {
    val spark = batch.sparkSession
    // replay after the publish but before the checkpoint commit: an
    // existing v=batchId IS the complete, deterministic recomputation
    // of this batch (same merge base — versions below batchId are
    // immutable), so commit() skipping it is correct. Never
    // un-publish: deleting would open a window where a concurrent
    // reader sees the version vanish.
    commit(spark, stateDir, s"$VersionPrefix$batchId") { staging =>
      val prev = readVersion(spark, stateDir,
        versionBefore(spark, stateDir, batchId))
      // the full-outer merge leaves the result hash-partitioned on
      // doc_id — written as-is (no coalesce: snapshot writes must
      // scale with the corpus, not a single writer)
      merge(prev, summarize(batch))
        .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    }: Unit
  }

  /** Z-order OPTIMIZE of the current snapshot: rewrite the latest
    * version clustered along a Morton curve over (`c1`, `c2`) so
    * point/range reads prune files in both dimensions. Published
    * under `z=<version>` by atomic rename — a parallel namespace, so
    * it can NEVER collide with a future micro-batch's `v=<batchId>`
    * (publishing it as a higher v would either shadow later batches
    * or be silently skipped by replay detection). Readers prefer
    * `z=N` only while `N` is still the latest version; once the
    * stream publishes `v=N+1`, the rewrite goes stale and is
    * reclaimed by [[vacuum]]. Returns the optimized version.
    */
  def optimize(spark: SparkSession, dir: String, c1: String, c2: String,
               numFiles: Int): Option[Long] =
    latestVersion(spark, dir).map { n =>
      commit(spark, dir, s"$ZPrefix$n") { staging =>
        graft.ops.Layout.writeZOrdered(
          spark.read.parquet(s"$dir/$VersionPrefix$n"), c1, c2,
          staging.toString, numFiles)
      }
      n
    }

  /** Reclaim history: drop snapshot versions older than the newest
    * `keep` (vacuum keeps at least the latest) and any Z-rewrite of a
    * dropped or superseded version. Safe under the merge protocol —
    * batch N only ever reads the highest version below N, which
    * vacuum always retains.
    */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 1): Unit = {
    val (fs, root) = fsOf(spark, dir)
    val vs = versions(spark, dir).sorted.reverse
    val kept = vs.take(math.max(keep, 1)).toSet
    vs.filterNot(kept).foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"$VersionPrefix$n"),
        true): Unit)
    val latest = vs.headOption
    listVersions(spark, dir, ZPrefix).filterNot(latest.contains).foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"$ZPrefix$n"),
        true): Unit)
    // crashed attempts' orphaned staging dirs: nothing else deletes
    // them (publish only removes its own), so reclaim by age here
    vacuumStaging(spark, dir)
  }

  /** Attach the compaction sink to a changelog stream. */
  def compactionSink(cl: Dataset[ChangeRecord], stateDir: String,
                     checkpointDir: String): StreamingQuery =
    cl.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[ChangeRecord], batchId: Long) =>
        commitBatch(batch.toDF(), batchId, stateDir)
      }
      .start()
}
