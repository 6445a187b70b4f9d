package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.VersionedStore

/** Exactly-once parquet APPEND sink for routed message streams — the
  * publish half of the reference's consumer loop (each change record
  * routed to the fts/geo topics: FtsAndGeoServiceJSONWithCDC.java:
  * 95-188) with the delivery guarantee the raw loop lacks: a crash
  * between emitting output and committing the read offset must not
  * double-publish on replay.
  *
  * Structured Streaming's `foreachBatch` replays a micro-batch whose
  * checkpoint commit didn't land; a plain parquet append would then
  * write the batch twice. Here each micro-batch publishes as an
  * immutable `b=<batchId>` directory through [[VersionedStore]]
  * (per-attempt staging, atomic rename): the batch id is stable
  * across replays and the content is a deterministic function of the
  * replayed offsets, so an already-published id makes the replay a
  * no-op — at-least-once delivery from the checkpoint plus idempotent
  * publish = exactly-once on disk. Readers union the committed
  * directories and never see a partial batch.
  *
  * Scale posture: each batch writes with the stream's own partitioning
  * (no coalesce — sink throughput scales with the cluster); the
  * directory-per-batch layout accumulates small files exactly like the
  * state table's versions, and the same maintenance answer applies
  * (periodic compaction published under a parallel namespace, the
  * [[StateTable.optimize]] discipline). Batch ids are monotone, so a
  * time/size-based retention walk is a prefix drop.
  */
object AppendSink {

  val BatchPrefix = "b="

  /** Idempotent publish of one micro-batch (usable directly from a
    * caller-owned `foreachBatch`). Returns true when this call
    * published, false when `batchId` already existed (a replay or a
    * lost race — both no-ops by design).
    */
  def commitBatch(batch: DataFrame, batchId: Long, dir: String): Boolean =
    VersionedStore.commit(batch.sparkSession, dir, s"$BatchPrefix$batchId") {
      staging =>
        batch.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    }

  /** Committed batch ids, ascending. */
  def batches(spark: SparkSession, dir: String): Seq[Long] =
    VersionedStore.listVersions(spark, dir, BatchPrefix).sorted

  /** Everything published so far (no partial batches, no staging
    * dirs); None before the first commit — the schema lives in the
    * data, so an empty topic has nothing to describe.
    */
  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val bs = batches(spark, dir)
    if (bs.isEmpty) None
    // basePath anchors partition discovery at the topic root: batch
    // dirs surface as a `b` provenance column, and nested partition
    // layouts (the sharded sink) resolve against ONE root instead of
    // conflicting per-batch roots
    else Some(spark.read.option("basePath", dir)
      .parquet(bs.map(b => s"$dir/$BatchPrefix$b"): _*))
  }

  /** Attach the sink to a streaming frame. */
  def attach(route: DataFrame, dir: String,
             checkpointDir: String): StreamingQuery =
    route.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, batchId, dir): Unit
      }
      .start()

  /** [[attach]] plus per-batch [[graft.ops.Manifest]] upkeep: after
    * each publish the manifest stats exactly the files the batch just
    * added (the incremental path — one scan of the new files), so the
    * topic is range-prunable the moment a batch lands. A replayed
    * batch publishes nothing and the manifest update no-ops; manifest
    * upkeep after a crash BETWEEN publish and update simply catches
    * up on the next batch (update diffs against what the manifest
    * already covers, not against batch ids). Note the directory-
    * per-batch layout reads back through partition discovery with a
    * `b` provenance column — harmless to stats on data columns.
    */
  def attachWithManifest(route: DataFrame, dir: String, manifestDir: String,
                         checkpointDir: String,
                         statsCols: Seq[String]): StreamingQuery =
    route.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, batchId, dir)
        graft.ops.Manifest.update(batch.sparkSession, dir, manifestDir,
          statsCols): Unit
      }
      .start()

  /** Idempotent publish of one micro-batch ROUTED INTO TRAINING
    * SHARDS: rows land under `b=<id>/shard=K` by
    * [[graft.ops.Sampling.shardId]] (the same pure md5 assignment as
    * the batch [[graft.ops.Layout.writeTrainingShards]] writer —
    * one definition, both paths), ordered within each shard by the
    * full key hash. The whole batch still publishes as ONE immutable
    * atomic rename, so replay/race semantics are unchanged — a
    * reader never sees some shards of a batch without the others.
    */
  def commitShardedBatch(batch: DataFrame, batchId: Long, dir: String,
                         key: String, nShards: Int): Boolean =
    VersionedStore.commit(batch.sparkSession, dir, s"$BatchPrefix$batchId") {
      staging =>
        graft.ops.Layout.shardLayout(batch, key, nShards)
          .write.partitionBy("shard").mode(SaveMode.Overwrite)
          .parquet(staging.toString)
    }

  /** The streaming twin of the batch training-shard writer: each
    * micro-batch exactly-once-appends into the sharded layout, so
    * the corpus is training-ready AS IT ARRIVES — no terminal
    * reshuffle job between ingestion and the first training epoch.
    */
  def attachSharded(route: DataFrame, dir: String, checkpointDir: String,
                    key: String, nShards: Int): StreamingQuery =
    route.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitShardedBatch(batch, batchId, dir, key, nShards): Unit
      }
      .start()

  /** One shard's rows across every committed batch (the trainer's
    * read path: worker K streams shard K). Batches that happened to
    * produce no rows for the shard are skipped; None when nothing
    * has landed for it yet.
    */
  def readShard(spark: SparkSession, dir: String, shard: Int): Option[DataFrame] = {
    val (fs, _) = VersionedStore.fsOf(spark, dir)
    val paths = batches(spark, dir)
      .map(b => s"$dir/$BatchPrefix$b/shard=$shard")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }
}
