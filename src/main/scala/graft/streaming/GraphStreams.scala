package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{Graph, VersionedStore}

/** Live graph maintenance on the PERSISTED component-label table —
  * the serving-lifecycle loop `graph_components_delta` runs in batch,
  * driven by a stream: each micro-batch of edges merges into the
  * published labels through the EXACT quotient merge
  * ([[Graph.mergeComponentLabels]] — components of the quotient of
  * base-components by delta edges ARE the components of the union,
  * so the folded stream lands bit-where the one-shot fit lands), and
  * every batch publishes a NEW immutable version of the label table
  * through the shared [[VersionedStore]] atomic-rename commit.
  *
  * Exactly-once on disk without any stream state: the version number
  * is `batchId + 1`, so the version chain mirrors the source's batch
  * chain — a replayed batch recomputes a DETERMINISTIC label table
  * (its base, version `batchId`, is immutable and the merge is a
  * pure function) and its publish hits the skip-existing commit as a
  * no-op; a crash between publish and checkpoint replays into the
  * same no-op. Readers always see a complete version. Per batch the
  * work is delta-sized (the quotient graph) plus one corpus-sized
  * label rewrite — the copy-on-write cost every versioned table
  * pays; compaction of old versions is the StateTable `vacuum`
  * discipline.
  */
object GraphStreams {

  def componentMergeSink(edges: DataFrame, dir: String,
                         checkpoint: String): StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val merged =
          if (batchId == 0) Graph.componentLabels(batch)
          else Graph.mergeComponentLabels(
            Graph.loadLabels(spark, dir, Some(batchId)), batch)
        Graph.saveLabels(merged, dir, batchId + 1)
      }
      .start()

  /** The latest published label-table version under `dir` — what a
    * reader pins before an audit or a merge. */
  def latestVersion(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Option[Long] =
    VersionedStore.listVersions(spark, dir, "v=").maxOption
}
