package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.Dedup
import graft.functions.expressions.minhash_bands

/** A near-dup candidate surfaced at ingest time: the arriving doc
  * collided with an already-seen doc in LSH band `band`. `doc_a` <
  * `doc_b` (the batch pipeline's pair orientation). */
case class NearDupCandidate(doc_a: Long, doc_b: Long, band: Int)

/** Streaming near-duplicate ingestion guard.
  *
  * Batch near-dup ([[graft.dedup.Dedup.minhashLsh]]) is complete, but
  * the reference's premise is stream processing — and template spam
  * arrives as a stream. `dropDuplicatesWithinWatermark` only catches
  * EXACT replays; this operator gives the ingest path the same LSH
  * candidate generation the batch pipeline uses, as keyed streaming
  * state:
  *
  *  - each arriving doc is shingled and MinHash-banded with the SAME
  *    fused Catalyst expression as the batch path (`minhash_bands`
  *    over `shingle_set`), so a stream collision is exactly a batch
  *    bucket collision — candidates need no re-derivation when the
  *    nightly batch job reconciles;
  *  - state is keyed by (band, band_hash) — the LSH bucket — and
  *    holds at most `capacity` doc ids per bucket (FIFO eviction), so
  *    TOTAL state is bounded by `capacity` × live buckets regardless
  *    of stream length, the [[EventStreams.heavyHittersState]]
  *    bounded-state discipline. A real deployment sizes `capacity` to
  *    the expected bucket occupancy (bucket sizes are the LSH design
  *    knob — a hot bucket means the banding is too coarse);
  *  - emissions are CANDIDATES, not verdicts: the exact-Jaccard
  *    verify needs both texts and belongs downstream (join candidates
  *    back to a doc store, or feed [[graft.dedup.Dedup.mergeKeepers]]
  *    which re-verifies its delta candidates anyway). This mirrors
  *    the batch split between banding and verification.
  *
  * Within a bucket's capacity, the emitted candidate set ⊇ the batch
  * pipeline's verified pairs over the same corpus (banding is
  * identical, and verification only removes pairs) — spec-pinned on
  * a replayed corpus.
  */
object DedupStreams {

  def nearDupCandidates(docs: DataFrame, k: Int = 64, bands: Int = 16,
                        capacity: Int = 256)
                       (implicit spark: SparkSession): Dataset[NearDupCandidate] = {
    require(k % bands == 0, "bands must divide k")
    require(capacity > 0, s"capacity ($capacity) must be positive")
    import spark.implicits._
    docs
      .select(col("doc_id"),
        posexplode(minhash_bands(Dedup.shingleArray(col("text")), k, bands)))
      .select(col("pos").as("band"), col("col").as("band_hash"), col("doc_id"))
      .as[(Int, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        foldBucket(capacity))
  }

  private def foldBucket(capacity: Int)(
      key: (Int, Long), rows: Iterator[(Int, Long, Long)],
      state: GroupState[Seq[Long]]): Iterator[NearDupCandidate] = {
    val seen = scala.collection.mutable.ArrayDeque.from(
      state.getOption.getOrElse(Seq.empty))
    val out = Seq.newBuilder[NearDupCandidate]
    // sorted fold: partition iterators arrive in shuffle order, and
    // both the emitted pair set under eviction and the retained ids
    // depend on insertion order — sorting makes them run-stable (the
    // heavyHittersState determinism discipline)
    rows.map(_._3).toSeq.distinct.sorted.foreach { d =>
      if (!seen.contains(d)) {
        seen.foreach { o =>
          out += NearDupCandidate(math.min(d, o), math.max(d, o), key._1)
        }
        seen.append(d)
        if (seen.size > capacity) seen.removeHead()
      }
    }
    state.update(seen.toSeq)
    out.result().iterator
  }
}
