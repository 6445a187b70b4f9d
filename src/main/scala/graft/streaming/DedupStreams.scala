package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.Dedup

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
  *  - each arriving doc is shingled and MinHash-banded by
  *    [[graft.dedup.Dedup.bandedSignatures]] — literally the batch
  *    pipeline's banding (one definition, so the two paths cannot
  *    drift), so a stream collision is exactly a batch bucket
  *    collision and candidates need no re-derivation when the
  *    nightly batch job reconciles;
  *  - state keys are (band, band_hash mod `buckets`) SUPERBUCKETS —
  *    a BOUNDED key domain (the raw band-hash domain is unbounded,
  *    so keying state by it would grow one state row per distinct
  *    bucket forever) — and each superbucket holds at most
  *    `capacity` (band_hash, doc_id) entries under FIFO eviction:
  *    total state ≤ bands × buckets × capacity entries no matter the
  *    stream length, the [[EventStreams.heavyHittersState]]
  *    bounded-state discipline. Candidates still require the FULL
  *    band hash to match — sharding changes where state lives, never
  *    which pairs collide;
  *  - emissions are CANDIDATES, not verdicts: the exact-Jaccard
  *    verify needs both texts and belongs downstream (join candidates
  *    back to a doc store, or feed [[graft.dedup.Dedup.mergeKeepers]]
  *    which re-verifies its delta candidates anyway). This mirrors
  *    the batch split between banding and verification.
  *
  * Within a superbucket's capacity, the emitted candidate set ⊇ the
  * batch pipeline's verified pairs over the same corpus (banding is
  * identical, and verification only removes pairs) — spec-pinned on
  * a replayed corpus. Sizing: `buckets × capacity` should comfortably
  * exceed the dedup horizon (how far back ingest should still pair) —
  * beyond it, FIFO eviction degrades to recent-window detection and
  * the nightly [[graft.dedup.Dedup.mergeKeepers]] pass remains the
  * backstop for the tail.
  */
object DedupStreams {

  def nearDupCandidates(docs: DataFrame, k: Int = 64, bands: Int = 16,
                        buckets: Int = 1024, capacity: Int = 256)
                       (implicit spark: SparkSession): Dataset[NearDupCandidate] = {
    require(buckets > 0 && capacity > 0,
      s"buckets ($buckets) and capacity ($capacity) must be positive")
    import spark.implicits._
    Dedup.bandedSignatures(docs, k, bands)
      .select(col("band"), pmod(col("band_hash"), lit(buckets)).as("bucket"),
        col("band_hash"), col("doc_id"))
      .as[(Int, Long, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        foldBucket(capacity))
  }

  private def foldBucket(capacity: Int)(
      key: (Int, Long), rows: Iterator[(Int, Long, Long, Long)],
      state: GroupState[Seq[(Long, Long)]]): Iterator[NearDupCandidate] = {
    val seen = scala.collection.mutable.ArrayDeque.from(
      state.getOption.getOrElse(Seq.empty))
    val present = scala.collection.mutable.HashSet.from(seen)
    val out = Seq.newBuilder[NearDupCandidate]
    // sorted fold: partition iterators arrive in shuffle order, and
    // both the emitted pair set under eviction and the retained ids
    // depend on insertion order — sorting makes them run-stable (the
    // heavyHittersState determinism discipline)
    rows.map(r => (r._3, r._4)).toSeq.distinct.sorted.foreach {
      case e @ (hash, d) =>
        if (!present(e)) {
          seen.foreach { case (oHash, o) =>
            // collision needs the FULL band hash, not just the shard
            if (oHash == hash && o != d)
              out += NearDupCandidate(math.min(d, o), math.max(d, o), key._1)
          }
          seen.append(e); present.add(e)
          if (seen.size > capacity) present.remove(seen.removeHead())
        }
    }
    state.update(seen.toSeq)
    out.result().iterator
  }
}
