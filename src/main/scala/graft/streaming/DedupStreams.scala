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

  /** LIVE keeper-model INGEST GATE — the [[nearDupCandidates]]
    * guard's served-model sibling, and the streaming consumer of the
    * persisted [[graft.dedup.Dedup.KeeperModel]] (saveKeepers →
    * loadKeepers — the lmGateStream/temperatureGateStream refresh
    * contract applied to dedup): every arriving doc bands with the
    * SAME fused signature expression as the batch pipeline, at the
    * loaded model's own (k, bands), and probes the model's
    * materialized band index by a stream-static equi-join — a
    * collision routes the doc to its candidate keeper CLUSTER
    * (`keep_doc_id` rides the join through the label frame), feeding
    * quarantine / exact-verify / the nightly
    * [[graft.dedup.Dedup.mergeKeepers]] reconciliation; a clean doc
    * emits nothing (candidates-only, the nearDupCandidates
    * discipline — absence IS the clean verdict, and the conservative
    * failure mode is a false candidate that verification discards).
    * Fully STATELESS: no state store, restarts free, exact under
    * at-least-once replay (output is a pure function of (model,
    * doc)); the static side is the model's skinny banded×label
    * frame, sharded by the band equi-key — never texts, never
    * all-pairs. Collisions against different base docs of one
    * cluster emit per (band, base doc): the fan-out is bounded by
    * the banding bucket sizes exactly as the batch candidate stage
    * is.
    */
  def keeperGateStream(docs: DataFrame,
                       model: graft.dedup.Dedup.KeeperModel): DataFrame = {
    val bandIndex = model.banded
      .join(model.labels, Seq("doc_id"))
      .select(col("band").as("b"), col("band_hash").as("h"),
        col("doc_id").as("base_doc_id"), col("keep_doc_id"))
    Dedup.bandedSignatures(docs, model.k, model.bands)
      .join(bandIndex,
        col("band") === col("b") && col("band_hash") === col("h"))
      .select(col("doc_id"), col("band"), col("base_doc_id"),
        col("keep_doc_id"))
  }
}
