package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming embedding-quality monitors — the live twins of the
  * batch audits in [[graft.sim.Similarity]]. The state story mirrors
  * the packed-model convention: per-label running moments are
  * |labels| × d doubles, a bounded model no matter how long the
  * stream runs, so no watermark eviction is needed for boundedness.
  */
object EmbeddingStreams {

  /** Streaming twin of [[graft.sim.Similarity.assignKmeans]] — LIVE
    * CLUSTER ROUTING on a SERVED model: every arriving embedding is
    * assigned to its nearest centroid of a fitted (usually
    * [[graft.sim.Similarity.loadIndexPart]]-loaded) k-means/IVF
    * model. The assignment is a stateless per-row projection against
    * the 1-row packed broadcast model, so it is streaming-legal by
    * construction (no state, no watermark) and the spec pins
    * stream-emitted ≡ batch-assigned row for row. This is the ingest
    * shape of clustering-based curation at 100 TB: the model is
    * published once by the fit job; the router only scans. Model
    * refresh is the anomalyStream contract — restart the query on
    * the new version, out-of-band.
    */
  def clusterRouteStream(vectors: DataFrame,
                         centroids: DataFrame): DataFrame =
    graft.sim.Similarity.assignKmeans(vectors, centroids)

  /** Per-label running centroid state: count + per-dimension sums. */
  case class LabelCentroid(n: Long, sums: Seq[Double])

  /** One drift emission: the label's vectors-so-far and its current
    * centroid's distance to the reference. */
  case class LabelDriftEmit(label: Int, n_vecs: Long, centroid_dist: Double)

  /** Streaming twin of [[graft.sim.Similarity.labelDrift]]'s
    * centroid-wander half: per-label running (count, sum-vector)
    * state updates with every arriving vector, and each micro-batch
    * emits the label's CURRENT centroid distance to a reference
    * centroid — the live "did shard/encoder X drift" alarm, where
    * the reference is fitted batch-side and swapped out-of-band
    * (exactly [[EventStreams.anomalyStream]]'s model-refresh
    * contract). The distance replays the batch kernel's arithmetic:
    * float-cast centroid, float-cast reference, double accumulation
    * in dimension order — so a stream that has seen the same rows as
    * a batch reports the same 6dp distance modulo the float cast's
    * absorption of summation-order ulps.
    *
    * Malformed input: a vector whose dimensionality differs from the
    * reference's is DROPPED (not accumulated) — one bad row must not
    * kill a long-running monitor with an IndexOutOfBounds mid-state,
    * and silently padding/truncating would corrupt the centroid the
    * alarm thresholds on. Dropped rows don't advance `n_vecs`, so a
    * dimension-drifting upstream shows up as a stalled count.
    */
  def labelDriftState(vectors: DataFrame, reference: Seq[Double])
                     (implicit spark: SparkSession): Dataset[LabelDriftEmit] = {
    import spark.implicits._
    val ref = reference.map(_.toFloat).toArray
    vectors.select(col("label"), col("embedding"))
      .as[(Int, Seq[Float])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (label: Int, rows: Iterator[(Int, Seq[Float])],
         state: GroupState[LabelCentroid]) =>
          val st = state.getOption
            .getOrElse(LabelCentroid(0L, Seq.fill(ref.length)(0.0)))
          val sums = st.sums.toArray
          var n = st.n
          rows.foreach { case (_, emb) =>
            // dimension guard: accumulate only reference-shaped rows
            if (emb.length == ref.length) {
              var j = 0
              while (j < sums.length) { sums(j) += emb(j).toDouble; j += 1 }
              n += 1
            }
          }
          state.update(LabelCentroid(n, sums.toSeq))
          if (n == 0L) Iterator.empty // nothing valid yet — no centroid
          else {
            var s = 0.0
            var j = 0
            while (j < sums.length) {
              val d = (sums(j) / n).toFloat.toDouble - ref(j).toDouble
              s += d * d; j += 1
            }
            Iterator.single(LabelDriftEmit(label, n,
              BigDecimal(math.sqrt(s))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          }
      }
  }
}
