package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared constructs over MODEL-SIZED summary frames (bands, days,
  * bins — bounded by construction, never corpus-scale). One home for
  * the subtle shapes, per the RankSelect lesson: hand-rolled copies
  * of a subtle construct drift apart one edge case at a time.
  */
object ModelFrames {

  /** Exclusive prefix sum of `value` in `key` order, as a broadcast
    * inequality self-join — O(rows²) pairs on the bounded frame, so
    * it neither single-tasks the frame in a global window (the
    * PlanLint error shape) nor serializes anything at scale. Rows
    * with no predecessor answer 0.
    *
    * The input must be a MATERIALIZED summary frame (localCheckpoint
    * or equivalent) with DISTINCT keys (the natural shape of a
    * groupBy summary): both join sides read it, and an
    * unmaterialized corpus lineage would re-run twice.
    *
    * @param within optional grouping columns: the prefix restarts at
    *               0 inside each `within` group (a per-source band
    *               line), matched by equality in the self-join
    * @return one row per distinct (within..., key): (within..., key, off)
    */
  def exclusivePrefixSum(summary: DataFrame, key: String, value: String,
                         as: String = "off",
                         within: Seq[String] = Seq.empty): DataFrame = {
    val probe = summary.select((within :+ key :+ value).map(col): _*)
    val build = summary.select(
      within.map(c => col(c).as(s"_g_$c")) ++
        Seq(col(key).as("_pk"), col(value).as("_pv")): _*)
    val cond = within.foldLeft(col("_pk") < col(key)) {
      (acc, c) => acc && col(s"_g_$c") === col(c)
    }
    probe.join(broadcast(build), cond, "left")
      .groupBy((within :+ key).map(col): _*)
      .agg(coalesce(sum("_pv"), lit(0L)).as(as))
  }
}
