package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless time-range joins via banding — the reusable form of the
  * q30 shape. Spark plans a pure inequality join as a nested-loop
  * cartesian; flooring both sides onto ⌊ts/W⌋ bands manufactures the
  * equi-key a hash join needs. A trailing window of width W can only
  * overlap TWO bands, so the left fan-out is bounded by 2 regardless
  * of data volume, and every shuffle key is a band id.
  */
object RangeJoin {

  /** Candidate pairs for a trailing window: each left row against the
    * right rows of its ≤2 overlapping bands, left-outer, with
    * `in_window` marking the rows that pass the EXACT predicate
    * `leftTs - windowMicros < rightTs <= leftTs`. Aggregate with
    * `sum(when(in_window, ...))` per left key to get left-outer
    * window stats (a left row with no in-window right rows still
    * contributes its group); filter on `in_window` for inner pairs.
    * NEVER `count(*)` over the raw result: the ≤2-band probe means a
    * left row can appear twice (second copy with `in_window=false`),
    * so only in_window-conditional aggregates are correct.
    *
    * The two frames must not share column names (rename first, as
    * with [[graft.plans.AsofNative]]); `leftTs`/`rightTs` are long
    * microsecond columns.
    */
  def trailingCandidates(left: DataFrame, right: DataFrame,
                         leftTs: String, rightTs: String,
                         windowMicros: Long): DataFrame = {
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"rename the right side first — both sides have: ${shared.mkString(", ")}")
    val W = windowMicros
    // floor division, not `div`: `div` truncates toward zero, so a
    // negative (pre-epoch) timestamp would band one too HIGH and the
    // probe could miss in-window right rows entirely
    def bandOf(ts: String) = expr(
      s"(($ts div ${W}L) - (case when $ts % ${W}L < 0 then 1 else 0 end))")
    val r = right.withColumn("__band", bandOf(rightTs))
    val l = left.withColumn("__band", explode(array_distinct(
      array(bandOf(s"($leftTs - ${W}L)"), bandOf(leftTs)))))
    l.join(r, Seq("__band"), "left_outer")
      .withColumn("in_window",
        col(rightTs) > col(leftTs) - W && col(rightTs) <= col(leftTs))
      .drop("__band")
  }
}
