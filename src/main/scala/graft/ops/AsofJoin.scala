package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (backward) join: for every left row, carry the most
  * recent right row with the same key and `rightTs <= leftTs`.
  *
  * Spark has no native as-of join; the naive formulations are a
  * range join (quadratic blow-up between dense keys) or a
  * per-left-row subquery. This is the tagged-union shape: union both
  * sides tagged, and a running `last(ignoreNulls)` over the per-key
  * (ts, tag) order carries the latest right payload into each left
  * row — ONE shuffle on the key, one in-partition sort, output
  * linear in |left|. That plan survives 100 TB, which is why the
  * library ships this composition instead of a custom physical
  * operator (`q18_asof_join` is this shape specialized; see its
  * snapshot in plans/).
  *
  * Ties match (`rightTs == leftTs` is visible), mirroring `<=`:
  * right rows order before left rows at an equal timestamp via the
  * side tag.
  *
  * @param payload right columns to carry, as (rightColumn → outputName);
  *                unmatched left rows get nulls (left-outer semantics)
  * @param seq optional (leftSeq, rightSeq) tiebreak pair for equal
  *            timestamps — a shared total order (e.g. an event id);
  *            without it, right rows win ties via the side tag
  */
object AsofJoin {

  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           payload: Map[String, String],
           seq: Option[(String, String)] = None): DataFrame = {
    require(payload.nonEmpty, "carry at least one right column")
    val pTypes = payload.map { case (from, to) => to -> right.schema(from).dataType }
    val rightSide = right.select(
      Seq(col(key), col(rightTs).as("__ts"),
        seq.map(s => col(s._2)).getOrElse(lit(0)).as("__tie")) ++
        payload.map { case (from, to) => col(from).as(s"__p_$to") }: _*)
      .withColumn("__side", lit(0))
    val leftSide = payload.values.foldLeft(
        left.withColumn("__ts", col(leftTs))
          .withColumn("__tie", seq.map(s => col(s._1)).getOrElse(lit(1)))
          .withColumn("__side", lit(1))) {
      (df, to) => df.withColumn(s"__p_$to", lit(null).cast(pTypes(to)))
    }
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payload.values.foldLeft(
        rightSide.unionByName(leftSide, allowMissingColumns = true)) {
      (df, to) => df.withColumn(to, last(col(s"__p_$to"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++ payload.values.toSeq.sorted.map(col): _*)
  }
}
// (With `seq`, both sides share one total (ts, seq) order, so `<=`
// means "at or before my (ts, seq)" exactly as a sorted-merge as-of
// would define it; the __side tag only breaks ties when no seq is
// given.)
