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
    // ONE struct carries the whole payload row: a per-column
    // last(ignoreNulls) would mix values from different right rows
    // whenever the latest row has a null in one column (and resurrect
    // stale non-nulls over a genuine null) — the struct is non-null
    // exactly on right rows, so a single last(ignoreNulls) carries the
    // latest right ROW atomically, nulls in its fields included
    val fields = payload.toSeq.map { case (from, to) =>
      org.apache.spark.sql.types.StructField(to, right.schema(from).dataType)
    }
    val pType = org.apache.spark.sql.types.StructType(fields)
    val rightSide = right.select(
      col(key), col(rightTs).as("__ts"),
      seq.map(s => col(s._2)).getOrElse(lit(0)).as("__tie"),
      struct(payload.toSeq.map { case (from, to) => col(from).as(to) }: _*).as("__p"),
      lit(0).as("__side"))
    val leftSide = left.withColumn("__ts", col(leftTs))
      .withColumn("__tie", seq.map(s => col(s._1)).getOrElse(lit(1)))
      .withColumn("__p", lit(null).cast(pType))
      .withColumn("__side", lit(1))
    // __side last so equal (ts, seq) ties resolve right-before-left
    // deterministically in BOTH modes (without it, the seq path left
    // identical (ts, seq) pairs unordered)
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__tie"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rightSide.unionByName(leftSide, allowMissingColumns = true)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.values.toSeq.sorted.map(to => col(s"__c.$to").as(to)): _*)
  }
}
// (With `seq`, both sides share one total (ts, seq) order, so `<=`
// means "at or before my (ts, seq)" exactly as a sorted-merge as-of
// would define it; at fully-equal (ts, seq) the side tag still orders
// right rows first, keeping `<=` visible and the output deterministic.)
