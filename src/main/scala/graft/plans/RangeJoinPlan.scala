package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native KEYED trailing range join: every (left, right) pair with
  * equal keys and `rightTime ∈ (leftTime − window, leftTime]` —
  * inner pairs, exactly the `in_window=true` rows of the banded
  * composition ([[graft.ops.RangeJoin]]) when a key is present;
  * `leftOuter` additionally emits one null-padded row for each left
  * row whose window is empty (the banded operator's left-outer
  * convention, without the in_window bookkeeping).
  *
  * This generalizes [[AsofJoinExec]]'s forward merge from "one
  * buffered right row" to "a sliding deque of the in-window right
  * rows": both sides cluster on their keys and sort on (keys, time),
  * the right cursor only moves forward, and rows are evicted from
  * the deque's head the moment they age past the window. Per-
  * partition memory is bounded by the densest single window — a
  * data-rate constant — never by partition or key size. Versus the
  * banded equi-join, there is no ≤2× probe fan-out, no post-filter,
  * and no in_window bookkeeping; versus Spark's own planning of the
  * same predicate (a sort-merge join on keys with a buffered right
  * GROUP), the deque never materializes a whole key's frame.
  *
  * The KEYLESS case stays on the banded composition by design:
  * without a key, scaling out requires duplicating boundary rows
  * across time shards, and that duplication is a logical transform
  * (the band explode) — no physical distribution can express it.
  *
  * Time columns must be long microseconds. Null times never match
  * (null left times emit nothing, null right times are discarded);
  * null KEYS group and match like ordinary values, as in the window
  * formulations.
  */
case class RangeJoinNode(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                         leftTime: Expression, rightTime: Expression,
                         windowMicros: Long, leftOuter: Boolean,
                         left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "range join needs matching non-empty key lists (use RangeJoin.trailingCandidates for keyless)")
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "range join times must be long microseconds")
  require(windowMicros > 0, "window must be positive")
  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true)) else right.output)
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): RangeJoinNode =
    copy(left = l, right = r)
}

case class RangeJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                         leftTime: Expression, rightTime: Expression,
                         windowMicros: Long, leftOuter: Boolean,
                         left: SparkPlan, right: SparkPlan) extends BinaryExecNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val W = windowMicros
    val outer = leftOuter
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOutput)
      val keyCmp = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOutput.length)
      // bind against a nullable right view: unmatched left rows feed
      // nulls through right columns declared non-nullable
      val outProj = UnsafeProjection.create(outAttrs,
        lOutput ++ rOutput.map(_.withNullability(true)))
      val rBuf = rIter.buffered
      // in-window right rows of the current key, times ascending
      val window = new scala.collection.mutable.ArrayDeque[(Long, InternalRow)]
      var winKey: UnsafeRow = null
      lIter.flatMap { lRow =>
        val lt = lTimeProj(lRow)
        // a null left time matches nothing, but in outer mode the left
        // row itself still survives (the banded operator keeps it too)
        if (lt.isNullAt(0)) {
          if (outer) Iterator.single(outProj(joined(lRow, nullRight)))
          else Iterator.empty
        } else {
          val ltv = lt.getLong(0)
          val lKey = lKeyProj(lRow)
          if (winKey == null || keyCmp.compare(winKey, lKey) != 0) {
            window.clear()
            winKey = lKey.copy()
          }
          var scan = true
          while (scan && rBuf.hasNext) {
            val c = keyCmp.compare(rKeyProj(rBuf.head), lKey)
            if (c < 0) { rBuf.next(); () } // right side behind this key
            else if (c == 0) {
              val rt = rTimeProj(rBuf.head)
              if (rt.isNullAt(0)) { rBuf.next(); () } // null time never matches
              else if (rt.getLong(0) <= ltv)
                window.append((rt.getLong(0), rBuf.next().copy()))
              else scan = false // right side ahead in time
            } else scan = false // right side ahead in key
          }
          while (window.nonEmpty && window.head._1 <= ltv - W) window.removeHead()
          if (window.isEmpty && outer) Iterator.single(outProj(joined(lRow, nullRight)))
          else window.iterator.map { case (_, rRow) => outProj(joined(lRow, rRow)) }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): RangeJoinExec =
    copy(left = l, right = r)
}

object RangeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinNode(lk, rk, lt, rt, w, lo, l, r) =>
      RangeJoinExec(lk, rk, lt, rt, w, lo, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API for the native keyed range join. All right
  * columns appear in the output — rename collisions away first.
  */
object RangeNative {
  /** @param keys (leftCol, rightCol) equality pairs
    * @param time (leftCol, rightCol) long-microsecond time pair; the
    *             match window is `(leftTime − windowMicros, leftTime]`
    */
  def join(left: DataFrame, right: DataFrame,
           keys: Seq[(String, String)], time: (String, String),
           windowMicros: Long, leftOuter: Boolean = false): DataFrame = {
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"rename the right side first — both sides have: ${shared.mkString(", ")}")
    val spark = left.sparkSession
    val l = GraftBridge.analyzed(left)
    val r = GraftBridge.analyzed(right)
    def resolve(plan: LogicalPlan, side: String)(n: String): Expression =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n on the $side side"))
    GraftBridge.ofRows(spark, RangeJoinNode(
      keys.map(k => resolve(l, "left")(k._1)), keys.map(k => resolve(r, "right")(k._2)),
      resolve(l, "left")(time._1), resolve(r, "right")(time._2),
      windowMicros, leftOuter, l, r))
  }
}
