package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of (backward) join: for every left row, the single most
  * recent right row with an equal key and right order-tuple ≤ the
  * left row's order-tuple; unmatched left rows null-pad (left-outer).
  *
  * This is the whole-operator tier of the as-of family. The library
  * also ships the tagged-union composition ([[graft.ops.AsofJoin]]),
  * which already plans one shuffle — what the native operator removes
  * is the union overhead: the window carry evaluates a running
  * `last(ignoreNulls)` per payload column over left+right rows
  * together and then filters half of them back out, while this exec
  * merges the two sorted sides in one forward pass holding exactly
  * ONE buffered right row. Same exchange count, no union
  * materialization, no per-payload window state — and the output
  * carries the whole right row at once.
  *
  * Ordering is lexicographic over `leftOrder`/`rightOrder` (append a
  * unique sequence column for deterministic ties, mirroring the
  * `seq` knob of the compositional operator). Null keys group and
  * match like any other key value, exactly as the window
  * formulation's `partitionBy` does.
  */
case class AsofJoinNode(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftOrder: Seq[Expression], rightOrder: Seq[Expression],
                        left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching non-empty key lists")
  require(leftOrder.length == rightOrder.length && leftOrder.nonEmpty,
    "as-of join needs matching non-empty order lists")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsofJoinNode =
    copy(left = l, right = r)
}

/** Physical as-of join: both sides clustered on their keys (the
  * planner inserts ONE hash exchange per side — the same pair a
  * sort-merge join would need) and sorted within partitions on
  * (keys, order). The merge walks the left side once; the right
  * cursor only ever moves forward, holding one candidate row — so
  * per-partition memory is O(1) regardless of key size, where a
  * window formulation buffers each key's frame. At 100 TB both
  * sides stream; nothing is ever collected per key.
  */
case class AsofJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftOrder: Seq[Expression], rightOrder: Seq[Expression],
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftOrder).map(SortOrder(_, Ascending)),
    (rightKeys ++ rightOrder).map(SortOrder(_, Ascending)))

  // left rows pass through in their sorted order, on their partitioning
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lOrd = leftOrder; val rOrd = rightOrder
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lOrdProj = UnsafeProjection.create(lOrd, lOutput)
      val rOrdProj = UnsafeProjection.create(rOrd, rOutput)
      val keyCmp = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val ordCmp = RowOrdering.createNaturalAscendingOrdering(lOrd.map(_.dataType))
      val nullRight = new GenericInternalRow(rOutput.length)
      val joined = new JoinedRow
      // bind against a nullable view of the right schema: BindReferences
      // takes nullability from the INPUT attribute, and unmatched left
      // rows feed nulls through right columns declared non-nullable
      val outProj = UnsafeProjection.create(outAttrs,
        lOutput ++ rOutput.map(_.withNullability(true)))
      val rBuf = rIter.buffered
      // the latest right row consumed so far, and the key it belongs to
      var best: InternalRow = null
      var bestKey: UnsafeRow = null
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lOrdRow = lOrdProj(lRow)
        var scan = true
        while (scan && rBuf.hasNext) {
          val rKey = rKeyProj(rBuf.head)
          val c = keyCmp.compare(rKey, lKey)
          if (c < 0) { rBuf.next(); () } // right side behind this key: discard
          else if (c == 0 && ordCmp.compare(rOrdProj(rBuf.head), lOrdRow) <= 0) {
            best = rBuf.next().copy() // newer right row still ≤ left: adopt
            bestKey = lKey.copy()
          } else scan = false // right side ahead: stop for this left row
        }
        val matched = bestKey != null && keyCmp.compare(bestKey, lKey) == 0
        outProj(joined(lRow, if (matched) best else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsofJoinExec =
    copy(left = l, right = r)
}

object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(lk, rk, lo, ro, l, r) =>
      AsofJoinExec(lk, rk, lo, ro, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API for the native as-of join. The right frame's
  * columns all appear in the output (null-padded when unmatched) —
  * rename them before the join if they collide with left names.
  */
object AsofNative {
  /** @param keys  (leftCol, rightCol) equality pairs
    * @param order (leftCol, rightCol) lexicographic as-of tuple —
    *              append a unique id pair for deterministic ties
    */
  def join(left: DataFrame, right: DataFrame,
           keys: Seq[(String, String)], order: Seq[(String, String)]): DataFrame = {
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"rename the right side first — both sides have: ${shared.mkString(", ")}")
    val spark = left.sparkSession
    val l = GraftBridge.analyzed(left)
    val r = GraftBridge.analyzed(right)
    def resolve(plan: LogicalPlan, side: String)(n: String): Expression =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n on the $side side"))
    GraftBridge.ofRows(spark, AsofJoinNode(
      keys.map(k => resolve(l, "left")(k._1)), keys.map(k => resolve(r, "right")(k._2)),
      order.map(o => resolve(l, "left")(o._1)), order.map(o => resolve(r, "right")(o._2)),
      l, r))
  }
}
