package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, RepartitionByExpression, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native per-key top-k: the whole-operator tier of the engine's
  * custom-operator ladder (expression → typed aggregate → logical +
  * physical plan). Where the window formulation sorts every row of
  * every key and then filters on rank, this operator keeps a bounded
  * k-heap per key — O(n log k) with O(keys·k) memory — and never
  * materializes a rank column.
  *
  * The planner requires the child clustered on the key, so the only
  * shuffle is the same hash exchange the window would need; at 100 TB
  * the saving is the per-partition full sort. Registered via
  * [[graft.GraftExtensions]] (`injectPlannerStrategy`); correctness
  * is oracle-checked against the window formulation (`q8_topn_group`)
  * which shares its DuckDB oracle.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Physical per-key top-k. Planned in two levels like an aggregate:
  * a `partial` instance runs map-side on whatever partitioning the
  * child has (bounding the exchange to ≤ k rows per key per input
  * partition — the difference between shuffling a 100 TB fact table
  * and shuffling k·|keys| rows), then the final instance heaps the
  * survivors after the hash exchange. Correct because top-k of a
  * union is the top-k of per-part top-k's.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: SparkPlan, partial: Boolean = false)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) UnspecifiedDistribution else ClusteredDistribution(keys)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val schema = child.output
    val keyExprs = keys
    val sortOrder = order
    val keyCap = if (partial) TopKPerKeyExec.PartialMaxKeys else Int.MaxValue
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ordering = RowOrdering.create(sortOrder, schema)
      // heap head = currently-worst retained row (reverse ordering)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      // Streaming pass: rows whose key can't get a heap (partial pass
      // over near-unique keys would otherwise pin the whole split in
      // memory) are emitted immediately — forwarding extra rows is
      // always sound, the post-exchange final instance re-filters.
      val passThrough: Iterator[InternalRow] = iter.filter { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null && heaps.size() < keyCap) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap == null) true // cap reached for a new key: forward as-is
        else {
          if (heap.size < kLocal) heap.add(row.copy())
          else if (ordering.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.add(row.copy())
          }
          false
        }
      }
      def drain(): Iterator[InternalRow] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        heaps.values.forEach { h =>
          val rows = new Array[InternalRow](h.size)
          var i = rows.length - 1
          while (i >= 0) { rows(i) = h.poll(); i -= 1 } // drain worst-first
          out ++= rows
        }
        out.iterator
      }
      passThrough ++ drain()
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Optimizer rule (the `injectOptimizerRule` tier): a user
  * `repartition(keys)` directly under a TopKPerKey on the same keys
  * is redundant — the exec's required distribution inserts its own
  * exchange, so the plan would shuffle twice. Collapse it.
  */
object CollapseRepartitionIntoTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case t @ TopKPerKey(keys, _, _,
        r @ RepartitionByExpression(exprs, child, optNumPartitions, _))
        // an explicit repartition(n, keys) is a tuning knob the user
        // chose — only collapse the count-less form, whose sole effect
        // is the distribution the exec's own exchange already provides
        if optNumPartitions.isEmpty &&
          exprs.length == keys.length &&
          exprs.map(_.canonicalized) == keys.map(_.canonicalized) =>
      t.copy(child = child)
  }
}

object TopKPerKeyExec {
  /** Per-partition distinct-key budget of the partial pass: above
    * this, new keys stream through un-heaped (memory stays bounded at
    * cap·k rows regardless of key cardinality).
    */
  val PartialMaxKeys: Int = 1 << 17
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyExec(keys, order, k, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API for the native operator. */
object TopK {
  /** Top `k` rows per distinct `keys` combination, ranked by
    * `orderBy` (use `.desc`/`.asc` Columns; append a unique
    * tie-breaker for determinism).
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column],
             k: Int): DataFrame = {
    val spark = df.sparkSession
    val analyzed = GraftBridge.analyzed(df)
    val attrByName = analyzed.output.map(a => a.name -> a).toMap
    val keys = keyCols.map(n => attrByName.getOrElse(n,
      throw new IllegalArgumentException(s"no column $n")): Expression)
    val order = orderBy.map(GraftBridge.expression).map {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    GraftBridge.ofRows(spark, TopKPerKey(keys, order, k, analyzed))
  }
}
