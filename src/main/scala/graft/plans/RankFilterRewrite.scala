package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous top-N-per-group idiom
  *
  *   `filter(row_number() OVER (PARTITION BY k ORDER BY o) <= n)`
  *
  * to run on the native bounded-heap [[TopKPerKey]] operator. The
  * window formulation fully sorts every key's rows before the rank
  * filter throws almost all of them away — at 100 TB that is a
  * whole-corpus per-partition sort for a k·|keys| answer. The
  * rewrite inserts `TopKPerKey(keys, order, n)` UNDER the window:
  * the two-level heap pass bounds the exchange to ≤ n rows per key
  * per input partition, and the original window + filter then rank
  * the ≤ n·|keys| survivors — same output column set (the rank
  * column survives for downstream use), same rows, and the window's
  * clustering requirement is already satisfied by the operator's
  * exchange, so the only residual per-task sort is over each key's
  * ≤ n rows. Users of the plain DataFrame/SQL idiom get the native
  * operator without knowing it exists.
  *
  * Semantics note: like the operator itself (and like SQL), rows
  * TIED under a non-total `ORDER BY` are interchangeable — the heap
  * may retain different tied rows than the full sort would. Queries
  * wanting bit-stable survivors order by a unique tie-breaker,
  * which every oracle-checked query here does.
  *
  * Fires only on the exact safe shape:
  *   - the window computes EXACTLY ONE expression, a bare
  *     `row_number()` (any other window function needs the full
  *     partition, and a shared Window node must not lose rows);
  *   - PARTITION BY and ORDER BY are both non-empty (a global
  *     top-n has no clustering key for the operator);
  *   - one filter conjunct bounds the rank attribute from above by
  *     a positive integer literal ≤ [[RewriteRankFilterToTopK.MaxK]]
  *     (heaps of a million rows per key stop being an optimization);
  *     remaining conjuncts must not reference the rank;
  *   - the child is not already a [[TopKPerKey]] (fixed-point
  *     batches re-run the rule; the guard makes it idempotent).
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] with PredicateHelper {

  /** Rank bounds above this stay on the window path. */
  val MaxK: Int = 4096

  /** Integral widths for the widening-cast check. Non-integral
    * types are absent: a cast to/from them never strips. */
  private val intWidth: Map[org.apache.spark.sql.types.DataType, Int] = {
    import org.apache.spark.sql.types._
    Map(ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
  }

  /** Only WIDENING integral casts are transparent. A narrowing cast
    * (`CAST(rn AS SMALLINT) <= 3S`, or a wrapped narrow literal)
    * that survived constant folding can change the comparison's
    * value set under non-ANSI wrap semantics — treating it as a
    * plain bound would let TopKPerKey(k) drop high ranks the
    * original filter admits. Unreachable from normal type coercion
    * (comparisons widen), so this is edge-hardening only.
    */
  private def widening(c: Cast): Boolean =
    intWidth.get(c.dataType).exists(w =>
      intWidth.get(c.child.dataType).exists(_ <= w))

  private def intLit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Short, _) => Some(v.toLong)
    case c @ Cast(inner, _, _, _) if widening(c) => intLit(inner)
    case _ => None
  }

  private def stripCast(e: Expression): Expression = e match {
    case c @ Cast(inner, _, _, _) if widening(c) => stripCast(inner)
    case other => other
  }

  /** The upper bound `k` this conjunct places on the rank attribute
    * (`rank <= 3` → 3, `rank < 3` → 2, `5 >= rank` → 5, `rank = 3`
    * → 3 — equality still only needs the top 3 retained).
    */
  private def boundK(e: Expression, rn: Attribute): Option[Long] = e match {
    case LessThanOrEqual(l, r) if stripCast(l).semanticEquals(rn) => intLit(r)
    case LessThan(l, r) if stripCast(l).semanticEquals(rn) =>
      intLit(r).map(_ - 1)
    case GreaterThanOrEqual(l, r) if stripCast(r).semanticEquals(rn) =>
      intLit(l)
    case GreaterThan(l, r) if stripCast(r).semanticEquals(rn) =>
      intLit(l).map(_ - 1)
    case EqualTo(l, r) if stripCast(l).semanticEquals(rn) => intLit(r)
    case EqualTo(l, r) if stripCast(r).semanticEquals(rn) => intLit(l)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window)
        if w.windowExpressions.length == 1 &&
          w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty &&
          !w.child.isInstanceOf[TopKPerKey] =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(_: RowNumber, _), _) =>
          val rn = alias.toAttribute
          val conjuncts = splitConjunctivePredicates(cond)
          val ks = conjuncts.flatMap(boundK(_, rn))
          val others = conjuncts.filter(boundK(_, rn).isEmpty)
          if (ks.nonEmpty && ks.min >= 1 && ks.min <= MaxK &&
              others.forall(!_.references.contains(rn))) {
            val topk = TopKPerKey(w.partitionSpec, w.orderSpec,
              ks.min.toInt, w.child)
            Filter(cond, w.withNewChildren(Seq(topk)).asInstanceOf[Window])
          } else f
        case _ => f
      }
  }
}
