package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.{explode, expr}
import org.apache.spark.sql.types.LongType

/** Native INTERVAL-OVERLAP join by distributed PLANE SWEEP — the
  * third temporal join made native (as-of: [[AsofJoinExec]]; trailing
  * range: [[RangeJoinExec]]; this: two SPANS intersecting). Emits
  * every (left, right) pair with equal band keys whose CLOSED
  * [s, e] spans overlap (`ls ≤ re && rs ≤ le` — touching endpoints
  * match, the sessionSpans convention), each pair EXACTLY ONCE.
  *
  * The banded hash-join composition ([[graft.ops.Events.coactivity]])
  * builds each band's ENTIRE interval set as a hash-join side and
  * post-filters candidate pairs, then `distinct`s away multi-band
  * duplicates. The sweep is strictly tighter on all three axes:
  * both sides cluster on the band and sort on (band, start), one
  * forward merge walks the two streams, and each arriving interval
  * pairs only with the OTHER side's currently-ACTIVE set (a min-end
  * heap, pruned the moment the sweep passes an interval's end).
  * Memory is the band's peak simultaneous-interval count — a
  * data-rate constant — never the band's population; no candidate
  * is ever produced and thrown away (every active partner at
  * arrival time IS an overlap: its start is ≤ ours by sort order
  * and its end survived the prune); and duplicates never exist:
  * a pair is emitted only in the band holding `max(ls, rs)` (the
  * arriving row's own start band — both partners provably span that
  * band, so exactly one shared band wins and no `distinct` runs).
  *
  * Banding (the explode in [[IntervalNative.join]]) stays a LOGICAL
  * transform for the same reason [[RangeJoinNode]] keeps the keyless
  * case banded: duplicating boundary-spanning rows across time
  * shards is row multiplication, which no physical distribution can
  * express. Spans must be long microseconds with start ≤ end; null
  * spans never match (inner semantics).
  */
case class IntervalJoinNode(leftBand: Expression, rightBand: Expression,
                            leftStart: Expression, leftEnd: Expression,
                            rightStart: Expression, rightEnd: Expression,
                            bandMicros: Long,
                            left: LogicalPlan, right: LogicalPlan)
    extends BinaryNode {
  require(Seq(leftBand, rightBand, leftStart, leftEnd, rightStart, rightEnd)
    .forall(_.dataType == LongType),
    "interval join bands and spans must be long microseconds")
  require(bandMicros > 0, "bandMicros must be positive")
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): IntervalJoinNode =
    copy(left = l, right = r)
}

case class IntervalJoinExec(leftBand: Expression, rightBand: Expression,
                            leftStart: Expression, leftEnd: Expression,
                            rightStart: Expression, rightEnd: Expression,
                            bandMicros: Long,
                            left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftBand)) ::
      ClusteredDistribution(Seq(rightBand)) :: Nil

  // sort by (band, start): the sweep's forward order
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftBand, Ascending), SortOrder(leftStart, Ascending)),
    Seq(SortOrder(rightBand, Ascending), SortOrder(rightStart, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lBand = leftBand; val rBand = rightBand
    val lS = leftStart; val lE = leftEnd
    val rS = rightStart; val rE = rightEnd
    val W = bandMicros
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lBandProj = UnsafeProjection.create(Seq(lBand), lOutput)
      val rBandProj = UnsafeProjection.create(Seq(rBand), rOutput)
      val lSpanProj = UnsafeProjection.create(Seq(lS, lE), lOutput)
      val rSpanProj = UnsafeProjection.create(Seq(rS, rE), rOutput)
      val bandCmp = RowOrdering.createNaturalAscendingOrdering(Seq(LongType))
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, lOutput ++ rOutput)
      val lBuf = lIter.buffered
      val rBuf = rIter.buffered
      // active sets: min-END heaps, pruned when the sweep passes an
      // interval's end — size is the band's peak concurrency
      case class Active(end: Long, row: InternalRow)
      val endMin = Ordering.by[Active, Long](_.end).reverse
      val actL = scala.collection.mutable.PriorityQueue.empty[Active](endMin)
      val actR = scala.collection.mutable.PriorityQueue.empty[Active](endMin)
      var curBand: UnsafeRow = null
      var curBandV = 0L
      val out = scala.collection.mutable.Queue.empty[InternalRow]

      // consume one input row from the side whose (band, start) head
      // is smaller, maintaining the sweep state and enqueuing any
      // emissions. Ties go left; correctness is tie-order-free (the
      // SECOND of two equal-start partners emits their pair).
      def step(): Unit = {
        val takeLeft =
          if (!rBuf.hasNext) true
          else if (!lBuf.hasNext) false
          else {
            val c = bandCmp.compare(lBandProj(lBuf.head), rBandProj(rBuf.head))
            if (c != 0) c < 0
            else {
              val ls = lSpanProj(lBuf.head)
              val rs = rSpanProj(rBuf.head)
              // null starts sort nowhere: consume and drop below
              if (ls.isNullAt(0)) true
              else if (rs.isNullAt(0)) false
              else ls.getLong(0) <= rs.getLong(0)
            }
          }
        val (bandRow, span) =
          if (takeLeft) (lBandProj(lBuf.head), lSpanProj(lBuf.head))
          else (rBandProj(rBuf.head), rSpanProj(rBuf.head))
        if (curBand == null || bandCmp.compare(curBand, bandRow) != 0) {
          actL.clear(); actR.clear()
          curBand = bandRow.copy()
          curBandV = bandRow.getLong(0)
        }
        if (span.isNullAt(0) || span.isNullAt(1)) {
          // null span never matches and never activates
          if (takeLeft) lBuf.next() else rBuf.next()
          ()
        } else {
          val s = span.getLong(0); val e = span.getLong(1)
          val partners = if (takeLeft) actR else actL
          while (partners.nonEmpty && partners.head.end < s) {
            partners.dequeue(); ()
          }
          // emit only in the band owning max(ls, rs) — which is this
          // arriving row's start (partners started at-or-before it):
          // both rows provably span that band (partner.end ≥ s by the
          // prune), so exactly one shared band emits each pair
          if (Math.floorDiv(s, W) == curBandV) {
            val row = if (takeLeft) lBuf.head else rBuf.head
            partners.foreach { p =>
              out.enqueue(outProj(
                if (takeLeft) joined(row, p.row)
                else joined(p.row, row)).copy())
            }
          }
          // drain this side's own dead entries too — the sweep is at
          // s, so end < s is dead for any future arrival on EITHER
          // side; pruning only on partner arrivals lets a one-sided
          // band grow the heap toward its population
          val mine = if (takeLeft) actL else actR
          while (mine.nonEmpty && mine.head.end < s) {
            mine.dequeue(); ()
          }
          mine.enqueue(Active(e, (if (takeLeft) lBuf.next() else rBuf.next()).copy()))
        }
      }

      new Iterator[InternalRow] {
        private def fill(): Unit =
          while (out.isEmpty && (lBuf.hasNext || rBuf.hasNext)) step()
        override def hasNext: Boolean = { fill(); out.nonEmpty }
        override def next(): InternalRow = { fill(); out.dequeue() }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): IntervalJoinExec =
    copy(left = l, right = r)
}

object IntervalStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinNode(lb, rb, ls, le, rs, re, w, l, r) =>
      IntervalJoinExec(lb, rb, ls, le, rs, re, w, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API: band both sides (floor division — `div`
  * truncates toward zero and would mis-band pre-epoch spans), then
  * plan the sweep. All right columns appear in the output — rename
  * collisions away first.
  */
object IntervalNative {
  /** @param leftSpan  (startCol, endCol) long-microsecond span, start ≤ end
    * @param rightSpan (startCol, endCol) likewise
    * @param bandMicros time-shard width: bounds per-task sweep state
    *                   by the band's peak concurrency; NEVER changes
    *                   the result
    */
  def join(left: DataFrame, right: DataFrame,
           leftSpan: (String, String), rightSpan: (String, String),
           bandMicros: Long): DataFrame = {
    require(bandMicros > 0, "bandMicros must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"rename the right side first — both sides have: ${shared.mkString(", ")}")
    def floorBand(c: String) =
      s"(($c div ${bandMicros}L) - (case when $c % ${bandMicros}L < 0 then 1 else 0 end))"
    def banded(df: DataFrame, span: (String, String), bc: String) =
      df.withColumn(bc, explode(expr(
        s"sequence(${floorBand(span._1)}, ${floorBand(span._2)})")))
    val l = GraftBridge.analyzed(banded(left, leftSpan, "__lband"))
    val r = GraftBridge.analyzed(banded(right, rightSpan, "__rband"))
    def resolve(plan: LogicalPlan)(n: String): Expression =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
    GraftBridge.ofRows(left.sparkSession, IntervalJoinNode(
      resolve(l)("__lband"), resolve(r)("__rband"),
      resolve(l)(leftSpan._1), resolve(l)(leftSpan._2),
      resolve(r)(rightSpan._1), resolve(r)(rightSpan._2),
      bandMicros, l, r))
      .drop("__lband").drop("__rband")
  }
}
