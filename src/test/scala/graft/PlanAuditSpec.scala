package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.cdc.Changelog
import graft.ops.Relational
import graft.text.TextAnalysis

/** Assertions over executed plans: the properties that make these
  * operators survive a 100 TB input are pinned here so a regression
  * (lost pushdown, a forked scan, an accidental cartesian) fails a
  * spec instead of silently shipping.
  */
class PlanAuditSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def executed(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  // node-level count (AQE's toString prints initial AND final plans,
  // so string counting double-counts)
  private def countScans(df: DataFrame): Int = {
    df.collect()
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.size
  }

  private def countIn(plan: String, token: String): Int =
    plan.linesIterator.count(_.contains(token))

  test("q1 pushes the date filter into the parquet scan and prunes columns") {
    val plan = executed(Relational.q1Agg(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown:\n$plan")
    // 6 referenced columns of lineitem's 11 reach the reader
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_partkey") && !read.contains("l_suppkey"), read)
  }

  test("multijoin broadcasts and never falls back to cartesian shapes") {
    val plan = executed(Relational.q3MultiJoin(spark, sf))
    assert(countIn(plan, "BroadcastHashJoin") >= 1)
    assert(countIn(plan, "CartesianProduct") == 0)
    assert(countIn(plan, "BroadcastNestedLoopJoin") == 0)
  }

  test("field-state reads the changelog exactly once") {
    val cl = Changelog.fromEvents(Tables.events(spark, sf))
    assert(countScans(Changelog.fieldState(cl)) == 1)
  }

  test("range window is one scan and shuffles only on the partition key") {
    val df = Relational.q19RangeWindow(spark, sf)
    assert(countScans(df) == 1)
    assert(df.queryExecution.executedPlan.toString
      .contains("hashpartitioning(o_custkey"))
  }

  test("contamination's candidate generation is an equi-join, never all-pairs") {
    val plan = executed(TextAnalysis.contamination(Tables.documents(spark, sf)))
    assert(countIn(plan, "CartesianProduct") == 0)
    assert(countIn(plan, "BroadcastNestedLoopJoin") == 0)
  }

  test("entropy and pattern scans are map-only: one scan, zero exchanges") {
    for (df <- Seq(TextAnalysis.entropyStats(Tables.documents(spark, sf)),
        TextAnalysis.patternScan(Tables.documents(spark, sf)))) {
      assert(countScans(df) == 1)
      val plan = df.queryExecution.executedPlan.toString
      assert(countIn(plan, "Exchange") == 0, plan.take(1500))
    }
  }

  test("funnel runs both stage windows inside one user_id shuffle") {
    val df = graft.ops.Events.funnel(Tables.events(spark, sf))
    df.collect()
    val exchanges = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // one shuffle for the windows + flag aggregation, one
    // single-partition exchange for the final global sum — nothing
    // per-stage, no distinct-expand machinery
    assert(countScans(df) == 1)
    val parts = exchanges.map(_.outputPartitioning.toString)
    assert(parts.count(_.contains("user_id")) == 1 && parts.length == 2,
      parts.mkString("\n"))
  }

  test("knn graph broadcasts nodes and selects through the native TopKPerKey") {
    val df = graft.sim.Similarity.knnGraph(
      Tables.embeddings(spark, sf), org.apache.spark.sql.functions.col("vec_id") % 7 === 0, 3)
    val plan = executed(df)
    assert(plan.contains("TopKPerKey"), plan.take(1500))
    assert(countIn(plan, "CartesianProduct") == 0)
  }

  test("brute-force top-k builds the bounded query side, not the corpus") {
    val df = graft.sim.Similarity.bruteTopK(
      Tables.embeddings(spark, sf), org.apache.spark.sql.functions.col("vec_id") < 3, 5)
    val plan = executed(df)
    // intended nested-loop: corpus streams, broadcast side is the
    // 3-row query set
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"), plan.take(2000))
  }

  private def nodes[T](df: DataFrame)(pf: PartialFunction[
      org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    df.collect()
    collectWithSubqueries(df.queryExecution.executedPlan)(pf)
  }

  test("pca projection applies the fitted model in one shuffle-free scan") {
    val df = graft.sim.Similarity.pcaProject(Tables.embeddings(spark, sf))
    assert(countScans(df) == 1)
    assert(nodes(df) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, "projection must not shuffle")
  }

  test("ts match shuffles on composite segment keys and never sort-merges") {
    val df = graft.ops.Events.tsMatch(Tables.events(spark, sf))
    val shuffles = nodes(df) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning.toString
    }
    // every data exchange is keyed by the series key — and the window
    // pass runs on the COMPOSITE (event_type, seg) key, so one series
    // spreads over many tasks (the low-cardinality-key fix); the band
    // rank pass likewise composites with the time band
    assert(shuffles.nonEmpty && shuffles.forall(_.contains("event_type")),
      s"unexpected shuffle keys: $shuffles")
    assert(shuffles.exists(_.contains("seg")),
      s"window pass must partition by (event_type, seg): $shuffles")
    assert(shuffles.exists(_.contains("band")),
      s"rank pass must partition by (event_type, band): $shuffles")
    assert(nodes(df) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.isEmpty)
    // the band-offset frame reaches the scan as a broadcast, never a
    // data-sized shuffle join
    assert(nodes(df) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.nonEmpty)
  }

  test("graph iterations use hash joins, never sort-merge") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("src", "dst")
    val pr = graft.ops.Graph.pageRank(edges)
    assert(nodes(pr) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.isEmpty)
    assert(nodes(pr) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.nonEmpty)
    val cc = graft.ops.Graph.componentSizes(edges, iters = 2)
    assert(nodes(cc) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.isEmpty)
  }

  test("fixed-size sample plans partial heaps, not a global sort") {
    val plan = executed(graft.ops.Sampling.fixedSizeSample(
      Tables.documents(spark, sf), 20))
    // ordered limit = per-partition top-n merged on the driver; a
    // Sort or an Exchange here would mean the corpus got sorted or
    // shuffled to satisfy a 20-row result
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(countIn(plan, "Exchange") == 0, plan.take(2000))
  }

  test("skew profile and pca strata select through bounded TopKPerKey heaps") {
    for (df <- Seq(Relational.keySkewProfile(spark, sf),
        graft.ops.Sampling.pcaStrataSample(Tables.embeddings(spark, sf)))) {
      val plan = executed(df)
      assert(countIn(plan, "TopKPerKey") >= 1, plan.take(1500))
      assert(countIn(plan, "CartesianProduct") == 0)
      assert(countIn(plan, "SortMergeJoin") == 0)
    }
  }

  test("centroid outliers plan as heap-based ordered limit, zero wide sort") {
    val df = graft.sim.Similarity.centroidOutliers(Tables.embeddings(spark, sf), 5)
    val plan = executed(df)
    assert(countIn(plan, "TakeOrderedAndProject") >= 1, plan.take(1500))
    // the corpus never shuffles: only the heap results move
    assert(countIn(plan, "Exchange hashpartitioning") == 0, plan.take(1500))
  }

  test("novelty never joins corpus-sized frames: aggregates first, no SMJ") {
    val df = TextAnalysis.novelty(Tables.documents(spark, sf))
    val plan = executed(df)
    assert(countIn(plan, "SortMergeJoin") == 0)
    assert(countIn(plan, "CartesianProduct") == 0)
  }
}
