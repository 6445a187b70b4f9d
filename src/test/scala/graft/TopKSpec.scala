package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.plans.{TopK, TopKPerKeyExec}

class TopKSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("native top-k equals the window formulation exactly") {
    val window = Relational.q8TopNGroup(spark, sf)
      .collect().map(_.toSeq).toList
    val native = Relational.q8TopNNative(spark, sf)
      .collect().map(_.toSeq).toList
    assert(native == window && native.nonEmpty)
  }

  test("the plan is two-level: map-side partial heap below the exchange") {
    val df = TopK.perKey(Tables.orders(spark, sf), Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    df.collect()
    val execs = collectWithSubqueries(df.queryExecution.executedPlan) {
      case t: TopKPerKeyExec => t
    }
    assert(execs.map(_.partial).sorted == Seq(false, true))
    // the exchange sits between the two levels, not below the partial
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("Exchange"))
  }

  test("near-unique keys beyond the partial cap still produce exact results") {
    import spark.implicits._
    // 2× the partial key budget, one or two rows per key: the partial
    // pass must overflow into pass-through without losing rows
    val n = graft.plans.TopKPerKeyExec.PartialMaxKeys * 2
    val df = spark.range(n).select(
      (col("id") % (n / 2)).as("k"), col("id").as("v"))
    val out = TopK.perKey(df, Seq("k"), Seq(col("v").desc), 1)
    assert(out.count() == n / 2)
    // spot-check: every surviving row is the max v of its key (v = k or k + n/2)
    val sample = out.filter(col("k") < 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L until 100L).forall(k => sample(k) == k + n / 2))
  }

  test("redundant repartition under top-k is collapsed to one exchange") {
    val base = Tables.orders(spark, sf)
    val df = TopK.perKey(base.repartition(col("o_orderpriority")),
      Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    df.collect()
    val exchanges = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1, df.queryExecution.executedPlan.toString.take(1500))
    // and the result is identical to the un-repartitioned operator
    val plain = TopK.perKey(base, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == plain)
  }

  test("keys with fewer than k rows emit all their rows") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 9)).toDF("k", "v")
    val out = TopK.perKey(df, Seq("k"), Seq(col("v").desc), 5)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(out == Set(("a", 1), ("a", 2), ("b", 9)))
  }
}
