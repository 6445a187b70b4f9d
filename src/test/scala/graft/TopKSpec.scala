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

  test("keys with fewer than k rows emit all their rows") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 9)).toDF("k", "v")
    val out = TopK.perKey(df, Seq("k"), Seq(col("v").desc), 5)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(out == Set(("a", 1), ("a", 2), ("b", 9)))
  }
}
