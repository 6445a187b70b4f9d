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

  private def topkExecs(df: org.apache.spark.sql.DataFrame) =
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case t: TopKPerKeyExec => t
    }

  test("rank-filter window idiom auto-rewrites onto the native operator") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    assert(topkExecs(df).nonEmpty, "rewrite did not fire")
    // the rank column survives and rows equal the un-rewritten window
    // formulation (total order — no tie ambiguity)
    val expect = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("rn") >= 1 && lit(1) === 1)
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == expect && expect.nonEmpty)
    // the SQL-spelled idiom rewrites identically
    Tables.orders(spark, sf).createOrReplaceTempView("rw_orders")
    def sqlTop(extra: String) = spark.sql(
      s"""SELECT * FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
         |  row_number() OVER (PARTITION BY o_orderpriority
         |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
         |  FROM rw_orders) WHERE rn < 4$extra""".stripMargin)
    val sqlDf = sqlTop("")
    assert(topkExecs(sqlDf).nonEmpty, "SQL-path rewrite did not fire")
    // reference: the same query with an rn-reading conjunct appended,
    // which blocks the rewrite and keeps the plain window plan
    val sqlRef = sqlTop(" AND rn % 1 = 0")
    assert(topkExecs(sqlRef).isEmpty)
    assert(sqlDf.collect().map(_.toSeq).toSet ==
      sqlRef.collect().map(_.toSeq).toSet)
  }

  test("rank-filter rewrite declines every unsafe shape") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val base = Tables.orders(spark, sf)
    // a second window expression needs the full partition
    val two = base.select(col("o_orderpriority"),
        row_number().over(w).as("rn"), sum("o_totalprice").over(w).as("s"))
      .filter(col("rn") <= 3)
    assert(topkExecs(two).isEmpty)
    // a lower bound alone retains nothing boundable
    val lower = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") >= 2)
    assert(topkExecs(lower).isEmpty)
    // a bound past MaxK stays on the window path
    val big = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= graft.plans.RewriteRankFilterToTopK.MaxK + 1)
    assert(topkExecs(big).isEmpty)
    // a residual conjunct that READS the rank blocks the rewrite
    // only if un-boundable; rn % 2 = 0 references rn non-bound-ly
    val parity = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("rn") % 2 === 0)
    assert(topkExecs(parity).isEmpty)
    // rank = k equality still fires (top-k retains the k-th row)
    val eq = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 2)
    assert(topkExecs(eq).nonEmpty)
    val eqRows = eq.collect()
    val ref = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") * 1 === 2).collect()
    assert(eqRows.map(_.toSeq).toSet == ref.map(_.toSeq).toSet &&
      eqRows.nonEmpty)
  }
}
