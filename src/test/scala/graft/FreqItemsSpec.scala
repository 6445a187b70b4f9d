package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqItemsAgg.freq_items
import graft.ops.Sampling

class FreqItemsSpec extends SparkSpec {

  test("over-capacity buffer counts exactly and ranks deterministically") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d"))
      .toDF("tok")
    val top = df.agg(freq_items(col("tok"), 3, capacity = 100).as("t"))
      .select(explode(col("t")).as("kv"))
      .select("kv.token", "kv.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    // ties broken by token ascending
    assert(top == List(("a", 5L), ("b", 3L), ("c", 3L)))
  }

  test("under-capacity Misra-Gries keeps the heavy hitter") {
    import spark.implicits._
    val df = ((1 to 500).map(_ => "heavy") ++ (1 to 300).map(i => s"rare$i"))
      .toDF("tok").repartition(4)
    val top = df.agg(freq_items(col("tok"), 1, capacity = 8).as("t"))
      .select(explode(col("t")).as("kv"))
      .select("kv.token", "kv.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head._1 == "heavy")
    // MG undercount bound: true_count - N/capacity <= est <= true_count
    assert(top.head._2 <= 500 && top.head._2 >= 500 - 800 / 8)
  }

  test("sketch vocab oracle-parity preconditions hold at the largest SF") {
    // vocabTopKSketch shares the exact-count SQL oracle; that holds
    // only while (a) the true vocabulary fits the tracked budget (the
    // sketch is then exact) and (b) every token tied at the top-k
    // count boundary fits the k+50 overfetch (approx_top_k breaks
    // ties arbitrarily; the deterministic re-rank can only repair
    // ties it can see). Pin both at the biggest SF the driver runs.
    import graft.text.TextAnalysis
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val counts = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").count()
    val vocab = counts.count()
    assert(vocab < 10000, s"vocab $vocab outgrew maxTracked=10000")
    val k = 10
    val kth = counts.orderBy(col("count").desc, col("tok"))
      .limit(k).collect().map(_.getLong(1)).min
    val atOrAbove = counts.filter(col("count") >= kth).count()
    assert(atOrAbove <= k + 50,
      s"$atOrAbove tokens at/above the rank-$k count $kth exceed the k+50 overfetch")
  }

  test("arg_max_str equals max_by and plans as ObjectHashAggregate") {
    import spark.implicits._
    import graft.functions.ArgMaxStrAgg.arg_max_str
    val rnd = new scala.util.Random(7)
    // unique ords per key (max_by ties are indeterminate, so don't plant any)
    val rows = rnd.shuffle((1 to 500).toList).zipWithIndex.map { case (ord, i) =>
      (i % 37L, ord.toLong, if (ord % 11 == 0) null else s"v$ord")
    }
    val df = rows.toDF("k", "ord", "v")
    val viaCustom = df.groupBy("k").agg(arg_max_str(col("v"), col("ord")).as("last"))
    val expected = df.groupBy("k").agg(max_by(col("v"), col("ord")).as("last"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = viaCustom.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected && got.nonEmpty)
    viaCustom.collect()
    val plan = viaCustom.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"not hash-aggregated:\n$plan")
    assert(!plan.contains("SortAggregate"), s"sort fallback:\n$plan")
  }

  test("arg_max_str ignores null ordinals and keeps a null winning value") {
    import spark.implicits._
    import graft.functions.ArgMaxStrAgg.arg_max_str
    val df = Seq(
      (1L, Some(5L), Some("old")), (1L, Some(9L), None),  // null value wins
      (2L, None, Some("never")),                          // null ord ignored
      (3L, Some(1L), Some("only"))
    ).toDF("k", "ord", "v")
    val out = df.groupBy("k").agg(arg_max_str(col("v"), col("ord")).as("last"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> None, 2L -> None, 3L -> Some("only")))
  }

  test("hash split is deterministic and ~25% val") {
    val docs = Tables.documents(spark, sf)
    val a = Sampling.splitAudit(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val b = Sampling.splitAudit(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
    val valFrac = a.toSeq.filter(_._2 == "val").map(_._3).sum.toDouble /
      a.toSeq.map(_._3).sum
    assert(valFrac > 0.15 && valFrac < 0.35, s"val fraction $valFrac")
  }
}
