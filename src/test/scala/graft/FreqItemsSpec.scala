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
