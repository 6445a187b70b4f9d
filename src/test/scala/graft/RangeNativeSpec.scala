package graft

import org.apache.spark.sql.functions._

import graft.ops.{RangeJoin, Relational}
import graft.plans.RangeNative

class RangeNativeSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  test("keyed range join: window bounds are (lt - W, lt], per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 100L, "p3"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 40L, "early"),   // == 100 - 60: excluded (open lower bound)
      (1L, 41L, "in1"),     // > 40: included for p1
      (1L, 100L, "tie"),    // == lt: included for p1
      (1L, 150L, "in2"),    // only p2's window
      (2L, 100L, "other"))  // other key
      .toDF("rk", "rt", "p")
    val out = RangeNative.join(left, right,
        keys = Seq("k" -> "rk"), time = ("t", "rt"), windowMicros = 60L)
      .select("tag", "p").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // p1 sees (40, 100] → in1, tie; p2 sees (140, 200] → in2 only
    // (tie@100 evicted); p3 only its own key's row
    assert(out == Set(
      ("p1", "in1"), ("p1", "tie"), ("p2", "in2"), ("p3", "other")))
  }

  test("left-outer mode null-pads empty windows, including null left times") {
    import spark.implicits._
    val left = Seq((1L, 100L, "hit"), (1L, 500L, "miss"), (2L, 100L, "nokey"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 90L, "r1")).toDF("rk", "rt", "p")
    val out = RangeNative.join(left, right,
        keys = Seq("k" -> "rk"), time = ("t", "rt"),
        windowMicros = 60L, leftOuter = true)
      .select("tag", "p").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("hit", "r1"), ("miss", null), ("nokey", null)))
    // inner mode drops the unmatched rows instead
    val inner = RangeNative.join(left, right,
        keys = Seq("k" -> "rk"), time = ("t", "rt"), windowMicros = 60L)
      .select("tag").collect().map(_.getString(0)).toSet
    assert(inner == Set("hit"))
  }

  test("null times never match; null keys group like values") {
    import spark.implicits._
    val left = Seq((Some(1L), Some(100L), "a"), (None, Some(100L), "nullkey"),
      (Some(1L), None, "nullts")).toDF("k", "t", "tag")
    val right = Seq((Some(1L), Some(90L), "r1"), (None, Some(95L), "rn"),
      (Some(1L), None, "rnullts")).toDF("rk", "rt", "p")
    val out = RangeNative.join(left, right,
        keys = Seq("k" -> "rk"), time = ("t", "rt"), windowMicros = 50L)
      .select("tag", "p").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "r1"), ("nullkey", "rn")))
  }

  test("matches the banded composition's in-window pairs on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 400).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = (1 to 300).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("rk", "rt", "rid")
    val native = RangeNative.join(left, right,
        keys = Seq("k" -> "rk"), time = ("t", "rt"), windowMicros = 100L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // keyless banded operator + explicit key-equality filter
    val banded = RangeJoin.trailingCandidates(left, right, "t", "rt", 100L)
      .filter(col("in_window") && col("k") === col("rk"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == banded && native.nonEmpty)
  }

  test("plans one RangeJoinExec with one exchange per side") {
    import spark.implicits._
    val left = (1 to 50).map(i => (i.toLong % 5, i.toLong)).toDF("k", "t")
    val right = (1 to 50).map(i => (i.toLong % 7, i.toLong)).toDF("rk", "rt")
    val df = RangeNative.join(left, right,
      keys = Seq("k" -> "rk"), time = ("t", "rt"), windowMicros = 10L)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val execs = collectWithSubqueries(plan) { case e: graft.plans.RangeJoinExec => e }
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(execs.length == 1)
    assert(exchanges.length == 2)
  }

  test("subset-pre-partitioned children are re-co-partitioned, results exact") {
    // both children arrive hash-partitioned on DIFFERENT strict subsets
    // of the two join keys — each satisfies its ClusteredDistribution
    // alone, but they are NOT co-partitioned; EnsureRequirements must
    // detect the incompatible specs and insert an exchange, or rows of
    // the same key pair land in different partitions and silently drop
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k1", "k2", "t", "lid")
    val right = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("rk1", "rk2", "rt", "rid")
    val lp = left.repartition(4, col("k1"))   // subset {k1}
    val rp = right.repartition(7, col("rk2")) // subset {rk2} — incompatible
    val df = RangeNative.join(lp, rp,
      keys = Seq("k1" -> "rk1", "k2" -> "rk2"), time = ("t", "rt"),
      windowMicros = 100L)
    val native = df.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oracle = left.join(right,
        col("k1") === col("rk1") && col("k2") === col("rk2") &&
          col("rt") > col("t") - 100L && col("rt") <= col("t"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == oracle && native.nonEmpty)
    // the single-key user shuffles must not survive as the join inputs:
    // every exchange feeding the exec hashes on BOTH keys (the user
    // repartitions were superseded by corrective co-partitioning)
    val exchanges = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.length == 2)
    exchanges.foreach { e =>
      e.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          assert(h.expressions.length == 2)
        case p => fail(s"expected HashPartitioning, got $p")
      }
    }
  }

  test("q31 equals the same aggregation over the banded keyless join") {
    val W = 600L * 1000000L
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        unix_micros(col("ts")).as("pus"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("cus"),
        col("value").as("cval"))
    val banded = RangeJoin.trailingCandidates(purchases, clicks, "pus", "cus", W)
      .filter(col("in_window") && col("p_user") === col("c_user"))
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("n_clicks"), round(sum("cval"), 2).as("click_value"))
      .collect().map(_.mkString("|")).toSet
    val native = Relational.q31RangeNative(spark, sf)
      .collect().map(_.mkString("|")).toSet
    assert(native == banded && native.nonEmpty)
  }
}
