package graft

import org.apache.spark.sql.functions._

import graft.ops.{AsofJoin, Relational}

class AsofJoinSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  test("backward as-of: latest right at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 9L, "r9"))
      .toDF("k", "t", "payload")
    val out = AsofJoin.join(left, right, "k", "t", "t",
        Map("payload" -> "matched"))
      .select("k", "t", "tag", "matched")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSet
    assert(out == Set(
      (1L, 10L, "a", "r10"),  // tie: right at equal ts is visible
      (1L, 20L, "b", "r15"),
      (2L, 5L, "c", null)))   // nothing at-or-before: left-outer null
  }

  test("seq tiebreak defines visibility at equal timestamps") {
    import spark.implicits._
    val left = Seq((1L, 10L, 5L)).toDF("k", "t", "s")
    val rightBefore = Seq((1L, 10L, 4L, "wins")).toDF("k", "t", "s", "p")
    val rightAfter = Seq((1L, 10L, 6L, "loses")).toDF("k", "t", "s", "p")
    def run(r: org.apache.spark.sql.DataFrame) =
      AsofJoin.join(left, r, "k", "t", "t", Map("p" -> "p"),
        seq = Some(("s", "s"))).select("p").head().getString(0)
    assert(run(rightBefore) == "wins")
    assert(run(rightAfter) == null)
  }

  test("generic operator reproduces the specialized attribution query") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).toSet
    val generic = canon(Relational.q28AsofGeneric(spark, sf))
    val special = canon(Relational.q18AsofAttribution(spark, sf))
    assert(generic == special && generic.nonEmpty)
  }

  test("native as-of exec: backward semantics, ties and null padding") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 7L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 9L, "r9"))
      .toDF("rk", "rt", "payload")
    val out = graft.plans.AsofNative.join(left, right,
        keys = Seq("k" -> "rk"), order = Seq("t" -> "rt"))
      .select("k", "t", "tag", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSet
    assert(out == Set(
      (1L, 10L, "a", "r10"),  // tie at equal t is visible
      (1L, 20L, "b", "r15"),
      (2L, 5L, "c", null),    // right exists for the key but only later
      (3L, 7L, "d", null)))   // key absent on the right entirely
  }

  test("native as-of matches the compositional operator on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = (1 to 400).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, i.toLong)).toDF("k", "t", "lid")
    val right = (1 to 300).map(i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(50).toLong, i.toLong, s"p$i"))
      .toDF("k", "t", "rid", "p")
    // shared (t, id) total order on both sides, like the seq knob
    val viaUnion = AsofJoin.join(left, right, "k", "t", "t",
        Map("p" -> "p", "rid" -> "rid"), seq = Some(("lid", "rid")))
      .select("k", "t", "lid", "p", "rid")
      .collect().map(_.mkString("|")).toSet
    val viaNative = graft.plans.AsofNative.join(left,
        right.select(col("k").as("rk"), col("t").as("rt"), col("rid"), col("p")),
        keys = Seq("k" -> "rk"), order = Seq("t" -> "rt", "lid" -> "rid"))
      .select("k", "t", "lid", "p", "rid")
      .collect().map(_.mkString("|")).toSet
    assert(viaNative == viaUnion && viaNative.nonEmpty)
  }

  test("native as-of groups null keys and null times like the window form") {
    import spark.implicits._
    // null keys group together; null ts sorts first (matches a window's
    // partitionBy/orderBy treatment in the tagged-union operator)
    val left = Seq((Some(1L), Some(10L), 1L), (None, Some(10L), 2L),
      (Some(1L), None, 3L)).toDF("k", "t", "lid")
    val right = Seq((Some(1L), Some(5L), 10L, "r1"), (None, Some(5L), 11L, "rn"))
      .toDF("k", "t", "rid", "p")
    val viaUnion = AsofJoin.join(left, right, "k", "t", "t",
        Map("p" -> "p"), seq = Some(("lid", "rid")))
      .select("lid", "p").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaNative = graft.plans.AsofNative.join(left,
        right.select(col("k").as("rk"), col("t").as("rt"), col("rid"), col("p")),
        keys = Seq("k" -> "rk"), order = Seq("t" -> "rt", "lid" -> "rid"))
      .select("lid", "p").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaNative == viaUnion)
    assert(viaNative(1L) == "r1")   // normal match
    assert(viaNative(2L) == "rn")   // null keys match each other
    assert(viaNative(3L) == null)   // null left ts: nothing at-or-before
  }

  test("native exec plans one exchange per side and no union carry") {
    import spark.implicits._
    val left = (1 to 50).map(i => (i.toLong % 5, i.toLong)).toDF("k", "t")
    val right = (1 to 50).map(i => (i.toLong % 7, i.toLong)).toDF("rk", "rt")
    val df = graft.plans.AsofNative.join(left, right,
      keys = Seq("k" -> "rk"), order = Seq("t" -> "rt"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val execs = collectWithSubqueries(plan) { case e: graft.plans.AsofJoinExec => e }
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(execs.length == 1)
    assert(exchanges.length == 2)
  }

  test("subset-pre-partitioned children are re-co-partitioned, results exact") {
    // children pre-hashed on DIFFERENT strict subsets of the join keys:
    // each alone satisfies ClusteredDistribution, but the pair is not
    // co-partitioned — EnsureRequirements must reject the incompatible
    // specs and re-exchange, or same-key rows never meet in a partition
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val left = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k1", "k2", "t", "lid")
    val right = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(3).toLong, i.toLong, i.toLong))
      .toDF("rk1", "rk2", "rt", "rid") // rt unique: unambiguous latest
    val lp = left.repartition(4, col("k1"))   // subset {k1}
    val rp = right.repartition(7, col("rk2")) // subset {rk2} — incompatible
    val df = graft.plans.AsofNative.join(lp, rp,
      keys = Seq("k1" -> "rk1", "k2" -> "rk2"), order = Seq("t" -> "rt"))
    val native = df.select("lid", "rid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString.toLong))).toSet
    // oracle: latest right at-or-before per (k1, k2) via plain join + rank
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lid").orderBy(col("rt").desc)
    val oracle = left.join(right,
        col("k1") === col("rk1") && col("k2") === col("rk2") &&
          col("rt") <= col("t"), "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString.toLong))).toSet
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

  test("native attribution query reproduces the specialized one") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).toSet
    val native = canon(Relational.q29AsofNative(spark, sf))
    val special = canon(Relational.q18AsofAttribution(spark, sf))
    assert(native == special && native.nonEmpty)
  }
}
