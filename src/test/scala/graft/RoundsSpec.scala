package graft

import org.apache.spark.sql.functions._

import graft.ops.{Graph, Rounds}

/** The shared iterative-round materializer: localCheckpoint by
  * default, RELIABLE `.checkpoint()` into a checkpoint dir when the
  * session opts in — and the convergence probe riding the
  * materialization job as an observed metric in both modes.
  */
class RoundsSpec extends SparkSpec {
  import spark.implicits._

  // ring of cliques: 4 triangles chained by single bridge edges —
  // communities + components + distances all known in closed form
  private def edges() = {
    val cl = (0L until 4L).flatMap { c =>
      val b = c * 10L
      Seq((b, b + 1L), (b + 1L, b + 2L), (b, b + 2L))
    }
    val bridges = (0L until 3L).map(c => (c * 10L + 2L, (c + 1L) * 10L))
    (cl ++ bridges).toDF("src", "dst")
  }

  test("reliable mode without a checkpoint dir fails fast") {
    // runs FIRST, before any test sets the context-wide checkpoint dir
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    val s2 = spark.newSession()
    s2.conf.set(Rounds.ReliableConf, "true")
    val df = s2.range(3).toDF("n")
    val ex = intercept[IllegalArgumentException] {
      Rounds.materialize(df)
    }
    assert(ex.getMessage.contains("setCheckpointDir"))
  }

  test("observed changed-count matches the frame and rides one job") {
    val df = Seq((1L, true), (2L, false), (3L, true)).toDF("n", "chg")
    val (mat, changed) = Rounds.materializeChanged(df)
    assert(changed === 2L)
    assert(mat.columns.toSeq === Seq("n")) // chg consumed by the metric
    assert(mat.as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    val (mat2, n) = Rounds.materializeCounted(df.select("n"))
    assert(n === 3L && mat2.count() === 3L)
    // empty frame: sum over zero rows must read as zero, not null
    val (_, zero) = Rounds.materializeChanged(df.filter(lit(false)))
    assert(zero === 0L)
  }

  test("reliable mode writes rounds to the checkpoint dir and results are identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val s2 = spark.newSession()
    s2.conf.set(Rounds.ReliableConf, "true")
    val base = edges().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    def all(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      val e = base.toDF("src", "dst")
      val seeds = Seq(0L).toDF("node")
      (Graph.componentSizes(e).collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
        Graph.labelPropagation(e).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet,
        Graph.kCore(e, k = 2).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet,
        Graph.bfsDistances(e, seeds).collect()
          .map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(2))).toSet)
    }
    val localMode = all(spark)
    val reliableMode = all(s2)
    assert(localMode === reliableMode)
    // the reliable run actually wrote round frames to the dir
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, "reliable mode wrote nothing to the checkpoint dir")
  }

  test("keeper propagation agrees across modes") {
    assume(spark.sparkContext.getCheckpointDir.isDefined) // set above
    val s2 = spark.newSession()
    s2.conf.set(Rounds.ReliableConf, "true")
    def docs(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      (Seq((1L, "aa bb cc dd ee ff gg hh", "s1"),
        (2L, "aa bb cc dd ee ff gg hh", "s1"),
        (3L, "totally different words entirely here now", "s2")))
        .toDF("doc_id", "text", "source")
    }
    def keepers(s: org.apache.spark.sql.SparkSession) =
      graft.dedup.Dedup.nearDupKeepers(docs(s), tau = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keepers(spark) === keepers(s2))
  }

  test("materialize fails fast on an unpartitioned corpus window") {
    // the r13 residual: runtime `WindowExec: No Partition Defined`
    // warnings fired inside eagerly-materialized intermediates the
    // final-plan lint never walks. materialize now lints the frame
    // it is about to execute — an unallowlisted single-partition
    // window is an error, not a log line
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("id")
    val planted = spark.range(100).toDF("id")
      .withColumn("rk", row_number().over(w))
    val ex = intercept[IllegalArgumentException] {
      Rounds.materialize(planted)
    }
    assert(ex.getMessage.contains("single-partition window"))
    // the allowlist executes the same frame (caller vouches bounded)
    assert(Rounds.materialize(planted, boundedWindowOk = true)
      .count() === 100L)
  }

  test("binOf conventions keep every index inside [0, bins) — the " +
    "bound behind RankSelect's allowlisted cumsum window") {
    // the ONE allowlisted single-partition window (RankSelect's cum,
    // reached when a constant group key folds the partition away —
    // q40_concentration) runs over the (g, bin) aggregate: ≤ bins
    // rows per group IFF binOf lands in [0, bins). Pin the range for
    // both conventions on adversarial values: extremes, point-mass
    // (lo = hi), negatives, and a value at each edge.
    val bins = 256
    def rangeOf(vals: Seq[Long]): (Long, Long) = {
      val df = vals.toDF("v")
        .withColumn("lo", lit(vals.min))
        .withColumn("hi", lit(vals.max))
      val r = df.select(graft.ops.RankSelect.intBin(bins).as("b"))
        .agg(min("b"), max("b")).head
      (r.getLong(0), r.getLong(1))
    }
    for (vals <- Seq(Seq(0L, 1L, 255L, 256L, 1000000L),
      Seq(-500L, -1L, 0L, 499L), Seq(7L, 7L, 7L),
      Seq(Long.MinValue / 4, 0L, Long.MaxValue / 4))) {
      val (lo, hi) = rangeOf(vals)
      assert(lo >= 0L && hi < bins, s"intBin out of range on $vals: [$lo, $hi]")
    }
    def floatRange(vals: Seq[Double]): (Long, Long) = {
      val df = vals.toDF("v")
        .withColumn("lo", lit(vals.min))
        .withColumn("hi", lit(vals.max))
      val r = df.select(graft.ops.RankSelect.floatBin(bins).as("b"))
        .agg(min("b"), max("b")).head
      (r.getLong(0), r.getLong(1))
    }
    for (vals <- Seq(Seq(0.0, 0.5, 1.0), Seq(-3.25, 0.0, 9.75),
      Seq(2.5, 2.5), Seq(1e-12, 1e12))) {
      val (lo, hi) = floatRange(vals)
      assert(lo >= 0L && hi < bins, s"floatBin out of range on $vals: [$lo, $hi]")
    }
  }
}
