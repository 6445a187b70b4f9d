package graft

import org.apache.spark.sql.functions._

import graft.ops.Events
import graft.plans.IntervalNative

class IntervalNativeSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  test("sweep join equals the naive cross-join filter on fuzzed intervals") {
    import spark.implicits._
    // deterministic fuzz: spans of every awkward shape — points,
    // band-width multiples, multi-band monsters, pre-epoch negatives,
    // shared starts/ends — against a tiny band so band-crossing is
    // the COMMON case, not the edge
    def spans(seed: Long, n: Int) = (0 until n).map { i =>
      val h = seed * 31 + i * 2654435761L
      val s = (h % 4000L) - 2000L        // pre-epoch negatives included
      val len = math.abs((h / 7) % 900L) // up to 9 bands at W=100
      (i.toLong, s, s + len)
    }
    val left = spans(1L, 120).toDF("lid", "ls", "le")
    val right = spans(2L, 150).toDF("rid", "rs", "re")
    val got = IntervalNative.join(left, right, ("ls", "le"), ("rs", "re"),
        bandMicros = 100L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expect = left.crossJoin(right)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got.size == expect.size && got == expect,
      s"native ${got.size} pairs vs naive ${expect.size}")
    // exactly-once: no duplicates even for many-band overlaps
    assert(got.distinct.size == got.size)
    // band width never changes the result
    val wide = IntervalNative.join(left, right, ("ls", "le"), ("rs", "re"),
        bandMicros = 1000000L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(wide == expect)
  }

  test("coactivityNative equals the banded operator and plans the sweep") {
    import spark.implicits._
    import java.sql.Timestamp
    def at(sec: Long, id: Long, user: Long) =
      (id, new Timestamp(sec * 1000), user, "click", 1.0)
    val rows = Seq(
      at(1000, 1, 1), at(2000, 2, 1), at(1500, 3, 2), at(2500, 4, 2),
      at(9000, 5, 3),
      at(86100, 6, 4), at(86700, 7, 4), at(86200, 8, 5), at(86800, 9, 5))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b")) ->
        (r.getAs[Long]("n_overlaps"), r.getAs[Long]("shared_us"))).toMap
    val banded = shape(Events.coactivity(ev))
    val native = Events.coactivityNative(ev)
    assert(shape(native) == banded, s"native ${shape(native)} vs $banded")
    // the physical plan runs the sweep — no hash/sort-merge join, no
    // cartesian, no distinct-driven aggregate for dedup
    native.collect()
    val plan = native.queryExecution.executedPlan
    val sweeps = collectWithSubqueries(plan) {
      case e: graft.plans.IntervalJoinExec => e
    }
    assert(sweeps.nonEmpty, plan.toString.take(600))
    assert(!plan.toString.contains("CartesianProduct"))
    // band width invariance on the operator too
    assert(shape(Events.coactivityNative(ev, bandSec = 7L)) == banded)
    assert(shape(Events.coactivityNative(ev, bandSec = 172800L)) == banded)
  }

  test("sf corpus: native and banded coactivity agree end to end") {
    val ev = Tables.events(spark, sf)
    val banded = Events.coactivity(ev).collect()
      .map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b")) ->
        (r.getAs[Long]("n_overlaps"), r.getAs[Long]("shared_us"))).toMap
    val native = Events.coactivityNative(ev).collect()
      .map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b")) ->
        (r.getAs[Long]("n_overlaps"), r.getAs[Long]("shared_us"))).toMap
    assert(native == banded)
  }
}
