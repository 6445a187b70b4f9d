package graft

import org.apache.spark.sql.functions._

import graft.ops.Events

class EventsSpec extends SparkSpec {

  private def ev(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("event_id", "secs", "user_id", "event_type")
      .select(col("event_id"), col("secs").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
  }

  test("funnel only counts stages in event order") {
    // user 1: full ordered funnel; user 2: click BEFORE signup (click
    // must not count); user 3: purchase before any click (no purchase)
    val events = ev(
      (1L, 10L, 1L, "signup"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "purchase"),
      (4L, 10L, 2L, "click"), (5L, 20L, 2L, "signup"),
      (6L, 10L, 3L, "signup"), (7L, 20L, 3L, "purchase"))
    val rows = Events.funnel(events).orderBy("stage_idx")
      .collect().map(r => (r.getString(1), r.getLong(2))).toList
    assert(rows == List(("signup", 3L), ("click", 1L), ("purchase", 1L)))
  }

  test("funnel breaks timestamp ties by event_id") {
    // same-second signup then click: event_id order decides
    val ok = ev((1L, 10L, 1L, "signup"), (2L, 10L, 1L, "click"))
    val ko = ev((2L, 10L, 1L, "signup"), (1L, 10L, 1L, "click"))
    def clicks(df: org.apache.spark.sql.DataFrame): Long =
      Events.funnel(df).filter(col("stage") === "click").head().getLong(2)
    assert(clicks(ok) == 1L)
    assert(clicks(ko) == 0L)
  }

  test("retention cohorts by signup week, keeps negative offsets") {
    // 2024-01-01 is a Monday. user 1 signs up week 0, active week 1;
    // user 2 has pre-signup activity (negative offset must survive)
    val base = 1704067200L // 2024-01-01 00:00 UTC
    val events = ev(
      (1L, base, 1L, "signup"), (2L, base + 8 * 86400, 1L, "click"),
      (3L, base + 7 * 86400, 2L, "signup"), (4L, base, 2L, "view"))
    val rows = Events.retention(events).orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toList
    assert(rows == List(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", -1L, 1L), ("2024-01-08", 0L, 1L)))
  }

  test("funnel stage counts are monotone non-increasing on real data") {
    val counts = Events.funnel(Tables.events(spark, sf)).orderBy("stage_idx")
      .collect().map(_.getLong(2))
    assert(counts.length == 3)
    assert(counts(0) >= counts(1) && counts(1) >= counts(2))
  }

  test("rolling actives: WAU unions the trailing week, DAU stays daily") {
    import spark.implicits._
    // user 1 active on day 1 and 10; user 2 on days 1..3; user 3 on day 8
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val ev = Seq((1L, t(1)), (1L, t(10)), (2L, t(1)), (2L, t(2)), (2L, t(3)),
        (3L, t(8))).toDF("user_id", "ts")
    val out = graft.ops.Events.rollingActives(ev).collect()
      .map(r => r.getDate(0).toString ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"))).toMap
    assert(out("2024-01-01") == (2L, 2L)) // users 1,2
    assert(out("2024-01-03") == (1L, 2L)) // day: {2}; week 12-28..1-03: {1,2}
    assert(out("2024-01-08") == (1L, 2L)) // day: {3}; week 1-02..1-08: {2,3}
    assert(out("2024-01-10") == (1L, 2L)) // day: {1}; week 1-04..1-10: {1,3}
    assert(!out.contains("2024-01-05"))   // only observed days report
  }

  test("markov counts consecutive per-user transitions with P(next|prev)") {
    val events = ev(
      (1L, 10L, 1L, "signup"), (2L, 20L, 1L, "click"),
      (3L, 30L, 1L, "click"), (4L, 40L, 1L, "purchase"),
      (5L, 10L, 2L, "view"), (6L, 20L, 2L, "click"))
    val out = Events.markov(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 4)
    assert(out(("signup", "click")) == (1L, 1.0))
    assert(out(("click", "click")) == (1L, 0.5))
    assert(out(("click", "purchase")) == (1L, 0.5))
    assert(out(("view", "click")) == (1L, 1.0))
  }

  test("markov breaks timestamp ties by event_id and never crosses users") {
    // user 1's two events share a second: event_id orders view→click;
    // user 2's single event contributes no transition
    val events = ev(
      (1L, 10L, 1L, "view"), (2L, 10L, 1L, "click"),
      (3L, 5L, 2L, "purchase"))
    val out = Events.markov(events).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("view", "click")))
  }

  test("anomaly flags exactly the planted far outlier, not the bulk") {
    import spark.implicits._
    // 50 values at ~10 plus one at 1000: only the plant exceeds 2σ
    val rows = (1L to 50L).map(i => (i, "click", 10.0 + (i % 5))) :+
      (99L, "click", 1000.0)
    val df = rows.toDF("event_id", "event_type", "value")
    val out = Events.anomaly(df, tau = 2.0).collect()
    assert(out.map(_.getAs[Long]("event_id")).toSeq == Seq(99L))
    assert(out.head.getAs[Double]("z") > 2.0)
  }

  test("anomaly z-scores are standardized per event type") {
    val out = Events.anomaly(Tables.events(spark, sf), tau = 2.0).collect()
    assert(out.nonEmpty)
    // every surviving row really deviates ≥ 2 sigma, per its own type
    assert(out.forall(r => math.abs(r.getAs[Double]("z")) >= 1.999))
  }

  test("ts match finds a scaled+shifted copy of the pattern at distance 0") {
    import spark.implicits._
    val pattern = Seq(0.0, 0.0, 1.0, 2.0, 4.0, 2.0, 1.0, 0.0)
    // 30-point series: varied noise, with 100 + 7*pattern planted at
    // positions 10..17 — z-normalization must erase the offset/scale
    val values = (0 until 30).map {
      case i if i >= 10 && i <= 17 => 100.0 + 7.0 * pattern(i - 10)
      case i => (i % 7) * 3.0 + (i % 3)
    }
    val df = values.zipWithIndex
      .map { case (v, i) => (i.toLong, i.toLong, "sig", v) }
      .toDF("event_id", "secs", "event_type", "value")
      .select(col("event_id"), col("secs").cast("timestamp").as("ts"),
        col("event_type"), col("value"))
    val out = Events.tsMatch(df, pattern, k = 3).collect()
    val best = out.find(_.getAs[Long]("rank") == 1L).get
    // the window ENDING at position 17 is the planted copy
    assert(best.getAs[Long]("event_id") == 17L)
    assert(best.getAs[Double]("dist") == 0.0)
    // and nothing else matches exactly
    assert(out.count(_.getAs[Double]("dist") == 0.0) == 1)
  }

  test("ts match results are invariant to segment size and band width") {
    // the segmentation is pure parallelism plumbing: shrinking the
    // segments to barely-above-L and the bands to 1s (so windows
    // straddle many segment/band boundaries) must not change a single
    // output row vs the default geometry
    val base = Events.tsMatch(Tables.events(spark, sf))
      .collect().map(_.toSeq).sortBy(_.toString)
    val tiny = Events.tsMatch(Tables.events(spark, sf),
      segmentSize = 9, bandUs = 1000000L)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(base.nonEmpty && base.toSeq == tiny.toSeq)
  }

  test("ts match finds the planted copy across a segment boundary") {
    import spark.implicits._
    val pattern = Seq(0.0, 0.0, 1.0, 2.0, 4.0, 2.0, 1.0, 0.0)
    val values = (0 until 30).map {
      case i if i >= 10 && i <= 17 => 100.0 + 7.0 * pattern(i - 10)
      case i => (i % 7) * 3.0 + (i % 3)
    }
    val df = values.zipWithIndex
      .map { case (v, i) => (i.toLong, i.toLong, "sig", v) }
      .toDF("event_id", "secs", "event_type", "value")
      .select(col("event_id"), col("secs").cast("timestamp").as("ts"),
        col("event_type"), col("value"))
    // segmentSize=8 puts the planted window (rows 10..17) astride the
    // idx-16 segment boundary; the L-1 overlap must still see it whole
    val out = Events.tsMatch(df, pattern, k = 3,
      segmentSize = 8, bandUs = 1000000L).collect()
    val best = out.find(_.getAs[Long]("rank") == 1L).get
    assert(best.getAs[Long]("event_id") == 17L)
    assert(best.getAs[Double]("dist") == 0.0)
  }

  test("ts match on real data is dense-ranked per type with sane distances") {
    val out = Events.tsMatch(Tables.events(spark, sf)).collect()
    val byType = out.groupBy(_.getAs[String]("event_type"))
    assert(byType.nonEmpty)
    byType.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rows.length).toSeq)
      rows.foreach(r => assert(r.getAs[Double]("dist") >= 0.0))
    }
  }

  test("seasonality slots partition the stream and flag peaks exactly") {
    val ev = Tables.events(spark, sf)
    val out = graft.ops.Events.seasonality(ev).collect()
    assert(out.nonEmpty)
    val total = ev.count()
    // slots partition the events
    assert(out.map(_.getAs[Long]("n_events")).sum == total)
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-2)
    out.foreach { r =>
      val dow = r.getAs[Long]("dow"); val hod = r.getAs[Long]("hod")
      assert(dow >= 1 && dow <= 7 && hod >= 0 && hod <= 23)
      // the peak flag is the exact integer comparison, replayed
      assert(r.getAs[Boolean]("is_peak") ==
        (r.getAs[Long]("n_events") * 336L > total * 3L))
    }
  }

  test("type co-occurrence lift is exact against a hand-built contingency") {
    import spark.implicits._
    import java.sql.Timestamp
    // users 1-4: {a,b}, {a,b}, {a}, {b} -> n_a=3, n_b=3, n_both=2, n=4
    val rows = Seq(
      (1L, 1L, "a"), (2L, 1L, "b"), (3L, 2L, "a"), (4L, 2L, "b"),
      (5L, 3L, "a"), (6L, 4L, "b"), (7L, 1L, "a") // duplicate presence
    ).map { case (e, u, t) => (e, new Timestamp(e * 1000), u, t, 1.0) }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.typeCooccurrence(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("type_a") == "a" && r.getAs[String]("type_b") == "b")
    assert(r.getAs[Long]("n_both") == 2L)
    // lift = (2/4) / ((3/4)*(3/4)) = 0.8889
    assert(math.abs(r.getAs[Double]("lift") - 0.8889) < 1e-4)
  }

  test("trigrams count per-user 3-step paths, never crossing users") {
    import spark.implicits._
    import java.sql.Timestamp
    val rows = Seq(
      (1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c"), (4L, 1L, "a"),
      // user 2 contributes one a-b-c; the boundary never stitches
      // user 1's tail to user 2's head
      (5L, 2L, "a"), (6L, 2L, "b"), (7L, 2L, "c")
    ).map { case (e, u, t) => (e, new Timestamp(e * 1000), u, t, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.typeTrigrams(rows).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getAs[Long]("n")).toMap
    assert(out == Map(("a", "b", "c") -> 2L, ("b", "c", "a") -> 1L),
      s"got $out")
  }

  test("attribution credits the last non-purchase touch, direct when none") {
    import spark.implicits._
    import java.sql.Timestamp
    val rows = Seq(
      // user 1: click -> purchase(10), view -> purchase(5)
      (1L, 1L, "click", 0.0), (2L, 1L, "purchase", 10.0),
      (3L, 1L, "view", 0.0), (4L, 1L, "purchase", 5.0),
      // user 2: first event is a purchase -> direct; the NEXT purchase
      // still looks through the earlier purchase and finds nothing
      (5L, 2L, "purchase", 2.0), (6L, 2L, "purchase", 3.0),
      // user 3: click, then two purchases — BOTH credit the click
      // (purchases never become the carry)
      (7L, 3L, "click", 0.0), (8L, 3L, "purchase", 1.0),
      (9L, 3L, "purchase", 4.0)
    ).map { case (e, u, t, v) => (e, new Timestamp(e * 1000), u, t, v) }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.attribution(ev).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Double]("attributed_value")))
      .toMap
    assert(out == Map(
      "click" -> (3L, 15.0), "view" -> (1L, 5.0), "direct" -> (2L, 5.0)),
      s"got $out")
  }

  test("concurrency sweep: overlaps, same-instant touch, midnight clip") {
    import spark.implicits._
    import java.sql.Timestamp
    def at(sec: Long, id: Long, user: Long) =
      (id, new Timestamp(sec * 1000), user, "click", 1.0)
    val rows = Seq(
      at(1000, 1, 1), at(2000, 2, 1),   // u1 session [1000, 2000]
      at(1500, 3, 2), at(2500, 4, 2),   // u2 session [1500, 2500]
      at(10000, 5, 3),                  // u3 point session
      at(86100, 6, 4), at(86700, 7, 4), // u4 spans midnight
      at(5000, 8, 5), at(5000, 9, 6))   // u5/u6 touch at one instant
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.concurrency(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("peak_concurrent"))).toMap
    // day 0: six sessions touch it; u1∩u2 overlap and the u5/u6
    // same-instant touch both peak at 2. day 1: only u4's clipped tail
    assert(out == Map("1970-01-01" -> (6L, 2L), "1970-01-02" -> (1L, 1L)),
      s"got $out")
  }

  test("robust anomaly: median/MAD shrug off the outlier that drags mean/sigma") {
    import spark.implicits._
    import java.sql.Timestamp
    def at(id: Long, typ: String, v: Double) =
      (id, new Timestamp(id * 1000), 1L, typ, v)
    // type t: [1,2,3,4,100] → med = 3 (rank 2), deviations sorted
    // [0,1,1,2,97] → mad = 1; only the 100 exceeds med ± 3·mad.
    // (mean/σ would put the mean at 22 and σ at ~43 — NOTHING alarms
    // there, which is exactly the failure this operator fixes.)
    // type c is constant: mad = 0 and nothing is an outlier.
    // type e has EVEN n: the LOWER median convention (rank
    // (n−1) div 2 — [1,2,3,4] → 2, never 2.5 or 3) is the one knob
    // where engines could silently disagree, so pin it directly
    val rows = Seq(at(1, "t", 1), at(2, "t", 2), at(3, "t", 3),
      at(4, "t", 4), at(5, "t", 100),
      at(6, "c", 5), at(7, "c", 5), at(8, "c", 5),
      at(9, "e", 1), at(10, "e", 2), at(11, "e", 3), at(12, "e", 4))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.anomalyRobust(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Long]("n_outliers"), r.getAs[Double]("outlier_rate"))))
      .toMap
    assert(out("t") == ((5L, 3.0, 1.0, 1L, 0.2)), s"got $out")
    assert(out("c") == ((3L, 5.0, 0.0, 0L, 0.0)), s"got $out")
    // deviations from med=2: [1,0,1,2] sorted rank 1 → mad = 1
    assert(out("e") == ((4L, 2.0, 1.0, 0L, 0.0)), s"got $out")
  }

  test("session lengths bin durations exactly, point sessions in bin 0") {
    import spark.implicits._
    import java.sql.Timestamp
    def at(sec: Long, id: Long, user: Long) =
      (id, new Timestamp(sec * 1000), user, "click", 1.0)
    // durations (µs): u1/u2 1e9, u3/u5/u6 points (0), u4 6e8
    val rows = Seq(
      at(1000, 1, 1), at(2000, 2, 1), at(1500, 3, 2), at(2500, 4, 2),
      at(10000, 5, 3), at(86100, 6, 4), at(86700, 7, 4),
      at(5000, 8, 5), at(5000, 9, 6))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.sessionLengths(ev).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("dur_lo_us"), r.getAs[Long]("n_sessions"),
          r.getAs[Double]("share")))).toMap
    // lo=0, hi=1e9, width unit hi−lo+1: bin = dur·20 div (1e9+1)
    assert(out == Map(
      0L -> ((0L, 3L, 0.5)),
      11L -> ((550000000L, 1L, 0.1667)),
      19L -> ((950000000L, 2L, 0.3333))), s"got $out")
  }

  test("concurrency is invariant to the sweep band width") {
    import spark.implicits._
    import java.sql.Timestamp
    def at(sec: Long, id: Long, user: Long) =
      (id, new Timestamp(sec * 1000), user, "click", 1.0)
    val rows = Seq(
      at(1000, 1, 1), at(2000, 2, 1), at(1500, 3, 2), at(2500, 4, 2),
      at(10000, 5, 3), at(86100, 6, 4), at(86700, 7, 4),
      at(5000, 8, 5), at(5000, 9, 6))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(bandSec: Long) = Events.concurrency(ev, bandSec = bandSec)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("peak_concurrent")))
      .toMap
    val base = run(3600L)
    // a width that does NOT divide the day, a tiny one that splits
    // every session, and one band per day (the old day-wide sweep)
    assert(run(7L) == base)
    assert(run(777L) == base)
    assert(run(86400L) == base)
  }

  test("debounce keeps one event per burst, chains included") {
    import spark.implicits._
    import java.sql.Timestamp
    def at(sec: Long, id: Long, user: Long, typ: String) =
      (id, new Timestamp(sec * 1000), user, typ, 1.0)
    val rows = Seq(
      // u1 clicks: chain 0-3-6s (sub-gap links) keeps ONLY the first,
      // then a fresh burst at 100s
      at(0, 1, 1, "click"), at(3, 2, 1, "click"), at(6, 3, 1, "click"),
      at(100, 4, 1, "click"),
      // same instants, different type/user: independent streams
      at(0, 5, 1, "view"), at(3, 6, 2, "click"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.debounce(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"),
          r.getAs[Double]("drop_rate"))).toMap
    assert(out("click") == ((5L, 3L, 0.4)), s"got $out")
    assert(out("view") == ((1L, 1L, 0.0)), s"got $out")
  }

  test("coactivity joins overlapping sessions once, even across midnight") {
    import spark.implicits._
    import java.sql.Timestamp
    def at(sec: Long, id: Long, user: Long) =
      (id, new Timestamp(sec * 1000), user, "click", 1.0)
    val rows = Seq(
      // u1/u2 overlap [1500, 2000] (501s); u3 disjoint
      at(1000, 1, 1), at(2000, 2, 1),
      at(1500, 3, 2), at(2500, 4, 2),
      at(9000, 5, 3),
      // u4/u5 overlap STRADDLES midnight: one overlap, not two
      // (both sessions touch bands day0 and day1 — distinct dedupes)
      at(86100, 6, 4), at(86700, 7, 4),
      at(86200, 8, 5), at(86800, 9, 5))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.coactivity(ev).collect()
      .map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b")) ->
        (r.getAs[Long]("n_overlaps"), r.getAs[Long]("shared_us"))).toMap
    assert(out == Map(
      (1L, 2L) -> (1L, 500000001L),
      (4L, 5L) -> (1L, 500000001L)), s"got $out")
    // the banded plan never degenerates into a cartesian product
    val plan = Events.coactivity(ev).queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan.take(400))
    // band width shapes the join's fan-out, never the result: a
    // width that splits the u1/u2 overlap across many bands, one
    // that spans both days, and one that doesn't divide the day
    def run(bandSec: Long) = Events.coactivity(ev, bandSec = bandSec)
      .collect().map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b")) ->
        (r.getAs[Long]("n_overlaps"), r.getAs[Long]("shared_us"))).toMap
    val base = run(3600L)
    assert(run(60L) == base)
    assert(run(777L) == base)
    assert(run(172800L) == base)
  }

  test("value drift: a shifted second half fires KS, a stable one does not") {
    import spark.implicits._
    import java.sql.Timestamp
    // time range [0s, 1000s] → split at 500s. Type "stable" repeats
    // the same values in both halves (ks = 0); type "shifted" moves
    // from the bottom of the range to the top (ks → 1)
    val rows =
      (1 to 50).map(i => (i.toLong, new Timestamp(i * 1000L), 1L,
        "stable", (i % 10).toDouble)) ++
      (1 to 50).map(i => (100L + i, new Timestamp(600000L + i * 1000L), 1L,
        "stable", (i % 10).toDouble)) ++
      (1 to 50).map(i => (200L + i, new Timestamp(i * 1000L), 1L,
        "shifted", (i % 10).toDouble)) ++
      (1 to 50).map(i => (300L + i, new Timestamp(600000L + i * 1000L), 1L,
        "shifted", 90.0 + (i % 10))) :+
      // pin the global range so bins are stable: [0, 100]
      (999L, new Timestamp(1000L), 1L, "stable", 100.0)
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.valueDrift(ev).collect()
      .map(r => r.getAs[String]("etype") ->
        (r.getAs[Double]("ks"), r.getAs[Boolean]("drifted"))).toMap
    assert(out("shifted")._1 > 0.9 && out("shifted")._2, s"got $out")
    assert(out("stable")._1 < 0.05 && !out("stable")._2, s"got $out")
    // counts partition exactly at the midpoint
    val ns = Events.valueDrift(ev).collect()
      .map(r => r.getAs[String]("etype") ->
        (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"))).toMap
    assert(ns("shifted") == ((50L, 50L)), s"got $ns")
    assert(ns("stable") == ((51L, 50L)), s"got $ns")
  }

  test("value drift: a type present in only one window fires ks = 1") {
    import spark.implicits._
    import java.sql.Timestamp
    // "vanished" exists only before the midpoint, "born" only after;
    // both are the maximal shift, neither may report a NULL the
    // drifted-filter would silently drop
    val rows = Seq(
      (1L, 10L, "vanished", 1.0), (2L, 20L, "vanished", 2.0),
      (3L, 30L, "both", 0.0), (4L, 900L, "both", 100.0),
      (5L, 910L, "born", 50.0), (6L, 920L, "born", 60.0))
      .map { case (e, s, t, v) => (e, new Timestamp(s * 1000), 1L, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.valueDrift(rows).collect()
      .map(r => r.getAs[String]("etype") ->
        (r.getAs[Double]("ks"), r.getAs[Boolean]("drifted"))).toMap
    assert(out("vanished") == ((1.0, true)), s"got $out")
    assert(out("born") == ((1.0, true)), s"got $out")
    assert(!out("both")._1.isNaN)
  }

  test("value drift ECDFs are exact on a hand-computed two-bin case") {
    import spark.implicits._
    import java.sql.Timestamp
    // range [0,100] → 20 bins of width 5. ref: 4 values in bin 0,
    // cur: 2 in bin 0 + 2 in bin 19 → max |F diff| = |1.0 - 0.5| at
    // bins 0..18
    val rows = Seq(
      (1L, 10L, 0.0), (2L, 20L, 1.0), (3L, 30L, 2.0), (4L, 40L, 3.0),
      (5L, 900L, 0.0), (6L, 910L, 1.0), (7L, 920L, 100.0), (8L, 930L, 99.0))
      .map { case (e, s, v) => (e, new Timestamp(s * 1000), 1L, "t", v) }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.valueDrift(ev).collect().head
    assert(r.getAs[Long]("n_ref") == 4L && r.getAs[Long]("n_cur") == 4L)
    assert(math.abs(r.getAs[Double]("ks") - 0.5) < 1e-9, s"got $r")
    assert(r.getAs[Boolean]("drifted"))
  }

  /** (day, count) pairs → that many same-type events on each day. */
  private def dailyEv(etype: String, dayCounts: (Int, Int)*) = {
    var id = 0L
    ev(dayCounts.flatMap { case (day, n) =>
      (0 until n).map { i =>
        id += 1
        (id, day.toLong * 86400L + i, id, etype)
      }
    }: _*)
  }

  test("gap plan facets gaps by opening type with exact bp ranks") {
    // one user: A@0 → B@10s → A@30s → A@100s. Gaps attribute to the
    // OPENING event's type: A opens 10s and 70s, B opens 20s
    val events = ev(
      (1L, 0L, 1L, "A"), (2L, 10L, 1L, "B"),
      (3L, 30L, 1L, "A"), (4L, 100L, 1L, "A"))
    val out = Events.gapPlan(events).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("n_gaps") == 2L)
    // ranks over n=2: (n−1)·bp div 10000 = 0 for all three → 10s
    assert(a.getAs[Long]("p50_gap_us") == 10000000L)
    assert(a.getAs[Long]("p99_gap_us") == 10000000L)
    assert(a.getAs[Long]("max_gap_us") == 70000000L)
    assert(a.getAs[Long]("gap_rec_sec") == 11L)
    val b = out("B")
    assert(b.getAs[Long]("n_gaps") == 1L)
    assert(b.getAs[Long]("p50_gap_us") == 20000000L)
    assert(b.getAs[Long]("gap_rec_sec") == 21L)
    // gaps never cross users: a second user's lone event adds nothing
    val out2 = Events.gapPlan(events.unionByName(
      ev((9L, 50L, 2L, "A")))).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n_gaps")).toMap
    assert(out2("A") == 2L)
  }

  test("ema baseline excludes today, weights recent days double, " +
      "flags bursts") {
    val events = dailyEv("t", (0, 2), (1, 6), (2, 40))
    val rows = Events.ema(events).orderBy("day").collect()
    // first day has no history: NULL level, no burst
    assert(rows(0).isNullAt(rows(0).fieldIndex("ema")))
    assert(!rows(0).getAs[Boolean]("is_burst"))
    // day1 baseline is day0 alone
    assert(rows(1).getAs[Double]("ema") == 2.0)
    assert(rows(1).getAs[Double]("burst_ratio") == 3.0)
    assert(rows(1).getAs[Boolean]("is_burst"))
    // day2 baseline: (6·2^15 + 2·2^14)/(2^15 + 2^14) = 14/3 —
    // yesterday counts double vs the day before
    val expected = BigDecimal(14.0 / 3.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(2).getAs[Double]("ema") == expected)
    assert(rows(2).getAs[Boolean]("is_burst")) // 40 ≫ 2×(14/3)
  }

  test("autocorrelation nails a planted period-2 series") {
    // counts 1,3,1,3,1,3,1,3: perfectly anti-correlated at lag 1,
    // perfectly correlated at lag 2
    val events = dailyEv("t", (0 to 7).map(d => (d, if (d % 2 == 0) 1 else 3)): _*)
    val rows = Events.autocorrelation(events).orderBy("lag")
      .collect().map(r => (r.getAs[Long]("lag"), r.getAs[Long]("n_pairs"),
        r.getAs[Double]("acf"))).toList
    assert(rows == List((1L, 7L, -1.0), (2L, 6L, 1.0), (3L, 5L, -1.0)))
  }

  test("autocorrelation's dense grid counts a silent day as zero") {
    // days 0,1,3 have events, day 2 is quiet: the span is 4 days, so
    // lag-1 has 3 pairs and the zero day participates in them
    val events = dailyEv("t", (0, 2), (1, 4), (3, 4))
    val lag1 = Events.autocorrelation(events, maxLag = 1).collect().head
    assert(lag1.getAs[Long]("n_pairs") == 3L)
    // series 2,4,0,4: pairs (4,2),(0,4),(4,0) → corr computed over
    // a-side mean 8/3 — just pin it against a direct computation
    val xs = Seq(4.0, 0.0, 4.0); val ys = Seq(2.0, 4.0, 0.0)
    val mx = xs.sum / 3; val my = ys.sum / 3
    val expected = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum /
      math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
        ys.map(b => (b - my) * (b - my)).sum)
    assert(math.abs(lag1.getAs[Double]("acf") -
      BigDecimal(expected).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
  }

  test("changepoint finds a planted level shift with the exact statistic") {
    // 5 days at 2/day then 5 days at 8/day: split after day 4,
    // stat = |2-8|·sqrt(5·5/10)
    val events = dailyEv("t",
      ((0 to 4).map(d => (d, 2)) ++ (5 to 9).map(d => (d, 8))): _*)
    val r = Events.changepoint(events).collect().head
    assert(r.getAs[Long]("n_left") == 5L && r.getAs[Long]("n_days") == 10L)
    assert(r.getAs[Double]("mean_left") == 2.0)
    assert(r.getAs[Double]("mean_right") == 8.0)
    val stat = 6.0 * math.sqrt(25.0 / 10.0)
    assert(math.abs(r.getAs[Double]("shift_stat") -
      BigDecimal(stat).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    assert(r.getAs[java.sql.Date]("split_day").toString == "1970-01-05")
  }

  test("changepoint tie-breaks a flat series to the earliest split day") {
    val events = dailyEv("t", (0 to 4).map(d => (d, 3)): _*)
    val r = Events.changepoint(events).collect().head
    assert(r.getAs[Double]("shift_stat") == 0.0)
    assert(r.getAs[Long]("n_left") == 1L)
    assert(r.getAs[java.sql.Date]("split_day").toString == "1970-01-01")
  }

  test("trend recovers a planted line exactly and forecasts one step out") {
    // counts 3 + 2x for x = 0..5 → slope 2, intercept 3, r² 1,
    // forecast at x = 6 is 15
    val events = dailyEv("t", (0 to 5).map(d => (d, 3 + 2 * d)): _*)
    val r = Events.trend(events).collect().head
    assert(r.getAs[Long]("n_days") == 6L)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 3.0)
    assert(r.getAs[Double]("r2") == 1.0)
    assert(r.getAs[Double]("forecast_next") == 15.0)
  }

  test("trend on a degenerate series keeps the NULL contract") {
    // one day → var(x) = 0 → slope/intercept/forecast NULL; constant
    // counts over many days → slope 0 but r² NULL (var(y) = 0)
    val one = Events.trend(dailyEv("t", (0, 4))).collect().head
    assert(one.isNullAt(one.fieldIndex("slope")))
    assert(one.isNullAt(one.fieldIndex("forecast_next")))
    val const = Events.trend(dailyEv("t", (0, 3), (1, 3), (2, 3))).collect().head
    assert(const.getAs[Double]("slope") == 0.0)
    assert(const.isNullAt(const.fieldIndex("r2")))
  }

  test("backtest: perfect line beats persistence, alternator loses") {
    val day = 86400L
    // type "lin": counts 1,2,3,4 over days 0-3 — every refit is the
    // exact line (model MAE 0), persistence always off by 1.
    // type "alt": counts 10,0,10,1 (the zero day is dailySeries'
    // grid fill — the span must END on an observed day)
    def mk(t: String, day0: Long, perDay: Seq[Int], base: Long) =
      perDay.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(i =>
          (base + d * 100L + i, day0 + d * day + i, 1L, t))
      }
    val rows = mk("lin", 0L, Seq(1, 2, 3, 4), 1000L) ++
      mk("alt", 0L, Seq(10, 0, 10, 1), 2000L)
    val got = graft.ops.Events.backtest(ev(rows: _*))
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_folds"), r.getAs[Double]("mae_model"),
          r.getAs[Double]("mae_naive"),
          r.getAs[Boolean]("beats_naive")))).toMap
    assert(got("lin") == ((2L, 0.0, 1.0, true)), s"got ${got("lin")}")
    // alt folds: t=1 trains (10,0) → fcst(2) = -10, actual 10, err
    // 20 (naive 10); t=2 trains (10,0,10) → slope 0, icpt 20/3,
    // actual 1, err 17/3 (naive 9). mae = (20 + 17/3)/2 = 77/6
    val m = got("alt")
    assert(m._1 == 2L && m._2 == 12.8333 && m._3 == 9.5 && !m._4,
      s"got $m")
    // a 2-day type has zero scoreable folds and is absent
    val two = graft.ops.Events.backtest(
      ev(mk("t2", 0L, Seq(1, 1), 1L): _*)).collect()
    assert(two.isEmpty)
  }

  test("cumulative uniques: first-seen identity, quiet day carries flat") {
    // u1 on days 0,1,3 (two events day0 — dedup within day); u2 on
    // day1; u3 on day3; day2 silent
    val events = ev(
      (1L, 10L, 1L, "a"), (2L, 20L, 1L, "a"),
      (3L, 86410L, 1L, "a"), (4L, 86420L, 2L, "a"),
      (5L, 3 * 86400L + 10L, 1L, "a"), (6L, 3 * 86400L + 20L, 3L, "a"))
    val rows = Events.cumulativeUniques(events).orderBy("day").collect()
      .map(r => (r.getAs[Long]("actives"), r.getAs[Long]("new_users"),
        r.getAs[Long]("returning"), r.getAs[Long]("cum_uniques"))).toList
    assert(rows == List(
      (1L, 1L, 0L, 1L),  // u1 arrives
      (2L, 1L, 1L, 2L),  // u2 new, u1 returns
      (0L, 0L, 0L, 2L),  // silent day: explicit zeros, cum flat
      (2L, 1L, 1L, 3L))) // u3 new, u1 returns
  }

  test("burst: active-minute baseline, earliest tied peak, flat heartbeat") {
    // type a: 8 events in 4 active minutes — peak minute 0 holds 4 →
    // ratio 4/(8/4) = 2.0 exactly; minutes 2 and 3 hold 1 each
    // type b: an hourly heartbeat (1 event/active minute) must read
    // ratio exactly 1.0 — never a "burst" against the empty calendar
    // type c: a tie at 2 events (minutes 0 and 1) keeps the EARLIEST
    val events = ev(
      (Seq.fill(4)(0L) ++ Seq(60L, 61L) ++ Seq(120L, 180L)).zipWithIndex
        .map { case (s, i) => (i.toLong, s, 1L, "a") } ++
      Seq((100L, 0L, 1L, "b"), (101L, 3600L, 1L, "b"), (102L, 7200L, 1L, "b")) ++
      Seq((200L, 0L, 1L, "c"), (201L, 1L, 1L, "c"),
        (202L, 60L, 1L, "c"), (203L, 61L, 1L, "c")): _*)
    val got = Events.burst(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_active_minutes"),
          r.getAs[Long]("peak_count"), r.getAs[Long]("peak_minute"),
          r.getAs[Long]("burst_ratio_ppm"), r.getAs[Boolean]("is_burst")))).toMap
    assert(got("a") === ((8L, 4L, 4L, 0L, 2000000L, false)))
    assert(got("b") === ((3L, 3L, 1L, 0L, 1000000L, false)))
    assert(got("c") === ((4L, 2L, 2L, 0L, 1000000L, false)))
    // the threshold knob flips the verdict
    val hot = Events.burst(events, thresholdPpm = 1500000L).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Boolean]("is_burst"))
      .toMap
    assert(hot === Map("a" -> true, "b" -> false, "c" -> false))
  }

  test("funnel latency: strict stage precedence, exact discrete ranks") {
    // u1: 10s then 30s gaps; u2: 100s signup→click, never purchases;
    // u3: click BEFORE signup (unqualified → contributes NO delta,
    // and its purchase has no qualified click to follow); u4: 10s/5s
    val events = ev(
      (1L, 10L, 1L, "signup"), (2L, 20L, 1L, "click"), (3L, 50L, 1L, "purchase"),
      (4L, 0L, 2L, "signup"), (5L, 100L, 2L, "click"),
      (6L, 5L, 3L, "click"), (7L, 10L, 3L, "signup"), (8L, 20L, 3L, "purchase"),
      (9L, 0L, 4L, "signup"), (10L, 10L, 4L, "click"), (11L, 15L, 4L, "purchase"))
    val got = Events.funnelLatency(events).collect()
      .map(r => r.getAs[String]("stage_pair") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("p50_us"),
          r.getAs[Long]("p90_us")))).toMap
    // s2c deltas sorted: [10s, 10s, 100s] → rank1 = 10s at both cuts
    // (floor(2·.5) = floor(2·.9) = 1); c2p: [5s, 30s] → rank 0 = 5s
    assert(got === Map(
      "signup_to_click" -> ((3L, 10000000L, 10000000L)),
      "click_to_purchase" -> ((2L, 5000000L, 5000000L))), s"$got")
  }

  test("rate windows: trailing peak per user, earliest tie, window edges") {
    // user 1: 0s, 30s, 50s, 200s under a 60s window — trailing counts
    // 1, 2, 3, 1 (the 200s event sees nobody: 140s < t ≤ 200s is
    // empty besides itself). user 2: two isolated events, counts tie
    // at 1 — the EARLIEST one must be the peak. user 3: exactly-60s
    // spacing — the window is (t−60, t], so the earlier event is OUT
    val events = ev(
      (1L, 0L, 1L, "a"), (2L, 30L, 1L, "a"), (3L, 50L, 1L, "a"),
      (4L, 200L, 1L, "a"),
      (5L, 0L, 2L, "a"), (6L, 1000L, 2L, "a"),
      (7L, 0L, 3L, "a"), (8L, 60L, 3L, "a"))
    val got = Events.rateWindows(events, windowSec = 60).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("peak_count"), r.getAs[Long]("peak_at_us"),
          r.getAs[Long]("peak_event_id")))).toMap
    assert(got === Map(
      1L -> ((3L, 50000000L, 3L)),
      2L -> ((1L, 0L, 5L)),
      3L -> ((1L, 0L, 7L))), s"$got")
  }

  test("top paths: session split at the gap, step order, maxSteps cap, tie-break") {
    // user 1, session 1: a>b>c; then a 2000s silence opens session 2: d
    // user 2: a>b>c (same journey — count 2); user 3: ten 'x' events
    // 1s apart — ONE session, path capped at maxSteps=8 x's
    val tenX = (0 until 10).map(i => (100L + i, 5000L + i, 3L, "x"))
    val events = ev((Seq(
      (1L, 0L, 1L, "a"), (2L, 10L, 1L, "b"), (3L, 20L, 1L, "c"),
      (4L, 2500L, 1L, "d"),
      (5L, 0L, 2L, "a"), (6L, 5L, 2L, "b"), (7L, 9L, 2L, "c")) ++ tenX): _*)
    val got = Events.topPaths(events, k = 10).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n_sessions")).toMap
    assert(got === Map(
      "a>b>c" -> 2L, "d" -> 1L,
      "x>x>x>x>x>x>x>x" -> 1L), s"$got")
    // k cuts on (count DESC, path ASC): k=1 keeps the a>b>c journey
    val top1 = Events.topPaths(events, k = 1).collect()
    assert(top1.length === 1 && top1(0).getString(0) === "a>b>c")
  }

  test("churn curve: lifetime ecdf with exact at-risk, hazard and survival lines") {
    val day = 86400L
    // u1 churns day 0; u2,u3 churn day 2; u4 never signed up (excluded)
    val events = ev(
      (1L, 0L, 1L, "signup"), (2L, 100L, 1L, "click"),
      (3L, 0L, 2L, "signup"), (4L, 2 * day, 2L, "click"),
      (5L, 0L, 3L, "signup"), (6L, 2 * day + 5, 3L, "view"),
      (7L, 0L, 4L, "click"))
    val got = Events.churnCurve(events).collect()
      .map(r => r.getAs[Long]("lifetime_days") ->
        ((r.getAs[Long]("n_at_risk"), r.getAs[Long]("churned"),
          r.getAs[Long]("hazard_ppm"), r.getAs[Long]("surviving_ppm")))).toMap
    assert(got === Map(
      0L -> ((3L, 1L, 333333L, 666666L)),
      2L -> ((2L, 2L, 1000000L, 0L))), s"$got")
  }

  test("metronome: even ticker reads cv2=0, bursty user scores higher, " +
    "thin users excluded") {
    // u1: five exactly-10s gaps → cv² = 0. u2: gaps 10,30,10,30,20s →
    // moments give exactly 200000 ppm. u3: two gaps only → below floor
    val events = ev(
      (1L, 0L, 1L, "a"), (2L, 10L, 1L, "a"), (3L, 20L, 1L, "a"),
      (4L, 30L, 1L, "a"), (5L, 40L, 1L, "a"), (6L, 50L, 1L, "a"),
      (11L, 0L, 2L, "a"), (12L, 10L, 2L, "a"), (13L, 40L, 2L, "a"),
      (14L, 50L, 2L, "a"), (15L, 80L, 2L, "a"), (16L, 100L, 2L, "a"),
      (21L, 0L, 3L, "a"), (22L, 5L, 3L, "a"), (23L, 9L, 3L, "a"))
    val got = Events.metronome(events).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("mean_gap_us"),
          r.getAs[Long]("cv2_ppm"))))
    assert(got.toSeq === Seq(
      1L -> ((5L, 10000000L, 0L)),
      2L -> ((5L, 20000000L, 200000L))), s"${got.toSeq}")
  }

  test("cohort ltv: integer cents, per-cohort cumulative line, per-signup division") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(d * 86400000L)
    // two signups in the epoch week; only u1 returns in offset-1 week
    val events = Seq(
      (1L, t(0), 1L, "signup", 10.00),
      (2L, t(0), 2L, "signup", 0.75),
      (3L, t(8), 1L, "purchase", 2.50))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.cohortValue(events).collect()
      .map(r => r.getAs[Long]("week_offset") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("value_cents"),
          r.getAs[Long]("cum_value_cents"), r.getAs[Long]("cohort_n"),
          r.getAs[Long]("ltv_per_signup_cents")))).toMap
    assert(got === Map(
      0L -> ((2L, 1075L, 1075L, 2L, 537L)),
      1L -> ((1L, 250L, 1325L, 2L, 662L))), s"$got")
  }
}
