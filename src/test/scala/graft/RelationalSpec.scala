package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.text.TextAnalysis

class RelationalSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  test("flagship q1 aggregates are sane") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9) // |returnflag| x |linestatus|
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("avg_disc") >= 0 && r.getAs[Double]("avg_disc") <= 0.1)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("topn returns exactly n rows ordered by revenue") {
    val rows = Relational.q3MultiJoin(spark, sf).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("sessionization: every user has at least one session") {
    val rows = Relational.q16Sessionize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1)
      assert(r.getAs[Long]("max_session_events") >= 1)
    }
  }

  test("approx distinct certification flags hold and exacts match q7") {
    val exact = Relational.q7Distinct(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("n_parts"))).toMap
    val approx = Relational.q7ApproxDistinct(spark, sf).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (orders, parts) = exact(r.getAs[String]("l_returnflag"))
      // the query certifies its own sketch: exact columns must agree
      // with the exact-only twin, and the 3-sigma (rsd 0.05 → 15%)
      // bound flags must hold on this data
      assert(r.getAs[Long]("n_orders") == orders)
      assert(r.getAs[Long]("n_parts") == parts)
      assert(r.getAs[Boolean]("orders_within_3rsd"))
      assert(r.getAs[Boolean]("parts_within_3rsd"))
    }
  }

  test("HLL sketch build-merge-estimate certifies against the exact count") {
    val exact = Relational.q7Distinct(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_orders")).toMap
    val est = Relational.q7HllSketch(spark, sf).collect()
    assert(est.length == exact.size)
    est.foreach { r =>
      // the union of per-linestatus sketches estimates the same key
      // set the exact count sees; DataSketches HLL at default lgK
      // lands well within 5% at these cardinalities
      assert(r.getAs[Long]("n_orders") == exact(r.getAs[String]("l_returnflag")))
      assert(r.getAs[Boolean]("est_within_3sigma"))
    }
  }

  test("histogram rank selection equals Spark's own exact percentile") {
    // the two-pass (histogram → in-bin rank) formulation must
    // reproduce the whole-group-sort numbers bit-for-bit: same
    // boundary order statistics, same interpolation, same 2dp round
    val got = Relational.q17Quantiles(spark, sf).collect().map(r =>
      r.getAs[String]("o_orderstatus") ->
        ((r.getAs[Double]("p25"), r.getAs[Double]("p50"),
          r.getAs[Double]("p90"), r.getAs[Long]("n")))).toMap
    import org.apache.spark.sql.functions.{count, expr, lit, round}
    val exp = Tables.orders(spark, sf).groupBy("o_orderstatus")
      .agg(round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        count(lit(1)).as("n"))
      .collect().map(r =>
        r.getAs[String]("o_orderstatus") ->
          ((r.getAs[Double]("p25"), r.getAs[Double]("p50"),
            r.getAs[Double]("p90"), r.getAs[Long]("n")))).toMap
    assert(got == exp, s"got $got\nexp $exp")
  }

  test("approx quantiles sit inside the exact p±0.005 rank bands") {
    val exact = Relational.q17Quantiles(spark, sf).collect()
      .map(r => r.getAs[String]("o_orderstatus") -> r.getAs[Double]("p50")).toMap
    val approx = Relational.q17ApproxQuantiles(spark, sf).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      // exact columns replicate q17_quantiles; the sketch estimates
      // must fall inside the rank bands (5x the rated 1/1000 error)
      assert(r.getAs[Double]("p50") == exact(r.getAs[String]("o_orderstatus")))
      assert(r.getAs[Boolean]("p25_in_band"))
      assert(r.getAs[Boolean]("p50_in_band"))
      assert(r.getAs[Boolean]("p90_in_band"))
    }
  }

  test("range window counts include the current row and only look back") {
    val rows = Relational.q19RangeWindow(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_30d") >= 1))
  }

  test("grouping sets emit the three declared granularities") {
    val rows = Relational.q20GroupingSets(spark, sf).collect()
    val gids = rows.map(_.getAs[Long]("gid")).toSet
    assert(gids == Set(0L, 1L, 2L)) // (status,prio), (status,·), (·,prio)
    // marginals each re-aggregate the full table
    val total = rows.filter(_.getAs[Long]("gid") == 0L).map(_.getAs[Long]("n")).sum
    assert(rows.filter(_.getAs[Long]("gid") == 1L).map(_.getAs[Long]("n")).sum == total)
    assert(rows.filter(_.getAs[Long]("gid") == 2L).map(_.getAs[Long]("n")).sum == total)
  }

  test("contamination excludes the benchmark source and scores are consistent") {
    val rows = TextAnalysis.contamination(Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("source") != "src0")
      val shared = r.getAs[Long]("n_shared")
      assert(shared >= 0)
      assert(r.getAs[Boolean]("contaminated") == (shared >= 5))
    }
  }

  test("bigram LM log-probabilities are non-positive") {
    val rows = TextAnalysis.bigramLmScore(Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    // c(w1 w2) <= c(w1) always, so every log term (and the mean) is <= 0
    rows.foreach(r => assert(r.getAs[Double]("avg_logp") <= 0.0))
  }

  test("language id predicts a language for every doc") {
    val rows = TextAnalysis.langId(Tables.documents(spark, sf)).collect()
    assert(rows.length == 500)
    val langs = rows.map(_.getAs[String]("pred_lang")).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "und")))
  }

  test("quality score stays in [0, 1]") {
    val rows = TextAnalysis.qualityScore(Tables.documents(spark, sf)).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("bloom-prefiltered contamination equals the exact operator") {
    val docs = Tables.documents(spark, sf)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).toSet
    val exact = canon(TextAnalysis.contamination(docs))
    val bloomed = canon(TextAnalysis.contaminationBloom(docs))
    assert(bloomed == exact && exact.nonEmpty)
  }

  test("pattern scan counts digit runs, capitalized words, emails") {
    import spark.implicits._
    val doc = Seq((1L, "Call Bob at 555 1234 or mail bob99@mail.com now"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.patternScan(doc).head()
    assert(r.getAs[Long]("n_digit_runs") == 3L)    // 555, 1234, 99
    assert(r.getAs[Long]("n_capitalized") == 2L)   // Call, Bob
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("redacted_len") ==
      "Call Bob at 555 1234 or mail bob99@mail.com now".count(!_.isDigit))
  }

  test("banded range join equals the brute-force trailing-window count") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val out = Relational.q30RangeBand(spark, sf).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (r.getAs[Long]("n_clicks"), r.getAs[Double]("click_value"))).toMap
    // brute-force reference over the same events
    val W = 600L * 1000000L
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      .collect()
    val clicks = ev.filter(_.getAs[String]("event_type") == "click")
      .map(r => (r.getAs[Long]("us"), r.getAs[Double]("value")))
    val purchases = ev.filter(_.getAs[String]("event_type") == "purchase")
    assert(out.size == purchases.length && out.nonEmpty)
    purchases.foreach { p =>
      val pus = p.getAs[Long]("us")
      val hits = clicks.filter { case (cus, _) => cus > pus - W && cus <= pus }
      val (n, v) = out(p.getAs[Long]("event_id"))
      assert(n == hits.length)
      assert(math.abs(v - hits.map(_._2).sum) < 0.01)
    }
    // the plan must be a hash/band join, not a nested-loop cartesian
    val plan = Relational.q30RangeBand(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("recursive chain walk: roots self-rooted at depth 0, chains descend from them") {
    val rows = Relational.q26Recursive(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (root, doc, depth) =>
      if (depth == 0L) assert(root == doc)
      else assert(root < doc && depth > 0)
    }
    // each doc reached exactly once (chains are disjoint linked lists)
    assert(rows.map(_._2).distinct.length == rows.length)
  }

  test("skew profile ranks the heaviest key of each column first") {
    import org.apache.spark.sql.functions.col
    val out = graft.ops.Relational.keySkewProfile(spark, sf).collect()
    val byCol = out.groupBy(_.getAs[String]("col_name"))
    assert(byCol.keySet == Set("l_orderkey", "l_partkey", "l_suppkey"))
    val li = Tables.lineitem(spark, sf)
    val total = li.count()
    byCol.foreach { case (cn, rows) =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 5L))
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      // counts non-increasing in rank
      val cnts = sorted.map(_.getAs[Long]("cnt")).toSeq
      assert(cnts == cnts.sorted.reverse)
      // rank-1 really is the column's modal key
      val top = li.groupBy(col(cn)).count()
        .orderBy(col("count").desc, col(cn)).limit(1).collect().head
      assert(sorted.head.getAs[Long]("key") == top.getLong(0))
      assert(sorted.head.getAs[Long]("cnt") == top.getLong(1))
      // pct is the exact frequency share
      sorted.foreach { r =>
        assert(math.abs(r.getAs[Double]("pct") -
          r.getAs[Long]("cnt").toDouble / total) < 1e-6) }
    }
  }

  test("value histogram partitions every row once, edges cover the range") {
    val out = Relational.valueHistogram(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_rows")).sum == total)
    val bins = out.map(_.getAs[Long]("bin")).sorted
    assert(bins.head >= 0L && bins.last <= 19L)
    assert(bins.distinct.length == bins.length)
    // bin_lo edges ascend with the bin index
    val edges = out.sortBy(_.getAs[Long]("bin")).map(_.getAs[Double]("bin_lo"))
    assert(edges.zip(edges.tail).forall { case (a, b) => a < b })
    // the max value lands in the clamped top bin
    assert(bins.last == 19L)
  }

  test("dq profile: one row per column, typed bounds, certified sketches") {
    val rows = Relational.dqProfile(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size == 11)
    val n = rows("l_orderkey").getAs[Long]("n_rows")
    assert(n > 0 && rows.values.forall(_.getAs[Long]("n_rows") == n))
    // generator emits no nulls; every sketch must sit within 3·rsd
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_nulls") == 0L)
      assert(r.getAs[Boolean]("distinct_within_3rsd"), r.toString)
    }
    // numeric columns carry numeric bounds and NULL string bounds...
    val q = rows("l_discount")
    assert(q.getAs[Double]("min_num") >= 0.0 &&
      q.getAs[Double]("max_num") <= 0.1 + 1e-9)
    assert(q.getAs[Double]("avg_num") > 0.0)
    assert(q.isNullAt(q.fieldIndex("min_str")))
    // ...string columns the reverse, with sensible cardinality
    val f = rows("l_returnflag")
    assert(f.isNullAt(f.fieldIndex("min_num")))
    assert(f.getAs[String]("min_str") <= f.getAs[String]("max_str"))
    assert(f.getAs[Long]("n_distinct") <= 3L)
    // the timestamp column reports day-grain ISO bounds
    val d = rows("l_shipdate")
    assert(d.getAs[String]("min_str").matches("\\d{4}-\\d{2}-\\d{2}"))
    assert(d.getAs[String]("min_str") <= d.getAs[String]("max_str"))
    // a primary-key-like column: distinct count near the order count
    assert(rows("l_orderkey").getAs[Long]("n_distinct") > n / 10)
  }

  test("unpivot: equals the 4-way union melt, plans as ONE Expand scan") {
    val df = Relational.q38Unpivot(spark, sf)
    val got = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getAs[Long]("n"), r.getAs[Double]("sum_value"),
      r.getAs[Double]("avg_value"))).toSet
    val li = Tables.lineitem(spark, sf)
    val ref = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c => li.select(col("l_returnflag"), lit(c).as("measure"),
        col(c).as("value")))
      .reduce(_ unionAll _)
      .groupBy("l_returnflag", "measure")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"),
        round(avg("value"), 4).as("a"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n"), r.getAs[Double]("s"), r.getAs[Double]("a"))).toSet
    assert(got === ref && got.size === 12) // 3 flags × 4 measures
    // the native unpivot is an Expand over ONE scan — the union
    // formulation above reads the table four times
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.ExpandExec => e }.nonEmpty)
    assert(collectWithSubqueries(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.size === 1)
  }

  test("asof nearest: tie to backward, tolerance fence, explicit null row") {
    import spark.implicits._
    def ev(rows: (Long, Long, Long, String)*) =
      rows.toDF("event_id", "secs", "user_id", "event_type")
        .select(col("event_id"), col("secs").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"), lit(0.0).as("value"),
          lit("{}").as("props"))
    // u1: clicks at 10 and 30, purchase at 20 — equidistant, backward
    //     wins; second purchase at 29 — forward click at 30 is nearer
    // u2: only a click 100s after the purchase — forward match
    // u3: a click 50s BEFORE the purchase, forward none — backward
    // u4: purchase with no clicks at all — explicit null row
    // u5: click 2000s away, tolerance 1000s — fenced out, null row
    val events = ev(
      (1L, 10L, 1L, "click"), (2L, 20L, 1L, "purchase"),
      (3L, 30L, 1L, "click"), (4L, 29L, 1L, "purchase"),
      (10L, 200L, 2L, "purchase"), (11L, 300L, 2L, "click"),
      (20L, 50L, 3L, "click"), (21L, 100L, 3L, "purchase"),
      (30L, 10L, 4L, "purchase"),
      (40L, 10L, 5L, "purchase"), (41L, 2010L, 5L, "click"))
    val got = Relational.asofNearest(events, tolUs = 1000000000L).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        ((Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong),
          Option(r.getAs[String]("direction")),
          Option(r.getAs[java.lang.Long]("gap_us")).map(_.toLong)))).toMap
    assert(got(2L) === ((Some(1L), Some("back"), Some(10000000L))))
    assert(got(4L) === ((Some(3L), Some("fwd"), Some(1000000L))))
    assert(got(10L) === ((Some(11L), Some("fwd"), Some(100000000L))))
    assert(got(21L) === ((Some(20L), Some("back"), Some(50000000L))))
    assert(got(30L) === ((None, None, None)))
    assert(got(40L) === ((None, None, None)))
    assert(got.size === 6) // every purchase present, matched or not
  }

  test("revenue concentration: exact cent thresholds and at-or-above shares") {
    import spark.implicits._
    // ten customers at 1..10 dollars; both bp ranks land on the
    // 0-based rank 8 value (900 cents): shares = 1900/5500
    val orders = (1 to 10).flatMap { c =>
      // two orders per customer summing to c dollars — exercises the
      // per-customer rollup, not just the threshold math
      Seq((c.toLong, c - 0.75), (c.toLong, 0.75))
    }.toDF("o_custkey", "o_totalprice")
    val r = Relational.revenueConcentration(orders).collect()(0)
    assert((r.getAs[Long]("n_customers"), r.getAs[Long]("total_cents"),
      r.getAs[Long]("p90_cents"), r.getAs[Long]("p99_cents"),
      r.getAs[Long]("top10_share_ppm"), r.getAs[Long]("top1_share_ppm")) ===
      ((10L, 5500L, 900L, 900L, 345454L, 345454L)))
  }


  test("rollup: subtotal levels reconcile exactly and flags classify them") {
    val rows = Relational.rollupRevenue(spark, sf).collect()
      .map(r => (r.getAs[Long]("g_year"), r.getAs[Long]("g_status"),
        Option(r.getAs[java.lang.Long]("o_year")).map(_.toLong),
        Option(r.getAs[String]("o_orderstatus")),
        r.getAs[Long]("n_orders"), r.getAs[Long]("revenue_cents")))
    val leaves = rows.filter(r => r._1 == 0 && r._2 == 0)
    val years = rows.filter(r => r._1 == 0 && r._2 == 1)
    val grand = rows.filter(r => r._1 == 1 && r._2 == 1)
    // only the three rollup levels exist; exactly one grand total
    assert(rows.length === leaves.length + years.length + grand.length)
    assert(grand.length === 1 && grand.head._3.isEmpty && grand.head._4.isEmpty)
    // every level sums to the one above it, counts and cents alike
    assert(leaves.map(_._5).sum === grand.head._5)
    assert(leaves.map(_._6).sum === grand.head._6)
    assert(years.map(_._5).sum === grand.head._5)
    for ((gy, gs, y, _, n, cents) <- years) {
      val mine = leaves.filter(_._3 == y)
      assert(mine.map(_._5).sum === n && mine.map(_._6).sum === cents,
        s"year $y does not reconcile")
    }
    // rollup NULLs only ever appear with their flag raised
    assert(rows.forall(r => (r._3.isEmpty) == (r._1 == 1L)))
    assert(rows.forall(r => (r._4.isEmpty) == (r._2 == 1L)))
  }

  test("cube: adds exactly the status-only marginal over rollup and " +
    "every lattice level reconciles to the grand total") {
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("g_year"), r.getAs[Long]("g_status"),
        Option(r.getAs[java.lang.Long]("o_year")).map(_.toLong),
        Option(r.getAs[String]("o_orderstatus")),
        r.getAs[Long]("n_orders"), r.getAs[Long]("revenue_cents")))
    val cube = shape(Relational.cubeRevenue(spark, sf))
    val rollup = shape(Relational.rollupRevenue(spark, sf))
    // the cube is the rollup plus the (year-marginal, status-kept) set
    val marginals = cube.filter(r => r._1 == 1 && r._2 == 0)
    assert(cube.toSet === rollup.toSet ++ marginals.toSet)
    assert(marginals.nonEmpty && marginals.forall(r =>
      r._3.isEmpty && r._4.nonEmpty))
    // the new marginals reconcile to the grand total like every level
    val grand = cube.filter(r => r._1 == 1 && r._2 == 1)
    assert(grand.length === 1)
    assert(marginals.map(_._5).sum === grand.head._5)
    assert(marginals.map(_._6).sum === grand.head._6)
    // and each status marginal equals the sum of its leaves
    val leaves = cube.filter(r => r._1 == 0 && r._2 == 0)
    for ((_, _, _, st, n, cents) <- marginals) {
      val mine = leaves.filter(_._4 == st)
      assert(mine.map(_._5).sum === n && mine.map(_._6).sum === cents,
        s"status $st does not reconcile")
    }
  }

  test("gap-fill: missing months materialize, LOCF carries the last " +
    "observation, pre-first months stay NULL, fills are flagged") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // status A: observed Jan + Apr (Feb, Mar are gaps → carry Jan);
    // status B: first observed Mar (Jan, Feb stay NULL — no carry
    // from nothing); the calendar spans Jan..Apr from the data itself
    val orders = Seq(
      ("A", ts("2024-01-10"), 10.00),
      ("A", ts("2024-01-20"), 5.00),
      ("A", ts("2024-04-05"), 7.00),
      ("B", ts("2024-03-15"), 3.00))
      .toDF("o_orderstatus", "o_orderdate", "o_totalprice")
    val got = Relational.gapFillMonthly(orders).collect()
      .map(r => (r.getAs[String]("o_orderstatus"),
        r.getAs[java.sql.Date]("month").toString) ->
        ((Option(r.getAs[java.lang.Long]("rev_cents")).map(_.toLong),
          r.getAs[Boolean]("is_observed")))).toMap
    assert(got.size == 8) // 2 statuses × 4 calendar months
    assert(got(("A", "2024-01-01")) == ((Some(1500L), true)), s"$got")
    assert(got(("A", "2024-02-01")) == ((Some(1500L), false)), s"$got")
    assert(got(("A", "2024-03-01")) == ((Some(1500L), false)), s"$got")
    assert(got(("A", "2024-04-01")) == ((Some(700L), true)), s"$got")
    assert(got(("B", "2024-01-01")) == ((None, false)), s"$got")
    assert(got(("B", "2024-02-01")) == ((None, false)), s"$got")
    assert(got(("B", "2024-03-01")) == ((Some(300L), true)), s"$got")
    assert(got(("B", "2024-04-01")) == ((Some(300L), false)), s"$got")
  }
}
