package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch relational layer: the OLAP substrate under the CDC surface.
  *
  * Every query is a declarative Catalyst plan — filters reach the
  * parquet scan, dimension joins are explicitly broadcast, aggregates
  * are algebraic (map-side partial), top-N is TakeOrderedAndProject,
  * window functions partition on high-cardinality keys. All floating
  * outputs are rounded (2dp money, 4dp ratios) so results are stable
  * against reorder at any parallelism — which is also what lets the
  * DuckDB oracle hash-match them.
  */
object Relational {

  /** Q1 shape: scan + filter + groupBy agg over the fact table. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Dim join + agg: revenue per market segment. No broadcast hint:
    * customer scales with SF (unlike nation/region), so the build
    * side must stay a planner/AQE decision — locally it broadcasts
    * anyway, at 100 TB it becomes a shuffle join on the key.
    */
  def q2JoinAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_revenue"),
        round(avg("o_totalprice"), 4).as("avg_price"))
      .orderBy("c_mktsegment")

  /** 3-way join + global top-N (TakeOrderedAndProject, no full sort).
    * Join strategy left to the planner — all three tables scale.
    */
  def q3MultiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** EXISTS as left-semi: orders having a late-shipped line item. */
  def q4SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val late = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("2000-01-01").cast("timestamp"))
      .select("l_orderkey")
    Tables.orders(s, dir)
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** NOT EXISTS as left-anti: customers with no urgent orders. */
  def q5AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("c_mktsegment")

  /** Window functions: rank + running sum per supplier. */
  def q6Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey").orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    // a rank ≤ 5 output only needs each key's top-5 rows, and the
    // running sum at rank r only reads rows 1..r — so heap-select the
    // survivors with the native TopKPerKey FIRST (map-side partial
    // heaps, ≤ 5 rows per key per partition cross the shuffle), then
    // run the window over the 5·|keys| survivors instead of sorting
    // the whole fact table per key
    val top = graft.plans.TopK.perKey(
      Tables.lineitem(s, dir)
        .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"),
      Seq("l_suppkey"),
      Seq(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc), 5)
    top
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_qty",
        round(sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "running_qty")
      .orderBy("l_suppkey", "rn")
  }

  /** Exact + approximate distinct counting. The approx variant is the
    * 100 TB path (HLL, no shuffle of raw keys); exact is the oracle.
    */
  def q7Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")

  /** Approximate distinct counting (HLL++): the 100 TB path — raw
    * keys never cross the shuffle, only fixed-size sketches do.
    *
    * CERTIFIED output: the raw HLL estimate is implementation-
    * specific (it can never hash-match a DuckDB oracle), so the
    * query emits the exact counts plus BOUND FLAGS — |est − exact| ≤
    * 3·rsd·exact with the default rsd = 0.05 — and the oracle
    * asserts the flags are literally TRUE against its own exact
    * counts. A sketch drifting outside its rated 3σ error now FAILS
    * the hash compare instead of hiding behind a rows-only check.
    * (The exact countDistincts exist here for certification only; the
    * production path at 100 TB runs just the sketch side.)
    */
  def q7ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"),
        approx_count_distinct(col("l_orderkey")).as("est_o"),
        approx_count_distinct(col("l_partkey")).as("est_p"))
      .select(col("l_returnflag"), col("n_orders"), col("n_parts"),
        col("n_lines"),
        (abs(col("est_o") - col("n_orders")) <=
          lit(0.15) * col("n_orders")).as("orders_within_3rsd"),
        (abs(col("est_p") - col("n_parts")) <=
          lit(0.15) * col("n_parts")).as("parts_within_3rsd"))
      .orderBy("l_returnflag")

  /** Full sketch lifecycle (DataSketches HLL): build per-group
    * sketches, merge them, estimate. At 100 TB the sketches are the
    * only thing crossing executors — this is the shape of distinct
    * counting over partitioned ingestion.
    *
    * CERTIFIED like [[q7ApproxDistinct]]: the union-then-estimate
    * result is checked against the exact distinct within 3σ of the
    * default lgK=12 sketch (1.04/√2^12 ≈ 1.6% ⇒ bound 5%), and the
    * oracle asserts the flag — the estimate itself can't hash-match.
    */
  def q7HllSketch(s: SparkSession, dir: String): DataFrame = {
    val est = Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(expr("hll_sketch_agg(l_orderkey)").as("sk"))
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))
    exact.join(broadcast(est), "l_returnflag")
      .select(col("l_returnflag"), col("n_orders"),
        (abs(col("est") - col("n_orders")) <=
          lit(0.05) * col("n_orders")).as("est_within_3sigma"))
      .orderBy("l_returnflag")
  }

  /** Per-group top-N via row_number (shuffles once on the group key). */
  def q8TopNGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rk")
  }

  /** Same result as [[q8TopNGroup]] through the native
    * [[graft.plans.TopKPerKey]] operator (bounded heaps, no full
    * sort); the rank column is recovered with a window over the
    * already-k-bounded output. Shares q8's oracle.
    */
  def q8TopNNative(s: SparkSession, dir: String): DataFrame = {
    val topped = graft.plans.TopK.perKey(
      Tables.orders(s, dir),
      Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    topped
      .withColumn("rk", row_number().over(w).cast("long"))
      .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rk")
  }

  /** Hierarchical aggregation via rollup (status → priority). */
  def q9Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Conditional aggregation (pivot as sum(case)) — one scan pass. */
  def q10CasePivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(
        round(sum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")).otherwise(0.0)), 2).as("urgent_rev"),
        round(sum(when(col("o_orderpriority") === "2-HIGH", col("o_totalprice")).otherwise(0.0)), 2).as("high_rev"),
        round(sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), col("o_totalprice")).otherwise(0.0)), 2).as("other_rev"))
      .orderBy("o_orderstatus")

  /** Set operations: high-value vs recent orderkeys. */
  def q11UnionSet(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val big = o.filter(col("o_totalprice") > 400000).select("o_orderkey")
    val recent = o.filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")).select("o_orderkey")
    val both = big.intersect(recent).withColumn("tag", lit("both"))
    val bigOnly = big.except(recent).withColumn("tag", lit("big_only"))
    val recentOnly = recent.except(big).withColumn("tag", lit("recent_only"))
    both.union(bigOnly).union(recentOnly)
      .groupBy("tag").agg(count(lit(1)).as("n"))
      .orderBy("tag")
  }

  /** Scalar-subquery shape: orders above the global average price.
    * The scalar agg is computed once and broadcast into the filter.
    */
  def q12Subquery(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val avgPrice = o.agg(avg("o_totalprice").as("ap"))
    o.join(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("ap"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_above_avg"),
        round(min("o_totalprice"), 2).as("min_above"))
      .orderBy("o_orderstatus")
  }

  /** JSON extraction from the events payload (schema-on-read). */
  def q13Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(avg("k"), 4).as("avg_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  /** Time bucketing: daily event rollup. */
  def q14TimeBucket(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("day", "event_type")

  /** As-of/latest-per-key: each user's latest purchase amount. */
  def q15AsOf(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event"),
        round(col("value"), 2).as("last_value"))
      .orderBy("user_id")
  }

  /** Exact linear-interpolation percentiles per group by TWO-PASS
    * HISTOGRAM RANK SELECTION. Spark's exact `percentile` aggregate
    * holds every value of a group in its buffer (an executor OOM by
    * construction over a 100 TB fact column with 3 status groups —
    * the r7 plan-audit flag), and the r7 fix — a per-group window
    * sort feeding boundary-rank selection — was memory-safe but
    * still serialized each GROUP into one sorted task chain. This
    * formulation gets the same exact numbers with per-task work
    * bounded by a histogram BIN, not a group: the shared
    * [[RankSelect]] engine (pass 1: bounds + fixed-width histogram
    * locate each requested rank's bin on a summary frame; pass 2:
    * rank only inside located bins — cumulative-below + in-bin rank
    * IS the global rank) pointed at the floor/ceil order statistics
    * of rank p·(n−1), whose ≤ 2 boundary rows per percentile feed
    * the constant-width interpolation aggregate. Exactness
    * unchanged; the whole-group sort chain is gone.
    */
  def q17Quantiles(s: SparkSession, dir: String): DataFrame = {
    val ps = Seq(0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90")
    val bins = 256
    val o = Tables.orders(s, dir)
      .select(col("o_orderstatus").as("g"), col("o_totalprice").as("v"))
    // q33 bin convention — the SHARED definition (RankSelect.floatBin)
    val binOf = RankSelect.floatBin(bins)
    def rpOf(p: Double) = (col("n") - 1L).cast("double") * p
    // the ≤ 6 boundary ranks per group (floor+ceil per percentile),
    // derived on the group-bounds frame — never the corpus
    val (sel, bounds) = RankSelect.at(o, bins, binOf, bounds =>
      bounds.select(col("g"), explode(array(
        ps.flatMap { case (p, _) =>
          Seq(floor(rpOf(p)).cast("long"), ceil(rpOf(p)).cast("long"))
        }: _*)).as("r"))
        .distinct())
    def rp(p: Double) = (col("n") - 1L).cast("double") * p
    val pcts = ps.map { case (p, name) =>
      val lo = max(when(col("r") === floor(rp(p)).cast("long"), col("v")))
      val hi = max(when(col("r") === ceil(rp(p)).cast("long"), col("v")))
      // bit-exact mirror of Percentile.getPercentile's interpolation:
      // (higher − pos)·lo + (pos − lower)·hi, lower==higher → lo —
      // the algebraic twin lo + frac·(hi − lo) differs by an ulp and
      // flips the 2dp round on boundary values (seen at sf0.1)
      round(when(floor(rp(p)) === ceil(rp(p)), lo)
        .otherwise((ceil(rp(p)) - rp(p)) * lo + (rp(p) - floor(rp(p))) * hi), 2)
        .as(name)
    }
    sel.join(broadcast(bounds.select("g", "n")), Seq("g"))
      .groupBy(col("g").as("o_orderstatus"), col("n"))
      .agg(pcts.head, pcts.tail: _*)
      .select(col("o_orderstatus"), col("p25"), col("p50"), col("p90"), col("n"))
      .orderBy("o_orderstatus")
  }

  /** Exact per-group quantiles of a DISCRETE measure — the regime
    * the r10 verdict flagged as [[RankSelect]]'s residual hazard:
    * `l_quantity` holds ~50 distinct integer-valued points over
    * millions of rows, so at 256 bins EVERY located bin is a point
    * mass (in-bin min == max) and the shared engine answers every
    * rank from the groups×bins summary alone — the pass-2 window
    * sort's input is provably empty (the bmin != bmax fence), where
    * the pre-fix formulation would have serialized a million-row
    * repeated-value bin into one sorting task. Same interpolation
    * contract as [[q17Quantiles]].
    */
  def q35QuantilesDisc(s: SparkSession, dir: String): DataFrame = {
    val ps = Seq(0.1 -> "p10", 0.5 -> "p50", 0.9 -> "p90")
    val bins = 256
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("g"), col("l_quantity").as("v"))
    val binOf = RankSelect.floatBin(bins)
    def rp(p: Double) = (col("n") - 1L).cast("double") * p
    val (sel, bounds) = RankSelect.at(li, bins, binOf, bounds =>
      bounds.select(col("g"), explode(array(
        ps.flatMap { case (p, _) =>
          Seq(floor(rp(p)).cast("long"), ceil(rp(p)).cast("long"))
        }: _*)).as("r"))
        .distinct())
    val pcts = ps.map { case (p, name) =>
      val lo = max(when(col("r") === floor(rp(p)).cast("long"), col("v")))
      val hi = max(when(col("r") === ceil(rp(p)).cast("long"), col("v")))
      round(when(floor(rp(p)) === ceil(rp(p)), lo)
        .otherwise((ceil(rp(p)) - rp(p)) * lo + (rp(p) - floor(rp(p))) * hi), 2)
        .as(name)
    }
    sel.join(broadcast(bounds.select("g", "n")), Seq("g"))
      .groupBy(col("g").as("l_returnflag"), col("n"))
      .agg(pcts.head, pcts.tail: _*)
      .select(col("l_returnflag"), col("p10"), col("p50"), col("p90"), col("n"))
      .orderBy("l_returnflag")
  }

  /** REVENUE CONCENTRATION — the Pareto/80-20 readout: what share
    * of total order value the customers at or above the p90/p99
    * per-customer revenue hold ([[keySkewProfile]] profiles COUNT
    * skew; money concentrates differently, and this is the number a
    * "whale risk" or account-coverage review quotes). Per-customer
    * revenue in INTEGER CENTS (the cohortValue discipline — exact
    * sums in any shuffle order), thresholds selected by the shared
    * [[RankSelect]] engine at exact integer basis-point ranks (no
    * whole-population sort), shares as DECIMAL-widened conditional
    * sums with threshold ties INCLUDED (at-or-above is
    * deterministic; "exactly 1%" is not under ties).
    */
  def revenueConcentration(s: SparkSession, dir: String): DataFrame =
    revenueConcentration(Tables.orders(s, dir))

  def revenueConcentration(orders: DataFrame): DataFrame = {
    val bins = 256
    val cents = orders
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("v"))
      .select(lit(0L).as("g"), col("v"))
    val (sel, _) = RankSelect.at(cents, bins, RankSelect.intBin(bins),
      bounds => bounds
        .select(col("g"), col("n"),
          explode(array(lit(9000L), lit(9900L))).as("q_bp"))
        .select(col("g"), col("q_bp"),
          expr("(n - 1) * q_bp div 10000").as("r")))
    val th = sel.groupBy("g").agg(
      max(when(col("q_bp") === 9000L, col("v"))).as("p90_cents"),
      max(when(col("q_bp") === 9900L, col("v"))).as("p99_cents"))
    cents.crossJoin(broadcast(th))
      .agg(count(lit(1)).as("n_customers"),
        sum("v").as("total_cents"),
        sum(when(col("v") >= col("p90_cents"), col("v")).otherwise(0L))
          .as("t90"),
        sum(when(col("v") >= col("p99_cents"), col("v")).otherwise(0L))
          .as("t99"),
        max("p90_cents").as("p90_cents"),
        max("p99_cents").as("p99_cents"))
      .select(col("n_customers"), col("total_cents"),
        col("p90_cents"), col("p99_cents"),
        expr("CAST(CAST(t90 AS DECIMAL(38,0)) * 1000000 " +
          "div total_cents AS BIGINT)").as("top10_share_ppm"),
        expr("CAST(CAST(t99 AS DECIMAL(38,0)) * 1000000 " +
          "div total_cents AS BIGINT)").as("top1_share_ppm"))
  }

  /** ROLLUP revenue cube — the multi-level subtotal shape every OLAP
    * report ends in (per (year, status), per year, grand total — one
    * scan, one aggregation): Spark's `rollup` plans an Expand over
    * the grouping sets feeding ONE hash aggregate, so the three
    * levels cost one shuffle, not three queries. Money rides integer
    * cents (the q40 discipline); `grouping()` flags disambiguate a
    * rollup NULL from a genuine NULL key, and the ORDER BY coalesces
    * through the flags so both engines sort the subtotal rows
    * identically (Spark sorts NULL first ascending, DuckDB last —
    * never let a rollup NULL reach the sort raw).
    */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .rollup("o_year", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum("cents").as("revenue_cents"),
        grouping(col("o_year")).cast("long").as("g_year"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"))

  /** CUBE revenue — [[rollupRevenue]]'s full-lattice sibling: CUBE
    * adds the status-only marginal the ROLLUP hierarchy skips
    * ("revenue per status across all years" — the cross-tab column
    * totals a pivoted report needs), still as ONE Expand-fed hash
    * aggregate: four grouping sets, one shuffle. Same integer-cents
    * money, same grouping() flags disambiguating a cube NULL from a
    * genuine NULL key, same coalesced sort (the engines disagree on
    * raw NULL ordering).
    */
  def cubeRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .cube("o_year", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum("cents").as("revenue_cents"),
        grouping(col("o_year")).cast("long").as("g_year"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"))

  /** Calendar DENSIFICATION + LOCF gap-fill — the time-series
    * reshaping operator every reporting layer needs and no aggregate
    * provides: monthly revenue per status with MISSING months
    * materialized (an empty month must appear as a row — its absence
    * from a GROUP BY output silently breaks every
    * trend/lag/moving-average consumer downstream, which is exactly
    * why [[graft.ops.Events.dailySeries]] zero-fills its day grid)
    * and gaps carried forward by last-observation (LOCF — the
    * reporting convention for "balance as of month end"; months
    * before a status's first observation stay NULL, a carry from
    * nothing would be invented data, and `is_observed` keeps
    * fill-vs-fact distinguishable downstream). Shape: ONE
    * map-side-combined monthly aggregate is the only corpus pass;
    * the calendar derives from the aggregate's own (min, max) — a
    * 1-row frame exploded through `sequence(lo, hi, interval 1
    * month)`, never a corpus scan; the status × month grid is
    * calendar-sized, the fill window partitions by status over the
    * bounded month axis (partitions are |months| rows regardless of
    * corpus size — the window never sees a corpus row). Integer
    * cents, DATE month keys (both engines truncate months
    * identically).
    */
  def gapFillMonthly(orders: DataFrame): DataFrame = {
    // statuses × months rows — materialized once (localCheckpoint)
    // because three consumers read it (calendar bounds, the status
    // set, the join's right side): per-branch column pruning makes
    // their exchanges non-identical, so exchange reuse can't
    // collapse the three corpus scans the lazy frame would pay
    val monthly = orders
      .groupBy(col("o_orderstatus"),
        trunc(col("o_orderdate"), "month").as("month"))
      .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) " +
        "AS BIGINT)").as("rev_cents"))
      .localCheckpoint()
    val cal = monthly.agg(min("month").as("lo"), max("month").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 month)")).as("month"))
    val grid = cal.crossJoin(
      broadcast(monthly.select("o_orderstatus").distinct()))
    val w = Window.partitionBy("o_orderstatus").orderBy("month")
    grid.join(monthly.hint("shuffle_hash"), Seq("o_orderstatus", "month"),
        "left")
      .withColumn("is_observed", col("rev_cents").isNotNull)
      .withColumn("rev_cents",
        last("rev_cents", ignoreNulls = true).over(w))
      .select("o_orderstatus", "month", "rev_cents", "is_observed")
  }

  def q43GapFill(s: SparkSession, dir: String): DataFrame =
    gapFillMonthly(Tables.orders(s, dir))

  /** Per-group EQUI-DEPTH histogram — the optimizer-statistics
    * operator (equal-POPULATION buckets expose where the value mass
    * actually lives; the fixed-width q33 histogram starves dense
    * regions of resolution). NTILE bucket semantics under the total
    * (v, o_orderkey) order, computed WITHOUT any per-group sort —
    * the [[Sampling.curriculum]] machinery pointed at an OLAP
    * measure: [[RankSelect]] finds only the B−1 boundary rows per
    * group, the boundary (v, tie) pairs broadcast as a groups×(B−1)
    * array, and every row computes its bucket MAP-SIDE as the count
    * of boundary pairs at or below it (`(v,tie) ≥ p_k ⟺ rank ≥ r_k`
    * because the order is total) — identical to `⌊(B·rank+B−1)/n⌋`,
    * which is what the oracle replays. One corpus aggregate after a
    * broadcast join; output is groups × B rows.
    */
  def q36HistogramEqDepth(s: SparkSession, dir: String,
                          buckets: Int = 8): DataFrame = {
    require(buckets > 1, s"buckets ($buckets) must exceed 1")
    val bins = 256
    val o = Tables.orders(s, dir)
      .select(col("o_orderstatus").as("g"), col("o_totalprice").as("v"),
        col("o_orderkey"))
    val (th0, _) = RankSelect.at(o, bins, RankSelect.floatBin(bins), bounds =>
      bounds.select(col("g"), col("n"),
        explode(array((1 until buckets).map(lit(_)): _*)).as("k"))
        .withColumn("r", expr(s"k * n div $buckets"))
        .select("g", "k", "r"),
      tie = Seq("o_orderkey"))
    val thArr = th0.select(col("g"), col("v").as("t_v"),
        col("o_orderkey").as("t_id"))
      .groupBy("g")
      .agg(sort_array(collect_list(struct(col("t_v"), col("t_id")))).as("ths"))
    o.join(broadcast(thArr), Seq("g"))
      .withColumn("bucket", size(filter(col("ths"), t =>
        col("v") > t.getField("t_v") ||
          (col("v") === t.getField("t_v") &&
            col("o_orderkey") >= t.getField("t_id")))).cast("long"))
      .groupBy(col("g").as("o_orderstatus"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        round(min("v"), 2).as("min_v"), round(max("v"), 2).as("max_v"),
        round(avg("v"), 4).as("avg_v"))
      .orderBy("o_orderstatus", "bucket")
  }

  /** Sketch-based quantiles (approx_percentile): the 100 TB path —
    * bounded-size sketches merge instead of sorting raw values.
    *
    * CERTIFIED like [[q7ApproxDistinct]]: a quantile sketch's error
    * guarantee is a RANK band, so each estimate is checked against
    * the exact quantiles at p ± 0.005 (5× the rated 1/accuracy =
    * 0.001 rank error, margin for interpolation at the band edges)
    * and the oracle asserts the flags plus the exact p25/p50/p90 —
    * the estimates themselves are impl- and merge-order-specific and
    * can't hash-match.
    */
  def q17ApproxQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(
        expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.9), 1000)").as("pcts"),
        expr("percentile(o_totalprice, array(0.245, 0.25, 0.255, " +
          "0.495, 0.5, 0.505, 0.895, 0.9, 0.905))").as("ex"),
        count(lit(1)).as("n"))
      .select(col("o_orderstatus"),
        round(col("ex").getItem(1), 2).as("p25"),
        round(col("ex").getItem(4), 2).as("p50"),
        round(col("ex").getItem(7), 2).as("p90"),
        col("n"),
        col("pcts").getItem(0).between(
          col("ex").getItem(0), col("ex").getItem(2)).as("p25_in_band"),
        col("pcts").getItem(1).between(
          col("ex").getItem(3), col("ex").getItem(5)).as("p50_in_band"),
        col("pcts").getItem(2).between(
          col("ex").getItem(6), col("ex").getItem(8)).as("p90_in_band"))
      .orderBy("o_orderstatus")

  /** As-of (attribution) join done the scalable way: instead of a
    * per-key range join (which explodes on hot keys), tag the union
    * stream and carry the most recent click forward with an
    * ignore-nulls running `last` — one shuffle, one sort, zero join.
    * Each purchase gets the latest click at-or-before its timestamp.
    */
  def q18AsofAttribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts_us",
        last(when(col("event_type") === "click", unix_micros(col("ts"))), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_id"), col("user_id"),
        col("click_id"),
        (unix_micros(col("ts")) - col("click_ts_us")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** Range-frame window: per customer, order count and revenue in
    * the 30 days up to each order (trailing-window feature
    * engineering). RANGE frame over epoch seconds — per-customer
    * partitions keep the sort local to each key, so the single
    * shuffle is on a high-cardinality column.
    */
  def q19RangeWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_epoch"))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(s, dir)
      // NTZ → epoch seconds via a UTC-session timestamp hop (matches
      // DuckDB's epoch() on the naive timestamp)
      .withColumn("o_epoch", col("o_orderdate").cast("timestamp").cast("long"))
      .select(col("o_orderkey"), col("o_custkey"),
        count(lit(1)).over(w).as("n_30d"),
        round(sum("o_totalprice").over(w), 2).as("rev_30d"))
      .orderBy("o_orderkey")
  }

  /** Explicit GROUPING SETS (finer than rollup: the two single-key
    * marginals without the grand total) + grouping_id disambiguation.
    */
  def q20GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Native pivot: revenue matrix status × priority. Explicit value
    * list (the 100 TB rule for pivot — never let Spark collect
    * distinct pivot values from a huge fact table) with
    * parquet-safe output aliases.
    */
  def q21Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(round(sum("o_totalprice"), 2))
      .select(col("o_orderstatus"),
        col("1-URGENT").as("p_urgent"), col("2-HIGH").as("p_high"),
        col("3-MEDIUM").as("p_medium"),
        col("4-NOT SPECIFIED").as("p_notspec"), col("5-LOW").as("p_low"))
      .orderBy("o_orderstatus")

  /** Full-outer join: per-nation customer base vs high-balance
    * supplier base — both sides pre-aggregated to one row per key
    * BEFORE the join (join inputs sized by |nations|, not table
    * rows), unmatched sides surfaced as zero counts.
    */
  def q22FullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .groupBy(col("c_nationkey").as("nation_key"))
      .agg(count(lit(1)).as("n_cust"))
    val sup = Tables.supplier(s, dir)
      .filter(col("s_acctbal") > 5000)
      .groupBy(col("s_nationkey").as("s_key"))
      .agg(count(lit(1)).as("n_supp"))
    // full outer can't broadcast; hint shuffled-hash so neither
    // pre-aggregated side pays a per-partition sort (pure SMJ avoided)
    c.join(sup.hint("shuffle_hash"), col("nation_key") === col("s_key"), "full_outer")
      .select(coalesce(col("nation_key"), col("s_key")).as("nation_key"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nation_key")
  }

  /** Rank-family window functions in one pass: rank, dense_rank,
    * percent_rank, cume_dist, ntile — all share one window (one
    * shuffle + sort per partition key). Unique-keyed ordering keeps
    * ntile deterministic.
    */
  def q23WindowRanks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"),
        round(percent_rank().over(w), 6).as("prk"),
        round(cume_dist().over(w), 6).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"))
      .filter(col("rk") <= 10)
      .orderBy("o_orderpriority", "rk")
  }

  /** Value windows: lag / lead / first / last / nth over one frame
    * spec in a single Window pass (one shuffle on the partition key,
    * one in-partition sort serves all five) — the navigation-function
    * complement of q23's rank family.
    */
  def q27ValueWindows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_orderdate")).over(wFull).as("first_date"),
        last(col("o_orderdate")).over(wFull).as("last_date"),
        nth_value(col("o_totalprice"), 2).over(wFull).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Correlated EXISTS through the SQL front end (the engine's other
    * entry surface): Catalyst rewrites the subquery to the same
    * left-semi join the DataFrame formulation (q4) plans by hand.
    */
  def q24SqlExists(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("g_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("g_lineitem")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total
        |FROM g_orders o
        |WHERE EXISTS (SELECT 1 FROM g_lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** Recursive CTE through the SQL front end (Spark 4 `WITH
    * RECURSIVE`): documents chain into per-block linked lists
    * (`lag` over fixed-size doc_id blocks), and the recursion walks
    * every chain from its root — an iterative-fixpoint plan shape
    * (graph traversal / lineage walk) the other 25 relational
    * queries can't express. Block size 4 fixes the recursion DEPTH
    * as a constant at every scale factor — each level walks every
    * chain one hop in parallel, so corpus growth widens levels, it
    * does not add them (recursion depth is the one thing that must
    * NOT scale with data).
    */
  def q26Recursive(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir).createOrReplaceTempView("g_documents")
    s.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT src, dst FROM (
        |    SELECT lag(doc_id) OVER (PARTITION BY doc_id div 4
        |                             ORDER BY doc_id) AS src,
        |           doc_id AS dst
        |    FROM g_documents) WHERE src IS NOT NULL),
        |reach(root_id, doc_id, depth) AS (
        |  -- anchors: chain heads (a src that is nobody's dst) — the
        |  -- per-bucket minimum, since chains are built in doc_id order
        |  SELECT src, src, CAST(0 AS BIGINT) FROM chain
        |  WHERE src NOT IN (SELECT dst FROM chain)
        |  UNION ALL
        |  SELECT r.root_id, c.dst, r.depth + 1
        |  FROM reach r JOIN chain c ON c.src = r.doc_id)
        |SELECT root_id, doc_id, depth FROM reach ORDER BY doc_id""".stripMargin)
  }

  /** [[q18AsofAttribution]] rebuilt on the generic [[AsofJoin]]
    * library operator — same rows (shares q18's oracle), proving the
    * reusable API plans the same single-shuffle tagged-union shape
    * as the hand-specialized query.
    */
  def q28AsofGeneric(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
      .withColumn("click_ts_us", unix_micros(col("ts")))
    AsofJoin.join(purchases, clicks, "user_id", "ts", "ts",
        Map("event_id" -> "click_id", "click_ts_us" -> "click_ts_us"),
        seq = Some(("event_id", "event_id")))
      .select(col("event_id").as("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("ts")) - col("click_ts_us")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** The same attribution on the NATIVE as-of join operator
    * ([[graft.plans.AsofJoinNode]] → merge exec): one hash exchange
    * per side, a streaming one-buffered-row merge, no tagged union
    * and no per-payload window carry. Third of the three as-of
    * formulations sharing q18's oracle.
    */
  def q29AsofNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    graft.plans.AsofNative.join(purchases, clicks,
        keys = Seq("user_id" -> "c_user_id"),
        order = Seq("ts" -> "c_ts", "event_id" -> "click_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("c_ts"))).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** Keyless time-range join via banding: for every purchase, count
    * and sum the clicks (ANY user) in the trailing 10 minutes.
    * Without an equality key Spark plans pure inequality joins as a
    * nested-loop cartesian — quadratic. Banding manufactures the
    * equi-key: clicks land in their ⌊ts/W⌋ band, each purchase probes
    * the ≤2 bands its window can overlap, and the exact predicate
    * filters inside the hash join. Shuffle keys are time bands
    * (bounded fan-out 2×), so the plan stays linear at any scale;
    * the oracle is DuckDB's native inequality join.
    */
  def q30RangeBand(s: SparkSession, dir: String): DataFrame = {
    val W = 600L * 1000000L // 10 minutes in microseconds
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(unix_micros(col("ts")).as("cus"), col("value").as("cval"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), unix_micros(col("ts")).as("pus"))
    RangeJoin.trailingCandidates(purchases, clicks, "pus", "cus", W)
      .groupBy("purchase_id")
      .agg(sum(when(col("in_window"), 1).otherwise(0)).as("n_clicks"),
        round(sum(when(col("in_window"), col("cval")).otherwise(0.0)), 2)
          .as("click_value"))
  }

  /** The native keyed trailing range join in the driver surface: each
    * purchase paired with the SAME user's clicks in the trailing 10
    * minutes ([[graft.plans.RangeJoinExec]] — sorted-merge with a
    * sliding deque, two hash exchanges, no band fan-out, no
    * post-filter), then per-purchase click stats. Inner pairs: only
    * purchases with ≥1 in-window click report. The keyless banded
    * q30 and this keyed native operator are the two scale shapes of
    * the same trailing-window semantics.
    */
  def q31RangeNative(s: SparkSession, dir: String): DataFrame = {
    val W = 600L * 1000000L
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        unix_micros(col("ts")).as("pus"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("cus"),
        col("value").as("cval"))
    graft.plans.RangeNative.join(purchases, clicks,
        Seq(("p_user", "c_user")), ("pus", "cus"), W)
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("n_clicks"),
        round(sum("cval"), 2).as("click_value"))
  }

  /** The skew-safe join in the driver-checked surface: fact × dim
    * through [[Layout.saltedJoin]] (salt 8). Row-identical to the
    * plain join — salting only changes the shuffle distribution — so
    * the plain-join SQL is its oracle.
    */
  def q25SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(s, dir)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val small = Tables.customer(s, dir)
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    Layout.saltedJoin(big, small, "custkey", salt = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_revenue"))
      .orderBy("c_mktsegment")
  }

  /** Key-skew profile of the fact table's join keys: top-k heaviest
    * values of each key column with absolute and relative frequency —
    * the pre-flight audit a 100 TB join plan wants BEFORE launching
    * (a key holding >1% of rows predicts a straggler task; the fix —
    * salting, [[Layout.saltedJoin]], or AQE skew split — is chosen
    * from exactly this table). One `stack` pass melts the key columns
    * (no per-column rescan), the count agg is map-side combined per
    * (column, key), and the native TopKPerKey partial heaps pick the
    * k heaviest per column — no per-column sort, no global sort;
    * only numPartitions×k survivors per column leave the count agg.
    * The grand total rides a single-row broadcast.
    */
  def keySkewProfile(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val melted = li.select(expr(
      "stack(3, 'l_orderkey', l_orderkey, 'l_partkey', l_partkey, " +
        "'l_suppkey', l_suppkey) AS (col_name, key)"))
    val counts = melted.groupBy("col_name", "key")
      .agg(count(lit(1)).as("cnt"))
    val top = graft.plans.TopK.perKey(counts, Seq("col_name"),
      Seq(col("cnt").desc, col("key").asc), k)
    val w = Window.partitionBy("col_name")
      .orderBy(col("cnt").desc, col("key").asc)
    top.withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(li.agg(count(lit(1)).as("n_total"))))
      .select(col("col_name"), col("rk"), col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("n_total"), 6).as("pct"))
  }

  /** Gap-based sessionization: a >30min silence starts a new session.
    * lag + cumulative-sum over a per-user window — one shuffle.
    */
  def q16Sessionize(s: SparkSession, dir: String): DataFrame = {
    val wo = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sessions = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(wo))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > 1800d, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_sess")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0)))
    sessions
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max("n_events").as("max_session_events"),
        round(sum("session_value"), 2).as("total_value"))
      .orderBy("user_id")
  }

  /** Fixed-width value histogram of a fact column — the distribution
    * profiler next to [[keySkewProfile]]'s key profiler (is the money
    * column uniform, clumped, or long-tailed; where to cut stratified
    * sampling bands). One min/max pass broadcast like a scalar
    * subquery, then one map-side-combined aggregation to `bins` rows.
    * The bin index is the same double expression on any engine —
    * `floor((x − lo)·bins / (hi − lo))`, top edge clamped into the
    * last bin — so boundary assignment is bit-reproducible (IEEE
    * doubles, identical op order), not merely approximately equal.
    */
  def valueHistogram(s: SparkSession, dir: String,
                     bins: Int = 20): DataFrame = {
    require(bins > 0)
    val li = Tables.lineitem(s, dir)
    val bounds = li.agg(min(col("l_extendedprice")).as("lo"),
      max(col("l_extendedprice")).as("hi"))
    li.select(col("l_extendedprice").as("x"))
      .crossJoin(broadcast(bounds))
      .select(least(floor(((col("x") - col("lo")) * bins) /
        (col("hi") - col("lo"))), lit(bins - 1L)).as("bin"),
        col("x"), col("lo"), col("hi"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        round(avg("x"), 2).as("avg_price"),
        round(first(col("lo") + col("bin") * (col("hi") - col("lo")) / bins), 2)
          .as("bin_lo"))
      .select(col("bin"), col("bin_lo"), col("n_rows"), col("avg_price"))
  }

  /** Bloom-prefiltered semi-join (the 100 TB membership cut): revenue
    * of lineitems belonging to urgent-priority orders. The urgent key
    * set builds one broadcastable bloom; the fact scan drops
    * non-members BEFORE the exchange; the closing exact semi-join
    * removes the bloom's false positives — so the result is
    * row-identical to the plain semi-join (its oracle) while the
    * shuffle carries only survivors. See [[BloomPrefilter]] for the
    * cross-job (save/load) posture.
    */
  def q34BloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    BloomPrefilter.semiJoin(Tables.lineitem(s, dir), urgent,
        "l_orderkey", "o_orderkey", expectedItems = 1000000L)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
  }

  /** Single-scan DATA-QUALITY PROFILE of the fact table: per column,
    * null count, exact distinct cardinality, a CERTIFIED
    * approx-distinct flag (the [[q7ApproxDistinct]] discipline —
    * |HLL est − exact| ≤ 3·rsd·exact with the default rsd 0.05; the
    * oracle asserts the flag literally TRUE, so a sketch drifting
    * outside its rated error fails the hash compare), and
    * type-appropriate bounds: numeric columns get min/max/avg,
    * string columns lexicographic min/max, the timestamp column its
    * day-grain bounds — the ingest-gate report a pipeline runs
    * before trusting a new drop of data. ALL metrics ride ONE
    * aggregation over one scan (the per-column layout is a
    * driver-side unpivot of the single aggregate row — |cols|
    * structs, zero extra jobs); the exact countDistincts exist for
    * certification only and are what the multi-distinct Expand pays
    * for — the production profile at 100 TB runs the sketch side
    * alone and stays a plain single-pass aggregate.
    */
  def dqProfile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val nums = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val strs = Seq("l_returnflag", "l_linestatus")
    val times = Seq("l_shipdate")
    val all = nums ++ strs ++ times
    val aggs = all.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        approx_count_distinct(col(c)).as(s"${c}__ad"))
    } ++ nums.flatMap { c =>
      Seq(round(min(col(c)).cast("double"), 4).as(s"${c}__mn"),
        round(max(col(c)).cast("double"), 4).as(s"${c}__mx"),
        round(avg(col(c)), 4).as(s"${c}__av"))
    } ++ strs.flatMap { c =>
      Seq(min(col(c)).as(s"${c}__mns"), max(col(c)).as(s"${c}__mxs"))
    } ++ times.flatMap { c =>
      Seq(date_format(min(col(c)), "yyyy-MM-dd").as(s"${c}__mns"),
        date_format(max(col(c)), "yyyy-MM-dd").as(s"${c}__mxs"))
    }
    val one = li.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val dnull = lit(null).cast("double")
    val snull = lit(null).cast("string")
    val rows = all.map { c =>
      val (mn, mx, av, mns, mxs) =
        if (nums.contains(c))
          (col(s"${c}__mn"), col(s"${c}__mx"), col(s"${c}__av"), snull, snull)
        else (dnull, dnull, dnull, col(s"${c}__mns"), col(s"${c}__mxs"))
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"${c}__nn").as("n_nulls"), col(s"${c}__nd").as("n_distinct"),
        (abs(col(s"${c}__ad") - col(s"${c}__nd")) <=
          lit(0.15) * col(s"${c}__nd")).as("distinct_within_3rsd"),
        mn.as("min_num"), mx.as("max_num"), av.as("avg_num"),
        mns.as("min_str"), mxs.as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** UNPIVOT (melt) — the wide→long reshape: lineitem's four measure
    * columns become (measure, value) rows, profiled per return flag.
    * Uses Spark's native `Dataset.unpivot` (an Expand under the
    * hood — one scan emits all measure rows map-side, no union of N
    * self-scans, which is the shape a hand-rolled melt degrades to).
    * The aggregate keeps the output bounded: flags × measures rows.
    */
  def q38Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy("l_returnflag", "measure")
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"),
        round(avg("value"), 4).as("avg_value"))

  /** NEAREST-in-time join — the as-of family's third direction: each
    * purchase pairs with its temporally CLOSEST click (backward OR
    * forward) within a tolerance, ties to the backward side (the
    * as-of convention: what the user had already seen wins over what
    * came after). pandas calls this merge_asof(direction='nearest');
    * neither Spark nor the warehouse engines ship it, but it falls
    * out of ONE tagged-union window pass per user — the q28 generic
    * as-of construct run both ways: last preceding click and first
    * following click as conditional struct carries, then a three-way
    * compare. Unmatched purchases stay as explicit null rows (a
    * silently dropped row poisons downstream attribution ratios).
    * Total order (ts, event_id) makes equal-timestamp ties exact:
    * an equal-ts click with a smaller id is "backward" at gap 0.
    */
  def q39AsofNearest(s: SparkSession, dir: String,
                     tolUs: Long = 604800000000L): DataFrame =
    asofNearest(Tables.events(s, dir), tolUs)

  /** [[q39AsofNearest]]'s core over any events-shaped frame. */
  def asofNearest(events: DataFrame,
                  tolUs: Long = 604800000000L): DataFrame = {
    val ev = events
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val click = when(col("event_type") === "click",
      struct(col("us"), col("event_id")))
    val marked = ev
      .withColumn("prev_c", last(click, ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("next_c", first(click, ignoreNulls = true)
        .over(w.rowsBetween(1, Window.unboundedFollowing)))
      .filter(col("event_type") === "purchase")
    val gapB = col("us") - col("prev_c.us")
    val gapF = col("next_c.us") - col("us")
    val backOk = col("prev_c").isNotNull && gapB <= tolUs
    val fwdOk = col("next_c").isNotNull && gapF <= tolUs
    val useBack = backOk && (!fwdOk || gapB <= gapF)
    marked.select(col("event_id").as("purchase_id"), col("user_id"),
      when(useBack, col("prev_c.event_id"))
        .when(fwdOk, col("next_c.event_id")).as("click_id"),
      when(useBack, lit("back")).when(fwdOk, lit("fwd")).as("direction"),
      when(useBack, gapB).when(fwdOk, gapF).as("gap_us"))
  }
}
