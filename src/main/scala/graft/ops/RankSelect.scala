package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-pass HISTOGRAM RANK SELECTION — the shared engine behind
  * exact per-group quantiles ([[Relational.q17Quantiles]]) and
  * curriculum boundaries ([[Sampling.curriculum]]). Finds the rows
  * at requested per-group 0-based ranks under a total order WITHOUT
  * ever sorting a whole group (a per-group window sort serializes
  * each group into one task chain at 100 TB):
  *
  *   pass 1 — per-group (lo, hi, n) bounds, then a fixed-width
  *   `bins`-bucket histogram (one map-side-combined aggregate); the
  *   cumulative histogram locates each requested rank's bin on the
  *   groups×bins summary frame.
  *
  *   pass 2 — only rows of LOCATED bins survive a broadcast
  *   semi-join, a window sort per (group, bin) ranks within the bin,
  *   and cumulative-below + in-bin rank recovers the exact global
  *   rank: every earlier bin holds strictly smaller values (the bin
  *   expression must be monotone in the value), ties share a bin, so
  *   the selected order statistics are identical to a whole-group
  *   sort. Per-task sort work is the hottest candidate bin.
  *
  * The subtle invariants (bin monotonicity, exclusive-cumulative
  * rank recovery `cb + rib === r`, tie handling, the n < #ranks
  * regime where boundary ranks collide) live HERE once — both
  * consumers were hand-rolled copies before r10's review pass.
  */
object RankSelect {

  /** The q33 float bin convention over the helper's `(v, lo, hi)`
    * columns: fixed-width buckets, top edge closed into the last
    * bin, a degenerate single-value group short-circuited to bin 0.
    * Defined ONCE here — the consumers (q17 quantiles, robust
    * median/MAD) previously each carried a byte-identical copy, and
    * a future edge-behavior fix must not have five places to miss.
    */
  def floatBin(bins: Int): Column =
    when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(floor(((col("v") - col("lo")) * bins) /
        (col("hi") - col("lo"))), lit(bins - 1L)).cast("long"))

  /** Integer-exact fixed-width binning for long values: the +1
    * denominator keeps every index inside [0, bins) with no float
    * edge cases (the curriculum convention). Widened through
    * DECIMAL(38,0): `(v - lo) * bins` wraps/ANSI-errors int64 once
    * the group's value RANGE passes ~3.6e16 (RoundsSpec's
    * ±Long.MaxValue/4 case trips it) — the oracle's HUGEINT widens
    * automatically, so the Spark side must too; `hi - lo + 1` gets
    * the same treatment for ranges spanning the full long line.
    * Values are unchanged wherever the narrow form didn't overflow. */
  def intBin(bins: Int): Column =
    expr(s"(CAST(v AS DECIMAL(38,0)) - lo) * $bins " +
      s"div (CAST(hi AS DECIMAL(38,0)) - lo + 1)")

  /** Rows of `scored` at the requested per-group ranks.
    *
    * Nulls in `v` have no defined rank under the numeric order — and
    * the engines disagree on where a sort puts them (Spark's window
    * orders them FIRST, DuckDB's row_number LAST) — so they are
    * excluded up front: order statistics are over non-null values
    * only, and the bounds `n` counts non-null rows.
    *
    * POINT-MASS SHORT-CIRCUIT: a located bin whose in-bin min equals
    * its max is a point mass (a money column full of 0.00, clipped
    * sensor readings) — every row ties on `v`, so any requested rank
    * landing there is answerable from the groups×bins summary alone:
    * the selected value IS the bin's single value. Without this, the
    * per-(group, bin) pass-2 sort degenerates to one task sorting
    * the mass — and a median is LIKELY to land in the heavy bin.
    * The short-circuit applies only when no `tie` columns ride the
    * output (the tie-ful caller consumes the selected row's tie
    * VALUES downstream, and the rank-r tie value within an all-tied
    * bin still requires ordering by the tie columns).
    *
    * @param scored  frame with group key `g`, numeric value `v`, and
    *                any `tie` columns completing the total order
    * @param bins    histogram width — the parallelism/selectivity
    *                knob; per-task pass-2 work is the hottest
    *                NON-point-mass candidate bin
    * @param binOf   bin-index expression over columns `(v, lo, hi)`:
    *                monotone in `v`, landing in `[0, bins)` (callers
    *                pick the float q33 or integer-exact convention)
    * @param mkRanks bounds `(g, lo, hi, n)` → requested ranks: a
    *                frame with `g` and a long `r` per requested row,
    *                plus any rider columns carried into the output
    *                (duplicate ranks allowed — one output row each)
    * @param tie     tiebreak column names after `v`
    * @param materialize when true (the default) the returned
    *                `selected` frame is materialized
    *                ([[Rounds.materialize]]) before it leaves: it is
    *                ranks-sized (one row per request), but its LINEAGE
    *                is the whole two-pass corpus computation — a
    *                caller that references it twice (anomalyRobust's
    *                median feeds both the MAD selection and the final
    *                scoring join) would otherwise replicate every
    *                corpus scan per reference. The r11 committed
    *                events_anomaly_robust plan re-read the events
    *                parquet 50× this way. `false` is for plan-shape
    *                inspection only (PointMassSpec pins the pass-2
    *                fence structurally).
    * @return (selected, bounds): `selected` has one row per `mkRanks`
    *         row — `(g, v, tie..., r, riders...)`; `bounds` is the
    *         `(g, lo, hi, n)` frame for downstream use — derived from
    *         the materialized groups×bins summary (never re-runs
    *         corpus lineage, costs one summary aggregate per
    *         reference)
    */
  def at(scored: DataFrame, bins: Int, binOf: Column,
         mkRanks: DataFrame => DataFrame,
         tie: Seq[String] = Seq.empty,
         materialize: Boolean = true): (DataFrame, DataFrame) = {
    require(bins > 0, s"bins ($bins) must be positive")
    val nn = scored.filter(col("v").isNotNull)
    // pass-1 bounds are NOT materialized on their own: their corpus
    // aggregation executes as the broadcast-exchange build INSIDE the
    // cum materialization job below — one barrier where there were
    // two. Every later consumer reads `bounds`, which is re-derived
    // from the materialized groups×bins summary (see below) and so
    // never re-runs corpus lineage.
    val boundsLineage = nn.groupBy("g")
      .agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("n"))
    val binned = nn.join(broadcast(boundsLineage), Seq("g"))
      .withColumn("bin", binOf)
    // per-bin min/max ride the SAME map-side-combined aggregate as
    // the counts — they are what detects a point-mass bin for free
    val hist = binned.groupBy("g", "bin").agg(count(lit(1)).as("bn"),
      min("v").as("bmin"), max("v").as("bmax"))
    val wc = Window.partitionBy("g").orderBy("bin")
    // the SECOND (and last) corpus pass under summary lineage: the
    // cumulative histogram is groups×bins rows but its plan re-runs
    // the corpus binning aggregate per reference — and `located`
    // below is referenced by the pass-2 semi-join, the rank-recovery
    // join AND the point-mass arm. Materialize once; everything
    // downstream of here except pass-2's own bin sort reads rows.
    // boundedWindowOk: when a single-group caller passes a constant
    // `g` (q40_concentration's lit(0)), Catalyst folds the partition
    // key and this cumsum window runs unpartitioned — legitimately:
    // its input is the (g, bin) AGGREGATE, ≤ `bins` rows per group
    // by the binOf range contract (RoundsSpec pins bin ∈ [0, bins)
    // for both conventions), never the corpus. Any other frame
    // reaching materialize with an unpartitioned window fails fast.
    // the materialized summary carries the cumulative histogram AND
    // one bounds row per group (bin = −1: bn = n, bmin = lo,
    // bmax = hi — exactly the pass-1 values, since every non-null v
    // lands in some bin). Both branches aggregate the SAME binned
    // corpus exchange (reused within the job), so the bounds rows
    // cost one summary-sized aggregate — and every downstream bounds
    // reference is a FILTER over checkpointed rows, not a shuffle
    // (the first 2-barrier cut re-aggregated cum inside each
    // broadcast build, which re-added a small exchange job per
    // reference and measurably hurt the multi-reference callers).
    val cumAll = Rounds.materialize(
      hist.withColumn("cb",
        coalesce(sum("bn").over(wc.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .unionByName(hist.groupBy("g").agg(
          sum("bn").as("bn"), min("bmin").as("bmin"),
          max("bmax").as("bmax"))
          .select(col("g"), lit(-1L).as("bin"), col("bn"),
            col("bmin"), col("bmax"), lit(0L).as("cb"))),
      boundedWindowOk = true)
    val cum = cumAll.filter(col("bin") >= 0L)
    val bounds = cumAll.filter(col("bin") === -1L)
      .select(col("g"), col("bmin").as("lo"), col("bmax").as("hi"),
        col("bn").as("n"))
    // pass-2's binning joins the DERIVED bounds (same values, summary
    // lineage) — re-using `binned` would re-run the pass-1 corpus
    // aggregate inside this job's broadcast build
    val binned2 = nn.join(broadcast(bounds), Seq("g"))
      .withColumn("bin", binOf)
    val ranks = mkRanks(bounds)
    // broadcast the RANKS side — strictly the smaller frame (a
    // handful of rows per group vs cum's groups×bins): left to the
    // planner this join occasionally came out a sort-merge join
    // when the checkpointed lineage hid the sizes, and broadcasting
    // cum would put the 256×-larger side on the driver
    val located = cum.join(broadcast(ranks), Seq("g"))
      .filter(col("cb") <= col("r") && col("r") < col("cb") + col("bn"))
      .drop("bn")
    // the summary-only answer needs scored ≡ (g, v): any extra
    // column would have to come from an actual row of the bin
    val shortCircuit =
      tie.isEmpty && nn.columns.sorted.sameElements(Array("g", "v"))
    val locSort =
      if (shortCircuit) located.filter(col("bmin") =!= col("bmax"))
      else located
    val wb = Window.partitionBy("g", "bin").orderBy("v", tie: _*)
    // only rows of located NON-point-mass bins ever reach the window
    // sort — the bmin =!= bmax filter above is a structural guarantee
    // (PointMassSpec pins it in the plan), not a runtime fast path
    val sorted = binned2
      .join(broadcast(locSort.select("g", "bin").distinct()), Seq("g", "bin"))
      .withColumn("rib", row_number().over(wb).cast("long") - 1L)
      .join(broadcast(locSort), Seq("g", "bin"))
      .filter(col("cb") + col("rib") === col("r"))
      .drop("bin", "cb", "rib", "lo", "hi", "n", "bmin", "bmax")
    val selected =
      if (!shortCircuit) sorted
      else {
        val riders = ranks.columns.toSeq.filterNot(Set("g", "r"))
        val heavy = located.filter(col("bmin") === col("bmax"))
          .select(col("g") +: col("bmin").as("v") +: col("r") +:
            riders.map(col): _*)
        sorted.unionByName(heavy)
      }
    // ranks-sized rows, corpus-sized lineage: hand callers a frame
    // they can reference freely (broadcast joins, chained RankSelect
    // passes) without replicating pass-2's corpus scan per reference
    (if (materialize) Rounds.materialize(selected) else selected, bounds)
  }
}
