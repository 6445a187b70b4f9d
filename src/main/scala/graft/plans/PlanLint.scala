package graft.plans

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Static plan linter: the scale-review checklist this repo applies to
  * every query (see `plans/` snapshots and PlanAuditSpec), packaged as
  * a library API so a user's own pipelines get the same audit. Runs on
  * the compiled physical plan — no execution, no data.
  *
  * Severity semantics:
  *   - `error`: a shape that breaks at cluster scale regardless of
  *     tuning — an O(n·m) cartesian product, or a windowed computation
  *     with no PARTITION BY (every row of the input lands in ONE task;
  *     local runs merely print Spark's WARN and grind on).
  *   - `warn`: usually wrong, occasionally intended — a nested-loop
  *     join (fine only when the broadcast side is bounded by
  *     construction), a filter sitting above a scan that pushed
  *     nothing down (the scan reads everything the filter will drop),
  *     a projection narrower than its scan (column pruning missed —
  *     typically a cached or manually-constructed frame).
  *   - `info`: context the reviewer weighs — sort-merge joins (often
  *     better as shuffle-hash/broadcast; removable with bucketing),
  *     global sorts (fine for small/final output, a full-data
  *     range-exchange otherwise), and the shuffle count.
  *
  * The lint is *static*: shape rules run on `queryExecution.sparkPlan`
  * (pre-preparation — no codegen/columnar wrappers between parent and
  * child, so Filter-above-scan patterns match structurally), while the
  * shuffle count comes from the prepared `executedPlan` (exchanges are
  * inserted by EnsureRequirements, which only runs there). AQE can
  * downgrade a flagged SMJ to a broadcast join at runtime, but a plan
  * that only works because AQE rescued it is still worth the flag.
  */
object PlanLint extends AdaptiveSparkPlanHelper {

  final case class Finding(rule: String, severity: String, detail: String)

  /** Calendar-bucket column names for the time-key-window rule —
    * keys whose distinct count tracks the CALENDAR, not the data
    * volume. A name heuristic by necessity: a static plan carries
    * no cardinality. Composite names (`cohort_week`) and banded
    * keys (`day, band`) deliberately do not match.
    */
  private val TimeKeyName = java.util.regex.Pattern.compile(
    "(?i)(day|date|dt|week|wk|month|mon|year|yr|dow|hour|hr)s?")

  def audit(ds: Dataset[_]): Seq[Finding] =
    auditPlan(ds.queryExecution.sparkPlan) :+ {
      val shuffles = collectWithSubqueries(ds.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }.size
      Finding("shuffle-count", "info", s"$shuffles shuffle exchange(s)")
    }

  /** Count the TOP-LEVEL elements of a `[a, b(c, d), e]` metadata
    * list — commas inside parentheses belong to one element.
    */
  private def countElems(s: String): Int = {
    val body = s.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) 0
    else {
      var depth = 0; var n = 1
      body.foreach {
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => n += 1
        case _ => ()
      }
      n
    }
  }

  /** Same-table scan count above which `duplicate-scan` fires. A
    * handful of repeats is normal (a self-join, a two-pass
    * aggregate); dozens means an unmaterialized summary frame is
    * being referenced from many subtrees and each reference re-runs
    * the corpus lineage — the r11 events_anomaly_robust plan
    * re-read the events parquet 50× this way, visible statically
    * for two rounds with no rule to catch it. The fix is always the
    * same: materialize the small frame (Rounds.materialize /
    * localCheckpoint), not restructure the query.
    */
  val DuplicateScanThreshold = 6

  def auditPlan(plan: SparkPlan): Seq[Finding] = {
    val findings = scala.collection.mutable.ArrayBuffer.empty[Finding]
    val scans = scala.collection.mutable.ArrayBuffer.empty[String]

    def walk(p: SparkPlan): Unit = {
      p match {
        case s: FileSourceScanExec =>
          scans += s.relation.location.rootPaths.map(_.toString)
            .sorted.mkString(",")
        case _ => ()
      }
      p match {
        case _: CartesianProductExec =>
          findings += Finding("cartesian-product", "error",
            "O(left x right) row pairing; unusable beyond toy inputs")
        case j: BroadcastNestedLoopJoinExec =>
          findings += Finding("nested-loop-join", "warn",
            s"${j.joinType} NLJ: acceptable only when the broadcast side " +
              "is bounded by construction (model/summary frames)")
        case _: SortMergeJoinExec =>
          findings += Finding("sort-merge-join", "info",
            "SMJ sorts both sides; shuffle-hash or broadcast is usually " +
              "cheaper, and bucketing removes the exchange entirely")
        case w: WindowExec if w.partitionSpec.isEmpty =>
          findings += Finding("single-partition-window", "error",
            "window with no PARTITION BY moves every row to one task")
        case w: WindowExec if w.partitionSpec.forall {
            case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
              TimeKeyName.matcher(a.name).matches
            case _ => false
          } =>
          // the day-only-window trap: partition keys whose distinct
          // count grows with CALENDAR TIME, not with traffic — one
          // task absorbs an entire day/week/month of rows however
          // large the input gets. Caught by NAME (the static plan
          // cannot see cardinality), so this fires on two shapes:
          // a corpus-scale window (the bug — add a sub-period band
          // to the key and carry prefixes across bands, see
          // Events.concurrency / tsMatch) and a window over a
          // band-summary frame already bounded by construction
          // (fine — the carry step itself looks like this). Hence
          // warn, not error.
          findings += Finding("time-key-window", "warn",
            s"window partitioned only by calendar-cardinality key(s) [" +
              w.partitionSpec.map(_.sql).mkString(", ") +
              "]: per-key volume is unbounded at scale unless the " +
              "input frame is itself a bounded summary")
        case s: SortExec if s.global =>
          findings += Finding("global-sort", "info",
            s"full-data range exchange + sort on ${s.sortOrder.map(_.sql).mkString(", ")}")
        case f: FilterExec =>
          f.child match {
            case scan: FileSourceScanExec =>
              // a predicate the source could not translate appears in
              // DataFilters (evaluated post-scan) but not PushedFilters
              val data = scan.metadata.get("DataFilters").map(countElems)
              val pushed = scan.metadata.get("PushedFilters").map(countElems)
              for (d <- data; p <- pushed; if d > p)
                findings += Finding("filter-not-pushed", "warn",
                  s"$d data filter(s) on the scan but only $p pushed to " +
                    "the source — the unpushed predicates read and then " +
                    "discard rows (non-translatable expressions: function " +
                    "calls, UDFs, casts on the column side)")
            case _ => ()
          }
        case pr: ProjectExec =>
          pr.child match {
            case scan: FileSourceScanExec =>
              val needed = pr.references.map(_.exprId).toSet
              val scanned = scan.output.map(_.exprId).toSet
              if ((scanned -- needed).nonEmpty && needed.subsetOf(scanned))
                findings += Finding("column-pruning-missed", "warn",
                  s"scan materializes ${scanned.size} columns, projection " +
                    s"uses ${needed.size} — pruning did not reach the scan")
            case _ => ()
          }
        case _ => ()
      }
      p.children.foreach(walk)
      // pre-preparation plans can still carry LOGICAL subquery plans
      // (PlanSubqueries only runs in executedPlan preparations), and
      // QueryPlan.subqueries force-casts — collect from expressions
      // ourselves and lint only the already-physical ones
      p.expressions
        .flatMap(_.collect {
          case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
            pe.plan
        })
        .foreach {
          case sp: SparkPlan => walk(sp)
          case _ => ()
        }
    }
    walk(plan)
    // per-table scan multiplicity over the WHOLE plan (subqueries
    // included): one plan scanning one table dozens of times is the
    // unmaterialized-summary-lineage signature, not a join pattern
    scans.groupBy(identity).foreach { case (table, hits) =>
      if (hits.size > DuplicateScanThreshold)
        findings += Finding("duplicate-scan", "warn",
          s"${hits.size} scans of the same table in one plan " +
            s"(> $DuplicateScanThreshold) — an unmaterialized frame " +
            "is referenced from many subtrees and each reference " +
            "re-runs its corpus lineage; materialize the small frame " +
            s"(Rounds.materialize). Table: ${table.take(120)}")
    }
    findings.toSeq
  }

  /** Findings at `error` severity — the ones with no legitimate
    * large-scale reading. Empty means the plan passes the lint.
    */
  def errors(ds: Dataset[_]): Seq[Finding] =
    audit(ds).filter(_.severity == "error")

  /** Human-readable report, one finding per line. */
  def report(ds: Dataset[_]): String =
    audit(ds).map(f => f"[${f.severity}%-5s] ${f.rule}: ${f.detail}")
      .mkString("\n")
}
