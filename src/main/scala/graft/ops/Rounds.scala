package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Round materialization for the ITERATIVE loops (component labels,
  * k-core peeling, label propagation, BFS relaxation, keeper
  * propagation): each round references its own frame 2-3 times, so
  * lineage must truncate per round or the unresolved plan doubles
  * every iteration (2^iters subplans — the componentSizes lesson).
  *
  * TWO storage modes, one call site:
  *
  *  - default — `localCheckpoint()`: blocks live on EXECUTORS. Fast
  *    (no filesystem round trip), right for local[] sessions and
  *    bounded model fits — but truncated lineage cannot recompute,
  *    so at cluster scale an executor loss mid-iteration kills the
  *    job.
  *  - reliable — opt in by setting the session conf
  *    `spark.graft.checkpoint.reliable=true` AND a checkpoint dir
  *    (`spark.sparkContext.setCheckpointDir(<dfs path>)`): rounds
  *    write through `.checkpoint()` to the distributed FS and
  *    survive executor loss, at one DFS write per iteration. The
  *    100 TB posture for long loops on preemptible fleets. Files
  *    accumulate per round unless
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` or the
  *    job cleans its dir afterward.
  *
  * The CONVERGENCE PROBE rides the same job: `materializeChanged` /
  * `materializeCounted` attach an observed metric
  * ([[org.apache.spark.sql.Observation]]) to the checkpoint
  * materialization, so the fixpoint check costs zero extra actions —
  * previously each round paid a separate `isEmpty` driver round trip
  * joining two materialized frames.
  */
object Rounds {

  /** The reliable-mode session flag; default stays executor-local. */
  val ReliableConf = "spark.graft.checkpoint.reliable"

  /** Explicit partition count for COMPUTE-DENSE small-byte stages
    * (gram/signature kernels, candidate self-joins, banded verify):
    * AQE's coalescing targets BYTES — max(bytes ∕ parallelism,
    * minPartitionSize) — so a stage that is small in bytes but heavy
    * in CPU collapses onto 1-2 tasks while the rest of the executor
    * idles. An explicit `repartition(n, key)` is exempt from AQE
    * coalescing, so pinning THIS count at the operator restores
    * parallelism exactly where it pays, without the session-wide
    * floor the r16 round tried (which multiplied task counts across
    * all ~276 query paths and lost more than it won). The value is
    * the session's shuffle parallelism — deployment-tuned at cluster
    * scale, cores in local mode — never a hard-coded constant.
    */
  def cpuPartitions(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** Truncate lineage and materialize one round's frame, in the
    * session's configured storage mode.
    *
    * Eager materialization EXECUTES a plan the final-plan lint never
    * sees (PlanLint walks committed query plans; a localCheckpoint
    * intermediate is already rows by then) — exactly where r13's
    * residual `WindowExec: No Partition Defined` warnings hid. So the
    * helper lints HERE: a frame whose plan carries an unpartitioned
    * window fails fast unless the caller passes
    * `boundedWindowOk = true`, the explicit allowlist for frames
    * bounded by construction (a groups×bins histogram cumsum — the
    * one legitimate shape, see [[RankSelect.at]]; its partition key
    * folds away when a single-group caller passes a constant `g`).
    */
  def materialize(df: DataFrame, boundedWindowOk: Boolean = false): DataFrame = {
    if (!boundedWindowOk) {
      val bad = graft.plans.PlanLint.audit(df)
        .filter(_.rule == "single-partition-window")
      require(bad.isEmpty,
        "eager materialization would execute a single-partition window " +
          "invisible to the final-plan lint; pass boundedWindowOk = true " +
          "only for frames bounded by construction (summary/model " +
          s"frames): ${bad.mkString("; ")}")
    }
    if (reliable(df)) df.checkpoint() else df.localCheckpoint()
  }

  /** [[materialize]] plus the round's CHANGED-ROW COUNT, collected by
    * the same job. `df` must carry a boolean `chg` column marking
    * rows this round changed; the metric consumes it and the stored
    * frame drops it. Returns (materialized frame, changed count). */
  def materializeChanged(df: DataFrame): (DataFrame, Long) =
    observed(df.drop("chg"), df, sum(col("chg").cast("long")))

  /** [[materialize]] plus the frame's ROW COUNT, collected by the
    * same job — the probe for peeling loops where rows are removed,
    * not rewritten (equal consecutive counts = fixpoint). */
  def materializeCounted(df: DataFrame): (DataFrame, Long) =
    observed(df, df, count(lit(1)))

  private def observed(out: DataFrame, over: DataFrame,
                       metric: org.apache.spark.sql.Column): (DataFrame, Long) = {
    val obs = Observation()
    // observe BELOW the projection: the metric may read columns the
    // stored frame drops
    val mat = materialize(
      over.observe(obs, metric.as("m")).select(out.columns.map(col): _*))
    // Observation.get blocks until the action's metrics arrive —
    // the eager checkpoint above IS that action
    val n = obs.get.getOrElse("m", null) match {
      case x: Number => x.longValue()
      case _ => 0L // sum over zero rows is null
    }
    (mat, n)
  }

  private def reliable(df: DataFrame): Boolean = {
    val on = df.sparkSession.conf.get(ReliableConf, "false").toBoolean
    if (on) require(
      df.sparkSession.sparkContext.getCheckpointDir.isDefined,
      s"$ReliableConf=true requires spark.sparkContext.setCheckpointDir(...)")
    on
  }
}
