package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Local mode is a stand-in for a real cluster: every setting here is
  * one that transfers (AQE, skew join, broadcast threshold); nothing
  * is keyed to `local[*]` except the master URL itself.
  */
object GraftSession {

  /** Demote WindowExec's "No Partition Defined" runtime warning to
    * ERROR. The repo's coverage of this failure mode is now STRICTER
    * than the log line: PlanLint errors on any unpartitioned window
    * in a committed plan, and [[graft.ops.Rounds.materialize]] fails
    * fast on any eagerly-executed one — the single allowlisted site
    * (RankSelect's groups×bins cumsum under a constant group key,
    * q40_concentration) is spec-pinned bounded (RoundsSpec), so the
    * only thing the log line still produced was noise in every bench
    * and verify run. A NEW offending window throws, never warns.
    *
    * Residual gap, stated rather than hidden: an eager execution that
    * neither commits a plan nor goes through `Rounds.materialize`
    * (model-fit collects such as pcaFit's dimAvgs or labelDrift's
    * centroid rows) is silenced too — those sites are all bounded
    * model-sized aggregates today, but the lint does not SEE them.
    * The demotion is deliberately scoped to the Bench/Verify entry
    * points (library users keep the warning), and `WarnAudit`
    * intentionally does NOT call this, so the serial audit runner
    * still surfaces every WindowExec warning with attribution.
    */
  def quietBoundedWindowWarning(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      : SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE coalescing floor (default 1m): with parallelismFirst (the
      // default) the post-shuffle target size is max(bytes ∕ default
      // parallelism, THIS FLOOR), so a compute-dense model-sized
      // shuffle — a candidate self-join, a verify stage, a banded
      // aggregate over a few MB — collapses to 1-2 tasks and
      // serializes seconds of CPU while the rest of the executor
      // sits idle (measured: dedup_editdist's candidate+verify
      // stages ran 1-task for 5.0 of its 5.2s; 64k → 1.66s total).
      // Scale-safe by construction: the floor only binds when
      // bytes ∕ parallelism is below it, i.e. exactly the small-
      // bytes-heavy-CPU regime, at any cluster size; large shuffles
      // keep their parallelism-first targets. Env-overridable for
      // deployments whose small shuffles are NOT compute-dense.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // scan split sizing (default 4m): openCostInBytes FLOORS the
      // computed split size — max(openCost, bytes ∕ defaultParallelism)
      // — so any input whose total bytes ∕ cores is below 4 MB scans
      // on a handful of tasks regardless of cluster size, and the
      // per-row generator/parse kernels that sit directly on the scan
      // serialize onto them (measured: cdc_malformed ran its whole
      // parse on ONE task from a single-file input). 128 KiB keeps
      // large-scan split sizing untouched (bytes ∕ cores dominates
      // once inputs exceed ~4 MB × cores) and still packs genuinely
      // tiny files; deployments with million-tiny-file tables can
      // raise it back via the env override.
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "131072"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // runtime bloom-filter pruning: selective join sides seed a
      // bloom filter pushed into the probe-side scan (big at 100 TB)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = builder().getOrCreate()
}
