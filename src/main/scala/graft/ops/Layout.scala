package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for cluster-scale joins: bucketing for
  * shuffle-free co-located joins, salting for skewed keys. These are
  * the knobs a 100 TB deployment turns; locally they are exercised by
  * `LayoutSpec`, which asserts the resulting plans (no Exchange on a
  * bucketed join; salted join equals plain join).
  */
object Layout {

  /** Persist a DataFrame bucketed + sorted by `key`: joins and
    * aggregations on `key` between tables bucketed the same way run
    * without any shuffle (the scan itself reports the required
    * hash distribution).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Persist a frame partitioned by a derived date column: scans
    * with a date predicate prune whole directories (the dominant
    * cost lever for time-series facts at 100 TB). The partition
    * column must be low-cardinality — days, not timestamps.
    */
  def writePartitionedByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("day", date_trunc("day", col(tsCol)).cast("date"))
      .write.partitionBy("day").mode("overwrite").parquet(path)

  /** Morton (Z-order) key: bit-interleave of two 16-bit normalized
    * dimensions — a space-filling curve, so rows close in the key are
    * close in BOTH dimensions. Built from shift/mask column ops only
    * (stays in codegen).
    */
  private def morton16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      (shiftleft(shiftrightunsigned(x, i).bitwiseAND(1L), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftrightunsigned(y, i).bitwiseAND(1L), 2 * i))
    }.reduce(_ bitwiseOR _)

  // 64-bit lanes: bit 15 of the x dimension lands at bit 31 of the
  // interleave, which in a 32-bit Int would be the sign bit — negative
  // keys would split the Z-curve ordering at the x midpoint
  private def scale16(c: Column, cMin: Column, cMax: Column): Column =
    when(cMax === cMin, 0L)
      .otherwise(((c - cMin) / (cMax - cMin) * 65535.0).cast("bigint"))

  /** Z-ordered write: sort the frame along a Morton curve over two
    * numeric columns before writing, so each output file covers a
    * NARROW range of both dimensions and parquet min/max stats prune
    * scans filtered on either (or both) — multi-dimensional data
    * skipping, where a linear sort only skips on its leading column.
    * Normalization bounds come from one aggregate pass, broadcast
    * like a scalar subquery; the range partitioning + in-partition
    * sort is the same machinery a cluster-scale OPTIMIZE would use.
    */
  def writeZOrdered(df: DataFrame, c1: String, c2: String, path: String,
                    numFiles: Int): Unit = {
    val bounds = df.agg(
      min(col(c1)).cast("double").as("min1"), max(col(c1)).cast("double").as("max1"),
      min(col(c2)).cast("double").as("min2"), max(col(c2)).cast("double").as("max2"))
    df.join(broadcast(bounds))
      .withColumn("__z", morton16(
        scale16(col(c1).cast("double"), col("min1"), col("max1")),
        scale16(col(c2).cast("double"), col("min2"), col("max2"))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "min1", "max1", "min2", "max2")
      .write.mode("overwrite").parquet(path)
  }

  /** Skew-safe equi-join: the skewed (big) side gets a deterministic
    * pseudo-random salt in [0, salt); the small side is replicated
    * `salt` times; the join key becomes (key, salt), splitting each
    * hot key's rows across `salt` reducers. AQE's skew-join handles
    * moderate skew automatically — this is the explicit tool for
    * pathological keys.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    val saltedBig = big.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Materialize the corpus as globally-shuffled training shards:
    * rows land in `shard=K` directories by [[Sampling.shardId]] (a
    * pure md5 function of the key — no seed, no sampling state,
    * reproducible on any engine), ordered WITHIN each shard by the
    * full md5 of the key, so a trainer streaming any shard
    * sequentially reads a hash-shuffled interleave of every source —
    * never a source's rows back to back. One exchange on the shard
    * id + an in-partition sort; nothing resembling a global
    * `ORDER BY rand()` range sort. [[Sampling.shardAudit]] is the
    * pre-flight balance/mixing report for the same assignment.
    */
  def writeTrainingShards(df: DataFrame, key: String, path: String,
                          nShards: Int): Unit =
    shardLayout(df, key, nShards)
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** Materialize the FULL proportional-interleave epoch
    * ([[Sampling.interleaveKeys]] — the deterministic `r·N div n_s`
    * schedule [[Sampling.interleave]] exposes the head of) as
    * `shard=K` parquet directories a sequential loader streams in
    * shard order: shard K holds the CONTIGUOUS pos_key slice
    * `[K·(N+1)/nShards, (K+1)·(N+1)/nShards)`, sorted inside by the
    * total order (pos_key, source, rank_in_source), so reading
    * shard 0's rows, then shard 1's, … replays the exact epoch.
    *
    * Zero global sort and zero sampling: the shard id is a pure
    * integer function of pos_key (near-uniform over [0, N] by the
    * interleave's own construction, so shards balance), the exchange
    * is ONE hash repartition on it, and the order inside each shard
    * is a sortWithinPartitions — the writeTrainingShards shape, not
    * an `ORDER BY` (no range-boundary sampling job, bit-identical
    * layout on every engine/restart). The shard product widens
    * through DECIMAL(38,0) (pos_key·nShards wraps int64 near
    * 10¹²·10⁷).
    */
  def writeInterleaved(documents: DataFrame, path: String, nShards: Int,
                       bands: Int = 64): Unit =
    interleavedLayout(documents, nShards, bands)
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** The interleaved-epoch layout transform (the frame
    * [[writeInterleaved]] persists) — exposed so `LayoutSpec` pins
    * its plan: one hash exchange on the shard id, local sorts only,
    * never a global Sort / range-boundary sampling job.
    */
  private[graft] def interleavedLayout(documents: DataFrame, nShards: Int,
                                       bands: Int): DataFrame = {
    require(nShards > 0, s"nShards ($nShards) must be positive")
    Sampling.interleaveKeys(documents, bands)
      .withColumn("shard", expr(
        s"CAST(CAST(pos_key AS DECIMAL(38,0)) * $nShards " +
          "div (n + 1) AS INT)"))
      .drop("n")
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos_key", "source", "rank_in_source")
  }

  /** The shard-layout transform itself — ONE definition shared by the
    * batch writer above and the streaming
    * [[graft.streaming.AppendSink.commitShardedBatch]] sink, so the
    * assignment AND the in-shard hash ordering can never diverge
    * between the two paths. Returns the frame with a `shard` column,
    * hash-partitioned one-shard-per-task and sorted by the full key
    * md5 within each shard; callers only choose the write target.
    */
  private[graft] def shardLayout(df: DataFrame, key: String,
                                 nShards: Int): DataFrame =
    df.withColumn("shard", Sampling.shardId(col(key), nShards))
      .withColumn("__ord", md5(col(key).cast("string")))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "__ord")
      .drop("__ord")
}
