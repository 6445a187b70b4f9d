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
}
