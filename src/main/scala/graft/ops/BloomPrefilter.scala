package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi-joins: membership against a key set too
  * large to broadcast as a hash relation, compressed into megabytes
  * of bloom bits that DO broadcast.
  *
  * The 100 TB shape this exists for: `fact ⋉ dim` where `dim` holds
  * billions of keys. A plain left-semi join shuffles the ENTIRE fact
  * table on the join key; AQE's runtime bloom filter automates the
  * fix only when the dim side is a filtered scan in the same query.
  * This module makes the pattern explicit and REUSABLE: build the
  * bloom once (one aggregation to a single ~MB row), broadcast it,
  * drop the ~(1−fpp) of fact rows that cannot match before any
  * exchange, then run the exact semi-join over the survivors. The
  * result is EXACT — the bloom admits false positives only, and the
  * closing equi-join removes them — so the operator certifies itself
  * against the plain semi-join.
  *
  * The bloom rides Spark's own sketch: [[BloomFilterAggregate]] /
  * [[BloomFilterMightContain]] (the pair the runtime-filter rule
  * injects) over `xxhash64(key)`, merged by bitwise OR — associative
  * and commutative, so the built bits are identical under any
  * partitioning. [[save]]/[[load]] publish the built filter through
  * [[VersionedStore]]: tomorrow's scan prefilters against
  * yesterday's key set without recomputing it (the cross-job posture
  * of the keeper/PCA models, applied to membership).
  */
object BloomPrefilter {

  /** Optimal bit count for `n` items at false-positive rate `fpp`,
    * capped at 8 MiB of bits (the default ceiling Spark's runtime
    * filter uses — past it, fpp degrades gracefully rather than the
    * broadcast growing without bound).
    */
  private[graft] def numBits(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0 && fpp < 1, s"need n > 0, fpp in (0,1); got $n, $fpp")
    val ideal = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    math.min(math.max(ideal, 64L), 8L * 1024 * 1024 * 8)
  }

  /** The bloom-building aggregate over `xxhash64(key)` as a Column —
    * ONE construction shared by [[keyBloom]] and the manifest's
    * per-file bloom index, so the hash convention (seed-42 xxhash64)
    * and sizing can never drift apart between the build sites a
    * driver-side probe must mirror.
    */
  private[graft] def bloomAgg(key: Column, expectedItems: Long,
                              fpp: Double): Column = {
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(key)),
      GraftBridge.expression(lit(expectedItems)),
      GraftBridge.expression(lit(numBits(expectedItems, fpp))))
    GraftBridge.column(agg.toAggregateExpression())
  }

  /** One-row frame `(bloom: binary)`: bloom bits over
    * `xxhash64(key)` of every row in `keys`. Map-side partial
    * sketches OR-merge, so the only thing that moves is bloom bits.
    */
  def keyBloom(keys: DataFrame, key: String, expectedItems: Long,
               fpp: Double = 0.03): DataFrame =
    keys.select(col(key))
      .agg(bloomAgg(col(key), expectedItems, fpp).as("bloom"))

  /** Membership test of `key` against the one-row `bloom` frame
    * (false positives at the built fpp, never false negatives). The
    * bloom rides a SCALAR SUBQUERY — `might_contain` requires its
    * filter side constant-per-query (the subquery executes once and
    * its ~MB result is shipped to every task like a broadcast
    * variable), which is precisely the shape Spark's own runtime-
    * filter rule injects. NOTE: `xxhash64(null)` is NOT null (it
    * hashes to a seed-derived constant), so this test alone does not
    * reject null keys — [[prefilter]] adds the explicit null cut.
    */
  def mightContain(bloom: DataFrame, key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        GraftBridge.analyzed(bloom)),
      GraftBridge.expression(xxhash64(key))))

  /** `fact` rows surviving the bloom prefilter: the scan-side cut
    * that happens BEFORE any exchange. `bloom` is a one-row
    * [[keyBloom]] / [[load]] frame. Null keys are dropped explicitly
    * (semi-join null semantics): xxhash64 maps null to a constant
    * that may collide with real bloom bits, so without this cut a
    * standalone prefilter consumer would count rows that can never
    * match any dim key.
    */
  def prefilter(fact: DataFrame, factKey: String, bloom: DataFrame): DataFrame =
    fact.filter(col(factKey).isNotNull && mightContain(bloom, col(factKey)))

  /** Exact `fact ⋉ dimKeys` with the bloom cut in front: build the
    * bloom from the dim keys, prefilter the fact scan, close with the
    * exact left-semi join over the survivors. Row-identical to the
    * plain semi-join (spec-pinned); the exchange moves only rows the
    * bloom could not rule out.
    */
  def semiJoin(fact: DataFrame, dimKeys: DataFrame, factKey: String,
               dimKey: String, expectedItems: Long,
               fpp: Double = 0.03): DataFrame = {
    val keys = dimKeys.select(col(dimKey))
    val pre = prefilter(fact, factKey, keyBloom(keys, dimKey, expectedItems, fpp))
    pre.join(keys.hint("shuffle_hash"), pre(factKey) === keys(dimKey), "left_semi")
  }

  private val Prefix = "v="

  /** Publish the built bloom as an immutable versioned artifact
    * (atomic rename, idempotent republish — the shared
    * [[VersionedStore]] discipline). One ~MB row: the cheapest
    * cross-job handle a 10-billion-key membership set can have.
    */
  def save(spark: SparkSession, bloom: DataFrame, dir: String,
           version: Long): Unit = {
    VersionedStore.commit(spark, dir, s"$Prefix$version") { staging =>
      bloom.coalesce(1).write.parquet(staging.toString)
    }: Unit
  }

  /** Load a published bloom (latest version unless pinned). */
  def load(spark: SparkSession, dir: String,
           version: Option[Long] = None): DataFrame = {
    val v = version.orElse(
      VersionedStore.listVersions(spark, dir, Prefix).sorted.lastOption)
      .getOrElse(throw new IllegalStateException(s"no bloom versions in $dir"))
    spark.read.parquet(s"$dir/$Prefix$v")
  }
}
