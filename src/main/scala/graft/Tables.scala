package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Catalog of the synthetic TPC-H-ish tables (see TESTDATA.md).
  *
  * Single chokepoint for reads so scan-level policy (schema pruning,
  * push-down, future bucketing/sort metadata) is applied uniformly.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  /** `events.ts` normalization. The generator has shipped the column as
    * parquet TIMESTAMP(NANOS) (Spark reads it as a long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) and as naive
    * TIMESTAMP(MICROS) (Spark 4 infers TIMESTAMP_NTZ). Either way the
    * engine's contract is a session-TZ TIMESTAMP: under the UTC session
    * both normalizations preserve the wall-clock values DuckDB sees in
    * the same file, so `unix_micros`/interval arithmetic downstream is
    * byte-identical across generator versions.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // runtime-settable; makes the reader independent of how the
    // session was built (driver harnesses may not know about it)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: truncate to micros
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // naive micros: same wall-clock, UTC session
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
