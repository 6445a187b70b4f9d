package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Pins [[Tables.events]]'s timestamp normalization across generator
  * versions. The synthetic generator has shipped `events.ts` as parquet
  * TIMESTAMP(NANOS) (read as a long under nanosAsLong) and as naive
  * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ by Spark 4's inference) —
  * the round-8 regeneration flipped ns→us and silently broke every
  * `unix_micros(ts)` consumer (26 queries). The loader owns the
  * normalization so the engine's contract is always a session-TZ
  * TIMESTAMP with identical wall-clock micros.
  */
class TablesSpec extends SparkSpec {

  test("events loader: current testdata yields TIMESTAMP ts") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    // downstream contract: unix_micros must resolve
    assert(ev.select(unix_micros(col("ts"))).limit(1).count() == 1)
  }

  test("events loader: naive TIMESTAMP_NTZ parquet normalizes to same wall-clock micros") {
    import spark.implicits._
    val dir = s"/tmp/graft-test-ntz-${System.nanoTime()}"
    val us = 1720000000123456L // 2024-07-03T...Z, non-zero micros
    // write a real NTZ column: timestamp_micros gives LTZ, cast to NTZ
    Seq((1L, us)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        lit(5L).as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    // UTC session: NTZ wall-clock == instant micros, byte-identical
    assert(ev.select(unix_micros(col("ts"))).as[Long].head() == us)
  }

  test("events loader: nanos-as-long parquet truncates to micros") {
    import spark.implicits._
    val dir = s"/tmp/graft-test-ns-${System.nanoTime()}"
    val ns = 1720000000123456789L
    Seq((1L, ns)).toDF("event_id", "ts")
      .withColumn("user_id", lit(5L)).withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == LongType)
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).as[Long].head() == ns / 1000)
  }
}
