package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-on-read ingestion of JSON-line changelogs — the engine's
  * stand-in for the reference's JSON topic consumption
  * (FtsAndGeoServiceJSONWithCDC.java polls JSON change messages from
  * a stream; here the transport is files, the parsing contract is
  * the same). The schema is EXPLICIT: at 100 TB, schema inference is
  * a full extra pass over the data and non-deterministic under
  * drift, so it is never used. Malformed lines are quarantined, not
  * dropped (PERMISSIVE + corrupt-record column), because a CDC
  * pipeline must account for every message.
  */
object ChangelogSource {

  /** The wire schema of a change message. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("field_path", StringType, nullable = true),
    StructField("payload", StringType, nullable = true),
    StructField("amount", DoubleType, nullable = true)))

  private val withCorrupt: StructType =
    schema.add(StructField("_corrupt", StringType, nullable = true))

  /** Batch read: well-formed records only, malformed lines counted
    * by the caller via [[quarantine]].
    */
  def fromJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .filter(col("_corrupt").isNull)
      .select(schema.fieldNames.map(col): _*)
      .na.fill(Map("field_path" -> "", "payload" -> "", "amount" -> 0.0))

  /** The lines that failed to parse — route to a dead-letter sink.
    * `doc_id` rides along (null unless that field parsed): Spark
    * refuses scans that reference ONLY the corrupt-record column.
    */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .filter(col("_corrupt").isNotNull)
      .select(col("doc_id"), col("_corrupt").as("raw_line"))

  /** Streaming read of the same layout (file source stands in for the
    * topic — new files are new micro-batches).
    */
  def streamJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .filter(col("_corrupt").isNull)
      .select(schema.fieldNames.map(col): _*)
      .na.fill(Map("field_path" -> "", "payload" -> "", "amount" -> 0.0))

  /** Serialize a changelog frame back to wire-format JSON lines
    * (the inverse, for emitting to downstream topics).
    */
  def toJsonLines(changelog: DataFrame): DataFrame =
    changelog.select(to_json(struct(schema.fieldNames.map(col): _*)).as("value"))
}
