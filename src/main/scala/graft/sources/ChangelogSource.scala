package graft.sources

import org.apache.spark.sql.{Column, DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-on-read ingestion of JSON-line changelogs — the engine's
  * stand-in for the reference's JSON topic consumption
  * (FtsAndGeoServiceJSONWithCDC.java polls JSON change messages from
  * a stream; here the transport is files, the parsing contract is
  * the same). The schema is EXPLICIT: at 100 TB, schema inference is
  * a full extra pass over the data and non-deterministic under
  * drift, so it is never used. Malformed lines are quarantined, not
  * dropped, because a CDC pipeline must account for every message —
  * and "malformed" includes structurally-valid JSON that is missing
  * a required key field (file sources relax nullability, so the
  * schema alone cannot enforce it).
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

  /** Fields a record cannot be processed without. */
  private val RequiredFields = Seq("doc_id", "seq", "ts_us", "op")

  private val withCorrupt: StructType =
    schema.add(StructField("_corrupt", StringType, nullable = true))

  private def configure(r: DataFrameReader): DataFrameReader =
    r.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")

  private def wellFormed: Column =
    col("_corrupt").isNull &&
      RequiredFields.map(col(_).isNotNull).reduce(_ && _)

  private def accepted(parsed: DataFrame): DataFrame =
    parsed.filter(wellFormed)
      .select(schema.fieldNames.map(col): _*)
      .na.fill(Map("field_path" -> "", "payload" -> "", "amount" -> 0.0))

  /** Batch read: well-formed records only (parseable AND carrying
    * every required field); everything else lands in [[quarantine]].
    */
  def fromJsonLines(spark: SparkSession, path: String): DataFrame =
    accepted(configure(spark.read).json(path))

  /** Every line [[fromJsonLines]] did not accept — route to a
    * dead-letter sink. Unparseable lines come back verbatim;
    * parseable-but-incomplete records are re-serialized from their
    * parsed fields.
    */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    configure(spark.read).json(path)
      .filter(!wellFormed)
      .select(coalesce(col("_corrupt"),
        to_json(struct(schema.fieldNames.map(col): _*))).as("raw_line"))

  /** Streaming read of the same layout (file source stands in for the
    * topic — new files are new micro-batches).
    */
  def streamJsonLines(spark: SparkSession, path: String): DataFrame =
    accepted(spark.readStream
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path))

  /** Serialize a changelog frame back to wire-format JSON lines
    * (the inverse, for emitting to downstream topics).
    */
  def toJsonLines(changelog: DataFrame): DataFrame =
    changelog.select(to_json(struct(schema.fieldNames.map(col): _*)).as("value"))
}
