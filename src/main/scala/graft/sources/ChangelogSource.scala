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

  // --- Kafka-shaped ingestion -------------------------------------------
  //
  // The reference consumes change messages from a live topic via a
  // broker consumer loop (FtsAndGeoServiceJSONWithCDC.java:60-90:
  // poll → parse JSON → route). The streaming twin of that surface is
  // Spark's Kafka source: `readStream.format("kafka")` emits a fixed
  // column layout (key/value as binary + topic coordinates), and
  // everything after the scan is a plain DataFrame transform. The
  // transform is the contract — it works identically on the real
  // source, on MemoryStream test rows, or on a batch frame — so the
  // parse + quarantine path is fully testable without a broker.

  /** Column layout produced by Spark's Kafka source. Any frame with
    * these columns (batch or streaming) can feed [[fromKafka]].
    */
  val kafkaWireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("timestampType", IntegerType, nullable = true)))

  private def parseKafka(frame: DataFrame): DataFrame =
    frame
      .withColumn("_raw", col("value").cast(StringType))
      .withColumn("_rec", from_json(col("_raw"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")))
      .select(Seq("topic", "partition", "offset", "_raw").map(col) ++
        withCorrupt.fieldNames.map(f => col("_rec." + f)): _*)

  /** Well-formed change records parsed out of a Kafka-shaped frame —
    * same acceptance contract as [[fromJsonLines]] (parseable AND all
    * required key fields present), same output columns, so the
    * routing operators downstream are transport-agnostic.
    */
  def fromKafka(frame: DataFrame): DataFrame =
    accepted(parseKafka(frame).drop("topic", "partition", "offset", "_raw"))

  /** Dead-letter view of a Kafka-shaped frame: every message
    * [[fromKafka]] did not accept, with its topic coordinates kept so
    * the quarantined offset can be audited or replayed. A null
    * payload (tombstone on a data topic) quarantines as an empty
    * line rather than vanishing — CDC accounting covers every offset.
    */
  def kafkaQuarantine(frame: DataFrame): DataFrame =
    parseKafka(frame)
      .filter(!wellFormed)
      .select(col("topic"), col("partition"), col("offset"),
        coalesce(col("_raw"), lit("")).as("raw_line"))

  /** Live-broker entry point: the reference's consumer loop as one
    * expression. Requires the spark-sql-kafka connector on the
    * deploy classpath (not bundled in this sandbox — the transform
    * underneath is [[fromKafka]], spec-verified via MemoryStream).
    */
  def kafkaStream(spark: SparkSession, bootstrapServers: String,
      topics: String, startingOffsets: String = "earliest"): DataFrame =
    fromKafka(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .load())
}
