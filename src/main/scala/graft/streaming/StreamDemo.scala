package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode

import graft.{GraftSession, Tables}

/** End-to-end streaming pipeline over the JSON wire format — the
  * runnable equivalent of the reference's consumer process: a
  * directory of JSON-line change messages is tailed as a stream
  * (via [[graft.sources.ChangelogSource]], the stand-in for the
  * topic), routed to FTS/geo "topics" (parquet sinks here;
  * Kafka-compatible sinks are a one-line swap), and materialized
  * into per-document state.
  *
  * Usage: runMain graft.streaming.StreamDemo <sfDir> <outDir>
  * (Seeds the input dir as wire-format JSON from <sfDir>/events
  * .parquet, runs each stream to completion on the available data,
  * prints row counts.)
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    implicit val spark: SparkSession = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val inDir = s"$outDir/in"
    graft.sources.ChangelogSource.toJsonLines(
      graft.cdc.Changelog.fromEvents(Tables.events(spark, sfDir)))
      .write.mode("overwrite").text(inDir)

    val cl = graft.sources.ChangelogSource.streamJsonLines(spark, inDir)
      .as[ChangeRecord]

    val fts = CdcStreams.ftsRoute(cl.toDF()).writeStream
      .format("parquet").option("path", s"$outDir/fts_service")
      .option("checkpointLocation", s"$outDir/ckpt_fts")
      .outputMode(OutputMode.Append).start()
    val geo = CdcStreams.geoRoute(cl.toDF()).writeStream
      .format("parquet").option("path", s"$outDir/geo_service")
      .option("checkpointLocation", s"$outDir/ckpt_geo")
      .outputMode(OutputMode.Append).start()
    val state = CdcStreams.latestState(cl).writeStream
      .format("memory").queryName("doc_state")
      .outputMode(OutputMode.Update).start()

    Seq(fts, geo, state).foreach(_.processAllAvailable())
    Seq(fts, geo, state).foreach(_.stop())

    val nFts = spark.read.parquet(s"$outDir/fts_service").count()
    val nGeo = spark.read.parquet(s"$outDir/geo_service").count()
    val nState = spark.table("doc_state").select("doc_id").distinct().count()
    println(s"""{"fts_messages":$nFts,"geo_messages":$nGeo,"docs_materialized":$nState}""")
    spark.stop()
  }
}
