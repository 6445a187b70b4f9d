package graft

import java.nio.file.{Files, Paths}

import graft.cdc.Changelog
import graft.sources.ChangelogSource

class SourcesSpec extends SparkSpec {

  test("JSON-lines changelog round-trips through the wire format") {
    val cl = Changelog.fromEvents(Tables.events(spark, sf))
    val dir = Files.createTempDirectory("graft-jsonl").toString
    ChangelogSource.toJsonLines(cl).write.mode("overwrite").text(dir)
    val back = ChangelogSource.fromJsonLines(spark, dir)
    val a = cl.collect().map(_.toSeq).toSet
    val b = back.select(cl.columns.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("malformed and incomplete lines are quarantined, not silently dropped") {
    val dir = Files.createTempDirectory("graft-badjson")
    val good = """{"doc_id":"user1","seq":1,"ts_us":1000,"op":"RECORD_INSERT","field_path":"","payload":"{}","amount":1.5}"""
    val bad = """{"doc_id":"user2","seq":NOT_JSON"""
    // parses fine but lacks required key fields (doc_id/seq/ts_us)
    val incomplete = """{"op":"RECORD_INSERT","payload":"{}"}"""
    Files.write(Paths.get(dir.toString, "part-0.json"),
      s"$good\n$bad\n$incomplete\n".getBytes("UTF-8"))
    val ok = ChangelogSource.fromJsonLines(spark, dir.toString).collect()
    assert(ok.length == 1 && ok(0).getAs[String]("doc_id") == "user1")
    val quarantined = ChangelogSource.quarantine(spark, dir.toString)
      .collect().map(_.getAs[String]("raw_line"))
    assert(quarantined.length == 2)
    assert(quarantined.exists(_.contains("NOT_JSON")))
    assert(quarantined.exists(l => l.contains("RECORD_INSERT") && !l.contains("doc_id")))
  }

  test("streaming read of the same layout feeds the routing operators") {
    implicit val s = spark
    val cl = Changelog.fromEvents(Tables.events(spark, sf)).limit(200)
    val dir = Files.createTempDirectory("graft-jsonl-stream").toString
    ChangelogSource.toJsonLines(cl).write.mode("overwrite").text(dir)
    val stream = ChangelogSource.streamJsonLines(spark, dir)
    val routed = Changelog.ftsRoute(stream)
    val q = routed.writeStream.format("memory").queryName("srcfts").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("srcfts").count()
    val batch = Changelog.ftsRoute(cl).count()
    assert(streamed == batch && streamed > 0)
  }
}
