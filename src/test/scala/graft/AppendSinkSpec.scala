package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.cdc.Changelog
import graft.streaming.{AppendSink, CdcStreams}

class AppendSinkSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-appendsink-$tag").toString

  private def ev(i: Long, user: Long, typ: String): EventRow =
    EventRow(i, new Timestamp(1700000000000L + i * 1000), user, typ, i.toDouble, "{}")

  test("replayed batch id is a no-op: one copy, first content wins") {
    import spark.implicits._
    val dir = tmp("replay")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(AppendSink.commitBatch(df, 7L, dir))
    // a replay recomputes the same content; an adversarial different
    // frame stands in to prove the FIRST publish is what readers keep
    assert(!AppendSink.commitBatch(Seq((9L, "z")).toDF("id", "v"), 7L, dir))
    assert(AppendSink.batches(spark, dir) == Seq(7L))
    val rows = AppendSink.read(spark, dir).get.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a"), (2L, "b")))
  }

  test("read is None before the first commit, unions batches after") {
    import spark.implicits._
    val dir = tmp("union")
    assert(AppendSink.read(spark, dir).isEmpty)
    AppendSink.commitBatch(Seq(1L).toDF("id"), 0L, dir)
    AppendSink.commitBatch(Seq(2L, 3L).toDF("id"), 1L, dir)
    assert(AppendSink.batches(spark, dir) == Seq(0L, 1L))
    assert(AppendSink.read(spark, dir).get.collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L, 3L))
  }

  test("manifest-maintained topic is range-prunable after every batch") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val dir = tmp("man-out")
    val manDir = tmp("man-man")
    val ckpt = tmp("man-ckpt")
    val input = MemoryStream[EventRow]
    val q = AppendSink.attachWithManifest(
      CdcStreams.ftsRoute(CdcStreams.changelog(input.toDF())(spark).toDF()),
      dir, manDir, ckpt, Seq("seq"))
    try {
      input.addData(Seq(ev(1, 1, "signup"), ev(2, 2, "signup")))
      q.processAllAvailable()
      input.addData(Seq(ev(10, 3, "signup"), ev(11, 4, "signup")))
      q.processAllAvailable()
    } finally q.stop()

    val manifest = graft.ops.Manifest.load(spark, manDir).get
    // the manifest covers every committed file of every batch
    def canon(p: String) = new org.apache.hadoop.fs.Path(p).toString
    val covered = manifest.select("file_path").collect()
      .map(r => canon(r.getString(0))).toSet
    val all = AppendSink.batches(spark, dir)
      .flatMap(b => spark.read.parquet(s"$dir/${AppendSink.BatchPrefix}$b")
        .inputFiles.map(canon)).toSet
    assert(covered == all && all.nonEmpty)
    // a narrow seq range opens only batch 1's files, same rows
    val pruned = graft.ops.Manifest.readPruned(spark, dir, manifest,
      "seq", 1L, 2L)
    assert(pruned.collect().map(_.getAs[Long]("seq")).sorted.toSeq ==
      Seq(1L, 2L))
    assert(pruned.inputFiles.map(canon).toSet.subsetOf(all))
    assert(pruned.inputFiles.length < all.size ||
      AppendSink.batches(spark, dir).size == 1)
  }

  test("kill + restart from checkpoint publishes each routed row exactly once") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val dir = tmp("restart-out")
    val ckpt = tmp("restart-ckpt")
    val b1 = Seq(ev(1, 1, "signup"), ev(2, 1, "click"), ev(3, 2, "signup"))
    val b2 = Seq(ev(4, 2, "error"), ev(5, 1, "view"), ev(6, 3, "signup"))
    val input = MemoryStream[EventRow]
    def start() = AppendSink.attach(
      CdcStreams.ftsRoute(CdcStreams.changelog(input.toDF())(spark).toDF()),
      dir, ckpt)
    val q1 = start()
    try { input.addData(b1); q1.processAllAvailable() } finally q1.stop()
    // events arrive while the sink is down; a new query resumes from
    // the same checkpoint and must not re-publish batch 0
    input.addData(b2)
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val streamed = AppendSink.read(spark, dir).get.collect()
      .map(r => (r.getAs[String]("_id"), r.getAs[Long]("seq")))
    val batch = Changelog.ftsRoute(Changelog.fromEvents((b1 ++ b2).toDF()))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(streamed.length == batch.length && streamed.toSet == batch.toSet)
    assert(streamed.map(_._2).distinct.length == streamed.length)
    assert(AppendSink.batches(spark, dir).size >= 2)
  }

  test("sharded sink places every row in its md5 shard; replay is a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmp("sharded")
    val docs = Tables.documents(spark, sf).limit(100)
    assert(AppendSink.commitShardedBatch(docs, 0L, dir, "doc_id", 4))
    // adversarial replay: different content under the same batch id
    // must not land
    assert(!AppendSink.commitShardedBatch(docs.limit(1), 0L, dir, "doc_id", 4))
    val second = Tables.documents(spark, sf)
      .orderBy(col("doc_id").desc).limit(50)
    assert(AppendSink.commitShardedBatch(second, 1L, dir, "doc_id", 4))
    // union across batches, no duplicates from the replay
    val all = AppendSink.read(spark, dir).get
    assert(all.count() == docs.count() + second.count())
    // every row of shard 2 across batches hashes to shard 2, and the
    // reader returns exactly the assigned subset
    val expected = docs.unionByName(second)
      .filter(graft.ops.Sampling.shardId(col("doc_id"), 4) === 2)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val got = AppendSink.readShard(spark, dir, 2).get
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(expected))
    // a shard with nothing landed reads as None
    assert(AppendSink.readShard(spark, dir, 9).isEmpty)
  }

  test("sharded sink streams micro-batches into training-ready shards") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlc = spark.sqlContext
    val dir = tmp("sharded-stream")
    val ckpt = tmp("sharded-ckpt")
    val input = MemoryStream[EventRow]
    val q = AppendSink.attachSharded(input.toDF(), dir, ckpt,
      key = "event_id", nShards = 4)
    input.addData((1L to 40L).map(i => ev(i, i % 5, "click")): _*)
    q.processAllAvailable()
    input.addData((41L to 60L).map(i => ev(i, i % 5, "view")): _*)
    q.processAllAvailable()
    q.stop()
    val all = AppendSink.read(spark, dir).get
    assert(all.count() == 60L)
    val misplaced = all.filter(col("shard") =!=
      graft.ops.Sampling.shardId(col("event_id"), 4)).count()
    assert(misplaced == 0L)
    val perShard = (0 until 4).flatMap(s =>
      AppendSink.readShard(spark, dir, s).toSeq.flatMap(
        _.select("event_id").collect().map(_.getLong(0))))
    assert(perShard.sorted == (1L to 60L))
  }
}
