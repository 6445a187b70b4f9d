package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.cdc.Changelog
import graft.ops.Layout
import graft.streaming.{CdcStreams, StateTable}

class StateTableSpec extends SparkSpec {

  private def ev(id: Long, user: Long, typ: String, minute: Int): EventRow =
    EventRow(id, java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"),
      user, typ, id * 1.5, s"""{"k": $id}""")

  test("compaction sink converges to the batch LWW state across versions") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val dir = Files.createTempDirectory("graft-state").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val batch1 = Seq(ev(0, 1, "signup", 0), ev(1, 1, "click", 1),
      ev(2, 2, "signup", 2), ev(4, 3, "signup", 4))
    val batch2 = Seq(ev(3, 2, "purchase", 3), ev(7, 2, "error", 7),
      ev(5, 3, "click", 5))

    val input = MemoryStream[EventRow]
    val q = StateTable.compactionSink(
      CdcStreams.changelog(input.toDF()), dir, ckpt)
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    // two snapshot versions exist; the latest equals batch semantics
    assert(StateTable.latestVersion(spark, dir).exists(_ >= 1L))
    val live = StateTable.readLive(spark, dir).collect()
      .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("last_seq"),
        r.getAs[Long]("n_changes"))).toSet
    val batch = Changelog.latestState(
      Changelog.fromEvents((batch1 ++ batch2).toDF())).collect()
      .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("last_seq"),
        r.getAs[Long]("n_changes"))).toSet
    assert(live == batch)
    // deleted doc is present as a tombstone in the full table
    assert(StateTable.read(spark, dir).collect()
      .exists(r => r.getAs[String]("doc_id") == "user2" &&
        r.getAs[String]("last_op") == Changelog.Delete))

    // anti-entropy: the streamed table's digest equals the batch
    // replay's digest — the |op-classes|-row comparison that verifies
    // convergence with zero row shipping
    def dig(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("last_op"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("digest"))).toSet
    val streamDigest = dig(StateTable.digest(spark, dir))
    val batchDigest = dig(Changelog.stateDigest(
      Changelog.fromEvents((batch1 ++ batch2).toDF())))
    assert(streamDigest === batchDigest && streamDigest.nonEmpty)
  }

  test("geo save-back round trip: the enriched stream's materialized " +
    "state digests equal to the batch replay, coordinates included") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val dir = Files.createTempDirectory("graft-geo-state").toString
    val ckpt = Files.createTempDirectory("graft-geo-ckpt").toString
    // purchases carry addresses; user2's delete arrives AFTER its
    // address so the tombstone must beat the interleaved geocode
    val batch1 = Seq(ev(0, 1, "signup", 0), ev(1, 1, "purchase", 1),
      ev(2, 2, "signup", 2), ev(3, 2, "purchase", 3))
    val batch2 = Seq(ev(5, 1, "purchase", 5), ev(7, 2, "error", 7))

    val input = MemoryStream[EventRow]
    // the SAME stateless projection that the batch operator uses,
    // applied to the live changelog stream, feeding the LWW sink
    val enriched = Changelog
      .geoSavebackLog(CdcStreams.changelog(input.toDF()).toDF())
      .as[graft.streaming.ChangeRecord]
    val q = StateTable.compactionSink(enriched, dir, ckpt)
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    def dig(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("last_op"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("digest"))).toSet
    val streamDigest = dig(StateTable.digest(spark, dir))
    val batchDigest = dig(Changelog.stateDigest(Changelog.geoSavebackLog(
      Changelog.fromEvents((batch1 ++ batch2).toDF()))))
    assert(streamDigest === batchDigest && streamDigest.nonEmpty)
    // the round trip actually lands in the documents: user1's
    // rebuilt doc carries the coordinates of its LATEST address
    val doc = Changelog.geoSaveback(
        Changelog.fromEvents((batch1 ++ batch2).toDF()))
      .filter(col("doc_id") === "user1").head()
    val json = doc.getAs[String]("doc_json")
    assert(json.contains("\"latitude\"") && json.contains("\"longitude\""),
      json)
    // user2 was deleted after its address: no enriched doc survives
    assert(Changelog.geoSaveback(
        Changelog.fromEvents((batch1 ++ batch2).toDF()))
      .filter(col("doc_id") === "user2").isEmpty)
  }

  test("geo save-back: a seq past the triple bound fails loudly " +
    "instead of silently wrapping away from the HUGEINT oracle") {
    import spark.implicits._
    val bad = Seq(("user1", Long.MaxValue / 3, 0L, "RECORD_INSERT", "",
      "addr", 1.0))
      .toDF("doc_id", "seq", "ts_us", "op", "field_path", "payload",
        "amount")
    val e = intercept[Exception](
      Changelog.geoSavebackLog(bad).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("triplable")), e.toString)
  }

  test("stateful compaction survives kill + restart from checkpoint") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val dir = Files.createTempDirectory("graft-state-restart").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-restart").toString
    val batch1 = Seq(ev(0, 1, "signup", 0), ev(1, 1, "click", 1),
      ev(2, 2, "signup", 2), ev(4, 3, "signup", 4))
    val batch2 = Seq(ev(3, 2, "purchase", 3), ev(7, 2, "error", 7),
      ev(5, 3, "click", 5))
    val input = MemoryStream[EventRow]
    def start() = StateTable.compactionSink(
      CdcStreams.changelog(input.toDF()), dir, ckpt)
    val q1 = start()
    try { input.addData(batch1); q1.processAllAvailable() } finally q1.stop()
    // restart: the flatMapGroupsWithState store must be restored from
    // the checkpoint, so the delta folds onto batch1's state
    input.addData(batch2)
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val live = StateTable.readLive(spark, dir).collect()
      .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("last_seq"),
        r.getAs[Long]("n_changes"))).toSet
    val batch = Changelog.latestState(
      Changelog.fromEvents((batch1 ++ batch2).toDF())).collect()
      .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("last_seq"),
        r.getAs[Long]("n_changes"))).toSet
    assert(live == batch)
  }

  test("replayed micro-batch commit is idempotent (no double counting)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-replay").toString
    val b0 = Changelog.fromEvents(Seq(ev(0, 1, "signup", 0), ev(1, 1, "click", 1)).toDF())
    val b1 = Changelog.fromEvents(Seq(ev(2, 1, "view", 2)).toDF())
    StateTable.commitBatch(b0, 0L, dir)
    StateTable.commitBatch(b1, 1L, dir)
    val once = StateTable.read(spark, dir).collect()
      .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("last_seq"),
        r.getAs[Long]("n_changes"))).toSet
    // failure after v=1 was written but before the checkpoint commit:
    // the sink replays batch 1 — the state must not change
    StateTable.commitBatch(b1, 1L, dir)
    val twice = StateTable.read(spark, dir).collect()
      .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("last_seq"),
        r.getAs[Long]("n_changes"))).toSet
    assert(once == twice)
    assert(once == Set(("user1", 2L, 3L)))
    // no staging directories survive a publish
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".staging")))
  }

  test("time travel: a past version reads exactly its own snapshot") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-travel").toString
    val b0 = Changelog.fromEvents(Seq(ev(0, 1, "signup", 0), ev(1, 1, "click", 1)).toDF())
    val b1 = Changelog.fromEvents(Seq(ev(2, 1, "view", 2), ev(3, 2, "signup", 3)).toDF())
    StateTable.commitBatch(b0, 0L, dir)
    StateTable.commitBatch(b1, 1L, dir)
    // v=0 still shows the pre-merge world: one doc, two changes
    val past = StateTable.readAt(spark, dir, 0L).get.collect()
      .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("last_seq"),
        r.getAs[Long]("n_changes"))).toSet
    assert(past == Set(("user1", 1L, 2L)), s"got $past")
    // the latest equals read(); a never-committed version is None
    assert(StateTable.readAt(spark, dir, 1L).get.collect().length ==
      StateTable.read(spark, dir).collect().length)
    assert(StateTable.readAt(spark, dir, 5L).isEmpty)
    // vacuum drops v=0 -> time travel honestly reports it gone
    StateTable.vacuum(spark, dir, keep = 1)
    assert(StateTable.readAt(spark, dir, 0L).isEmpty)
  }

  test("z-order optimize preserves content; vacuum reclaims history") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-zopt").toString
    val b0 = Changelog.fromEvents(
      (0 to 40).map(i => ev(i, i % 7, if (i < 7) "signup" else "view", i % 50)).toDF())
    val b1 = Changelog.fromEvents(Seq(ev(60, 1, "purchase", 55)).toDF())
    StateTable.commitBatch(b0, 0L, dir)
    StateTable.commitBatch(b1, 1L, dir)
    def snap() = StateTable.read(spark, dir).collect()
      .map(_.mkString("|")).toSet
    val before = snap()
    assert(StateTable.optimize(spark, dir, "last_seq", "n_changes", 2).contains(1L))
    assert(new java.io.File(dir, "z=1").isDirectory)
    assert(snap() == before) // the rewrite is content-identical
    // a later batch supersedes the rewrite: readers follow v=2
    val b2 = Changelog.fromEvents(Seq(ev(70, 2, "view", 58)).toDF())
    StateTable.commitBatch(b2, 2L, dir)
    assert(StateTable.read(spark, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") === "user2")
      .head().getAs[Long]("last_seq") == 70L)
    StateTable.vacuum(spark, dir, keep = 1)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(names.contains("v=2") && !names.contains("v=0") &&
      !names.contains("v=1") && !names.contains("z=1"))
    assert(snap().nonEmpty) // still readable after vacuum
  }

  test("vacuum reclaims aged orphan staging dirs, spares live ones") {
    val dir = s"/tmp/graft-test-staging-${System.nanoTime()}"
    // a crashed attempt's leftover (old mtime) and a live attempt's
    // staging (fresh mtime) — only the orphan goes
    val orphan = new java.io.File(dir, ".staging-v=9-dead")
    val live = new java.io.File(dir, ".staging-v=9-live")
    orphan.mkdirs(); live.mkdirs()
    orphan.setLastModified(System.currentTimeMillis() - 48L * 3600 * 1000)
    graft.ops.VersionedStore.vacuumStaging(spark, dir)
    assert(!orphan.exists() && live.exists())
  }

  test("fingerprint version: order-independent, data-sensitive, " +
    "code-spec-sensitive, non-negative (ADVICE r15)") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "t")
    val shuffled = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("id", "t")
      .repartition(3)
    val changed = Seq((1L, "x"), (2L, "y"), (3L, "Z")).toDF("id", "t")
    val grown = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w"))
      .toDF("id", "t")
    val va = graft.ops.VersionedStore.fingerprintVersion(a, "spec1")
    // same content in any partitioning/order → same version
    assert(graft.ops.VersionedStore.fingerprintVersion(shuffled, "spec1") == va)
    // one changed value, one added row, or a bumped code spec → new version
    assert(graft.ops.VersionedStore.fingerprintVersion(changed, "spec1") != va)
    assert(graft.ops.VersionedStore.fingerprintVersion(grown, "spec1") != va)
    assert(graft.ops.VersionedStore.fingerprintVersion(a, "spec2") != va)
    // version dirs are `v=<digits>` — the number must be non-negative,
    // including on an empty dataset
    assert(va >= 0L)
    assert(graft.ops.VersionedStore.fingerprintVersion(
      a.filter(col("id") < 0), "spec1") >= 0L)
  }

  test("app-keyed cache eviction sweeps other applications' entries " +
    "and keeps the current app's (ADVICE r15)") {
    val m = new java.util.concurrent.ConcurrentHashMap[String, String]()
    m.put("app-old:dir1", "stale")
    m.put("app-old:dir2", "stale")
    m.put("app-new:dir1", "live")
    SparkEntry.evictOtherApps(m, "app-new")
    assert(m.size() == 1 && m.containsKey("app-new:dir1"))
    // prefix discipline: an app id that merely PREFIXES another must
    // not keep the longer app's keys alive
    m.put("app-newer:dir1", "stale")
    SparkEntry.evictOtherApps(m, "app-new")
    assert(m.size() == 1 && m.containsKey("app-new:dir1"))
  }

  test("day-partitioned writes prune partitions under a date filter") {
    val dir = Files.createTempDirectory("graft-part").toString
    Layout.writePartitionedByDay(Tables.events(spark, sf), "ts", dir)
    val read = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("day") === "2024-01-03")
    val planStr = read.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"))
    assert(read.count() > 0)
    // pruned scan reads a single day directory
    val scanned = read.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    read.collect()
    scanned.foreach(m => assert(m.value >= 1))
  }
}
