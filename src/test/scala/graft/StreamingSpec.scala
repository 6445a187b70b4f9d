package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.cdc.Changelog
import graft.streaming.{CdcStreams, ChangeRecord, DocState, EmbeddingStreams}

case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
                    event_type: String, value: Double, props: String)

class StreamingSpec extends SparkSpec {

  private def ev(id: Long, user: Long, typ: String, minute: Int): EventRow =
    EventRow(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), user, typ,
      id * 1.5, s"""{"k": $id}""")

  // two micro-batches; user2 gets deleted in batch 2, user3 arrives late
  private val batch1 = Seq(
    ev(0, 1, "signup", 0), ev(1, 1, "click", 1), ev(2, 2, "signup", 2),
    ev(4, 3, "signup", 4), ev(6, 3, "view", 6))
  private val batch2 = Seq(
    ev(3, 2, "purchase", 3), ev(7, 2, "error", 7),
    ev(5, 3, "click", 5)) // seq 5 < already-seen seq 6: late arrival

  private def allEvents = batch1 ++ batch2

  test("streaming latest-state converges to the batch operator") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[EventRow]
    val states = CdcStreams.latestState(
      CdcStreams.changelog(input.toDF()))
    val q = states.writeStream.format("memory").queryName("lws")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    // final streaming state: last emission per doc, minus tombstones
    val emitted = spark.table("lws").as[DocState].collect()
    val finalState = emitted.groupBy(_.doc_id).map(_._2.maxBy(_.n_changes))
      .filter(_.last_op != Changelog.Delete)
      .map(s => (s.doc_id, s.last_seq, s.last_op, s.last_field, s.n_changes))
      .toSet

    val batch = Changelog.latestState(
      Changelog.fromEvents(allEvents.toDF())).collect()
      .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("last_seq"),
        r.getAs[String]("last_op"), r.getAs[String]("last_field"),
        r.getAs[Long]("n_changes"))).toSet

    assert(finalState == batch)
    // user2 ended deleted: present in emissions as tombstone, absent from state
    assert(emitted.exists(s => s.doc_id == "user2" && s.last_op == Changelog.Delete))
    assert(!finalState.exists(_._1 == "user2"))
    // late event for user3 did not regress last_seq
    assert(finalState.exists(t => t._1 == "user3" && t._2 == 6L))
  }

  test("stateless routes produce identical rows streaming and batch") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[EventRow]
    val fts = CdcStreams.ftsRoute(CdcStreams.changelog(input.toDF()).toDF())
    val q = fts.writeStream.format("memory").queryName("fts")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batch1); input.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("fts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val batch = Changelog.ftsRoute(Changelog.fromEvents(allEvents.toDF()))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("live dlq route classifies malformed payloads without killing the query") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[EventRow]
    val routed = CdcStreams.dlqRoute(
      CdcStreams.changelog(input.toDF()).toDF())
    val q = routed.writeStream.format("memory").queryName("dlq")
      .outputMode(OutputMode.Append).start()
    val poison = Seq(
      ev(100, 9, "view", 10).copy(props = """{"k": 100"""),   // truncated
      ev(101, 9, "view", 11).copy(props = """{"v": 1}"""),    // key drift
      ev(102, 9, "view", 12).copy(props = """{"k": "x"}"""))  // bad type
    try {
      input.addData(batch1)
      input.addData(poison) // one bad batch must not stall the stream
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dlq").collect()
      .map(r => r.getAs[Long]("seq") -> r.getAs[String]("reason")).toMap
    // every record of every batch flowed through, reasons attached
    assert(got.size === (batch1 ++ poison ++ batch2).size)
    assert(got(100L) === "not_json" && got(101L) === "missing_key" &&
      got(102L) === "bad_type")
    assert(batch1.forall(e => got(e.event_id) === "ok"))
    // batch/stream parity by construction: same classification rows
    val batchSide = Changelog.dlqRoute(
      Changelog.fromEvents((allEvents ++ poison).toDF()))
      .collect().map(r => r.getAs[Long]("seq") -> r.getAs[String]("reason")).toMap
    assert(got === batchSide)
  }

  test("streaming funnel state converges to the batch funnel") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    // user1: full chain split across batches; user2: click BEFORE
    // signup (must never qualify); user3: purchase without click
    val b1 = Seq(ev(0, 1, "signup", 0), ev(1, 2, "click", 1),
      ev(2, 2, "signup", 2), ev(6, 3, "signup", 6))
    val b2 = Seq(ev(3, 1, "click", 3), ev(5, 1, "purchase", 5),
      ev(7, 3, "purchase", 7))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    val q = graft.streaming.EventStreams.funnelState(input.toDF())
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    def score(p: graft.streaming.FunnelProgress): Int =
      (if (p.purchased) 4 else 0) + (if (p.c_ts != Long.MaxValue) 2 else 0) +
        (if (p.s_ts != Long.MaxValue) 1 else 0)
    val fin = spark.table("funnel").as[graft.streaming.FunnelProgress]
      .collect().groupBy(_.user_id).map(_._2.maxBy(score))
    val nSignup = fin.count(_.s_ts != Long.MaxValue)
    val nClick = fin.count(_.c_ts != Long.MaxValue)
    val nPurchase = fin.count(_.purchased)

    val batch = graft.ops.Events.funnel((b1 ++ b2).toDF()).orderBy("stage_idx")
      .collect().map(_.getAs[Long]("n_users"))
    assert(Seq(nSignup.toLong, nClick.toLong, nPurchase.toLong) == batch.toSeq)
    assert(nSignup == 3 && nClick == 1 && nPurchase == 1)
  }

  test("streaming retention cells aggregate to the batch matrix") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val base = 1704067200L // 2024-01-01 (Monday) 00:00 UTC
    def evAt(id: Long, user: Long, typ: String, day: Int): EventRow =
      EventRow(id, new Timestamp((base + day * 86400L) * 1000L), user, typ,
        0.0, "{}")
    // user1: signup wk0, active wk1; user2: pre-signup activity
    // (negative offset must appear once the cohort is known);
    // user3: never signs up (must not appear)
    val b1 = Seq(evAt(0, 1, "signup", 0), evAt(1, 2, "view", 0),
      evAt(2, 3, "view", 1))
    val b2 = Seq(evAt(3, 1, "click", 8), evAt(4, 2, "signup", 7))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    val q = graft.streaming.EventStreams.retentionState(input.toDF())
      .writeStream.format("memory").queryName("retention")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // last emission per (user, absolute week) is the settled cell
    val cells = spark.table("retention")
      .as[graft.streaming.RetentionHit].collect().zipWithIndex
      .groupBy(h => (h._1.user_id, h._1.week_day))
      .map(_._2.maxBy(_._2)._1)
    val streamed = cells.groupBy(h => (h.cohort_week.toString, h.week_offset))
      .map { case (k, v) => (k._1, k._2, v.map(_.user_id).toSet.size.toLong) }
      .toSet
    val batch = graft.ops.Events.retention((b1 ++ b2).toDF())
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.exists(_._2 == -1L)) // user2's pre-signup week
  }

  test("kill + restart from checkpoint emits each routed row exactly once") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-restart-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-ckpt").toString
    val input = MemoryStream[EventRow]
    def start() = CdcStreams.ftsRoute(CdcStreams.changelog(input.toDF()).toDF())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    val q1 = start()
    try { input.addData(batch1); q1.processAllAvailable() } finally q1.stop()
    // events arrive while the query is down; a NEW query resumes from
    // the same checkpoint (the kill-and-restart path)
    input.addData(batch2)
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("_id"), r.getAs[Long]("seq"),
        r.getAs[String]("operation")))
    val batch = Changelog.ftsRoute(Changelog.fromEvents(allEvents.toDF()))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // exactly-once: multiset equality — no row lost, none duplicated
    assert(streamed.length == batch.length,
      s"${streamed.length} rows streamed vs ${batch.length} batch")
    assert(streamed.toSet == batch.toSet && streamed.nonEmpty)
    assert(streamed.map(_._2).distinct.length == streamed.length)
  }

  test("debounce state survives kill + restart: the burst carry holds") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-deb-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-deb-out").toString
    def row(id: Long, sec: Long) =
      EventRow(id, new Timestamp(1700000000000L + sec * 1000L), 1L, "click",
        1.0, "{}")
    val input = MemoryStream[EventRow]
    def start() =
      graft.streaming.EventStreams.debounceState(input.toDF())
        .toDF().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("b", lit(id)).write.mode("append").parquet(out): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).start()
    val q1 = start()
    try { input.addData(Seq(row(1, 0), row(2, 3))); q1.processAllAvailable() }
    finally q1.stop()
    // while the query is down, the burst continues (6s — still inside
    // the carry from the pre-kill event at 3s) and a fresh burst lands
    input.addData(Seq(row(3, 6), row(4, 100)))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    // a restart that LOST the 3s carry would wrongly re-emit id 3
    val emitted = spark.read.parquet(out).collect()
      .map(_.getAs[Long]("event_id")).toSet
    assert(emitted == Set(1L, 4L), s"got $emitted")
  }

  test("concurrency state survives kill + restart: the session carry holds") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-conc-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-conc-out").toString
    def row(id: Long, sec: Long) =
      EventRow(id, new Timestamp(1700000000000L + sec * 1000L), 1L, "click",
        1.0, "{}")
    def tUs(sec: Long) = (1700000000000L + sec * 1000L) * 1000L
    val input = MemoryStream[EventRow]
    def start() =
      graft.streaming.EventStreams
        .concurrencyState(input.toDF(), watermark = "1800 seconds")
        .toDF().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("b", lit(id)).write.mode("append").parquet(out): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    val q1 = start()
    try { input.addData(Seq(row(1, 0))); q1.processAllAvailable() }
    finally q1.stop()
    // while the query is down the session CONTINUES (600s is inside
    // the 1800s gap from the pre-kill event) and a later event opens
    // a fresh session; a restart that lost the 0s carry would wrongly
    // emit a second +1 at 600s — and the −1 must sit at the carried
    // span's end (600s + 1µs), provable only with recovered state
    input.addData(Seq(row(2, 600), row(3, 10000)))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("us"), r.getAs[Int]("delta"))).toSet
    assert(got == Set((tUs(0), 1), (tUs(600) + 1L, -1), (tUs(10000), 1)),
      s"got $got")
  }

  test("heavy hitters state survives kill + restart from checkpoint") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hh-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-hh-out").toString
    val input = MemoryStream[String]
    // memory sinks cannot recover from a checkpoint; foreachBatch can
    def start() =
      graft.streaming.EventStreams.heavyHittersState(
        input.toDF().select(col("value").as("token")), buckets = 2, capacity = 64)
        .toDF().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("batch_id", org.apache.spark.sql.functions.lit(id))
            .write.mode("append").parquet(out): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).start()
    val q1 = start()
    try { input.addData(Seq("a", "a", "a", "b")); q1.processAllAvailable() }
    finally q1.stop()
    // tokens arrive while the query is down; a NEW query resumes the
    // Misra-Gries counters from the restored state store
    input.addData(Seq("a", "a", "b", "c"))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    // last emission per token = the counter after the final trigger
    val last = spark.read.parquet(out).collect()
      .groupBy(_.getAs[String]("token")).view
      .mapValues(rs => rs.maxBy(_.getAs[Long]("batch_id")).getAs[Long]("cnt"))
      .toMap
    assert(last("a") == 5L, s"state lost: $last") // 3 before kill + 2 after
    assert(last("b") == 2L && last("c") == 1L)
  }

  test("streaming ts-match scores equal the batch operator across batches") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val pattern = Seq(0.0, 0.0, 1.0, 2.0, 4.0, 2.0, 1.0, 0.0)
    def row(i: Int, v: Double) = EventRow(i.toLong,
      Timestamp.valueOf(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d"),
      1L, "sig", v, "{}")
    val values = (0 until 30).map {
      case i if i >= 10 && i <= 17 => 100.0 + 7.0 * pattern(i - 10)
      case i => (i % 7) * 3.0 + (i % 3)
    }
    val rows = values.zipWithIndex.map { case (v, i) => row(i, v) }
    // split mid-planted-pattern: windows 10..17 straddle the batch
    // boundary, so the state's L-1 ring buffer must carry them over
    val (b1, b2) = rows.splitAt(13)
    val input = MemoryStream[EventRow]
    val q = graft.streaming.EventStreams.tsMatchState(input.toDF(), pattern)
      .writeStream.format("memory").queryName("tsm")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(b1); q.processAllAvailable()
      // a late row at-or-before the high-water mark must be dropped,
      // not retro-inserted into already-emitted windows
      input.addData(b2 :+ row(5, 999.0)); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("tsm").as[graft.streaming.TsWindowScore]
      .collect().map(e => (e.event_type, e.event_id, e.dist)).toSet
    // batch reference: every scored window (top-k with k >= #windows)
    val batch = graft.ops.Events.tsMatch(
      rows.toDF().select(col("event_id"), col("ts"), col("event_type"),
        col("value")), pattern, k = 1000)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Double]("dist"))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // the planted window (ending at id 17) scored 0 despite straddling
    assert(streamed.contains(("sig", 17L, 0.0)))
  }

  test("stream-stream attribution join pairs purchases with prior clicks") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[EventRow]
    val joined = CdcStreams.attributionJoin(
      CdcStreams.changelog(input.toDF()), windowSec = 3600)
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append).start()
    try {
      // user5: click at :10, purchases at :20 (in window) and a
      // click from another user that must not match
      input.addData(Seq(
        ev(10, 5, "click", 10), ev(11, 6, "click", 11),
        ev(12, 5, "purchase", 20)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("attr").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("purchase_seq") == 12L)
    assert(rows(0).getAs[Long]("click_seq") == 10L)
  }

  test("stream-static enrichment joins the customer dimension") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val input = MemoryStream[EventRow]
    val enriched = CdcStreams.enrich(
      CdcStreams.changelog(input.toDF()), dim, "c_custkey")
    val q = enriched.writeStream.format("memory").queryName("enr")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(ev(0, 1, "click", 0), ev(1, 2, "view", 1),
        ev(2, 99, "click", 2)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("enr").collect()
      .map(r => (r.getAs[String]("doc_id"), Option(r.getAs[String]("c_mktsegment"))))
      .toSet
    assert(rows == Set(("user1", Some("BUILDING")), ("user2", Some("MACHINERY")),
      ("user99", None))) // unmatched key survives the left join
  }

  test("live totals converge to the batch aggregate") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = CdcStreams.liveTotals(CdcStreams.changelog(input.toDF()))
      .writeStream.format("memory").queryName("ltot")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    // update mode re-emits a doc's row each time it changes: keep last
    val live = spark.table("ltot").collect()
      .map(r => (r.getAs[String]("doc_id"),
        (r.getAs[Long]("n_changes"), r.getAs[Double]("total_amount"))))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).maxBy(_._1)) }
    val batch = graft.cdc.Changelog.fromEvents(allEvents.toDF())
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum("amount"), 2).as("t"))
      .collect()
      .map(r => (r.getAs[String]("doc_id"),
        (r.getAs[Long]("n"), r.getAs[Double]("t")))).toMap
    assert(live.toMap == batch)
  }

  test("watermarked dedup drops duplicate deliveries across batches") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[EventRow]
    val deduped = CdcStreams.dedupStream(CdcStreams.changelog(input.toDF()))
    val q = deduped.writeStream.format("memory").queryName("ddp")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batch1); q.processAllAvailable()
      // redeliver batch1 (at-least-once transport) plus new records
      input.addData(batch1 ++ batch2); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ddp").collect()
      .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("seq")))
    assert(rows.length == rows.distinct.length)
    assert(rows.toSet == allEvents.map(e => (s"user${e.user_id}", e.event_id)).toSet)
  }

  test("session windows close on gap and match per-doc event counts") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[EventRow]
    val sess = CdcStreams.sessionWindows(
      CdcStreams.changelog(input.toDF()), gap = "5 minutes")
    val q = sess.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Complete).start()
    try {
      // user7: bursts at :00-:02 and :30-:31 → two sessions
      input.addData(Seq(ev(20, 7, "click", 0), ev(21, 7, "view", 2),
        ev(22, 7, "click", 30), ev(23, 7, "view", 31)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sess").collect()
      .filter(_.getAs[String]("doc_id") == "user7")
      .map(r => r.getAs[Long]("n_events"))
    assert(rows.sorted.toSeq == Seq(2L, 2L))
  }

  test("windowed op counts with watermark aggregate by event time") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[EventRow]
    val counts = CdcStreams.windowedOpCounts(CdcStreams.changelog(input.toDF()))
    val q = counts.writeStream.format("memory").queryName("opc")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(allEvents); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("opc").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == allEvents.size)
  }

  test("streaming anomaly scoring equals the batch scorer given its model") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val batchDf = allEvents.toDF()
    // the model the batch operator derives (retrained out-of-band at scale)
    val model = batchDf.groupBy("event_type")
      .agg(round(avg("value"), 6).as("mu"),
        round(stddev_samp("value"), 6).as("sigma"))
    val input = MemoryStream[EventRow]
    val scored = graft.streaming.EventStreams.anomalyStream(
      input.toDF(), model, tau = 1.0)
    val q = scored.writeStream.format("memory").queryName("anom")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("anom").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("z"))).toSet
    val batch = graft.ops.Events.anomaly(batchDf, tau = 1.0).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("z"))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming burst gate: finalized minutes equal the batch audit's arithmetic") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    def ev(id: Long, sec: Long, tp: String) =
      EventRow(id, new Timestamp(sec * 1000L), 1L, tp, 0.0, "{}")
    // history the baseline is fitted on: type a = 8 events over 4
    // active minutes (baseline rate 2/min), type b = 1/min heartbeat
    val history = (
      Seq.fill(4)(0L) ++ Seq(60L, 61L, 120L, 180L)).zipWithIndex
        .map { case (s, i) => ev(i.toLong, s, "a") } ++
      Seq(ev(100L, 0L, "b"), ev(101L, 60L, "b"), ev(102L, 120L, "b"))
    val baseline = graft.ops.Events.burst(history.toDF())

    // live traffic: minute 100 holds 6 'a' events (ratio 3e6 vs the
    // 2/min baseline = threshold-exceeded), 1 'b' (ratio 1e6), and
    // 1 'z' — a type the baseline has never seen: the gate must fail
    // CLOSED on it (flagged, null ratio), never drop the row
    val live = (0 until 6).map(i => ev(200L + i, 6000L + i, "a")) ++
      Seq(ev(300L, 6010L, "b"), ev(400L, 6020L, "z"))
    val input = MemoryStream[EventRow]
    val gated = graft.streaming.EventStreams.burstGateStream(
      input.toDF(), baseline, thresholdPpm = 2500000L)
    val q = gated.writeStream.format("memory").queryName("bgate")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(live); q.processAllAvailable()
      // a far-future sentinel advances the watermark past minute
      // 100's end so its window finalizes; the sentinel's own window
      // stays open and must NOT emit
      input.addData(Seq(ev(999L, 100000L, "a"))); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("bgate").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("minute"),
        r.getAs[Long]("c"),
        if (r.isNullAt(r.fieldIndex("ratio_ppm"))) None
        else Some(r.getAs[Long]("ratio_ppm")),
        r.getAs[Boolean]("is_burst"))).toSet
    assert(rows === Set(
      ("a", 100L, 6L, Some(3000000L), true),
      ("b", 100L, 1L, Some(1000000L), false),
      ("z", 100L, 1L, None, true)), s"got $rows")
  }

  test("streaming banded range join matches the batch operator's inner pairs") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val purchases = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = graft.streaming.EventStreams.bandedRangeJoinStream(
      purchases.toDF().toDF("p_id", "p_ts"),
      clicks.toDF().toDF("c_id", "c_ts"),
      "p_ts", "c_ts", windowSec = 60)
    val q = joined.writeStream.format("memory").queryName("brj")
      .outputMode(OutputMode.Append).start()
    val pData = Seq((1L, t(100)), (2L, t(200)))
    val cData = Seq((10L, t(50)), (11L, t(95)), (12L, t(100)),
      (13L, t(150)), (14L, t(201)))
    try {
      purchases.addData(pData)
      clicks.addData(cData)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("brj").collect()
      .map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("c_id"))).toSet
    // purchase@100 sees (40,100] → clicks 50, 95, 100; purchase@200
    // sees (140,200] → click 150 only; click 201 matches nothing
    assert(streamed == Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 13L)))
    val batch = graft.ops.RangeJoin.trailingCandidates(
      pData.toDF("p_id", "p_ts").selectExpr("p_id", "unix_micros(p_ts) AS p_us"),
      cData.toDF("c_id", "c_ts").selectExpr("c_id", "unix_micros(c_ts) AS c_us"),
      "p_us", "c_us", windowMicros = 60000000L)
      .filter(org.apache.spark.sql.functions.col("in_window"))
      .collect().map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("c_id"))).toSet
    assert(streamed == batch)
  }

  test("keyed streaming range join matches the native batch operator's inner pairs") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = graft.streaming.EventStreams.keyedRangeJoinStream(
      purchases.toDF().toDF("p_id", "p_user", "p_ts"),
      clicks.toDF().toDF("c_id", "c_user", "c_ts"),
      Seq("p_user" -> "c_user"), "p_ts", "c_ts", windowSec = 60)
    val q = joined.writeStream.format("memory").queryName("krj")
      .outputMode(OutputMode.Append).start()
    // user 1: purchase@100 window (40,100]; user 2: purchase@200 window (140,200]
    val pData = Seq((1L, 1L, t(100)), (2L, 2L, t(200)))
    val cData = Seq((10L, 1L, t(50)), (11L, 2L, t(50)), (12L, 1L, t(100)),
      (13L, 2L, t(150)), (14L, 1L, t(150)), (15L, 3L, t(95)))
    try {
      purchases.addData(pData)
      clicks.addData(cData)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("krj").collect()
      .map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("c_id"))).toSet
    // user-keyed: click@50 of user 2 does NOT match purchase@100 (user 1);
    // click@150 of user 1 is outside purchase@100's window
    assert(streamed == Set((1L, 10L), (1L, 12L), (2L, 13L)))
    val batch = graft.plans.RangeNative.join(
      pData.toDF("p_id", "p_user", "p_ts")
        .selectExpr("p_id", "p_user", "unix_micros(p_ts) AS p_us"),
      cData.toDF("c_id", "c_user", "c_ts")
        .selectExpr("c_id", "c_user", "unix_micros(c_ts) AS c_us"),
      Seq("p_user" -> "c_user"), ("p_us", "c_us"), windowMicros = 60000000L)
      .collect().map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("c_id"))).toSet
    assert(streamed == batch)
  }

  test("keyed streaming range join left-outer emits null-padded unmatched rows on watermark") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = graft.streaming.EventStreams.keyedRangeJoinStream(
      purchases.toDF().toDF("p_id", "p_user", "p_ts"),
      clicks.toDF().toDF("c_id", "c_user", "c_ts"),
      Seq("p_user" -> "c_user"), "p_ts", "c_ts", windowSec = 60,
      leftOuter = true, watermark = "5 seconds")
    val q = joined.writeStream.format("memory").queryName("krjo")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 matches; user 9's purchase has no click in-window
      purchases.addData(Seq((1L, 1L, t(100)), (2L, 9L, t(100))))
      clicks.addData(Seq((10L, 1L, t(80)), (11L, 9L, t(20))))
      q.processAllAvailable()
      // sentinel rows push both watermarks far past the join windows so
      // the unmatched left row is provably match-free and emits
      purchases.addData(Seq((99L, 99L, t(10000))))
      clicks.addData(Seq((98L, 98L, t(10000))))
      q.processAllAvailable()
      purchases.addData(Seq((97L, 97L, t(20000))))
      clicks.addData(Seq((96L, 96L, t(20000))))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("krjo").collect()
      .map(r => (r.getAs[Long]("p_id"),
        Option(r.getAs[java.lang.Long]("c_id")).map(_.toLong))).toSet
    assert(rows.contains((1L, Some(10L))))   // matched pair, no null twin
    assert(rows.contains((2L, None)))        // unmatched left, null-padded
    assert(!rows.contains((1L, None)))
    // the out-of-window click never joins
    assert(!rows.exists(_._2.contains(11L)))
  }

  test("streaming heavy hitters converge to exact counts at ample capacity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, explode, split}
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val tokens = Tables.documents(spark, sf).limit(100)
      .select(explode(split(col("text"), " ")).as("token"))
      .as[String].collect()
    val (b1, b2) = tokens.splitAt(tokens.length / 2)
    val input = MemoryStream[String]
    val hh = graft.streaming.EventStreams.heavyHittersState(
      input.toDF().select(col("value").as("token")), buckets = 4, capacity = 4096)
    val q = hh.toDF().writeStream.format("memory").queryName("hhx")
      .outputMode("update").start()
    try {
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    // exact regime: counters only grow, so the last (= max) emission
    // per token is the final state
    val streamed = spark.table("hhx").groupBy("token")
      .agg(org.apache.spark.sql.functions.max("cnt").as("cnt"))
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("cnt")).toMap
    val exact = tokens.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(streamed == exact)
  }

  test("streaming heavy hitters keep bounded state with the MG guarantee") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    // skewed stream: two dominant tokens + a long tail, one batch so
    // the single trigger's emissions ARE the final summaries
    val tokens = (Seq.fill(400)("hot1") ++ Seq.fill(300)("hot2") ++
      (1 to 300).map(i => s"tail$i")).toIndexedSeq
    val capacity = 16
    val input = MemoryStream[String]
    val hh = graft.streaming.EventStreams.heavyHittersState(
      input.toDF().select(col("value").as("token")), buckets = 4, capacity = capacity)
    val q = hh.toDF().writeStream.format("memory").queryName("hhb")
      .outputMode("update").start()
    try { input.addData(tokens); q.processAllAvailable() } finally q.stop()
    val emitted = spark.table("hhb").collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[String]("token")) ->
        r.getAs[Long]("cnt")).toMap
    // same bucketing the operator applies
    val bucketOf = tokens.distinct.toDF("token")
      .select(col("token"), pmod(xxhash64(col("token")), lit(4)).cast("int").as("b"))
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Int]("b")).toMap
    val trueCounts = tokens.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bucketN = tokens.groupBy(bucketOf).view.mapValues(_.length.toLong).toMap
    // bounded state: no bucket summary exceeds capacity
    emitted.keys.groupBy(_._1).foreach { case (_, ks) =>
      assert(ks.size <= capacity) }
    emitted.foreach { case ((b, t), est) =>
      assert(est <= trueCounts(t), s"$t overcounted: $est > ${trueCounts(t)}")
      assert(trueCounts(t) - est <= bucketN(b) / capacity,
        s"$t undercount beyond the MG bound") }
    // every token more frequent than N_bucket/capacity must survive
    trueCounts.foreach { case (t, n) =>
      val b = bucketOf(t)
      if (n > bucketN(b) / capacity)
        assert(emitted.contains((b, t)), s"frequent token $t evicted") }
  }

  test("streaming label drift converges to the batch centroid audit") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val d = 8
    def vec(label: Int, i: Int): (Long, Seq[Float], Int) = {
      val a = Array.fill(d)(0.0f)
      a(0) = if (label == 1) 2.0f else 0.0f     // label 1 is shifted
      a(i % d) = a(i % d) + 0.05f * (i + 1)
      ((label * 100 + i).toLong, a.toSeq, label)
    }
    val rows1 = (0 until 10).map(i => vec(0, i)) ++ (0 until 10).map(i => vec(1, i))
    val rows2 = (10 until 20).map(i => vec(0, i)) ++ (10 until 20).map(i => vec(1, i))
    // reference = the final corpus's global centroid, fitted batch-side
    val all = (rows1 ++ rows2).toDF("vec_id", "embedding", "label")
    val avgs = (0 until d).map(j =>
      org.apache.spark.sql.functions.avg(
        org.apache.spark.sql.functions.col("embedding").getItem(j)))
    val gRow = all.agg(avgs.head, avgs.tail: _*).head()
    val ref = (0 until d).map(gRow.getDouble)

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float], Int)]
    val emissions = EmbeddingStreams.labelDriftState(
      input.toDF().toDF("vec_id", "embedding", "label"), ref)
    val q = emissions.writeStream.format("memory").queryName("drift")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(rows1); q.processAllAvailable()
      input.addData(rows2); q.processAllAvailable()
    } finally q.stop()

    val emitted = spark.table("drift")
      .as[EmbeddingStreams.LabelDriftEmit].collect()
    // one emission per (label, batch); the final one has seen all rows
    val fin = emitted.groupBy(_.label).map { case (l, es) => l -> es.maxBy(_.n_vecs) }
    assert(fin(0).n_vecs == 20L && fin(1).n_vecs == 20L)
    // batch twin on the same corpus with the same reference arithmetic
    val batchDist = (0 to 1).map { lab =>
      val rows = (rows1 ++ rows2).filter(_._3 == lab)
      val cent = (0 until d).map(j => (rows.map(_._2(j).toDouble).sum / rows.size).toFloat)
      lab -> math.sqrt((0 until d).map { j =>
        val df = cent(j).toDouble - ref(j).toFloat.toDouble; df * df }.sum)
    }.toMap
    (0 to 1).foreach { lab =>
      assert(math.abs(fin(lab).centroid_dist - batchDist(lab)) < 1e-4,
        s"label $lab stream ${fin(lab).centroid_dist} vs batch ${batchDist(lab)}") }
    // the shifted label is far from the global centroid, label 0 symmetric
    assert(fin(1).centroid_dist > 0.5)
  }

  test("streaming cluster routing on a loaded model equals the batch " +
    "assignment row for row") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val emb = Tables.embeddings(spark, sf).limit(40)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](r.fieldIndex("embedding"))))
    // fit + publish + load: the router must ride the LOADED artifact
    val dir = java.nio.file.Files
      .createTempDirectory("graft-route-model").toString
    val cents = graft.sim.Similarity.fitIvf(
      Tables.embeddings(spark, sf), centroidStride = 13L, kmeansIters = 1)
    graft.sim.Similarity.saveIndex(spark, dir, 1L, Seq("km" -> cents))
    val loaded = graft.sim.Similarity.loadIndexPart(spark, dir, "km")
    val batch = graft.sim.Similarity.assignKmeans(
      emb.toSeq.toDF("vec_id", "embedding"), loaded)
      .collect().map(_.toSeq).toSet
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val q = EmbeddingStreams.clusterRouteStream(
        input.toDF().toDF("vec_id", "embedding"), loaded)
      .writeStream.format("memory").queryName("route")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(emb.take(25).toSeq); q.processAllAvailable()
      input.addData(emb.drop(25).toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("route").collect().map(_.toSeq).toSet
    assert(streamed === batch && batch.nonEmpty)
    // every routed row carries a cell of the model
    val cells = loaded.select("cell_id").collect().map(_.getLong(0)).toSet
    assert(spark.table("route").collect()
      .forall(r => cells.contains(r.getAs[Long]("cell_id"))))
  }

  test("streaming attribution emissions aggregate to the batch totals") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    def at(id: Long, user: Long, typ: String, v: Double) = EventRow(id,
      java.sql.Timestamp.valueOf(f"2024-01-01 10:00:${id}%02d"), user, typ, v, "{}")
    // the touch and its purchase STRADDLE the batch boundary for user
    // 1; user 2's first purchase is direct; user 3 buys twice off one
    // click inside one batch
    val b1 = Seq(at(1, 1, "click", 0), at(2, 2, "purchase", 7.0),
      at(3, 3, "click", 0), at(4, 3, "purchase", 1.0), at(5, 3, "purchase", 2.0))
    val b2 = Seq(at(6, 1, "purchase", 10.0), at(7, 1, "view", 0),
      at(8, 1, "purchase", 4.0))
    val input = MemoryStream[EventRow]
    val q = graft.streaming.EventStreams.attributionState(input.toDF())
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("attr")
      .as[graft.streaming.AttributionHit].collect()
    // every purchase emits exactly once, keyed by event id
    assert(streamed.map(_.event_id).distinct.length == streamed.length)
    val totals = streamed.groupBy(_.channel)
      .map { case (c, hs) => c -> (hs.length.toLong,
        math.round(hs.map(_.value).sum * 100) / 100.0) }
    val batch = graft.ops.Events.attribution((b1 ++ b2).toDF()).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Double]("attributed_value")))
      .toMap
    assert(totals == batch, s"stream $totals vs batch $batch")
    assert(batch.keySet == Set("click", "view", "direct"))
  }

  test("streaming debounce emits exactly the batch keep-set across a burst split") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    def row(id: Long, sec: Long, user: Long, typ: String) =
      EventRow(id, new Timestamp(1700000000000L + sec * 1000L), user, typ,
        1.0, "{}")
    // u1 click chain 0-3-6-9s (one burst), fresh burst at 100s; the
    // BATCH BOUNDARY splits the first burst mid-chain (3|6), so the
    // carry state must suppress the second half
    val all = Seq(row(1, 0, 1, "click"), row(2, 3, 1, "click"),
      row(3, 6, 1, "click"), row(4, 9, 1, "click"),
      row(5, 100, 1, "click"), row(6, 0, 1, "view"), row(7, 3, 2, "click"))
    val batchKeep = graft.ops.Events.debounce(all.toDF())
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n_kept")).toMap
    val input = MemoryStream[EventRow]
    val q = graft.streaming.EventStreams.debounceState(input.toDF())
      .writeStream.format("memory").queryName("deb")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(all.take(2)); q.processAllAvailable()
      input.addData(all.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("deb").collect()
      .map(r => r.getAs[Long]("event_id")).toSet
    assert(emitted == Set(1L, 5L, 6L, 7L), s"got $emitted")
    val perType = spark.table("deb").collect()
      .groupBy(_.getAs[String]("event_type")).map { case (t, rs) => t -> rs.length.toLong }
    assert(perType == batchKeep, s"stream $perType vs batch $batchKeep")
    // a late duplicate at-or-before the high-water mark drops
    val input2 = MemoryStream[EventRow]
    val q2 = graft.streaming.EventStreams.debounceState(input2.toDF())
      .writeStream.format("memory").queryName("deb2")
      .outputMode(OutputMode.Update).start()
    try {
      input2.addData(Seq(row(10, 50, 9, "click"))); q2.processAllAvailable()
      input2.addData(Seq(row(11, 20, 9, "click"))); q2.processAllAvailable()
    } finally q2.stop()
    val em2 = spark.table("deb2").collect().map(_.getAs[Long]("event_id")).toSet
    assert(em2 == Set(10L), s"got $em2")
  }

  test("streaming rate gate: finalized counts equal the batch trailing counts") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    // realistic epoch base: rows at/below the INITIAL watermark (0)
    // are pre-filtered by the stateful exec itself, so epoch-zero
    // test times never reach the operator (the concurrency spec's
    // base-offset rule)
    val base = 1700000000000L
    def row(id: Long, sec: Long, user: Long) =
      EventRow(id, new Timestamp(base + sec * 1000L), user, "click", 1.0, "{}")
    val input = MemoryStream[EventRow]
    val q = graft.streaming.EventStreams
      .rateGateStream(input.toDF(), windowSec = 60, threshold = 3,
        watermark = "10 seconds")
      .writeStream.format("memory").queryName("rgate")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1 arrives OUT of event order; watermark after it = 40s,
      // so nothing is final during the batch itself
      input.addData(Seq(row(3, 50, 1), row(1, 0, 1), row(2, 30, 1),
        row(5, 0, 2)))
      q.processAllAvailable()
      // batch 2: user 1's 200s row advances the watermark to 190s;
      // user 1 finalizes 0s/30s with IN-ORDER counts, user 2 (no new
      // data) drains its 0s row by event-time TIMEOUT
      input.addData(Seq(row(4, 200, 1)))
      q.processAllAvailable()
      // the 50s event finalizes only now — with the full count of 3
      // (both in-window peers present despite the disordered arrival)
      input.addData(Seq(row(99, 100000, 9)))
      q.processAllAvailable()
      // and the 200s event drains with count 1 (its window is empty
      // after the 60s horizon pruned the old times); the sentinel's
      // own rows stay pending forever (watermark never passes them)
      input.addData(Seq(row(100, 100001, 9)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("rgate").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("us"), r.getAs[Long]("n_in_window"),
        r.getAs[Boolean]("gated"))).toSet
    def us(sec: Long) = (1700000000L + sec) * 1000000L
    assert(got === Set(
      (1L, 1L, us(0), 1L, false),
      (1L, 2L, us(30), 2L, false),
      (1L, 3L, us(50), 3L, true),
      (1L, 4L, us(200), 1L, false),
      (2L, 5L, us(0), 1L, false)), s"got $got")
  }

  test("streaming concurrency deltas mirror the batch session boundaries") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    def row(id: Long, sec: Long, user: Long) =
      EventRow(id, new Timestamp(1700000000000L + sec * 1000L), user,
        "click", 1.0, "{}")
    def tUs(sec: Long) = (1700000000000L + sec * 1000L) * 1000L
    val input = MemoryStream[EventRow]
    // delay 1800s: u2's batch-2 arrival at 300s stays ahead of the
    // batch-1 watermark (600 − 1800 < 0), while u3's 100000s event
    // still drives the watermark far past every other timeout
    val q = graft.streaming.EventStreams
      .concurrencyState(input.toDF(), watermark = "1800 seconds")
      .writeStream.format("memory").queryName("conc")
      .outputMode(OutputMode.Append).start()
    try {
      // u1 session [0, 600] SPLIT across the batch boundary; batch 2
      // closes it by the gap rule (10000s > 600 + 1800) and opens a
      // new one; u2 is a point session; u3 pushes the watermark
      input.addData(Seq(row(1, 0, 1), row(2, 600, 1)))
      q.processAllAvailable()
      input.addData(Seq(row(3, 10000, 1), row(4, 300, 2),
        row(5, 100000, 3)))
      q.processAllAvailable()
      // watermark (100000s) is now past u1/u2's last + gap: their
      // open sessions close by event-time TIMEOUT on this trigger
      input.addData(Seq(row(6, 100001, 3)))
      q.processAllAvailable()
      // a straggler behind the watermark must NOT reopen a phantom
      // session inside u1's already-closed-and-reported span
      input.addData(Seq(row(7, 5000, 1)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("conc").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Int]("delta")))
    // exactly the batch sessionization's half-open boundaries:
    // +1 at each session start, −1 at end + 1µs
    val expected = Seq(
      (1L, tUs(0), 1), (1L, tUs(600) + 1L, -1),
      (1L, tUs(10000), 1), (1L, tUs(10000) + 1L, -1),
      (2L, tUs(300), 1), (2L, tUs(300) + 1L, -1),
      (3L, tUs(100000), 1)) // u3 still active: no close yet
    assert(got.sorted.toSeq == expected.sorted,
      s"got ${got.sorted.toSeq}\nexp ${expected.sorted}")
    // the running sum in time order IS the live gauge: u1/u2 overlap
    // peaks at 2, and the gauge never goes negative
    val gauge = got.sortBy(d => (d._2, -d._3)).scanLeft(0)(_ + _._3).drop(1)
    assert(gauge.max == 2 && gauge.min >= 0, s"gauge $gauge")
  }

  test("concurrency retro-extends an open session for an in-watermark straggler") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    def row(id: Long, sec: Long, user: Long) =
      EventRow(id, new Timestamp(1700000000000L + sec * 1000L), user,
        "click", 1.0, "{}")
    def tUs(sec: Long) = (1700000000000L + sec * 1000L) * 1000L
    val input = MemoryStream[EventRow]
    // watermark delay WIDER than the gap, so the second straggler
    // below is dropped by the GAP-REACH fence, not the watermark one
    val q = graft.streaming.EventStreams
      .concurrencyState(input.toDF(), watermark = "10000 seconds")
      .writeStream.format("memory").queryName("conc_retro")
      .outputMode(OutputMode.Append).start()
    try {
      // session opens at 600s (+1 published)...
      input.addData(Seq(row(1, 600, 1))); q.processAllAvailable()
      // ...then an IN-WATERMARK straggler stamped 0s arrives: the
      // batch session truly starts at 0s (gap 1800s reaches 600s).
      // The stream must publish the compensating pair, not drop it
      input.addData(Seq(row(2, 0, 1))); q.processAllAvailable()
      // a straggler beyond the open start's gap reach (a separate
      // earlier session for u2's timeline) is out of scope and drops
      input.addData(Seq(row(3, 9000, 2))); q.processAllAvailable()
      input.addData(Seq(row(4, 5000, 2))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("conc_retro").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Int]("delta")))
    // raw emissions: the stale +1@600 plus its compensating −1@600
    assert(got.count(d => d._1 == 1L) == 3, s"got ${got.toSeq}")
    // NET deltas (summed per (user, us), zeros dropped) equal the
    // batch boundaries: u1's session now opens at 0s, nothing else
    val net = got.groupBy(d => (d._1, d._2))
      .map { case (k, ds) => k -> ds.map(_._3).sum }
      .filter(_._2 != 0).toMap
    assert(net == Map((1L, tUs(0)) -> 1, (2L, tUs(9000)) -> 1),
      s"net $net from ${got.toSeq}")
  }

  test("streaming value drift converges to the batch KS across batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    def row(id: Long, sec: Int, typ: String, v: Double) =
      EventRow(id, new Timestamp(1700000000000L + sec * 1000L), 1L, typ, v, "{}")
    // times span [1s, 670s] → the batch operator splits at the
    // integer midpoint ~335s: reference rows sit at ≤ 201s, current
    // at ≥ 601s. The global extremes (0 and 100) are PLANTED in the
    // reference window so the batch [lo, hi] equals the reference fit's
    val refRows =
      (1 to 30).map(i => row(i, i, "steady", (i % 10).toDouble)) ++
      (1 to 30).map(i => row(100 + i, i + 30, "moving", (i % 10).toDouble)) :+
      row(500, 200, "steady", 100.0) :+ row(501, 201, "steady", 0.0)
    val curRows =
      (1 to 30).map(i => row(200 + i, 600 + i, "steady", (i % 10).toDouble)) ++
      (1 to 30).map(i => row(300 + i, 640 + i, "moving", 80.0 + (i % 10)))
    val all = (refRows ++ curRows).toDF()
    val batchKs = graft.ops.Events.valueDrift(all).collect()
      .map(r => r.getAs[String]("etype") ->
        (r.getAs[Long]("n_cur"), r.getAs[Double]("ks"))).toMap
    val (lo, hi, refCounts) =
      graft.streaming.EventStreams.driftReference(refRows.toDF())
    assert(lo == 0.0 && hi == 100.0)
    // stream ONLY the current window, split mid-type across batches
    val input = MemoryStream[EventRow]
    val emits = graft.streaming.EventStreams.valueDriftState(
      input.toDF(), lo, hi, refCounts)
    val q = emits.writeStream.format("memory").queryName("vdrift")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(curRows.take(25)); q.processAllAvailable()
      input.addData(curRows.drop(25)); q.processAllAvailable()
    } finally q.stop()
    // the LAST emission per type is the full-current-window KS — the
    // batch operator's number, bit for bit
    val last = spark.table("vdrift").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_cur"),
        r.getAs[Double]("ks")))
      .groupBy(_._1).map { case (t, es) => t -> es.maxBy(_._2) }
    assert(last("steady")._2 == batchKs("steady")._1)
    assert(last("steady")._3 == batchKs("steady")._2,
      s"steady: ${last("steady")} vs ${batchKs("steady")}")
    assert(last("moving")._3 == batchKs("moving")._2,
      s"moving: ${last("moving")} vs ${batchKs("moving")}")
    assert(last("moving")._3 > 0.9 && last("steady")._3 < 0.1)
    // a type never seen in the reference is the MAXIMAL shift: ks = 1
    val input2 = MemoryStream[EventRow]
    val emits2 = graft.streaming.EventStreams.valueDriftState(
      input2.toDF(), lo, hi, refCounts)
    val q2 = emits2.writeStream.format("memory").queryName("vdrift2")
      .outputMode(OutputMode.Update).start()
    try {
      input2.addData(Seq(row(900, 700, "unseen", 5.0),
        // out-of-range value clamps to the top edge bin, not an error
        row(901, 701, "steady", 250.0)))
      q2.processAllAvailable()
    } finally q2.stop()
    val em2 = spark.table("vdrift2").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("ks")).toMap
    assert(em2.keySet == Set("steady", "unseen"))
    assert(em2("unseen") == 1.0)
  }

  test("streaming interval join equals batch coactivityNative across a band-straddling boundary") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    // sessions engineered so one overlap (user2 x user3) STRADDLES
    // the 11:00 band boundary — the multi-band pair that would
    // duplicate without the owner-band discipline
    def ev(id: Long, user: Long, hm: String) = EventRow(id,
      Timestamp.valueOf(s"2024-01-01 $hm:00"), user, "click", 1.0, "{}")
    val events = Seq(
      ev(1, 1, "10:00"), ev(2, 1, "10:20"), ev(3, 1, "10:40"), // u1 [10:00,10:40]
      ev(4, 1, "12:00"),                                       // u1 [12:00,12:00]
      ev(5, 2, "10:50"), ev(6, 2, "11:10"), ev(7, 2, "11:30"), // u2 [10:50,11:30]
      ev(8, 3, "10:30"), ev(9, 3, "11:00"), ev(10, 3, "11:05")) // u3 [10:30,11:05]
    val expected = graft.ops.Events
      .coactivityNative(events.toDF(), gapSec = 1800L, bandSec = 3600L)
      .collect().map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b"),
        r.getAs[Long]("n_overlaps"), r.getAs[Long]("shared_us"))).toSet
    assert(expected.nonEmpty)

    // the same session intervals, keyed user*100+sid, fed as BOTH
    // stream sides — the left side in batch 1, the right in batch 2,
    // so every pair crosses the micro-batch boundary through state
    val ivs = graft.ops.Events.sessionSpans(events.toDF(), 1800L)
      .collect().map(r => (r.getAs[Long]("user_id") * 100L + r.getAs[Long]("sid"),
        r.getAs[Long]("s"), r.getAs[Long]("e"))).toSeq
    val lIn = MemoryStream[(Long, Long, Long)]
    val rIn = MemoryStream[(Long, Long, Long)]
    def shape(m: MemoryStream[(Long, Long, Long)]) =
      m.toDF().select(col("_1").as("key"),
        expr("timestamp_micros(_2)").as("s"), expr("timestamp_micros(_3)").as("e"))
    val joined = graft.streaming.EventStreams.intervalJoinStream(
      shape(lIn), shape(rIn), bandSec = 3600L, watermark = "4 hours")
    val q = joined.toDF().writeStream.format("memory").queryName("ivj")
      .outputMode(OutputMode.Append).start()
    try {
      lIn.addData(ivs); q.processAllAvailable()
      rIn.addData(ivs); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ivj").collect()
      .map(r => (r.getAs[Long]("l_key"), r.getAs[Long]("l_s"), r.getAs[Long]("l_e"),
        r.getAs[Long]("r_key"), r.getAs[Long]("r_s"), r.getAs[Long]("r_e")))
    // one orientation per unordered pair, distinct users, aggregated
    // exactly like the batch operator
    val agg = got.filter(t => t._1 < t._4 && t._1 / 100L != t._4 / 100L)
      .groupBy(t => (t._1 / 100L, t._4 / 100L)).map { case ((ua, ub), ps) =>
        (ua, ub, ps.size.toLong,
          ps.map(p => math.min(p._3, p._6) - math.max(p._2, p._5) + 1L).sum)
      }.toSet
    assert(agg == expected, s"stream $agg vs batch $expected")
    // the band-straddling u2 x u3 overlap emitted exactly once
    assert(got.count(t => Set(t._1 / 100L, t._4 / 100L) == Set(2L, 3L)) == 2,
      "expected exactly one emission per orientation for the straddling pair")
  }

  test("streaming interval join equals the naive batch join on fuzzed multi-band intervals") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val rnd = new scala.util.Random(42)
    val base = 1700000000000000L
    def mk(n: Int, keyBase: Long): Seq[(Long, Long, Long)] =
      (0 until n).map { i =>
        val st = base + rnd.nextInt(3600) * 1000000L
        // spans up to ~5 of the 60s bands, point intervals included
        (keyBase + i, st, st + rnd.nextInt(300) * 1000000L)
      }
    val ls = mk(250, 1000L)
    val rs = mk(250, 500000L)
    val expected = (for {
      l <- ls; r <- rs
      if l._2 <= r._3 && r._2 <= l._3 // closed-span overlap
    } yield (l._1, r._1)).toSet

    val lIn = MemoryStream[(Long, Long, Long)]
    val rIn = MemoryStream[(Long, Long, Long)]
    def shape(m: MemoryStream[(Long, Long, Long)]) =
      m.toDF().select(col("_1").as("key"),
        expr("timestamp_micros(_2)").as("s"), expr("timestamp_micros(_3)").as("e"))
    val q = graft.streaming.EventStreams.intervalJoinStream(
        shape(lIn), shape(rIn), bandSec = 60L, watermark = "24 hours")
      .toDF().writeStream.format("memory").queryName("ivjf")
      .outputMode(OutputMode.Append).start()
    try {
      // arrival order is adversarial: shuffled, split mid-stream on
      // BOTH sides so pairs form within and across micro-batches
      val lSh = rnd.shuffle(ls); val rSh = rnd.shuffle(rs)
      lIn.addData(lSh.take(125)); rIn.addData(rSh.take(125))
      q.processAllAvailable()
      lIn.addData(lSh.drop(125)); rIn.addData(rSh.drop(125))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ivjf").collect()
      .map(r => (r.getAs[Long]("l_key"), r.getAs[Long]("r_key"))).toSeq
    assert(got.size === got.distinct.size, "a pair emitted twice")
    assert(got.toSet === expected,
      s"missing ${(expected -- got.toSet).take(5)}; extra ${(got.toSet -- expected).take(5)}")
  }

  test("interval join state survives kill + restart: buffered side still pairs") {
    import org.apache.spark.sql.functions.{col, expr, lit}
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivj-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ivj-out").toString
    val base = 1700000000000000L // µs
    def us(sec: Long) = base + sec * 1000000L
    val lIn = MemoryStream[(Long, Long, Long)]
    val rIn = MemoryStream[(Long, Long, Long)]
    def shape(m: MemoryStream[(Long, Long, Long)]) =
      m.toDF().select(col("_1").as("key"),
        expr("timestamp_micros(_2)").as("s"), expr("timestamp_micros(_3)").as("e"))
    def start() = graft.streaming.EventStreams.intervalJoinStream(
        shape(lIn), shape(rIn), bandSec = 3600L, watermark = "2 hours")
      .toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.withColumn("b", lit(id)).write.mode("append").parquet(out): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    val q1 = start()
    try { lIn.addData(Seq((7L, us(0), us(100)))); q1.processAllAvailable() }
    finally q1.stop()
    // the partner arrives while the query is down; a restart that
    // lost the buffered left interval would emit nothing
    rIn.addData(Seq((9L, us(50), us(150))))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val pairs = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("l_key"), r.getAs[Long]("r_key"),
        r.getAs[Long]("l_s"), r.getAs[Long]("r_e"))).toSet
    assert(pairs == Set((7L, 9L, us(0), us(150))), s"got $pairs")
  }

  test("daily volume cells accumulate, finalize at the watermark, " +
      "and late rows drop") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dv-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-dv-out").toString
    val day = 20000L // UTC epoch day
    def row(id: Long, sec: Long, t: String) =
      EventRow(id, new Timestamp(sec * 1000L), 1L, t, 1.0, "{}")
    val input = MemoryStream[EventRow]
    def start() =
      graft.streaming.EventStreams
        .dailyVolumeState(input.toDF(), watermark = "1 hour")
        .toDF().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("b", lit(id)).write.mode("append").parquet(out): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    val d0 = day * 86400L
    val q = start()
    try {
      // batch 1: two clicks on the day → one running cell n=2
      input.addData(Seq(row(1, d0 + 10, "click"), row(2, d0 + 20, "click")))
      q.processAllAvailable()
      // batch 2: a third click and a first view → running cells 3, 1
      input.addData(Seq(row(3, d0 + 30, "click"), row(4, d0 + 40, "view")))
      q.processAllAvailable()
      // batch 3: a row ten days out pushes the watermark far past the
      // day's end + allowance → both cells finalize and drop state
      input.addData(Seq(row(5, d0 + 10 * 86400, "click")))
      q.processAllAvailable()
      // batch 4: a straggler inside the finalized day is at-or-before
      // the watermark → the fence drops it, no phantom cell reopens
      input.addData(Seq(row(6, d0 + 50, "click")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_epoch"),
        r.getAs[Long]("n"), r.getAs[Boolean]("is_final"))).toSet
    val expected = Set(
      ("click", day, 2L, false), ("click", day, 3L, false),
      ("view", day, 1L, false),
      ("click", day, 3L, true), ("view", day, 1L, true),
      ("click", day + 10, 1L, false))
    assert(got == expected, s"got $got")
    // the finalized cells equal the batch day-grain counts over the
    // surviving (non-late) rows — the dailySeries twin claim
    val batchDf = Seq(row(1, d0 + 10, "click"), row(2, d0 + 20, "click"),
      row(3, d0 + 30, "click"), row(4, d0 + 40, "view")).toDF()
    val batchCounts = batchDf
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.expr(
          "unix_micros(ts) div 86400000000").as("day_epoch"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val finals = got.collect { case (t, d, n, true) => (t, d, n) }
    assert(finals == batchCounts, s"finals $finals vs batch $batchCounts")
  }

  test("daily volume state survives kill + restart: the count carries") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dv2-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-dv2-out").toString
    val d0 = 20000L * 86400L
    def row(id: Long, sec: Long) =
      EventRow(id, new Timestamp(sec * 1000L), 1L, "click", 1.0, "{}")
    val input = MemoryStream[EventRow]
    def start() =
      graft.streaming.EventStreams.dailyVolumeState(input.toDF())
        .toDF().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("b", lit(id)).write.mode("append").parquet(out): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    val q1 = start()
    try { input.addData(Seq(row(1, d0 + 10), row(2, d0 + 20)))
      q1.processAllAvailable() } finally q1.stop()
    // the day keeps filling while the query is down
    input.addData(Seq(row(3, d0 + 30)))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val ns = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("n")).toSet
    // a restart that lost the 2-count would re-emit n = 1, not n = 3
    assert(ns == Set(2L, 3L), s"got $ns")
  }

  test("markov state: streamed transitions equal the batch lag pairs") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    def row(id: Long, user: Long, us: Long, t: String) =
      EventRow(id, new Timestamp(us / 1000L), user, t, 1.0, "{}")
    val input = MemoryStream[EventRow]
    val q = graft.streaming.EventStreams.markovState(input.toDF())
      .toDF().writeStream.format("memory").queryName("mkv")
      .outputMode(OutputMode.Append).start()
    val all = scala.collection.mutable.ListBuffer.empty[Seq[EventRow]]
    try {
      // u1: a(1s) b(2s) in batch 1 — shuffled arrival within the
      // batch; u2: x(1s) alone
      all += Seq(row(2, 1, 2000000, "b"), row(1, 1, 1000000, "a"),
        row(3, 2, 1000000, "x"))
      input.addData(all.last); q.processAllAvailable()
      // batch 2 continues u1's chain across the boundary (b->c),
      // extends u2 (x->y), and a LATE row at-or-before u1's mark
      // drops (no phantom a->z / z->c rewrite)
      all += Seq(row(4, 1, 3000000, "c"), row(5, 2, 2000000, "y"),
        row(6, 1, 1500000, "z"))
      input.addData(all.last); q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT prev_type, next_type FROM mkv").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // batch twin over the SURVIVING rows (the late z dropped)
    val surviving = all.flatten.toSeq.filterNot(_.event_id == 6L)
    val batch = graft.ops.Events.markov(surviving.toDF())
      .collect().map(r => (r.getAs[String]("prev_type"),
        r.getAs[String]("next_type")) -> r.getAs[Long]("n")).toMap
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got == Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("x", "y") -> 1L))
  }

  test("first-seen state: one emission per user, late earlier day corrects") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlc = spark.sqlContext
    def row(id: Long, user: Long, day: Long) =
      EventRow(id, new Timestamp(day * 86400000L + id), user, "click", 1.0, "{}")
    val input = MemoryStream[EventRow]
    val q = graft.streaming.EventStreams.firstSeenState(input.toDF())
      .toDF().writeStream.format("memory").queryName("fsn")
      .outputMode(OutputMode.Append).start()
    val all = scala.collection.mutable.ListBuffer.empty[Seq[EventRow]]
    try {
      // u1@d5, u2@d6; u4 arrives twice in ONE batch, days 9 then 8 —
      // the in-batch min emits once
      all += Seq(row(1, 1, 5), row(2, 2, 6), row(3, 4, 9), row(4, 4, 8))
      input.addData(all.last); q.processAllAvailable()
      // u1 again later (silent), u3 new, u2 late with an EARLIER day
      // (correction), u4 late with a LATER day (silent)
      all += Seq(row(5, 1, 7), row(6, 3, 6), row(7, 2, 4), row(8, 4, 9))
      input.addData(all.last); q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT * FROM fsn").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("first_day"),
        r.getAs[Boolean]("is_correction"))).toSet
    assert(got == Set((1L, 5L, false), (2L, 6L, false), (4L, 8L, false),
      (3L, 6L, false), (2L, 4L, true)), s"got $got")
    // latest emission per user == the batch operator's first-seen
    // identity over everything streamed, whatever the arrival order
    val latest = got.groupBy(_._1).map { case (u, rows) =>
      u -> rows.collect { case (_, d, c) => (c, d) }.toSeq
        .sortBy(_._1).last._2 } // corrections (true) sort after
    val batch = all.flatten.toSeq.toDF()
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.expr(
        "min(unix_micros(ts) div 86400000000)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(latest == batch, s"stream $latest vs batch $batch")
  }
}
