package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cdc.Changelog

/** Compaction/merge algebra: the incremental-view-maintenance path
  * must be indistinguishable from full replay, split anywhere.
  */
class CdcSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private def cl: DataFrame = Changelog.fromEvents(Tables.events(spark, sf))

  private def canon(df: DataFrame): Set[String] =
    df.orderBy("doc_id").collect().map(_.mkString("|")).toSet

  test("merge(compact(old), delta) == full replay, any split point") {
    val full = canon(Changelog.latestState(cl))
    for (frac <- Seq(0.25, 0.5, 0.9)) {
      val split = (cl.agg(max("seq")).head().getLong(0) * frac).toLong
      val base = Changelog.compactState(cl.filter(col("seq") <= split))
      val delta = cl.filter(col("seq") > split)
      val merged = canon(Changelog.liveState(Changelog.mergeState(base, delta)))
      assert(merged == full, s"divergence at split fraction $frac")
    }
  }

  test("partition skew: md5 placement matches a driver-side replay, " +
    "totals conserve, a dominated partition reads its hot-doc share") {
    import spark.implicits._
    // driver-side ground truth of the same md5-nibble placement
    def part(doc: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(doc.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16) % 8
    }
    // docA floods its partition (9 msgs); three loners get 1 each
    val msgs = Seq.fill(9)("docA") ++ Seq("docB", "docC", "docD")
    val log = msgs.zipWithIndex
      .map { case (doc, i) => (doc, i.toLong) }.toDF("doc_id", "seq")
    val got = Changelog.partitionSkew(log).collect()
      .map(r => r.getAs[Long]("partition") ->
        ((r.getAs[Long]("n_msgs"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("share_ppm"), r.getAs[Long]("hot_doc_ppm")))).toMap
    // exact expected aggregates from the driver replay
    val byPart = msgs.groupBy(part).map { case (p, ds) =>
      val byDoc = ds.groupBy(identity).view.mapValues(_.size).toMap
      p -> ((ds.size.toLong, byDoc.size.toLong,
        ds.size.toLong * 1000000L / msgs.size,
        byDoc.values.max.toLong * 1000000L / ds.size))
    }
    assert(got == byPart, s"got $got expected $byPart")
    assert(got.values.map(_._1).sum == msgs.size)
    // docA's partition is fully dominated unless a loner shares it
    val pa = got(part("docA"))
    assert(pa._4 >= 9000000L / pa._1, s"$pa")
  }

  test("snapshot diff classifies added/removed/changed between states") {
    import spark.implicits._
    // d1: inserted before A, updated between → CHANGED
    // d2: inserted before A, deleted between → REMOVED
    // d3: inserted between → ADDED
    // d4: inserted before A, untouched between → absent
    // d5: inserted AND deleted between → absent (dead in both)
    val rows = Seq(
      ("d1", 1L, "RECORD_INSERT"), ("d1", 15L, "RECORD_UPDATE"),
      ("d2", 2L, "RECORD_INSERT"), ("d2", 16L, "RECORD_DELETE"),
      ("d3", 17L, "RECORD_INSERT"),
      ("d4", 3L, "RECORD_INSERT"),
      ("d5", 18L, "RECORD_INSERT"), ("d5", 19L, "RECORD_DELETE"))
      .toDF("doc_id", "seq", "op")
    val out = Changelog.snapshotDiff(rows, 10L, 20L).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getAs[Long]("n_between"))).toMap
    assert(out == Map(
      "d1" -> ("CHANGED", 1L), "d2" -> ("REMOVED", 1L), "d3" -> ("ADDED", 1L)))
  }

  test("snapshot diff equals the asof-state full-outer diff on real data") {
    val maxSeq = cl.agg(max("seq")).head().getLong(0)
    val (sA, sB) = (maxSeq / 3, 2 * maxSeq / 3)
    val a = Changelog.stateAsOf(cl, sA).select("doc_id", "last_seq")
    val b = Changelog.stateAsOf(cl, sB).select("doc_id", "last_seq")
    val expected = a.as("a").join(b.as("b"),
        col("a.doc_id") === col("b.doc_id"), "full_outer")
      .filter(col("a.doc_id").isNull || col("b.doc_id").isNull ||
        col("a.last_seq") =!= col("b.last_seq"))
      .select(coalesce(col("a.doc_id"), col("b.doc_id")).as("doc_id"),
        when(col("a.doc_id").isNull, "ADDED")
          .when(col("b.doc_id").isNull, "REMOVED").otherwise("CHANGED").as("change"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val got = Changelog.snapshotDiff(cl, sA, sB)
      .select("doc_id", "change").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("merge is associative: two deltas fold like one") {
    val maxSeq = cl.agg(max("seq")).head().getLong(0)
    val (s1, s2) = (maxSeq / 3, 2 * maxSeq / 3)
    val base = Changelog.compactState(cl.filter(col("seq") <= s1))
    val d1 = cl.filter(col("seq") > s1 && col("seq") <= s2)
    val d2 = cl.filter(col("seq") > s2)
    val twoStep = Changelog.mergeState(Changelog.mergeState(base, d1), d2)
    val oneStep = Changelog.mergeState(base, d1.unionByName(d2))
    assert(canon(twoStep) == canon(oneStep))
  }

  test("disorder audit counts late arrivals and their worst lag") {
    import spark.implicits._
    // seq order 1,2,3 but the middle change's event time regresses 40us
    val log = Seq(
      ("d1", 1L, 1000L, Changelog.Insert, "", "{}", 0.0),
      ("d1", 2L, 960L, Changelog.Update, "firstName", "{}", 0.0),
      ("d1", 3L, 1010L, Changelog.Update, "lastName", "{}", 0.0),
      ("d2", 4L, 500L, Changelog.Insert, "", "{}", 0.0),
      ("d2", 5L, 600L, Changelog.Update, "firstName", "{}", 0.0))
      .toDF("doc_id", "seq", "ts_us", "op", "field_path", "payload", "amount")
    val rows = Changelog.disorderAudit(log).orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(rows == List(
      ("d1", 3L, 50L, 1L, 40L),  // one late row, 40us behind the max
      ("d2", 2L, 100L, 0L, 0L)))
  }

  test("compacted state retains tombstones; live view drops them") {
    val compact = Changelog.compactState(cl)
    val dead = compact.filter(col("last_op") === Changelog.Delete).count()
    assert(dead > 0, "test data should contain deleted docs")
    assert(Changelog.liveState(compact).count() == compact.count() - dead)
    // a tombstone's seq must beat a stale update arriving late
    import spark.implicits._
    val baseRows = Seq(("d1", 10L, Changelog.Delete, "", "{}", 3L))
      .toDF("doc_id", "last_seq", "last_op", "last_field", "last_payload", "n_changes")
    val lateUpdate = Seq(("d1", 5L, Changelog.Update, "firstName", "{\"v\":1}", 0.0))
      .toDF("doc_id", "seq", "op", "field_path", "payload", "amount")
    val merged = Changelog.mergeState(baseRows, lateUpdate)
    assert(Changelog.liveState(merged).count() == 0)
    assert(merged.head().getAs[Long]("n_changes") == 4L)
  }

  test("tombstone GC splits deletes at the seq horizon, keeps live docs out") {
    import spark.implicits._
    // seqs span [1, 101] → horizon (1+101) div 2 = 51.
    // d1: updated then alive; d2: deleted at seq 10 (≤ 51 → eligible);
    // d3: deleted at seq 100 (> 51 → retained); d4: deleted then
    // re-inserted → live
    val cl = Seq(
      ("d1", 1L, Changelog.Insert), ("d1", 101L, Changelog.Update),
      ("d2", 2L, Changelog.Insert), ("d2", 10L, Changelog.Delete),
      ("d3", 3L, Changelog.Insert), ("d3", 100L, Changelog.Delete),
      ("d4", 4L, Changelog.Delete), ("d4", 60L, Changelog.Insert))
      .map { case (d, s, o) => (d, s, s * 1000L, o, "", "{}", 0.0) }
      .toDF("doc_id", "seq", "ts_us", "op", "field_path", "payload", "amount")
    val out = Changelog.tombstoneGc(cl).collect()
      .map(r => r.getAs[String]("status") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_changes"),
          r.getAs[Long]("oldest_seq"), r.getAs[Long]("newest_seq"))).toMap
    assert(out == Map(
      "live" -> (2L, 4L, 60L, 101L),
      "tombstone_gc_eligible" -> (1L, 2L, 10L, 10L),
      "tombstone_retained" -> (1L, 2L, 100L, 100L)), s"got $out")
    // the statuses partition the compacted state exactly
    assert(out.values.map(_._1).sum == Changelog.compactState(cl).count())
  }

  test("watermark plan: exact lateness quantiles size the allowance") {
    import spark.implicits._
    // one op class with 100 updates on one doc: every 10th change's
    // event time regresses, with lags 1s, 2s, ..., 10s — exact
    // basis-point ranks over the 10 late rows are then hand-checkable
    val rows = Seq.newBuilder[(String, Long, Long, String, String, String, Double)]
    rows += (("d1", 0L, 0L, Changelog.Insert, "", "{}", 0.0))
    var t = 0L
    (1 to 100).foreach { i =>
      t += 100000000L // +100s per change
      val ts = if (i % 10 == 0) t - (i / 10) * 1000000L - 100000000L else t
      rows += (("d1", i.toLong, ts, Changelog.Update, "firstName", "{}", 0.0))
    }
    val log = rows.result()
      .toDF("doc_id", "seq", "ts_us", "op", "field_path", "payload", "amount")
    val out = Changelog.watermarkPlan(log).orderBy("op").collect()
      .map(r => r.getAs[String]("op") -> r).toMap
    val u = out(Changelog.Update)
    // each regressed row sits (i/10)·1s behind the prior change at
    // t−100s, so the late-lag population is exactly 1s..10s
    assert(u.getAs[Long]("n_late") == 10L)
    assert(u.getAs[Long]("n_events") == 100L)
    val (p50, p95, p99, mx) = (u.getAs[Long]("p50_lag_us"),
      u.getAs[Long]("p95_lag_us"), u.getAs[Long]("p99_lag_us"),
      u.getAs[Long]("max_lag_us"))
    // rank (n−1)·bp div 10000 over the 10 sorted lags: r4, r8, r8
    val lags = (1 to 10).map(k => k * 1000000L).sorted
    assert(p50 == lags(4) && p95 == lags(8) && p99 == lags(8))
    assert(mx == lags.last)
    assert(u.getAs[Long]("wm_rec_sec") == lags(8) / 1000000L + 1L)
    // the in-order op class reports the zero profile + 1s floor
    val ins = out(Changelog.Insert)
    assert(ins.getAs[Long]("n_late") == 0L)
    assert(ins.getAs[Long]("wm_rec_sec") == 1L)
  }
  test("seq gaps: planted holes, band invariance, gapless is empty") {
    import spark.implicits._
    // seqs 0..9, 15, 16, 40..42: holes of 5 (10..14) and 23 (17..39)
    val seqs = ((0L to 9L) ++ Seq(15L, 16L) ++ (40L to 42L)).toSeq
    val log = seqs.map(s => ("d", s, s, Changelog.Update, "firstName",
      "{}", 0.0))
      .toDF("doc_id", "seq", "ts_us", "op", "field_path", "payload", "amount")
    def hist(bands: Int) = Changelog.seqGaps(log, bands).collect()
      .map(r => (r.getAs[Long]("gap_len"), r.getAs[Long]("n_gaps"),
        r.getAs[Long]("missing_seqs"))).toSet
    val expect = Set((5L, 1L, 5L), (23L, 1L, 23L))
    // 4 bands (width 11): the 23-hole spans EMPTY band 2 entirely --
    // the next-present-band join must bridge it; 1 band = the global
    // window degenerate; 64 bands = mostly singleton bands
    assert(hist(4) == expect, s"got ${hist(4)}")
    assert(hist(1) == expect && hist(64) == expect)
    // a dense topic reports nothing
    val dense = (0L to 20L).map(s => ("d", s, s, Changelog.Update,
      "firstName", "{}", 0.0))
      .toDF("doc_id", "seq", "ts_us", "op", "field_path", "payload", "amount")
    assert(Changelog.seqGaps(dense).collect().isEmpty)
  }

  test("hotDocs: exact top-k per op, heap-rewritten, count ties break by id") {
    import spark.implicits._
    // op U: d1×4, d2×3, d3×3, d4×1 — k=2 keeps d1 and the TIE at 3
    // resolved to the smaller doc_id (d2); op D: a single doc
    val rows =
      Seq.fill(4)(("d1", Changelog.Update)) ++
        Seq.fill(3)(("d2", Changelog.Update)) ++
        Seq.fill(3)(("d3", Changelog.Update)) ++
        Seq(("d4", Changelog.Update), ("d9", Changelog.Delete))
    val log = rows.zipWithIndex.map { case ((d, op), i) =>
      (d, i.toLong, i.toLong, op, "firstName", "{}", 0.0) }
      .toDF("doc_id", "seq", "ts_us", "op", "field_path", "payload", "amount")
    val got = Changelog.hotDocs(log, 2).collect()
      .map(r => (r.getAs[String]("op"), r.getAs[String]("doc_id"),
        r.getAs[Long]("n_changes"), r.getAs[Long]("rk"))).toSet
    assert(got === Set(
      (Changelog.Update, "d1", 4L, 1L), (Changelog.Update, "d2", 3L, 2L),
      (Changelog.Delete, "d9", 1L, 1L)))
    // the plain row_number idiom landed on the bounded-heap operator
    val execs = collectWithSubqueries(
      Changelog.hotDocs(log, 2).queryExecution.executedPlan) {
      case t: graft.plans.TopKPerKeyExec => t
    }
    assert(execs.nonEmpty, "rank-filter rewrite did not fire on hotDocs")
  }

  test("state digest: commutative across sharding, moves on any row change, " +
    "tombstones out") {
    import spark.implicits._
    def log(d2payload: String) = Seq(
      ("d1", 1L, 0L, Changelog.Insert, "", """{"a":1}""", 0.0),
      ("d1", 2L, 1L, Changelog.Update, "firstName", "\"bob\"", 0.0),
      ("d2", 3L, 2L, Changelog.Insert, "", d2payload, 0.0),
      ("d3", 4L, 3L, Changelog.Insert, "", "{}", 0.0),
      ("d3", 5L, 4L, Changelog.Delete, "", "", 0.0))
      .toDF("doc_id", "seq", "ts_us", "op", "field_path", "payload", "amount")
    def digests(df: org.apache.spark.sql.DataFrame) =
      Changelog.stateDigest(df).collect()
        .map(r => r.getAs[String]("last_op") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("digest")))).toMap
    val base = digests(log("{}"))
    // the deleted d3 never contributes: only d1 (Update) + d2 (Insert)
    assert(base.keySet === Set(Changelog.Insert, Changelog.Update))
    assert(base(Changelog.Insert)._1 === 1L && base(Changelog.Update)._1 === 1L)
    // addition commutes: any sharding/arrival order digests identically
    val reshard = digests(log("{}").repartition(7, col("seq")))
    assert(reshard === base)
    // a single changed payload moves ITS op class and only it
    val mutated = digests(log("""{"a":2}"""))
    assert(mutated(Changelog.Update) === base(Changelog.Update))
    assert(mutated(Changelog.Insert) !== base(Changelog.Insert))
  }

  test("redelivery audit: duplicates counted per idempotency key, never per row pair") {
    import spark.implicits._
    // d1: change 10 delivered 3x, change 11 once → 4 deliveries, 2
    // changes, 2 dupes (NOT 3·2/2 pairs); d2: clean; d3: one change
    // delivered twice → 500000 ppm exactly
    val feed = Seq(
      ("d1", 10L), ("d1", 10L), ("d1", 10L), ("d1", 11L),
      ("d2", 20L),
      ("d3", 30L), ("d3", 30L))
      .toDF("doc_id", "seq")
    val got = Changelog.redeliveryAudit(feed).collect()
      .map(r => r.getAs[String]("doc_id") ->
        ((r.getAs[Long]("n_changes"), r.getAs[Long]("n_deliveries"),
          r.getAs[Long]("n_dupes"), r.getAs[Long]("dup_ppm")))).toMap
    assert(got === Map(
      "d1" -> ((2L, 4L, 2L, 500000L)),
      "d2" -> ((1L, 1L, 0L, 0L)),
      "d3" -> ((1L, 2L, 1L, 500000L))), s"$got")
  }

  test("dlq route: the cascade names the FIRST failing check, never throws") {
    import spark.implicits._
    val feed = Seq(
      ("d1", 1L, """{"k": 69}"""),  // clean
      ("d2", 2L, """{"k": 69"""),   // truncated mid-object
      ("d3", 3L, """{"v": 69}"""),  // required key drifted away
      ("d4", 4L, """{"k": "x"}"""), // type regression
      ("d5", 5L, """{"k": -7}"""),  // negative integers are legal
      ("d6", 6L, "not json at all"))
      .toDF("doc_id", "seq", "payload")
    val got = Changelog.dlqRoute(feed).collect()
      .map(r => r.getAs[String]("doc_id") -> r.getAs[String]("reason")).toMap
    assert(got === Map(
      "d1" -> "ok", "d2" -> "not_json", "d3" -> "missing_key",
      "d4" -> "bad_type", "d5" -> "ok", "d6" -> "not_json"), s"$got")
  }

  test("corrupt feed: every record keeps exactly one reason; rules hit by seq") {
    val fed = Changelog.corruptFeed(cl)
    val audit = Changelog.dlqAudit(fed).collect()
      .map(r => r.getAs[String]("reason") -> r.getAs[Long]("n")).toMap
    // the reasons partition the feed — routing drops nothing
    assert(audit.values.sum === cl.count())
    // every corruption class the generator plants is detected
    assert(Set("ok", "not_json", "missing_key", "bad_type")
      .subsetOf(audit.keySet), s"$audit")
    // first-rule-wins: a seq divisible by 13 is truncated, not retyped
    val r13 = Changelog.dlqRoute(fed).filter(col("seq") === 13L * 17L)
      .select("reason").collect().map(_.getString(0))
    assert(r13.forall(_ == "not_json"), r13.mkString(","))
  }

  test("fts fuzzy: near-miss names pair within k, tombstoned postings " +
    "vanish, updates move the term, postings count per field") {
    import spark.implicits._
    val rows = Seq(
      // u1/u2: inserted names one edit apart
      ("u1", 1L, "RECORD_INSERT", "", "john"),
      ("u2", 2L, "RECORD_INSERT", "", "jon"),
      // u3: inserted as jane, firstName later updated to joan — the
      // OLD term must be gone from firstName, jane stays in lastName
      ("u3", 3L, "RECORD_INSERT", "", "jane"),
      ("u3", 10L, "RECORD_UPDATE", "firstName", "joan"),
      // u4: far from everything at k=2
      ("u4", 4L, "RECORD_INSERT", "", "banana"),
      // u5: a near-miss of john whose doc is deleted — no pair may
      // surface from a tombstoned posting
      ("u5", 5L, "RECORD_INSERT", "", "johm"),
      ("u5", 20L, "RECORD_DELETE", "", null),
      // u6: duplicate of u2's name — one dictionary row, n_docs 2
      ("u6", 6L, "RECORD_INSERT", "", "jon"))
      .toDF("doc_id", "seq", "op", "field_path", "payload")
    val got = Changelog.ftsFuzzy(rows, k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getAs[Long]("dist"),
          r.getAs[Long]("n_docs_a"), r.getAs[Long]("n_docs_b")))).toMap
    assert(got === Map(
      ("firstName", "joan", "john") -> ((1L, 1L, 1L)),
      ("firstName", "joan", "jon") -> ((1L, 1L, 2L)),
      ("firstName", "john", "jon") -> ((1L, 1L, 2L)),
      // jane–john is distance 3 — outside k, must be absent
      ("lastName", "jane", "jon") -> ((2L, 1L, 2L)),
      ("lastName", "john", "jon") -> ((1L, 1L, 2L))), s"$got")
  }

  test("soundex key reproduces the classic published values, " +
    "including the H/W-transparent and vowel-separator rules") {
    import spark.implicits._
    val got = Seq("Smith", "Smyth", "Robert", "Rupert", "Ashcraft",
      "Tymczak", "Pfister", "Honeyman", "Hwang", "Williams", "Ahmed",
      "x", "42", "")
      .toDF("t")
      .select(col("t"), Changelog.soundexKey(col("t")).as("k"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got === Map(
      "Smith" -> Some("S530"), "Smyth" -> Some("S530"),
      "Robert" -> Some("R163"), "Rupert" -> Some("R163"),
      // S,C across the transparent H collapse to one 2
      "Ashcraft" -> Some("A261"),
      // C,Z across the separator vowel A are BOTH kept
      "Tymczak" -> Some("T522"),
      // leading same-code run P,F collapses into the letter slot
      "Pfister" -> Some("P236"),
      "Honeyman" -> Some("H555"), "Hwang" -> Some("H520"),
      "Williams" -> Some("W452"), "Ahmed" -> Some("A530"),
      "x" -> Some("X000"),
      // letterless terms key to null (filtered from the index)
      "42" -> None, "" -> None), s"$got")
  }

  test("fts phonetic: homophones pair on the shared key, tombstoned " +
    "postings vanish, cross-field names never pair") {
    import spark.implicits._
    val rows = Seq(
      ("u1", 1L, "RECORD_INSERT", "", "Smith"),
      ("u2", 2L, "RECORD_INSERT", "", "Smyth"),
      // u3: firstName updated AWAY from a homophone — old term gone
      ("u3", 3L, "RECORD_INSERT", "", "Smijth"),
      ("u3", 10L, "RECORD_UPDATE", "firstName", "Robert"),
      // u4: Rupert pairs with Robert on R163 in firstName only after
      // u3's update put Robert there
      ("u4", 4L, "RECORD_INSERT", "", "Rupert"),
      // u5: a homophone whose doc is tombstoned — no pair survives
      ("u5", 5L, "RECORD_INSERT", "", "Smythe"),
      ("u5", 20L, "RECORD_DELETE", "", null))
      .toDF("doc_id", "seq", "op", "field_path", "payload")
    val got = Changelog.ftsPhonetic(rows).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    // u3's lastName stays Smijth, which keys S523 (M,I,J,T →
    // 5,0,2,3 — the J code splits it from S530), so the lastName
    // bucket pairs exactly Smith/Smyth
    assert(got === Set(
      ("firstName", "R163", "Robert", "Rupert"),
      ("firstName", "S530", "Smith", "Smyth"),
      ("lastName", "S530", "Smith", "Smyth")), s"$got")
  }
}
