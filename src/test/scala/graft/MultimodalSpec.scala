package graft

import graft.mm.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table: binary payload with typed metadata") {
    val media = Multimodal.attach(Tables.documents(spark, sf))
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("media_type").dataType.typeName == "string")
    val row = media.filter("doc_id = 3").collect()(0)
    assert(row.getAs[String]("media_type") == "image")
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("batched decode produces deterministic features") {
    val feats = Multimodal.featureFrame(spark, Tables.documents(spark, sf))
    val rows = feats.collect()
    assert(rows.length == 500)
    val r = feats.filter("doc_id = 0").collect()(0)
    // doc 0 text starts with "the ..." → first byte 't' = 116
    assert(r.getAs[Int]("first_byte") == 116)
    assert(r.getAs[Long]("payload_len") > 0)
    assert(r.getAs[Long]("checksum") >= 0 && r.getAs[Long]("checksum") < 997)
    // mean byte of ascii text is within byte range
    assert(r.getAs[Double]("mean_byte") > 32 && r.getAs[Double]("mean_byte") < 127)
  }

  test("batch kernel sees full batches up to BatchSize") {
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val rows = (0 until 150).map(i =>
      Multimodal.MediaRow(i.toLong, "image", Array[Byte](1, 2, 3), 4, 4))
    rows.grouped(Multimodal.StubKernel.BatchSize).foreach(b => sizes += b.size)
    assert(sizes.toSeq == Seq(64, 64, 22))
  }

  test("binary dedup groups identical payloads and keeps the lowest id") {
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, sf)
    // duplicate every payload under shifted ids (same media_type mod 3:
    // +3000 keeps doc_id % 3, so copies land in the same type bucket)
    val doubled = base.unionByName(
      base.withColumn("doc_id", col("doc_id") + lit(3000L)))
    val out = Multimodal.binaryDedup(doubled).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_copies") >= 2) // every payload duplicated
      assert(r.getAs[Long]("keep_doc_id") < 3000L) // original wins
    }
    val total = out.map(_.getAs[Long]("n_copies")).sum
    assert(total == doubled.count())
  }

  test("frame sampling emits n_frames rows per video with in-bounds offsets") {
    val frames = Multimodal.frameSample(Tables.documents(spark, sf)).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (doc, rows) =>
      assert(doc % 3 == 2) // videos only
      val n = rows.head.getAs[Long]("n_frames")
      assert(rows.length == n)
      assert(rows.map(_.getAs[Long]("frame_idx")).sorted.toSeq == (0L until n))
      assert(rows.map(_.getAs[String]("frame_fp")).distinct.length == rows.length)
    }
  }

  test("byte-shingle near-dup catches a patched payload that exact dedup misses") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again padding"
    val docs = Seq(
      (1L, a),
      (2L, a + " x"),                       // small byte patch: near-dup
      (3L, "completely different content with nothing shared at all here")
    ).toDF("doc_id", "text")
    val near = Multimodal.binaryNearDup(docs, tau = 0.5,
      docFilter = org.apache.spark.sql.functions.lit(true))
      .collect()
    assert(near.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet == Set((1L, 2L)))
    assert(near.head.getAs[Double]("jaccard") > 0.8)
    // exact binary dedup sees three distinct payloads
    val exact = Multimodal.binaryDedup(docs)
    assert(exact.count() == 3)
  }

  test("byte-shingle near-dup drops sub-window payloads instead of pairing them") {
    import spark.implicits._
    // payloads under one full 8-byte window (incl. empty) used to get
    // a single truncated shingle and pair with each other at 1.0
    val docs = Seq(
      (1L, ""), (2L, ""), (3L, "abc"), (4L, "abc"),
      (5L, "the quick brown fox jumps over the lazy dog again and again pad"),
      (6L, "the quick brown fox jumps over the lazy dog again and again pad")
    ).toDF("doc_id", "text")
    val near = Multimodal.binaryNearDup(docs, tau = 0.5,
      docFilter = org.apache.spark.sql.functions.lit(true))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(near == Set((5L, 6L)), s"got $near")
  }

  test("phash: identical payloads pair at hamming 0, k flipped slices " +
    "read hamming k, past-radius pairs are cut, short payloads drop") {
    import spark.implicits._
    // 64 slices × 2 ASCII chars: '~' (126) slices sit far above the
    // payload mean, ' ' (32) far below — flipping a slice flips
    // exactly its signature bit (the mean shift can never flip a
    // neighbor's verdict at this contrast)
    def payload(flips: Set[Int]): String =
      (0 until 64).map { i =>
        val hi = (i % 2 == 0) ^ flips.contains(i)
        if (hi) "~~" else "  "
      }.mkString
    val docs = Seq(
      (1L, payload(Set.empty)),
      (2L, payload(Set.empty)),          // identical → hamming 0
      (3L, payload(Set(0, 20, 40))),     // 3 flips → hamming 3 (kept)
      (4L, payload(Set(1, 17, 33, 49))), // 4 flips spread over all 4 bands → cut
      (5L, "short")                      // < 64 bytes → excluded
    ).toDF("doc_id", "text")
    val got = Multimodal.phashPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(got.get((1L, 2L)).contains(0L), s"$got")
    assert(got.get((1L, 3L)).contains(3L), s"$got")
    assert(got.get((2L, 3L)).contains(3L), s"$got")
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L), s"$got")
    assert(!got.keySet.exists(p => p._1 == 5L || p._2 == 5L), s"$got")
    // banding losslessness at the radius: a hamming-3 pair flipping
    // bits in THREE different bands still collides in the fourth
    val spread = Seq((1L, payload(Set.empty)),
      (2L, payload(Set(0, 16, 32)))).toDF("doc_id", "text")
    val sp = Multimodal.phashPairs(spread).collect()
    assert(sp.length == 1 && sp.head.getAs[Long]("hamming") == 3L)
  }

  test("phash hamming histogram reconciles with the pair query at the " +
    "radius, and a band-0 cross-sign collision is not lost") {
    import spark.implicits._
    def payload(flips: Set[Int]): String =
      (0 until 64).map { i =>
        val hi = (i % 2 == 0) ^ flips.contains(i)
        if (hi) "~~" else "  "
      }.mkString
    // A carries bit 63 (signed-negative signature), B does not; they
    // share ONLY band 0 (bits 0–15) — the exact collision a
    // `% 65536` band value loses to Spark's sign-keeping remainder
    // (bands 1–3 all differ, so nothing else recruits the pair)
    val docs = Seq(
      (1L, payload(Set(63))),
      (2L, payload(Set(17, 33, 49))),
      (3L, payload(Set.empty)),
      (4L, payload(Set.empty))).toDF("doc_id", "text")
    val hist = Multimodal.phashHammingHist(docs).collect()
      .map(r => r.getAs[Long]("hamming") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Boolean]("within_radius"))))
      .toMap
    // the cross-sign pair (1,2) has hamming 4 — present iff band 0
    // collided; (3,4) identical at 0; (1,3)/(1,4) hamming 1,
    // (2,3)/(2,4) hamming 3
    assert(hist.get(4L).exists(_._1 >= 1L), s"cross-sign pair lost: $hist")
    assert(hist(0L) == ((1L, true)) && hist(1L) == ((2L, true)) &&
      hist(3L) == ((2L, true)), s"$hist")
    assert(hist(4L)._2 == false)
    // the ≤radius slice reconciles exactly with the pair query
    val pairCount = Multimodal.phashPairs(docs).count()
    assert(hist.filter(_._2._2).values.map(_._1).sum == pairCount)
  }

  test("byte histogram: nibble counts, every nibble present per type, " +
    "exact ppm shares") {
    import spark.implicits._
    // doc 3 → image ('!' = 0x21 → nibble 2); doc 4 → audio mixing
    // 'A' (0x41 → 4) and 'a' (0x61 → 6)
    val docs = Seq((3L, "!!!!"), (4L, "AAab")).toDF("doc_id", "text")
    val got = Multimodal.byteHistogram(docs).collect()
      .map(r => (r.getAs[String]("media_type"), r.getAs[Long]("nibble")) ->
        ((r.getAs[Long]("n_bytes"),
          Option(r.getAs[java.lang.Long]("share_ppm")).map(_.toLong))))
      .toMap
    assert(got.size == 32) // 2 types × all 16 nibbles, zeros included
    assert(got(("image", 2L)) == ((4L, Some(1000000L))), s"$got")
    assert(got(("image", 6L)) == ((0L, Some(0L))), s"$got")
    assert(got(("audio", 4L)) == ((2L, Some(500000L))), s"$got")
    assert(got(("audio", 6L)) == ((2L, Some(500000L))), s"$got")
  }

  test("entropy audit flags uniform payloads low and diverse payloads high") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc_ids ≡ 0 mod 3 → all land in 'image': one single-byte
    // payload (entropy 0), one with 64 distinct bytes (entropy 6.0)
    val diverse = (32 until 96).map(_.toChar).mkString
    val docs = Seq((3L, "aaaaaaaa"), (6L, diverse)).toDF("doc_id", "text")
    val r = Multimodal.entropyAudit(docs).collect()
    assert(r.length == 1 && r.head.getAs[String]("media_type") == "image")
    val row = r.head
    assert(row.getAs[Long]("n_items") == 2L)
    assert(row.getAs[Double]("min_entropy") == 0.0)
    assert(row.getAs[Double]("max_entropy") == 6.0)
    assert(row.getAs[Long]("n_high") == 1L)
    // the binary kernel is the text kernel on the same bytes
    val parity = Tables.documents(spark, sf).limit(50)
      .select(
        round(graft.functions.expressions.bin_entropy(encode(col("text"), "UTF-8")), 4).as("b"),
        round(graft.functions.expressions.byte_entropy(col("text")), 4).as("t"))
      .filter(col("b") =!= col("t")).count()
    assert(parity == 0L)
  }

  test("integrity audit: empty payloads counted, digest moves on one byte") {
    import spark.implicits._
    def docs(t3: String) = Seq(
      (0L, "alpha", "en", "s1", 5L),   // image
      (3L, "", "en", "s1", 0L),        // image, EMPTY payload
      (1L, "beta", "en", "s1", 4L),    // audio
      (2L, t3, "en", "s1", 5L))        // video
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = Multimodal.integrityAudit(docs("gamma")).collect()
      .map(r => r.getAs[String]("media_type") ->
        ((r.getAs[Long]("n_items"), r.getAs[Long]("n_empty"),
          r.getAs[Long]("total_bytes"), r.getAs[Long]("digest")))).toMap
    assert(base("image")._1 === 2L && base("image")._2 === 1L)
    assert(base("image")._3 === 5L) // the empty payload adds 0 bytes
    assert(base("audio") === ((1L, 0L, 4L, base("audio")._4)))
    // one changed byte in one payload moves ITS type's digest only
    val mut = Multimodal.integrityAudit(docs("gamm0")).collect()
      .map(r => r.getAs[String]("media_type") ->
        r.getAs[Long]("digest")).toMap
    assert(mut("video") !== base("video")._4)
    assert(mut("image") === base("image")._4)
  }

  test("format sniff: magic beats metadata — stamped blobs classify by bytes, " +
    "an unstamped RIFF-leading payload still reads riff") {
    import spark.implicits._
    val docs = Seq(
      (0L, "hello world"),       // jpeg stamp, declared image
      (1L, "hello"),             // png stamp, declared audio
      (2L, "x"),                 // gif stamp, declared video
      (3L, "y"),                 // riff stamp, declared image
      (4L, "plain"),             // unstamped → unknown, declared audio
      (9L, "RIFF wave bytes"))   // unstamped but the CONTENT is riff
      .toDF("doc_id", "text")
    val got = Multimodal.formatSniff(docs).collect()
      .map(r => (r.getAs[String]("media_type"), r.getAs[String]("sniffed")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("type_total"),
          r.getAs[Long]("share_ppm")))).toMap
    assert(got === Map(
      ("image", "jpeg") -> ((1L, 3L, 333333L)),
      ("image", "riff") -> ((2L, 3L, 666666L)),
      ("audio", "png") -> ((1L, 2L, 500000L)),
      ("audio", "unknown") -> ((1L, 2L, 500000L)),
      ("video", "gif") -> ((1L, 1L, 1000000L))), s"$got")
  }

  test("scene cuts: planted byte step cuts once, single-frame video " +
    "emits null deltas, sub-frame payloads drop") {
    import spark.implicits._
    // doc_id ≡ 2 (mod 3) → video. len 15 → n_frames 8, flen 1: the
    // first 8 bytes are the frames — one a→z step, delta 981 bp
    val docs = Seq(
      (2L, "aaaazzzzaaaaaaa"),  // frames a,a,a,a,z,z,z,z → one cut
      (5L, "aaaaaaaa"),         // len 8 → 1 frame: no deltas at all
      (8L, "zz"))               // len 2 → n_frames 3, flen 0: dropped
      .toDF("doc_id", "text")
    val got = Multimodal.sceneCuts(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_frames"), r.getAs[Long]("n_cuts"),
          Option(r.getAs[java.lang.Long]("max_delta_bp")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("avg_delta_bp")).map(_.toLong))))
      .toMap
    // a=0x61: 97·10⁴ div 255 = 3803; z=0x7A: 122·10⁴ div 255 = 4784
    assert(got === Map(
      2L -> ((8L, 1L, Some(981L), Some(981L / 7))),
      5L -> ((1L, 0L, None, None))), s"$got")
  }

  test("scene cuts: multi-MB payload stresses the byte-fold kernel " +
    "(no per-frame index-array materialization)") {
    import spark.implicits._
    // 4 MB + 6 → video (doc_id ≡ 2 mod 3), n_frames = len % 8 + 1 = 7,
    // flen ≈ 599k: the r14 HOF built a flen-element Int array per
    // frame; the kernel folds the bytes directly. Content: frame-
    // aligned blocks of 'a' and 'z' so expected means are closed-form.
    val len = 4 * 1024 * 1024 + 6
    val nFrames = len % 8 + 1 // 7
    val flen = len / nFrames
    val sb = new StringBuilder(len)
    (0 until len).foreach(i => sb.append(if ((i / flen) % 2 == 0) 'a' else 'z'))
    val got = Multimodal.sceneCuts(Seq((2L, sb.toString)).toDF("doc_id", "text"))
      .collect()
    assert(got.length == 1)
    val r = got.head
    // a=0x61 → 3803 bp, z=0x7A → 4784 bp; frames alternate ⇒ every
    // adjacent delta is 981 bp ⇒ 6 cuts at the 150 bp threshold
    assert(r.getAs[Long]("n_frames") == nFrames)
    assert(r.getAs[Long]("n_cuts") == (nFrames - 1).toLong, r.toString)
    assert(r.getAs[Long]("max_delta_bp") == 981L)
    assert(r.getAs[Long]("avg_delta_bp") == 981L)
  }

  test("scene cuts run unchanged on a live stream (zero-shuffle " +
    "projection is streaming-legal by construction)") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val rows = Seq((2L, "aaaazzzzaaaaaaa"), (5L, "aaaaaaaa"),
      (8L, "zz"), (11L, "mmmmmmmmmmmmmmmmmmmmmmm"))
    val batch = Multimodal.sceneCuts(rows.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = Multimodal.sceneCuts(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cuts")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      input.addData(rows.take(2)); input.addData(rows.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM cuts").collect()
      .map(_.toSeq).toSet
    assert(streamed === batch && batch.nonEmpty)
  }
}
