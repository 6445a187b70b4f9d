package graft

import graft.ops.Sampling

class SamplingSpec extends SparkSpec {

  test("temperature mixing flattens the source distribution") {
    import spark.implicits._
    // 90/10 skew: α=0.5 should boost the small source and shave the big
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++
      (91 to 100).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val out = Sampling.temperatureMix(docs, alpha = 0.5).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("raw_share"), r.getAs[Double]("temp_share"),
          r.getAs[Double]("boost"))).toMap
    val (bigRaw, bigTemp, bigBoost) = out("big")
    val (smallRaw, smallTemp, smallBoost) = out("small")
    assert(bigRaw == 0.9 && smallRaw == 0.1)
    assert(smallTemp > smallRaw && bigTemp < bigRaw) // flattened
    assert(smallBoost > 1.0 && bigBoost < 1.0)
    assert(math.abs(bigTemp + smallTemp - 1.0) < 1e-3) // still a distribution
  }

  test("leakage-safe split never separates a near-duplicate pair") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val split = Sampling.leakageSafeSplit(docs)
    val byDoc = split.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("keep_doc_id"), r.getAs[String]("split"))).toMap
    assert(byDoc.size == docs.count())
    // both splits are populated and keeper-hash determines membership
    assert(byDoc.values.map(_._2).toSet == Set("train", "val"))
    byDoc.foreach { case (_, (keeper, s)) =>
      assert(s == byDoc(keeper)._2, s"doc and its keeper split apart") }
    // every verified near-dup pair lands on one side of the boundary
    val pairs = graft.dedup.Dedup.minhashLsh(docs, 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(byDoc(a)._2 == byDoc(b)._2, s"pair ($a,$b) straddles the split") }
  }

  test("fixed-size sample returns exactly the n smallest-hash rows") {
    import org.apache.spark.sql.functions.{col, md5}
    val docs = Tables.documents(spark, sf)
    val got = Sampling.fixedSizeSample(docs, 20).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val expected = docs
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .collect().sortBy(_.getAs[String]("h")).take(20)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected && got.size == 20)
  }

  test("temperature apply boosts small sources and realizes its own rates") {
    import spark.implicits._
    val docs = ((1 to 900).map(i => (i.toLong, "big")) ++
      (901 to 1000).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val out = Sampling.temperatureApply(docs).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    val rate = bySource.view.mapValues(_.head.getAs[Int]("rate16")).toMap
    // α=0.5 flattening: the small source keeps a larger fraction
    assert(rate("small") > rate("big"))
    // the realized keep fraction tracks the declared rate16/16 —
    // md5 nibbles are uniform, so allow sampling noise
    bySource.foreach { case (src, rows) =>
      val kept = rows.count(_.getAs[Boolean]("kept")).toDouble / rows.length
      assert(math.abs(kept - rate(src) / 16.0) < 0.11,
        s"$src realized $kept vs declared ${rate(src) / 16.0}")
    }
  }

  test("per-stratum fixed-n keeps exactly n smallest-hash rows per source") {
    val n = 3
    val docs = Tables.documents(spark, sf)
    val out = Sampling.fixedPerStratum(docs, n).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    val sources = docs.select("source").distinct().count()
    assert(bySource.size == sources)
    bySource.foreach { case (src, rows) =>
      assert(rows.length == n, s"$src: ${rows.length} rows")
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to n).toSeq)
      // the kept rows really are the stratum's n smallest hashes
      val cutoff = rows.map(_.getAs[String]("h")).max
      val below = docs.filter(org.apache.spark.sql.functions.col("source") === src)
        .select(org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("doc_id").cast("string")).as("h"))
        .filter(org.apache.spark.sql.functions.col("h") < cutoff).count()
      assert(below < n, s"$src: $below hashes below the kept cutoff")
    }
    // deterministic: a second run returns the identical frame
    val again = Sampling.fixedPerStratum(docs, n).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("leak audit reports zero cross-split pairs for the keeper split") {
    val docs = Tables.documents(spark, sf)
    val r = Sampling.leakAudit(docs).collect().head
    val nPairs = graft.dedup.Dedup.minhashLsh(docs, 0.9).count()
    assert(r.getAs[Long]("n_pairs") == nPairs && nPairs > 0)
    // the whole point of splitting on the keeper id
    assert(r.getAs[Long]("n_cross_split") == 0L)
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_val") == docs.count())
  }

  test("leak audit fires on a split that ignores near-dup structure") {
    // positive control: iters=0 degenerates the keeper to the doc
    // itself (a plain per-doc hash split), so near-dup pairs land in
    // different splits and the audit must catch at least one
    val r = Sampling.leakAudit(Tables.documents(spark, sf), iters = 0)
      .collect().head
    assert(r.getAs[Long]("n_cross_split") > 0L,
      "audit failed to flag a leaky split")
  }

  test("temperature shares sum to one on real data") {
    val rows = Sampling.temperatureMix(Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("temp_share")).sum - 1.0) < 1e-2)
    assert(math.abs(rows.map(_.getAs[Double]("raw_share")).sum - 1.0) < 1e-2)
  }

  test("soft dedup keeps every unique doc and thins a duplicate family to ~1") {
    import spark.implicits._
    // one 20-copy template family (docs 1-20) + 30 unique docs
    val famText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = ((1 to 20).map(i => (i.toLong, famText)) ++
      (21 to 50).map(i => (i.toLong,
        s"unique$i words body$i content$i tail$i extra$i more$i pad$i end$i fin$i")))
      .toDF("doc_id", "text")
    val out = Sampling.softDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_size"), r.getAs[Boolean]("soft_kept"))).toMap
    assert(out.size == 50)
    // singletons always survive (probability 1)
    (21 to 50).foreach { i =>
      assert(out(i.toLong) == ((1L, true)), s"unique doc $i dropped") }
    // the family: size 20 everywhere, and the keep flag is exactly the
    // md5 two-nibble threshold h256 * 20 < 256 (pure-function replay)
    def h256(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((d(0) & 0xff))
    }
    (1 to 20).foreach { i =>
      val (sz, kept) = out(i.toLong)
      assert(sz == 20L, s"doc $i cluster_size $sz")
      assert(kept == (h256(i.toLong) * 20 < 256), s"doc $i keep flag") }
    // expected survivors of a 20-family: ceil(256/20)/256 of 20 docs ~ 1
    val survivors = (1 to 20).count(i => out(i.toLong)._2)
    assert(survivors >= 0 && survivors <= 4, s"$survivors survivors of 20")
  }

  test("pca strata sample takes the n smallest hashes of each band") {
    import org.apache.spark.sql.functions.{col, md5}
    val emb = Tables.embeddings(spark, sf)
    val n = 5
    val out = Sampling.pcaStrataSample(emb, n)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val byBand = rows.groupBy(_.getAs[Long]("band"))
    byBand.foreach { case (band, rs) =>
      assert(band >= -4L && band <= 4L)
      assert(rs.length <= n, s"band $band has ${rs.length} rows")
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq ==
        (1 to rs.length).map(_.toLong))
      // rk order matches the h order within the band
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[String]("h")).toSeq ==
        rs.map(_.getAs[String]("h")).sorted.toSeq)
    }
    // every selected row's hash is among its band's n smallest: replay
    // the banding from the fitted model and compare cutoffs
    val model = graft.sim.Similarity.pcaFitModel(emb)
    val banded = graft.sim.Similarity.pcaApply(emb, model)
      .select(col("vec_id"),
        org.apache.spark.sql.functions.greatest(
          org.apache.spark.sql.functions.lit(-4L),
          org.apache.spark.sql.functions.least(
            org.apache.spark.sql.functions.lit(4L),
            org.apache.spark.sql.functions.floor(col("proj") / 0.05)))
          .as("band"),
        md5(col("vec_id").cast("string")).as("h"))
      .collect()
    val expect = banded.groupBy(_.getAs[Long]("band")).map { case (b, rs) =>
      b -> rs.map(_.getAs[String]("h")).sorted.take(n).toSet }
    byBand.foreach { case (band, rs) =>
      assert(rs.map(_.getAs[String]("h")).toSet == expect(band),
        s"band $band selection mismatch") }
  }

  test("k-fold never splits a near-duplicate cluster across folds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two exact-duplicate families + uniques: family members must
    // share their keeper's fold
    val base = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, base), (2L, base), (3L, base),
      (10L, base.replace("dog", "cat")), (11L, base.replace("dog", "cat")),
      (20L, "an entirely different single document about spark internals"))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    val model = graft.dedup.Dedup.fitKeepers(docs, tau = 0.9)
    val folds = Sampling.kFold(model, k = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("keep_doc_id"),
        r.getAs[Int]("fold")))
    assert(folds.length == 6)
    folds.groupBy(_._2).values.foreach { members =>
      assert(members.map(_._3).toSet.size == 1,
        s"cluster straddles folds: ${members.toSeq}") }
    // fold is the shard hash of the keeper id — one definition
    folds.foreach { case (_, keeper, fold) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(keeper.toString.getBytes("UTF-8"))
      assert(fold == ((d(0) & 0xff) % 4)) }
    intercept[IllegalArgumentException](Sampling.kFold(model, k = 3))
  }

  test("shard assignment is the md5 byte mod n and audit covers every doc") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val audit = Sampling.shardAudit(docs, 8).collect()
    assert(audit.map(_.getAs[Long]("n_docs")).sum == n)
    assert(audit.length == 8, "every shard populated at corpus scale")
    // mixing: no shard is dominated by a single source
    audit.foreach(r => assert(r.getAs[Double]("top_source_share") < 0.9))
    // replay one row's assignment by hand
    val row = docs.select(col("doc_id"),
      Sampling.shardId(col("doc_id"), 8).as("shard")).head()
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(row.getAs[Long]("doc_id").toString.getBytes("UTF-8"))
    assert(row.getAs[Int]("shard") == ((hex(0) & 0xff) % 8))
    intercept[IllegalArgumentException](Sampling.shardId(col("doc_id"), 7))
  }

  test("training-shard writer partitions by assignment with in-shard hash order") {
    import org.apache.spark.sql.functions._
    val dir = s"/tmp/graft-test-shards-${java.util.UUID.randomUUID()}"
    val docs = Tables.documents(spark, sf)
    graft.ops.Layout.writeTrainingShards(docs, "doc_id", dir, 4)
    val back = spark.read.parquet(dir)
    // lossless: every doc lands in exactly its assigned shard
    assert(back.count() == docs.count())
    val misplaced = back.filter(
      col("shard") =!= Sampling.shardId(col("doc_id"), 4)).count()
    assert(misplaced == 0L)
    // in-shard order is the md5 order: a sequential reader sees the
    // hash interleave, never a source's rows back to back
    val shard0 = spark.read.parquet(s"$dir/shard=0")
      .select(md5(col("doc_id").cast("string")).as("h")).collect()
      .map(_.getString(0))
    assert(shard0.sameElements(shard0.sorted), "shard 0 not in hash order")
  }

  test("curriculum phases match the window-rank NTILE boundaries exactly") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    // reference: the per-source window-rank formulation the operator
    // deliberately avoids at scale — must agree row for row
    val w = Window.partitionBy("source").orderBy("len", "doc_id")
    val ref = docs
      .select(col("source"), col("doc_id"),
        length(col("text")).cast("long").as("len"))
      .withColumn("rk", row_number().over(w).cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("phase", expr("(rk * 10 + 9) div n"))
      .groupBy("source", "phase")
      .agg(count(lit(1)).as("n_docs"), min("len").as("min_len"),
        max("len").as("max_len"), round(avg("len"), 4).as("avg_len"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("phase")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("min_len"),
          r.getAs[Long]("max_len"), r.getAs[Double]("avg_len")))).toMap
    val got = Sampling.curriculum(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("phase")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("min_len"),
          r.getAs[Long]("max_len"), r.getAs[Double]("avg_len")))).toMap
    assert(got == ref, s"got $got\nref $ref")
    // phases partition each source: counts sum to the corpus, and
    // populations per source differ by at most 1 (NTILE-equal)
    val bySource = got.toSeq.groupBy(_._1._1)
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    bySource.foreach { case (src, phs) =>
      assert(phs.map(_._2._1).sum == totals(src), src)
      val sizes = phs.map(_._2._1)
      assert(sizes.max - sizes.min <= 1, s"$src sizes $sizes")
    }
    // a tiny corpus (n < phases) still covers every doc, dup ranks
    // skipping phases by design
    import spark.implicits._
    val tiny = Seq((1L, "s", "aa"), (2L, "s", "bbbb"), (3L, "s", "c"))
      .toDF("doc_id", "source", "text")
    val t = Sampling.curriculum(tiny, phases = 10).collect()
    assert(t.map(_.getAs[Long]("n_docs")).sum == 3L)
  }

  test("systematic sample: hand-computed tickets, multiplicity, zero-weight") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // weights 4,0,10,2,4 in id order → W=20, n=4 → step=5, tickets
    // 0,5,10,15. intervals: d1 [0,4) ⊃ {0}; d2 empty; d3 [4,14) ⊃
    // {5,10}; d4 [14,16) ⊃ {15}; d5 [16,20) ⊃ {} — heavy doc picked
    // twice, zero-weight never, ticket 15 lands in the 2-char doc
    val docs = Seq(
      (1L, "s", "aaaa"), (2L, "s", ""), (3L, "s", "bbbbbbbbbb"),
      (4L, "s", "cc"), (5L, "s", "dddd")).toDF("doc_id", "source", "text")
    val got = Sampling.systematic(docs, 4).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_picks"))).toList
    assert(got == List((1L, 1L), (3L, 2L), (4L, 1L)), s"got $got")
    // total picks always equal n when W >= n
    assert(got.map(_._2).sum == 4L)
  }

  test("systematic sample: band-count invariance and W < n floor") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
    def key(bands: Int): Map[Long, Long] =
      Sampling.systematic(docs, 50, bands).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_picks")).toMap
    // the banded prefix is the same integer line at any band count —
    // including the degenerate single band (one global cumsum)
    val b64 = key(64)
    assert(b64 == key(1) && b64 == key(7))
    assert(b64.values.sum == 50L)
    // W < n: step floors at 1 — every weighted unit is a ticket, so
    // each doc is picked weight times (until tickets run out)
    val tiny = Seq((10L, "s", "ab"), (20L, "s", "c"))
      .toDF("doc_id", "source", "text")
    val t = Sampling.systematic(tiny, 10).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_picks"))).toList
    assert(t == List((10L, 2L), (20L, 1L)), s"got $t")
  }

  test("pps sample: smallest u/w priorities, zero-weight excluded, " +
      "matches the window reference") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val got = Sampling.ppsSample(docs, 10).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("priority"))).toSet
    // window reference with an rn-reading guard so the optimizer
    // rule keeps the plain window plan
    val pr = expr("CAST(conv(substring(md5(cast(doc_id as string)), 1, " +
      "15), 16, 10) AS BIGINT)").cast("double") /
      length(col("text")).cast("double")
    val ref = docs.filter(length(col("text")) > 0)
      .select(col("source"), col("doc_id"), pr.as("priority"))
      .withColumn("rk", row_number().over(Window.partitionBy("source")
        .orderBy(col("priority"), col("doc_id"))))
      .filter(col("rk") <= 10 && col("rk") % 1 === 0)
      .drop("rk").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("priority"))).toSet
    assert(got == ref && got.nonEmpty)
    // every source contributes exactly min(n, population) rows
    val perSrc = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perSrc.values.forall(_ == 10), s"$perSrc")
    // zero-weight docs can never be drawn
    import spark.implicits._
    val withEmpty = Seq((1L, "s", ""), (2L, "s", "abc"), (3L, "s", "d"))
      .toDF("doc_id", "source", "text")
    val drawn = Sampling.ppsSample(withEmpty, 5).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(drawn == Set(2L, 3L))
  }

  test("epochs plan: hand-computed shares, targets, and the over-cap flag") {
    import spark.implicits._
    def doc(id: Long, src: String, len: Int) = (id, src, "x" * len)
    // chars 100 vs 400 → sqrt weights 10, 20 → shares 1/3, 2/3
    val even = Seq(doc(1, "a", 100), doc(2, "b", 400))
      .toDF("doc_id", "source", "text")
    val got = Sampling.epochsPlan(even).orderBy("source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("share_ppm"),
        r.getAs[Long]("target_chars"), r.getAs[Double]("epochs"),
        r.getAs[Boolean]("over_cap"))).toList
    // 333333·500·100 div 1e8 = 166; 666667·500·100 div 1e8 = 333
    assert(got == List(("a", 333333L, 166L, 1.66, false),
      ("b", 666667L, 333L, 0.8325, false)), s"got $got")
    // a tiny source under sqrt temperature gets boosted into repeat
    // territory: the flag is the point of the readout
    val skewed = Seq(doc(1, "tiny", 4), doc(2, "big", 10000))
      .toDF("doc_id", "source", "text")
    val caps = Sampling.epochsPlan(skewed).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("epochs"), r.getAs[Boolean]("over_cap")))).toMap
    assert(caps("tiny")._2 && caps("tiny")._1 > 4.0, s"$caps")
    assert(!caps("big")._2)
  }

  test("token budget: greedy whole-doc prefixes, zero-row source, band invariance") {
    import spark.implicits._
    def doc(id: Long, src: String, words: Int) =
      (id, src, Seq.fill(words)("w").mkString(" "))
    // corpus: 40 tokens total → multiplePpm 500000 gives budget 20,
    // 3 sources → alloc 6 each. s1 docs (4, 3, 2): prefix 4+3=7>6 →
    // wait: cum 4 ≤ 6, cum 7 > 6 → takes doc 1 only (4 tokens).
    // s2 docs (5, 1): cum 5 ≤ 6, cum 6 ≤ 6 → both (6 tokens, full).
    // s3 single doc of 25: overflows alone → explicit zero row.
    val docs = Seq(doc(1, "s1", 4), doc(2, "s1", 3), doc(3, "s1", 2),
      doc(10, "s2", 5), doc(11, "s2", 1), doc(20, "s3", 25))
      .toDF("doc_id", "source", "text")
    def run(bands: Int) = Sampling.tokenBudget(docs, 500000, bands).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("alloc_tokens"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("tokens_taken"), r.getAs[Long]("utilization_ppm"))))
      .toMap
    val expect = Map(
      "s1" -> ((6L, 1L, 4L, 666666L)),
      "s2" -> ((6L, 2L, 6L, 1000000L)),
      "s3" -> ((6L, 0L, 0L, 0L)))
    assert(run(64) === expect, s"got ${run(64)}")
    // the banded prefix line is an implementation detail: 1 band
    // (the global-window degenerate) and many bands agree exactly
    assert(run(1) === expect && run(7) === expect)
  }

  test("interleave: proportional spread, deterministic order, band invariance") {
    import spark.implicits._
    // big: 8 docs, small: 4 docs (2:1) — the schedule must alternate
    // roughly big,big,small so small never starves or floods
    val docs = ((1L to 8L).map(i => (i, "big")) ++
      (101L to 104L).map(i => (i, "small"))).toDF("doc_id", "source")
    def run(bands: Int) = Sampling.interleave(docs, k = 12, bands = bands)
      .collect().map(r => (r.getAs[Long]("pos"), r.getAs[String]("source"),
        r.getAs[Long]("doc_id"))).toList
    val got = run(64)
    assert(got === run(1) && got === run(5)) // banding is invisible
    assert(got.map(_._1) === (1L to 12L).toList)
    // independent replay of the position-key order
    val n = 12L
    val keyed = ((1L to 8L).map(i => ("big", i, i * n / 8L)) ++
      (1L to 4L).map(i => ("small", 100L + i, i * n / 4L)))
    val expect = keyed.sortBy { case (s, _, k) => (k, s) }
      .zipWithIndex.map { case ((s, id, _), i) => (i + 1L, s, id) }.toList
    assert(got === expect, s"got $got\nexpect $expect")
    // every 3-slot window of the schedule carries both sources'
    // proportional share (2 big + 1 small) — the interleave property
    got.grouped(3).foreach { w =>
      assert(w.count(_._2 == "big") === 2 && w.count(_._2 == "small") === 1,
        s"window $w")
    }
  }

  test("dsir: integer ratio weights replay exactly; empty target scores 0") {
    import spark.implicits._
    // en docs share 'alpha beta'; the fr doc that ALSO uses them must
    // outrank the fr doc of never-in-target tokens
    val docs = Seq(
      (1L, "alpha beta alpha", "en", "s1"), (2L, "alpha beta", "en", "s1"),
      (3L, "alpha beta beta", "fr", "s1"), (4L, "zulu yankee zulu", "fr", "s1"),
      (5L, "beta zulu", "fr", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Sampling.dsirSample(docs, "en", 16, 10).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rk")) ->
        ((r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("score_ppm")))).toMap

    // independent replay: md5 first-byte buckets, HUGEINT-free exact
    // BigInt arithmetic, same (score desc, doc_id) order
    def bucket(tok: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      (d(0) & 0xff) % 16
    }
    val corpus = Seq((1L, "alpha beta alpha", "en", "s1"),
      (2L, "alpha beta", "en", "s1"), (3L, "alpha beta beta", "fr", "s1"),
      (4L, "zulu yankee zulu", "fr", "s1"), (5L, "beta zulu", "fr", "s2"))
    val occ = corpus.flatMap { case (id, t, l, src) =>
      t.split(" ").map(tok => (id, src, l, bucket(tok))) }
    val cr = occ.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val ct = occ.filter(_._3 == "en").groupBy(_._4).view
      .mapValues(_.size.toLong).toMap
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    val ratio = cr.keys.map(b => b ->
      (BigInt(ct.getOrElse(b, 0L)) * tr * 1000000 / (BigInt(cr(b)) * tt))
        .toLong).toMap
    val scores = corpus.map { case (id, t, _, src) =>
      val bs = t.split(" ").map(bucket)
      (src, id, bs.length.toLong, bs.map(ratio).sum / bs.length) }
    val expect = scores.groupBy(_._1).flatMap { case (src, xs) =>
      xs.sortBy(x => (-x._4, x._2)).zipWithIndex.map { case ((s, id, n, sc), i) =>
        (s, i + 1L) -> ((id, n, sc)) } }
    assert(got === expect, s"got $got\nexpect $expect")

    // no target slice: every ratio (and so every score) is exactly 0
    val zero = Sampling.dsirSample(docs, "xx", 16, 10).collect()
    assert(zero.nonEmpty && zero.forall(_.getAs[Long]("score_ppm") == 0L))
  }

  test("dsir bigrams: target-PHRASE reuse outranks target-unigram soup") {
    import spark.implicits._
    // the en target repeats the phrase 'alpha beta'; fr doc 3 reuses
    // the exact phrase, fr doc 4 has the same UNIGRAMS but never
    // adjacent, fr doc 5 shares nothing. Hashed-bigram features must
    // separate 3 from 4 — the distinction the unigram model cannot
    // see (verified below: under ngram=1 doc 4 scores target-like)
    val docs = Seq(
      (1L, "alpha beta alpha beta", "en", "s1"),
      (2L, "alpha beta", "en", "s1"),
      (3L, "alpha beta alpha", "fr", "s1"),
      (4L, "beta gamma alpha", "fr", "s1"),
      (5L, "zulu yankee zulu", "fr", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    def scores(ngram: Int): Map[Long, Long] =
      Sampling.dsirSample(docs, "en", 16, 10, ngram = ngram).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_ppm"))
        .toMap
    val bi = scores(2)
    // planted buckets are collision-free at dim=16 (md5 first bytes:
    // target bigrams → {3, 2}; doc 4 → {4, 11}; doc 5 → {4, 0}), so
    // the never-in-target docs score EXACTLY 0 and the phrase doc
    // scores strictly target-like
    assert(bi(3L) > 0L && bi(4L) === 0L && bi(5L) === 0L, s"bigram $bi")
    val uni = scores(1)
    assert(uni(4L) > 0L, s"unigram soup should fool the unigram model: $uni")
    assert(uni(3L) > uni(5L))
  }

  test("pareto front equals the brute-force dominance filter, ties preserved") {
    import spark.implicits._
    def bruteOf(docs: org.apache.spark.sql.DataFrame): Set[Long] = {
      val q = graft.text.TextAnalysis.qualityBpFrame(docs).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("q_bp")))
      q.filter { case (id, n, b) =>
        !q.exists { case (id2, n2, b2) =>
          id2 != id && b2 >= b && n2 >= n && (b2 > b || n2 > n) }
      }.map(_._1).toSet
    }
    // real corpus: the operator IS the brute dominance filter
    val corpus = Tables.documents(spark, sf)
    val got = Sampling.paretoFront(corpus).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got === bruteOf(corpus) && got.nonEmpty)
    // planted: exact (n, q_bp) twins BOTH survive (no strict edge)
    val twins = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha alpha alpha"))
      .toDF("doc_id", "text")
    val gotTwins = Sampling.paretoFront(twins).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(gotTwins === bruteOf(twins))
    assert(Set(1L, 2L).subsetOf(gotTwins))
  }

  test("split balance: shares partition each split, deviation is the exact " +
    "ppm gap, splits agree with hashSplit") {
    import spark.implicits._
    val docs = (0L until 200L).map(i =>
      (i, s"text $i", if (i % 4 == 0) "sA" else "sB"))
      .toDF("doc_id", "text", "source")
    val rows = Sampling.splitBalance(docs).collect()
    // within each split the source shares sum to ~1e6 (ppm floors)
    rows.groupBy(_.getAs[String]("split")).values.foreach { cls =>
      val tot = cls.map(_.getAs[Long]("split_share_ppm")).sum
      assert(tot > 1000000L - cls.length && tot <= 1000000L, s"$tot")
    }
    // dev is exactly |split share − corpus share| on every row
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_ppm") ===
        math.abs(r.getAs[Long]("split_share_ppm") -
          r.getAs[Long]("corpus_share_ppm")))
    }
    // cell counts replay the hashSplit assignment exactly
    import org.apache.spark.sql.functions.col
    val expected = docs
      .select(col("source"), Sampling.hashSplit(col("doc_id")).as("split"))
      .groupBy("split", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = rows.map(r => (r.getAs[String]("split"),
      r.getAs[String]("source")) -> r.getAs[Long]("n_docs")).toMap
    assert(got === expected)
  }

  test("coverage greedy: marginal argmax with id tie-break, subsets gain " +
    "nothing, exhaustion stops emitting") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),  // 3 shingles — round-1 winner
      (2L, "a b c d"),    // strict subset of doc 1: never picked
      (3L, "x y z w"),    // 2 fresh shingles — tie with doc 5, id wins
      (5L, "m n o p"))    // 2 fresh shingles
      .toDF("doc_id", "text")
    val got = Sampling.coverageGreedy(docs).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("gain"), r.getAs[Long]("cum_covered"))).toSeq.sorted
    // everything is covered after three picks: rounds 4..8 emit no row
    assert(got === Seq((1L, 1L, 3L, 3L), (2L, 3L, 2L, 5L),
      (3L, 5L, 2L, 7L)), s"$got")
  }

  test("matched controls: nearest length in-stratum, id tie-break, " +
    "cross-band and cross-lang pools never match, unmatched kept null") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(10), "en", "src1"),   // treatment, band 1
      (2L, words(10), "fr", "src1"),   // treatment, no fr pool → null
      (10L, words(11), "en", "src2"),  // diff 1 — tie, lower id wins
      (11L, words(9), "en", "src3"),   // diff 1 — tie loser
      (12L, words(50), "en", "src2"))  // band 6: out of stratum
      .toDF("doc_id", "text", "lang", "source")
    val got = Sampling.matchedControls(docs).collect()
      .map(r => r.getAs[Long]("t_doc") ->
        ((Option(r.getAs[java.lang.Long]("c_doc")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("len_diff")).map(_.toLong)))).toMap
    assert(got === Map(
      1L -> ((Some(10L), Some(1L))),
      2L -> ((None, None))), s"$got")
  }

  test("unimax waterfill: small languages fully taken, the surplus levels the rest") {
    import spark.implicits._
    // masses: aa=2, bb=6, cc=12 tokens (total 20); budget 50% = 10.
    // aa (2) fits under 10/3=3 → taken whole; remaining 8 over 2
    // langs = 4 each → bb (6) capped at 4, cc (12) capped at 4
    val docs = Seq(
      (0L, "x y", "aa"),
      (1L, "x y z x y z", "bb"),
      (2L, "a b c d e f g h i j k l", "cc"))
      .toDF("doc_id", "text", "lang")
    val got = Sampling.unimax(docs, 50L).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("level_tokens"),
          r.getAs[Long]("alloc_tokens"), r.getAs[Boolean]("capped")))).toMap
    assert(got === Map(
      "aa" -> ((2L, 4L, 2L, false)),
      "bb" -> ((6L, 4L, 4L, true)),
      "cc" -> ((12L, 4L, 4L, true))), s"$got")
    // allocation never exceeds the budget; the shortfall is bounded
    // by the floor remainders (< one token per capped language)
    assert(got.values.map(_._3).sum <= 10L)
  }

  test("unimax: a budget covering the corpus allocates everything, uncapped") {
    import spark.implicits._
    val docs = Seq((0L, "x y", "aa"), (1L, "p q r", "bb"))
      .toDF("doc_id", "text", "lang")
    val got = Sampling.unimax(docs, 100L).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("alloc_tokens"), r.getAs[Boolean]("capped"),
          r.isNullAt(r.fieldIndex("level_tokens"))))).toMap
    assert(got === Map(
      "aa" -> ((2L, false, true)), "bb" -> ((3L, false, true))), s"$got")
  }

  test("temperature gate: live verdicts equal the batch materializer, " +
    "unfitted sources stay quarantined") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val rows = (1L to 40L).map(i =>
      (i, s"doc $i", if (i % 4 == 0) "rare" else "common"))
    val corpus = rows.toDF("doc_id", "text", "source")
    val batch = graft.ops.Sampling.temperatureApply(corpus).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rate16"),
        r.getAs[Boolean]("kept"))).toSet
    // fit out-of-band, gate a live stream against the frozen table
    val rates = graft.ops.Sampling.temperatureRates(corpus).collect()
    val ratesDf = rates.map(r =>
      (r.getAs[String]("source"), r.getAs[Int]("rate16")))
      .toSeq.toDF("source", "rate16")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = graft.streaming.SampleStreams.temperatureGateStream(
        input.toDF().toDF("doc_id", "text", "source"), ratesDf)
      .writeStream.format("memory").queryName("tgate")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      input.addData(rows.take(15))
      // a source the fit never saw arrives mid-stream
      input.addData(Seq((99L, "novel", "unseen")) ++ rows.drop(15))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT * FROM tgate").collect()
    val streamed = got.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Int]("rate16"), r.getAs[Boolean]("kept"))).toSet
    assert(streamed === batch)
    assert(!got.exists(_.getAs[Long]("doc_id") == 99L),
      "unfitted source must not pass the gate")
  }
}
