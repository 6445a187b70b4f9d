package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),      // exact dup of 1
      (3L, "the quick brown fox leaps over the lazy dog"),      // near dup of 1
      (4L, "completely different words appear in this sentence here"),
      (5L, "short text")
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps lowest doc_id with multiplicity") {
    val out = Dedup.exact(corpus).collect()
    assert(out.length == 4) // 5 docs, one exact dup pair
    val dupGroup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupGroup.getAs[Long]("keep_doc_id") == 1L)
  }

  test("df histogram: buckets by power-of-two df, postings and the " +
    "Σdf² join cost attribute to the right stratum") {
    import spark.implicits._
    // "a b c" appears in 3 docs (df=3, bucket 2); every other
    // shingle is unique (df=1, bucket 1); the two-token doc emits
    // no shingles at all
    val docs = Seq(
      (1L, "a b c d"),   // shingles: "a b c", "b c d"
      (2L, "a b c e"),   // shingles: "a b c", "b c e"
      (3L, "a b c"),     // shingle:  "a b c"
      (4L, "x y")        // too short — no 3-shingle
    ).toDF("doc_id", "text")
    val got = Dedup.dfHistogram(docs).collect()
      .map(r => r.getAs[Long]("df_bucket") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("postings"),
          r.getAs[Long]("join_cost_sq")))).toMap
    // df=1: "b c d", "b c e" → 2 shingles, 2 postings, cost 2·1²
    assert(got(1L) == ((2L, 2L, 2L)), s"$got")
    // df=3: "a b c" → 1 shingle, 3 postings, cost 3² = 9
    assert(got(2L) == ((1L, 3L, 9L)), s"$got")
    assert(got.size == 2)
  }

  test("df-prune curve: per-cutoff recall follows each pair's min " +
    "shared-shingle df, cost follows Σdf², empty pair set nulls recall") {
    import spark.implicits._
    // pair (1,2): exact dups, every shared shingle df=2 → survives
    // cutoff ≥ 2; pair (5,6): shares ONLY "h i j", which docs 7/8
    // also carry (df=4) → survives only cutoff ≥ 4; (5,7)/(7,8)/…
    // fall under τ=0.3
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"),
      (5L, "h i j k"), (6L, "h i j l"),
      (7L, "m n o h i j"), (8L, "q r s h i j")
    ).toDF("doc_id", "text")
    val got = Dedup.dfPruneCurve(docs, 0.3, lit(true), Seq(1L, 2L, 4L))
      .collect()
      .map(r => r.getAs[Long]("cutoff") ->
        ((r.getAs[Long]("n_pairs_kept"), r.getAs[Long]("recall_ppm"),
          r.getAs[Long]("cost_ppm")))).toMap
    // df² mass: 8 shingles at df=1 (8), 3 at df=2 (12), 1 at df=4
    // (16) → total 36; exact integer ppm
    assert(got(1L) == ((0L, 0L, 8L * 1000000 / 36)), s"$got")
    assert(got(2L) == ((1L, 500000L, 20L * 1000000 / 36)), s"$got")
    assert(got(4L) == ((2L, 1000000L, 1000000L)), s"$got")
    // a pairless corpus keeps the cutoff rows with NULL recall
    val lone = Seq((1L, "only one document here")).toDF("doc_id", "text")
    val empty = Dedup.dfPruneCurve(lone, 0.3, lit(true), Seq(2L)).collect()
    assert(empty.length == 1 &&
      empty.head.isNullAt(empty.head.fieldIndex("recall_ppm")) &&
      empty.head.getAs[Long]("n_pairs_kept") == 0L)
  }

  test("ngram jaccard finds exact and near duplicates, skips short docs") {
    val pairs = Dedup.ngramJaccard(corpus, 0.4, lit(true))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.exists { case (a, b, j) => a == 1 && b == 2 && j == 1.0 })
    assert(pairs.exists { case (a, b, _) => a == 1 && b == 3 })
    assert(!pairs.exists { case (a, b, _) => a == 5 || b == 5 })
  }

  test("minhash LSH surfaces the same near-dups as exact jaccard") {
    // default 16x4 banding targets J~0.5+; for the planted J=0.4 pair
    // use 32 bands of 2 rows (detection threshold ~0.18)
    val lsh = Dedup.minhashLsh(corpus, 0.4, k = 64, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.contains((1L, 2L)))
    assert(lsh.contains((1L, 3L)))
  }

  test("simhash pairs: identical docs at hamming 0") {
    val out = Dedup.simhashPairs(corpus, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.exists { case (a, b, h) => a == 1 && b == 2 && h == 0 })
  }

  test("simhash banding is lossless at a wider hamming radius") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.ArrayData
    val sig = (s: String) => graft.functions.HashOps.simhash(
      ArrayData.toArrayData(s.split(" ").map(UTF8String.fromString)))
    val trueHamming = java.lang.Long.bitCount(
      sig("the quick brown fox jumps over the lazy dog") ^
        sig("the quick brown fox leaps over the lazy dog"))
    val radius = 15 // 16 chunks of 4 bits
    val out = Dedup.simhashPairs(corpus, radius)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    if (trueHamming <= radius)
      assert(out.exists { case (a, b, h) => a == 1 && b == 3 && h == trueHamming })
    // radius-0 still returns only the exact-signature pair
    val strict = Dedup.simhashPairs(corpus, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(strict == List((1L, 2L)))
  }

  test("keeper model: fit-once artifact matches every one-shot consumer") {
    // the 8 surface queries ride ONE fitted model; each must equal the
    // one-shot pipeline it replaced (same expressions, same thresholds)
    val model = Dedup.fitKeepers(corpus, 0.4, iters = 2, k = 64, bands = 32)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(Dedup.nearDupKeepers(model)) ==
      rows(Dedup.nearDupKeepers(corpus, 0.4, 2, 64, 32)))
    val oneShotSizes = Dedup.nearDupKeepers(corpus, 0.4, 2, 64, 32)
      .groupBy("keep_doc_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
    assert(rows(Dedup.clusterSizes(model)) == rows(oneShotSizes))
    // pairs are the verified LSH edges the one-shot path produces
    assert(rows(model.pairs) ==
      rows(Dedup.minhashLsh(corpus, 0.4, 64, 32).select("doc_a", "doc_b")))
    // the audit's split and the split's split are the SAME frame
    val split = graft.ops.Sampling.leakageSafeSplit(model)
    val audit = graft.ops.Sampling.leakAudit(model).collect().head
    assert(audit.getAs[Long]("n_pairs") == model.pairs.count())
    assert(audit.getAs[Long]("n_cross_split") == 0L)
    assert(audit.getAs[Long]("n_train") + audit.getAs[Long]("n_val") ==
      split.count())
  }

  test("keeper assignment maps every dup to the group minimum") {
    val exact = Dedup.exactKeepers(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(exact(1L) == 1L && exact(2L) == 1L) // exact dup group
    assert(exact(3L) == 3L && exact(4L) == 4L) // unique texts keep themselves
    val near = Dedup.nearDupKeepers(corpus, 0.4, iters = 2, k = 64, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // 1,2 exact dups and 3 near-dup of 1: all collapse onto 1
    assert(near(1L) == 1L && near(2L) == 1L && near(3L) == 1L)
    assert(near(4L) == 4L && near(5L) == 5L)
  }

  test("quality-weighted keepers elect a better-or-equal doc, same clusters") {
    val docs = Tables.documents(spark, sf)
    val quality = graft.text.TextAnalysis.qualityBpFrame(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("q_bp")).toMap
    val best = Dedup.nearDupKeepersBest(docs, 0.9)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_doc_id")).toMap
    val minBased = Dedup.nearDupKeepers(docs, 0.9)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_doc_id")).toMap
    // same partition into clusters as the min-label operator, only
    // the representative changes (both propagate the same edges for
    // the same bounded iteration count)
    assert(best.groupBy(_._2).values.map(_.keySet).toSet ==
      minBased.groupBy(_._2).values.map(_.keySet).toSet)
    // every doc's keeper wins (q_bp desc, doc_id asc) against it —
    // holds even for chains longer than the propagation radius,
    // where keepers may not be globally self-kept
    best.foreach { case (m, keeper) =>
      val wins = quality(keeper) > quality(m) ||
        (quality(keeper) == quality(m) && keeper <= m)
      assert(wins,
        s"doc $m (q=${quality(m)}) beats its keeper $keeper (q=${quality(keeper)})") }
  }

  test("quality-weighted keepers keep a planted high-quality near-dup") {
    import spark.implicits._
    // doc 2 is a near-dup of doc 1 with richer vocabulary (higher
    // q_bp), so the best-keeper election must keep 2 where the
    // min-id rule keeps 1
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val planted = Seq(
      (1L, base + "alpha alpha alpha alpha"),
      (2L, base + "iota kappa lambda mu"),
      (3L, "completely different text about nothing in particular here"))
      .toDF("doc_id", "text")
    val best = Dedup.nearDupKeepersBest(planted, 0.5, k = 64, bands = 32)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_doc_id")).toMap
    val minBased = Dedup.nearDupKeepers(planted, 0.5, k = 64, bands = 32)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_doc_id")).toMap
    assert(minBased(1L) == 1L && minBased(2L) == 1L) // min-id keeps 1
    assert(best(1L) == 2L && best(2L) == 2L)         // quality keeps 2
    assert(best(3L) == 3L)                           // singleton untouched
  }

  test("embedding near-dup finds planted close pair") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f, 0.0f)), // planted near-dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.embedNearDup(vecs, 0.95, lit(true))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L)))
  }

  test("semdedup drops later near-dups within a cluster, never across") {
    import spark.implicits._
    val vecs = Seq(
      (1L, 1, Array(1.0f, 0.0f)),
      (2L, 1, Array(1.0f, 0.0f)), // same cell, identical → dropped
      (3L, 1, Array(0.0f, 1.0f)), // same cell, orthogonal → kept
      (4L, 2, Array(1.0f, 0.0f))  // identical to 1 but another cell → kept
    ).toDF("vec_id", "label", "embedding")
    val out = Dedup.semDedup(vecs, 0.9).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("kept")).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
  }

  test("containment flags an embedded quote that Jaccard misses") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val quote = (10 to 18).map(i => s"w$i").mkString(" ") // ⊂ long
    val other = (100 to 140).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, long), (2L, quote), (3L, other)).toDF("doc_id", "text")
    val cont = Dedup.containment(docs, 0.8, lit(true)).collect()
    assert(cont.length == 1)
    val r = cont.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    // every shingle of the quote appears in the long doc
    assert(r.getAs[Double]("cont_b_in_a") == 1.0)
    assert(r.getAs[Double]("cont_a_in_b") < 0.8)
    // ...while symmetric Jaccard stays far below any useful threshold
    val jac = Dedup.ngramJaccard(docs, 0.5, lit(true)).collect()
    assert(!jac.exists(x => x.getAs[Long]("doc_a") == 1L &&
      x.getAs[Long]("doc_b") == 2L))
  }

  test("pointer-doubling propagation unifies a 60-deep chain in 6 rounds") {
    import spark.implicits._
    // path graph 0–1–2–…–59: plain radius-r propagation reaches only
    // r hops (6 rounds ⇒ 6), but with the label-of-label shortcut the
    // reach is R_r = 2·R_{r−1}+1 ⇒ 126 ≥ 59 — the whole chain must
    // land on keeper 0. This is the template-family case that would
    // otherwise straddle sample_split_safe's train/val boundary.
    val pairs = (0L until 59L).map(i => (i, i + 1))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("doc_a", "doc_b")
    val init = (0L until 60L).map(i => (i, i)).toDF("doc_id", "lab")
    val labs = Dedup.propagateLabels(edges, init, iters = 6, maximize = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs.size == 60 && labs.values.forall(_ == 0L))
    // and maximize with a decode picks the other end
    val labsMax = Dedup.propagateLabels(edges, init, iters = 6,
      maximize = true).collect().map(_.getLong(1)).distinct
    assert(labsMax.toSeq == Seq(59L))
  }

  test("chunk dedup kills shared boilerplate but keeps unique prose") {
    import spark.implicits._
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    def uniq(tag: String) = (1 to 16).map(i => s"$tag$i").mkString(" ")
    // docs 1 and 2 share the boilerplate chunk; their second chunks differ
    val docs = Seq(
      (1L, s"$boiler ${uniq("x")}"),
      (2L, s"$boiler ${uniq("y")}"),
      (3L, uniq("z"))
    ).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.chunkDedup(docs, 16)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"))).toMap
    assert(out(1L) == (2L, 2L)) // first occurrence keeps everything
    assert(out(2L) == (2L, 1L)) // boilerplate chunk deduped away
    assert(out(3L) == (1L, 1L))
  }

  test("cluster-size histogram counts planted families exactly") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten"
    val docs = ((1 to 3).map(i => (i.toLong, a)) ++    // size-3 family
      (4 to 5).map(i => (i.toLong, b)) ++              // size-2 family
      (6 to 10).map(i => (i.toLong,
        s"unique$i body$i words$i here$i tail$i only$i pad$i stop$i")))
      .toDF("doc_id", "text")
    val hist = graft.dedup.Dedup.clusterSizes(docs).collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"))).toMap
    assert(hist(1L) == ((5L, 5L)))
    assert(hist(2L) == ((1L, 2L)))
    assert(hist(3L) == ((1L, 3L)))
    // n_docs column always sums back to the corpus size
    assert(hist.values.map(_._2).sum == 10L)
  }

  test("lsh recall calibration: high bands full recall, mid bands measured") {
    import spark.implicits._
    // 30 base docs; 5 exact-dup pairs (band 9/10) and 5 planted
    // half-overlap pairs (jaccard ~0.45-0.6 — the S-curve midsection)
    val base = (1 to 30).map(i => (i.toLong,
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i iota$i kappa$i"))
    val dups = (1 to 5).map(i => (100L + i, base(i - 1)._2))
    val halves = (1 to 5).map { i =>
      val toks = base(i + 9)._2.split(" ")
      // keep the first 6 tokens, replace the tail: Jaccard ~ 4/12
      (200L + i, (toks.take(6) ++ Seq(s"novel${i}a", s"novel${i}b",
        s"novel${i}c", s"novel${i}d")).mkString(" "))
    }
    val docs = (base ++ dups ++ halves).toDF("doc_id", "text")
    val out = Dedup.lshRecall(docs, lit(true)).collect()
      .map(r => r.getAs[Long]("j_band") ->
        (r.getAs[Long]("n_true"), r.getAs[Long]("n_caught"),
          r.getAs[Double]("recall"))).toMap
    // the exact-dup pairs land in the top band with full recall (a
    // banded signature of an identical shingle set always collides)
    val top = out.keySet.max
    assert(top >= 9, s"no top band in $out")
    assert(out(top)._3 == 1.0)
    // every band's recall is consistent: n_caught <= n_true and the
    // ratio matches the reported recall
    out.foreach { case (b, (t, c, r)) =>
      assert(c <= t, s"band $b")
      assert(math.abs(r - c.toDouble / t) < 1e-4, s"band $b") }
    // mid bands exist from the planted half-overlaps
    assert(out.keySet.exists(_ <= 5), s"no mid band in $out")
  }

  test("per-source dup rate flags the template-heavy source exactly") {
    import spark.implicits._
    val tmpl = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // source "bad": 6 docs, 4 of them one template family;
    // source "good": 5 unique docs
    val docs = (Seq(
      (1L, tmpl, "bad"), (2L, tmpl, "bad"), (3L, tmpl, "bad"), (4L, tmpl, "bad"),
      (5L, "own words here five tokens long enough now yes", "bad"),
      (6L, "other unique content in this one also long enough", "bad")) ++
      (7 to 11).map(i => (i.toLong,
        s"unique$i body$i words$i here$i tail$i only$i pad$i stop$i", "good")))
      .toDF("doc_id", "text", "source")
    val out = graft.dedup.Dedup.dupRateBySource(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_in_dup_clusters"),
          r.getAs[Double]("dup_rate"))).toMap
    assert(out("bad") == ((6L, 4L, 0.6667)))
    assert(out("good") == ((5L, 0L, 0.0)))
  }

  test("banding plan replays the S-curve and picks the tightest layout") {
    val rows = Dedup.bandingPlan(spark, tau = 0.9, k = 64).collect()
      .sortBy(_.getAs[Long]("bands"))
    assert(rows.map(_.getAs[Long]("bands")).toSeq ==
      Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L))
    rows.foreach(r => assert(r.getAs[Long]("bands") *
      r.getAs[Long]("rows_per_band") == 64L))
    // s50 falls as banding loosens; detection probability at tau rises
    val s50 = rows.map(_.getAs[Double]("s50"))
    assert(s50.zip(s50.tail).forall { case (a, b) => a > b })
    val p = rows.map(_.getAs[Double]("p_detect_at_tau"))
    assert(p.zip(p.tail).forall { case (a, b) => a <= b })
    // (1/4)^(1/16) = 0.917 sits closest to 0.9 on the power-of-two grid
    assert(rows.filter(_.getAs[Boolean]("chosen"))
      .map(_.getAs[Long]("bands")).toSeq == Seq(4L))
    // the production layout (16 bands of 4) catches tau-pairs ~surely
    assert(rows.find(_.getAs[Long]("bands") == 16L).get
      .getAs[Double]("p_detect_at_tau") > 0.999)
  }

  test("cross-source flow separates internal templates from shared feeds") {
    import spark.implicits._
    val tmplA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tmplB = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    // template A lives only inside src1 (3 copies -> 3 within-pairs);
    // template B is shared across src1 and src2 (one copy each ->
    // 1 cross-pair); src3 is clean
    val docs = Seq(
      (1L, tmplA, "src1"), (2L, tmplA, "src1"), (3L, tmplA, "src1"),
      (4L, tmplB, "src1"), (5L, tmplB, "src2"),
      (6L, "unique words in this source only long enough now", "src2"),
      (7L, "entirely separate content with its own tokens here", "src3"))
      .toDF("doc_id", "text", "source")
    val model = Dedup.fitKeepers(docs, 0.9)
    val out = Dedup.crossSourceDupFlow(docs, model).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Boolean]("is_cross"),
          r.getAs[Double]("pair_share"))).toMap
    assert(out == Map(
      ("src1", "src1") -> ((3L, false, 0.75)),
      ("src1", "src2") -> ((1L, true, 0.25))), s"got $out")
  }

  test("incremental merge lands exactly where the full fit lands") {
    import spark.implicits._
    val tmplA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tmplB = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val tmplD = "phi chi psi omega aleph beth gimel daleth he waw"
    // base: family A {1,2,3-near}, untouched family B {5,6}, unique 7
    val base = Seq(
      (1L, tmplA), (2L, tmplA), (3L, tmplA.replace("beta", "betaX")),
      (5L, tmplB), (6L, tmplB),
      (7L, "standalone base document with entirely different words inside")
    ).toDF("doc_id", "text")
    // delta: 8 joins family A, {9,10} a delta-only family, 11 unique
    val delta = Seq(
      (8L, tmplA.replace("kappa", "kappaX")),
      (9L, tmplD), (10L, tmplD),
      (11L, "standalone delta document sharing nothing with the corpus")
    ).toDF("doc_id", "text")
    val all = base.unionByName(delta)
    def labelMap(m: Dedup.KeeperModel): Map[Long, Long] =
      m.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseModel = Dedup.fitKeepers(base, 0.4, iters = 2, k = 64, bands = 32)
    val merged = Dedup.mergeKeepers(baseModel, base, delta)
    val full = Dedup.fitKeepers(all, 0.4, iters = 2, k = 64, bands = 32)
    val m = labelMap(merged)
    // the associativity contract: merge(fit(a), b) == fit(a ∪ b)
    assert(m == labelMap(full))
    // sanity on the planted structure
    assert(m(8L) == 1L)                 // delta doc joined base family A
    assert(m(9L) == 9L && m(10L) == 9L) // delta-only family
    assert(m(5L) == 5L && m(6L) == 5L)  // untouched family unchanged
    assert(m(7L) == 7L && m(11L) == 11L)
    // untouched rows pass through byte-identical to the base model
    val baseLabels = labelMap(baseModel)
    assert(m(5L) == baseLabels(5L) && m(6L) == baseLabels(6L)
      && m(7L) == baseLabels(7L))
    // merged verified-pair set equals the full fit's (edge parity,
    // not just label parity)
    def pairSet(mm: Dedup.KeeperModel) =
      mm.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(merged) == pairSet(full))
    // a second delta composes: merge(merge(fit(a), b), c) == fit(a∪b∪c)
    val delta2 = Seq(
      (12L, tmplD.replace("omega", "omegaX")), // extends the 9/10 family
      (13L, "yet another isolated document arriving in the second batch")
    ).toDF("doc_id", "text")
    val merged2 = Dedup.mergeKeepers(merged, all, delta2)
    val full2 = Dedup.fitKeepers(all.unionByName(delta2), 0.4,
      iters = 2, k = 64, bands = 32)
    assert(labelMap(merged2) == labelMap(full2))
    assert(labelMap(merged2)(12L) == 9L)
    // the quality-weighted election rides the merged model's pairs:
    // incremental maintenance serves BOTH elections from one artifact
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(Dedup.nearDupKeepersBest(all, merged)) ==
      rows(Dedup.nearDupKeepersBest(all, full)))
  }

  test("a week of daily merges equals the from-scratch fit") {
    import spark.implicits._
    // day 0 corpus + 6 daily deltas; each delta extends an existing
    // template family, starts a new one, or arrives unique — the
    // segment stack grows one lazy-union leaf per merge and must
    // still plan and land exactly where one big fit lands
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tB = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    def doc(i: Long): (Long, String) = (i % 3) match {
      case 0 => (i, tA.replace("beta", s"beta${i % 5}"))   // A-family orbit
      case 1 => (i, tB.replace("mu", s"mu${i % 4}"))       // B-family orbit
      case _ => (i, s"unique$i words$i in$i this$i one$i only$i pad$i end$i")
    }
    val days = (0L until 7L).map(d =>
      ((d * 10) until (d * 10 + 10)).map(doc).toDF("doc_id", "text"))
    var model = Dedup.fitKeepers(days.head, 0.4, iters = 2, k = 64, bands = 32)
    var corpus = days.head
    days.tail.foreach { delta =>
      model = Dedup.mergeKeepers(model, corpus, delta)
      corpus = corpus.unionByName(delta)
    }
    val full = Dedup.fitKeepers(corpus, 0.4, iters = 2, k = 64, bands = 32)
    def labelMap(m: Dedup.KeeperModel): Map[Long, Long] =
      m.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelMap(model) == labelMap(full))
    assert(model.labels.count() == 70L)
  }

  test("keeper model survives the save/load cross-job merge loop") {
    import spark.implicits._
    val tmplA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val base = Seq(
      (1L, tmplA), (2L, tmplA),
      (3L, "unrelated base words that stand entirely on their own here")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (4L, tmplA.replace("iota", "iotaX")),
      (5L, "a fresh delta document with its own vocabulary only")
    ).toDF("doc_id", "text")
    val dir = s"/tmp/graft-test-keepers-${System.nanoTime()}"
    // job 1: fit the corpus-so-far, publish v0
    Dedup.saveKeepers(Dedup.fitKeepers(base, 0.4, 2, 64, 32), dir, 0L)
    assert(Dedup.latestKeeperVersion(spark, dir).contains(0L))
    // job 2 (fresh lineage — only the artifact crosses): load, merge
    // the day's batch, publish v1
    val loaded = Dedup.loadKeepers(spark, dir)
    assert(loaded.tau == 0.4 && loaded.iters == 2
      && loaded.k == 64 && loaded.bands == 32)
    // a delta re-delivering a base doc is rejected loudly, not
    // silently absorbed into duplicate band rows and pairs
    intercept[IllegalArgumentException] {
      Dedup.mergeKeepers(loaded, base, base.limit(1))
    }
    val merged = Dedup.mergeKeepers(loaded, base, delta)
    Dedup.saveKeepers(merged, dir, 1L)
    // republish of an existing version is the idempotent no-op
    Dedup.saveKeepers(merged, dir, 1L)
    // stray non-version directories are ignored by discovery
    new java.io.File(dir, "v=1.bak").mkdirs()
    assert(Dedup.latestKeeperVersion(spark, dir).contains(1L))
    // job 3: the reloaded latest equals a from-scratch full fit
    val reloaded = Dedup.loadKeepers(spark, dir)
    val full = Dedup.fitKeepers(base.unionByName(delta), 0.4, 2, 64, 32)
    def labelMap(m: Dedup.KeeperModel): Map[Long, Long] =
      m.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelMap(reloaded) == labelMap(full))
    assert(labelMap(reloaded)(4L) == 1L) // delta doc joined the base family
  }

  test("prefix-filter join equals the unfiltered exact join at every tau") {
    import spark.implicits._
    // corpus with heavy shared boilerplate (the shingles prefix
    // filtering prunes) plus planted near-dups and unrelated docs
    val docs = Seq(
      (1L, "terms of service apply to all users of this site today"),
      (2L, "terms of service apply to all users of this site now"),
      (3L, "terms of service apply to some users of this site today"),
      (4L, "a completely unrelated sentence about brown foxes jumping"),
      (5L, "a completely unrelated sentence about lazy dogs sleeping"),
      (6L, "short one"),
      (7L, "terms of service apply to all users of this site today")
    ).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (tau <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val exact = pairs(Dedup.ngramJaccard(docs, tau, lit(true)))
      val pref = pairs(Dedup.prefixJaccard(docs, tau))
      assert(pref == exact, s"tau=$tau: prefix $pref vs exact $exact")
    }
    // the one exact-dup pair (7 copies 1; 2 ends differently) survives
    // tau = 1.0, where the prefix shrinks to a single rarest shingle
    assert(pairs(Dedup.prefixJaccard(docs, 1.0))
      .map { case (a, b, _) => (a, b) } == Set((1L, 7L)))
  }

  test("prefix join catches a pair sitting exactly AT the threshold") {
    import spark.implicits._
    // A has 10 distinct 3-gram shingles, B's 5 shingles are all
    // contained in A: J = 5 / (10 + 5 - 5) = 0.5 exactly — the fp
    // guard on ceil(tau*sz) must not shorten the prefix past it
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"   // 10 shingles
    val b = "w1 w2 w3 w4 w5 w6 w7"                      // 5 shingles
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = Dedup.prefixJaccard(docs, 0.5).collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 0.5)
  }

  test("prefix join on the real corpus equals the bounded exact join") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 120)
    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(key(Dedup.prefixJaccard(docs, 0.4)) ==
      key(Dedup.ngramJaccard(docs, 0.4, lit(true))))
  }

  private def bruteEd(docs: org.apache.spark.sql.DataFrame,
                      k: Int): Set[(Long, Long, Long)] =
    docs.select(col("doc_id").as("doc_a"), col("text").as("ta"))
      .crossJoin(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")))
      .filter(col("doc_a") < col("doc_b") &&
        levenshtein(col("ta"), col("tb")) <= k)
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def edPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("edit-distance join equals brute force at every k, incl. boundary") {
    import spark.implicits._
    // 1-2 at distance 1, 1-3 at 2 (one substitution + one insert),
    // 4 repeated-gram stress (occurrence elements: 'aaa' x many),
    // 5 its single-deletion neighbor, 6 unrelated same-length noise
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the hazy dog"),
      (3L, "the quick brown foxx jumps over the hazy dog"),
      (4L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (5L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (6L, "zq xw vu ts rq po nm lk ji hg fe dc ba zy xv")
    ).toDF("doc_id", "text")
    for (k <- Seq(0, 1, 2, 5)) {
      val got = edPairs(Dedup.editDistance(docs, k))
      assert(got == bruteEd(docs, k), s"k=$k: $got")
    }
    // boundary: the 1-3 pair sits at distance exactly 2 (one
    // substitution + one insertion) — present at k = 2, absent at k = 1
    assert(edPairs(Dedup.editDistance(docs, 2)).contains((1L, 3L, 2L)))
    assert(!edPairs(Dedup.editDistance(docs, 1)).exists(
      p => p._1 == 1L && p._2 == 3L))
  }

  test("edit-distance short arm covers the sub-gram-threshold regime") {
    import spark.implicits._
    // at q=3, k=2 the gram threshold dies at len <= 8: every pair
    // here must come from the short arm (or the mixed boundary)
    val docs = Seq(
      (1L, "abc"), (2L, "abd"), (3L, "ab"), (4L, "xbd"),
      (5L, "abcdefgh"),            // len 8: short-arm ceiling
      (6L, "abcdefghij"),          // len 10: gram arm, ed(5,6)=2
      (7L, "")                     // empty doc: pairs via deletions
    ).toDF("doc_id", "text")
    for (k <- Seq(1, 2)) {
      val got = edPairs(Dedup.editDistance(docs, k, q = 3))
      assert(got == bruteEd(docs, k), s"k=$k: $got")
    }
  }

  test("edit-distance on the real corpus equals brute force") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 150)
      .select("doc_id", "text")
    assert(edPairs(Dedup.editDistance(docs, 5)) == bruteEd(docs, 5))
  }

  test("jaccard histogram: covers every candidate once, identical pair " +
    "in the top bin, bin bounds ordered") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), // identical: j = 1
      (3L, "a b c d e f g z"),                          // near-dup
      (4L, "q r s t u v w x"))                          // unrelated
      .toDF("doc_id", "text")
    val hist = Dedup.jaccardHistogram(docs).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_pairs"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi")))
    assert(hist.map(_._2).sum === Dedup.minhashLsh(docs, 0.0).count())
    assert(hist.exists(h => h._1 == 19L && h._2 >= 1L && h._4 == 1.0))
    hist.foreach { h =>
      assert(h._1 >= 0L && h._1 <= 19L && h._3 <= h._4, s"bad bin $h")
    }
  }

  test("quality cross: dup family lands in 'small', shares sum to 1e6 per class") {
    import spark.implicits._
    // docs 1+2 identical (a 2-family), 3 and 4 unique singletons
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight"),
      (4L, "red green blue cyan magenta yellow black white"))
      .toDF("doc_id", "text")
    val model = Dedup.fitKeepers(docs, 0.9)
    val rows = Dedup.qualityCross(model, docs).collect()
    val byClass = rows.groupBy(_.getAs[String]("size_class"))
    // the family is size 2 → 'small'; the singletons are 'unique'
    assert(byClass("small").map(_.getAs[Long]("n_docs")).sum === 2L)
    assert(byClass("unique").map(_.getAs[Long]("n_docs")).sum === 2L)
    // within-class shares partition each class exactly (ppm floors)
    byClass.values.foreach { cls =>
      val total = cls.map(_.getAs[Long]("share_ppm")).sum
      assert(total > 1000000L - cls.length && total <= 1000000L,
        s"shares $total")
      assert(cls.forall(r =>
        r.getAs[Long]("class_total") === cls.map(_.getAs[Long]("n_docs")).sum))
    }
    // every doc carries the band the shared scorer assigns it
    val bands = graft.text.TextAnalysis.qualityBpFrame(docs).collect()
      .map(r => math.min(r.getAs[Long]("q_bp") / 2500, 3L))
    val matrixDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(matrixDocs === bands.length)
  }

  test("simhash hamming histogram: clones land at zero, mass reconciles " +
    "with the radius-filtered pairs, flags split at the radius") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // clone → hamming 0
      (3L, "alpha beta gamma delta epsilon eta"),  // near: one token
      (4L, "totally different content entirely here now"))
      .toDF("doc_id", "text")
    val hist = Dedup.simhashHammingHist(docs).collect()
      .map(r => r.getAs[Long]("hamming") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Boolean]("within_radius"))))
      .toMap
    assert(hist.get(0L).exists(_._1 >= 1L), s"clone pair missing: $hist")
    assert(hist.forall { case (h, (_, w)) => w == (h <= 3L) }, s"$hist")
    // the histogram is the unfiltered candidate mass: its ≤radius
    // slice must reconcile exactly with the production pair count
    val within = hist.collect { case (h, (n, _)) if h <= 3 => n }.sum
    assert(within === Dedup.simhashPairs(docs).count(), s"$hist")
  }
}
