package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val embeddings = Tables.embeddings(spark, sf)

  test("brute-force topk: k rows per query, self excluded, ranks dense") {
    val out = Similarity.bruteTopK(embeddings, col("vec_id") < 3, 5).collect()
    assert(out.length == 15)
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      assert(!rows.exists(r => r.getAs[Long]("vec_id") == r.getAs[Long]("q_id")))
      // ranking is by descending cosine
      val sorted = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("knn graph: symmetric scoring, k out-edges per node, no self-loops") {
    val k = 3
    val g = Similarity.knnGraph(embeddings, col("vec_id") % 7 === 0, k).collect()
    val nodes = g.map(_.getAs[Long]("src")).distinct
    assert(nodes.nonEmpty && g.length == nodes.length * k)
    assert(!g.exists(r => r.getAs[Long]("src") == r.getAs[Long]("dst")))
    // cosine is symmetric: edge (a,b) scores identically to (b,a)
    val score = g.map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")) ->
      r.getAs[Double]("cos")).toMap
    score.foreach { case ((a, b), c) =>
      score.get((b, a)).foreach(rc => assert(rc == c)) }
  }

  test("LSH ANN finds a planted near-duplicate at rank 1") {
    import spark.implicits._
    val base = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
    }
    // vec 100 = tiny perturbation of vec 7
    val planted = (100L, base(7)._2.map(x => x + 0.001f))
    val vecs = (base :+ planted).toDF("vec_id", "embedding")
    val out = Similarity.annLsh(vecs, col("vec_id") === 100L, 3)
      .collect().sortBy(_.getAs[Long]("rank"))
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("vec_id") == 7L)
    assert(out.head.getAs[Double]("cos") > 0.999)
  }

  test("IVF ANN returns k ranked candidates per query") {
    val out = Similarity.annIvf(embeddings, col("vec_id") < 3, 5,
      centroidStride = 50L, nProbe = 2).collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach(rows => assert(rows.length == 5))
  }

  test("IVF with Lloyd-refined centroids still returns full top-k") {
    val out = Similarity.annIvf(embeddings, col("vec_id") < 3, 5,
      centroidStride = 50L, nProbe = 2, kmeansIters = 2, dim = 64).collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach(rows => assert(rows.length == 5))
  }

  test("IVF recall overlaps brute force meaningfully") {
    val brute = Similarity.bruteTopK(embeddings, col("vec_id") < 10, 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Similarity.annIvf(embeddings, col("vec_id") < 10, 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    assert((brute intersect ivf).size >= 10, s"overlap ${(brute intersect ivf).size}/50")
  }

  test("range search returns only true radius neighbors from probed cells") {
    val tau = 0.3
    val out = Similarity.rangeSearch(embeddings, col("vec_id") < 10, tau).collect()
    assert(out.nonEmpty)
    // every result really is inside the radius, never the query itself
    out.foreach { r =>
      assert(r.getAs[Double]("cos") >= tau)
      assert(r.getAs[Long]("vec_id") != r.getAs[Long]("q_id"))
    }
    // soundness vs the exact radius set: every returned pair appears
    // in the brute-force all-pairs radius list with the same cosine
    val ids = out.map(_.getAs[Long]("vec_id")).toSet ++ (0L until 10L)
    val exact = graft.dedup.Dedup.embedNearDup(
      embeddings, tau, col("vec_id").isInCollection(ids)).collect()
      .flatMap(r => Seq(
        ((r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")), r.getAs[Double]("cos")),
        ((r.getAs[Long]("vec_b"), r.getAs[Long]("vec_a")), r.getAs[Double]("cos"))))
      .toMap
    out.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      assert(exact.get(key).contains(r.getAs[Double]("cos")), s"$key not exact")
    }
  }

  test("persisted ANN index: every part round-trips byte-equal and " +
    "serving the loaded model equals the fitting run") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ann-index").toString
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq.map {
        case a: Seq[_] => a.toList
        case x => x
      }).toSet
    val ivf = Similarity.fitIvf(embeddings, kmeansIters = 1)
    val pq = Similarity.fitPq(embeddings)
    val (ipCents, ipCb) = Similarity.fitIvfPq(embeddings, codebookIters = 1)
    val mips = Similarity.fitMipsBound(embeddings)
    assert(Similarity.saveIndex(spark, dir, 1L, Seq(
      "ivf" -> ivf, "pq" -> pq, "ivfpq_cents" -> ipCents,
      "ivfpq_cb" -> ipCb, "mips" -> mips)))
    // immutable versions: a second publish of v=1 is a no-op
    assert(!Similarity.saveIndex(spark, dir, 1L, Seq("ivf" -> ivf)))
    def loaded(part: String) =
      Similarity.loadIndexPart(spark, dir, part) // latest-version path
    // byte-equality of the round trip (floats survive parquet exactly)
    assert(rows(loaded("ivf")) === rows(ivf))
    assert(rows(loaded("pq")) === rows(pq))
    assert(rows(loaded("ivfpq_cents")) === rows(ipCents))
    assert(rows(loaded("ivfpq_cb")) === rows(ipCb))
    assert(rows(loaded("mips")) === rows(mips))
    // serving from the LOADED artifacts reproduces the fitting run
    val q = col("vec_id") < 5
    assert(rows(Similarity.serveIvf(embeddings, q, 5, loaded("ivf"))) ===
      rows(Similarity.annIvf(embeddings, q, 5, kmeansIters = 1)))
    assert(rows(Similarity.servePq(embeddings, q, 5, loaded("pq"))) ===
      rows(Similarity.annPq(embeddings, q, 5)))
    assert(rows(Similarity.serveIvfPq(embeddings, q, 5,
        loaded("ivfpq_cents"), loaded("ivfpq_cb"))) ===
      rows(Similarity.annIvfPq(embeddings, q, 5, codebookIters = 1)))
    assert(rows(Similarity.mipsAugmentWith(embeddings, q, loaded("mips"))) ===
      rows(Similarity.mipsAugment(embeddings, q)))
  }

  test("entry-level loaded serving: sim_mips_loaded and emb_pca_loaded " +
    "equal their fit twins row-for-row through the published artifact") {
    def rows(k: String): Seq[Seq[Any]] =
      SparkEntry.queries(k)(spark, sf).collect().toSeq.map(_.toSeq.map {
        case a: Seq[_] => a.toList
        case x => x
      })
    // the loaded MIPS bound reproduces the refit augmentation's
    // retrieval exactly (deterministic fit + exact float round-trip)
    assert(rows("sim_mips_loaded") == rows("sim_mips_ivf"))
    // the loaded PcaModel reproduces the in-session projection
    assert(rows("emb_pca_loaded") == rows("emb_project"))
  }

  test("kmeans assignment audit: every vector lands in exactly one " +
    "cell and a planted tight cluster reads cohesive") {
    val cents = Similarity.fitIvf(embeddings, kmeansIters = 1)
    val audit = Similarity.clusterAssignAudit(embeddings, cents).collect()
    val n = embeddings.count()
    assert(audit.map(_.getAs[Long]("n_vecs")).sum == n)
    audit.foreach { r =>
      val avg = r.getAs[Double]("avg_cos")
      val mn = r.getAs[Double]("min_cos")
      assert(avg >= mn && avg <= 1.0, r.toString)
    }
    // assignment emits one row per vector with the winning cosine
    val asg = Similarity.assignKmeans(embeddings, cents)
    assert(asg.count() == n)
    assert(asg.select("vec_id").distinct().count() == n)
  }

  test("silhouette: orthogonal clusters read clean margins, a planted " +
    "mislabel is the one crosser, a single-label corpus is empty") {
    import spark.implicits._
    def vec(axis: Int, x: Float): Seq[Float] = {
      val a = Array.fill(64)(0.0f); a(axis) = x; a.toSeq
    }
    // label 0 lives on axis 0, label 1 on axis 1 — orthogonal; vec 99
    // is labeled 0 but sits on label 1's axis (the mislabel)
    val rows = Seq(
      (1L, vec(0, 1.0f), 0), (2L, vec(0, 2.0f), 0), (3L, vec(0, 3.0f), 0),
      (11L, vec(1, 1.0f), 1), (12L, vec(1, 2.0f), 1), (13L, vec(1, 3.0f), 1),
      (99L, vec(1, 2.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.silhouetteAudit(rows).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Double]("avg_self_cos"),
          r.getAs[Double]("avg_other_cos"), r.getAs[Long]("n_crossers"))))
      .toMap
    assert(got(0)._1 == 4L && got(1)._1 == 3L)
    // the pure label-1 cluster: self = 1 (centroid on its own axis),
    // best-other well below (only the planted mislabel drags label
    // 0's centroid off the orthogonal axis: cos = .625/1.625 ≈ .385),
    // zero crossers
    assert(got(1)._2 > 0.99 && got(1)._3 < 0.5 && got(1)._4 == 0L, s"$got")
    // label 0 carries exactly the one planted crosser (vec 99 is
    // closer to label 1's centroid than to its own)
    assert(got(0)._4 == 1L, s"$got")
    // single-label corpus: "best other" does not exist — empty report
    assert(Similarity.silhouetteAudit(
      rows.filter(col("label") === 0)).count() == 0L)
  }

  test("abtt audit: a one-axis corpus reads full share per label, " +
    "an orthogonal stratum reads zero") {
    import spark.implicits._
    // labels 0/1 vary ONLY on axis 0 (the top component); label 2
    // varies only on axis 1, orthogonal to it. Every stratum is
    // centered AT the global mean (zero) — a stratum whose MEAN is
    // offset along v would legitimately read a high share (the
    // offset IS common-direction mass ABTT removes), which is not
    // the orthogonality this plant isolates.
    def vec(axis: Int, x: Float): Seq[Float] = {
      val a = Array.fill(64)(0.0f); a(axis) = x; a.toSeq
    }
    val ax0 = Seq(-4f, -3f, -2f, -1f, 1f, 2f, 3f, 4f)
    val ax1 = Seq(-0.2f, -0.1f, 0.1f, 0.2f)
    val rows = ax0.zipWithIndex.map { case (x, i) =>
      ((i + 1).toLong, vec(0, x), i % 2) } ++
      ax1.zipWithIndex.map { case (x, i) =>
        ((i + 9).toLong, vec(1, x), 2) }
    val df = rows.toDF("vec_id", "embedding", "label")
    val model = graft.sim.Similarity.pcaFitModel(df)
    val got = Similarity.abttAudit(df, model).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_vecs"),
          Option(r.getAs[java.lang.Long]("top_share_ppm")).map(_.toLong))))
      .toMap
    assert(got(0)._1 == 4L && got(1)._1 == 4L && got(2)._1 == 4L)
    // the on-axis strata hold ~all their centered mass on the top
    // component; micro-unit quantization leaves ppm-scale slack
    assert(got(0)._2.exists(_ > 999000L), s"$got")
    assert(got(1)._2.exists(_ > 999000L), s"$got")
    assert(got(2)._2.exists(_ < 1000L), s"$got")
    // the real corpus: shares are valid ppm and strata are non-empty
    val real = Similarity.abttAudit(embeddings,
      graft.sim.Similarity.pcaFitModel(embeddings)).collect()
    assert(real.nonEmpty && real.forall { r =>
      val s = Option(r.getAs[java.lang.Long]("top_share_ppm"))
      s.forall(v => v >= 0L && v <= 1000000L)
    })
  }

  test("abtt audit survives |pu| past the int64 product wrap " +
    "(term widens BEFORE the multiply — ADVICE r15)") {
    import spark.implicits._
    // projection magnitude 4000 → pu = 4e9 → pu² = 1.6e19 > 2⁶³−1:
    // a LongType pu*pu wraps NEGATIVE and the share craters; the
    // DECIMAL-widened term keeps the exact value. One-axis corpus
    // centered at zero → every stratum's share must read ~10⁶ ppm.
    def vec(x: Float): Seq[Float] = {
      val a = Array.fill(64)(0.0f); a(0) = x; a.toSeq
    }
    val rows = Seq(-4000f, -2000f, 2000f, 4000f).zipWithIndex
      .map { case (x, i) => ((i + 1).toLong, vec(x), 0) }
    val df = rows.toDF("vec_id", "embedding", "label")
    val model = graft.sim.Similarity.pcaFitModel(df)
    val got = Similarity.abttAudit(df, model).collect()
    assert(got.length == 1)
    val share = Option(got.head.getAs[java.lang.Long]("top_share_ppm"))
    assert(share.exists(s => s > 999000L && s <= 1000001L),
      s"wrapped or wrong: $share")
  }

  test("delta-ingest audit flags cells where the delta concentrates " +
    "and nulls its verdict when a side is empty") {
    import spark.implicits._
    def vec(axis: Int): Seq[Float] = {
      val a = Array.fill(64)(0.0f); a(axis) = 1.0f; a.toSeq
    }
    val cents = Seq((0L, vec(0)), (1L, vec(1))).toDF("cell_id", "c_emb")
    // base splits 50/50 across the cells; the delta all lands in cell 1
    val base = (1 to 10).map(i => (i.toLong, vec(i % 2)))
      .toDF("vec_id", "embedding")
    val delta = (11 to 14).map(i => (i.toLong, vec(1)))
      .toDF("vec_id", "embedding")
    val got = Similarity.deltaIngestAudit(base, delta, cents).collect()
      .map(r => r.getAs[Long]("cell_id") ->
        ((r.getAs[Long]("n_base"), r.getAs[Long]("n_delta"),
          r.getAs[Long]("base_share_ppm"), r.getAs[Long]("delta_share_ppm"),
          r.getAs[Boolean]("drifted")))).toMap
    assert(got === Map(
      0L -> ((5L, 0L, 500000L, 0L, true)),
      1L -> ((5L, 4L, 500000L, 1000000L, true))), s"$got")
    // an empty delta must null shares and verdicts, never flag
    val none = Similarity.deltaIngestAudit(base,
      delta.filter(lit(false)), cents).collect()
    assert(none.forall(r => r.isNullAt(r.fieldIndex("delta_share_ppm")) &&
      r.isNullAt(r.fieldIndex("drifted"))), none.mkString(","))
  }

  test("embedding stats report full dimensionality and positive norms") {
    val rows = Similarity.embStats(embeddings).collect()
    assert(rows.map(_.getAs[Int]("label")).toSet == (0 until 10).toSet)
    rows.foreach { r =>
      assert(r.getAs[Long]("dim") == 64L)
      assert(r.getAs[Double]("min_norm") > 0.0)
      assert(r.getAs[Double]("avg_norm") >= r.getAs[Double]("min_norm"))
      assert(r.getAs[Double]("max_norm") >= r.getAs[Double]("avg_norm"))
    }
  }

  test("IVF-PQ ANN returns full top-k with meaningful brute-force recall") {
    val out = Similarity.annIvfPq(embeddings, col("vec_id") < 10, 5).collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.values.foreach(rows => assert(rows.length == 5))
    val brute = Similarity.bruteTopK(embeddings, col("vec_id") < 10, 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val ivfpq = out.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    assert((brute intersect ivfpq).size >= 10, s"overlap ${(brute intersect ivfpq).size}/50")
  }

  test("a Lloyd pass moves codewords to their cluster means") {
    import spark.implicits._
    // one (cell, subspace): samples cluster at ~0.5 and ~9.5; seeds
    // at 0 and 4 split them correctly, so one pass lands on the means
    val samples = Seq(0.0f, 0.5f, 1.0f, 9.0f, 9.5f, 10.0f)
      .map(v => (0L, 0, Array(v))).toDF("cell_id", "s", "r_sub")
    val init = Seq((0L, 0, 1, Array(0.0f)), (0L, 0, 2, Array(4.0f)))
      .toDF("cell_id", "s", "code", "c_sub")
    val refined = Similarity.refineCodebook(samples, init, iters = 1, sub = 1)
      .collect().map(r => r.getAs[Int]("code") ->
        r.getAs[scala.collection.Seq[Float]]("c_sub").head).toMap
    assert(refined == Map(1 -> 0.5f, 2 -> 9.5f))
  }

  test("IVF-PQ with refined codebooks returns full top-k with recall") {
    val out = Similarity.annIvfPq(embeddings, col("vec_id") < 10, 5,
      codebookIters = 1).collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.values.foreach(rows => assert(rows.length == 5))
    val brute = Similarity.bruteTopK(embeddings, col("vec_id") < 10, 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val got = out.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    assert((brute intersect got).size >= 10, s"overlap ${(brute intersect got).size}/50")
  }

  test("full-corpus codebook training keeps recall at equal model size") {
    val brute = Similarity.bruteTopK(embeddings, col("vec_id") < 10, 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    def overlap(trainOnFull: Boolean): Int = {
      val got = Similarity.annIvfPq(embeddings, col("vec_id") < 10, 5,
        codebookIters = 1, trainOnFull = trainOnFull).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
      (brute intersect got).size
    }
    val sampled = overlap(trainOnFull = false)
    val full = overlap(trainOnFull = true)
    // identical seed, identical nCodes/m — only the Lloyd training set
    // differs, so recall must not degrade when the codewords move to
    // the true (count-weighted) per-cell means
    assert(full >= sampled, s"full-trained recall $full < sampled $sampled")
  }

  test("power iteration yields a unit component with a plausible eigenvalue") {
    val rows = Similarity.pcaTopComponent(embeddings, iters = 4).collect()
      .sortBy(_.getAs[Long]("dim_idx"))
    assert(rows.length == 64)
    val v = rows.map(_.getAs[Double]("loading"))
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-3)
    // deterministic sign: the largest-|loading| dimension is positive
    assert(v.maxBy(math.abs) > 0)
    val lambda = rows.head.getAs[Double]("eigenvalue")
    // top eigenvalue is bracketed by the covariance trace: at least
    // the average per-dim variance, at most the total variance
    val varCols = (0 until 64).map(j => var_pop(col("embedding").getItem(j)))
    val trace = embeddings.agg(varCols.reduce(_ + _).as("t")).head().getDouble(0)
    assert(lambda >= trace / 64 - 1e-9 && lambda <= trace + 1e-9)
  }

  test("pca projection is centered and carries the component's variance") {
    val proj = Similarity.pcaProject(embeddings).collect()
      .map(_.getAs[Double]("proj"))
    assert(proj.length == embeddings.count())
    val mean = proj.sum / proj.length
    val variance = proj.map(p => (p - mean) * (p - mean)).sum / proj.length
    val lambda = Similarity.pcaTopComponent(embeddings).collect()
      .head.getAs[Double]("eigenvalue")
    // projections of centered data have mean 0; their variance is the
    // Rayleigh quotient the fit reported (exact at convergence, so
    // allow the 4-iteration gap)
    assert(math.abs(mean) < 1e-3, s"projection mean $mean")
    assert(math.abs(variance - lambda) / lambda < 0.05,
      s"projection variance $variance vs eigenvalue $lambda")
  }

  test("fit-once PcaModel applies identically to the fused fit+project") {
    val model = Similarity.pcaFitModel(embeddings)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("proj")).toMap
    val applied = rows(Similarity.pcaApply(embeddings, model))
    // same model applied twice — no refit, bit-identical outputs
    assert(applied == rows(Similarity.pcaApply(embeddings, model)))
    assert(applied == rows(Similarity.pcaProject(embeddings)))
    assert(model.mean.length == 64 && model.loadings.length == 64)
    // the cross-job half: save, load, apply — bit-identical to the
    // in-session model, and republish is the idempotent no-op
    val dir = s"/tmp/graft-test-pca-${System.nanoTime()}"
    Similarity.savePca(spark, model, dir, 0L)
    Similarity.savePca(spark, model, dir, 0L)
    val loaded = Similarity.loadPca(spark, dir)
    assert(loaded.mean.sameElements(model.mean)
      && loaded.loadings.sameElements(model.loadings)
      && loaded.eigenvalue == model.eigenvalue)
    assert(applied == rows(Similarity.pcaApply(embeddings, loaded)))
  }

  test("persisted-centered power iteration is value-identical to the default") {
    val a = Similarity.pcaTopComponent(embeddings, iters = 4)
      .collect().map(_.toSeq)
    val b = Similarity.pcaTopComponent(embeddings, iters = 4,
      persistCentered = true).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("power iteration's Rayleigh quotient is monotone in iterations") {
    def lambdaAt(iters: Int): Double =
      Similarity.pcaTopComponent(embeddings, iters).head().getAs[Double]("eigenvalue")
    assert(lambdaAt(4) >= lambdaAt(2) - 1e-6)
  }

  test("int8 quantization audit bounds per-dimension error by scale/2") {
    val rows = Similarity.quantizeAudit(embeddings).collect()
    assert(rows.length == embeddings.count())
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      assert(scale > 0.0)
      // symmetric rounding: worst per-dim error is half a step (both
      // sides are 6dp-rounded, so allow that rounding's granularity)
      assert(r.getAs[Double]("max_err") <= scale / 2 + 1e-6)
      // 64 dims, each ≤ scale/2 ⇒ L2 ≤ 4·scale
      assert(r.getAs[Double]("l2_err") <= 4 * scale + 1e-6)
    }
  }

  test("PQ ANN returns full top-k with meaningful brute-force recall") {
    val out = Similarity.annPq(embeddings, col("vec_id") < 10, 5).collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.values.foreach(rows => assert(rows.length == 5))
    val brute = Similarity.bruteTopK(embeddings, col("vec_id") < 10, 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val pq = out.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    assert((brute intersect pq).size >= 10, s"overlap ${(brute intersect pq).size}/50")
  }

  test("centroid outliers return the k farthest vectors exactly") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
    val k = 5
    val out = Similarity.centroidOutliers(emb, k).collect()
    assert(out.length == k)
    // recompute brute-force in the driver
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    val d = vecs.head._2.length
    val mu = Array.tabulate(d)(j => vecs.map(_._2(j).toDouble).sum / vecs.length)
    val muF = mu.map(_.toFloat)
    val dists = vecs.map { case (id, v) =>
      id -> math.sqrt(v.indices.map { j =>
        val df = v(j).toDouble - muF(j).toDouble; df * df }.sum) }
    val expect = dists.sortBy { case (id, dd) => (-dd, id) }.take(k)
      .map(_._1).toSeq
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == expect)
    // distances reported descending
    val ds = out.map(_.getAs[Double]("dist")).toSeq
    assert(ds == ds.sorted.reverse)
  }

  test("label drift flags a shifted label and partitions the corpus") {
    import spark.implicits._
    val d = 64
    // label 0: tight cluster at the origin; label 1: shifted along dim 0
    val rows = (0 until 20).map { i =>
      val base = Array.fill(d)(0.0f)
      base(i % d) = 0.01f * (i + 1)
      (i.toLong, base.toSeq, 0)
    } ++ (20 until 40).map { i =>
      val base = Array.fill(d)(0.0f)
      base(0) = 2.0f
      base(i % d) = base(i % d) + 0.01f * (i + 1)
      (i.toLong, base.toSeq, 1)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.labelDrift(emb).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("centroid_dist"),
          r.getAs[Double]("dispersion"))).toMap
    assert(out.keySet == Set(0, 1))
    assert(out(0)._1 + out(1)._1 == 40L)
    // both labels sit ~1 unit from the midpoint global centroid, and
    // the shifted label is at least as far as the origin cluster
    assert(out(1)._2 > 0.5 && out(0)._2 > 0.5)
    assert(out.values.forall(_._3 >= 0.0))
  }

  test("ann recall audit measures the exact IVF/brute overlap per query") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.annRecallAudit(emb, col("vec_id") < 10).collect()
    assert(out.length == 10)
    val brute = Similarity.bruteTopK(emb, col("vec_id") < 10, 5).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val ivf = Similarity.annIvf(emb, col("vec_id") < 10, 5).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    out.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val expect = (brute(q) & ivf.getOrElse(q, Set.empty[Long])).size
      assert(r.getAs[Long]("k") == 5L)
      assert(r.getAs[Long]("n_hit") == expect, s"q$q")
      assert(math.abs(r.getAs[Double]("recall") - expect / 5.0) < 1e-9)
    }
  }

  test("cell balance counts every vector once and flags a planted hot cell") {
    import spark.implicits._
    // centroids at vec_id 0, 50, 100 (stride 50). Cluster 6 extra
    // vectors onto centroid 0's axis: cell 0 holds 7 of 9 vectors —
    // 7·3 > 9·2, strictly above 2× the mean cell size → hot; the
    // others hold 1 each (3 < 18 → cold)
    val emb = (Seq(
      (0L, Array(1f, 0f, 0f)), (50L, Array(0f, 1f, 0f)),
      (100L, Array(0f, 0f, 1f)),
      (1L, Array(0.9f, 0.1f, 0f)), (2L, Array(0.8f, 0.2f, 0f)),
      (3L, Array(0.95f, 0.05f, 0f)), (4L, Array(0.85f, 0.15f, 0f)),
      (5L, Array(0.99f, 0.01f, 0f)), (6L, Array(0.97f, 0.03f, 0f))))
      .toDF("vec_id", "embedding").withColumn("label", lit("x"))
    val out = Similarity.cellBalance(emb).collect()
      .map(r => r.getAs[Long]("cell_id") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Boolean]("hot"))).toMap
    assert(out == Map(0L -> (7L, true), 50L -> (1L, false),
      100L -> (1L, false)), s"got $out")
    // shares are exact fractions of a full partition of the corpus
    val shares = Similarity.cellBalance(emb).agg(sum("n_vecs")).head().getLong(0)
    assert(shares == 9L)
  }

  test("mips top-k ranks by inner product, not cosine") {
    import spark.implicits._
    // q = (1,0). Corpus: big aligned (10,0), unit aligned (1,0) twin,
    // slightly-off huge (10,5): cosine prefers the unit twin over the
    // off-axis giant, MIPS prefers raw magnitude
    val emb = Seq(
      (0L, Array(1f, 0f), "q"),
      (1L, Array(10f, 0f), "c"),
      (2L, Array(1f, 0f), "c"),
      (3L, Array(10f, 5f), "c")).toDF("vec_id", "embedding", "label")
    val mips = Similarity.mipsTopK(emb, col("vec_id") === 0, 3).collect()
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id"))
    assert(mips.toSeq == Seq(1L, 3L, 2L), s"got ${mips.toSeq}")
    val cos = Similarity.bruteTopK(emb, col("vec_id") === 0, 3).collect()
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id"))
    // cosine ties the aligned pair ahead of the off-axis giant
    assert(cos.take(2).toSet == Set(1L, 2L) && cos(2) == 3L, s"got ${cos.toSeq}")
  }

  test("norm augmentation makes cosine ranking equal MIPS ranking") {
    import graft.functions.expressions.{cosine_sim, dot_ff}
    val emb = Tables.embeddings(spark, sf)
    val isQuery = col("vec_id") < 10
    val aug = Similarity.mipsAugment(emb, isQuery)
    // every augmented CORPUS vector has the same norm (= max corpus
    // norm), which is the whole point of the reduction
    val norms = aug.filter(!isQuery).select(
      dot_ff(col("embedding"), col("embedding")).as("sq"))
      .agg(min("sq").as("lo"), max("sq").as("hi")).head()
    assert(norms.getAs[Double]("hi") - norms.getAs[Double]("lo") < 1e-3)
    // per-query ranking parity against out-of-corpus candidates (the
    // documented MIPS posture: zero-augmented query rows don't serve
    // as corpus candidates): exact dot on the originals vs cosine on
    // the augmented frame, same deterministic tie-break
    def ranking(corpus: org.apache.spark.sql.DataFrame,
                queries: org.apache.spark.sql.DataFrame,
                score: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
                  org.apache.spark.sql.Column): Map[Long, Seq[Long]] = {
      val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      corpus.join(broadcast(q))
        .select(col("q_id"), col("vec_id"),
          score(col("q_emb"), col("embedding")).as("s"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("q_id")
            .orderBy(col("s").desc, col("vec_id"))))
        .filter(col("rank") <= 5).collect()
        .groupBy(_.getAs[Long]("q_id"))
        .map { case (k, rs) =>
          k -> rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq }
    }
    val mips = ranking(emb.filter(!isQuery), emb.filter(isQuery), dot_ff(_, _))
    val augCos = ranking(aug.filter(!isQuery), aug.filter(isQuery), cosine_sim(_, _))
    assert(mips.nonEmpty)
    mips.foreach { case (q, expect) =>
      assert(augCos(q) == expect, s"query $q: aug=${augCos(q)} mips=$expect") }
  }

  test("maxsim: each query vector credits its best match, sums exactly") {
    import spark.implicits._
    // groups of 2 in 2-d. query group 0 = {[1,0], [0,1]}.
    // doc 1 = {[1,0],[1,0]} → 1 + 0 = 1.0 (redundant doc: second
    // query vector finds nothing); doc 2 = {[1,0],[0,1]} → 2.0
    // (each query vector has an aligned chunk); doc 3 =
    // {[.6,.8],[.6,.8]} → 0.6 + 0.8 = 1.4 (uniformly mediocre)
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(1f, 0f)), (3L, Array(1f, 0f)),
      (4L, Array(1f, 0f)), (5L, Array(0f, 1f)),
      (6L, Array(0.6f, 0.8f)), (7L, Array(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.maxSim(vecs, col("grp") === 0, groupSize = 2, k = 3)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getAs[Long]("rank"), r.getAs[Long]("d_grp"),
      r.getAs[Double]("maxsim"))).toList ==
      List((1L, 2L, 2.0), (2L, 3L, 1.4), (3L, 1L, 1.0)))
    // the pooled single-vector ranking would TIE docs 1 and 2 at the
    // mean-vector level only when redundancy is averaged away —
    // maxsim separates them by exactly the second query vector's
    // credit, which is the late-interaction point
  }

  test("ivf maxsim equals the exact kernel under full probing, and " +
      "surfaced pairs are always bit-equal") {
    // probes covering every cell ⇒ every group is a candidate ⇒ the
    // IVF path must reproduce the exact operator row for row
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_grp"), r.getAs[Long]("rank"),
        r.getAs[Long]("d_grp"), r.getAs[Double]("maxsim"))).toSet
    val exact = Similarity.maxSim(embeddings, col("grp") < 2)
    val full = Similarity.maxSimIvf(embeddings, col("grp") < 2,
      centroidStride = 100L, nProbe = 5) // 5 cells, all probed
    assert(key(full) == key(exact))
    // under REAL pruning (2 of 10 cells), membership may shrink but
    // any surfaced pair's score must equal the exact kernel's for
    // that pair — the candidate cut never changes a score
    val exactAll = Similarity.maxSim(embeddings, col("grp") < 2, k = 1000)
      .collect()
      .map(r => (r.getAs[Long]("q_grp"), r.getAs[Long]("d_grp")) ->
        r.getAs[Double]("maxsim")).toMap
    val pruned = Similarity.maxSimIvf(embeddings, col("grp") < 2).collect()
    assert(pruned.nonEmpty)
    pruned.foreach { r =>
      val k2 = (r.getAs[Long]("q_grp"), r.getAs[Long]("d_grp"))
      assert(exactAll(k2) == r.getAs[Double]("maxsim"), s"pair $k2")
    }
  }

  test("threshold plan: identical stratum at 1.0, quantiles ordered, " +
      "matches a driver-side replay") {
    import spark.implicits._
    // label "same": 64 identical vectors — every null pair has
    // cosine exactly 1.0. label "mix": a spread of directions. One
    // nibble (16 buckets) pigeonholes both strata into collisions.
    val vecs =
      (0L until 64L).map(i => (i, "same", Array(1.0f, 2.0f, 2.0f))) ++
      (100L until 300L).map(i => (i, "mix",
        Array(math.cos(i.toDouble).toFloat, math.sin(i.toDouble).toFloat,
          ((i % 7).toDouble / 7.0).toFloat)))
    val emb = vecs.toDF("vec_id", "label", "embedding")
    val out = Similarity.thresholdPlan(emb, nibbles = 1).collect()
      .map(r => r.getAs[String]("label") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("p50_cos"),
          r.getAs[Double]("p90_cos"), r.getAs[Double]("p99_cos"),
          r.getAs[Double]("max_cos")))).toMap
    val s = out("same")
    assert(s._2 == 1.0 && s._3 == 1.0 && s._4 == 1.0 && s._5 == 1.0, s"$s")
    val m = out("mix")
    assert(m._2 <= m._3 && m._3 <= m._4 && m._4 <= m._5, s"$m")
    // driver-side replay of the deterministic pairing + quantiles
    def md5b(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      (d(0).toInt >> 4) & 0xf // first hex nibble = 16 buckets
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ref = vecs.groupBy(_._2).map { case (lab, vs) =>
      val pairs = vs.groupBy(v => md5b(v._1)).toSeq.flatMap { case (_, g) =>
        g.sortBy(_._1).grouped(2).filter(_.size == 2)
          .map(p => cos(p.head._3, p.last._3))
      }.sorted.toIndexedSeq
      val n = pairs.length
      lab -> ((n.toLong, pairs((n - 1) * 5000 / 10000),
        pairs((n - 1) * 9000 / 10000), pairs((n - 1) * 9900 / 10000),
        pairs.last))
    }
    assert(out == ref, s"got $out\nref $ref")
  }

  test("diversity: moment identity equals the brute pairwise mean") {
    import spark.implicits._
    // label 0: spread points; label 1: a COLLAPSED stratum (all
    // identical) must read dispersion 0 — the audit's whole point
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f), 0), (2L, Array(0.0f, 3.0f, 1.0f), 0),
      (3L, Array(2.0f, 1.0f, 0.5f), 0),
      (4L, Array(0.5f, 0.5f, 0.5f), 1), (5L, Array(0.5f, 0.5f, 0.5f), 1))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = Similarity.diversity(df).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("trace_cov_u2"),
          r.getAs[Long]("mean_pair_sqdist_u2")))).toMap
    // brute reference in exact integer micro-units over ALL ordered
    // pairs (self-pairs at 0) — the identity the operator implements
    def micro(v: Array[Float]) = v.map(x => math.round(x.toDouble * 1e6))
    val ref = vecs.groupBy(_._3).map { case (lab, vs) =>
      val ms = vs.map(v => micro(v._2))
      val n = ms.size.toLong
      val pairSum = (for (a <- ms; b <- ms) yield
        a.zip(b).map { case (x, y) => val d = x - y; BigInt(d) * d }.sum).sum
      val mean = pairSum / BigInt(n * n)
      lab -> mean.toLong
    }
    assert(got.keySet === Set(0, 1))
    ref.foreach { case (lab, mp) =>
      assert(got(lab)._3 === mp, s"label $lab")
      assert(got(lab)._2 === mp / 2)
    }
    assert(got(1) === ((2L, 0L, 0L))) // collapsed stratum reads zero
  }

  test("hard negatives: cross-label only, band fences both ends, top-k order") {
    import spark.implicits._
    // query q (label 0). candidates: same-label near-identical (must
    // be excluded however similar), cross-label in band (kept),
    // cross-label near-dup above hi (excluded — false-negative
    // hazard), cross-label orthogonal below lo (excluded — trivial)
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),   // the query
      (2L, Array(0.99f, 0.1f, 0.0f), 0),  // same label: out
      (3L, Array(0.8f, 0.6f, 0.0f), 1),   // cos .8: in band
      (4L, Array(0.6f, 0.8f, 0.0f), 1),   // cos .6: in band
      (5L, Array(1.0f, 0.01f, 0.0f), 1),  // cos ~.99995 > hi: out
      (6L, Array(0.0f, 1.0f, 0.0f), 1))   // cos 0 < lo: out
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(vecs, col("vec_id") === 1, 5,
        lo = 0.3, hi = 0.9).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toList
    assert(got === List((1L, 1L, 3L, 0.8), (1L, 2L, 4L, 0.6)), s"$got")
  }

  test("knn label vote: a mislabeled point is outvoted by its true cluster") {
    import spark.implicits._
    // cluster A = (1,0) ids 1-3 labeled 0; cluster B = (0,1) ids 4-6
    // labeled 1; id 7 sits IN cluster B but carries label 0 — its 2
    // nearest (ids 4,5 by the vec_id tiebreak) both vote 1, so it is
    // the one miss: label 0 accuracy 3/4, label 1 accuracy 3/3
    val vecs = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0), (3L, Array(1f, 0f), 0),
      (4L, Array(0f, 1f), 1), (5L, Array(0f, 1f), 1), (6L, Array(0f, 1f), 1),
      (7L, Array(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnLabelVote(vecs, lit(true), k = 2).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_correct"),
          r.getAs[Long]("acc_ppm")))).toMap
    assert(got === Map(0 -> ((4L, 3L, 750000L)), 1 -> ((3L, 3L, 1000000L))),
      s"$got")
  }

  test("probe curve: a neighbor in the SECOND-ranked cell appears exactly " +
    "at nprobe 2") {
    import spark.implicits._
    // centroids (stride 2) = ids 0, 2, 4. The query's true top-1
    // (id 3) lives in cell c2 — the query's SECOND-closest centroid —
    // while its own cell c0 only offers worse candidates (ids 0, 5):
    // nprobe=1 must read recall 0, nprobe=2 recall 1e6
    val vecs = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0.95f, 0.31f)),  // the query, assigned c0
      (2L, Array(0.7f, 0.7f)),
      (3L, Array(0.9f, 0.42f)),   // true top-1, assigned c2
      (4L, Array(0f, 1f)),
      (5L, Array(1f, -0.2f)))     // c0 member, cos .87 — a decoy
      .toDF("vec_id", "embedding")
    val got = Similarity.probeCurve(vecs, col("vec_id") === 1, k = 1,
        probes = Seq(1, 2), centroidStride = 2L).collect()
      .map(r => r.getAs[Int]("nprobe") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("n_hit"), r.getAs[Long]("recall_ppm")))).toMap
    assert(got === Map(
      1 -> ((1L, 1L, 0L, 0L)),
      2 -> ((1L, 1L, 1L, 1000000L))), s"$got")
  }

  test("hamming recall: sign-agreement beats magnitude in the binary " +
    "ranking, and the audit reads exactly that disagreement") {
    import spark.implicits._
    def v(pairs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f); pairs.foreach { case (i, x) => a(i) = x }; a
    }
    // query bits {0,1,2}. a matches ALL sign bits (ham 0) but its
    // lopsided magnitudes give cos .6156; b flips one bit (ham 1)
    // yet is nearly parallel (cos .8165) — the binary filter picks
    // a, the exact ranking picks b: recall@1 = 0
    val disagree = Seq(
      (0L, v(0 -> 1f, 1 -> 1f, 2 -> 1f)),
      (1L, v(0 -> 0.1f, 1 -> 0.1f, 2 -> 3f)),
      (2L, v(0 -> 1f, 1 -> 1f, 2 -> -0.0001f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.hammingRecall(disagree, col("vec_id") === 0, k = 1)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("k"),
        r.getAs[Long]("n_hit"), r.getAs[Long]("recall_ppm"))).toList
    assert(got === List((0L, 1L, 0L, 0L)), s"$got")
    // a parallel candidate agrees on every bit AND on cosine
    val agree = Seq(
      (0L, v(0 -> 1f, 1 -> 1f, 2 -> 1f)),
      (1L, v(0 -> 2f, 1 -> 2f, 2 -> 2f)),
      (2L, v(5 -> 1f)))
      .toDF("vec_id", "embedding")
    val ok = Similarity.hammingRecall(agree, col("vec_id") === 0, k = 1)
      .collect().map(r => (r.getAs[Long]("n_hit"),
        r.getAs[Long]("recall_ppm"))).toList
    assert(ok === List((1L, 1000000L)), s"$ok")
  }

  test("truncation recall: a prefix that inverts the ranking reads 0, " +
    "one that preserves it reads 1e6") {
    import spark.implicits._
    // full-dim top-1 of the query is id 2 (cos 1.0). On the first 2
    // coordinates both candidates tie at cos 1.0 and the vec_id
    // tiebreak picks id 1 — recall@1 drops to 0 at d=2; at d=3 the
    // third coordinate separates them again and recall is 1e6
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0f, 0.9f, 0f)),
      (2L, Array(0.95f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.truncationRecall(vecs, col("vec_id") === 0,
        k = 1, dims = Seq(2, 3)).collect()
      .map(r => r.getAs[Int]("d") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("n_hit"), r.getAs[Long]("recall_ppm")))).toMap
    assert(got === Map(2 -> ((1L, 1L, 0L, 0L)), 3 -> ((1L, 1L, 1L, 1000000L))),
      s"$got")
  }

  test("mrr: single-cell IVF degenerates to brute — every truth at rank 1") {
    import spark.implicits._
    // only id 0 is ≡0 mod 50 → ONE cell holds everything, so the
    // candidate ranking IS the brute ranking and MRR is exactly 1e6
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.8f, 0.3f)),
      (3L, Array(0.5f, 0.5f)), (4L, Array(0.1f, 0.9f)), (5L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val row = Similarity.mrrAudit(vecs, col("vec_id") < 2).collect()(0)
    assert((row.getAs[Long]("n_queries"), row.getAs[Long]("n_found"),
      row.getAs[Long]("found_ppm"), row.getAs[Long]("mrr_ppm")) ===
      ((2L, 2L, 1000000L, 1000000L)))
  }

  test("mrr: a true neighbor in an unprobed cell scores 0, never drops the query") {
    import spark.implicits._
    // centroids c0/c1/c2 (ids 0,50,100). The query leans toward
    // cells 0 and 2 (its two probes) but its by-far nearest vector
    // sits in cell 1 — the IVF list can't contain it
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (50L, Array(0f, 1f, 0f, 0f)),
      (100L, Array(0f, 0f, 1f, 0f)),
      (7L, Array(0.1f, 0f, 0.05f, 1f)),     // the query
      (60L, Array(0f, 0.3f, 0f, 0.95f)))    // its truth, assigned to c1
      .toDF("vec_id", "embedding")
    val row = Similarity.mrrAudit(vecs, col("vec_id") === 7).collect()(0)
    assert((row.getAs[Long]("n_queries"), row.getAs[Long]("n_found"),
      row.getAs[Long]("found_ppm"), row.getAs[Long]("mrr_ppm")) ===
      ((1L, 0L, 0L, 0L)))
  }

  test("precision curve: same-label bands read 1e6, cross bands 0, cumulative exact") {
    import spark.implicits._
    // two tight same-label pairs (cos ≈ 1 → top bin), all cross
    // pairs near-orthogonal (cos ≈ 0 → the middle bin)
    val vecs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.99f, 0.01f), 0),
      (2L, Array(0f, 1f), 1), (3L, Array(0.01f, 0.99f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.precisionCurve(vecs, lit(true), k = 3).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_same"),
          r.getAs[Long]("precision_ppm"), r.getAs[Long]("cum_pairs"),
          r.getAs[Long]("cum_same"), r.getAs[Long]("cum_precision_ppm")))).toMap
    assert(got === Map(
      19L -> ((4L, 4L, 1000000L, 4L, 4L, 1000000L)),
      10L -> ((8L, 0L, 0L, 12L, 4L, 333333L))), s"$got")
  }

  test("cell purity: dominant-label share exact, label tie breaks low") {
    import spark.implicits._
    // cell 0: labels {0,0,1} → top 0 at 666666 ppm;
    // cell 50: labels {2,1} → tie at 1 each, lower label 1 wins
    val vecs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.99f, 0.01f), 0),
      (2L, Array(0.98f, 0.02f), 1),
      (50L, Array(0f, 1f), 2), (51L, Array(0.01f, 0.99f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.cellPurity(vecs).collect()
      .map(r => r.getAs[Long]("cell_id") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Int]("top_label"),
          r.getAs[Long]("purity_ppm")))).toMap
    assert(got === Map(
      0L -> ((3L, 0, 666666L)),
      50L -> ((2L, 1, 500000L))), s"$got")
  }

  test("bitext mining: mutual-best only, exact ratio margins, hub suitor excluded") {
    import spark.implicits._
    // a0↔b0 and a1↔b1 are mutual identicals; b2 courts a0 (cos .8)
    // but a0's best is b0 — b2 must NOT produce a pair. Margins are
    // exact: a0's top list {1e6, 8e5, 0} → 3e12 div 1.8e6 = 1666666
    val vecs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0),
      (10L, Array(1f, 0f), 1), (11L, Array(0f, 1f), 1),
      (12L, Array(0.8f, 0.6f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.bitextMine(vecs, col("label") === 0,
        col("label") === 1).collect()
      .map(r => r.getAs[Long]("a_id") ->
        ((r.getAs[Long]("b_id"), r.getAs[Long]("cos_micro"),
          r.getAs[Long]("fwd_margin_ppm"), r.getAs[Long]("bwd_margin_ppm")))).toMap
    assert(got === Map(
      0L -> ((10L, 1000000L, 1666666L, 2000000L)),
      1L -> ((11L, 1000000L, 1875000L, 2000000L))), s"$got")
  }

  test("postfilter recall: a distractor outranking the truth costs " +
    "exactly the budget it hides behind") {
    import spark.implicits._
    // query (1,0); overall ranks: d1 (cos≈.999) > m1 (≈.981) >
    // d2 (≈.894) > m2 (0). Truth at k=2 = {m1, m2} with unfiltered
    // ranks 2 and 4 — budget 2 recalls only m1, budget 4 both.
    val emb = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(1f, 0.05f), 1),
      (2L, Array(1f, 0.2f), 2),
      (3L, Array(1f, 0.5f), 3),
      (4L, Array(0f, 1f), 4))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.postfilterRecall(emb, col("vec_id") === 0,
        col("label") % 2 === 0, k = 2, budgets = Seq(2, 4)).collect()
      .map(r => r.getAs[Long]("budget") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("recall_ppm"),
          r.getAs[Long]("n_full")))).toMap
    assert(got === Map(
      2L -> ((1L, 500000L, 0L)),
      4L -> ((1L, 1000000L, 1L))), s"$got")
  }

  test("isotropy audit: a one-axis corpus reads share 1.0, centered " +
    "mean reads zero offset") {
    import spark.implicits._
    // all variance on the x axis, mean exactly the origin: the top
    // component holds everything (share 1.0), no common offset
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(-1f, 0f), 1),
      (2L, Array(2f, 0f), 0), (3L, Array(-2f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val model = Similarity.pcaFitModel(emb, iters = 4, dim = 2)
    val r = Similarity.isotropyAudit(emb, model).head()
    assert(r.getAs[Long]("n_vecs") === 4L)
    assert(r.getAs[Double]("mean_sq_norm") === 0.0)
    // avg squared norm = (1 + 1 + 4 + 4) / 4 = 2.5 — all of it on
    // the top component
    assert(r.getAs[Double]("total_var") === 2.5)
    assert(r.getAs[Double]("top_eigenvalue") === 2.5)
    assert(r.getAs[Double]("top_share") === 1.0)
  }
}
