package graft

import org.apache.spark.sql.functions.col

import graft.ops.Graph

class GraphSpec extends SparkSpec {

  test("pagerank concentrates mass on a planted hub") {
    import spark.implicits._
    // star: 1..5 all point at 6; 6 points back at 1
    val edges = Seq((1L, 6L), (2L, 6L), (3L, 6L), (4L, 6L), (5L, 6L), (6L, 1L))
      .toDF("src", "dst")
    val rows = Graph.pageRank(edges).collect()
    val pr = rows.map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    assert(pr(6L) > pr(1L), s"hub not on top: $pr")
    assert(pr(1L) > pr(2L)) // 1 receives the hub's whole outflow
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L) && pr(4L) == pr(5L))
    // fixed-point conservation: mass never exceeds the scale (it can
    // only leak through integer floors and dangling nodes) — and the
    // leak is now carried on every row as the pr_sum audit column
    assert(pr.values.sum <= 1000000000000L)
    assert(rows.forall(_.getAs[Long]("pr_sum") == pr.values.sum))
  }

  test("personalized pagerank: mass flows only from the seed set; " +
    "seed-unreachable nodes read exactly 0") {
    import spark.implicits._
    // seed 3 ↔ 1 two-cycle (closed: no dangling leak) plus a
    // seedless pair 4 → 2 that never receives teleport OR inflow
    val edges = Seq((3L, 1L), (1L, 3L), (4L, 2L)).toDF("src", "dst")
    val rows = Graph.personalizedPageRank(edges, col("node") === 3).collect()
    val pr = rows.map(r => r.getAs[Long]("node") ->
      ((r.getAs[Boolean]("is_seed"), r.getAs[Long]("pr")))).toMap
    // hand-replayed 3 rounds of 15/85 integer trillionths
    assert(pr === Map(
      3L -> ((true, 258375000000L)), 1L -> ((false, 741625000000L)),
      4L -> ((false, 0L)), 2L -> ((false, 0L))), s"$pr")
    // the closed seeded cycle conserves the whole scale exactly
    assert(rows.forall(_.getAs[Long]("pr_sum") == 1000000000000L))
  }

  test("betweenness: the path middle brokers its endpoints, diamond splits σ") {
    import spark.implicits._
    // path 1—2—3: node 2 carries the one 1↔3 pair from both end
    // pivots (10⁶ each); the endpoints broker nothing
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val gotP = Graph.betweenness(path).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Boolean]("is_pivot"), r.getAs[Long]("n_seen"),
          r.getAs[Long]("bc_ppm")))).toMap
    assert(gotP === Map(
      1L -> ((true, 3L, 0L)), 2L -> ((true, 3L, 2000000L)),
      3L -> ((true, 3L, 0L))), s"$gotP")
    // diamond 1-2-4, 1-3-4: two shortest paths per opposite pair, so
    // each broker inherits σv/σw = 1/2 per pivot — exactly 10⁶ each
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val gotD = Graph.betweenness(diamond).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("bc_ppm")).toMap
    assert(gotD === Map(1L -> 1000000L, 2L -> 1000000L,
      3L -> 1000000L, 4L -> 1000000L), s"$gotD")
  }

  test("smoothness: aligned clone-neighborhood reads 1e6, flipped reads " +
    "1e6 with aligned=false, orthogonal reads 0") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)), (3L, Array(1f, 0f)),
      (4L, Array(1f, 0f)), (5L, Array(-1f, 0f)),
      (6L, Array(1f, 0f)), (7L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 5L), (6L, 7L)).toDF("src", "dst")
    val got = Graph.smoothness(edges, emb).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("deg"), r.getAs[Boolean]("aligned"),
          r.getAs[Long]("cos2_ppm")))).toMap
    assert(got === Map(
      1L -> ((2L, true, 1000000L)),   // sum of two clones: perfectly aligned
      4L -> ((1L, false, 1000000L)),  // anti-parallel: cos² still 1, sign flags it
      6L -> ((1L, true, 0L))), s"$got") // orthogonal: zero alignment
  }

  test("component sizes count a planted clique and chain separately") {
    import spark.implicits._
    // 4-clique {1,2,3,4} and 2-chain {10,11}
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val hist = Graph.componentSizes(edges).collect()
      .map(r => r.getAs[Long]("component_size") -> r.getAs[Long]("n_components")).toMap
    assert(hist == Map(4L -> 1L, 2L -> 1L), s"got $hist")
  }

  test("component histogram matches exact union-find on the knn graph") {
    val edges = graft.sim.Similarity.knnGraph(
      Tables.embeddings(spark, sf), col("vec_id") % 7 === 0, 3)
      .select("src", "dst").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    // driver-side union-find ground truth (the knn graph's diameter
    // fits the default propagation radius at this SF — if data ever
    // grows a long chain, the operator is documented conservative)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val expected = parent.keys.toSeq.groupBy(find).values
      .map(_.size.toLong).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Graph.componentSizes(
      graft.sim.Similarity.knnGraph(
        Tables.embeddings(spark, sf), col("vec_id") % 7 === 0, 3)
        .select("src", "dst")).collect()
      .map(r => r.getAs[Long]("component_size") -> r.getAs[Long]("n_components")).toMap
    assert(got == expected, s"got $got vs exact $expected")
  }

  test("incremental components: a delta edge bridges base components, " +
    "new-node chains attach, untouched labels pass through byte-identical, " +
    "merge(fit(base), delta) == fit(base ∪ delta)") {
    import spark.implicits._
    // base: {1,2}, {3,4}, {9,10} — three 2-components
    val base = Seq((1L, 2L), (3L, 4L), (9L, 10L)).toDF("src", "dst")
    // delta: bridge 2–3 (merges the first two), chain brand-new 5–6
    // onto 4, and an all-new pair 7–8; {9,10} untouched
    val delta = Seq((2L, 3L), (4L, 5L), (5L, 6L), (7L, 8L))
      .toDF("src", "dst")
    val baseLabels = Graph.componentLabels(base)
    val merged = Graph.mergeComponentLabels(baseLabels, delta).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lab")).toMap
    // {1,2,3,4,5,6} one component rooted at 1; {7,8} at 7; {9,10}
    // untouched — still the base fit's own label
    assert((1L to 6L).forall(merged(_) == 1L), s"$merged")
    assert(merged(7L) == 7L && merged(8L) == 7L, s"$merged")
    assert(merged(9L) == 9L && merged(10L) == 9L, s"$merged")
    assert(merged.size == 10)
    // histogram equivalence against the full one-shot fit
    val inc = Graph.componentSizesIncremental(base, delta).collect()
      .map(r => r.getAs[Long]("component_size") ->
        r.getAs[Long]("n_components")).toMap
    val full = Graph.componentSizes(base.union(delta)).collect()
      .map(r => r.getAs[Long]("component_size") ->
        r.getAs[Long]("n_components")).toMap
    assert(inc == full && inc == Map(6L -> 1L, 2L -> 2L), s"$inc vs $full")
    // an EMPTY delta is a pure pass-through
    val noop = Graph.mergeComponentLabels(baseLabels,
      Seq.empty[(Long, Long)].toDF("src", "dst")).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lab")).toMap
    val orig = baseLabels.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lab")).toMap
    assert(noop == orig)
  }

  test("streaming component merge: batch-folded label versions land " +
    "where the one-shot fit lands, one immutable version per batch") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val dir = s"/tmp/graft-test-complabels-stream-${System.nanoTime()}"
    val ckpt = s"$dir-ckpt"
    val b1 = Seq((1L, 2L), (3L, 4L), (9L, 10L))
    val b2 = Seq((2L, 3L), (4L, 5L), (7L, 8L)) // bridge + chain + new pair
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = graft.streaming.GraphStreams.componentMergeSink(
      input.toDF().toDF("src", "dst"), dir, ckpt)
    try Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    // one version per batch, latest == the one-shot fit of the union
    assert(graft.streaming.GraphStreams.latestVersion(spark, dir)
      .contains(2L))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lab")).toMap
    val streamed = rows(Graph.loadLabels(spark, dir, Some(2L)))
    val oneShot = rows(Graph.componentLabels((b1 ++ b2).toDF("src", "dst")))
    assert(streamed == oneShot && streamed.nonEmpty)
    // the intermediate version is exactly batch 1's fit
    assert(rows(Graph.loadLabels(spark, dir, Some(1L))) ==
      rows(Graph.componentLabels(b1.toDF("src", "dst"))))
  }

  test("persisted component labels: publish → load round-trips " +
    "byte-equal, the loaded audit equals the fitting run, republish " +
    "is a no-op") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val labels = Graph.componentLabels(edges)
    val dir = s"/tmp/graft-test-complabels-${System.nanoTime()}"
    Graph.saveLabels(labels, dir, 1L)
    Graph.saveLabels(labels, dir, 1L) // immutable version: no-op
    val loaded = Graph.loadLabels(spark, dir) // latest-version path
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lab")).toMap
    assert(rows(loaded) == rows(labels))
    val hist = Graph.componentSizesLoaded(loaded).collect()
      .map(r => r.getAs[Long]("component_size") ->
        r.getAs[Long]("n_components")).toMap
    assert(hist == Map(3L -> 1L, 2L -> 1L), s"$hist")
    // the loaded frame feeds the incremental merge unchanged
    val merged = Graph.mergeComponentLabels(loaded,
      Seq((3L, 10L)).toDF("src", "dst")).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lab")).toMap
    assert(merged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 1L, 11L -> 1L), s"$merged")
  }

  test("incremental components match the one-shot fit on the real knn " +
    "graph under a hash-split delta") {
    val e = graft.sim.Similarity.knnGraph(
      Tables.embeddings(spark, sf), col("vec_id") % 7 === 0, 3)
      .select("src", "dst").localCheckpoint()
    val isDelta = (col("src") + col("dst")) % 5 === 0
    val inc = Graph.componentSizesIncremental(
      e.filter(!isDelta), e.filter(isDelta)).collect()
      .map(r => r.getAs[Long]("component_size") ->
        r.getAs[Long]("n_components")).toMap
    val full = Graph.componentSizes(e).collect()
      .map(r => r.getAs[Long]("component_size") ->
        r.getAs[Long]("n_components")).toMap
    assert(inc == full && inc.nonEmpty, s"$inc vs $full")
  }

  test("triangles: K4 corners count 3 each, chain and star count zero") {
    import spark.implicits._
    // K4 {1,2,3,4} (4 triangles, each node on 3), a 3-chain {10,11,12}
    // (no triangles), and a star 20–{21..24} (no triangles — and with
    // degree ordering the hub generates ZERO wedges)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L), (20L, 22L), (20L, 23L), (20L, 24L)).toDF("src", "dst")
    val out = Graph.triangles(edges).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_tri"),
          r.getAs[Double]("clust_coeff"))).toMap
    Seq(1L, 2L, 3L, 4L).foreach { n =>
      assert(out(n) == ((3L, 3L, 1.0)), s"node $n: ${out(n)}")
    }
    Seq(10L, 12L, 21L, 22L, 23L, 24L).foreach { n =>
      assert(out(n)._2 == 0L && out(n)._3 == 0.0)
    }
    assert(out(11L) == ((2L, 0L, 0.0)) && out(20L) == ((4L, 0L, 0.0)))
    // degree-1 nodes: coefficient defined as 0, never a div-by-zero null
    assert(out(10L)._1 == 1L)
  }

  test("triangles count each planted triangle once regardless of edge direction") {
    import spark.implicits._
    // duplicate + reversed edges must not double-count
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val out = Graph.triangles(edges).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("n_tri")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("k-core keeps a K7 clique, peels its pendant tail") {
    import spark.implicits._
    // K7 (internal degree 6) with a pendant tail 100–1: the tail
    // peels in round 1 (degree 1 < 6); the clique survives at k=6
    val k7 = for (a <- 1L to 7L; b <- (a + 1) to 7L) yield (a, b)
    val edges = (k7 :+ ((1L, 100L))).toDF("src", "dst")
    val rows = Graph.kCore(edges, k = 6).collect()
    val out = rows.map(r => r.getAs[Long]("node") -> r.getAs[Long]("degree")).toMap
    assert(out.keySet == (1L to 7L).toSet, s"got ${out.keySet}")
    assert(out.values.forall(_ == 6L))
    // the peel reached its fixpoint well inside 6 rounds — flag TRUE
    assert(rows.forall(_.getAs[Boolean]("converged")))
  }

  test("bounded-round k-core peels a path from the ends, conservatively") {
    import spark.implicits._
    // path 0–…–19 at k=2: the true 2-core is empty, but synchronous
    // peeling removes only the two current endpoints per round — after
    // 6 rounds nodes 6..13 remain (the documented from-above superset)
    val edges = (0L until 19L).map(i => (i, i + 1)).toDF("src", "dst")
    val rows = Graph.kCore(edges, k = 2, iters = 6).collect()
    val out = rows.map(_.getAs[Long]("node")).sorted.toSeq
    assert(out == (6L to 13L).toSeq, s"got $out")
    // round 6 still removed edges — the deep-peel case must REPORT
    // itself as a superset, never silently read as the exact core
    assert(rows.forall(!_.getAs[Boolean]("converged")))
    // ...and enough rounds empty it completely
    assert(Graph.kCore(edges, k = 2, iters = 10).count() == 0)
  }

  test("pagerank plan grows linearly in iters: deep runs stay analyzable") {
    import spark.implicits._
    // each round references the previous ranks frame exactly once (the
    // update joins inflow against the loop-invariant node frame), so
    // the unresolved plan is linear in iters — a twice-referencing
    // round would be 2^12 subplans here and hang Catalyst analysis
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val t0 = System.nanoTime()
    val pr = Graph.pageRank(edges, iters = 12).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(pr.size == 4 && pr.values.forall(_ > 0))
    assert(pr.values.sum <= 1000000000000L)
    assert(secs < 60.0, s"12-iteration pagerank took ${secs}s — plan blowup?")
  }

  test("pagerank is bit-identical across different partitionings") {
    def run(shufflePartitions: Int): Map[Long, Long] = {
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
      try {
        val edges = graft.sim.Similarity.knnGraph(
          Tables.embeddings(spark, sf), col("vec_id") % 7 === 0, 3)
          .select("src", "dst")
        Graph.pageRank(edges).collect()
          .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
      } finally spark.conf.set("spark.sql.shuffle.partitions", 4)
    }
    // different shuffle widths change the order partial sums meet —
    // the fixed-point claim is that the result cannot care
    val a = run(3)
    val b = run(7)
    assert(a == b && a.nonEmpty)
    assert(a.values.forall(_ > 0))
    assert(a.values.sum <= 1000000000000L)
  }

  test("degree histogram counts a planted path graph exactly") {
    import spark.implicits._
    // path 1-2-3 with both directions: ends have degree 1, middle 2
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val hist = Graph.degreeHistogram(edges).collect()
      .map(r => r.getAs[Long]("degree") -> r.getAs[Long]("n_nodes")).toMap
    assert(hist == Map(1L -> 2L, 2L -> 1L))
  }

  test("edge support counts triangles per edge; the pendant is weak") {
    import spark.implicits._
    // triangle 1-2-3 with a pendant 3-4: every triangle edge has
    // support 1, the pendant has none and flags weak
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.edgeSupport(g).collect()
      .map(r => ((r.getAs[Long]("src"), r.getAs[Long]("dst")),
        (r.getAs[Long]("support"), r.getAs[Long]("d_src"),
          r.getAs[Long]("d_dst"), r.getAs[Boolean]("is_weak")))).toMap
    assert(out == Map(
      (1L, 2L) -> ((1L, 2L, 2L, false)),
      (1L, 3L) -> ((1L, 2L, 3L, false)),
      (2L, 3L) -> ((1L, 2L, 3L, false)),
      (3L, 4L) -> ((0L, 3L, 1L, true))), s"got $out")
  }

  test("neighbor similarity scores exactly the non-adjacent 2-hop pairs") {
    import spark.implicits._
    // square 1-2-3-4-1: the two diagonals are the only non-adjacent
    // pairs, each with identical neighbor sets (jaccard 1.0)
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val out = Graph.neighborSimilarity(square).collect()
      .map(r => ((r.getAs[Long]("u"), r.getAs[Long]("v")),
        (r.getAs[Long]("common"), r.getAs[Double]("jaccard")))).toMap
    assert(out == Map((1L, 3L) -> (2L, 1.0), (2L, 4L) -> (2L, 1.0)),
      s"got $out")
  }

  test("neighbor similarity: partial overlap and the hub-degree cap") {
    import spark.implicits._
    // paths 1-3-2 and 1-4-2 and 1-5: N(1)={3,4,5}, N(2)={3,4} ->
    // (1,2) common 2, union 3; (3,4) via both 1 and 2 -> 2/2; pendant
    // pairs (3,5),(4,5) share only node 1 -> 1/(2+1-1)
    val g = Seq((1L, 3L), (3L, 2L), (1L, 4L), (4L, 2L), (1L, 5L))
      .toDF("src", "dst")
    val out = Graph.neighborSimilarity(g).collect()
      .map(r => ((r.getAs[Long]("u"), r.getAs[Long]("v")),
        r.getAs[Double]("jaccard"))).toMap
    assert(out((1L, 2L)) == 0.666667)
    assert(out((3L, 4L)) == 1.0)
    assert(out((3L, 5L)) == 0.5 && out((4L, 5L)) == 0.5)
    // capping wedge centers at degree 2 removes node 1 (degree 3) as
    // a center: (3,4) still connect through node 2, the pendant pairs
    // only connected through 1 and disappear
    val capped = Graph.neighborSimilarity(g, maxDegree = 2L).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSet
    assert(capped == Set((1L, 2L), (3L, 4L)), s"got $capped")
  }

  test("label modularity scores aligned labels high, split labels at zero") {
    import spark.implicits._
    // two 3-cliques joined by one bridge edge: m = 7 canonical edges
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val aligned = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B")).toDF("node", "label")
    val rows = Graph.labelModularity(edges, aligned).collect()
    val byLabel = rows.map(r => r.getAs[String]("label") ->
      (r.getAs[Long]("e_in"), r.getAs[Long]("d_sum"),
        r.getAs[Double]("q_part"))).toMap
    // each clique: 3 internal edges, degree sum 2+2+3 = 7
    assert(byLabel("A") == ((3L, 7L, math.rint((3.0 / 7 - 0.25) * 1e6) / 1e6)))
    assert(byLabel("B")._1 == 3L && byLabel("B")._2 == 7L)
    val qTotal = rows.head.getAs[Double]("q_total")
    assert(math.abs(qTotal - 0.357142) < 1e-4, s"qTotal $qTotal")
    // labels orthogonal to the structure: one node of each clique
    // swapped → much weaker alignment
    val mixed = Seq((1L, "A"), (2L, "A"), (3L, "B"),
      (4L, "A"), (5L, "B"), (6L, "B")).toDF("node", "label")
    val qMixed = Graph.labelModularity(edges, mixed).collect()
      .head.getAs[Double]("q_total")
    assert(qMixed < qTotal - 0.2, s"mixed $qMixed vs aligned $qTotal")
    // unlabeled nodes lower Q but never crash the audit
    val partial = Seq((1L, "A"), (2L, "A"), (3L, "A")).toDF("node", "label")
    val qPartial = Graph.labelModularity(edges, partial).collect()
      .head.getAs[Double]("q_total")
    assert(qPartial < qTotal && !qPartial.isNaN)
  }

  test("bfs: layered distances, disconnected nulls, converged flag") {
    import spark.implicits._
    // path 1-2-3-4-5 seeded at 1, plus a disconnected pair {10,11};
    // seed 99 is not a graph node and must be ignored
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 99L).toDF("node")
    val rows = Graph.bfsDistances(edges, seeds, rounds = 6).collect()
    val d = rows.map(r => r.getAs[Long]("node") ->
      Option(r.getAs[java.lang.Long]("dist")).map(_.toLong)).toMap
    assert(d == Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L),
      4L -> Some(3L), 5L -> Some(4L), 10L -> None, 11L -> None), s"got $d")
    // the reached set stopped growing before the bound: nulls mean
    // DISCONNECTED, and the flag certifies it
    assert(rows.forall(_.getAs[Boolean]("converged")))
  }

  test("bfs: a path deeper than the bound reports converged = false") {
    import spark.implicits._
    val edges = (1L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val rows = Graph.bfsDistances(edges, Seq(1L).toDF("node"), rounds = 3)
      .collect()
    val d = rows.map(r => r.getAs[Long]("node") ->
      Option(r.getAs[java.lang.Long]("dist")).map(_.toLong)).toMap
    // exactly the first 3 layers reached; the frontier was still
    // moving, so the nulls are NOT certified disconnected
    assert(d(4L) == Some(3L) && d(5L).isEmpty, s"got $d")
    assert(rows.forall(!_.getAs[Boolean]("converged")))
    // two more rounds certify: same graph, bound past the diameter
    val full = Graph.bfsDistances(edges, Seq(1L).toDF("node"), rounds = 12)
      .collect()
    assert(full.forall(_.getAs[Boolean]("converged")))
    assert(full.map(r => r.getAs[Long]("node") -> r.getAs[java.lang.Long]("dist"))
      .toMap.forall { case (n, dd) => dd.toLong == n - 1 })
  }

  test("bfs: multi-source takes the nearest seed") {
    import spark.implicits._
    val edges = (1L until 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val d = Graph.bfsDistances(edges, Seq(1L, 7L).toDF("node"), rounds = 6)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[java.lang.Long]("dist").toLong)
      .toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 2L,
      6L -> 1L, 7L -> 0L), s"got $d")
  }

  test("label propagation keeps bridged triangles as separate communities") {
    import spark.implicits._
    // two triangles joined by ONE bridge edge (3-4): components would
    // glue everything into one blob; majority voting must not — the
    // bridge loses 1-vote-to-2 on both sides. Hand-replayed: after 3
    // synchronous rounds {1,2,3} -> 1 and {4,5,6} -> 3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, iters = 3).collect()
    val comm = out.map(r => r.getAs[Long]("node") ->
      r.getAs[Long]("community")).toMap
    assert(comm == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), s"got $comm")
    // the per-row audit numbers: 2 communities, largest of size 3
    out.foreach { r =>
      assert(r.getAs[Long]("n_comms") == 2L)
      assert(r.getAs[Long]("max_comm") == 3L)
    }
    // duplicate + reversed edges must not double any vote
    val doubled = edges.union(edges.select(col("dst").as("src"),
      col("src").as("dst")))
    val comm2 = Graph.labelPropagation(doubled, iters = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("community")).toMap
    assert(comm2 == comm, s"got $comm2")
    // fixpoint early exit returns the same labels as the full bound
    val comm3 = Graph.labelPropagation(edges, iters = 6).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("community")).toMap
    assert(comm3 == comm, s"got $comm3")
  }

  test("conductance: bridged triangles score 1/7 each, whole-graph NULL, " +
      "clean split zero") {
    import spark.implicits._
    // the label-prop graph: communities {1,2,3} and {4,5,6}, one
    // bridge 3-4. Each side: vol = 2+2+3 = 7 directed rows, cut = 1
    // (its own end of the bridge), 2m = 14 → 1/min(7,7) = 1/7
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val rows = Graph.conductance(edges, iters = 3).orderBy("community")
      .collect().map(r => (r.getAs[Long]("community"),
        r.getAs[Long]("members"), r.getAs[Long]("vol"),
        r.getAs[Long]("cut"), r.getAs[Double]("conductance"))).toList
    val sc = BigDecimal(1.0 / 7.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows == List((1L, 3L, 7L, 1L, sc), (3L, 3L, 7L, 1L, sc)),
      s"got $rows")
    // one community holding the whole doubled volume: denominator 0,
    // explicit NULL — not Infinity, not NaN
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val whole = Graph.conductance(tri, iters = 3).collect()
    assert(whole.length == 1 &&
      whole.head.isNullAt(whole.head.fieldIndex("conductance")))
    // two disjoint triangles: perfectly separated labels, zero cut
    val split = Graph.conductance(
      tri.union(Seq((4L, 5L), (4L, 6L), (5L, 6L)).toDF("src", "dst")),
      iters = 3).collect()
      .map(r => (r.getAs[Long]("cut"), r.getAs[Double]("conductance")))
    assert(split.toSet == Set((0L, 0.0)))
  }

  test("hits separates hubs from authorities and matches the exact integer recurrence") {
    import spark.implicits._
    // 1, 2, 3 are hubs of decreasing reach into authorities 10-12;
    // the backlink 10→1 makes node 1 carry (small) authority too
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (3L, 10L), (10L, 1L))

    // bit-exact reference: the same L∞-normalized integer recurrence
    val scale = BigInt(1000000000000L)
    def ref(iters: Int): Map[Long, (Long, Long)] = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var h = nodes.map(_ -> scale).toMap
      var a = nodes.map(_ -> BigInt(0)).toMap
      def norm(m: Map[Long, BigInt]) = {
        val mx = m.values.max
        if (mx > 0) m.map { case (k, v) => k -> v * scale / mx } else m
      }
      for (_ <- 0 until iters) {
        a = norm(nodes.map(n =>
          n -> edges.filter(_._2 == n).map(e => h(e._1)).sum).toMap)
        h = norm(nodes.map(n =>
          n -> edges.filter(_._1 == n).map(e => a(e._2)).sum).toMap)
      }
      nodes.map(n => n -> (h(n).toLong, a(n).toLong)).toMap
    }

    for (iters <- Seq(1, 2)) {
      val got = Graph.hits(edges.toDF("src", "dst"), iters).collect()
        .map(r => r.getAs[Long]("node") ->
          (r.getAs[Long]("hub"), r.getAs[Long]("auth"))).toMap
      assert(got === ref(iters), s"iters=$iters")
    }
    val two = ref(2)
    // hubs rank 1 > 2 > 3; authorities 10 > 11 > 12; the two lists
    // really are different orderings of the graph
    assert(two(1L)._1 > two(2L)._1 && two(2L)._1 > two(3L)._1)
    assert(two(10L)._2 > two(11L)._2 && two(11L)._2 > two(12L)._2)
    assert(two(10L)._1 < two(3L)._1) // a pure authority is a poor hub
  }

  test("landmark closeness: exact harmonic ppm on a planted path") {
    import spark.implicits._
    // path 1-2-3-4-5 plus a disconnected pair {10,11}; k=2 picks
    // landmarks {1,2}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val rows = Graph.landmarkCloseness(edges, k = 2, rounds = 6).collect()
      .map(r => r.getAs[Long]("node") -> r).toMap
    // node 3: dist 2 from 1, dist 1 from 2 → 500000 + 1000000
    assert(rows(3L).getAs[Long]("harmonic_ppm") == 1500000L)
    assert(rows(3L).getAs[Double]("avg_dist") == 1.5)
    assert(rows(3L).getAs[Long]("n_reached") == 2L)
    // node 5: dists 4 and 3 → 250000 + 333333 (integer floor)
    assert(rows(5L).getAs[Long]("harmonic_ppm") == 583333L)
    // a landmark scores its own distance-0 as zero harmonic mass
    assert(rows(1L).getAs[Long]("harmonic_ppm") == 1000000L)
    assert(rows(1L).getAs[Double]("avg_dist") == 0.5)
    // the disconnected pair is unreached: absent, not zero-scored
    assert(!rows.contains(10L) && !rows.contains(11L))
    assert(rows.values.forall(_.getAs[Boolean]("converged")))
    // a bound tighter than the diameter reports itself
    val tight = Graph.landmarkCloseness(edges, k = 2, rounds = 2).collect()
    assert(tight.forall(!_.getAs[Boolean]("converged")))
    assert(!tight.map(_.getAs[Long]("node")).contains(5L))
  }

  test("assortativity: a star is perfectly disassortative, a clique NULL") {
    import spark.implicits._
    // star K1,4: every edge joins the degree-4 hub to a degree-1 leaf
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)).toDF("src", "dst")
    val s = Graph.assortativity(star).collect().head
    assert(s.getAs[Long]("n_nodes") == 5L && s.getAs[Long]("n_edges") == 4L)
    assert(s.getAs[Double]("avg_degree") == 1.6)
    assert(s.getAs[Double]("assortativity") == -1.0)
    // a REGULAR graph has zero degree variance: explicit NULL, the
    // ANSI-safe verdict (and what DuckDB's corr answers)
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val t = Graph.assortativity(tri).collect().head
    assert(t.getAs[Long]("n_edges") == 3L)
    assert(t.isNullAt(t.fieldIndex("assortativity")))
    // direction/duplication of the input edge list must not matter:
    // reversed + duplicated edges land on the same undirected stubs
    val messy = Seq((1L, 9L), (9L, 1L), (9L, 2L), (3L, 9L), (9L, 4L))
      .toDF("src", "dst")
    val m = Graph.assortativity(messy).collect().head
    assert(m.getAs[Double]("assortativity") == -1.0)
    assert(m.getAs[Long]("n_edges") == 4L)
  }

  test("reciprocity: mutual pairs counted both ways, hub reads low") {
    import spark.implicits._
    // 1↔2 mutual (2 reciprocated edges), 3→1 and 4→1 unanswered
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val r = Graph.reciprocity(e).collect().head
    assert((r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_reciprocal"), r.getAs[Long]("reciprocity_ppm")) ===
      ((4L, 4L, 2L, 500000L)))
    // a fully mutual clique reads 1e6 exactly
    val clique = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L),
      (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val c = Graph.reciprocity(clique).collect().head
    assert(c.getAs[Long]("reciprocity_ppm") === 1000000L)
  }

  test("mutual edges drop hub attraction; components bind only mutual pairs") {
    import spark.implicits._
    // 1↔2 and 3↔4 mutual; hub 9 is pointed at by everyone but
    // answers nobody — WITHOUT the mutual cut the hub glues all five
    // nodes into one component, WITH it the true pair structure shows
    val e = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L),
      (1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L)).toDF("src", "dst")
    val mutual = Graph.mutualEdges(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mutual === Set((1L, 2L), (3L, 4L)))
    val sizes = Graph.componentSizes(Graph.mutualEdges(e)).collect()
      .map(r => (r.getAs[Long]("component_size"),
        r.getAs[Long]("n_components"))).toSet
    assert(sizes === Set((2L, 2L))) // two pair-components, no hub glue
    val glued = Graph.componentSizes(e).collect()
      .map(r => r.getAs[Long]("component_size")).toSet
    assert(glued === Set(5L)) // the un-cut graph is one mega-component
  }

  test("link candidates: common-neighbor count, existing edges and self out") {
    import spark.implicits._
    // node 1 reaches 4 by TWO length-2 paths (via 2 and via 3) — the
    // top candidate; 5 is reachable via 2 but 1→5 already exists
    // (anti-joined away); 1→2→1 is the self path (excluded)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 5L), (2L, 1L), (2L, 4L),
      (2L, 5L), (3L, 4L), (4L, 6L))
      .toDF("src", "dst")
    val got = Graph.linkCandidates(edges, k = 3).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("rank"),
        r.getAs[Long]("cand"), r.getAs[Long]("n_common")))
      .filter(_._1 == 1L).toList
    assert(got === List((1L, 1L, 4L, 2L)), s"$got")
  }
}
