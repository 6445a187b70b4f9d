package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.Graph

/** Worst-case skew stress for the iterative graph/keeper family: a
  * too-loose dedup threshold yields ONE giant component, which is
  * also the hottest key a label-propagation join can see (every
  * node's label converges to the same value, so the pointer-doubling
  * shortcut join concentrates on a single build row). These pin that
  * the operators stay correct and bounded under that shape; wall
  * times are recorded in SURVEY's round-7 perf journal.
  */
class StressSpec extends SparkSpec {

  test("giant star component: hot-label shortcut stays correct and bounded") {
    // star 0–{1..n}: after round 1 every label is 0, so all shortcut
    // lookups land on the single node-0 build row — maximal key skew
    // for the propagate and shortcut joins, and the giant-component
    // shape componentSizes' own scaladoc warns about
    val n = 50000L
    val edges = spark.range(1L, n + 1L)
      .select(lit(0L).as("src"), col("id").as("dst"))
    val t0 = System.nanoTime()
    val hist = Graph.componentSizes(edges, iters = 6).collect()
      .map(r => r.getAs[Long]("component_size") -> r.getAs[Long]("n_components"))
      .toMap
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"giant star n=$n componentSizes: $secs%.1fs")
    assert(hist == Map(n + 1 -> 1L), s"got $hist")
    assert(secs < 180.0, s"giant-component stress took ${secs}s")
  }

  test("giant star BFS: hot-frontier relaxation from a leaf seed") {
    // seeding a LEAF of the 50k-star makes round 1 reach only the
    // hub, and round 2's relaxation fans the hub's distance out to
    // every other leaf in one aggregation — the maximal single-key
    // frontier skew (all n candidate rows carry dst keys built from
    // ONE reached source), then the fixpoint early-exit must fire
    import org.apache.spark.sql.functions._
    val n = 50000L
    val edges = spark.range(1L, n + 1L)
      .select(lit(0L).as("src"), col("id").as("dst"))
    val seeds = spark.range(1L, 2L).select(col("id").as("node"))
    val t0 = System.nanoTime()
    val rows = Graph.bfsDistances(edges, seeds, rounds = 6).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"giant star n=$n bfs: $secs%.1fs")
    assert(rows.length == n + 1)
    val d = rows.map(r => r.getAs[Long]("node") ->
      r.getAs[java.lang.Long]("dist").toLong).toMap
    assert(d(1L) == 0L && d(0L) == 1L)
    assert((2L to n).forall(i => d(i) == 2L))
    assert(rows.forall(_.getAs[Boolean]("converged")))
    assert(secs < 180.0, s"bfs stress took ${secs}s")
  }

  test("x20-duplicated corpus: keeper election stays linear and per-group") {
    // every sf0.001 text duplicated 20x with distinct ids: each copy
    // group is a 20-clique of verified LSH pairs — the duplicate-heavy
    // regime where pair enumeration is quadratic but keeper output
    // must stay one row per doc, with one keeper per copy group
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").as("orig"), col("text"),
        explode(sequence(lit(0), lit(19))).as("c"))
      .select((col("orig") * 20 + col("c")).as("doc_id"), col("text"),
        col("orig"))
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val keepers = Dedup.nearDupKeepers(docs.select("doc_id", "text"), 0.9)
    val out = keepers.join(docs.select("doc_id", "orig"), "doc_id")
      .groupBy("orig")
      .agg(countDistinct(col("keep_doc_id")).as("n_keepers"),
        count(lit(1)).as("n_copies"))
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"x20-dup corpus ($nDocs docs) nearDupKeepers: $secs%.1fs")
    assert(out.map(_.getAs[Long]("n_copies")).forall(_ == 20L))
    // copies of one text are a clique — they must all share a keeper
    assert(out.map(_.getAs[Long]("n_keepers")).forall(_ == 1L),
      "a copy group elected multiple keepers")
    assert(keepers.count() == nDocs, "keeper output must stay linear")
    assert(secs < 300.0, s"dup-heavy keeper stress took ${secs}s")
  }

  test("x20-duplicated corpus: soft dedup keeps every unique, thins families to ~1") {
    // same duplicate-heavy regime as the keeper stress: every copy
    // group is a hot keeper key for the cluster-size join, and the
    // survival threshold must still be the exact per-doc hash rule
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").as("orig"), col("text"),
        explode(sequence(lit(0), lit(19))).as("c"))
      .select((col("orig") * 20 + col("c")).as("doc_id"), col("text"))
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val out = graft.ops.Sampling.softDedup(docs).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"x20-dup corpus ($nDocs docs) softDedup: $secs%.1fs")
    assert(out.length == nDocs, "soft dedup output must stay linear")
    // every cluster is (at least) the 20-copy group; expected
    // survivors per 20-family = ceil(256/20)/256 * 20 ~ 1.02, so the
    // corpus-wide survival rate must collapse to roughly 1/20
    val kept = out.count(_.getAs[Boolean]("soft_kept"))
    val rate = kept.toDouble / nDocs
    assert(rate > 0.01 && rate < 0.15, f"survival rate $rate%.3f")
    // the keep flag replays the md5 two-nibble threshold exactly
    def h256(id: Long): Int = java.security.MessageDigest
      .getInstance("MD5").digest(id.toString.getBytes("UTF-8"))(0) & 0xff
    out.foreach { r =>
      assert(r.getAs[Boolean]("soft_kept") ==
        (h256(r.getAs[Long]("doc_id")) * r.getAs[Long]("cluster_size") < 256L)) }
    assert(secs < 300.0, s"soft-dedup stress took ${secs}s")
  }

  test("ring of cliques: label propagation resolves every clique, bridges lose") {
    import org.apache.spark.sql.functions._
    // 2000 10-cliques chained by single bridge edges: majority voting
    // must settle every clique on its min node and never let a bridge
    // (1 vote against 9) merge neighbors — the shape where components
    // would collapse the whole ring into ONE blob. Also the hot-shape
    // check: 92k edges, per-round joins keyed on node ids
    val cliques = 2000L
    val size = 10L
    val base = spark.range(cliques).select(col("id").as("c"))
    val intra = base
      .select(col("c"), explode(sequence(lit(0L), lit(size - 2))).as("i"))
      .select(col("c"), col("i"),
        explode(sequence(col("i") + 1L, lit(size - 1))).as("j"))
      .select((col("c") * size + col("i")).as("src"),
        (col("c") * size + col("j")).as("dst"))
    val bridges = base.filter(col("c") < cliques - 1)
      .select((col("c") * size + size - 1).as("src"),
        ((col("c") + 1L) * size).as("dst"))
    val t0 = System.nanoTime()
    val out = Graph.labelPropagation(intra.unionAll(bridges), iters = 4)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"ring of cliques labelProp: $secs%.1fs")
    assert(out.length == cliques * size)
    // every node labeled by its own clique's min; audits agree
    out.foreach { r =>
      val node = r.getAs[Long]("node")
      assert(r.getAs[Long]("community") == (node / size) * size, s"node $node")
      assert(r.getAs[Long]("n_comms") == cliques)
      assert(r.getAs[Long]("max_comm") == size)
    }
    assert(secs < 180.0, s"ring-of-cliques stress took ${secs}s")
  }

  test("interval sweep: 50k chained overlaps, closed-form pair count") {
    import org.apache.spark.sql.functions._
    import graft.plans.IntervalNative
    // intervals [10i, 10i+25]: each overlaps exactly the neighbors
    // within 2 steps (|i-j|*10 <= 25), so the L x R inner pair count
    // has the closed form 5n - 6 — and the sweep's active sets never
    // hold more than ~3 intervals however long the chain runs
    val n = 50000L
    val left = spark.range(n).select(col("id").as("lid"),
      (col("id") * 10).as("ls"), (col("id") * 10 + 25).as("le"))
    val right = spark.range(n).select(col("id").as("rid"),
      (col("id") * 10).as("rs"), (col("id") * 10 + 25).as("re"))
    val t0 = System.nanoTime()
    val cnt = IntervalNative.join(left, right, ("ls", "le"), ("rs", "re"),
      bandMicros = 1000L).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"interval sweep 50k chain: $secs%.1fs")
    assert(cnt == 5 * n - 6, s"got $cnt")
    assert(secs < 180.0, s"interval stress took ${secs}s")
  }

  test("dominant-source interleave: 200k docs, banded rank lines hold") {
    // one source holds 99.5% of documents — without banding, the
    // per-source rank window would put the dominant source's whole
    // mass in one task; banded, the hottest window key is ONE band of
    // one source (≤ n/bands rows). The schedule head must also be
    // EXACTLY proportional: rare's first key is 200 (rank·N div n_s =
    // 1·200000 div 1000), so a 40-slot head is all-dominant in pure
    // rank order — starving the head of a 0.5% source is correct
    // proportionality, not a bug.
    import graft.ops.Sampling
    val n = 200000L
    val docs = spark.range(0L, n)
      .select(col("id").as("doc_id"),
        when(col("id") % 200 === 0, "rare")
          .otherwise("dominant").as("source"))
    val t0 = System.nanoTime()
    val head = Sampling.interleave(docs, k = 40, bands = 64).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"dominant-source interleave n=$n: $secs%.1fs")
    assert(head.length == 40)
    assert(head.forall(_.getAs[String]("source") == "dominant"))
    // dominant ids are the non-multiples of 200 in id order: the
    // head is its first 40 ranks exactly
    val expectIds = (0L until n).filter(_ % 200 != 0).take(40)
    assert(head.sortBy(_.getAs[Long]("pos"))
      .map(_.getAs[Long]("doc_id")).toSeq == expectIds)
    assert(secs < 180.0, s"interleave stress took ${secs}s")
  }
}
