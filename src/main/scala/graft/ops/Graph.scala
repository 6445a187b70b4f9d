package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph centrality over edge lists — the ranking pass of a curation
  * pipeline (domain ranking for web corpora, prototype selection
  * among near-duplicate embeddings via their k-NN graph).
  */
object Graph {

  /** Degree histogram of an edge list (mirrored + de-duplicated
    * internally, the same undirected normalization as [[kCore]]):
    * nodes per degree — the one-glance shape report of the near-dup
    * / radius graph (a heavy high-degree tail means hub nodes and
    * probable false-merge bridges; compare before/after a threshold
    * change). Two map-side-combined aggregations; output bounded by
    * the max degree, never the node count. Isolated nodes carry no
    * edges and so don't appear — their count is the complement
    * against the corpus, not a graph property.
    */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
  }

  /** Bounded-iteration PageRank in FIXED-POINT arithmetic: ranks
    * live in integer `scale`-ths (default trillionths), so every
    * shuffle-order-dependent sum is exact integer addition and the
    * result is identical on any engine, any partitioning, any run —
    * float PageRank at 100 TB is not reproducible (double addition
    * order varies run to run); integer PageRank is.
    *
    * Shape per iteration: one keyed join (ranks onto edge sources)
    * and one aggregation (inflow per destination) — the standard
    * distributed formulation. Iterations and damping are model
    * constants. The node count seeds the ranks through a single-row
    * cross join, so no driver action is needed. Dangling-node mass
    * leaks per the plain edge-list formulation (documented,
    * conservative: ranks sum to ≤ `scale`) — and the leak is now
    * MEASURABLE: every row carries `pr_sum`, the exact integer total
    * of all final ranks (one broadcast aggregation), so `scale −
    * pr_sum` is the audit number a consumer thresholds on instead of
    * trusting the docstring. Every audit ships its own check.
    */
  def pageRank(edges: DataFrame, iters: Int = 3, dampingPct: Long = 85L,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters > 0 && dampingPct >= 0 && dampingPct <= 100,
      s"iters ($iters) must be positive, dampingPct ($dampingPct) in [0, 100]")
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nCount = nodes.agg(count(lit(1)).as("n"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // the loop-invariant (node, n) frame: each round's update joins
    // inflow against THIS, not against the previous ranks frame — the
    // new rank depends on the old only through inflow, so `ranks`
    // appears exactly ONCE per round and the unresolved plan grows
    // linearly in iters (referencing it twice would double the plan
    // every round — 2^iters subplans, the componentSizes lesson —
    // without needing componentSizes' per-round localCheckpoint)
    val nodesN = nodes.crossJoin(broadcast(nCount))
    var ranks = nodesN.select(col("node"), expr(s"$scale div n").as("pr"))
    for (_ <- 0 until iters) {
      // shuffled-hash hints, same rationale as the keeper propagation
      // loop: these joins re-run every iteration and a sort-merge
      // would re-sort both sides each time — hash exchanges on the
      // join key are all the distribution the loop needs
      val inflow = e
        .join(ranks.select(col("node").as("src"), col("pr")).hint("shuffle_hash"), "src")
        .join(deg.hint("shuffle_hash"), "src")
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("inflow"))
      ranks = nodesN
        .join(inflow.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"),
          (expr(s"((100 - $dampingPct) * ($scale div n)) div 100") +
            expr(s"($dampingPct * coalesce(inflow, 0L)) div 100")).as("pr"))
    }
    // the final ranks frame is referenced twice (rows + total) — a
    // one-time constant-factor duplication of the chain, not the
    // per-round doubling the loop structure avoids
    val out = ranks.select(col("node"), col("pr"))
    out.crossJoin(broadcast(out.agg(sum("pr").as("pr_sum"))))
  }

  /** PERSONALIZED PageRank — the SEED-EXPANSION operator of data
    * curation: teleport mass returns only to a trusted seed set, so
    * the stationary mass ranks every node by graph proximity to the
    * seeds (the "find more documents like this vetted list" move,
    * run on a knn/near-dup graph). Same fixed-point integer
    * discipline, loop shape, and per-round single-reference
    * structure as [[pageRank]] — the ONLY differences are the seed-
    * conditional teleport term (non-seeds get zero base mass) and
    * the seed-count denominator. `isSeed` is a predicate over the
    * `node` column, evaluated once into the loop-invariant frame.
    * Non-seed mass reachable only through dangling paths decays to
    * 0, which is the semantics a curation consumer wants: "no path
    * from the trusted set" means "no evidence".
    */
  def personalizedPageRank(edges: DataFrame, isSeed: Column,
                           iters: Int = 3, dampingPct: Long = 85L,
                           scale: Long = 1000000000000L): DataFrame = {
    require(iters > 0 && dampingPct >= 0 && dampingPct <= 100,
      s"iters ($iters) must be positive, dampingPct ($dampingPct) in [0, 100]")
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .withColumn("is_seed", isSeed)
    val sCount = nodes.filter(col("is_seed"))
      .agg(count(lit(1)).as("ns"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodesS = nodes.crossJoin(broadcast(sCount))
    // ranks carries is_seed through the loop (from the loop-invariant
    // nodesS side of each round's join) so the final frame needs no
    // node-set re-join — the inflow side still ships (node, pr) only
    var ranks = nodesS.select(col("node"), col("is_seed"),
      when(col("is_seed"), expr(s"$scale div ns")).otherwise(0L).as("pr"))
    for (_ <- 0 until iters) {
      val inflow = e
        .join(ranks.select(col("node").as("src"), col("pr"))
          .hint("shuffle_hash"), "src")
        .join(deg.hint("shuffle_hash"), "src")
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("inflow"))
      ranks = nodesS
        .join(inflow.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          (when(col("is_seed"),
            expr(s"((100 - $dampingPct) * ($scale div ns)) div 100"))
            .otherwise(0L) +
            expr(s"($dampingPct * coalesce(inflow, 0L)) div 100")).as("pr"))
    }
    val out = ranks.select(col("node"), col("is_seed"), col("pr"))
    out.crossJoin(broadcast(out.agg(sum("pr").as("pr_sum"))))
  }

  /** EMBEDDING SMOOTHNESS over a graph — per node, how aligned the
    * node's own vector is with the SUM of its neighbors' vectors:
    * the homophily audit of a knn/near-dup graph in the GNN-era
    * sense (a low-alignment node is a hub stitching unrelated
    * regions or an outlier mis-wired into a neighborhood — exactly
    * the edges a curation pass should distrust), and the embedding
    * twin of [[neighborSimilarity]]'s structural overlap.
    *
    * The float formulation (cosine against a float mean) is NOT
    * reproducible at scale — neighbor sums change with shuffle
    * order. Here every coordinate enters as an exact micro-unit
    * integer (the [[graft.sim.Similarity.diversity]] ladder), the
    * neighborhood sum is exact integer addition in any order, and
    * alignment is emitted as `cos²` in ppm — `dot²·10⁶ div
    * (‖a‖²·‖s‖²)` in DECIMAL(38,0) (HUGEINT oracle-side) — plus the
    * sign bit, which together carry cosine without a square root.
    * Shape: one (node, dim)-keyed join + partial aggregation for the
    * neighborhood sums, one (node, dim) join against the node's own
    * coordinates, hash exchanges throughout.
    */
  def smoothness(edges: DataFrame, embeddings: DataFrame): DataFrame = {
    val micro = embeddings.select(col("vec_id"),
      expr("transform(embedding, v -> " +
        "CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))").as("u"))
    val coords = micro.select(col("vec_id"),
      posexplode(col("u")).as(Seq("j", "x")))
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val sj = e.join(coords.select(col("vec_id").as("dst"), col("j"),
        col("x")).hint("shuffle_hash"), "dst")
      .groupBy(col("src"), col("j")).agg(sum("x").as("sx"))
    val own = coords.select(col("vec_id").as("src"), col("j"),
      col("x").as("ax"))
    val terms = sj.join(own.hint("shuffle_hash"), Seq("src", "j"))
      .groupBy("src")
      .agg(sum(expr("CAST(ax AS DECIMAL(38,0)) * sx")).as("dot"),
        sum(expr("CAST(ax AS DECIMAL(38,0)) * ax")).as("na2"),
        sum(expr("CAST(sx AS DECIMAL(38,0)) * sx")).as("ns2"))
    // cos²·10⁶ = dot²·10⁶ div (na2·ns2). The exact DECIMAL(38,0)
    // branch holds while dot² ·10⁶ and na2·ns2 stay under 10³⁸ —
    // |dot| < 10¹⁵, na2 < 10¹⁴, ns2 < 10²⁴ (unit coords at dim 64:
    // true through deg ≈ 1.5e5). Past that, dot ~ dim·deg·10¹²
    // squares over DECIMAL(38,0) and Spark's non-ANSI arithmetic
    // would null silently while the HUGEINT oracle errors, so the
    // wide branch first downscales all three terms by 2²⁰ (identical
    // truncating div on both engines in the positive quadrant —
    // sign rides `aligned`); ≤ ppm-level rounding, good through
    // deg ≈ 5e7 at dim 64. `greatest(·,1)` pins degenerate
    // sub-micro norms (na2 < 2²⁰) instead of dividing by zero.
    terms.join(deg.hint("shuffle_hash"), "src")
      .select(col("src").as("node"), col("deg"),
        (col("dot") >= 0).as("aligned"),
        expr("CASE WHEN na2 > 0 AND ns2 > 0 THEN " +
          "CASE WHEN abs(dot) < 1000000000000000 " +
          "AND na2 < 100000000000000 " +
          "AND ns2 < 1000000000000000000000000 THEN " +
          "CAST(dot * dot * 1000000 div (na2 * ns2) AS BIGINT) " +
          "ELSE CAST(CAST(abs(dot) div 1048576 AS DECIMAL(38,0)) * " +
          "(abs(dot) div 1048576) * 1000000 div " +
          "(CAST(greatest(na2 div 1048576, 1) AS DECIMAL(38,0)) * " +
          "greatest(ns2 div 1048576, 1)) AS BIGINT) END END")
          .as("cos2_ppm"))
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * edge list — the cohesion audit of a near-dup/knn graph (dense
    * triangle neighborhoods = tight duplicate families; a high-degree
    * low-coefficient node = a hub stitching unrelated docs, the
    * false-merge smell).
    *
    * DEGREE-ORDERED node-iterator (the only triangle formulation that
    * survives skew at 100 TB): every canonical edge is oriented from
    * its lower-(degree, id) endpoint to the higher, wedges pair the
    * out-neighbors of each node, and a wedge closes iff its directed
    * closing edge exists. Orienting by degree bounds out-degrees by
    * O(√|E|) regardless of hubs — a star graph yields ZERO wedges
    * (every edge points at the hub) where the naive neighbor pairing
    * is quadratic in hub degree. Each triangle is found exactly once
    * (at its lowest-rank vertex) and credited to all three corners.
    * All joins are equi-joins on node keys; nothing is all-pairs.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val canon = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient a→b when (deg, id) of a precedes b's; carry the head's
    // degree so wedges can order their two heads without a re-join
    val dir = canon
      .join(deg.select(col("node").as("a"), col("d").as("da")).hint("shuffle_hash"), "a")
      .join(deg.select(col("node").as("b"), col("d").as("db")).hint("shuffle_hash"), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("db"))
          .otherwise(col("da")).as("vd"))
    val wedges = dir.as("x")
      .join(dir.as("y").hint("shuffle_hash"),
        col("x.u") === col("y.u") &&
          (col("x.vd") < col("y.vd") ||
            (col("x.vd") === col("y.vd") && col("x.v") < col("y.v"))))
      .select(col("x.u").as("w0"), col("x.v").as("v1"), col("y.v").as("v2"))
    val tri = wedges
      .join(dir.select(col("u").as("v1"), col("v").as("v2")).hint("shuffle_hash"),
        Seq("v1", "v2"))
    val perNode = tri
      .select(explode(array(col("w0"), col("v1"), col("v2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode.hint("shuffle_hash"), Seq("node"), "left")
      .select(col("node"), col("d").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("d") < 2, lit(0.0)).otherwise(
          round(coalesce(col("n_tri"), lit(0L)).cast("double") * 2.0 /
            (col("d").cast("double") * (col("d") - 1).cast("double")), 6))
          .as("clust_coeff"))
  }

  /** Bounded-round k-core peeling: synchronously remove every node
    * with fewer than `k` surviving neighbors, `iters` times — the
    * dense-subgraph audit of a near-dup/knn graph (the k-core is
    * where template families and boilerplate clusters live; nodes
    * peeled early are the loosely-attached periphery a curation pass
    * keeps). Converges to the true k-core FROM ABOVE: a non-fixpoint
    * round count yields a superset (conservative — never drops a
    * core member), and the round count is a model constant like
    * every other iterative operator here, so the plan depth never
    * depends on data. Each round is one degree aggregation and one
    * semi-join per endpoint on integer keys; per-round [[Rounds]]
    * materialization truncates the 3-reference round lineage, and
    * the observed surviving-edge count exits early at the peel's
    * fixpoint (a no-removal round proves all later rounds no-ops —
    * bit-identical results, zero extra actions).
    * Output: surviving (node, degree) — degree within the core —
    * plus a `converged` flag on every row: TRUE iff the final round
    * removed no edge (the peel reached its fixpoint, so the result
    * IS the exact k-core), FALSE when a corpus peels deeper than
    * `iters` rounds and the survivors are a conservative superset.
    * Without the flag a deep-peel corpus silently reports the
    * superset as exact — the one extra count aggregation (both
    * frames are already checkpoint-materialized) turns the silent
    * approximation into a recorded fact.
    */
  def kCore(edges: DataFrame, k: Int, iters: Int = 6): DataFrame = {
    require(k >= 1 && iters >= 1, s"k ($k) and iters ($iters) must be positive")
    val e = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
    var (und, nUnd) = Rounds.materializeCounted(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    var prev = und
    var round = 0
    var converged = false
    while (round < iters && !converged) {
      val keep = und.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("node"))
      prev = und
      val before = nUnd
      // each round references `und` three times (degrees + both
      // endpoint semi-joins): truncate lineage per round, the
      // componentSizes lesson. The surviving-edge count rides the
      // checkpoint job as an observed metric — a round that removed
      // nothing is the peel's fixpoint, every later round a no-op
      val (next, after) = Rounds.materializeCounted(und
        .join(keep.select(col("node").as("src")).hint("shuffle_hash"), "src")
        .join(keep.select(col("node").as("dst")).hint("shuffle_hash"), "dst")
        .select("src", "dst"))
      und = next
      nUnd = after
      round += 1
      converged = after == before
    }
    val conv = prev.agg(count(lit(1)).as("n_prev"))
      .crossJoin(und.agg(count(lit(1)).as("n_last")))
      .select((col("n_prev") === col("n_last")).as("converged"))
    und.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
      .crossJoin(broadcast(conv))
  }

  /** Connected-component size histogram over an edge list: how many
    * components of each size the graph has — the cluster-size
    * distribution a curation pipeline audits before deduplication
    * (one giant near-dup component means the threshold is too
    * loose). Each round combines min-label propagation with a
    * POINTER-DOUBLING shortcut (adopt the label of your label), so
    * convergence needs O(log diameter) rounds, not O(diameter) —
    * the only iteration count that survives real graphs at 100 TB
    * (`iters` = 6 covers diameters up to ~2^6). Labels are integer
    * mins: exact in any order, bit-reproducible like [[pageRank]].
    * Nodes appear via their edges (isolated nodes are not counted —
    * the edge-list formulation). Output is `|distinct sizes|` rows.
    */
  def componentSizes(edges: DataFrame, iters: Int = 6): DataFrame =
    sizeHistogram(componentLabels(edges, iters))

  private def sizeHistogram(labels: DataFrame): DataFrame =
    labels.groupBy("lab").agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("component_size"))
      .agg(count(lit(1)).as("n_components"))

  /** Connected-component LABELS (node → min-node-id of its
    * component) — the fit half of [[componentSizes]], exposed so the
    * label frame itself can be persisted and incrementally
    * maintained ([[mergeComponentLabels]]) the way the keeper model
    * is: at 100 TB the component fit runs once per corpus build and
    * each ingest batch merges into it, never re-propagates the whole
    * graph. */
  def componentLabels(edges: DataFrame, iters: Int = 6): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    // the mirrored edge frame is every round's probe side, always
    // joined on src: materialize it ONCE, pre-partitioned on the
    // join key (checkpoint preserves partitioning), so no round ever
    // re-exchanges the edges — at 100 TB that is a corpus-scale
    // shuffle saved per round (guide §2.4: establish the
    // partitioning once); partition count follows
    // spark.sql.shuffle.partitions, never a constant
    val und = Rounds.materialize(
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src")))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // checkpointed so each round reads a materialized frame instead
    // of re-deriving the node set
    var labels = Rounds.materialize(
      nodes.select(col("node"), col("node").as("lab")))
    var converged = false
    var round = 0
    while (round < iters && !converged) {
      // propagate: min label over the in-neighborhood (und is
      // symmetric, so this is the full neighborhood); the old label
      // rides along as lab0 so the round's changed-count can ride
      // the checkpoint job
      val nbrMin = und
        .join(labels.select(col("node").as("src"), col("lab")).hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("node")).agg(min("lab").as("nbr"))
      val prop = labels.join(nbrMin.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"), col("lab").as("lab0"),
          least(col("lab"), coalesce(col("nbr"), col("lab"))).as("lab"))
      // shortcut: adopt the label of your label (path doubling). The
      // shortcut references `prop` twice, so the unresolved plan
      // would DOUBLE every round (2^iters subplans — Catalyst
      // analysis explodes long before the data does). Iterative
      // graph algorithms truncate lineage per round (Rounds
      // materializes without touching the driver); labels only ever
      // decrease, so an unchanged round proves every later round is
      // a no-op — the observed changed-count costs no extra action
      // and the result is bit-identical to running all `iters`
      // rounds
      val (next, changed) = Rounds.materializeChanged(prop.as("p")
        .join(prop.select(col("node").as("lnode"), col("lab").as("lab2"))
          .hint("shuffle_hash"), col("p.lab") === col("lnode"), "left")
        .select(col("p.node").as("node"),
          least(col("p.lab"), coalesce(col("lab2"), col("p.lab"))).as("lab"),
          col("p.lab0").as("lab0"))
        .select(col("node"), col("lab"), (col("lab") =!= col("lab0")).as("chg")))
      round += 1
      converged = changed == 0L
      labels = next
    }
    labels
  }

  /** INCREMENTAL component maintenance — absorb a delta edge batch
    * into fitted component labels without re-propagating the base
    * graph (the [[graft.dedup.Dedup.mergeKeepers]] discipline for
    * graphs): every delta edge CONTRACTS through the base labels
    * (`endpoint → its component label`, a new node passing through
    * as itself — label ids are min node ids, so the two id spaces
    * can never collide), components run on the CONTRACTED quotient
    * graph — delta-sized, never corpus-sized — and base labels remap
    * through the quotient roots with one broadcast join (untouched
    * labels pass through byte-identical). Components of the quotient
    * of base-components by delta edges ARE the components of
    * base ∪ delta, so the merge is exact, not an approximation —
    * spec-pinned `merge(fit(base), delta) ≡ fit(base ∪ delta)`.
    */
  def mergeComponentLabels(baseLabels: DataFrame, deltaEdges: DataFrame,
                           iters: Int = 6): DataFrame = {
    val d = deltaEdges.select(col("src"), col("dst"))
    val contracted = componentLabels(
      d.join(baseLabels.select(col("node").as("src"), col("lab").as("ls"))
          .hint("shuffle_hash"), Seq("src"), "left")
        .join(baseLabels.select(col("node").as("dst"), col("lab").as("ld"))
          .hint("shuffle_hash"), Seq("dst"), "left")
        .select(coalesce(col("ls"), col("src")).as("src"),
          coalesce(col("ld"), col("dst")).as("dst")), iters)
    // quotient roots are delta-bounded — broadcast them to the
    // corpus-sized base label frame; a label the delta never touched
    // is absent from the quotient and passes through unchanged
    val roots = contracted
      .select(col("node").as("k"), col("lab").as("root"))
    val remappedBase = baseLabels
      .join(broadcast(roots), col("lab") === col("k"), "left")
      .select(col("node"), coalesce(col("root"), col("lab")).as("lab"))
    // quotient vertices that are NOT base nodes are the delta's new
    // nodes (label ids are base node ids, so the anti-join is exact)
    val newNodes = roots
      .join(baseLabels.select(col("node").as("k")).hint("shuffle_hash"),
        Seq("k"), "left_anti")
      .select(col("k").as("node"), col("root").as("lab"))
    remappedBase.union(newNodes)
  }

  /** [[componentSizes]] through the incremental path: fit on the
    * base edges, merge the delta batch, histogram the merged labels
    * — certified against the FULL-graph fit's own oracle by the
    * quotient equivalence. */
  def componentSizesIncremental(baseEdges: DataFrame,
                                deltaEdges: DataFrame,
                                iters: Int = 6): DataFrame =
    sizeHistogram(
      mergeComponentLabels(componentLabels(baseEdges, iters), deltaEdges,
        iters))

  /** Persist a fitted component-label frame as a versioned artifact
    * — the publish half of graph serving: unlike the model-sized
    * ANN/PCA/bloom parts, the label frame is CORPUS-sized (one row
    * per node), so it writes as a plain multi-file parquet TABLE
    * under the same [[VersionedStore]] atomic-rename commit (the
    * StateTable discipline, not the saveIndex coalesce-to-one), and
    * every consumer — [[sizeHistogram]] audits,
    * [[mergeComponentLabels]] ingest merges, label joins — reads the
    * LOADED table instead of re-propagating the graph.
    */
  def saveLabels(labels: DataFrame, dir: String, version: Long): Unit =
    VersionedStore.commit(labels.sparkSession, dir, s"v=$version") {
      staging => labels.write.parquet(staging.toString)
    }: Unit

  /** Load a persisted component-label frame (latest version unless
    * pinned) — the read half of [[saveLabels]]. */
  def loadLabels(spark: org.apache.spark.sql.SparkSession, dir: String,
                 version: Option[Long] = None): DataFrame = {
    val v = version
      .orElse(VersionedStore.listVersions(spark, dir, "v=").maxOption)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no component labels under $dir"))
    spark.read.parquet(s"$dir/v=$v")
  }

  /** The component-size audit read from PERSISTED labels — integer
    * labels round-trip parquet exactly, so the loaded histogram is
    * byte-equal to the fitting run and certifies against the
    * full-graph oracle. */
  def componentSizesLoaded(labels: DataFrame): DataFrame =
    sizeHistogram(labels)

  /** Link prediction by neighbor overlap: for every NON-adjacent node
    * pair sharing at least one neighbor, the Jaccard similarity of
    * their neighbor sets — the top pairs are the edges the graph is
    * "missing" (on a near-dup/knn graph: document pairs the radius
    * threshold split that cluster-level curation should reconsider).
    *
    * Shape: wedge equi-join through the shared neighbor (u—w—v), count
    * per pair, anti-join against the mirrored edge list to drop pairs
    * already adjacent, then degrees via two keyed joins. Everything is
    * an equi-join on node keys — no all-pairs stage; candidate pairs
    * are exactly the 2-hop pairs the wedge join materializes. Hub
    * nodes quadratically inflate the wedge stage on a general graph
    * (a knn graph's degree is bounded by construction), so `maxDegree`
    * excludes wedge *centers* above the cap — the [[triangles]]
    * hub-bounding discipline; excluded-center pairs can still surface
    * through their other common neighbors. The final top-k is a
    * TakeOrdered heap, never a global sort.
    */
  /** Edge-support audit: for every (undirected, canonical) edge, the
    * number of triangles it participates in — its "support". A
    * support-0 edge is bridge-LIKE: nothing else corroborates the
    * connection, so in a near-dup graph it is the classic
    * false-merge suspect (one borderline pair chaining two otherwise
    * unrelated template families through label propagation); the
    * k-core/triangle views rank NODES, this ranks the EDGES a
    * curation pass should re-verify first. Support is the wedge
    * count between the edge's endpoints — one equi-join through the
    * shared neighbor, the [[neighborSimilarity]] machinery pointed at
    * ADJACENT pairs — plus endpoint degrees for context. No
    * all-pairs stage; hubs bound exactly as there.
    */
  def edgeSupport(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("d"))
    val canon = und.filter(col("src") < col("dst"))
    val wedges = und.select(col("dst").as("w"), col("src").as("u"))
      .join(und.select(col("dst").as("w"), col("src").as("v"))
        .hint("shuffle_hash"), "w")
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
    canon
      .join(wedges.select(col("u").as("src"), col("v").as("dst"),
        col("support")).hint("shuffle_hash"), Seq("src", "dst"), "left")
      .join(deg.select(col("src"), col("d").as("d_src"))
        .hint("shuffle_hash"), "src")
      .join(deg.select(col("src").as("dst"), col("d").as("d_dst"))
        .hint("shuffle_hash"), "dst")
      .select(col("src"), col("dst"),
        coalesce(col("support"), lit(0L)).as("support"),
        col("d_src"), col("d_dst"),
        (coalesce(col("support"), lit(0L)) === 0L).as("is_weak"))
  }

  def neighborSimilarity(edges: DataFrame, k: Int = 20,
                         maxDegree: Long = 10000L): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("d"))
    val capped = und.join(
      deg.filter(col("d") <= maxDegree).select(col("src").as("dst"))
        .hint("shuffle_hash"), "dst")
    val wedges = capped.select(col("dst").as("w"), col("src").as("u"))
      .join(capped.select(col("dst").as("w"), col("src").as("v"))
        .hint("shuffle_hash"), "w")
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("common"))
    val nonAdj = wedges.join(
      und.select(col("src").as("u"), col("dst").as("v"))
        .hint("shuffle_hash"),
      Seq("u", "v"), "left_anti")
    nonAdj
      .join(deg.select(col("src").as("u"), col("d").as("du"))
        .hint("shuffle_hash"), "u")
      .join(deg.select(col("src").as("v"), col("d").as("dv"))
        .hint("shuffle_hash"), "v")
      .select(col("u"), col("v"), col("common"),
        round(col("common").cast("double") /
          (col("du") + col("dv") - col("common")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("u"), col("v"))
      .limit(k)
  }

  /** Modularity of an EXTERNAL node partition (labels) over the
    * graph: Q = Σ_c [ e_c/m − (d_c/2m)² ] — how much more intra-label
    * connectivity the graph shows than a degree-preserving random
    * rewiring would. The audit that says whether embedding-cluster
    * labels AGREE with the similarity graph's actual structure
    * (Q near 0 ⇒ labels are noise w.r.t. the graph; strongly
    * positive ⇒ the clustering found real communities) — worth
    * checking before any per-label curation decision trusts the
    * labels. Everything is exact integer counting (canonical edge
    * count m, intra-label edge counts, degree sums) until the final
    * per-label division, so the 6dp contributions are
    * engine-reproducible; per-label output plus the total Q on a
    * broadcast single row — every audit ships its own check. Nodes
    * missing from `labels` count toward m and degrees but form no
    * community (their mass only lowers Q, never crashes the audit).
    */
  /** Degree ASSORTATIVITY: the Pearson correlation of endpoint
    * degrees over every directed edge stub — the one-number mixing
    * audit of a similarity graph (positive: hubs link to hubs, the
    * template-family signature where boilerplate clusters
    * interconnect; negative: hub-and-spoke, one template with many
    * one-off variants). Both directions of each undirected edge
    * count once as a stub, so the statistic is symmetric without a
    * canonicalization pass. One degree aggregation + two keyed joins
    * onto the edge list + one moment aggregate to a single row — no
    * iteration, nothing all-pairs; Pearson from population moments
    * (NOT `corr`: ANSI errors on its zero-variance divide; a
    * REGULAR graph — every degree equal — answers an explicit NULL,
    * the same verdict DuckDB's corr gives).
    */
  def assortativity(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("d"))
    // exact integer power sums over the stubs (degrees are integers;
    // DECIMAL(38,0)/HUGEINT so hub-degree squares can't wrap int64 —
    // the graph_hits widening lesson), one IEEE-nearest
    // decimal→double conversion before the final divide: the
    // coefficient is bit-identical across engines and shuffle orders
    val d19 = "decimal(19,0)"
    val stubs = und
      .join(deg.select(col("src"), col("d").as("d_src"))
        .hint("shuffle_hash"), "src")
      .join(deg.select(col("src").as("dst"), col("d").as("d_dst"))
        .hint("shuffle_hash"), "dst")
      .select(col("d_src").cast(d19).as("x"), col("d_dst").cast(d19).as("y"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      round(avg("d"), 4).as("avg_degree"))
    val m = stubs.agg(count(lit(1)).as("n_stubs"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
      .withColumn("num", col("n_stubs") * col("sxy") - col("sx") * col("sy"))
      .withColumn("vxi", col("n_stubs") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vyi", col("n_stubs") * col("syy") - col("sy") * col("sy"))
    m.crossJoin(broadcast(nodes))
      .select(col("n_nodes"), (col("n_stubs") / 2).cast("long").as("n_edges"),
        col("avg_degree"),
        when(col("vxi") === 0 || col("vyi") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("num").cast("double") /
            sqrt(col("vxi").cast("double") * col("vyi").cast("double")), 4))
          .as("assortativity"))
  }

  def labelModularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val canon = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // referenced by m, degrees, and intra counts
    val m = canon.agg(count(lit(1)).as("m"))
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val lab = labels.select(col("node"), col("label"))
    val eIn = canon
      .join(lab.select(col("node").as("a"), col("label").as("la"))
        .hint("shuffle_hash"), "a")
      .join(lab.select(col("node").as("b"), col("label").as("lb"))
        .hint("shuffle_hash"), "b")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("e_in"))
    val dSum = deg.join(lab.hint("shuffle_hash"), "node")
      .groupBy("label").agg(sum("d").as("d_sum"),
        count(lit(1)).as("n_nodes"))
    // both sides are per-label aggregates (≤ |labels| rows — model
    // constants): broadcast the intra-edge counts instead of letting
    // the planner sort-merge two tiny frames
    val per = dSum.join(broadcast(eIn), Seq("label"), "left")
      .crossJoin(broadcast(m))
      .select(col("label"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_sum"),
        round(coalesce(col("e_in"), lit(0L)).cast("double") / col("m") -
          (col("d_sum").cast("double") / (col("m") * 2)) *
          (col("d_sum").cast("double") / (col("m") * 2)), 6).as("q_part"))
    per.crossJoin(broadcast(per.agg(round(sum("q_part"), 6).as("q_total"))))
  }

  /** Bounded-round multi-source BFS: every graph node's hop distance
    * to its nearest seed (the influence-radius / coverage audit — how
    * far is each doc from a curated prototype; which corners of the
    * near-dup graph do the seeds not reach). Synchronous layered
    * relaxation: each round reached nodes push `dist + 1` to their
    * neighbors, unreached neighbors adopt the minimum — in BFS a
    * node's FIRST assignment is already its shortest distance, so
    * rounds only ever fill nulls, never revise (which is what makes
    * the replay engine-exact). O(diameter) rounds bounded by
    * `rounds`, one keyed join + one aggregation each, per-round
    * lineage truncation like every iterative graph op here.
    *
    * `dist` is null for nodes unreached within `rounds`; the global
    * `converged` flag (reached-set unchanged across the last two
    * rounds — every audit ships its own check, the k-core
    * discipline) says whether those nulls mean DISCONNECTED or
    * merely beyond the bound. Seeds outside the edge list are
    * ignored: distances are a property of the graph.
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame,
                   rounds: Int = 6): DataFrame = {
    require(rounds >= 1, s"rounds ($rounds) must be positive")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    // pre-partitioned on the per-round join key — the componentLabels
    // discipline: no round re-exchanges the edge frame
    val und = Rounds.materialize(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        .repartition(col("src")))
    val nodes = und.select(col("src").as("node")).distinct()
    var dist = Rounds.materialize(nodes
      .join(seeds.select(col("node")).distinct()
        .withColumn("d0", lit(0L)), Seq("node"), "left")
      .select(col("node"), col("d0").as("dist")))
    var prev = dist
    var converged = false
    var round = 0
    while (round < rounds && !converged) {
      val relax = und
        .join(dist.filter(col("dist").isNotNull)
          .select(col("node").as("src"), col("dist")).hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("dist") + 1L).as("cand"))
      prev = dist
      // fixpoint early exit: assignments only fill nulls, so a round
      // that reaches no new node proves the rest are no-ops — skip
      // them without changing a single output bit. The newly-reached
      // count rides the checkpoint job as an observed metric
      val (next, reached) = Rounds.materializeChanged(
        dist.join(relax.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"), coalesce(col("dist"), col("cand")).as("dist"),
            (col("dist").isNull && col("cand").isNotNull).as("chg")))
      dist = next
      round += 1
      converged = reached == 0L
    }
    // in-plan convergence flag over the two checkpointed frames —
    // identical to the loop's own compare (and to it at the bound,
    // where the loop never compared)
    val conv = prev.filter(col("dist").isNotNull)
      .agg(count(lit(1)).as("n_prev"))
      .crossJoin(dist.filter(col("dist").isNotNull)
        .agg(count(lit(1)).as("n_last")))
      .select((col("n_prev") === col("n_last")).as("converged"))
    dist.crossJoin(broadcast(conv))
  }

  /** LANDMARK harmonic closeness: per-landmark hop distances from
    * the k smallest-id nodes (a deterministic landmark set — real
    * deployments sample or degree-weight; determinism makes the
    * selection itself replayable), aggregated per node into harmonic
    * centrality Σ 1/d — the which-docs-sit-central ranking exact
    * closeness needs all-pairs BFS for, approximated with k sweeps.
    * Harmonic (not classic closeness) so disconnection is a small
    * term, not a divide-by-zero, and the sum runs in exact INTEGER
    * parts-per-million (`1000000 div d` — order-independent, so the
    * score is engine- and shuffle-reproducible, the pageRank
    * fixed-point discipline). One BFS with state keyed on (node,
    * seed) instead of k sequential sweeps: state is reached pairs
    * only (≤ k·N rows — k is a model constant), each round one keyed
    * join + one min-aggregation + one full-outer merge, [[Rounds]]
    * materialization + the observed zero-new-pairs fixpoint exit.
    * Every row carries `n_reached` (landmarks seeing the node) and
    * the `converged` flag (the k-core discipline: bound-exhausted
    * sweeps are labeled, never silently partial).
    */
  def landmarkCloseness(edges: DataFrame, k: Int = 4,
                        rounds: Int = 6): DataFrame = {
    require(k >= 1, s"k ($k) must be positive")
    require(rounds >= 1, s"rounds ($rounds) must be positive")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    // pre-partitioned on the per-round join key (componentLabels)
    val und = Rounds.materialize(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        .repartition(col("src")))
    val lm = und.select(col("src").as("node")).distinct()
      .orderBy("node").limit(k)
    var dist = Rounds.materialize(
      lm.select(col("node"), col("node").as("seed"), lit(0L).as("dist")))
    var converged = false
    var it = 0
    while (it < rounds && !converged) {
      val relax = und
        .join(dist.select(col("node").as("src"), col("seed"), col("dist"))
          .hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("node"), col("seed"))
        .agg(min(col("dist") + 1L).as("cand"))
      // full-outer merge on the composite key: existing pairs keep
      // their (already-minimal) distance, relax-only pairs are the
      // round's newly-reached frontier
      val (next, reached) = Rounds.materializeChanged(
        dist.join(relax.hint("shuffle_hash"), Seq("node", "seed"), "full")
          .select(col("node"), col("seed"),
            coalesce(col("dist"), col("cand")).as("dist"),
            col("dist").isNull.as("chg")))
      dist = next
      it += 1
      converged = reached == 0L
    }
    dist.groupBy("node")
      .agg(count(lit(1)).as("n_reached"),
        sum(when(col("dist") > 0, expr("1000000 div dist"))
          .otherwise(0L)).as("harmonic_ppm"),
        round(avg("dist"), 4).as("avg_dist"))
      .withColumn("converged", lit(converged))
  }

  /** PIVOT BETWEENNESS, R-BOUNDED — Brandes' algorithm from a
    * deterministic pivot set, radius-truncated: which nodes sit ON
    * the shortest paths between others (the broker/bottleneck
    * ranking — in a near-dup or knn graph, a high-betweenness node
    * is the bridge stitching two otherwise-separate duplicate
    * families or topical regions, exactly the doc to inspect before
    * trusting a merge). [[pageRank]] ranks by mass received,
    * [[landmarkCloseness]] by distance out; neither sees brokerage.
    *
    * Exact-with-stated-bounds, never sampled-by-RNG: pivots are the
    * `pivots` smallest-id nodes (the [[landmarkCloseness]] landmark
    * discipline — replayable selection), paths are truncated at
    * `rounds` hops (k-bounded betweenness), and the backward
    * dependency accumulation δ(v) = Σ_w σv·(1+δw)/σw runs in
    * FIXED-POINT ppm with floored integer division at every term —
    * the pageRank reproducibility argument: float δ at 100 TB is
    * shuffle-order-dependent, integer δ is bit-identical on any
    * engine, and the oracle replays the identical floors.
    *
    * Shape: `rounds` forward BFS rounds keyed (seed, node) carrying
    * the path-count σ (one keyed join + partial-agg + anti-join per
    * round, [[Rounds]]-materialized), then `rounds` backward rounds
    * walking the BFS DAG one level up per step (level frames are
    * already materialized — each backward step is one keyed join
    * against the level above). State is reached (seed, node) pairs,
    * ≤ pivots·N rows; σ sums and δ terms widen through
    * DECIMAL(38,0) (σ is bounded by deg^rounds, which overflows
    * int64 on real degree distributions).
    */
  def betweenness(edges: DataFrame, pivots: Int = 4,
                  rounds: Int = 4): DataFrame = {
    require(pivots >= 1 && rounds >= 1,
      s"pivots ($pivots) and rounds ($rounds) must be positive")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    // pre-partitioned on src — the forward rounds' join key (the
    // backward rounds join on dst and pay their exchange; a second
    // dst-partitioned copy would double edge storage for 4 joins)
    val und = Rounds.materialize(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        .repartition(col("src")))
    val nodes = und.select(col("src").as("node")).distinct()
    val pv = nodes.orderBy("node").limit(pivots)
    // forward: one frame per BFS level, most recent first
    var levels = List(Rounds.materialize(
      pv.select(col("node"), col("node").as("seed"),
        lit(1L).cast("decimal(38,0)").as("sigma"))))
    var acc = levels.head.select("node", "seed")
    for (_ <- 1 to rounds) {
      val relax = und
        .join(levels.head.select(col("node").as("src"), col("seed"),
          col("sigma")).hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("node"), col("seed"))
        .agg(sum("sigma").as("sigma"))
      val nw = Rounds.materialize(
        relax.join(acc.hint("shuffle_hash"), Seq("node", "seed"), "left_anti"))
      levels = nw :: levels
      // LAZY union of already-materialized level frames: every leaf
      // is a checkpoint, so lineage grows one leaf per round (linear,
      // never the 2^rounds doubling the per-round materialize
      // guards against) and the union needs no job of its own —
      // previously each round paid a full acc rewrite
      acc = acc.unionByName(nw.select("node", "seed"))
    }
    // backward: δ at the deepest level is 0; each step accumulates
    // one level down through the DAG edges (d(w) = d(v) + 1)
    var deltaUp: DataFrame = null
    var bc: DataFrame = null
    for (idx <- 1 until levels.length) {
      val lvl = levels(idx)       // level R - idx (the v side)
      val upper = levels(idx - 1) // level R - idx + 1 (the w side)
      val upperD =
        if (deltaUp == null)
          upper.select(col("node"), col("seed"), col("sigma"),
            lit(0L).cast("decimal(38,0)").as("delta"))
        else upper.join(deltaUp.hint("shuffle_hash"),
            Seq("node", "seed"), "left")
          .select(col("node"), col("seed"), col("sigma"),
            coalesce(col("delta"), lit(0L).cast("decimal(38,0)"))
              .as("delta"))
      val contrib = und
        .join(upperD.select(col("node").as("dst"), col("seed"),
          col("sigma").as("sw"), col("delta").as("dw"))
          .hint("shuffle_hash"), "dst")
        .select(col("src").as("node"), col("seed"), col("sw"), col("dw"))
        .join(lvl.select(col("node"), col("seed"),
          col("sigma").as("sv")).hint("shuffle_hash"), Seq("node", "seed"))
        .groupBy("node", "seed")
        .agg(sum(expr("(sv * (1000000 + dw)) div sw")).as("delta"))
      deltaUp = Rounds.materialize(contrib)
      // lazy union of materialized per-level delta frames (same
      // linear-lineage argument as the forward accumulator)
      bc = if (bc == null) deltaUp else bc.unionByName(deltaUp)
    }
    val seen = acc.groupBy("node").agg(count(lit(1)).as("n_seen"))
    val perNode = bc.filter(col("node") =!= col("seed"))
      .groupBy("node")
      .agg(expr("CAST(sum(delta) AS BIGINT)").as("bc_ppm"))
    nodes
      .join(seen.hint("shuffle_hash"), Seq("node"), "left")
      .join(perNode.hint("shuffle_hash"), Seq("node"), "left")
      .join(broadcast(pv.withColumn("is_pivot", lit(true))),
        Seq("node"), "left")
      .select(col("node"),
        coalesce(col("is_pivot"), lit(false)).as("is_pivot"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        coalesce(col("bc_ppm"), lit(0L)).as("bc_ppm"))
  }

  /** Bounded-iteration HITS (hubs & authorities) in FIXED-POINT
    * integer arithmetic — the directed-graph complement of
    * [[pageRank]]: on a citation/link/reference graph, authorities
    * are the pages good hubs point AT, hubs the pages that point at
    * good authorities (for corpus curation: authoritative domains vs
    * link-farm hubs — the two are different lists, and pageRank
    * conflates them). Classic HITS normalizes by L2 norm — floats,
    * engine-irreproducible at scale; this variant normalizes by the
    * MAXIMUM (L∞) instead: every round is integer sums plus one
    * integer `scale·x div max(x)` rescale off a broadcast single-row
    * aggregate, so scores are exact integers on any engine, any
    * partitioning (the [[pageRank]] reproducibility argument; the
    * induced ranking equals L2-normalized HITS — normalization never
    * reorders). Sums and the rescale run WIDE (DECIMAL(38,0) —
    * HUGEINT in the oracle): a hub's raw score is scale·degree, and
    * an int64 sum overflows at in-degree ≈ 9·10⁶, which real link
    * graphs exceed. Each half-round is one keyed join + one
    * aggregation, materialized through [[Rounds]] — the rescale
    * references its frame twice (rows + max), so an unmaterialized
    * loop would quadruple the plan per iteration (the componentSizes
    * lesson). Nodes with no in-edges carry authority 0, no
    * out-edges hub 0 — every graph node appears.
    */
  def hits(edges: DataFrame, iters: Int = 2,
           scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be positive")
    // loop-INVARIANT inputs materialize ONCE: every half-round job
    // re-reads both, and the edge lineage (a knn self-join upstream)
    // must not re-execute per round (the keeper-loop lesson)
    val e = Rounds.materialize(edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct())
    val nodes = Rounds.materialize(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    // raw score = Σ scale-sized partners ≈ scale·degree: both the
    // SUM and the rescale product run in DECIMAL(38,0) (DuckDB
    // replays them in HUGEINT) — an int64 sum wraps/errors at hub
    // in-degree ≈ 9·10⁶; floor-divide lands back in exact int64.
    // The L∞ norm rides the RAW frame's checkpoint as an observed
    // metric (the materializeChanged discipline — zero extra
    // actions), so each half-round runs its corpus-scale join+agg
    // lineage ONCE: the former crossJoin(broadcast(df.agg(max)))
    // executed that lineage twice per half-round (once building the
    // broadcast max, once for the projection), and the rescale is now
    // a literal division over checkpointed rows.
    def renorm(df: DataFrame, c: String): DataFrame = {
      val obs = org.apache.spark.sql.Observation()
      val raw = Rounds.materialize(df.observe(obs, max(col(c)).as("mx")))
      val mx = obs.get.getOrElse("mx", null) match {
        case d: java.math.BigDecimal => d.toBigInteger.toString
        case n: Number => n.toString
        case _ => "0"
      }
      if (BigInt(mx) > 0)
        raw.select(col("node"),
          expr(s"CAST(($c * $scale) div CAST('$mx' AS DECIMAL(38,0)) " +
            "AS BIGINT)").as(c))
      else raw.select(col("node"), lit(0L).as(c))
    }
    var hub = nodes.select(col("node"), lit(scale).as("h"))
    var auth = nodes.select(col("node"), lit(0L).as("a"))
    for (_ <- 0 until iters) {
      auth = renorm(nodes.join(
        e.join(hub.select(col("node").as("src"), col("h"))
            .hint("shuffle_hash"), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("h").cast("decimal(38,0)")).as("a"))
          .hint("shuffle_hash"),
        Seq("node"), "left")
        .select(col("node"),
          coalesce(col("a"), lit(0L).cast("decimal(38,0)")).as("a")), "a")
      hub = renorm(nodes.join(
        e.join(auth.select(col("node").as("dst"), col("a"))
            .hint("shuffle_hash"), "dst")
          .groupBy(col("src").as("node"))
          .agg(sum(col("a").cast("decimal(38,0)")).as("h"))
          .hint("shuffle_hash"),
        Seq("node"), "left")
        .select(col("node"),
          coalesce(col("h"), lit(0L).cast("decimal(38,0)")).as("h")), "h")
    }
    hub.join(auth.hint("shuffle_hash"), Seq("node"))
      .select(col("node"), col("h").as("hub"), col("a").as("auth"))
  }

  /** Deterministic synchronous LABEL PROPAGATION — community
    * detection by neighborhood MAJORITY VOTE, the curation view
    * [[componentSizes]] cannot give: components glue everything a
    * single borderline edge chains together, while majority voting
    * keeps densely-knit groups separate (a 1-edge bridge between two
    * triangles loses 1-vote-to-2 on both sides — template families
    * stay distinct across a false-merge edge). Classic LPA is
    * notoriously nondeterministic (async order, random tie-breaks);
    * this variant is bit-reproducible by construction: synchronous
    * rounds, integer vote counts, ties broken by SMALLEST label via
    * one `max(struct(count, −label))` aggregate per round (the
    * integer argmax discipline — no floats anywhere). Each round is
    * one keyed join + two aggregations on node keys; per-round
    * lineage truncated by localCheckpoint; fixpoint early exit is
    * safe because an unchanged synchronous round is a fixed point of
    * the update map (every later round provably identical). Output
    * carries the audit numbers every row (community count + largest
    * community, one broadcast aggregate) — every audit ships its own
    * check. Duplicate/reverse edges are collapsed before voting: a
    * doubled edge must not vote twice.
    */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be positive")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    // pre-partitioned on the per-round join key (componentLabels)
    val und = Rounds.materialize(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        .repartition(col("src")))
    val nodes = und.select(col("src").as("node")).distinct()
    var labels = Rounds.materialize(
      nodes.select(col("node"), col("node").as("lab")))
    var round = 0
    var converged = false
    while (round < iters && !converged) {
      val votes = und
        .join(labels.select(col("node").as("src"), col("lab"))
          .hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("node"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val top = votes.groupBy("node")
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("top_lab"))
      // the fixpoint probe rides the checkpoint job as an observed
      // metric — no separate per-round isEmpty action
      val (next, changed) = Rounds.materializeChanged(
        labels.join(top.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("top_lab"), col("lab")).as("lab"),
            (col("top_lab").isNotNull && col("top_lab") =!= col("lab"))
              .as("chg")))
      round += 1
      converged = changed == 0L
      labels = next
    }
    val audit = labels.groupBy("lab").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_comms"), max("sz").as("max_comm"))
    labels.select(col("node"), col("lab").as("community"))
      .crossJoin(broadcast(audit))
  }

  /** CONDUCTANCE audit of the [[labelPropagation]] communities — the
    * quality number the partition itself can't show: cut(S) /
    * min(vol(S), 2m − vol(S)), low = densely knit and well separated
    * (a real template family), high = a label that leaks — majority
    * voting merged across a thin neck, or a community too sparse to
    * hold together. On the DOUBLED edge representation both terms
    * are plain row counts: vol(S) = directed rows leaving S-members
    * (= Σ degrees), cut(S) = directed rows from S whose far end
    * wears another label (each crossing undirected edge contributes
    * exactly one such row per side) — so the statistic is exact
    * integers until one 6dp division, bit-identical across engines
    * and partitionings. Cost beyond the LPA fit: one edge dedup +
    * two node-keyed shuffle-hash joins + one map-side-combined
    * aggregate down to a communities-sized frame; 2m rides a
    * broadcast single-row aggregate. A community holding the WHOLE
    * doubled volume (one label swallowed the graph) has
    * min(vol, 2m − vol) = 0 and answers an explicit NULL.
    */
  def conductance(edges: DataFrame, iters: Int = 3): DataFrame = {
    val labels = labelPropagation(edges, iters)
      .select(col("node"), col("community"))
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    val und = e
      .union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      // three consumers (both label joins read it, 2m counts it)
      .localCheckpoint()
    val marked = und
      .join(labels.select(col("node").as("src"), col("community").as("cs"))
        .hint("shuffle_hash"), "src")
      .join(labels.select(col("node").as("dst"), col("community").as("cd"))
        .hint("shuffle_hash"), "dst")
    val per = marked.groupBy(col("cs").as("community"))
      .agg(count(lit(1)).as("vol"),
        sum(when(col("cs") =!= col("cd"), lit(1L)).otherwise(lit(0L)))
          .as("cut"))
    val sizes = labels.groupBy(col("community"))
      .agg(count(lit(1)).as("members"))
    val tot = und.agg(count(lit(1)).as("m2"))
    per.join(sizes.hint("shuffle_hash"), Seq("community"))
      .crossJoin(broadcast(tot))
      .withColumn("denom", least(col("vol"), col("m2") - col("vol")))
      .select(col("community"), col("members"), col("vol"), col("cut"),
        when(col("denom") === 0, lit(null).cast("double"))
          .otherwise(round(col("cut").cast("double") / col("denom"), 6))
          .as("conductance"))
  }

  /** EDGE RECIPROCITY of the directed knn graph — what fraction of
    * a→b edges are answered by b→a. Mutual-knn edges are the
    * high-precision core of a similarity graph (both endpoints rank
    * each other into their top k — the usual prefilter before
    * clustering trusts an edge), so a LOW reciprocity warns that the
    * knn graph is dominated by asymmetric hub attraction (a few
    * centroids absorb everyone's edge budget; see [[degreeHistogram]]
    * for which nodes) and cluster quality will suffer. One equi-join
    * of the edge set against its own reversal — never a pairwise
    * construct — plus two model-frame counts; exact integer ppm.
    */
  /** The RECIPROCAL (mutual-knn) edge subset, one undirected row per
    * pair (src < dst): the high-precision core [[reciprocity]]
    * measures — both endpoints rank each other into their top k, so
    * hub-attraction edges (answered by nothing) drop out. Feeding
    * [[componentSizes]] with this subset is the classic
    * mutual-knn clustering: clusters bind only through edges BOTH
    * sides agree on, which is what keeps one hub from gluing
    * unrelated neighborhoods into a mega-component.
    */
  def mutualEdges(edges: DataFrame): DataFrame = {
    val e = edges.select("src", "dst").localCheckpoint()
    e.join(e.select(col("dst").as("src"), col("src").as("dst"))
        .hint("shuffle_hash"), Seq("src", "dst"))
      .filter(col("src") < col("dst"))
  }

  def reciprocity(edges: DataFrame): DataFrame = {
    // the edge set feeds both join sides and the node count
    val e = edges.select("src", "dst").localCheckpoint()
    val rev = e.select(col("dst").as("src"), col("src").as("dst"),
      lit(1L).as("has_rev"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .agg(countDistinct("node").as("n_nodes"))
    e.join(rev.hint("shuffle_hash"), Seq("src", "dst"), "left")
      .agg(count(lit(1)).as("n_edges"),
        sum(coalesce(col("has_rev"), lit(0L))).as("n_reciprocal"))
      .crossJoin(broadcast(nodes))
      .select(col("n_nodes"), col("n_edges"), col("n_reciprocal"),
        // n_reciprocal·10⁶ wraps int64 past ~9.2e12 edges; widen
        // like every other ppm ratio in the repo
        expr("CAST(CAST(n_reciprocal AS DECIMAL(38,0)) * 1000000 " +
          "div n_edges AS BIGINT)").as("reciprocity_ppm"))
  }

  /** LINK-PREDICTION candidates by COMMON-NEIGHBOR count — the
    * classic baseline every fancier link predictor is benchmarked
    * against, and over a knn graph the "you might also like" /
    * missing-edge repair op: per node, the top-k non-neighbors
    * reachable by the most length-2 paths (src → mid → cand),
    * existing edges and self excluded.
    *
    * Scale shape: on a k-out-regular knn graph the mid-node
    * self-join fans out k² per node — a model constant, never
    * all-pairs; existing edges drop via a LEFT ANTI join on the
    * shuffle-hashed edge set (lineage hides sizes — the explicit
    * hint matches the edgeSupport discipline), and the per-src cut
    * rides the bounded TopKPerKey heaps with (count desc, cand asc)
    * ties so any engine replays the same candidate list.
    */
  def linkCandidates(edges: DataFrame, k: Int = 3): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    // the edge set feeds the two path sides AND the anti join
    val e = edges.select("src", "dst")
      .filter(col("src") =!= col("dst")).localCheckpoint()
    val paths = e.as("a")
      .join(e.select(col("src").as("mid"), col("dst").as("cand"))
        .hint("shuffle_hash"), col("dst") === col("mid"))
      .filter(col("src") =!= col("cand"))
      .groupBy("src", "cand").agg(count(lit(1)).as("n_common"))
    val fresh = paths.join(
      e.select(col("src"), col("dst").as("cand")).hint("shuffle_hash"),
      Seq("src", "cand"), "left_anti")
    val w = Window.partitionBy("src")
      .orderBy(col("n_common").desc, col("cand").asc)
    graft.plans.TopK.perKey(fresh, Seq("src"),
        Seq(col("n_common").desc, col("cand").asc), k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("src", "rank", "cand", "n_common")
  }
}
