package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.{adc_sum, cosine_sim, dot_ff, l2_sq, lsh_sig, nearest_idx, pq_encode, top_idx, vec_sub}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers: brute-force (exact baseline — broadcast the query
  * set, never the corpus), random-hyperplane LSH (bucketed candidate
  * generation), and IVF (coarse quantizer cells with multi-probe).
  * At 100 TB the corpus side always streams; only query vectors,
  * centroids, and bucket keys move.
  */
object Similarity {

  /** Exact top-k by cosine for a bounded query subset. The query
    * side is broadcast (small by construction); the corpus is
    * scanned once; ranking shuffles only (query, cosine) pairs.
    */
  def bruteTopK(embeddings: DataFrame, queryFilter: Column, k: Int): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val queries = corpus.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine_sim(col("q_emb"), col("embedding")), 6).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
  }

  /** POST-FILTERING RECALL AUDIT — the production question behind
    * METADATA-FILTERED vector search ("nearest neighbors WHERE
    * label = x"): an index built without the filter serves it by
    * over-fetching K' unfiltered candidates and filtering after, and
    * the audit measures what that loses — for each candidate budget
    * K', the recall of post-filtered-top-k against the exact
    * FILTERED top-k ground truth, plus how many queries keep full
    * recall. This is the number that sizes K' before anyone trusts
    * post-filtering under a selective predicate (at 50% selectivity
    * K'=k loses ~half the truth; a 1% filter needs K' ≈ 100k — the
    * curve says so instead of a rule of thumb).
    *
    * One brute scored pass over the probe subset (the recall_audit
    * convention: audits run on bounded probes; the SERVING path is
    * the IVF/LSH family), then both rankings ride the same window
    * spec — a truth row is recalled at budget K' iff its UNFILTERED
    * rank fits the budget, so hits are one conditional count, no
    * set-intersection join. Output is |budgets| rows.
    */
  def postfilterRecall(embeddings: DataFrame, queryFilter: Column,
                       matchFilter: Column, k: Int,
                       budgets: Seq[Int]): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ >= k),
      s"budgets ($budgets) must all reach k ($k)")
    val corpus = embeddings.select(col("vec_id"), col("embedding"),
      col("label"))
    val queries = corpus.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("label"),
        round(cosine_sim(col("q_emb"), col("embedding")), 6).as("cos"))
      .withColumn("rk_all", row_number().over(w).cast("long"))
    val truth = scored.filter(matchFilter)
      .withColumn("rk_f", row_number().over(w).cast("long"))
      .filter(col("rk_f") <= k)
    truth
      .select(col("q_id"), col("rk_all"),
        explode(array(budgets.map(b => lit(b.toLong)): _*)).as("budget"))
      .groupBy("q_id", "budget")
      .agg(count(when(col("rk_all") <= col("budget"), 1)).as("hits"),
        count(lit(1)).as("n_truth"))
      .groupBy("budget")
      .agg(count(lit(1)).as("n_queries"),
        sum("hits").as("th"), sum("n_truth").as("tt"),
        count(when(col("hits") === col("n_truth"), 1)).as("n_full"))
      .select(col("budget"), col("n_queries"),
        expr("CAST(CAST(th AS DECIMAL(38,0)) * 1000000 div tt AS BIGINT)")
          .as("recall_ppm"),
        col("n_full"))
  }

  /** k-nearest-neighbor graph over a bounded node subset: every node
    * gets edges to its k most-cosine-similar peers. Selection runs
    * through the native [[graft.plans.TopK]] operator — bounded
    * per-key heaps, no rank column, no full sort — so the graph
    * build is the heap cost, not a window sort. The exact all-pairs
    * form is the oracle for LSH/IVF candidate-edge variants; at
    * 100 TB the same plan runs per LSH bucket instead of per subset.
    */
  def knnGraph(embeddings: DataFrame, nodeFilter: Column, k: Int): DataFrame = {
    val nodes = embeddings.filter(nodeFilter)
      .select(col("vec_id"), col("embedding"))
    val scored = nodes
      .join(broadcast(nodes.select(col("vec_id").as("dst"),
        col("embedding").as("dst_emb"))), col("vec_id") =!= col("dst"))
      .select(col("vec_id").as("src"), col("dst"),
        round(cosine_sim(col("embedding"), col("dst_emb")), 6).as("cos"))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    graft.plans.TopK.perKey(scored, Seq("src"),
        Seq(col("cos").desc, col("dst").asc), k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("src", "rank", "dst", "cos")
  }

  /** Multi-table LSH ANN: `tables` independent random-hyperplane
    * hash tables of `planes` bits each (signatures regenerated
    * deterministically on any executor — no plane matrix to ship).
    * A pair collides if it lands in the same bucket of ANY table —
    * with 1-bit multi-probe on the query side — then exact cosine
    * rerank inside the candidate set. The corpus-side cost is L
    * signature rows per vector; the only shuffle key is (table,
    * bucket), which is how this survives a 100 TB corpus.
    */
  def annLsh(embeddings: DataFrame, queryFilter: Column, k: Int,
             planes: Int = 10, tables: Int = 8): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("embedding"))
    // L signatures per corpus vector: (table, sig)
    val corpus = base.select(col("vec_id"), col("embedding"),
      posexplode(array((0 until tables).map(t =>
        lsh_sig(col("embedding"), planes, t)): _*)))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "sig")
    // query probes: per table, exact signature + every 1-bit flip
    val probed = base.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        posexplode(array((0 until tables).flatMap { t =>
          val s = lsh_sig(col("embedding"), planes, t)
          s +: (0 until planes).map(b => s.bitwiseXOR(lit(1L << b)))
        }: _*)))
      .select(col("q_id"), col("q_emb"),
        (col("pos") / (planes + 1)).cast("int").as("table"),
        col("col").as("probe_sig"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(probed),
        corpus("table") === probed("table") && col("sig") === col("probe_sig") &&
          col("vec_id") =!= col("q_id"))
      .dropDuplicates("q_id", "vec_id")
      .select(col("q_id"), col("vec_id"),
        round(cosine_sim(col("q_emb"), col("embedding")), 6).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
  }

  /** Per-label embedding statistics: count, dimensionality, L2-norm
    * moments. Norms are computed with a sequential left-fold
    * `aggregate` (bit-compatible with the oracle's list_sum), rounded
    * per row before the per-label average. One scan, one
    * low-cardinality shuffle of partial aggregates.
    */
  def embStats(embeddings: DataFrame): DataFrame = {
    val norm = round(sqrt(aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double"))), 6)
    embeddings
      .select(col("label"), size(col("embedding")).cast("long").as("dim"),
        norm.as("norm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        max("dim").as("dim"),
        round(avg("norm"), 4).as("avg_norm"),
        round(min("norm"), 4).as("min_norm"),
        round(max("norm"), 4).as("max_norm"))
  }

  /** Background-similarity THRESHOLD PLAN — the calibration readout
    * every cosine cutoff in the near-dup family silently assumes:
    * the distribution of cosine between UNRELATED vectors. A τ below
    * the background's upper quantiles drowns in false positives; the
    * plan reports, per label stratum, the exact p50/p90/p99 of a
    * deterministic null-pair sample plus the observed max — read
    * "τ must clear p99 to hold false-positive mass under ~1%".
    *
    * The null pairs are DETERMINISTIC, not RNG-sampled (the
    * [[graft.ops.Sampling]] no-seed discipline): vectors bucket by
    * an md5-nibble hash of vec_id — scrambling any id locality — and
    * rank-adjacent vectors within a (label, bucket) pair up
    * (odd 2i−1 with even 2i), so both engines draw the identical
    * ~n/2 pairs with zero sampling state. Per-task window work is
    * one (label, bucket) group — `nibbles` sizes buckets at 16^k so
    * the per-bucket rank never serializes a stratum. Quantiles are
    * exact order statistics from the shared [[graft.ops.RankSelect]]
    * engine at integer basis-point ranks over the 6dp-rounded
    * cosines (no per-label sort; both engines threshold the same
    * rounded number).
    */
  def thresholdPlan(embeddings: DataFrame, bins: Int = 256,
                    nibbles: Int = 2): DataFrame = {
    require(nibbles >= 1 && nibbles <= 8,
      s"nibbles ($nibbles) must be in [1, 8]")
    val v = embeddings.select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("bucket",
        expr(s"conv(substring(md5(cast(vec_id as string)), 1, $nibbles), " +
          "16, 10)").cast("long"))
    val ranked = v.withColumn("rk",
      row_number().over(Window.partitionBy("label", "bucket")
        .orderBy("vec_id")).cast("long"))
      .localCheckpoint() // both pair sides read the ranked frame
    val pairs = ranked.filter(col("rk") % 2 === 1)
      .select(col("label"), col("bucket"), (col("rk") + 1).as("rk"),
        col("embedding").as("ea"))
      .join(ranked.filter(col("rk") % 2 === 0)
        .select(col("label"), col("bucket"), col("rk"),
          col("embedding").as("eb")),
        Seq("label", "bucket", "rk"))
      .select(col("label").as("g"),
        round(cosine_sim(col("ea"), col("eb")), 6).as("v"))
    val (sel, bounds) = graft.ops.RankSelect.at(pairs, bins,
      graft.ops.RankSelect.floatBin(bins), bounds =>
        bounds
          .select(col("g"), col("n"),
            explode(array(lit(5000L), lit(9000L), lit(9900L))).as("q_bp"))
          .select(col("g"), col("q_bp"),
            expr("(n - 1) * q_bp div 10000").as("r")))
    sel.groupBy("g").agg(
      max(when(col("q_bp") === 5000L, col("v"))).as("p50_cos"),
      max(when(col("q_bp") === 9000L, col("v"))).as("p90_cos"),
      max(when(col("q_bp") === 9900L, col("v"))).as("p99_cos"))
      .join(broadcast(bounds.select(col("g"), col("hi").as("max_cos"),
        col("n").as("n_pairs"))), Seq("g"))
      .select(col("g").as("label"), col("n_pairs"), col("p50_cos"),
        col("p90_cos"), col("p99_cos"), col("max_cos"))
  }

  private def subvectors(v: Column, m: Int, sub: Int): Column =
    array((0 until m).map(s => slice(v, s * sub + 1, sub)): _*)

  /** Int8 scalar-quantization audit: per vector, the symmetric scale
    * (max|x|/127), the L2 reconstruction error, and the worst
    * per-dimension error of round-trip quantization — the "can we
    * ship int8 embeddings" report, as a pure scan (no shuffle, no
    * state). Quantization is spelled floor(x/scale + 0.5) so both
    * engines round identically; squares are plain products (pow is
    * not correctly rounded everywhere).
    */
  def quantizeAudit(embeddings: DataFrame): DataFrame = {
    def recon(v: Column, scale: Column): Column =
      floor(v / scale + 0.5d) * scale
    embeddings
      .withColumn("x", col("embedding").cast("array<double>"))
      .withColumn("qscale", array_max(transform(col("x"), v => abs(v))) / 127d)
      .select(col("vec_id"),
        round(col("qscale"), 6).as("scale"),
        round(sqrt(aggregate(col("x"), lit(0.0d), (acc, v) =>
          acc + (v - recon(v, col("qscale"))) * (v - recon(v, col("qscale"))))), 6)
          .as("l2_err"),
        round(array_max(transform(col("x"), v =>
          abs(v - recon(v, col("qscale"))))), 6).as("max_err"))
  }

  /** Pack a (cell_id, c_emb) centroid set into ONE broadcastable row
    * of aligned arrays, sorted by cell_id. Every consumer then takes
    * a 1-row broadcast cross join and runs the fused [[nearest_idx]]/
    * [[top_idx]] kernel per vector — no per-centroid explode, no
    * corpus×cells window shuffle. The model is bounded by
    * construction, so this holds at any corpus size.
    */
  private def packCentroids(centroids: DataFrame): DataFrame =
    centroids
      .agg(sort_array(collect_list(struct(col("cell_id"), col("c_emb")))).as("cc"))
      .select(transform(col("cc"), x => x("cell_id")).as("cell_ids"),
        transform(col("cc"), x => x("c_emb")).as("cents"))

  /** Coarse assignment on the packed model: one corpus scan, one
    * fused argmax per vector, zero shuffles. Ties break to the
    * smaller cell_id (the packed order is cell_id-sorted).
    */
  private def assignPacked(vecs: DataFrame, packed: DataFrame,
                           withResidual: Boolean): DataFrame = {
    val idx = nearest_idx(col("embedding"), col("cents")) + 1
    val base = vecs.crossJoin(broadcast(packed))
      .withColumn("__i", idx)
    if (withResidual)
      base.select(col("vec_id"),
        element_at(col("cell_ids"), col("__i")).as("cell_id"),
        vec_sub(col("embedding"), element_at(col("cents"), col("__i"))).as("residual"))
    else
      base.select(col("vec_id"), col("embedding"),
        element_at(col("cell_ids"), col("__i")).as("cell_id"))
  }

  /** Product-quantization ANN — the compressed-corpus scale path:
    * each vector is encoded as `m` small codes against per-subspace
    * codebooks (built from a deterministic stride sample), queries
    * score the whole corpus through a per-query lookup table
    * (asymmetric distance), and only the top candidates are reranked
    * exactly. At 100 TB the wins compound: the codebook and LUTs are
    * bounded-by-construction broadcasts, encoding is one scan whose
    * argmin is a map-side `min_by` partial aggregation (never a
    * window over the exploded corpus), ADC scoring moves only
    * (q_id, vec_id, partial-sum) rows, and candidate selection is
    * the native [[graft.plans.TopKPerKey]] operator with its partial
    * heaps — full vectors are touched again only for the final
    * bounded rerank.
    */
  def annPq(embeddings: DataFrame, queryFilter: Column, k: Int,
            m: Int = 8, dim: Int = 64, codebookStride: Long = 50L,
            nCodes: Int = 16, nCandidates: Int = 50): DataFrame =
    servePq(embeddings, queryFilter, k,
      fitPq(embeddings, m, dim, codebookStride, nCodes), m, dim,
      nCandidates)

  /** FIT the PQ codebook — the model half of [[annPq]], exposed so a
    * deployment fits once, [[saveIndex]]es the (s, code, c_sub)
    * frame, and serves every query run through [[servePq]] on the
    * loaded artifact instead of refitting from the corpus.
    * Per-subspace codebooks come from a deterministic stride sample,
    * capped at `nCodes` entries: codebook size is a model parameter —
    * it must NOT grow with the corpus, or encode cost scales
    * superlinearly. Code ids are the sample's rank within the
    * subspace.
    */
  def fitPq(embeddings: DataFrame, m: Int = 8, dim: Int = 64,
            codebookStride: Long = 50L, nCodes: Int = 16): DataFrame = {
    val sub = dim / m
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val wCode = Window.partitionBy("s").orderBy("cb_vec")
    corpus.filter(col("vec_id") % codebookStride === 0)
      .select(col("vec_id").as("cb_vec"),
        posexplode(subvectors(col("embedding"), m, sub)))
      .select(col("cb_vec"), col("pos").as("s"), col("col").as("c_sub"))
      .withColumn("code", row_number().over(wCode))
      .filter(col("code") <= nCodes)
      .select("s", "code", "c_sub")
  }

  /** SERVE PQ top-k from a fitted (s, code, c_sub) codebook — the
    * apply-only half of [[annPq]] (loaded-model-first: the codebook
    * is bounded by construction, so it re-enters the plan as a
    * broadcast regardless of where it came from).
    */
  def servePq(embeddings: DataFrame, queryFilter: Column, k: Int,
              codebook: DataFrame, m: Int = 8, dim: Int = 64,
              nCandidates: Int = 50): DataFrame = {
    val sub = dim / m
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    // encode: ONE fused pass per vector against the packed broadcast
    // codebook — no per-(vector, subspace) explode, no ×codes join
    // fan-out, no argmin re-aggregation shuffle
    val cbPacked = codebook
      .agg(sort_array(collect_list(struct(col("s"), col("code"), col("c_sub")))).as("cb"))
    val encoded = corpus.crossJoin(broadcast(cbPacked))
      .select(col("vec_id"), pq_encode(col("embedding"), col("cb")).as("codes"))
    val queries = corpus.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // per-query LUT: distance from the query subvector to EVERY code,
    // packed to one flat row per query (bounded: queries × m × codes)
    val lut = queries
      .select(col("q_id"), posexplode(subvectors(col("q_emb"), m, sub)))
      .select(col("q_id"), col("pos").as("s"), col("col").as("q_sub"))
      .join(broadcast(codebook), "s")
      .select(col("q_id"), col("s"), col("code"),
        graft.functions.expressions.l2_sq(col("q_sub"), col("c_sub")).as("d"))
    val lutPacked = lut.groupBy("q_id")
      .agg(sort_array(collect_list(struct(col("s"), col("code"), col("d")))).as("lut"))
    // ADC scan: Σ_s LUT[s, code(v,s)] fused per (vector, query) pair —
    // the corpus never shuffles; NaN marks a missing subspace (the
    // all-m guard)
    val scored = encoded
      .crossJoin(broadcast(lutPacked))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        adc_sum(col("codes"), col("lut")).as("adist"))
      .filter(!isnan(col("adist")))
    val candidates = graft.plans.TopK.perKey(
      scored.select("q_id", "vec_id", "adist"),
      Seq("q_id"), Seq(col("adist").asc, col("vec_id").asc), nCandidates)
    // exact rerank of the bounded candidate set
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    candidates
      .join(corpus, "vec_id")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("vec_id"),
        round(cosine_sim(col("q_emb"), col("embedding")), 6).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
  }

  /** IVF-PQ composition — the full billion-scale ANN shape: coarse
    * quantizer cells bound the search space (queries touch `nProbe`
    * cells, not the corpus), and within each cell vectors are PQ
    * codes of their RESIDUAL (vector − centroid), which quantizes a
    * far tighter distribution than raw PQ. Per-cell codebooks are
    * bounded by construction (cells × m × nCodes rows — a broadcast,
    * never a shuffle); encoding is one corpus scan with a map-side
    * `min_by` argmin; ADC scoring moves only (q, vec, partial-sum)
    * rows inside probed cells; candidate selection runs the native
    * TopKPerKey heaps; only `nCandidates` rows per query are ever
    * reranked against real vectors.
    */
  def annIvfPq(embeddings: DataFrame, queryFilter: Column, k: Int,
               centroidStride: Long = 50L, nProbe: Int = 2,
               m: Int = 8, dim: Int = 64, codeStride: Long = 5L,
               nCodes: Int = 16, nCandidates: Int = 50,
               codebookIters: Int = 0,
               trainOnFull: Boolean = false): DataFrame = {
    val (centroids, codebook) = fitIvfPq(embeddings, centroidStride, m,
      dim, codeStride, nCodes, codebookIters, trainOnFull)
    serveIvfPq(embeddings, queryFilter, k, centroids, codebook, nProbe,
      m, dim, nCandidates)
  }

  /** FIT the IVF-PQ model — coarse centroids plus per-cell residual
    * codebooks, the two bounded artifacts a deployment persists via
    * [[saveIndex]] and serves through [[serveIvfPq]] without ever
    * refitting (centroid selection, residual sampling, and Lloyd
    * refinement are all deterministic, so a reload is byte-equal to
    * the fitting run).
    */
  def fitIvfPq(embeddings: DataFrame, centroidStride: Long = 50L,
               m: Int = 8, dim: Int = 64, codeStride: Long = 5L,
               nCodes: Int = 16, codebookIters: Int = 0,
               trainOnFull: Boolean = false): (DataFrame, DataFrame) = {
    val sub = dim / m
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val centroids = corpus.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"))
    val packed = packCentroids(centroids)
    // per-cell residual codebooks from a deterministic stride sample:
    // assignment is per-vector, so assigning ONLY the sample here is
    // result-identical and keeps the codebook branch off the full
    // corpus-assignment subplan (which Catalyst would otherwise
    // evaluate once per consumer — forked subplans don't share)
    val samples =
      assignPacked(corpus.filter(col("vec_id") % codeStride === 0), packed,
          withResidual = true)
        .select(col("vec_id").as("cb_vec"), col("cell_id"),
          posexplode(subvectors(col("residual"), m, sub)))
        .select(col("cb_vec"), col("cell_id"), col("pos").as("s"), col("col").as("r_sub"))
    val wCode = Window.partitionBy("cell_id", "s").orderBy("cb_vec")
    val seedCodebook = samples
      .withColumn("code", row_number().over(wCode))
      .filter(col("code") <= nCodes)
      .select(col("cell_id"), col("s"), col("code"), col("r_sub").as("c_sub"))
    // Lloyd training set: the stride sample by default (FAISS-style
    // subsample training — keeps the codebook branch off the full
    // corpus-assignment subplan), or EVERY residual in the cell when
    // `trainOnFull`: codeword updates become the assignment-count-
    // weighted means of the true per-cell residual distribution,
    // removing sample-stride bias at the cost of one extra corpus
    // scan per Lloyd pass (seed selection is unchanged, so model
    // size — cells × m × nCodes — is identical either way).
    val codebook =
      if (codebookIters > 0) {
        val train =
          if (trainOnFull)
            // full-corpus residual assignment — one extra scan per
            // Lloyd pass, lazily built only on this branch
            assignPacked(corpus, packed, withResidual = true)
              .select(col("cell_id"), posexplode(subvectors(col("residual"), m, sub)))
              .select(col("cell_id"), col("pos").as("s"), col("col").as("r_sub"))
          else samples.select("cell_id", "s", "r_sub")
        refineCodebook(train, seedCodebook, codebookIters, sub)
      } else seedCodebook
    (centroids, codebook)
  }

  /** SERVE IVF-PQ top-k from fitted (centroids, per-cell codebook)
    * artifacts — the apply-only half of [[annIvfPq]]: coarse
    * assignment + residual on the packed broadcast model (one corpus
    * scan, zero shuffles), fused per-cell PQ encode, nProbe query
    * probing, broadcast LUTs, ADC scoring through the bounded
    * TopKPerKey heaps, exact rerank of the survivors.
    */
  def serveIvfPq(embeddings: DataFrame, queryFilter: Column, k: Int,
                 centroids: DataFrame, codebook: DataFrame,
                 nProbe: Int = 2, m: Int = 8, dim: Int = 64,
                 nCandidates: Int = 50): DataFrame = {
    val sub = dim / m
    val l2 = graft.functions.expressions.l2_sq _
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    // coarse assignment + residual: fused argmax on the packed model —
    // one corpus scan, ZERO shuffle (the window formulation shuffled
    // corpus×cells exploded rows)
    val packed = packCentroids(centroids)
    val assigned = assignPacked(corpus, packed, withResidual = true)
    // encode: one fused argmin pass per vector against its cell's
    // packed codebook (broadcast hash join on cell_id, fan-out 1)
    val cbPacked = codebook.groupBy("cell_id")
      .agg(sort_array(collect_list(struct(col("s"), col("code"), col("c_sub")))).as("cb"))
    val encoded = assigned.join(broadcast(cbPacked), "cell_id")
      .select(col("vec_id"), col("cell_id"),
        pq_encode(col("residual"), col("cb")).as("codes"))
    // queries probe nProbe cells (fused top-k on the packed model);
    // LUT per probed cell over the query's residual IN THAT CELL
    val queries = corpus.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val probed = queries.crossJoin(broadcast(packed))
      .select(col("q_id"), col("q_emb"), col("cell_ids"), col("cents"),
        explode(top_idx(col("q_emb"), col("cents"), nProbe)).as("__e"))
      .withColumn("__i", col("__e") + 1)
      .select(col("q_id"),
        element_at(col("cell_ids"), col("__i")).as("cell_id"),
        vec_sub(col("q_emb"), element_at(col("cents"), col("__i"))).as("q_res"))
    val lut = probed
      .select(col("q_id"), col("cell_id"),
        posexplode(subvectors(col("q_res"), m, sub)))
      .select(col("q_id"), col("cell_id"), col("pos").as("s"), col("col").as("q_sub"))
      .join(broadcast(codebook), Seq("cell_id", "s"))
      .select(col("q_id"), col("cell_id"), col("s"), col("code"),
        l2(col("q_sub"), col("c_sub")).as("d"))
    val lutPacked = lut.groupBy("q_id", "cell_id")
      .agg(sort_array(collect_list(struct(col("s"), col("code"), col("d")))).as("lut"))
    // ADC inside probed cells, fused per (vector, probing query): the
    // corpus-side rows never shuffle; NaN marks a missing subspace
    val scored = encoded
      .join(broadcast(lutPacked), "cell_id")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        adc_sum(col("codes"), col("lut")).as("adist"))
      .filter(!isnan(col("adist")))
    val cands = graft.plans.TopK.perKey(scored, Seq("q_id"),
      Seq(col("adist").asc, col("vec_id").asc), nCandidates)
    // exact rerank of the surviving candidates only
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    cands.join(corpus, "vec_id").join(broadcast(queries), "q_id")
      .select(col("q_id"), col("vec_id"),
        round(cosine_sim(col("q_emb"), col("embedding")), 6).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
  }

  /** Top principal component of the embedding corpus by MATRIX-FREE
    * power iteration: v ← Σ_i x̄_i (x̄_i · v) / n, renormalized. The
    * d×d covariance matrix is never materialized — each iteration is
    * ONE corpus scan computing a fused dot product (codegen'd
    * `dot_ff`) and d map-side-combinable means; only the d-vector
    * lives on the driver, and the iteration count is a model
    * constant. Centering reuses the same one-scan shape (per-dim
    * means → a broadcast literal subtracted by `vec_sub`). The
    * returned loadings are unit-norm with a deterministic sign (the
    * largest-|loading| dimension is positive); `eigenvalue` is the
    * Rayleigh quotient v·Cv — the variance explained. This is the
    * whitening/dimensionality-reduction front end of an embedding
    * pipeline, distributed the way 100 TB requires: data never moves,
    * the model does.
    */
  def pcaTopComponent(embeddings: DataFrame, iters: Int = 4,
                      dim: Int = 64,
                      persistCentered: Boolean = false): DataFrame = {
    val (_, signed, rayleigh) = pcaFit(embeddings, iters, dim, persistCentered)
    val spark = embeddings.sparkSession
    import spark.implicits._
    signed.toSeq.zipWithIndex
      .map { case (x, j) => (j.toLong, math.rint(x * 1e6) / 1e6,
        math.rint(rayleigh * 1e6) / 1e6) }
      .toDF("dim_idx", "loading", "eigenvalue")
  }

  /** The fitted PCA reducer as a first-class, reusable model value
    * (two d-vectors + a scalar — trivially serializable, shippable
    * to any session), mirroring the packed-model convention of the
    * ANN operators: fit ONCE, [[pcaApply]] many times. At 100 TB
    * the fit is a handful of model-sized jobs; every application
    * after that is a single shuffle-free codegen'd scan.
    */
  case class PcaModel(mean: Array[Double], loadings: Array[Double],
                      eigenvalue: Double)

  /** Fit the top-component reducer: the fit half of [[pcaProject]]. */
  def pcaFitModel(embeddings: DataFrame, iters: Int = 4,
                  dim: Int = 64): PcaModel = {
    val (mean, v, rayleigh) = pcaFit(embeddings, iters, dim,
      persistCentered = false)
    PcaModel(mean, v, rayleigh)
  }

  /** Persist a fitted [[PcaModel]] as a versioned artifact — the
    * cross-job half of fit-once/apply-many: tomorrow's scoring job
    * loads yesterday's reducer instead of re-fitting (and a drift
    * audit compares projections across model versions). One
    * model-sized row under `dir/v=<version>`, published with the
    * [[graft.ops.VersionedStore]] commit discipline shared by every
    * versioned artifact in the repo.
    */
  def savePca(spark: org.apache.spark.sql.SparkSession, model: PcaModel,
              dir: String, version: Long): Unit =
    graft.ops.VersionedStore.commit(spark, dir, s"v=$version") { staging =>
      import spark.implicits._
      Seq((model.mean.toSeq, model.loadings.toSeq, model.eigenvalue))
        .toDF("mean", "loadings", "eigenvalue").coalesce(1)
        .write.parquet(staging.toString)
    }: Unit

  /** Load a persisted [[PcaModel]] (latest version unless pinned). */
  def loadPca(spark: org.apache.spark.sql.SparkSession, dir: String,
              version: Option[Long] = None): PcaModel = {
    val v = version
      .orElse(graft.ops.VersionedStore.listVersions(spark, dir, "v=")
        .maxOption)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no pca model under $dir"))
    val row = spark.read.parquet(s"$dir/v=$v").head()
    PcaModel(row.getSeq[Double](row.fieldIndex("mean")).toArray,
      row.getSeq[Double](row.fieldIndex("loadings")).toArray,
      row.getDouble(row.fieldIndex("eigenvalue")))
  }

  /** Persist fitted ANN index parts (IVF centroids, PQ / IVF-PQ
    * codebooks, the MIPS augmentation bound — any bounded model
    * frame) as ONE versioned artifact: each named part is a parquet
    * subdir of `dir/v=<version>`, the whole version published by the
    * [[graft.ops.VersionedStore]] atomic-rename commit shared with
    * PcaModel / KeeperModel / bloom artifacts. Fits are
    * deterministic, so a lost publish race or a replay's
    * recomputation is byte-equivalent — exactly the immutable-version
    * contract the store implements. Returns true when this call
    * published.
    */
  def saveIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                version: Long, parts: Seq[(String, DataFrame)]): Boolean = {
    require(parts.nonEmpty, "saveIndex: no parts to publish")
    graft.ops.VersionedStore.commit(spark, dir, s"v=$version") { staging =>
      parts.foreach { case (name, df) =>
        // model-sized by construction (centroids / codebooks / one-row
        // bounds) — one file per part keeps the artifact readable
        df.coalesce(1).write.parquet(
          new org.apache.hadoop.fs.Path(staging, name).toString)
      }
    }
  }

  /** Load one named part of a persisted ANN index (latest version
    * unless pinned) — the read half of [[saveIndex]]. The returned
    * frame is a plain bounded parquet scan, so every serving
    * consumer ([[serveIvf]], [[servePq]], [[serveIvfPq]],
    * [[assignKmeans]]) packs or broadcasts it exactly as it would
    * the just-fitted frame.
    */
  def loadIndexPart(spark: org.apache.spark.sql.SparkSession, dir: String,
                    part: String, version: Option[Long] = None): DataFrame = {
    val v = version
      .orElse(graft.ops.VersionedStore.listVersions(spark, dir, "v=")
        .maxOption)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no ann index under $dir"))
    spark.read.parquet(s"$dir/v=$v/$part")
  }

  /** APPLY a fitted k-means / IVF centroid model: assign every
    * vector to its nearest-cosine centroid on the packed broadcast
    * model — one shuffle-free corpus scan, the serving shape of
    * clustering-based curation (cluster labels feeding
    * curate-by-cluster, balanced sampling, or per-cell routing).
    * Emits the assignment's cosine (6dp — the engine-portable
    * rounding ladder) so downstream audits price assignment quality
    * without a second scan. Ties break to the smaller cell_id.
    */
  def assignKmeans(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val packed = packCentroids(centroids)
    val idx = nearest_idx(col("embedding"), col("cents")) + 1
    embeddings.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(packed))
      .withColumn("__i", idx)
      .select(col("vec_id"),
        element_at(col("cell_ids"), col("__i")).as("cell_id"),
        round(cosine_sim(col("embedding"),
          element_at(col("cents"), col("__i"))), 6).as("cos"))
  }

  /** Per-cell ASSIGNMENT AUDIT over a fitted (usually loaded)
    * k-means model: member count plus cohesion stats (mean / min
    * member-to-centroid cosine, per-row 6dp then 4dp mean — the
    * emb_stats rounding discipline). The report a served clustering
    * publishes next to cell_balance/purity: a cell whose min cosine
    * craters is a junk attractor; one whose mean sags needs a split
    * or a re-fit. One [[assignKmeans]] scan, one |cells|-row
    * aggregate — nothing corpus-sized shuffles.
    */
  def clusterAssignAudit(embeddings: DataFrame,
                         centroids: DataFrame): DataFrame =
    assignKmeans(embeddings, centroids)
      .groupBy("cell_id")
      .agg(count(lit(1)).as("n_vecs"),
        round(avg("cos"), 4).as("avg_cos"),
        min("cos").as("min_cos"))

  /** INDEX DELTA-INGEST audit — the maintenance question behind a
    * SERVED IVF / k-means index: when a new batch arrives, does the
    * published coarse model still fit it, or has the distribution
    * moved enough to warrant a re-fit? (An index is fit once and
    * served — [[saveIndex]]/[[loadIndexPart]] — so freshness is a
    * measured decision, not a per-batch refit.) Both corpora assign
    * on the SAME loaded model ([[assignKmeans]] — one shuffle-free
    * scan each); per cell: base/delta counts, exact-integer ppm
    * shares (DECIMAL-widened — the cellPurity discipline), and a
    * drift flag when the delta's cell share deviates from the base's
    * by more than `driftPpm` — a flagged cell means the new batch
    * concentrates where the old corpus didn't (cell split / re-Lloyd
    * territory), and a never-flagged sweep certifies the model for
    * another ingest cycle. Cells empty on one side survive the full
    * join with zero counts (their absence IS the signal). Shares are
    * null (never a flag) when a side is empty — the engines' div
    * behaviors must not decide a verdict.
    */
  def deltaIngestAudit(base: DataFrame, delta: DataFrame,
                       centroids: DataFrame,
                       driftPpm: Long = 200000L): DataFrame = {
    require(driftPpm > 0, s"driftPpm ($driftPpm) must be positive")
    def cells(df: DataFrame, as: String) =
      assignKmeans(df, centroids).groupBy("cell_id")
        .agg(count(lit(1)).as(as))
    val merged = cells(base, "nb")
      .join(cells(delta, "nd").hint("shuffle_hash"), Seq("cell_id"), "full")
      .na.fill(0L, Seq("nb", "nd"))
    val tot = merged.agg(sum("nb").as("tb"), sum("nd").as("td"))
    merged.crossJoin(broadcast(tot))
      .select(col("cell_id"), col("nb").as("n_base"), col("nd").as("n_delta"),
        expr("CASE WHEN tb > 0 THEN CAST(CAST(nb AS DECIMAL(38,0)) " +
          "* 1000000 div tb AS BIGINT) END").as("base_share_ppm"),
        expr("CASE WHEN td > 0 THEN CAST(CAST(nd AS DECIMAL(38,0)) " +
          "* 1000000 div td AS BIGINT) END").as("delta_share_ppm"),
        expr(s"CASE WHEN tb > 0 AND td > 0 THEN " +
          s"abs(CAST(CAST(nb AS DECIMAL(38,0)) * 1000000 div tb AS BIGINT) " +
          s"- CAST(CAST(nd AS DECIMAL(38,0)) * 1000000 div td AS BIGINT)) " +
          s"> $driftPpm END").as("drifted"))
  }

  /** Apply a fitted [[PcaModel]]: the model re-enters the plan as
    * literals, so application is one codegen'd scan with no shuffle
    * at all — the 100 TB shape of "apply the reducer you fit once".
    */
  def pcaApply(embeddings: DataFrame, model: PcaModel): DataFrame = {
    def fLit(xs: Array[Double]) = array(xs.map(x => lit(x.toFloat)): _*)
    embeddings.select(col("vec_id"),
      round(dot_ff(vec_sub(col("embedding"), fLit(model.mean)),
        fLit(model.loadings)), 6).as("proj"))
  }

  /** EMBEDDING ISOTROPY AUDIT — the representation-health number
    * behind "are these embeddings collapsing?": the share of total
    * variance held by the top principal component (a healthy
    * encoder spreads variance; a collapsing or over-templated one
    * concentrates it in one dominant direction), plus the squared
    * mean-vector norm (a large common offset is the classic
    * anisotropy smell — cosine similarity degrades to "how aligned
    * with the mean are you"). Rides the fitted [[PcaModel]]
    * (fit-once/apply-many — the emb_project cache), so the audit
    * itself is ONE shuffle-free scan: per-row centered squared
    * norms through the same float-level `vec_sub`/`dot_ff` kernels
    * the projection uses (6dp-rounded per row, the emb_stats
    * discipline), one global aggregate. The share divides the
    * ROUNDED eigenvalue by the ROUNDED total variance so both
    * engines divide identical operands.
    */
  /** Per-label CENTROID-MARGIN audit (centroid-approximated
    * silhouette) — the label-geometry eval next to
    * [[clusterAssignAudit]]'s per-cell cohesion and knnLabelVote's
    * neighborhood accuracy: for every vector, cosine to its OWN
    * label's centroid vs the best OTHER label's centroid; per label,
    * the two means and the CROSSER count (vectors sitting closer to
    * a foreign centroid — the mislabel/overlap mass that poisons
    * label-stratified sampling, curation-by-label and
    * dedup-within-label cells). A full silhouette is all-pairs;
    * centroids make it ONE corpus scan fanned out by the bounded
    * label count: driver-held per-label mean vectors (labels × dim,
    * the pcaFit dimAvgs discipline — float-cast so both engines see
    * the identical model), a broadcast cross join scores every (row,
    * centroid) through the codegen'd cosine kernel at 6dp, and two
    * map-side-combined aggregations land the |labels|-row report
    * (4dp means — the clusterAssignAudit rounding ladder). Requires
    * ≥ 2 labels (the "best other" of a single-label corpus does not
    * exist; output is empty, on both engines, by the same inner
    * join).
    */
  def silhouetteAudit(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val aggCols = (0 until dim).map(j => avg(col("embedding")(j)).as(s"c$j"))
    val centRows = embeddings.groupBy("label")
      .agg(aggCols.head, aggCols.tail: _*).collect()
    val centDf = centRows.toSeq
      .map(r => (r.getAs[Int]("label"),
        (0 until dim).map(j => r.getDouble(j + 1).toFloat)))
      .toDF("c_label", "c_emb")
    val scored = embeddings
      .crossJoin(broadcast(centDf))
      .select(col("vec_id"), col("label"), col("c_label"),
        round(cosine_sim(col("embedding"), col("c_emb")), 6).as("cos"))
    val self = scored.filter(col("label") === col("c_label"))
      .select(col("vec_id"), col("label"), col("cos").as("self_cos"))
    val other = scored.filter(col("label") =!= col("c_label"))
      .groupBy("vec_id").agg(max("cos").as("other_cos"))
    self.join(other.hint("shuffle_hash"), Seq("vec_id"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(avg("self_cos"), 4).as("avg_self_cos"),
        round(avg("other_cos"), 4).as("avg_other_cos"),
        sum(when(col("other_cos") >= col("self_cos"), 1L).otherwise(0L))
          .as("n_crossers"))
  }

  def isotropyAudit(embeddings: DataFrame, model: PcaModel): DataFrame = {
    def fLit(xs: Array[Double]) = array(xs.map(x => lit(x.toFloat)): _*)
    val c = vec_sub(col("embedding"), fLit(model.mean))
    // the FLOAT-cast mean is what both the apply kernel and the
    // oracle's REAL-cast replay see — square those, not the raw
    // doubles; sequential fold over 0..d-1 on both engines
    val muSq = model.mean.map { m =>
      val f = m.toFloat.toDouble; f * f
    }.sum
    embeddings
      .select(round(dot_ff(c, c), 6).as("d2"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg("d2"), 4).as("total_var"))
      .select(col("n_vecs"), lit(model.mean.length.toLong).as("dim"),
        round(lit(model.eigenvalue), 6).as("top_eigenvalue"),
        col("total_var"),
        // null share on a degenerate corpus (every vector equals the
        // mean ⇒ total_var = 0): the engines' float div-by-zero
        // behaviors diverge (Infinity vs setting-dependent), so the
        // ratio takes the guarded arm like every ratio output here
        when(col("total_var") > 0d,
          round(round(lit(model.eigenvalue), 6) / col("total_var"), 4))
          .as("top_share"),
        round(lit(muSq), 6).as("mean_sq_norm"))
  }

  /** PER-LABEL anisotropy share — the ALL-BUT-THE-TOP audit (Mu &
    * Viswanath 2018, "All-but-the-Top: Simple and Effective
    * Postprocessing for Word Representations"): how much of each
    * stratum's centered variance lies along the corpus's dominant
    * direction, the number that decides WHERE removing the top
    * component(s) is worth applying. [[isotropyAudit]] answers the
    * corpus-level "are we collapsing"; this is its per-label
    * decomposition — a stratum whose share dwarfs the corpus's is
    * riding the common direction (templated/over-encoded content)
    * and is exactly where the ABTT correction buys cosine back.
    *
    * Rides the fitted [[PcaModel]] (fit-once/apply-many), so the
    * audit is ONE shuffle-free scan: per row, the centered squared
    * norm and the top-component projection through the same
    * float-level `vec_sub`/`dot_ff` kernels as the serving
    * projection, both quantized to exact integer micro-units
    * (round-6 double → round → BIGINT, the engine-portable ladder);
    * sums widen at the term (pu² ≈ 10¹⁴ per row — the diversity
    * discipline, HUGEINT oracle-side) and ONE integer division lands
    * at the end: share_ppm = Σpu² div Σdu (the µ-unit scales cancel
    * to ppm exactly). Null share for a stratum with zero centered
    * mass.
    */
  def abttAudit(embeddings: DataFrame, model: PcaModel): DataFrame = {
    def fLit(xs: Array[Double]) = array(xs.map(x => lit(x.toFloat)): _*)
    val c = vec_sub(col("embedding"), fLit(model.mean))
    embeddings
      .select(col("label"),
        round(dot_ff(c, c), 6).as("d26"),
        round(dot_ff(c, fLit(model.loadings)), 6).as("p6"))
      .select(col("label"),
        expr("CAST(round(d26 * 1000000) AS BIGINT)").as("du"),
        expr("CAST(round(p6 * 1000000) AS BIGINT)").as("pu"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("CAST(du AS DECIMAL(38,0))")).as("sdu"),
        // widen BEFORE the multiply: pu * pu in LongType wraps
        // silently past |pu| ~ 3.04e9 (|p6| > ~3037) while the
        // DuckDB oracle multiplies in HUGEINT — the term itself
        // must be the widened product (ADVICE r15)
        sum(expr("CAST(pu AS DECIMAL(38,0)) * pu")).as("spu2"))
      .select(col("label"), col("n_vecs"),
        expr("CASE WHEN sdu > 0 THEN CAST(spu2 div sdu AS BIGINT) END")
          .as("top_share_ppm"))
  }

  /** Projection of every embedding onto the fitted top component —
    * [[pcaFitModel]] + [[pcaApply]] in one call for the
    * fit-and-project-now case (score = x̄ · v).
    */
  def pcaProject(embeddings: DataFrame, iters: Int = 4,
                 dim: Int = 64): DataFrame =
    pcaApply(embeddings, pcaFitModel(embeddings, iters, dim))

  /** Power-iteration fit shared by [[pcaTopComponent]] and
    * [[pcaProject]]: (per-dim mean, sign-fixed unit loadings,
    * Rayleigh eigenvalue) — all driver-held d-vectors.
    */
  private def pcaFit(embeddings: DataFrame, iters: Int, dim: Int,
                     persistCentered: Boolean): (Array[Double], Array[Double], Double) = {
    def dimAvgs(df: DataFrame, of: Int => Column): Array[Double] = {
      val cols = (0 until dim).map(j => avg(of(j)).as(s"c$j"))
      val row = df.agg(cols.head, cols.tail: _*).head()
      Array.tabulate(dim)(row.getDouble)
    }
    def fLit(xs: Array[Double]) = array(xs.map(x => lit(x.toFloat)): _*)
    val mean = dimAvgs(embeddings, j => col("embedding").getItem(j))
    // `persistCentered` trades storage for scans: each iteration
    // otherwise re-reads the source and recomputes `vec_sub`. At
    // 100 TB the cache costs cluster-wide storage of roughly the
    // input size (MEMORY_AND_DISK — spills, never recomputes), so
    // the default stays off: the scan-per-iteration plan needs no
    // storage budget and the iteration count is a small constant.
    // Values are identical either way — the knob only moves where
    // the centered rows come from.
    val centered0 = embeddings
      .select(vec_sub(col("embedding"), fLit(mean)).as("x"))
    val centered =
      if (persistCentered)
        centered0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else centered0
    var v = Array.tabulate(dim)(j => if (j == 0) 1.0 else 0.0)
    var rayleigh = 0.0
    for (_ <- 0 until iters) {
      val scored = centered.select(col("x"), dot_ff(col("x"), fLit(v)).as("d"))
      val av = dimAvgs(scored, j => col("x").getItem(j) * col("d"))
      rayleigh = (0 until dim).map(j => av(j) * v(j)).sum // v unit ⇒ v·Cv
      val norm = math.sqrt(av.map(x => x * x).sum)
      v = av.map(_ / norm)
    }
    if (persistCentered) centered.unpersist(blocking = false)
    val piv = v.indices.maxBy(j => (math.abs(v(j)), -j))
    val signed = if (v(piv) < 0) v.map(-_) else v
    (mean, signed, rayleigh)
  }

  /** Embedding-space outlier detection: the k vectors farthest from
    * the corpus centroid — the "far from everything" junk filter
    * embedding-based curation runs before clustering (mis-embedded
    * docs, wrong-modality content, and encoder failures all land in
    * this tail). The centroid is the usual driver-held d-vector
    * (same packed-model convention as PCA's mean: float-cast so the
    * literal is engine-portable), distance is the codegen'd `l2_sq`
    * kernel in one shuffle-free scan, and the top-k plans as
    * TakeOrderedAndProject — per-partition k-row heaps, no global
    * sort, no corpus shuffle: the only shape "k farthest of 100 TB"
    * can take. Ties break on vec_id via the raw squared distance
    * (bit-identical everywhere — sequential fold over doubles).
    */
  def centroidOutliers(embeddings: DataFrame, k: Int = 50,
                       dim: Int = 64): DataFrame = {
    val avgs = (0 until dim).map(j => avg(col("embedding").getItem(j)).as(s"c$j"))
    val row = embeddings.agg(avgs.head, avgs.tail: _*).head()
    require(!row.isNullAt(0),
      "centroidOutliers: empty embeddings frame (no centroid to fit)")
    val mu = array((0 until dim).map(j => lit(row.getDouble(j).toFloat)): _*)
    embeddings
      .select(col("vec_id"), l2_sq(col("embedding"), mu).as("d2"))
      .orderBy(col("d2").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(sqrt(col("d2")), 6).as("dist"))
  }

  /** ANN recall AUDIT: per-query overlap between the production IVF
    * path ([[annIvf]]) and exact brute-force ground truth
    * ([[bruteTopK]]) on the bounded probe query set — recall@k, the
    * number every ANN deployment reports before trusting its
    * cell/probe parameters (the IVF cell boundaries are where
    * neighbors get lost; this measures how many, on YOUR corpus).
    * Same probe-bounded discipline as the LSH calibration: ground
    * truth is exact only over the query subset, the audited path is
    * the full production pipeline. Output is one row per query.
    */
  /** Multi-vector LATE-INTERACTION retrieval (the ColBERT MaxSim
    * family): both queries and documents are SETS of vectors
    * (`vec_id div groupSize` manufactures the grouping over the flat
    * embeddings table — in production the group key is the doc id of
    * a token/chunk-level encoder), and a document scores
    * Σ_{q∈Q} max_{d∈D} cos(q, d): each query vector credits its best
    * match in the doc, so one strong aligned chunk can't be drowned
    * by the doc's unrelated mass the way a single pooled vector
    * averages it away. Shape: the query side is model-sized and
    * broadcast; the corpus streams once; the per-(query-vector, doc)
    * max and the per-(query, doc) sum are both map-side-combined
    * aggregations on the (q, d) key; the final cut rides the native
    * TopKPerKey heaps. Scores accumulate in exact INTEGER
    * micro-units (6dp cosine × 1e6 — sums of doubles are
    * order-dependent, sums of longs are not; the pageRank
    * fixed-point discipline), so ranking AND the reported score are
    * engine- and shuffle-reproducible. At 100 TB the same kernel
    * runs after an IVF/LSH candidate cut; this exact form is the
    * rerank core and its own ground truth.
    */
  def maxSim(embeddings: DataFrame, queryGroups: Column,
             groupSize: Int = 10, k: Int = 5): DataFrame = {
    require(groupSize >= 1 && k >= 1)
    val v = embeddings.select(col("vec_id"),
      expr(s"vec_id div $groupSize").as("grp"), col("embedding"))
    val q = v.filter(queryGroups)
      .select(col("vec_id").as("q_vec"), col("grp").as("q_grp"),
        col("embedding").as("q_emb"))
    val pm = v.join(broadcast(q), col("grp") =!= col("q_grp"))
      .select(col("q_grp"), col("q_vec"), col("grp").as("d_grp"),
        round(round(cosine_sim(col("q_emb"), col("embedding")), 6) * 1e6, 0)
          .cast("long").as("u"))
      .groupBy("q_grp", "q_vec", "d_grp").agg(max("u").as("mx"))
    val sc = pm.groupBy("q_grp", "d_grp").agg(sum("mx").as("score_u"))
    val w = Window.partitionBy("q_grp")
      .orderBy(col("score_u").desc, col("d_grp"))
    graft.plans.TopK.perKey(sc, Seq("q_grp"),
        Seq(col("score_u").desc, col("d_grp").asc), k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("q_grp"), col("rank"), col("d_grp"),
        round(col("score_u") / 1e6, 6).as("maxsim"))
  }

  /** [[maxSim]] through the production IVF path — the 100 TB shape
    * the exact kernel's doc comment promises: corpus VECTORS assign
    * to coarse cells on the packed broadcast model (one scan, fused
    * argmax, zero shuffles to assignment), query vectors probe their
    * `nProbe` nearest cells, and a candidate DOC GROUP is any group
    * with at least one vector in a probed cell — the union semantics
    * a multi-vector doc needs (ONE aligned chunk in a probed cell
    * recruits the whole group, exactly the late-interaction point).
    * The exact integer-unit MaxSim kernel then runs restricted to
    * candidate (query, doc) pairs, so corpus-scale work is the
    * assignment scan plus candidate fan-out, never queries × docs.
    * [[maxSim]] stands as its ground truth (the recall-audit
    * discipline); scores of surfaced pairs are bit-equal by
    * construction — only membership can differ, and only when every
    * aligned chunk of a true neighbor hides outside the probed
    * cells.
    */
  def maxSimIvf(embeddings: DataFrame, queryGroups: Column,
                groupSize: Int = 10, k: Int = 5,
                centroidStride: Long = 50L, nProbe: Int = 2): DataFrame = {
    require(groupSize >= 1 && k >= 1 && nProbe >= 1)
    val v = embeddings.select(col("vec_id"),
      expr(s"vec_id div $groupSize").as("grp"), col("embedding"))
    val centroids = v.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"))
    val packed = packCentroids(centroids)
    val assigned = v.crossJoin(broadcast(packed))
      .withColumn("__i", nearest_idx(col("embedding"), col("cents")) + 1)
      .select(col("vec_id"), col("grp"),
        element_at(col("cell_ids"), col("__i")).as("cell_id"))
    val q = v.filter(queryGroups)
      .select(col("vec_id").as("q_vec"), col("grp").as("q_grp"),
        col("embedding").as("q_emb"))
    val probes = q.crossJoin(broadcast(packed))
      .select(col("q_grp"),
        explode(top_idx(col("q_emb"), col("cents"), nProbe)).as("__e"),
        col("cell_ids"))
      .select(col("q_grp"),
        element_at(col("cell_ids"), col("__e") + 1).as("cell_id"))
      .distinct()
    val candGrps = assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("grp") =!= col("q_grp"))
      .select(col("q_grp"), col("grp").as("d_grp")).distinct()
    val pm = candGrps
      .join(v.select(col("grp").as("d_grp"), col("embedding")), "d_grp")
      .join(broadcast(q), Seq("q_grp"))
      .select(col("q_grp"), col("q_vec"), col("d_grp"),
        round(round(cosine_sim(col("q_emb"), col("embedding")), 6) * 1e6, 0)
          .cast("long").as("u"))
      .groupBy("q_grp", "q_vec", "d_grp").agg(max("u").as("mx"))
    val sc = pm.groupBy("q_grp", "d_grp").agg(sum("mx").as("score_u"))
    val w = Window.partitionBy("q_grp")
      .orderBy(col("score_u").desc, col("d_grp"))
    graft.plans.TopK.perKey(sc, Seq("q_grp"),
        Seq(col("score_u").desc, col("d_grp").asc), k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("q_grp"), col("rank"), col("d_grp"),
        round(col("score_u") / 1e6, 6).as("maxsim"))
  }

  def annRecallAudit(embeddings: DataFrame, queryFilter: Column,
                     k: Int = 5): DataFrame = {
    val exact = bruteTopK(embeddings, queryFilter, k)
      .select(col("q_id"), col("vec_id"))
    val approx = annIvf(embeddings, queryFilter, k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exact
      .join(approx.hint("shuffle_hash"), Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("k"), 4))
  }

  /** Per-label embedding DRIFT audit: each label's centroid distance
    * to the global centroid plus the label's internal dispersion
    * (mean member-to-centroid distance) — the "did shard/encoder X
    * drift" check an embedding pipeline runs per ingest batch (a
    * label whose centroid wanders or whose dispersion balloons was
    * embedded differently). Centroids are bounded driver-held
    * models (|labels| float-cast d-vectors — the packed-model
    * convention); the centroid-to-global distances are driver
    * arithmetic in the same float-in/double-accumulate order as the
    * `l2_sq` kernel; the corpus-side pass is ONE scan joined to the
    * broadcast centroid table, so nothing corpus-sized shuffles.
    */
  def labelDrift(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    val avgs = (0 until dim).map(j => avg(col("embedding").getItem(j)).as(s"c$j"))
    val gRow = embeddings.agg(avgs.head, avgs.tail: _*).head()
    require(!gRow.isNullAt(0),
      "labelDrift: empty embeddings frame (no centroid to fit)")
    val g = Array.tabulate(dim)(j => gRow.getDouble(j).toFloat)
    val labRows = embeddings.groupBy("label").agg(avgs.head, avgs.tail: _*)
      .collect()
    val model = labRows.map { r =>
      val c = Array.tabulate(dim)(j => r.getDouble(j + 1).toFloat)
      var s = 0.0
      var j = 0
      while (j < dim) {
        val d = c(j).toDouble - g(j).toDouble; s += d * d; j += 1
      }
      (r.getAs[Int]("label"), c.toSeq,
        BigDecimal(math.sqrt(s))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = model.toDF("label", "c_emb", "centroid_dist")
    embeddings.join(broadcast(cents), "label")
      .select(col("label"), col("centroid_dist"),
        round(sqrt(l2_sq(col("embedding"), col("c_emb"))), 6).as("dd"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        max("centroid_dist").as("centroid_dist"),
        round(avg("dd"), 4).as("dispersion"))
  }

  /** Lloyd refinement of per-(cell, subspace) PQ codebooks over the
    * residual sample: each iteration assigns every sampled residual
    * subvector to its nearest codeword (fused argmin on the packed
    * codebook — a bounded broadcast, so the sample never shuffles for
    * assignment) and recomputes codewords as per-dimension means
    * (map-side-combinable aggregation keyed by (cell, s, code)).
    * Codewords that attract no sample drop out — the codebook can
    * only shrink, never grow, so model size stays bounded by
    * construction. The sample is the training set, exactly as FAISS
    * trains PQ codebooks on a subsample; iteration count is a model
    * constant, never a function of corpus size.
    */
  private[graft] def refineCodebook(samples: DataFrame, init: DataFrame,
                                    iters: Int, sub: Int): DataFrame = {
    var cb = init
    for (_ <- 0 until iters) {
      // pack each (cell, s) codebook as a single-subspace flat
      // codebook so the L2-argmin assignment reuses the pq_encode
      // kernel (nearest_idx is the COSINE argmax for coarse cells —
      // the wrong metric for codewords)
      val packed = cb.groupBy("cell_id", "s")
        .agg(sort_array(collect_list(
          struct(lit(0).as("s"), col("code"), col("c_sub")))).as("cw"))
      cb = samples.join(broadcast(packed), Seq("cell_id", "s"))
        .select(col("cell_id"), col("s"),
          element_at(pq_encode(col("r_sub"), col("cw")), 1).as("code"),
          col("r_sub"))
        .groupBy("cell_id", "s", "code")
        .agg(array((0 until sub).map(j =>
          avg(col("r_sub").getItem(j)).cast("float")): _*).as("c_sub"))
    }
    cb
  }

  /** Lloyd's k-means refinement of a centroid set, as DataFrame ops:
    * each iteration assigns every vector to its nearest centroid
    * (broadcast argmax — one corpus scan) and recomputes cell means
    * (map-side-combinable per-dimension aggregation). The driver loop
    * is over `iters` (small); data never leaves executors. Returns
    * (cell_id, c_emb) with contiguous ids.
    */
  def kmeansCentroids(corpus: DataFrame, init: DataFrame, iters: Int,
                      dim: Int): DataFrame = {
    var centroids = init.select(col("cell_id"), col("c_emb"))
    for (_ <- 0 until iters) {
      val assigned = assignPacked(corpus, packCentroids(centroids),
        withResidual = false)
      centroids = assigned
        .groupBy("cell_id")
        .agg(array((0 until dim).map(j =>
          avg(col("embedding").getItem(j)).cast("float")): _*).as("c_emb"))
    }
    centroids
  }

  /** IVF-style ANN: coarse quantizer cells (a deterministic corpus
    * subsample, optionally Lloyd-refined via [[kmeansCentroids]]).
    * Every vector is assigned to its nearest centroid (broadcast
    * argmax — one corpus scan); queries probe their `nProbe` nearest
    * cells and rerank exactly within them.
    */
  /** ANN RANGE search: every corpus vector within cosine ≥ τ of each
    * probe query — "give me ALL the near-duplicates of this item",
    * where top-k caps the answer arbitrarily (radius recall is what
    * embedding-dedup sweeps and contamination checks actually ask).
    * Same IVF shape as [[annIvf]]: probe the nProbe most-similar
    * cells, exact-verify inside them — the corpus reaches candidate
    * selection with zero data-sized shuffles, and the output is
    * bounded by the true radius neighborhood, not a k knob.
    */
  def rangeSearch(embeddings: DataFrame, queryFilter: Column, tau: Double,
                  centroidStride: Long = 50L, nProbe: Int = 2): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val centroids = corpus.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"))
    val packed = packCentroids(centroids)
    val assigned = assignPacked(corpus, packed, withResidual = false)
    val queryCells = corpus.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(packed))
      .select(col("q_id"), col("q_emb"),
        explode(top_idx(col("q_emb"), col("cents"), nProbe)).as("__e"),
        col("cell_ids"))
      .select(col("q_id"), col("q_emb"),
        element_at(col("cell_ids"), col("__e") + 1).as("cell_id"))
    assigned.join(broadcast(queryCells), Seq("cell_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine_sim(col("q_emb"), col("embedding")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** IVF cell-balance audit: vectors per coarse cell, share of the
    * corpus, and an exact-integer hot flag (cell > 2× the mean cell
    * size, `n·cells > 2·total` — never a float boundary). An IVF
    * deployment's query latency is gated by its HOTTEST probed cell
    * and its recall by near-empty ones; this is the report that says
    * re-train the coarse quantizer / split a cell before shipping
    * the index — the ANN twin of the q32 join-key skew audit. Same
    * packed-model assignment as the serving path (one corpus scan,
    * zero shuffles before the per-cell count); every cell is
    * non-empty because its centroid assigns to itself.
    */
  def cellBalance(embeddings: DataFrame,
                  centroidStride: Long = 50L): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val centroids = corpus.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"))
    val sizes = assignPacked(corpus, packCentroids(centroids),
        withResidual = false)
      .groupBy("cell_id").agg(count(lit(1)).as("n_vecs"))
    val tot = sizes.agg(sum("n_vecs").as("total"),
      count(lit(1)).as("n_cells"))
    sizes.crossJoin(broadcast(tot))
      .select(col("cell_id"), col("n_vecs"),
        round(col("n_vecs") / col("total"), 4).as("share"),
        (col("n_vecs") * col("n_cells") > col("total") * 2).as("hot"))
  }

  /** CELL PURITY — [[cellBalance]]'s semantic twin: balance asks
    * whether IVF cells are evenly SIZED; purity asks whether they
    * are semantically COHERENT (each cell dominated by one label).
    * An index can be perfectly balanced and still useless — cells
    * that mix labels force high nprobe for any recall. Per cell: the
    * member count, the dominant label (max count, label tie-break
    * low), and its share in ppm (DECIMAL-widened). One assignment
    * pass on the packed model, one (cell, label) aggregate, one
    * bounded-heap argmax per cell.
    */
  def cellPurity(embeddings: DataFrame,
                 centroidStride: Long = 50L): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"),
      col("label"))
    val centroids = corpus.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"))
    val assigned = assignPacked(
      corpus.select(col("vec_id"), col("embedding")),
      packCentroids(centroids), withResidual = false)
      .join(corpus.select(col("vec_id"), col("label"))
        .hint("shuffle_hash"), "vec_id")
    val byLabel = assigned.groupBy("cell_id", "label")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // cells×labels summary; argmax + sizes read it
    val top = graft.plans.TopK.perKey(byLabel, Seq("cell_id"),
      Seq(col("n").desc, col("label").asc), 1)
    val sizes = byLabel.groupBy("cell_id").agg(sum("n").as("n_vecs"))
    sizes.join(top.select(col("cell_id"), col("label").as("top_label"),
        col("n").as("top_n")).hint("shuffle_hash"), Seq("cell_id"))
      .select(col("cell_id"), col("n_vecs"), col("top_label"),
        expr("CAST(CAST(top_n AS DECIMAL(38,0)) * 1000000 " +
          "div n_vecs AS BIGINT)").as("purity_ppm"))
  }

  /** Exact maximum-inner-product top-k (MIPS): the retrieval
    * objective when vector NORMS carry signal (recommendation
    * scores, unnormalized query-document relevance) — cosine top-k
    * answers a different question the moment norms vary. Same scan
    * discipline as [[bruteTopK]]: queries broadcast, corpus scanned
    * once, the codegen'd dot kernel scores in-line, selection runs
    * through the native TopKPerKey heaps so only k rows per query
    * survive each partition.
    */
  def mipsTopK(embeddings: DataFrame, queryFilter: Column, k: Int): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val queries = corpus.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot_ff(col("q_emb"), col("embedding")), 6).as("dot"))
    val w = Window.partitionBy("q_id").orderBy(col("dot").desc, col("vec_id"))
    graft.plans.TopK.perKey(scored, Seq("q_id"),
        Seq(col("dot").desc, col("vec_id").asc), k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("q_id", "rank", "vec_id", "dot")
  }

  /** The MIPS → cosine reduction (the asymmetric-transform trick of
    * the MIPS-as-LSH literature): corpus vectors get one appended
    * coordinate holding `sqrt(M² − ‖x‖²)` (M = max corpus norm, one
    * aggregate pass); rows matching `queryFilter` get `0` instead —
    * the transform is ASYMMETRIC, and applying the sqrt term to a
    * query would add a norm-dependent cross term that breaks the
    * ranking. Every augmented corpus vector has norm exactly M, so
    * augmented cosine is `⟨q,x⟩ / (‖q‖·M)` — monotone in the inner
    * product per query — and dot-product retrieval rides ANY of the
    * cosine ANN paths (LSH / IVF / PQ) on the returned frame with
    * the same `queryFilter`, unchanged. The one contract change:
    * zero-augmented query rows no longer rank correctly as CORPUS
    * candidates of other queries (out-of-corpus queries — the usual
    * MIPS posture — are unaffected). Spec pins rank-equivalence of
    * augmented-cosine retrieval with [[mipsTopK]].
    */
  def mipsAugment(embeddings: DataFrame, queryFilter: Column): DataFrame =
    mipsAugmentWith(embeddings, queryFilter, fitMipsBound(embeddings))

  /** FIT the MIPS augmentation bound — the one-row (max_sq) frame
    * the asymmetric transform is built around, exposed so a serving
    * deployment persists it via [[saveIndex]] next to its centroids
    * instead of re-scanning the corpus for the max norm on every
    * run (the bound must be the FITTING corpus's — recomputing it on
    * a grown corpus silently re-scales every augmented coordinate).
    */
  def fitMipsBound(embeddings: DataFrame): DataFrame =
    embeddings.agg(max(dot_ff(col("embedding"), col("embedding")))
      .as("max_sq"))

  /** [[mipsAugment]] against a FITTED (possibly loaded) bound. */
  def mipsAugmentWith(embeddings: DataFrame, queryFilter: Column,
                      maxSq: DataFrame): DataFrame = {
    val normSq = dot_ff(col("embedding"), col("embedding"))
    embeddings
      .crossJoin(broadcast(maxSq))
      .select(col("vec_id"),
        concat(col("embedding"),
          array(when(queryFilter, lit(0.0d))
            .otherwise(sqrt(greatest(col("max_sq") - normSq, lit(0.0d))))
            .cast("float"))).as("embedding"))
  }

  def annIvf(embeddings: DataFrame, queryFilter: Column, k: Int,
             centroidStride: Long = 50L, nProbe: Int = 2,
             kmeansIters: Int = 0, dim: Int = 64): DataFrame =
    serveIvf(embeddings, queryFilter, k,
      fitIvf(embeddings, centroidStride, kmeansIters, dim), nProbe)

  /** FIT the IVF coarse quantizer — the model half of [[annIvf]]:
    * a deterministic stride seed, optionally Lloyd-refined via
    * [[kmeansCentroids]]. The (cell_id, c_emb) frame is the bounded
    * artifact a deployment [[saveIndex]]es once and serves forever
    * through [[serveIvf]] / [[assignKmeans]] — refitting Lloyd from
    * the corpus on every serving run is the production seam this
    * closes. Doubles as the first-class k-means fit (`fitKmeans` in
    * spirit): the refined centroids ARE the cluster model, and
    * [[assignKmeans]] is its apply half.
    */
  def fitIvf(embeddings: DataFrame, centroidStride: Long = 50L,
             kmeansIters: Int = 0, dim: Int = 64): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val seed = corpus.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"))
    if (kmeansIters > 0) kmeansCentroids(corpus, seed, kmeansIters, dim)
    else seed
  }

  /** SERVE IVF top-k from a fitted (cell_id, c_emb) centroid set —
    * the apply-only half of [[annIvf]], loaded-model-first: the
    * model is bounded by construction, so it re-enters the plan as
    * a 1-row packed broadcast whether it was just fitted or read
    * back by [[loadIndexPart]].
    */
  def serveIvf(embeddings: DataFrame, queryFilter: Column, k: Int,
               centroids: DataFrame, nProbe: Int = 2): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    // fused packed-model assignment and probing: one scan per side,
    // no corpus×cells explode, no per-vector window shuffle
    val packed = packCentroids(centroids)
    val assigned = assignPacked(corpus, packed, withResidual = false)
    val queryCells = corpus.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(packed))
      .select(col("q_id"), col("q_emb"),
        explode(top_idx(col("q_emb"), col("cents"), nProbe)).as("__e"),
        col("cell_ids"))
      .select(col("q_id"), col("q_emb"),
        element_at(col("cell_ids"), col("__e") + 1).as("cell_id"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(queryCells), Seq("cell_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine_sim(col("q_emb"), col("embedding")), 6).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
  }

  /** IVF PROBE-TUNING CURVE — recall@k as a function of nprobe, the
    * artifact an ANN deployment actually reads to pick its
    * latency/recall point ([[annRecallAudit]] reports ONE point on
    * this curve; tuning needs the curve). ONE corpus assignment pass
    * and ONE candidate-scoring join serve every probe count: each
    * query's probed cells carry their probe RANK (the order top_idx
    * opens them), a candidate inherits its cell's rank, and the
    * nprobe=p cut is a filter `cell_rank <= p` over the same scored
    * frame — never a re-assignment or re-scan per p. Per-(p, query)
    * top-k rides the bounded TopKPerKey heaps; the brute reference
    * is the eval kernel over the bounded probe set. Exact integer
    * ppm per probe count.
    */
  def probeCurve(embeddings: DataFrame, queryFilter: Column, k: Int = 5,
                 probes: Seq[Int] = Seq(1, 2, 4),
                 centroidStride: Long = 50L): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    require(probes.nonEmpty && probes.forall(_ > 0),
      s"probes ($probes) must be positive")
    val maxP = probes.max
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val packed = packCentroids(
      corpus.filter(col("vec_id") % centroidStride === 0)
        .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb")))
    val assigned = assignPacked(corpus, packed, withResidual = false)
    val queryCells = corpus.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(packed))
      .select(col("q_id"), col("q_emb"),
        posexplode(top_idx(col("q_emb"), col("cents"), maxP))
          .as(Seq("pr", "__e")),
        col("cell_ids"))
      .select(col("q_id"), col("q_emb"),
        (col("pr") + 1).cast("int").as("cell_rank"),
        element_at(col("cell_ids"), col("__e") + 1).as("cell_id"))
    // every vector lives in exactly ONE cell, so (q, vec) appears at
    // most once and carries the rank at which its cell is opened
    val scored = assigned.join(broadcast(queryCells), Seq("cell_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("cell_rank"),
        round(cosine_sim(col("q_emb"), col("embedding")), 6).as("cos"))
      .localCheckpoint() // every probe cut reads it
    val exact = bruteTopK(embeddings, queryFilter, k)
      .select("q_id", "vec_id").localCheckpoint()
    val denom = exact.agg(count(lit(1)).as("n_pairs"),
      countDistinct("q_id").as("n_queries"))
    val perProbe = probes.map { p =>
      graft.plans.TopK.perKey(scored.filter(col("cell_rank") <= p),
          Seq("q_id"), Seq(col("cos").desc, col("vec_id").asc), k)
        .join(broadcast(exact), Seq("q_id", "vec_id"))
        .agg(count(lit(1)).as("n_hit"))
        .select(lit(p).as("nprobe"), col("n_hit"))
    }.reduce(_ unionAll _)
    perProbe.crossJoin(broadcast(denom))
      .select(col("nprobe"), col("n_queries"), col("n_pairs"), col("n_hit"),
        expr("CAST(CAST(n_hit AS DECIMAL(38,0)) * 1000000 " +
          "div n_pairs AS BIGINT)").as("recall_ppm"))
  }

  /** HARD-NEGATIVE MINING — the contrastive-training data op: for
    * each query vector, the k most similar vectors from OTHER labels
    * inside a similarity band [lo, hi]. The band is the point: below
    * `lo` the negative is trivial (no gradient signal); above `hi`
    * it is so close it is likely a mislabeled positive, and training
    * on it actively hurts (the false-negative hazard every
    * contrastive recipe warns about — calibrate `hi` against
    * [[thresholdPlan]]'s null quantiles). Exact brute form over the
    * bounded probe set, selection on the native bounded-heap
    * [[graft.plans.TopK]]; at 100 TB the same kernel runs after the
    * IVF candidate cut exactly like [[maxSim]]'s rerank core, and
    * this exact form is its ground truth.
    */
  def hardNegatives(embeddings: DataFrame, queryFilter: Column,
                    k: Int = 5, lo: Double = 0.3,
                    hi: Double = 0.9): DataFrame = {
    require(k >= 1 && lo <= hi, s"need k >= 1 and lo ($lo) <= hi ($hi)")
    val corpus = embeddings.select(col("vec_id"), col("label"), col("embedding"))
    val q = corpus.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    val scored = corpus.join(broadcast(q), col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id"),
        round(cosine_sim(col("q_emb"), col("embedding")), 6).as("cos"))
      .filter(col("cos") >= lo && col("cos") <= hi)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    graft.plans.TopK.perKey(scored, Seq("q_id"),
        Seq(col("cos").desc, col("vec_id").asc), k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("q_id", "rank", "vec_id", "cos")
  }

  /** EMBEDDING-SPACE DIVERSITY audit — per-label dispersion WITHOUT
    * any pairwise join: the mean pairwise squared distance over a
    * label's vectors is a closed form of two moments,
    * `E‖x−y‖² = 2(n·Σ‖xᵢ‖² − ‖Σxᵢ‖²)/n²` (ordered pairs, self-pairs
    * included at distance 0), and the trace of the covariance is the
    * same numerator over n². A collapsed/duplicated stratum (mode
    * collapse, template floods, a mis-configured encoder emitting
    * one point) reads as dispersion ≈ 0; this is the per-source
    * diversity number a training-mix review wants NEXT TO the
    * near-dup rate, at one-scan cost where a sampled pairwise
    * estimate needs a join and an RNG.
    *
    * Exactness discipline: elements quantize to integer MICRO-UNITS
    * (round(x·10⁶) — float→double is exact, so the quantization is
    * engine-identical), every sum is integer (order-independent:
    * the maxSim/pageRank discipline), the per-dim sums and square
    * sums ride ONE map-side-combined (label, dim) aggregate, widened
    * through DECIMAL(38,0) where n·Σ‖x‖² exceeds int64 (the
    * graph_hits convention, DuckDB HUGEINT on the oracle side), and
    * ONE integer division lands at the end. Outputs are micro²-unit
    * longs (1e-12 of the float² scale).
    */
  /** k-NN LABEL-VOTE accuracy — the standard embedding-quality eval
    * (does the geometry respect the labels?): every node's label is
    * predicted by the MAJORITY label of its k nearest cosine
    * neighbors (ties → the smaller label, deterministic on any
    * engine), rolled up to per-label n / n_correct / accuracy in
    * integer ppm. A label whose accuracy craters was embedded
    * poorly — or its taxonomy overlaps a neighbor's — and that is
    * the go/no-go signal before the embeddings feed dedup, ANN
    * serving, or curriculum strata.
    *
    * Runs on the exact [[knnGraph]] over the bounded probe subset
    * (the eval-kernel discipline of [[annRecallAudit]]): at 100 TB
    * the same vote + rollup runs unchanged over IVF/LSH candidate
    * edges — the vote is keyed on (src, label) with ≤ k rows per
    * src, the argmax is a bounded TopKPerKey heap, labels ride
    * broadcasts, and the output is |labels| rows.
    */
  def knnLabelVote(embeddings: DataFrame, nodeFilter: Column,
                   k: Int = 5): DataFrame = {
    val labels = embeddings.filter(nodeFilter)
      .select(col("vec_id"), col("label"))
    val votes = knnGraph(embeddings, nodeFilter, k)
      .join(broadcast(labels.select(col("vec_id").as("dst"),
        col("label").as("dst_label"))), Seq("dst"))
      .groupBy("src", "dst_label").agg(count(lit(1)).as("v"))
    val pred = graft.plans.TopK.perKey(votes, Seq("src"),
        Seq(col("v").desc, col("dst_label").asc), 1)
      .select(col("src"), col("dst_label").as("pred_label"))
    pred.join(broadcast(labels.select(col("vec_id").as("src"),
        col("label"))), Seq("src"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred_label") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      // n_correct·10⁶ wraps int64 past ~9.2e12 nodes per label
      .withColumn("acc_ppm", expr(
        "CAST(CAST(n_correct AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"))
  }

  /** MATRYOSHKA TRUNCATION-RECALL audit: for each candidate prefix
    * dimension d, recall@k of top-k-by-cosine over the FIRST d
    * coordinates against the full-dimension exact top-k — the
    * adopt-or-don't readout for MRL-style truncated embeddings
    * (Kusupati et al. 2022), where serving at d costs dim/d less
    * memory and the only question is how much recall that buys back.
    *
    * ONE broadcast join scores every (query, candidate) pair at
    * every prefix AND the full dimension in the same projection
    * (the pair set is never re-joined per d — the explode carries
    * |dims|+1 struct rows per pair, each (d, cos)); per-(q, d)
    * top-k rides the bounded TopKPerKey heaps; the recall join and
    * rollup run on the queries×k model frame. Exact integer ppm at
    * the end. The brute pair scoring is the eval kernel over the
    * bounded probe subset ([[annRecallAudit]]'s discipline) — the
    * production path cuts candidates with IVF first, same audit on
    * top.
    */
  def truncationRecall(embeddings: DataFrame, queryFilter: Column,
                       k: Int = 5, dims: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    require(dims.nonEmpty && dims.forall(_ > 0), s"dims ($dims) must be positive")
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val queries = corpus.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // d = 0 encodes the full-dimension reference ranking
    val dimCos = dims.map(d => struct(lit(d).as("d"),
      round(cosine_sim(slice(col("q_emb"), 1, d),
        slice(col("embedding"), 1, d)), 6).as("cos"))) :+
      struct(lit(0).as("d"),
        round(cosine_sim(col("q_emb"), col("embedding")), 6).as("cos"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        explode(array(dimCos: _*)).as("dc"))
      .select(col("q_id"), col("vec_id"),
        col("dc.d").as("d"), col("dc.cos").as("cos"))
    val top = graft.plans.TopK.perKey(scored, Seq("q_id", "d"),
      Seq(col("cos").desc, col("vec_id").asc), k)
      .localCheckpoint() // reference cut + every per-d cut read it
    val full = top.filter(col("d") === 0).select("q_id", "vec_id")
    val denom = full.agg(count(lit(1)).as("n_pairs"),
      countDistinct("q_id").as("n_queries"))
    val hits = top.filter(col("d") =!= 0)
      .join(broadcast(full), Seq("q_id", "vec_id"))
      .groupBy("d").agg(count(lit(1)).as("n_hit"))
    val spark = embeddings.sparkSession
    val dimsDf = spark.createDataset(dims)(
      org.apache.spark.sql.Encoders.scalaInt).toDF("d")
    // both sides are ≤|dims| rows but the checkpointed lineage hides
    // that — broadcast explicitly or this plans as SMJ
    dimsDf.join(broadcast(hits), Seq("d"), "left")
      .na.fill(0L, Seq("n_hit"))
      .crossJoin(broadcast(denom))
      .select(col("d"), col("n_queries"), col("n_pairs"), col("n_hit"),
        expr("CAST(CAST(n_hit AS DECIMAL(38,0)) * 1000000 " +
          "div n_pairs AS BIGINT)").as("recall_ppm"))
  }

  /** SIGN-BIT BINARIZATION recall audit — the 32×-compression
    * sibling of [[truncationRecall]] (binary embeddings: one bit per
    * coordinate, Hamming distance by XOR+popcount — the cheapest
    * first-stage retrieval filter there is; 64 float32 dims become
    * TWO int64 words): recall@k of top-k-by-Hamming against the
    * full-precision cosine top-k, per query. Signatures pack as two
    * 32-bit words in int64 lanes (bit 31 of a 32-wide lane never
    * touches the sign bit, so Spark longs and DuckDB BIGINTs agree
    * bit-for-bit; a 64-wide lane would put dim 63 on the sign and
    * DuckDB's `<<` rejects it), built by codegen'd higher-order
    * folds in the same scan that scores the exact cosine — ONE
    * broadcast join for both rankings, TopKPerKey cuts, ties by
    * (distance, vec_id) so any engine replays the same cut. Exact
    * integer ppm per query.
    */
  def hammingRecall(embeddings: DataFrame, queryFilter: Column,
                    k: Int = 5): DataFrame = {
    def word(off: Int) = expr(
      s"aggregate(transform(sequence(0, 31), i -> " +
        s"IF(element_at(embedding, i + $off + 1) > 0D, " +
        s"shiftleft(1L, i), 0L)), 0L, (a, x) -> a | x)")
    val corpus = embeddings.select(col("vec_id"), col("embedding"),
      word(0).as("lo"), word(32).as("hi"))
    val queries = corpus.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("lo").as("q_lo"), col("hi").as("q_hi"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine_sim(col("q_emb"), col("embedding")), 6).as("cos"),
        expr("bit_count(lo ^ q_lo) + bit_count(hi ^ q_hi)")
          .cast("long").as("ham"))
      .localCheckpoint() // both rankings cut the same scored pairs
    val exact = graft.plans.TopK.perKey(scored, Seq("q_id"),
      Seq(col("cos").desc, col("vec_id").asc), k)
      .select("q_id", "vec_id")
    val approx = graft.plans.TopK.perKey(scored, Seq("q_id"),
      Seq(col("ham").asc, col("vec_id").asc), k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exact.join(broadcast(approx), Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_ppm", expr(
        "CAST(CAST(n_hit AS DECIMAL(38,0)) * 1000000 div k AS BIGINT)"))
  }

  def diversity(embeddings: DataFrame): DataFrame = {
    val m = embeddings.select(col("label"),
      expr("transform(embedding, v -> " +
        "CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))").as("e"))
    // (label, dim) partials: Σx and Σx² per coordinate — explode
    // compresses immediately under partial aggregation, no row ever
    // carries more than (label, j, x)
    val perDim = m
      .select(col("label"), posexplode(col("e")).as(Seq("j", "x")))
      .groupBy("label", "j")
      // ssj accumulates x² terms of ~1e12 each: the SUM leaves int64
      // around 1e7 same-label vectors, so it widens at the term, not
      // one aggregation level too late (the oracle's sum(BIGINT) is
      // HUGEINT from the first row). sj sums ~1e6-magnitude terms —
      // int64 holds to ~9e12 vectors per label, far past any stratum
      .agg(sum("x").as("sj"),
        sum(expr("CAST(x * x AS DECIMAL(38,0))")).as("ssj"))
    val moments = perDim.groupBy("label")
      .agg(sum("ssj").as("s"),
        sum(col("sj").cast("decimal(38,0)") * col("sj")).as("q"))
    val counts = embeddings.groupBy("label").agg(count(lit(1)).as("n"))
    counts.join(moments, Seq("label"))
      .select(col("label"), col("n"),
        expr("CAST((n * s - q) div (n * n) AS BIGINT)")
          .as("trace_cov_u2"),
        expr("CAST((2 * (n * s - q)) div (n * n) AS BIGINT)")
          .as("mean_pair_sqdist_u2"))
  }

  /** MEAN RECIPROCAL RANK of the IVF index against the brute top-1 —
    * the second ranking metric next to [[annRecallAudit]]'s
    * recall@k: recall asks "is the truth in the candidate set"; MRR
    * asks "how far down the list does a user scroll to it", which is
    * what a retrieval UI or a rerank-budget decision actually prices.
    * One IVF pass (k candidates per query), one brute top-1 pass
    * over the same bounded query set, a LEFT join on the
    * (query, truth) key — a miss scores 0, never drops the query —
    * and a single exact-integer rollup: rr = 10⁶ div rank per query,
    * summed through DECIMAL(38,0) (the repo ppm rule — at 10¹²+
    * queries an int64 rr sum wraps).
    */
  def mrrAudit(embeddings: DataFrame, queryFilter: Column,
               k: Int = 10): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    val cand = annIvf(embeddings, queryFilter, k)
      .select(col("q_id"), col("vec_id"), col("rank"))
    val truth = bruteTopK(embeddings, queryFilter, 1)
      .select(col("q_id"), col("vec_id"))
    // both sides are query-bounded (n_queries and n_queries·k rows)
    // but the window lineage hides that from the planner — broadcast
    // the candidate side explicitly or the join plans as SMJ (the
    // RankSelect discipline)
    truth.join(broadcast(cand), Seq("q_id", "vec_id"), "left")
      .agg(count(lit(1)).as("n_queries"),
        count(col("rank")).as("n_found"),
        sum(expr("CAST(coalesce(1000000 div rank, 0) AS DECIMAL(38,0))"))
          .as("rr"))
      .select(col("n_queries"), col("n_found"),
        expr("CAST(CAST(n_found AS DECIMAL(38,0)) * 1000000 " +
          "div n_queries AS BIGINT)").as("found_ppm"),
        expr("CAST(rr div n_queries AS BIGINT)").as("mrr_ppm"))
  }

  /** SAME-LABEL PRECISION vs COSINE THRESHOLD — the calibration
    * curve that prices a semantic-dedup / mining threshold in the
    * currency that matters: of the neighbor pairs scoring in each
    * similarity band, how many are actually same-label?
    * [[thresholdPlan]] reads the NULL distribution (how high random
    * pairs score); this reads the SIGNAL distribution over the real
    * knn edges, and the cumulative line from the top is directly
    * "precision if you cut at this bin's lower edge". Pairs come
    * from [[knnGraph]] (bounded node subset, bounded-heap top-k);
    * binning is the same fixed-edge float arithmetic as the
    * relational value histogram (IEEE-identical on any engine); the
    * ≤`bins`-row summary takes its cumulative line from
    * [[graft.ops.ModelFrames.exclusivePrefixSum]] keyed on the
    * DESCENDING bin, so "cut here" sums come without a single-
    * partition window.
    */
  def precisionCurve(embeddings: DataFrame, nodeFilter: Column,
                     k: Int = 10, bins: Int = 20): DataFrame = {
    require(k > 0 && bins > 0, s"k ($k), bins ($bins) must be positive")
    val labels = embeddings.select(col("vec_id"), col("label"))
    val pairs = knnGraph(embeddings, nodeFilter, k)
      .join(labels.select(col("vec_id").as("src"),
        col("label").as("l_src")), Seq("src"))
      .join(labels.select(col("vec_id").as("dst"),
        col("label").as("l_dst")), Seq("dst"))
    val binned = pairs.select(
      least(floor((col("cos") + lit(1.0d)) * bins / 2.0d),
        lit(bins - 1L)).cast("long").as("bin"),
      when(col("l_src") === col("l_dst"), 1L).otherwise(0L).as("same"))
    val summary = binned.groupBy("bin")
      .agg(count(lit(1)).as("n_pairs"), sum("same").as("n_same"))
      .withColumn("neg_bin", -col("bin"))
      .localCheckpoint() // both prefix lines + the join read it
    val cumP = graft.ops.ModelFrames.exclusivePrefixSum(
      summary, "neg_bin", "n_pairs", "p_off")
    val cumS = graft.ops.ModelFrames.exclusivePrefixSum(
      summary, "neg_bin", "n_same", "s_off")
    summary
      .join(broadcast(cumP), Seq("neg_bin"))
      .join(broadcast(cumS), Seq("neg_bin"))
      .select(col("bin"), col("n_pairs"), col("n_same"),
        expr("CAST(CAST(n_same AS DECIMAL(38,0)) * 1000000 " +
          "div n_pairs AS BIGINT)").as("precision_ppm"),
        (col("p_off") + col("n_pairs")).as("cum_pairs"),
        (col("s_off") + col("n_same")).as("cum_same"),
        expr("CAST(CAST(s_off + n_same AS DECIMAL(38,0)) * 1000000 " +
          "div (p_off + n_pairs) AS BIGINT)").as("cum_precision_ppm"))
  }

  /** MARGIN-BASED BITEXT MINING (the Artetxe & Schwenk ratio-margin
    * criterion re-expressed in exact integers) — the parallel-pair
    * miner of multilingual pipelines: across two disjoint groups,
    * keep pairs that are MUTUAL nearest neighbors and score each by
    * its margin, best·k·10⁶ div Σ(top-k), in both directions — a
    * high margin means "closest by a clear gap over the neighborhood
    * baseline", which separates true pairs from hubness artifacts
    * the raw-cosine cut cannot. Cosines enter as exact micro-units
    * (round-6 double → round → BIGINT, the engine-portable ladder);
    * margins widen through DECIMAL(38,0) and are null unless
    * best > 0 and the top-k sum is positive (floor vs truncate
    * division diverges below zero — the guard keeps both engines in
    * the agreeing quadrant). Exact form over bounded groups; at
    * 100 TB the same mutual-best + margin algebra runs over IVF
    * candidate lists exactly like [[hardNegatives]]' production cut.
    */
  def bitextMine(embeddings: DataFrame, groupA: Column, groupB: Column,
                 k: Int = 4): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    val a = embeddings.filter(groupA)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = embeddings.filter(groupB)
      .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val scored = a.join(broadcast(b), col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosine_sim(col("a_emb"), col("b_emb")), 6).as("cos6"))
      .select(col("a_id"), col("b_id"),
        expr("CAST(round(cos6 * 1000000) AS BIGINT)").as("u"))
    def side(key: String, other: String) =
      graft.plans.TopK.perKey(scored, Seq(key),
          Seq(col("u").desc, col(other).asc), k)
        .withColumn("rn", row_number().over(
          Window.partitionBy(key).orderBy(col("u").desc, col(other))))
        .groupBy(key)
        .agg(max(when(col("rn") === 1, col(other))).as(s"best_$other"),
          max(when(col("rn") === 1, col("u"))).as(s"best_u_$key"),
          sum("u").as(s"s_$key"), count(lit(1)).as(s"n_$key"))
    val fwd = side("a_id", "b_id")
    val bwd = side("b_id", "a_id")
    def margin(bu: String, s: String, n: String) =
      expr(s"CASE WHEN $s > 0 AND $bu >= 0 THEN " +
        s"CAST(CAST($bu AS DECIMAL(38,0)) * $n * 1000000 div $s AS BIGINT) " +
        "END")
    // per-vector aggregates on both sides (corpus-group-scale at
    // 100 TB): hash exchanges on the two equi keys, never a re-sort
    fwd.join(bwd.hint("shuffle_hash"),
        col("best_b_id") === col("b_id") && col("best_a_id") === col("a_id"))
      .select(col("a_id"), col("b_id"),
        col("best_u_a_id").as("cos_micro"),
        margin("best_u_a_id", "s_a_id", "n_a_id").as("fwd_margin_ppm"),
        margin("best_u_a_id", "s_b_id", "n_b_id").as("bwd_margin_ppm"))
  }
}
