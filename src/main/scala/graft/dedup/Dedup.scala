package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.{cosine_sim, minhash_bands, shingle_set, simhash64}
import graft.text.TextAnalysis.tokens

/** Deduplication operators for the training-data pipeline.
  *
  * Scale posture: nothing here is all-pairs over the full corpus.
  * Candidate generation is always an equi-join on a hash key
  * (shingle, MinHash band, SimHash chunk, LSH bucket) so the shuffle
  * is keyed and partial-aggregated; exact all-pairs variants exist
  * only over explicitly bounded probe subsets as oracles for the
  * approximate paths.
  */
object Dedup {

  /** Word n-gram shingle set (distinct) as an array column — a
    * single-pass custom expression; semantically identical to
    * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
    * slice(split(trim(text), " "), i, n))))` but without the
    * intermediate token arrays and per-window slices (~10x).
    */
  def shingleArray(text: Column, n: Int = 3): Column = shingle_set(text, n)

  /** Exploded (doc_id, shingle) pairs — the scalable building block:
    * downstream similarity joins are equi-joins on `shingle`.
    */
  def shingles(documents: DataFrame, n: Int = 3): DataFrame =
    documents.select(col("doc_id"),
      explode(shingleArray(col("text"), n)).as("shingle"))

  /** Shingle DOCUMENT-FREQUENCY histogram — the inverted-index COST
    * calibration artifact next to [[jaccardHistogram]]'s similarity
    * one: shingles bucketed by power-of-two df (bucket =
    * `length(bin(df))`, integer-exact on both engines), with the
    * posting mass and the Σdf² SELF-JOIN COST each bucket
    * contributes. Every set-similarity join here pays candidate work
    * proportional to Σ df² — this histogram says which df stratum
    * drives that bill (a fat high-df tail is boilerplate: exactly
    * the mass [[prefixFilterJaccard]]'s rarity ordering pushes out
    * of the join, and the number that justifies a stopword-shingle
    * cutoff before anyone runs the plain inverted-index join at
    * 100 TB). Two map-side-combined aggregations; output bounded by
    * log₂(max df), never the shingle count. Σdf² widens at the term
    * through DECIMAL(38,0) — a boilerplate shingle's df² alone can
    * pass int64 at corpus scale.
    */
  def dfHistogram(documents: DataFrame, n: Int = 3): DataFrame =
    shingles(documents, n)
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .groupBy(length(bin(col("df"))).cast("long").as("df_bucket"))
      .agg(count(lit(1)).as("n_shingles"),
        sum("df").as("postings"),
        expr("CAST(sum(CAST(df AS DECIMAL(38,0)) * df) AS BIGINT)")
          .as("join_cost_sq"))

  /** DF-CUTOFF PRUNING curve — the ACTIONABLE twin of
    * [[dfHistogram]]: what an inverted-index df-cutoff (drop
    * shingles with df > D from the INDEX — the standard
    * stopword-shingle defense against the Σdf² join bill) actually
    * costs in recall and buys in join work, measured per candidate
    * cutoff BEFORE anyone runs a pruned dedup at 100 TB. Pruning
    * touches only candidate GENERATION (verification still scores
    * full sets), so a true pair survives cutoff D iff it shares at
    * least one shingle with df ≤ D — per pair that is ONE number,
    * its min shared-shingle df, so a single pass prices every
    * cutoff: the exact-Jaccard join carries df alongside the
    * intersection count, per-pair `min_df` rides the same
    * aggregation, and both curves then read off BOUNDED frames
    * (pairs grouped by min_df, shingles grouped by df) crossed with
    * the |cutoffs| model frame — never a per-cutoff corpus pass.
    * Probe-subset bounded like [[lshRecall]] (calibration runs on a
    * probe, the verdict transfers); exact integer ppm, Σdf² widened
    * at the term.
    */
  def dfPruneCurve(documents: DataFrame, tau: Double, docFilter: Column,
                   cutoffs: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L,
                     128L, 256L, 512L, 1024L),
                   n: Int = 3): DataFrame = {
    require(cutoffs.nonEmpty, "dfPruneCurve: no cutoffs")
    val spark = documents.sparkSession
    import spark.implicits._
    val sh = shingles(documents.filter(docFilter), n).localCheckpoint()
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val shdf = sh.join(df.hint("shuffle_hash"), Seq("shingle"))
    val pairs = shdf.as("a")
      .join(shdf.as("b").hint("shuffle_hash"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"), min(col("a.df")).as("min_df"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        Seq("doc_b"))
      .filter(round(col("common").cast("double") /
        (col("sz_a") + col("sz_b") - col("common")), 4) >= tau)
    val pm = pairs.groupBy("min_df").agg(count(lit(1)).as("n"))
    val dfm = df.groupBy("df").agg(count(lit(1)).as("n_sh"))
    val cut = cutoffs.toDF("cutoff")
    // left joins (not crossJoin) so every cutoff row survives an
    // empty pair set — a zero curve is a report, not a missing one
    val kept = cut.join(broadcast(pm), expr("true"), "left")
      .groupBy("cutoff")
      .agg(coalesce(sum(when(col("min_df") <= col("cutoff"), col("n"))
        .otherwise(0L)), lit(0L)).as("n_pairs_kept"))
    val cost = cut.join(broadcast(dfm), expr("true"), "left")
      .groupBy("cutoff")
      .agg(sum(when(col("df") <= col("cutoff"),
          expr("CAST(df AS DECIMAL(38,0)) * df * n_sh"))
        .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("cost_kept"))
    kept.join(cost, Seq("cutoff"))
      .crossJoin(broadcast(pairs.agg(count(lit(1)).as("n_total"))))
      .crossJoin(broadcast(dfm.agg(
        sum(expr("CAST(df AS DECIMAL(38,0)) * df * n_sh"))
          .as("cost_total"))))
      .select(col("cutoff"), col("n_pairs_kept"),
        expr("CASE WHEN n_total > 0 THEN CAST(CAST(n_pairs_kept " +
          "AS DECIMAL(38,0)) * 1000000 div n_total AS BIGINT) END")
          .as("recall_ppm"),
        expr("CASE WHEN cost_total > 0 THEN CAST(cost_kept * 1000000 " +
          "div cost_total AS BIGINT) END").as("cost_ppm"))
  }

  /** Exact dedup: group identical texts by content hash, keep the
    * lowest doc_id. Output is the deduplicated keeper set with
    * multiplicity — one map-side-combined shuffle on the hash.
    */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Pairwise shingle-set intersections over an exploded (doc_id,
    * shingle) frame — the shared inverted-index core of every
    * set-similarity operator here ([[ngramJaccard]], [[containment]],
    * [[graft.mm.Multimodal.binaryNearDup]]): self-equi-join on
    * shingle, per-pair intersection count, set sizes joined back.
    * Returns (doc_a, doc_b, common, sz_a, sz_b) with doc_a < doc_b;
    * cost is bounded by shingle collision counts, never all-pairs.
    */
  private[graft] def shingleIntersections(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("common"),
        col("sa.sz").as("sz_a"), col("sb.sz").as("sz_b"))
  }

  /** Exact n-gram Jaccard similarity via shingle inverted index:
    * explode → self-equi-join on shingle → per-pair intersection
    * count → |A∩B| / (|A|+|B|−|A∩B|). No cross join anywhere; cost
    * is bounded by shingle collision counts. `docFilter` bounds the
    * probe subset where an exact answer is wanted (oracle / small
    * corpus); pass `lit(true)` to run corpus-wide.
    */
  def ngramJaccard(documents: DataFrame, tau: Double, docFilter: Column,
                   n: Int = 3): DataFrame =
    shingleIntersections(shingles(documents.filter(docFilter), n))
      .select(col("doc_a"), col("doc_b"),
        round(col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")), 4).as("jaccard"))
      .filter(col("jaccard") >= tau)

  /** LSH recall CALIBRATION: exact-Jaccard ground-truth pairs on a
    * bounded probe subset, left-joined against the MinHash-LSH
    * candidate set, bucketed by 0.1-wide Jaccard bands — the
    * measured S-curve every LSH deployment validates before trusting
    * its (k, bands) parameters at 100 TB (theory gives the collision
    * probability; this measures it on YOUR corpus, where the
    * near-threshold bands are the ones that matter). The ground
    * truth is the probe-subset exact join ([[ngramJaccard]] — the
    * same bounded-oracle discipline as every exact twin here); the
    * candidate side is the full production LSH pipeline. Output is
    * ≤8 rows — bands floor(10·floorTau)..10 (rounded jaccard 1.0
    * floors into its own band 10): per band, true pairs, caught
    * pairs, recall.
    */
  def lshRecall(documents: DataFrame, docFilter: Column,
                floorTau: Double = 0.3,
                k: Int = 64, bands: Int = 16): DataFrame = {
    val truth = ngramJaccard(documents, floorTau, docFilter)
    val cand = minhashLsh(documents, floorTau, k, bands)
      .select(col("doc_a").as("c_a"), col("doc_b").as("c_b"))
    truth
      .join(cand.hint("shuffle_hash"),
        col("doc_a") === col("c_a") && col("doc_b") === col("c_b"), "left")
      .select(col("jaccard"), col("c_a").isNotNull.as("caught"))
      .groupBy(floor(col("jaccard") * 10).cast("long").as("j_band"))
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("caught"), 1L).otherwise(0L)).as("n_caught"))
      .withColumn("recall",
        round(col("n_caught").cast("double") / col("n_true"), 4))
  }

  /** Asymmetric shingle CONTAINMENT via the same inverted index as
    * [[ngramJaccard]]: |A∩B| / |A| — the quote/subset detector
    * Jaccard misses (a short doc wholly embedded in a long one has
    * tiny Jaccard but containment ≈ 1; web corpora are full of
    * quoted fragments and boilerplate supersets). Emits the ordered
    * pair once with both directions' ratios, kept when either side
    * reaches τ. Same scale posture as the Jaccard twin: equi-join on
    * shingle, cost bounded by collision counts, `docFilter` bounds
    * the probe subset for an exact answer (corpus-wide containment
    * at scale goes through LSH candidates first).
    */
  def containment(documents: DataFrame, tau: Double, docFilter: Column,
                  n: Int = 3): DataFrame =
    shingleIntersections(shingles(documents.filter(docFilter), n))
      .select(col("doc_a"), col("doc_b"),
        round(col("common").cast("double") / col("sz_a"), 4).as("cont_a_in_b"),
        round(col("common").cast("double") / col("sz_b"), 4).as("cont_b_in_a"))
      .filter(col("cont_a_in_b") >= tau || col("cont_b_in_a") >= tau)

  /** EXACT corpus-wide all-pairs Jaccard ≥ τ via PREFIX FILTERING
    * (the PPJoin family's candidate rule) — the exact complement of
    * [[minhashLsh]]: LSH is probabilistic (recall < 1, measured by
    * [[lshRecall]]), [[ngramJaccard]] is exact but joins on EVERY
    * shingle so its cost is Σ df² over shingle document frequencies —
    * at corpus scale the boilerplate shingles with huge df dominate
    * and blow the join up, which is why it runs on bounded probe
    * subsets. Prefix filtering keeps exactness AND prunes: order
    * each doc's shingles by global rarity (df asc, shingle asc — one
    * consistent total order), and join only on each doc's first
    * p = sz − ⌈τ·sz⌉ + 1 RAREST shingles. Any pair with J ≥ τ has
    * overlap ≥ ⌈τ·max(sz_a, sz_b)⌉, and two sets whose overlap is c
    * must collide within their first sz − c + 1 elements under ANY
    * shared total order — so every qualifying pair survives while
    * the hot boilerplate shingles (high df → ranked LAST) mostly
    * vanish from the join. Candidates are then verified with the
    * exact intersection restricted to candidate pairs (fan-out
    * Σ_cand sz_a, not Σ df²). All stages are keyed equi-joins: df is
    * one map-side-combined agg, rarity ranks one per-doc window, the
    * candidate join is keyed on the prefix shingle. The ⌈τ·sz⌉ is
    * computed with a −1e-9 guard so fp noise in τ·sz can only
    * LENGTHEN the prefix (extra candidates get verified away), never
    * shorten it into false negatives.
    */
  def prefixJaccard(documents: DataFrame, tau: Double, n: Int = 3): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau ($tau) must be in (0, 1]")
    // the OUTPUT contract keeps pairs whose 4dp-ROUNDED Jaccard
    // reaches τ, so candidate generation must cover true J down to
    // τ − 5e-5 (a pair at J = τ − 1e-5 rounds UP into the output);
    // widen by the full rounding half-width — the prefix only ever
    // gets longer, and over-generation is verified away
    val tauEff = math.max(tau - 1e-4, 1e-6)
    // the shingle frame feeds the df aggregation and the rarity
    // ranking; materialize it once — recomputing the shingling scan
    // dominates the job otherwise. (At cluster scale this is the
    // recompute-vs-persist knob: the exploded frame is ~n× the
    // corpus, and a preemptible fleet may prefer re-scanning
    // parquet; locally the blocks win.) The set size rides the
    // explode (`size` of the distinct shingle array) so the ranking
    // window does ONE pass — the former count-over-partition second
    // window pass is an aggregate the generator already knows.
    // hash-repartition BEFORE the shingling explode — the editDistance
    // discipline: parallelism is established on the 1×-corpus side of
    // the generator (one cheap shuffle of (doc_id, text)) instead of
    // inheriting the input split count (one task per parquet file
    // locally; a straggler per oversized split at scale). Explicit
    // AQE-exempt count (Rounds.cpuPartitions): the shingling kernel is
    // small-bytes/heavy-CPU, the shape byte-targeted coalescing
    // serializes onto one task.
    val cpuPar = graft.ops.Rounds.cpuPartitions(documents)
    val sh = documents.repartition(cpuPar, col("doc_id"))
      .select(col("doc_id"), shingleArray(col("text"), n).as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("long").as("sz"),
        explode(col("arr")).as("shingle"))
      .localCheckpoint()
    val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val wdoc = Window.partitionBy("doc_id")
    val ranked = sh.join(freq, "shingle")
      .withColumn("rk",
        row_number().over(wdoc.orderBy(col("df"), col("shingle"))))
    // prefix is joined as both candidate sides: materialize so the
    // scan+agg+join+window subtree above runs once, not twice
    // checkpointed ALREADY PARTITIONED on the join key `shingle` with
    // an explicit (AQE-exempt) count — both candidate sides below
    // reuse the stored partitioning (no exchange) and the self-join's
    // fan-out + partial-distinct, the operator's hottest CPU, runs at
    // cpuPar tasks (the editDistance discipline)
    val prefix = ranked
      .filter(col("rk") <=
        col("sz") - ceil(lit(tauEff) * col("sz") - lit(1e-9)) + 1)
      .select("doc_id", "shingle", "sz", "rk")
      .repartition(cpuPar, col("shingle"))
      .localCheckpoint()
    // POSITIONAL filter (the PPJoin upgrade to the plain prefix
    // rule): a collision at rarity positions (ra, rb) bounds the
    // pair's overlap by 1 + min(sz_a−ra, sz_b−rb) — everything
    // before the FIRST common token is disjoint under the shared
    // total order, so only the tails can still intersect. Filtering
    // every collision row by its own bound is lossless: a
    // qualifying pair's first collision carries the loosest (and
    // valid) bound and always survives; later collisions of the
    // same pair may be wrongly tight, but the pair is already in.
    val cand = prefix.as("pa")
      .join(prefix.as("pb"),
        col("pa.shingle") === col("pb.shingle") &&
          col("pa.doc_id") < col("pb.doc_id") &&
          lit(1) + least(col("pa.sz") - col("pa.rk"),
            col("pb.sz") - col("pb.rk")) >=
            ceil(lit(tauEff) * greatest(col("pa.sz"), col("pb.sz"))
              - lit(1e-9)))
      .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
      // explicit-count repartition ON the distinct keys: the distinct
      // reuses it (no extra exchange) and the jaccard verification
      // downstream inherits cpuPar tasks (the editDistance discipline)
      .repartition(cpuPar, col("doc_a"), col("doc_b"))
      .distinct()
      // pair-bounded frame with THREE verifyCandidates readers (both
      // endpoint sides + the join) — materialize so the prefix
      // self-join runs once, not per reference
      .localCheckpoint()
    // verification through the shared candidate-bounded kernel path
    // (semi-join text fetch + fused one-pass `jaccard_sim`) instead
    // of re-joining the corpus-wide inverted index twice by doc id:
    // the pair count is candidate-bounded, so the arrays it fetches
    // and the one shuffle it pays are too — the minhashLsh /
    // mergeKeepers verification discipline
    verifyCandidates(cand, documents, tau, n)
  }

  /** Banded MinHash signatures as a skinny (doc_id, band, band_hash)
    * frame — the LSH bucketing key of the whole near-dup family and
    * the only per-doc state [[mergeKeepers]] needs to probe an
    * existing corpus with a delta batch (16 longs per doc; the text
    * never rides it).
    */
  private[graft] def bandedSignatures(documents: DataFrame, k: Int,
                                      bands: Int): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    // repartition BEFORE the k-hash signature kernel — the heaviest
    // per-doc compute in the family must not run at input-split
    // parallelism (the editDistance discipline). Count deliberately
    // NOT pinned: the kernel is cheap per doc (measured ~0.1s on the
    // local corpus), so AQE coalescing small inputs onto few tasks is
    // correct — pinning 32 tasks here taxed every |delta|-bounded
    // mergeKeepers stage (dedup_incremental 3.5 → 6.2s); at corpus
    // scale the frame's bytes keep the stage parallel anyway.
    documents.repartition(col("doc_id"))
      .select(col("doc_id"),
        posexplode(minhash_bands(shingleArray(col("text")), k, bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** Exact-Jaccard verification of candidate pairs: fetch the two
    * shingle sets (computed only for rows that appear as endpoints —
    * the semi-join keeps the shingling cost candidate-bounded, which
    * is what lets [[mergeKeepers]] verify delta×base candidates
    * without re-shingling the base corpus) and keep pairs at
    * jaccard ≥ τ via the fused one-pass `jaccard_sim` kernel.
    */
  private[graft] def verifyCandidates(candidates: DataFrame,
                                      documents: DataFrame,
                                      tau: Double, n: Int = 3): DataFrame = {
    val ends = candidates.select(col("doc_a").as("doc_id"))
      .union(candidates.select(col("doc_b").as("doc_id"))).distinct()
    val docs = documents.join(ends.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shingleArray(col("text"), n).as("sh"))
    candidates
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(graft.functions.expressions.jaccard_sim(col("sh_a"), col("sh_b")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** MinHash + LSH banding: k-wide signature in one pass (custom
    * Catalyst expression), split into `bands` bands, bucket-join on
    * (band index, band hash) — the 100 TB-shaped near-dup path: the
    * only shuffle keys are band hashes. Candidates are then verified
    * with the true Jaccard of their shingle sets (fused one-pass
    * `jaccard_sim` kernel — no second join tree, no intermediate
    * intersect/union arrays).
    */
  def minhashLsh(documents: DataFrame, tau: Double, k: Int = 64,
                 bands: Int = 16): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    // repartition before the shingle+signature kernels (editDistance
    // discipline: parallelism set on the 1×-corpus side). Count NOT
    // pinned — see bandedSignatures: the kernel is cheap per doc and
    // pinned tasks taxed the small-corpus path more than they paid.
    val docs = documents.repartition(col("doc_id"))
      .select(col("doc_id"), shingleArray(col("text")).as("sh"))
    // band join stays skinny — (doc_id, band, band_hash) only; the
    // shingle arrays never ride the exploded x`bands` shuffle, and
    // the fused signature+banding expression runs exactly once per
    // doc (a composed sig-then-slice plan re-inlines the signature
    // into every band after project collapse)
    val banded = docs.select(col("doc_id"),
      posexplode(minhash_bands(col("sh"), k, bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // fetch shingle sets for the (few) candidates and verify exactly
    candidates
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(graft.functions.expressions.jaccard_sim(col("sh_a"), col("sh_b")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** CANDIDATE-SIMILARITY HISTOGRAM — the τ-calibration artifact for
    * the LSH dedup family ([[graft.sim.Similarity.thresholdPlan]]'s
    * text twin): the distribution of EXACT Jaccard over the LSH
    * candidate pairs, fixed-width bins over [0, 1]. The histogram's
    * valley — between the near-dup mass at the top and the band-
    * collision noise at the bottom — is where τ belongs; running
    * dedup at a τ nobody measured is how corpora lose good data or
    * keep templates. Cost: exactly [[minhashLsh]]'s candidate +
    * verify stages (τ = 0, keep everything) plus one bins-sized
    * aggregate; binning runs on the 4dp-ROUNDED jaccard so the bin
    * edges can never straddle a float differently per engine.
    */
  def jaccardHistogram(documents: DataFrame, bins: Int = 20): DataFrame = {
    require(bins > 0, s"bins ($bins) must be positive")
    minhashLsh(documents, tau = 0.0)
      .select(least(floor(col("jaccard") * bins), lit(bins - 1))
        .cast("long").as("bin"), col("jaccard"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_pairs"),
        round(min("jaccard"), 4).as("lo"),
        round(max("jaccard"), 4).as("hi"))
  }

  /** SimHash near-dup: 64-bit signature banded into `maxHamming+1`
    * chunks — a pair within the hamming radius must agree on at
    * least one chunk (pigeonhole), so the bucket join on (chunk,
    * value) is lossless for the verify filter `bit_count(xor) <= h`.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame =
    simhashCandidates(documents, maxHamming)
      .filter(col("hamming") <= maxHamming)

  /** The UNFILTERED banded candidate pairs with their exact hamming
    * distance — [[simhashPairs]] before its radius filter, shared
    * with the calibration histogram below. */
  private[graft] def simhashCandidates(documents: DataFrame,
                                       maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      "need at least 2 bits per chunk over a 64-bit signature")
    val nChunks = maxHamming + 1
    val width = 64 / nChunks // remainder bits join the last chunk
    // repartition BEFORE the signature kernel: per-doc hashing
    // parallelizes on the corpus side instead of inheriting the
    // input split count (the editDistance discipline). Count NOT
    // pinned — see bandedSignatures: the kernel is cheap per doc and
    // pinned tasks taxed the small-corpus path more than they paid.
    val sigs = documents.repartition(col("doc_id"))
      .select(col("doc_id"), simhash64(tokens(col("text"))).as("sig"))
    val chunked = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until nChunks).map { c =>
        val hi = if (c == nChunks - 1) 64 else (c + 1) * width
        val mask = if (hi - c * width == 64) -1L else (1L << (hi - c * width)) - 1
        shiftrightunsigned(col("sig"), c * width).bitwiseAND(lit(mask))
      }: _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** HAMMING-DISTANCE CALIBRATION histogram — [[jaccardHistogram]]'s
    * SimHash twin, completing the τ-calibration family: the
    * distribution of exact signature hamming over the banded
    * candidate pairs. The default radius 3 is a convention, not a
    * measurement — this is the measurement: near-dup mass sits at
    * low hamming, chunk-collision noise spreads high, and the valley
    * between them is where the radius belongs (the banding stays
    * pigeonhole-lossless only for pairs ≤ maxHamming, so mass
    * hugging the radius from below argues for MORE chunks, not just
    * a bigger radius). Cost: exactly [[simhashPairs]]' candidate
    * stage plus one ≤65-row aggregate.
    */
  def simhashHammingHist(documents: DataFrame, maxHamming: Int = 3): DataFrame =
    simhashCandidates(documents, maxHamming)
      .groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("within_radius", col("hamming") <= maxHamming)

  /** Exact-duplicate keeper assignment: every doc mapped to the
    * lowest doc_id sharing its content hash. The "drop duplicates,
    * keep one" endgame as a doc-level mapping — output is linear in
    * corpus size, unlike pair enumeration (which is quadratic in
    * duplicate-group size; see the 20x-duplicated stress note in
    * SURVEY §7).
    */
  def exactKeepers(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text")))
    documents.select(col("doc_id"),
      min("doc_id").over(w).as("keep_doc_id"))
      .withColumn("is_kept", (col("doc_id") === col("keep_doc_id")))
  }

  /** The materialized near-dup keeper ARTIFACT — the dedup twin of
    * [[graft.sim.Similarity.PcaModel]]'s fit-once/apply-many
    * contract. A production pipeline pays the corpus-scale
    * shingle + MinHash + band-join + verify + propagation pipeline
    * ONCE, then every downstream consumer (keeper mapping, cluster
    * sizes, per-source dup rates, soft dedup, leakage-safe split,
    * leak audit, curation manifest) rides the materialized frames:
    *
    *  - `banded`  — (doc_id, band, band_hash), the LSH bucket keys:
    *    the probe index [[mergeKeepers]] needs to absorb a delta
    *    batch without re-signaturing the corpus;
    *  - `pairs`   — verified candidate pairs (doc_a < doc_b,
    *    jaccard ≥ τ): the edge list and the leak audit's ground set;
    *  - `labels`  — (doc_id, keep_doc_id) for EVERY doc: the keeper
    *    mapping after `iters` pointer-doubling propagation rounds.
    *
    * All three are `localCheckpoint`-materialized at fit time (each
    * is skinny — ids and hashes, never text), so consumers start
    * from executor-resident frames with truncated lineage instead of
    * re-running candidate generation — previously 8 surface queries
    * each re-ran the full pipeline (~17% of bench wall-time; at
    * 100 TB, 8 corpus-scale passes where production pays one).
    */
  final case class KeeperModel(tau: Double, iters: Int, k: Int, bands: Int,
                               banded: DataFrame, pairs: DataFrame,
                               labels: DataFrame)

  /** Fit the near-dup [[KeeperModel]]: banded signatures → bucket
    * self-join candidates → exact-Jaccard verify → min-id label
    * propagation (pointer-doubling, `iters` rounds ≈ 2^iters chain
    * reach). Identical pair/keeper semantics to the one-shot
    * [[nearDupKeepers]] path — same expressions, same thresholds —
    * so oracles verified against the one-shot pipeline hold
    * unchanged against model-riding consumers.
    */
  def fitKeepers(documents: DataFrame, tau: Double = 0.9, iters: Int = 2,
                 k: Int = 64, bands: Int = 16): KeeperModel = {
    val banded = bandedSignatures(documents, k, bands).localCheckpoint()
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val pairs = verifyCandidates(cand, documents, tau)
      .select("doc_a", "doc_b").localCheckpoint()
    val labels = propagateLabels(
      mirror(pairs),
      documents.select(col("doc_id"), col("doc_id").as("lab")),
      iters, maximize = false)
      .select(col("doc_id"), col("lab").as("keep_doc_id"))
    KeeperModel(tau, iters, k, bands, banded, pairs, labels)
  }

  /** Incremental keeper maintenance — the `cdc_compact` merge
    * discipline applied to near-dup state: absorb a DELTA batch into
    * a fitted [[KeeperModel]] without recomputing the corpus.
    *
    * Three |delta|-scale stages, none touching base docs beyond
    * point lookups:
    *
    *  1. CANDIDATES — delta docs are signatured and LSH-probe the
    *     model's materialized band index, so candidate generation
    *     joins |delta|·bands rows against the index instead of
    *     re-banding the corpus; every candidate has a delta endpoint
    *     by construction (base×base pairs are already in the model).
    *  2. VERIFY — exact Jaccard fetches text only for candidate
    *     endpoints ([[verifyCandidates]]'s semi-join), so the base
    *     corpus is probed, never scanned.
    *  3. RELABEL — propagation re-runs only over TOUCHED clusters
    *     (every cluster containing a base endpoint of an accepted new
    *     pair, pulled whole via the label frame — cluster closure: a
    *     converged model's edges never straddle keeper clusters) plus
    *     the delta docs; untouched labels pass through byte-identical.
    *
    * Within the propagation radius (chains ≲ 2^iters),
    * `mergeKeepers(fitKeepers(a), a, b) ≡ fitKeepers(a ∪ b)` — the
    * associativity contract (spec-pinned, and asserted end-to-end by
    * the dedup_incremental oracle, whose DuckDB twin replays the
    * FULL-corpus fit) that lets a 100 TB corpus absorb daily ingest
    * for the price of the ingest. Requires delta doc_ids disjoint
    * from the base corpus (ingest batches are new docs by contract).
    */
  def mergeKeepers(model: KeeperModel, baseDocs: DataFrame,
                   delta: DataFrame): KeeperModel = {
    // at-least-once ingest re-delivering a base doc would silently
    // duplicate its band rows and verified pairs in the model — fail
    // loudly instead (the nearDupKeepersBest packing-guard
    // discipline); the check is one |delta|-bounded semi-join probe
    // of the skinny label frame. It runs CONCURRENTLY with the delta
    // signature checkpoint (guide §2.6: overlap independent jobs —
    // the two share no inputs, and Spark schedules driver-thread
    // jobs side by side); the require still fires before any result
    // derived from the merge is returned, so the fail-loudly
    // contract is intact — a failing merge merely wastes the
    // signature job it would have paid anyway on the happy path.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val overlapF = Future(model.labels
      .join(delta.select("doc_id").hint("shuffle_hash"),
        Seq("doc_id"), "left_semi")
      .limit(1).collect())
    val deltaBanded = bandedSignatures(delta, model.k, model.bands)
      .localCheckpoint()
    val overlap = Await.result(overlapF, Duration.Inf)
    require(overlap.isEmpty,
      s"mergeKeepers: delta re-delivers base doc_id ${overlap.head.get(0)}" +
        " — deltas must be new docs (dedupe upstream or diff against" +
        " the model's labels first)")
    val banded = model.banded.unionByName(deltaBanded)
    // probe side is delta-only: every candidate touches the delta.
    // The hint marks the hash-join BUILD side — it must sit on the
    // |delta|-scale frame, not the corpus-scale band index (building
    // the index would materialize the whole corpus per task)
    val cand = deltaBanded.hint("shuffle_hash").as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct().localCheckpoint()
    // the other direction of the disjointness contract: every base
    // endpoint of a candidate must be present in the caller-supplied
    // baseDocs, or verifyCandidates' text join would silently DROP
    // the pair (a merge run against a partial corpus slice would
    // quietly diverge from the full fit) — candidate-bounded check
    // same overlap discipline as the re-delivery probe: the coverage
    // check and the verification job both read only the materialized
    // `cand` frame (plus their own side inputs), so they run side by
    // side; the require fires before the verified pairs are used, so
    // a partial-corpus call still fails loudly before the model can
    // silently diverge
    val uncoveredF = Future(cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id")))
      .join(delta.select("doc_id"), Seq("doc_id"), "left_anti")
      .join(baseDocs.select("doc_id").hint("shuffle_hash"),
        Seq("doc_id"), "left_anti")
      .limit(1).collect())
    val newPairs = verifyCandidates(cand, baseDocs.unionByName(delta),
        model.tau)
      .select("doc_a", "doc_b").localCheckpoint()
    val uncovered = Await.result(uncoveredF, Duration.Inf)
    require(uncovered.isEmpty,
      s"mergeKeepers: baseDocs is missing candidate endpoint doc_id " +
        s"${uncovered.head.get(0)} — pass the full accumulated corpus," +
        " not a slice")
    // banded/pairs stay LAZY unions over immutable checkpointed
    // segments (base frames + this delta's) — re-checkpointing the
    // union would rewrite the full corpus-scale signature index on
    // every merge, turning O(|delta|) maintenance back into O(corpus)
    // I/O; successive merges stack segments LSM-style (union plans
    // grow one leaf per merge, each leaf lineage-truncated)
    val pairs = model.pairs.unionByName(newPairs)
    // touched set = whole clusters of any new-pair endpoint + delta;
    // pulled via two skinny semi-joins over the label frame
    val ends = newPairs.select(col("doc_a").as("doc_id"))
      .union(newPairs.select(col("doc_b").as("doc_id"))).distinct()
    val touchedKeepers = model.labels
      .join(ends.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
      .select("keep_doc_id").distinct()
    val touchedBase = model.labels
      .join(touchedKeepers.hint("shuffle_hash"), Seq("keep_doc_id"),
        "left_semi")
      .select("doc_id")
    val nodes = touchedBase.union(delta.select("doc_id")).distinct()
      .localCheckpoint()
    // edge restriction is an efficiency move only — propagateLabels
    // structurally ignores edges with an endpoint outside `nodes`
    // (its joins are keyed on the label frame) — but it keeps every
    // relabel round |touched|-scale instead of corpus-edge-scale
    val subEdges = pairs
      .join(nodes.withColumnRenamed("doc_id", "doc_a")
        .hint("shuffle_hash"), Seq("doc_a"), "left_semi")
    val relabeled = propagateLabels(
      mirror(subEdges),
      nodes.select(col("doc_id"), col("doc_id").as("lab")),
      model.iters, maximize = false)
      .select(col("doc_id"), col("lab").as("keep_doc_id"))
    // labels ARE re-checkpointed: every consumer projects the full
    // frame, the anti-join would otherwise re-run per consumer, and
    // at 2 longs/doc it's the model's cheapest frame
    val labels = model.labels
      .join(nodes.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
      .unionByName(relabeled)
      .localCheckpoint()
    KeeperModel(model.tau, model.iters, model.k, model.bands,
      banded, pairs, labels)
  }

  /** Persist a [[KeeperModel]] as a versioned parquet artifact —
    * what turns [[mergeKeepers]] into a cross-JOB maintenance loop:
    * `localCheckpoint` frames die with the session, but daily ingest
    * means tomorrow's job must load yesterday's model, merge the new
    * batch, and publish the result. Layout is
    * `dir/v=<version>/{banded,pairs,labels,meta}` published by
    * atomic rename of a hidden staging directory (the
    * [[graft.streaming.StateTable]] discipline: a concurrent reader
    * can never list a half-written model, and versions are
    * immutable). An existing `v=<version>` is left untouched —
    * replaying a failed job republishes the same deterministic
    * content, so skipping IS the idempotent commit.
    *
    * Save is also the COMPACTION point: [[mergeKeepers]] leaves
    * `banded`/`pairs` as lazy unions over per-merge segments (so a
    * merge never rewrites the corpus-scale index), and writing the
    * model flattens those segments into one parquet dir — load then
    * starts the next day from a single-segment model.
    */
  import graft.ops.VersionedStore

  def saveKeepers(model: KeeperModel, dir: String, version: Long): Unit = {
    val spark = model.labels.sparkSession
    VersionedStore.commit(spark, dir, s"v=$version") { staging =>
      model.banded.write.parquet(s"$staging/banded")
      model.pairs.write.parquet(s"$staging/pairs")
      model.labels.write.parquet(s"$staging/labels")
      import spark.implicits._
      Seq((model.tau, model.iters, model.k, model.bands))
        .toDF("tau", "iters", "k", "bands").coalesce(1)
        .write.parquet(s"$staging/meta")
    }: Unit
  }

  /** Latest persisted model version under `dir`, if any. Non-version
    * directories (backups, temp dirs) are ignored, not tripped over. */
  def latestKeeperVersion(spark: org.apache.spark.sql.SparkSession,
                          dir: String): Option[Long] =
    VersionedStore.listVersions(spark, dir, "v=").maxOption

  /** Load a persisted [[KeeperModel]] (latest version unless pinned).
    * Frames come back `localCheckpoint`-materialized, so a loaded
    * model serves consumers exactly like a freshly fitted one.
    */
  def loadKeepers(spark: org.apache.spark.sql.SparkSession, dir: String,
                  version: Option[Long] = None): KeeperModel = {
    val v = version.orElse(latestKeeperVersion(spark, dir)).getOrElse(
      throw new java.io.FileNotFoundException(s"no keeper model under $dir"))
    val base = s"$dir/v=$v"
    val meta = spark.read.parquet(s"$base/meta").head()
    KeeperModel(meta.getAs[Double]("tau"), meta.getAs[Int]("iters"),
      meta.getAs[Int]("k"), meta.getAs[Int]("bands"),
      spark.read.parquet(s"$base/banded").localCheckpoint(),
      spark.read.parquet(s"$base/pairs").localCheckpoint(),
      spark.read.parquet(s"$base/labels").localCheckpoint())
  }

  /** Keeper mapping from a fitted model: zero pipeline cost — one
    * projection over the materialized label frame. */
  def nearDupKeepers(model: KeeperModel): DataFrame =
    model.labels
      .withColumn("is_kept", col("doc_id") === col("keep_doc_id"))

  /** Near-duplicate keeper assignment: LSH candidate pairs become
    * edges; representatives are found by min-id label propagation
    * with a pointer-doubling shortcut, so `iters` rounds cover
    * duplicate chains ~2^iters deep (duplicate sets from banding are
    * (near-)cliques — one round merges them — but template families
    * chain A≈B≈C… beyond any fixed radius, and a chain split across
    * keepers would also split across [[graft.ops.Sampling]]'s
    * leakage-safe train/val boundary: the exact leak that split
    * exists to prevent). Each round is one keyed join plus one
    * label-keyed shortcut join — the standard large-scale
    * connected-components shape ([[graft.ops.Graph.componentSizes]]).
    * One-shot convenience over [[fitKeepers]]; pipelines with more
    * than one keeper consumer should fit the model once instead.
    */
  def nearDupKeepers(documents: DataFrame, tau: Double, iters: Int = 2,
                     k: Int = 64, bands: Int = 16): DataFrame =
    nearDupKeepers(fitKeepers(documents, tau, iters, k, bands))

  /** Near-dup cluster-size distribution: how much duplication the
    * corpus carries, as a histogram over keeper-cluster sizes — the
    * first number a dedup report leads with ("X% of docs sit in
    * clusters of ≥2") and the input the repetition-aware sampler
    * ([[graft.ops.Sampling.softDedup]]) prices against. Two
    * map-side-combinable aggregations over the keeper mapping: per
    * keeper → cluster size, per size → cluster count; output is
    * bounded by the largest cluster, never corpus size.
    */
  def clusterSizes(documents: DataFrame, tau: Double = 0.9,
                   iters: Int = 2): DataFrame =
    clusterSizes(fitKeepers(documents, tau, iters))

  /** [[clusterSizes]] over a fitted [[KeeperModel]] — two bounded
    * aggregations over the materialized label frame, no pipeline. */
  def clusterSizes(model: KeeperModel): DataFrame =
    model.labels
      .groupBy(col("keep_doc_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))

  /** DUPLICATION × QUALITY contingency — the joint answer to "are
    * the duplicated documents also the low-quality ones?", which
    * decides whether dedup and quality filtering are redundant cuts
    * or orthogonal ones (if near-dup families concentrate in the
    * bottom quality bands, the quality gate already removes most of
    * them and the dedup budget should go to the crafty high-quality
    * templates instead). Each doc carries its keeper-cluster size
    * class (unique / small 2–3 / large 4+) and its integer-basis-
    * point quality band (q_bp div 2500, the shared
    * [[graft.text.TextAnalysis.qualityBpFrame]] scorer); the output
    * is the size×band matrix with each cell's within-class share in
    * ppm (DECIMAL-widened). Two hash-joins on doc-keyed frames + one
    * aggregate to a ≤12-row matrix.
    */
  def qualityCross(model: KeeperModel, documents: DataFrame): DataFrame = {
    val sizes = model.labels.groupBy("keep_doc_id")
      .agg(count(lit(1)).as("csz"))
    val q = graft.text.TextAnalysis.qualityBpFrame(documents)
      .select(col("doc_id"), col("q_bp"))
    val cells = model.labels
      .join(sizes.hint("shuffle_hash"), "keep_doc_id")
      .join(q.hint("shuffle_hash"), "doc_id")
      .select(
        when(col("csz") === 1, "unique")
          .when(col("csz") <= 3, "small").otherwise("large")
          .as("size_class"),
        expr("least(q_bp div 2500, 3L)").as("q_band"))
      .groupBy("size_class", "q_band").agg(count(lit(1)).as("n_docs"))
      .localCheckpoint() // matrix + class totals both read it
    val totals = cells.groupBy("size_class")
      .agg(sum("n_docs").as("class_total"))
    cells.join(broadcast(totals), Seq("size_class"))
      .select(col("size_class"), col("q_band"), col("n_docs"),
        col("class_total"),
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000 " +
          "div class_total AS BIGINT)").as("share_ppm"))
  }

  /** Per-SOURCE duplication report: each source's doc count, docs
    * sitting in near-dup clusters of ≥2, and the duplication rate —
    * the table that says WHICH ingest source is template-heavy (the
    * actionable form of [[clusterSizes]]: a 30% dup-rate source gets
    * its extractor fixed; a corpus-wide histogram doesn't say where
    * to look). One extra doc-keyed join of the keeper mapping onto
    * the source column; output is |sources| rows.
    */
  def dupRateBySource(documents: DataFrame, tau: Double = 0.9,
                      iters: Int = 2): DataFrame =
    dupRateBySource(documents, fitKeepers(documents, tau, iters))

  /** [[dupRateBySource]] over a fitted [[KeeperModel]]: one size
    * aggregation + two doc-keyed joins, no pipeline. */
  def dupRateBySource(documents: DataFrame, model: KeeperModel): DataFrame = {
    val labels = model.labels
    val sizes = labels.groupBy("keep_doc_id")
      .agg(count(lit(1)).as("cluster_size"))
    labels
      .join(sizes.hint("shuffle_hash"), Seq("keep_doc_id"))
      .join(documents.select(col("doc_id"), col("source"))
        .hint("shuffle_hash"), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cluster_size") > 1L, 1L).otherwise(0L))
          .as("n_in_dup_clusters"))
      .withColumn("dup_rate",
        round(col("n_in_dup_clusters").cast("double") / col("n_docs"), 4))
  }

  /** LSH banding calibration table: for every power-of-two band count
    * dividing the signature length, the S-curve constants that decide
    * whether that layout fits a target threshold — `s50 = (1/b)^(1/r)`
    * (the similarity at 50% detection probability) and the detection
    * probability at `tau` itself, `1 − (1 − tau^r)^b`. The row whose
    * s50 sits closest to `tau` (6dp, the repo's float-compare grain)
    * is flagged `chosen` — what [[dedup_lsh_recall]] MEASURES
    * empirically, this PREDICTS from the banding theorem, so a
    * deployer picks (k, bands) before paying a corpus pass. A
    * |divisors|-row model-constant frame: no corpus scan, no window,
    * the min rides a single-row broadcast.
    */
  def bandingPlan(spark: SparkSession, tau: Double = 0.9,
                  k: Int = 64): DataFrame = {
    require(k > 0 && (k & (k - 1)) == 0, s"k ($k) must be a power of two")
    import spark.implicits._
    val base = (0 to 30).map(1 << _).filter(_ <= k).map(_.toLong).toSeq
      .toDF("bands")
      // `/` on longs is double division in Spark; the quotient of two
      // powers of two is exact in binary64, so the cast is lossless
      .select(col("bands"),
        (lit(k.toLong) / col("bands")).cast("long").as("rows_per_band"))
      .select(col("bands"), col("rows_per_band"),
        round(pow(lit(1.0) / col("bands"),
          lit(1.0) / col("rows_per_band")), 6).as("s50"),
        round(lit(1.0) - pow(lit(1.0) - pow(lit(tau),
          col("rows_per_band")), col("bands")), 6).as("p_detect_at_tau"))
      .withColumn("s50_err", round(abs(col("s50") - tau), 6))
    base
      .crossJoin(broadcast(base.agg(min("s50_err").as("min_err"))))
      .select(col("bands"), col("rows_per_band"), col("s50"),
        col("p_detect_at_tau"),
        (col("s50_err") === col("min_err")).as("chosen"))
  }

  /** Cross-source duplication flow: verified near-dup PAIRS bucketed
    * by the (unordered) source pair of their endpoints — which
    * sources copy from each other, vs which duplicate internally.
    * [[dupRateBySource]] says how template-heavy each source is;
    * this says where the templates travel (a heavy off-diagonal cell
    * means two feeds share a common upstream — drop one, or fix the
    * provenance). Rides the fitted [[KeeperModel]]'s checkpointed
    * pair list: two doc-keyed hash joins + one aggregation bounded
    * by |sources|², no pipeline re-run; the share denominator is a
    * second aggregation over that tiny grouped frame.
    */
  def crossSourceDupFlow(documents: DataFrame,
                         model: KeeperModel): DataFrame = {
    val srcs = documents.select(col("doc_id"), col("source"))
    val counts = model.pairs
      .join(srcs.select(col("doc_id").as("doc_a"), col("source").as("sa"))
        .hint("shuffle_hash"), "doc_a")
      .join(srcs.select(col("doc_id").as("doc_b"), col("source").as("sb"))
        .hint("shuffle_hash"), "doc_b")
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
    counts
      .crossJoin(broadcast(counts.agg(sum("n_pairs").as("n_total"))))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        (col("source_a") =!= col("source_b")).as("is_cross"),
        round(col("n_pairs").cast("double") / col("n_total"), 4)
          .as("pair_share"))
  }

  /** Both directions of an ordered pair list — the undirected edge
    * form label propagation consumes. */
  private[graft] def mirror(pairs: DataFrame): DataFrame =
    pairs.select("doc_a", "doc_b")
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))

  /** Bounded-iteration label propagation shared by both keeper
    * elections: each round takes the min (or max) label over a
    * node's neighborhood and itself, then POINTER-DOUBLES — adopts
    * the label of the node its label names (`decode` recovers that
    * node id from a packed label) — so reach grows ~2× per round
    * (R_r = 2·R_{r−1}+1) and `iters` rounds cover chains ~2^iters
    * deep, the only radius that survives template families at
    * 100 TB. Shuffled-hash hints: the loop re-joins every round, and
    * a sort-merge would re-sort both sides each iteration — hash
    * exchanges on doc_id are all the distribution it needs. The
    * shortcut references the round's frame TWICE, so the unresolved
    * plan would double every round (2^iters subplans — the
    * [[graft.ops.Graph.componentSizes]] lesson); per-round
    * localCheckpoint truncates lineage on the executors.
    */
  private[graft] def propagateLabels(edges: DataFrame, init: DataFrame,
                                     iters: Int, maximize: Boolean,
                                     decode: Column => Column = identity): DataFrame = {
    val aggFn = if (maximize) max(col("lab")) else min(col("lab"))
    val combine: (Column, Column) => Column =
      if (maximize) (a, b) => greatest(a, b) else (a, b) => least(a, b)
    // materialize the edge list ONCE before the loop: every round's
    // propagate join re-reads it, and with per-round label
    // checkpoints there is no single plan left for exchange reuse to
    // dedupe the (expensive) candidate-generation lineage across
    // rounds — without this the LSH pipeline re-executes per round
    // (measured 6x on the keeper bench entries). Pre-partitioned on
    // doc_b — every round's propagate join key — so no round
    // re-exchanges the edge frame (the componentLabels discipline;
    // checkpoint preserves partitioning, count follows
    // spark.sql.shuffle.partitions)
    val e = graft.ops.Rounds.materialize(edges.repartition(col("doc_b")))
    // checkpointed init keeps each round a join of materialized frames
    var labels = graft.ops.Rounds.materialize(init)
    var converged = false
    var round = 0
    while (round < iters && !converged) {
      val neighborAgg = e
        .join(labels.hint("shuffle_hash"), e("doc_b") === labels("doc_id"))
        .groupBy(e("doc_a").as("doc_id"))
        .agg(aggFn.as("nbr"))
      val prop = labels.as("l")
        .join(neighborAgg.as("n").hint("shuffle_hash"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("lab").as("lab0"),
          combine(col("lab"), coalesce(col("nbr"), col("lab"))).as("lab"))
      // the shortcut references prop TWICE, so the unresolved plan
      // doubles per round (2^iters subplans — analysis explodes at
      // ~2^6); truncate lineage every round. The label frame is one
      // row per doc, so the eager materialization is cheap — measured
      // FASTER than letting exchange reuse dedupe the doubled plan
      // even at iters=2 (0.99s vs 1.27s on the keeper bench entry).
      // Fixpoint early exit (the componentSizes discipline): labels
      // move monotonically toward the combine direction, so an
      // unchanged round proves the rest are no-ops — bit-identical
      // results, and the changed-count rides the checkpoint job as an
      // observed metric instead of a separate per-round action
      val (next, changed) = graft.ops.Rounds.materializeChanged(prop.as("p")
        .join(prop.select(col("doc_id").as("lnode"), col("lab").as("lab2"))
          .hint("shuffle_hash"), decode(col("p.lab")) === col("lnode"), "left")
        .select(col("p.doc_id").as("doc_id"),
          combine(col("p.lab"), coalesce(col("lab2"), col("p.lab"))).as("lab"),
          col("p.lab0").as("lab0"))
        .select(col("doc_id"), col("lab"),
          (col("lab") =!= col("lab0")).as("chg")))
      round += 1
      converged = changed == 0L
      labels = next
    }
    labels
  }

  private val Pack = 281474976710656L // 2^48

  /** Near-duplicate keeper election by QUALITY: like
    * [[nearDupKeepers]], but each cluster keeps its HIGHEST-QUALITY
    * member (integer-bp text quality, lower doc_id as tiebreak)
    * instead of its lowest id — what a production dedup wants: keep
    * the best copy, drop the rest. The propagated label packs
    * (q_bp, ~doc_id) into one BIGINT so max-propagation carries the
    * score and the deterministic tiebreak in a single comparison;
    * everything else (LSH edges, bounded iterations, shuffled-hash
    * loop joins, linear output) is the min-label operator unchanged.
    * Requires doc_id < 2^48 (the packed tiebreak field).
    */
  def nearDupKeepersBest(documents: DataFrame, tau: Double, iters: Int = 2,
                         k: Int = 64, bands: Int = 16): DataFrame =
    nearDupKeepersBest(documents, fitKeepers(documents, tau, iters, k, bands))

  /** [[nearDupKeepersBest]] over a fitted [[KeeperModel]]: the
    * quality-weighted election rides the model's materialized edge
    * list (the expensive half of the pipeline — shared with the
    * min-id election), paying only its own `iters` propagation
    * rounds over the packed quality labels.
    */
  def nearDupKeepersBest(documents: DataFrame, model: KeeperModel): DataFrame = {
    // runtime guards on the packing contract: a doc_id outside
    // [0, 2^48) would silently corrupt the tiebreak field (fail
    // loudly instead), and a null q_bp (empty doc) must not poison
    // max-propagation with a null label — an empty doc scores 0
    val id = when(col("doc_id") >= 0 && col("doc_id") < Pack, col("doc_id"))
      .otherwise(raise_error(concat(
        lit("nearDupKeepersBest: doc_id outside packable [0, 2^48): "),
        col("doc_id").cast("string"))))
    val init = graft.text.TextAnalysis.qualityBpFrame(documents)
      .select(col("doc_id"),
        (coalesce(col("q_bp"), lit(0L)) * Pack + (lit(Pack - 1) - id)).as("lab"))
    val labels = propagateLabels(
      mirror(model.pairs), init, model.iters, maximize = true,
      decode = lab => lit(Pack - 1) - (lab % Pack))
    labels.select(col("doc_id"),
        (lit(Pack - 1) - (col("lab") % Pack)).as("keep_doc_id"))
      .withColumn("is_kept", col("doc_id") === col("keep_doc_id"))
  }

  /** Embedding-cosine near-dup over a bounded probe subset (exact
    * all-pairs — the oracle for [[graft.sim.Similarity.annLsh]];
    * corpus-wide near-dup at scale goes through LSH buckets instead).
    */
  def embedNearDup(embeddings: DataFrame, tau: Double,
                   docFilter: Column): DataFrame = {
    val sub = embeddings.filter(docFilter)
      .select(col("vec_id"), col("embedding"))
    sub.as("a")
      .join(sub.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine_sim(col("a.embedding"), col("b.embedding")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): pairwise
    * cosine is computed only WITHIN each semantic cluster (`label`),
    * and a vector is dropped when some lower-id vector of the same
    * cluster sits within cosine ≥ `tau` of it. Per-vector output:
    * the max cosine to any prior same-cluster vector and the keep
    * decision — linear in the corpus, like the other keeper APIs.
    *
    * Scale shape: the all-pairs step is confined to cluster cells,
    * exactly as the paper confines it to k-means cells — cell size is
    * a clustering knob (a model constant), not a function of corpus
    * size, so the per-cell quadratic never grows with SF. The join is
    * an equi-join on label; embeddings shuffle once per side.
    */
  def semDedup(embeddings: DataFrame, tau: Double): DataFrame = {
    val v = embeddings.select(col("vec_id"), col("label"), col("embedding"))
    val prior = v.as("a")
      .join(v.select(col("vec_id").as("o_id"), col("label"),
        col("embedding").as("o_emb")).as("b"), Seq("label"))
      .filter(col("o_id") < col("vec_id"))
      .groupBy("vec_id")
      // round BEFORE the τ compare, mirroring embedNearDup's oracle
      // discipline: both engines threshold the same 6dp number
      .agg(round(max(cosine_sim(col("embedding"), col("o_emb"))), 6)
        .as("max_prior_cos"))
    // shuffle_hash: without the hint this equi-join on vec_id plans
    // as a SortMergeJoin — both sides would fully sort for a join
    // whose build side is an already-aggregated, strictly smaller set
    v.select(col("vec_id"), col("label"))
      .join(prior.hint("shuffle_hash"), Seq("vec_id"), "left_outer")
      .withColumn("kept", coalesce(col("max_prior_cos") < tau, lit(true)))
  }

  /** EXACT corpus-wide EDIT-DISTANCE join: all pairs with character
    * Levenshtein distance ≤ k — the typo/near-verbatim regime
    * Jaccard is blunt on (one swapped word barely moves a shingle
    * set; five scattered character edits sink it) and the standard
    * fuzzy-match primitive for template drift and OCR noise.
    *
    * Ed-Join candidate rule (the [[prefixJaccard]] discipline moved
    * from set overlap to edit operations): one edit touches at most
    * q positional q-grams, so it can destroy at most q DISTINCT
    * grams from a string's q-gram set — two strings within distance
    * k therefore share at least max(|A'|, |B'|) − k·q DISTINCT
    * grams — and under ANY shared total order two sets with overlap
    * c collide inside their first sz − c + 1 elements: prefix
    * length k·q + 1, a CONSTANT. Rarity order (df asc) makes the
    * joined prefix grams the corpus's coldest keys, so hot
    * boilerplate grams never drive the join's Σ df². The length
    * band |len_a − len_b| ≤ k rides the join (ed ≥ length
    * difference). Candidates verify with the built-in banded
    * `levenshtein(a, b, k)` kernel (O(k·len) per pair, −1 past the
    * threshold — never the full DP matrix).
    *
    * Strings too short for the gram machinery (threshold
    * max(len) − (q−1) − k·q ≤ 0 admits everything) take an explicit
    * SHORT ARM: all length-banded pairs where BOTH sides have
    * len ≤ q−1+k·q — a constant-length regime joined on exploded
    * length keys, never a cartesian. The arms are disjoint (the gram
    * arm requires max(len) > q−1+k·q), so no cross-arm dedup runs.
    *
    * Oracle: the UNFILTERED brute-force length-banded all-pairs
    * `levenshtein` join — a survived hash compare certifies the
    * candidate rule lost zero pairs.
    */
  def editDistance(documents: DataFrame, k: Int = 5, q: Int = 3): DataFrame = {
    require(k >= 0, s"k ($k) must be non-negative")
    require(q >= 1, s"q ($q) must be positive")
    val shortMax = q - 1 + k * q
    // SKINNY checkpoint only (doc_id, len) — the family discipline:
    // persisted frames hold ids/lengths/hashes, never corpus text.
    // Text is re-read from the source where needed (the gram explode
    // once, each verify side once): two extra columnar scans beat an
    // executor-memory-resident full-text corpus at 100 TB
    val dl = documents
      .select(col("doc_id"), length(col("text")).as("len"))
      .localCheckpoint()
    val txt = documents.select(col("doc_id"), col("text"))
    // DISTINCT q-grams from the one-pass char_gram_set kernel — the
    // text never rides the exploded frame (the dup_spans discipline)
    // and no per-(doc, gram) occurrence index is ever materialized:
    // the candidate rule works on distinct-gram SETS. One edit
    // destroys at most q gram OCCURRENCES, hence at most q DISTINCT
    // grams from either side's set, so ed(a,b) ≤ k implies
    // |A'∩B'| ≥ max(|A'|,|B'|) − k·q — and under ANY shared total
    // order two sets with overlap c collide inside their first
    // sz − c + 1 elements: prefix length k·q + 1, the same constant
    // as the multiset rule, without the per-(doc, gram) occurrence
    // window (a full corpus-frame sort shuffle) the multiset
    // elements required. When max − k·q ≤ 0 both prefixes hold the
    // WHOLE sets and the multiset count bound (> 0 in the gram arm,
    // where max occurrences > k·q) still forces a shared VALUE, so
    // the rule stays lossless in the degenerate repeat-heavy regime
    // (spec-pinned). Over-generation relative to the multiset rule
    // is verified away by the banded levenshtein like every other
    // candidate.
    // hash-repartition BEFORE the explode: the gram pipeline's
    // parallelism is set here, on the 1×-corpus side of the
    // generator, where a shuffle is cheapest (guide §8: move the
    // light rows, not the exploded ones) — without it the explode,
    // the df partial aggregation and the per-doc heaps all run at
    // the incidental parallelism of the input split count (ONE task
    // for a single parquet file locally; a straggler per oversized
    // split at scale). The count is EXPLICIT (Rounds.cpuPartitions —
    // conf-scaled, not hard-coded): AQE coalesces by BYTES, and this
    // stage is small-bytes/heavy-CPU, exactly the shape byte-targeted
    // coalescing serializes onto one task.
    val cpuPar = graft.ops.Rounds.cpuPartitions(documents)
    val gramsD = txt.repartition(cpuPar, col("doc_id"))
      .withColumn("len", length(col("text")))
      .filter(col("len") >= q)
      .select(col("doc_id"), col("len"),
        explode(graft.functions.expressions.char_gram_set(col("text"), q))
          .as("g"))
      // the df aggregate and the rarity-ranking join both read it
      .localCheckpoint()
    // df over distinct-gram postings; the q-gram vocabulary is
    // alphabet-bounded (≤ |Σ|^q — a model-sized frame by
    // construction, NOT corpus-scale), so the rarity table
    // broadcasts at any corpus size and the ranking join never
    // shuffles the gram frame
    val freq = gramsD.groupBy("g").agg(count(lit(1)).as("df"))
    // keep the constant k·q+1 rarest grams per doc on the native
    // top-k heaps — the window formulation sorted every doc's full
    // gram set per partition; both candidate sides read the result
    // the prefix frame is checkpointed ALREADY PARTITIONED on the
    // join key `g` with an explicit (AQE-exempt) count: both sides
    // of the candidate self-join below then reuse the stored
    // partitioning — no exchange, and the join's 5-6× fan-out +
    // partial-distinct (the operator's hottest CPU) runs at cpuPar
    // tasks instead of the 1-2 a byte-targeted coalesce gives it
    val prefix = graft.plans.TopK.perKey(
        gramsD.join(broadcast(freq), Seq("g")),
        Seq("doc_id"), Seq(col("df").asc, col("g").asc), k * q + 1)
      .select("doc_id", "len", "g")
      .repartition(cpuPar, col("g"))
      .localCheckpoint()
    val gramCand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.g") === col("b.g") &&
          col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.len") - col("b.len")) <= k &&
          // pairs entirely inside the short regime belong to the
          // short arm — keeps the two arms disjoint
          greatest(col("a.len"), col("b.len")) > shortMax)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      // explicit-count repartition ON the distinct keys: the final
      // distinct reuses it (no extra exchange) and the banded
      // levenshtein verify downstream — the other CPU-dense stage —
      // inherits cpuPar tasks instead of a 1-task coalesced exchange
      .repartition(cpuPar, col("doc_a"), col("doc_b"))
      .distinct()
    // short arm: exploded length keys manufacture the band equi-join
    // (each left doc emits len−k..len+k; the right key len is unique
    // per doc, so each unordered pair arises exactly once after the
    // id-order filter)
    val shortD = dl.filter(col("len") <= shortMax)
    val shortCand = shortD
      .select(col("doc_id").as("doc_a"),
        explode(sequence(col("len") - k, col("len") + k)).as("lk"))
      .join(shortD.select(col("doc_id").as("doc_b"), col("len").as("lk")),
        Seq("lk"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    gramCand.unionByName(shortCand)
      .join(txt.select(col("doc_id").as("doc_a"), col("text").as("ta")),
        Seq("doc_a"))
      .join(txt.select(col("doc_id").as("doc_b"), col("text").as("tb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr(s"levenshtein(ta, tb, $k)").cast("long").as("dist"))
      .filter(col("dist") >= 0)
  }
}
