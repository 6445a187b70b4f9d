package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training
  * pipelines. Assignment is a pure function of a content/id hash —
  * stable across runs, partitionings, and engines (md5-based, so any
  * system can reproduce the split), which is what makes holdout sets
  * trustworthy at 100 TB: no sampling state, no seed coordination.
  */
object Sampling {

  /** Split assignment from the first hex digit of md5(key):
    * digits 0-3 → "val" (25%), rest → "train".
    */
  def hashSplit(key: Column): Column =
    when(substring(md5(key.cast("string")), 1, 1).isin("0", "1", "2", "3"), "val")
      .otherwise("train")

  /** Deterministic ~1/16 sample: first md5 hex digit equals '0'. */
  def hashSample(df: DataFrame, key: Column): DataFrame =
    df.filter(substring(md5(key.cast("string")), 1, 1) === "0")

  /** Stratified split audit: per (source, split) doc counts + mean
    * length — the check that a split didn't skew a stratum.
    */
  def splitAudit(documents: DataFrame): DataFrame =
    documents
      .withColumn("split", hashSplit(col("doc_id")))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(length(col("text"))), 4).as("avg_len"))

  /** Per-stratum sampling rates in sixteenths of the md5 hex space:
    * e.g. rate 8 keeps docs whose first hash nibble is 0-7 (50%).
    * Nibble thresholds (not float compares) keep the keep-set an
    * exact deterministic function of the key on every engine.
    */
  def stratumNibble(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 1), 16, 10).cast("int")

  /** Stratified downsampling audit: up-weight one source, thin the
    * rest (the corpus-mixing step of a training pipeline). Pure
    * per-row hash filter — no sampling state, no shuffle beyond the
    * audit aggregation, identical keep-set at any parallelism.
    */
  def stratifiedSampleAudit(documents: DataFrame): DataFrame = {
    val rate16 = when(col("source") === "src0", 8)
      .when(col("source") === "src1", 4)
      .otherwise(2)
    documents
      .withColumn("kept", stratumNibble(col("doc_id")) < rate16)
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        round(sum(when(col("kept"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 4).as("kept_frac"))
  }

  /** Exact-size deterministic sample: the n rows with the smallest
    * md5(key) — a seedless reservoir any engine reproduces. Spark
    * plans the ordered limit as TakeOrderedAndProject: every
    * partition keeps a local n-row heap and only those heaps reach
    * the driver — no global sort, no corpus shuffle, which is the
    * only way "give me exactly n rows" scales to 100 TB (a
    * rand()-based sample is approximate AND seed-coordinated; a full
    * ORDER BY is a cluster-wide sort).
    */
  def fixedSizeSample(documents: DataFrame, n: Int): DataFrame =
    documents
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
      .orderBy(col("h"))
      .limit(n)

  /** Exact-n-PER-STRATUM deterministic sample (the balanced-subset
    * step of eval-set construction: n docs from every source, no
    * matter how skewed the corpus). Within each stratum rows rank by
    * md5(doc_id) — seedless, engine-portable, stable across runs —
    * and the native TopKPerKey operator keeps per-partition n-row
    * heaps per key, so no stratum is ever sorted whole and no corpus
    * shuffle exceeds the (key, n-heap) partials: the per-key twin of
    * [[fixedSizeSample]]'s TakeOrderedAndProject shape.
    */
  def fixedPerStratum(documents: DataFrame, n: Int): DataFrame = {
    val tagged = documents.select(col("source"), col("doc_id"),
      md5(col("doc_id").cast("string")).as("h"))
    val top = graft.plans.TopK.perKey(
      tagged, Seq("source"), Seq(col("h").asc, col("doc_id").asc), n)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("h"), col("doc_id"))
    top.withColumn("rk", row_number().over(w).cast("long"))
      .select("source", "rk", "doc_id", "h")
  }

  /** Leakage-safe train/val split: a val doc with a near-duplicate
    * twin in train leaks the answer, so split assignment hashes the
    * near-dup KEEPER id (the connected-component representative from
    * [[graft.dedup.Dedup.nearDupKeepers]]), never the doc id. Every
    * duplicate cluster whose propagation radius fits in `iters`
    * label-propagation rounds — in particular the (near-)cliques LSH
    * banding produces — lands in one split. A similarity CHAIN
    * longer than `iters` hops can still assign distinct keepers to
    * its far ends (the keeper mapping is conservative by design, see
    * nearDupKeepers), so corpora where long chains are expected
    * should raise `iters`. Same distribution story as the keeper
    * mapping itself: LSH-bucketed edges + bounded-iteration label
    * propagation, then a pure per-row hash — no extra shuffle.
    */
  def leakageSafeSplit(documents: DataFrame, tau: Double = 0.9,
                       iters: Int = 2): DataFrame =
    leakageSafeSplit(graft.dedup.Dedup.fitKeepers(documents, tau, iters))

  /** [[leakageSafeSplit]] over a fitted
    * [[graft.dedup.Dedup.KeeperModel]]: a pure per-row hash of the
    * materialized keeper mapping — no pipeline, no shuffle. */
  def leakageSafeSplit(model: graft.dedup.Dedup.KeeperModel): DataFrame =
    model.labels
      .select(col("doc_id"), col("keep_doc_id"),
        hashSplit(col("keep_doc_id")).as("split"))

  /** Leakage-safe K-FOLD assignment over a fitted keeper model:
    * fold = [[shardId]] of the KEEPER id — every near-duplicate
    * cluster lands in one fold by construction, so k-fold
    * cross-validation never scores a model on a twin of something it
    * trained on (the [[leakageSafeSplit]] guarantee generalized from
    * one holdout to k rotations). Pure per-row hash over the
    * materialized label frame — no pipeline re-run, no shuffle;
    * `k` must divide 256 (the shardId hash-class contract).
    */
  def kFold(model: graft.dedup.Dedup.KeeperModel, k: Int = 4): DataFrame =
    model.labels
      .select(col("doc_id"), col("keep_doc_id"),
        shardId(col("keep_doc_id"), k).as("fold"))

  /** Split-leakage audit: counts the LSH-verified near-duplicate
    * pairs (Jaccard ≥ τ) whose two docs landed in DIFFERENT splits —
    * the direct measurement of the contamination
    * [[leakageSafeSplit]] exists to prevent (a val doc with a train
    * twin leaks the answer). Zero by construction for every pair
    * within the keeper propagation's 2^iters reach; a nonzero count
    * is the audit firing on chains deeper than the configured
    * radius. One row: total verified pairs, cross-split pairs, and
    * the per-split doc counts for rate context. The verified pair
    * list — the dominant cost (MinHash signatures + band join +
    * Jaccard verify) — is computed ONCE, checkpointed, and feeds
    * both the propagation edges and the audit join (the naive
    * compose-two-operators form runs that pipeline twice, and the
    * propagation's own edge checkpoint makes exchange reuse
    * impossible across the two subtrees).
    */
  def leakAudit(documents: DataFrame, tau: Double = 0.9,
                iters: Int = 2): DataFrame =
    leakAudit(graft.dedup.Dedup.fitKeepers(documents, tau, iters))

  /** [[leakAudit]] over a fitted [[graft.dedup.Dedup.KeeperModel]]:
    * the audited split IS [[leakageSafeSplit]]'s split by
    * construction — both are `hashSplit(keep_doc_id)` over the SAME
    * materialized label frame, so the audit can never silently
    * measure a different split than the one it claims to audit (the
    * r7 review risk of the two code paths re-deriving the pipeline
    * independently). The verified pair list is the model's
    * checkpointed `pairs` — already computed, never re-run.
    */
  def leakAudit(model: graft.dedup.Dedup.KeeperModel): DataFrame = {
    val pairs = model.pairs
    val split = model.labels
      .select(col("doc_id"), hashSplit(col("keep_doc_id")).as("split"))
    pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("split_a"))
        .hint("shuffle_hash"), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("split_b"))
        .hint("shuffle_hash"), "doc_b")
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L)),
          lit(0L)).as("n_cross_split"))
      .crossJoin(broadcast(split.groupBy("split").agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(when(col("split") === "train", col("n"))), lit(0L))
            .as("n_train"),
          coalesce(sum(when(col("split") === "val", col("n"))), lit(0L))
            .as("n_val"))))
  }

  /** Materialize the temperature mix deterministically: per-source
    * keep thresholds in sixteenths of the md5 nibble space, derived
    * from the α=0.5 temperature boost (rate_s = budget × boost_s
    * capped at 1) — the step between COMPUTING mixture weights
    * ([[temperatureMix]]) and actually emitting the mixed corpus.
    * Keep/drop is a pure function of (source counts, doc_id hash):
    * no sampling state, identical output at any parallelism, and the
    * 16-level quantization makes every realized rate an auditable
    * integer. The rates table is |sources| rows — a broadcast.
    *
    * Portability of the floor: the boost is computed from sqrt
    * (IEEE-correctly-rounded everywhere, unlike pow) and the two
    * corpus sums fold SEQUENTIALLY over the source-sorted packed
    * count model — the same packed-sorted-model trick the ANN
    * kernels use — so every engine reaching the `floor` holds
    * bit-identical doubles and the 1/16-step cliff cannot diverge.
    * No rounding ever happens before the floor.
    */
  def temperatureApply(documents: DataFrame, budget: Double = 0.5): DataFrame =
    applyTemperatureRates(documents, temperatureRates(documents, budget))

  /** The fitted per-source RATE TABLE alone (|sources| rows — a
    * broadcast): the model half of [[temperatureApply]], exposed so
    * the live ingest gate ([[graft.streaming.SampleStreams
    * .temperatureGateStream]]) can fit it out-of-band and gate a
    * stream against it (the lmGateStream refresh contract). */
  def temperatureRates(documents: DataFrame, budget: Double = 0.5): DataFrame = {
    // the packed sorted model is a SECOND aggregation of the
    // per-source counts attached back by single-row broadcast — same
    // deterministic fold inputs as the old whole-frame window, with
    // no everything-to-one-task window stage (the PlanLint shape)
    val bySource = documents.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val packed = bySource.crossJoin(broadcast(bySource.agg(
      sort_array(collect_list(struct(col("source"), col("n_docs"))))
        .as("model"))))
    val sumSqrt = aggregate(col("model"), lit(0.0),
      (a, x) => a + sqrt(x.getField("n_docs")))
    val nTotal = aggregate(col("model"), lit(0L),
      (a, x) => a + x.getField("n_docs"))
    val boost = (sqrt(col("n_docs")) * nTotal.cast("double")) /
      (col("n_docs").cast("double") * sumSqrt)
    packed.select(col("source"),
      least(lit(16), floor(lit(16.0) * lit(budget) * boost).cast("int")).as("rate16"))
  }

  /** The stateless APPLY half: keep/drop is a pure function of
    * (rate table, doc_id hash), so the same projection gates a batch
    * corpus or a live stream (stream-static broadcast join). */
  def applyTemperatureRates(documents: DataFrame, rates: DataFrame): DataFrame =
    documents.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("rate16"),
        (stratumNibble(col("doc_id")) < col("rate16")).as("kept"))

  /** Embedding-space balanced sample: exact n vectors per
    * PCA-score band — the "cover the semantic space" counterpart of
    * [[fixedPerStratum]]'s per-source balance (a uniform sample
    * over-represents the dense center of embedding space; eval sets
    * and seed sets want the tails covered too). Strata are fixed
    * `bandWidth` intervals of the top-component projection, clamped
    * to ±4 bands: a pure per-row function of the fitted
    * [[graft.sim.Similarity.PcaModel]] — no quantile pass, no global
    * sort, engine-portable because the band is computed from the
    * 6dp-ROUNDED projection (already pinned bit-identical by the
    * emb_project oracle). Within each band rows rank by md5(vec_id)
    * through the native TopKPerKey bounded heaps, exactly as the
    * per-source sampler.
    */
  def pcaStrataSample(embeddings: DataFrame, n: Int = 5,
                      bandWidth: Double = 0.05): DataFrame =
    pcaStrataSample(embeddings,
      graft.sim.Similarity.pcaFitModel(embeddings), n, bandWidth)

  /** [[pcaStrataSample]] against an already-fitted model — the
    * fit-once/apply-many entry (the sample itself is then one scan
    * into the band heaps; no model jobs).
    */
  def pcaStrataSample(embeddings: DataFrame,
                      model: graft.sim.Similarity.PcaModel,
                      n: Int, bandWidth: Double): DataFrame = {
    val proj = graft.sim.Similarity.pcaApply(embeddings, model)
    val tagged = proj.select(
      greatest(lit(-4L), least(lit(4L),
        floor(col("proj") / bandWidth))).as("band"),
      col("vec_id"), md5(col("vec_id").cast("string")).as("h"),
      col("proj"))
    val top = graft.plans.TopK.perKey(tagged, Seq("band"),
      Seq(col("h").asc, col("vec_id").asc), n)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band")
      .orderBy(col("h"), col("vec_id"))
    top.withColumn("rk", row_number().over(w).cast("long"))
      .select("band", "rk", "vec_id", "h", "proj")
  }

  /** Repetition-aware "soft" dedup: keep each document with
    * probability 1/cluster_size of its near-dup keeper cluster, so a
    * family of n near-copies contributes ~1 expected survivor while
    * unique docs always survive (singleton clusters keep with
    * probability 1) — the middle ground between hard dedup (exactly
    * one keeper, discards paraphrase diversity) and no dedup
    * (over-trains on template families). Keep/drop is a pure
    * function of (doc_id hash, cluster size): the first two md5
    * nibbles give a uniform 0..255 level `h`, and the doc survives
    * iff h·size < 256 — an exact-rational ~1/size threshold with no
    * float compare and no sampling state, reproducible on any
    * engine. Cost over the keeper mapping is one count aggregation
    * plus one join keyed by keeper id (shuffled-hash: the size frame
    * is one row per cluster, and a giant cluster is exactly the
    * skew-key case AQE skew-join handles).
    */
  def softDedup(documents: DataFrame, tau: Double = 0.9,
                iters: Int = 2): DataFrame =
    softDedup(graft.dedup.Dedup.fitKeepers(documents, tau, iters))

  /** [[softDedup]] over a fitted [[graft.dedup.Dedup.KeeperModel]]:
    * one size aggregation + one keeper-keyed join over the
    * materialized mapping, no pipeline. */
  def softDedup(model: graft.dedup.Dedup.KeeperModel): DataFrame = {
    val labels = model.labels
    val sizes = labels.groupBy("keep_doc_id")
      .agg(count(lit(1)).as("cluster_size"))
    val h256 =
      conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("long")
    labels
      .join(sizes.hint("shuffle_hash"), Seq("keep_doc_id"))
      .select(col("doc_id"), col("keep_doc_id"), col("cluster_size"),
        (h256 * col("cluster_size") < 256L).as("soft_kept"))
  }

  /** Temperature-scaled mixture weights (the multilingual-sampling
    * trick: p_s ∝ n_s^α with α < 1 flattens the source distribution,
    * boosting low-resource sources without discarding high-resource
    * data). Per-source raw and temperature shares plus the boost
    * factor a sampler applies. The window frames are the per-source
    * count table — a bounded model, never the corpus.
    */
  def temperatureMix(documents: DataFrame, alpha: Double = 0.5): DataFrame = {
    val bySource = documents.groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
    // totals ride a single-row broadcast instead of an empty-partition
    // window: same values, no everything-to-one-task window machinery
    // (the shape PlanLint flags), and the per-source frame stays
    // map-side-combined end to end
    val totals = bySource.agg(sum("n_docs").as("tot_docs"),
      sum(pow(col("n_docs"), alpha)).as("tot_temp"))
    val tempW = pow(col("n_docs"), alpha)
    val rawShare = col("n_docs").cast("double") / col("tot_docs").cast("double")
    val tempShare = tempW / col("tot_temp")
    bySource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"),
        round(rawShare, 4).as("raw_share"),
        round(tempShare, 4).as("temp_share"),
        round(tempShare / rawShare, 4).as("boost"))
  }

  /** EPOCHS PLAN — what a temperature mix actually costs in REPEATS:
    * [[temperatureMix]] says what share of the training budget each
    * source should fill; this turns the shares into the numbers a
    * run plans with — per source, the target char volume under a
    * `budget` of `multiple ×` the corpus, the implied EPOCH count
    * (target / available — how many times the source repeats), and
    * a flag when the repeats exceed `maxEpochs` (the empirically
    * risky regime where upsampling a small source turns into
    * memorizing it; the Muennighoff et al. ~4-epoch guidance). The
    * whole operator is one map-side-combined per-source aggregate +
    * a broadcast totals row — the [[temperatureMix]] shape with char
    * weights. Libm discipline: the temperature share is snapped to
    * an exact integer PPM once (the 6dp rounding grain that absorbs
    * sub-ulp `pow` differences — the banding_plan precedent), the
    * budget `multiplePct` is an exact integer percent, and the
    * target volume is then pure DECIMAL arithmetic — so the targets,
    * epochs, and the over-cap flag are bit-identical across engines
    * (a raw `floor(pow(...)·tot)` could flip at an fp boundary).
    */
  def epochsPlan(documents: DataFrame, alpha: Double = 0.5,
                 multiplePct: Int = 100, maxEpochs: Double = 4.0): DataFrame = {
    require(multiplePct > 0, s"multiplePct ($multiplePct) must be positive")
    val bySource = documents.groupBy("source")
      .agg(sum(length(col("text")).cast("long")).as("chars"))
    val totals = bySource.agg(sum("chars").as("tot_chars"),
      sum(pow(col("chars"), alpha)).as("tot_temp"))
    val tempShare = pow(col("chars"), alpha) / col("tot_temp")
    bySource.crossJoin(broadcast(totals))
      // floor(x+0.5), not round(x): round-to-integer of a raw double
      // is half-up on Spark but half-even in DuckDB — floor of the
      // identical IEEE product is the same number everywhere
      .withColumn("share_ppm",
        floor(tempShare * 1e6d + 0.5d).cast("long"))
      .withColumn("target_chars",
        expr(s"CAST(share_ppm AS DECIMAL(38,0)) * tot_chars " +
          s"* $multiplePct div 100000000").cast("long"))
      .withColumn("epochs", round(
        col("target_chars").cast("double") / col("chars").cast("double"), 4))
      .select(col("source"), col("chars"), col("share_ppm"),
        col("target_chars"), col("epochs"),
        (col("epochs") > maxEpochs).as("over_cap"))
  }

  /** Training-shard assignment: the first md5 byte of the key, mod
    * `nShards`. A training run wants its input globally shuffled —
    * curated corpora arrive clustered by source/time, and a model
    * that sees a whole source in a row overfits its local
    * distribution — but an actual global `ORDER BY rand()` at 100 TB
    * is a full-corpus range sort with seed-coordination problems.
    * The hash byte IS the shuffle: assignment is a pure per-row
    * function (no state, no seed, identical on every engine), and
    * 256 hash classes spread exactly evenly over shards when
    * `nShards` divides 256.
    */
  def shardId(key: Column, nShards: Int): Column = {
    require(nShards > 0 && 256 % nShards == 0,
      s"nShards ($nShards) must divide 256 for exactly-even hash classes")
    (conv(substring(md5(key.cast("string")), 1, 2), 16, 10)
      .cast("int") % nShards).cast("int")
  }

  /** Shard-balance + mixing audit of [[shardId]]: per-shard doc and
    * char volume, source coverage, and the largest single-source
    * share — the pre-flight check that shards are interchangeable
    * slices of the corpus (a shard dominated by one source defeats
    * the shuffle's purpose). Two map-side-combined aggregations over
    * (shard, source) — output bounded by shards × sources.
    */
  def shardAudit(documents: DataFrame, nShards: Int = 8): DataFrame = {
    val perSource = documents
      .select(shardId(col("doc_id"), nShards).as("shard"),
        col("source"), length(col("text")).cast("long").as("len"))
      .groupBy("shard", "source")
      .agg(count(lit(1)).as("n"), sum("len").as("chars"))
    perSource
      .groupBy("shard")
      .agg(sum("n").as("n_docs"), sum("chars").as("n_chars"),
        count(lit(1)).as("n_sources"),
        round(max("n").cast("double") / sum("n"), 4).as("top_source_share"))
  }

  /** CURRICULUM PHASES: per-source equal-population difficulty
    * buckets (short → long documents, the classic length curriculum)
    * with NTILE-boundary semantics — phase `d` covers in-source
    * ranks `[⌊d·n/P⌋, ⌊(d+1)·n/P⌋)` under the total (len, doc_id)
    * order — but computed WITHOUT any per-source sort: a window
    * `row_number` over 3-5 sources serializes the whole corpus into
    * a handful of sorted task chains at 100 TB. Instead the
    * q17-style two-pass histogram rank selection finds only the
    * P−1 BOUNDARY documents per source (pass 1: per-source bounds +
    * integer-exact 256-bin length histogram locates each boundary
    * rank's bin on a summary frame; pass 2 ranks only inside
    * located bins), the boundary (len, doc_id) pairs broadcast as a
    * sources×(P−1) array, and every document computes its phase
    * MAP-SIDE as the count of boundary pairs at or below it —
    * `(len,id) ≥ p_k ⟺ rank ≥ r_k` because the order is total.
    * Identical to `⌊(P·rank + P − 1)/n⌋` (the count-of-boundaries
    * identity: `#{k ≥ 1: ⌊k·n/P⌋ ≤ r} = ⌊(P·r + P − 1)/n⌋`), which
    * is what the oracle replays. One corpus aggregate after a
    * broadcast join; output is sources × P rows.
    */
  /** Sequential-Poisson PPS sample (Ohlsson) — the WITHOUT-
    * replacement complement of [[systematic]]: per source stratum,
    * keep the `n` documents with the SMALLEST priority `u/w`, where
    * `u` is the md5-derived uniform of the doc id and `w` the char
    * weight; inclusion probability is ≈ n·w/W (probability-
    * proportional-to-size), each doc appears at most once, and the
    * draw is a pure function of the ids — no RNG, no seed, no state
    * (the [[hashSplit]] discipline).
    *
    * Determinism across engines: the priority is ONE IEEE division
    * of two exactly-representable integers (the 60-bit md5 nibble
    * value cast to double — same nearest rounding everywhere — over
    * the integer weight), so both engines compute the bit-identical
    * double; ties (possible only for equal (u, w) pairs) break on
    * doc_id. Selection runs on the native bounded-heap
    * [[graft.plans.TopK]] operator — O(n·|sources|) memory, no
    * per-stratum sort, map-side partial heaps bound the shuffle.
    * Zero-weight docs have undefined priority and are excluded up
    * front (they can never be drawn under PPS).
    */
  def ppsSample(documents: DataFrame, n: Int = 25): DataFrame = {
    require(n > 0, s"n ($n) must be positive")
    val d = documents
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("priority",
        expr("CAST(conv(substring(md5(cast(doc_id as string)), 1, 15), " +
          "16, 10) AS BIGINT)").cast("double") / col("weight").cast("double"))
    graft.plans.TopK.perKey(d, Seq("source"),
      Seq(col("priority").asc, col("doc_id").asc), n)
      .select("source", "doc_id", "weight", "priority")
  }

  /** Deterministic WEIGHT-PROPORTIONAL SYSTEMATIC SAMPLE — the
    * token-budget sampler: lay every document's weight (here its
    * char length — the token proxy) end to end on an integer line in
    * doc_id order, drop n equally-spaced tickets at multiples of
    * `step = W div n`, and a document is picked once per ticket its
    * interval [c, c+w) swallows. Inclusion probability follows the
    * classic PPS-systematic estimator UP TO the integer-step floor
    * and the fixed origin: `step = W div n` truncates, so the
    * trailing `W mod n` weight units carry no ticket, and ticket 0
    * sits at position 0, so the first weighted unit is always
    * sampled — a deliberate determinism-over-unbiasedness trade (a
    * production draw wanting the textbook estimator derives a
    * pseudo-random offset in [0, step) from a corpus hash). Heavy
    * documents carry `n_picks` > 1 (with-replacement multiplicity at
    * fixed tickets), zero-weight documents can never be picked — and
    * the whole construct is EXACT INTEGER arithmetic with no seed,
    * no RNG state, no fp: any engine replays the identical sample,
    * which is what makes a 100 TB training-mix draw auditable.
    *
    * Scale shape: the only order-dependent quantity is the exclusive
    * prefix sum of weights, computed BANDED (the ts_match offsets
    * discipline) — monotone doc_id bands, in-band window cumsum
    * (per-task work = one band), band totals' exclusive prefix on a
    * ≤ bands summary frame, never a global single-task window. The
    * ticket interval arithmetic is map-side per row against a
    * broadcast single-row total.
    *
    * Degenerate regimes kept well-defined: W < n drives step to the
    * floor of 1 (tickets 0..n−1, only the first W land — the sample
    * is every weighted unit); an all-empty corpus answers zero rows.
    */
  def systematic(documents: DataFrame, n: Int, bands: Int = 64): DataFrame = {
    require(n > 0, s"n ($n) must be positive")
    require(bands > 0, s"bands ($bands) must be positive")
    val d = documents.select(col("doc_id"), col("source"),
      length(col("text")).cast("long").as("w"))
    val tot = d.agg(min("doc_id").as("i0"), max("doc_id").as("i1"),
      sum("w").as("tw"))
    // monotone id bands: band order == id order, so band-offset +
    // in-band cumsum IS the global prefix sum; width via div keeps
    // the arithmetic overflow-free for any id range
    val banded = d.crossJoin(broadcast(tot))
      .withColumn("bw", expr(s"(i1 - i0) div $bands + 1"))
      .withColumn("band", expr("(doc_id - i0) div bw"))
      // the in-band window and the band-sum aggregate both read it
      .localCheckpoint()
    val inBand = banded.withColumn("cum",
      sum("w").over(Window.partitionBy("band").orderBy("doc_id")))
    val bsums = banded.groupBy("band").agg(sum("w").as("bsum"))
      .localCheckpoint() // both sides of the shared prefix join
    val offs = ModelFrames.exclusivePrefixSum(bsums, "band", "bsum")
    inBand.join(broadcast(offs), Seq("band"))
      .withColumn("c", col("off") + col("cum") - col("w"))
      .withColumn("step", greatest(lit(1L), expr(s"tw div $n")))
      .withColumn("j_lo", expr("(c + step - 1) div step"))
      .withColumn("j_hi",
        least(expr("(c + w - 1) div step"), lit(n - 1L)))
      .filter(col("w") > 0 && col("j_hi") >= col("j_lo"))
      .select(col("doc_id"), col("source"), col("w").as("weight"),
        (col("j_hi") - col("j_lo") + 1).as("n_picks"))
  }

  def curriculum(documents: DataFrame, phases: Int = 10): DataFrame = {
    require(phases > 1, s"phases ($phases) must exceed 1")
    val bins = 256
    val s = documents.select(col("source").as("g"), col("doc_id"),
      length(col("text")).cast("long").as("v"))
    // integer-exact fixed-width binning (RankSelect.intBin — shared)
    val binOf = RankSelect.intBin(bins)
    // boundary ranks k·n div P, k = 1..P−1, kept PER k (small n dups
    // several k onto one rank — each still counts one phase step)
    val (th0, _) = RankSelect.at(s, bins, binOf, bounds =>
      bounds.select(col("g"), col("n"),
        explode(array((1 until phases).map(lit(_)): _*)).as("k"))
        .withColumn("r", expr(s"k * n div $phases"))
        .select("g", "k", "r"),
      tie = Seq("doc_id"))
    val th = th0.select(col("g"), col("v").as("t_len"),
      col("doc_id").as("t_id"))
    val thArr = th.groupBy("g")
      .agg(sort_array(collect_list(struct(col("t_len"), col("t_id"))))
        .as("ths"))
    s.join(broadcast(thArr), Seq("g"))
      .withColumn("phase", size(filter(col("ths"), t =>
        col("v") > t.getField("t_len") ||
          (col("v") === t.getField("t_len") &&
            col("doc_id") >= t.getField("t_id")))).cast("long"))
      .groupBy(col("g").as("source"), col("phase"))
      .agg(count(lit(1)).as("n_docs"), min("v").as("min_len"),
        max("v").as("max_len"), round(avg("v"), 4).as("avg_len"))
      .orderBy("source", "phase")
  }

  /** TOKEN-BUDGET PREFIX materialization — turn a corpus-relative
    * token budget into the concrete per-source document prefix a
    * loader reads: the total budget is `multiplePpm` of the corpus'
    * token mass, split equally across sources (compose with
    * [[temperatureMix]] for weighted splits), and each source
    * contributes its doc_id-order prefix of WHOLE documents whose
    * inclusive cumulative token count fits the allocation (greedy
    * whole-doc packing — the loader never splits a document). A
    * source whose first document alone overflows contributes an
    * explicit zero row, never a silently missing one.
    *
    * Exact and deterministic end to end: token counts, the
    * allocation, and the cumulative line are all integers; the only
    * order-dependent quantity is the per-source exclusive prefix
    * sum, computed BANDED exactly like [[systematic]] (in-band
    * window cumsum + band-offset join on the sources×bands summary
    * frame — no per-source single-task window at 100 TB).
    */
  def tokenBudget(documents: DataFrame, multiplePpm: Long = 250000,
                  bands: Int = 64): DataFrame = {
    require(multiplePpm > 0, s"multiplePpm ($multiplePpm) must be positive")
    require(bands > 0, s"bands ($bands) must be positive")
    val d = documents.select(col("doc_id"), col("source"),
      size(graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("w"))
    val tot = d.agg(sum("w").as("tw"), countDistinct("source").as("ns"),
      min("doc_id").as("i0"), max("doc_id").as("i1"))
    val banded = d.crossJoin(broadcast(tot))
      .withColumn("bw", expr(s"(i1 - i0) div $bands + 1"))
      .withColumn("band", expr("(doc_id - i0) div bw"))
      // tw·multiplePpm leaves int64 around 2.5e13 corpus tokens at
      // the default ppm — exactly this operator's design point —
      // so the product widens (Events.burst's ratio discipline)
      .withColumn("alloc", expr("CAST(CAST(tw AS DECIMAL(38,0)) * " +
        s"$multiplePpm div 1000000 div ns AS BIGINT)"))
      // the in-band window, the band-sum aggregate, and the source
      // list all read it
      .localCheckpoint()
    val inBand = banded.withColumn("cum",
      sum("w").over(Window.partitionBy("source", "band").orderBy("doc_id")))
    val bsums = banded.groupBy("source", "band").agg(sum("w").as("bsum"))
      .localCheckpoint() // both sides of the shared prefix join
    val offs = ModelFrames.exclusivePrefixSum(bsums, "band", "bsum",
      within = Seq("source"))
    val taken = inBand.join(broadcast(offs), Seq("source", "band"))
      .filter(col("off") + col("cum") <= col("alloc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("tokens_taken"))
    banded.groupBy("source").agg(max("alloc").as("alloc_tokens"))
      // both sides are |sources|-sized aggregates but the
      // checkpointed lineage hides that from the planner — broadcast
      // explicitly (the RankSelect discipline) or this plans as SMJ
      .join(broadcast(taken), Seq("source"), "left")
      .na.fill(0L, Seq("n_docs", "tokens_taken"))
      .withColumn("utilization_ppm",
        expr("CAST(CAST(tokens_taken AS DECIMAL(38,0)) * 1000000 " +
          "div alloc_tokens AS BIGINT)"))
  }

  /** PROPORTIONAL-INTERLEAVE training schedule — the deterministic
    * materialization of "stream the sources mixed, not concatenated":
    * a training run that reads source A to exhaustion before source B
    * bakes an ordering curriculum nobody asked for, so the loader
    * wants source s's rank-r document at global position ≈ r/share_s.
    * The integer position key `r·N div n_s` realizes exactly that
    * (each source's documents spread evenly across the N-slot
    * schedule), with (key, source, rank) completing a total order —
    * no RNG, no seed: any engine, any partitioning, any restart
    * replays the identical epoch order, which is what makes a
    * training run reproducible at 100 TB.
    *
    * Scale shape: the per-source rank is the BANDED line (in-band
    * row_number + band-count offsets from the shared
    * [[ModelFrames.exclusivePrefixSum]] — no per-source single-task
    * window); the schedule HEAD (`k` rows) comes off distributed
    * top-k heaps (TakeOrderedAndProject), never a global sort — a
    * loader materializing the whole epoch calls
    * [[graft.ops.Layout.writeInterleaved]] (sharded pos_key-slice
    * layout, sequential shard reads replay the epoch) instead of
    * asking for all N rows ordered. The key product widens through
    * DECIMAL(38,0) (rank·N exceeds int64 near 10⁹·10⁹).
    */
  /** The FULL interleave key frame — every document with its
    * deterministic `pos_key = rank_in_source · N div n_s` schedule
    * position (plus `n`, the epoch size, for consumers that bucket
    * the key range) — shared by [[interleave]] (the queryable head)
    * and [[graft.ops.Layout.writeInterleaved]] (the epoch
    * materialization the interleave doc promises: a sharded Layout
    * write a sequential loader streams, never an ordered collect).
    * Same banded rank lines, no global sort, no window over a
    * corpus-sized single partition.
    */
  def interleaveKeys(documents: DataFrame, bands: Int = 64): DataFrame = {
    require(bands > 0, s"bands ($bands) must be positive")
    val d = documents.select(col("doc_id"), col("source"))
    val tot = d.agg(min("doc_id").as("i0"), max("doc_id").as("i1"),
      count(lit(1)).as("n"))
    val banded = d.crossJoin(broadcast(tot))
      .withColumn("bw", expr(s"(i1 - i0) div $bands + 1"))
      .withColumn("band", expr("(doc_id - i0) div bw"))
      .localCheckpoint()
    val inBand = banded.withColumn("rib", row_number()
      .over(Window.partitionBy("source", "band").orderBy("doc_id"))
      .cast("long"))
    val bcounts = banded.groupBy("source", "band")
      .agg(count(lit(1)).as("bc")).localCheckpoint()
    val offs = ModelFrames.exclusivePrefixSum(bcounts, "band", "bc",
      within = Seq("source"))
    // per-source totals fold off the band-counts MODEL frame — the
    // corpus is never re-aggregated for a number the summary holds
    val ns = bcounts.groupBy("source").agg(sum("bc").as("ns"))
    inBand.join(broadcast(offs), Seq("source", "band"))
      .withColumn("rank_in_source", col("off") + col("rib"))
      .join(broadcast(ns), Seq("source"))
      .withColumn("pos_key", expr(
        "CAST(CAST(rank_in_source AS DECIMAL(38,0)) * n div ns AS BIGINT)"))
      .select("source", "doc_id", "rank_in_source", "pos_key", "n")
  }

  def interleave(documents: DataFrame, k: Int = 50,
                 bands: Int = 64): DataFrame = {
    require(k > 0 && bands > 0, s"need k ($k) > 0 and bands ($bands) > 0")
    val keyed = interleaveKeys(documents, bands)
    // schedule head off distributed top-k heaps; `pos` is then the
    // rank within the ≤k-row head — computed BANDED on the real
    // pos_key column (in-key row_number + key-count offsets), never
    // a constant-partition window (the optimizer folds a literal
    // key out of the partition spec, leaving the single-task shape
    // PlanLint errors on)
    val head = keyed
      .orderBy(col("pos_key"), col("source"), col("rank_in_source"))
      .limit(k)
      .select("source", "doc_id", "rank_in_source", "pos_key")
      .localCheckpoint()
    val inKey = head.withColumn("krib", row_number()
      .over(Window.partitionBy("pos_key")
        .orderBy("source", "rank_in_source")).cast("long"))
    val kc = head.groupBy("pos_key").agg(count(lit(1)).as("kc"))
      .localCheckpoint()
    val kOffs = ModelFrames.exclusivePrefixSum(kc, "pos_key", "kc",
      as = "koff")
    inKey.join(broadcast(kOffs), Seq("pos_key"))
      .withColumn("pos", col("koff") + col("krib"))
      .select("pos", "source", "doc_id", "rank_in_source", "pos_key")
  }

  /** DSIR-flavored DATA SELECTION — importance resampling on hashed
    * n-gram features (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): score every raw document by
    * how target-like its hashed-unigram distribution is, keep the
    * top n per source. The published method fits bag-of-hashed-ngram
    * models for target and raw and weighs by the log-likelihood
    * ratio; this re-expression keeps the same structure — hashed
    * features, target/raw ratio per feature, per-doc aggregation —
    * but LINEARIZES the weight to the mean per-occurrence
    * probability RATIO in exact integer ppm (logs are fp and
    * order-sensitive; integer sums replay bit-identically on any
    * engine, the lm-gate discipline). Monotone per feature, so the
    * ranking tells the same target-likeness story.
    *
    * The target here is the `targetLang` slice of the corpus itself
    * (the stand-in for "trusted reference corpus" in this schema —
    * production points the same shape at a curated table). Features
    * are md5-bucketed word n-grams (`ngram` knob; default unigrams,
    * [[graft.text.TextAnalysis.hashedFeatures]]'s convention): no
    * vocabulary is built or broadcast, the model is ≤ `dim` ratio
    * rows regardless of n-gram order.
    *
    * Shape: ONE corpus explode compresses immediately to the
    * (doc, bucket) multiplicity frame (materialized — the model
    * build and the scoring join both read it); everything between it
    * and the final TopKPerKey heaps is model-sized. The per-feature
    * ratio `(c_T·total_R·10⁶) div (c_R·total_T)` widens through
    * DECIMAL(38,0) (HUGEINT on the oracle side); an empty target
    * scores every bucket 0 rather than erroring.
    */
  def dsirSample(documents: DataFrame, targetLang: String = "en",
                 dim: Int = 16, n: Int = 10, ngram: Int = 1): DataFrame = {
    require(dim > 0 && 256 % dim == 0,
      s"dim ($dim) must divide 256 for exactly-even hash classes")
    require(n > 0, s"n ($n) must be positive")
    require(ngram >= 1, s"ngram ($ngram) must be >= 1")
    // the published method's features are hashed n-GRAMS; ngram > 1
    // rides the shared shingle kernel (one pass over the UTF-8
    // bytes, stream order, duplicates kept — the bigram-LM feature
    // convention), ngram = 1 keeps the whitespace tokenizer
    val featCol =
      if (ngram == 1) graft.text.TextAnalysis.tokens(col("text"))
      else graft.functions.expressions.shingle_list(col("text"), ngram)
    val docB = documents
      .select(col("doc_id"), col("source"), col("lang"),
        explode(featCol).as("tok"))
      .select(col("doc_id"), col("source"), col("lang"),
        (conv(substring(md5(col("tok")), 1, 2), 16, 10)
          .cast("int") % dim).as("b"))
      .groupBy("doc_id", "source", "lang", "b")
      .agg(count(lit(1)).as("k"))
      .localCheckpoint()
    val bucketCounts = docB.groupBy("b").agg(
      sum(when(col("lang") === targetLang, col("k")).otherwise(0L)).as("ct"),
      sum("k").as("cr"))
    val totals = bucketCounts.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    val ratios = bucketCounts.crossJoin(broadcast(totals))
      // both sides of the division widen: cr·tt is itself a
      // BIGINT×BIGINT product that wraps around ~3e9 × 3e9 token
      // corpora (the oracle casts ct AND cr to HUGEINT)
      .select(col("b"), expr(
        "CAST(CASE WHEN tt = 0 THEN 0 ELSE " +
          "(CAST(ct AS DECIMAL(38,0)) * tr * 1000000) div " +
          "(CAST(cr AS DECIMAL(38,0)) * tt) " +
          "END AS BIGINT)").as("ratio_ppm"))
    val scored = docB.join(broadcast(ratios), Seq("b"))
      .groupBy("doc_id", "source")
      // ratio_ppm is unbounded above when the target slice is tiny
      // relative to the corpus, so the k·ratio sum widens through
      // DECIMAL(38,0) (BIGINT sums wrap silently under non-ANSI
      // semantics; the oracle's SUM is HUGEINT)
      .agg(sum(expr("CAST(k AS DECIMAL(38,0)) * ratio_ppm"))
        .as("sum_ratio"), sum("k").as("n_tokens"))
      .withColumn("score_ppm",
        expr("CAST(sum_ratio div n_tokens AS BIGINT)"))
    val w = Window.partitionBy("source")
      .orderBy(col("score_ppm").desc, col("doc_id"))
    graft.plans.TopK.perKey(scored, Seq("source"),
        Seq(col("score_ppm").desc, col("doc_id").asc), n)
      .withColumn("rk", row_number().over(w).cast("long"))
      .select("source", "rk", "doc_id", "n_tokens", "score_ppm")
  }

  /** GREEDY MAX-COVERAGE SELECTION (submodular subset selection) —
    * pick `k` documents one at a time, each maximizing the count of
    * corpus shingles no earlier pick covers: the classic (1−1/e)
    * greedy for coverage/facility-location objectives, which is how
    * "small but representative" eval/seed subsets are actually
    * built (random sampling over-picks the redundant mass; greedy
    * coverage provably doesn't). Deterministic end to end — argmax
    * ties break on doc_id, no RNG.
    *
    * Inherently sequential in k (each marginal gain depends on all
    * earlier picks), so the loop runs k rounds over the ONE
    * materialized (doc, shingle) frame — per round one anti-join
    * against the broadcast covered set, one map-side-combined gain
    * count, one single-row TakeOrdered collect, plus one bounded
    * collect of the pick's shingles; k is a model constant (8), so
    * the sequential depth is fixed while every round's scan stays
    * fully distributed. The covered set (≤ k docs' shingles — model-
    * sized at any corpus size) lives on the driver and re-enters as
    * a broadcast LocalRelation, so no round materializes state or
    * executes lineage inside a broadcast build. A doc with zero
    * uncovered shingles vanishes from the gain frame, so nothing is
    * ever re-picked; if coverage exhausts before k the remaining
    * rounds emit no row (the honest regime, spec-pinned). The
    * cumulative-coverage line is the prefix sum of marginal gains —
    * derived on the ≤k collected picks, never re-counted from the
    * covered set.
    */
  def coverageGreedy(documents: DataFrame, k: Int = 8): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    // the (doc, shingle) frame is materialized ONCE and never
    // rewritten: each round anti-joins it against the BROADCAST
    // covered set — the union of the ≤ i picked docs' shingle sets,
    // bounded by k documents' shingles (a model-sized frame at any
    // corpus size), never the corpus. The former loop re-
    // materialized the corpus-scale uncovered remainder every round
    // (k full-frame writes, the dominant cost of the operator both
    // locally and at 100 TB); gains are identical either way —
    // |sh(d) \ covered| — because anti-joining the fixed frame
    // against the accumulated covered set equals anti-joining the
    // shrunken remainder against each round's increment
    val spark = documents.sparkSession
    val sh = Rounds.materialize(
      graft.dedup.Dedup.shingles(documents).select("doc_id", "shingle"))
    // the covered set IS model-sized — the union of ≤ k picked docs'
    // shingle sets, bounded by k documents at ANY corpus size — so it
    // lives on the DRIVER (the capped-collect class every model fit
    // here uses) and re-enters each round as a broadcast
    // LocalRelation: the anti-join's build side has NO lineage, so a
    // round is two small collect jobs over the one materialized
    // (doc, shingle) frame — no per-round checkpoint barrier, no
    // sub-jobs inside broadcast builds (both earlier formulations —
    // a materialized covered frame, then covered-as-lineage — paid
    // one of those two costs every round)
    import spark.implicits._
    var covered = Set.empty[String]
    var picks = Vector.empty[(Long, Long, Long)] // (rk, doc_id, gain)
    var exhausted = false
    for (i <- 1 to k if !exhausted) {
      val unc = if (covered.isEmpty) sh
        else sh.join(broadcast(covered.toSeq.sorted.toDF("shingle")),
          Seq("shingle"), "left_anti")
      val top = unc.groupBy("doc_id").agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id")).limit(1).collect()
      if (top.isEmpty) exhausted = true // spec-pinned honest regime
      else {
        val (doc, gain) = (top.head.getLong(0), top.head.getLong(1))
        picks :+= ((i.toLong, doc, gain))
        covered ++= sh.filter(col("doc_id") === doc)
          .select("shingle").collect().map(_.getString(0))
      }
    }
    // prefix-sum of marginal gains over the ≤ k collected picks
    val rows = picks.scanLeft((0L, 0L, 0L, 0L)) {
      case ((_, _, _, cum), (rk, doc, gain)) => (rk, doc, gain, cum + gain)
    }.drop(1)
    rows.toDF("rk", "doc_id", "gain", "cum_covered")
  }

  /** COARSENED-EXACT-MATCHED CONTROLS — for every document of a
    * treatment source, the most length-similar document from any
    * OTHER source inside the same (lang, length-band) stratum: the
    * matched-control design an A/B eval of a data intervention
    * needs ("did source X's docs score better because of the source
    * or because they're longer English docs?"). CEM (Iacus et al.)
    * re-expressed distributed: coarsen covariates into strata
    * (exact-match keys — ONE hash join, no pairwise corpus
    * product), rank within stratum by |Δtokens| with the doc-id tie
    * break, keep the top control on a bounded heap. Unmatched
    * treatments survive with a null control (the pruning report is
    * part of the design, never silent).
    */
  def matchedControls(documents: DataFrame, treatSource: String = "src1",
                      bandTokens: Int = 8, k: Int = 1): DataFrame = {
    require(bandTokens > 0 && k > 0,
      s"bandTokens ($bandTokens), k ($k) must be positive")
    val sized = documents.select(col("doc_id"), col("source"), col("lang"),
      size(graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
    val t = sized.filter(col("source") === treatSource)
      .select(col("doc_id").as("t_doc"), col("lang"),
        expr(s"n div $bandTokens").as("band"), col("n").as("t_tokens"))
    val c = sized.filter(col("source") =!= treatSource)
      .select(col("doc_id").as("c_doc"), col("lang"),
        expr(s"n div $bandTokens").as("band"), col("n").as("c_tokens"))
    val cand = t.join(c.hint("shuffle_hash"), Seq("lang", "band"))
      .withColumn("len_diff", abs(col("t_tokens") - col("c_tokens")))
    val best = graft.plans.TopK.perKey(cand, Seq("t_doc"),
      Seq(col("len_diff").asc, col("c_doc").asc), k)
    t.join(best.select(col("t_doc"), col("c_doc"), col("c_tokens"),
        col("len_diff")).hint("shuffle_hash"), Seq("t_doc"), "left")
      .select(col("t_doc"), col("lang"), col("band"), col("t_tokens"),
        col("c_doc"), col("c_tokens"), col("len_diff"))
  }

  /** SPLIT-BALANCE AUDIT — is the hash split actually stratified?
    * [[hashSplit]] promises composition-preserving randomness-by-
    * hash; this measures it: per (split, source), the stratum's
    * share WITHIN its split vs the source's share of the WHOLE
    * corpus, and the deviation — a high dev_ppm cell means the val
    * set over/under-represents a source and every per-source eval
    * number is quietly biased. Two map-side-combined aggregates
    * (split×source and source), a broadcast join of the two
    * model-sized share frames, exact integer ppm throughout. The
    * check generalizes to any categorical covariate; source is the
    * one the synthetic corpus carries.
    */
  def splitBalance(documents: DataFrame): DataFrame = {
    val tagged = documents.select(col("source"),
      hashSplit(col("doc_id")).as("split"))
    val cells = tagged.groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint() // cell shares + split totals read it
    val splitTot = cells.groupBy("split").agg(sum("n_docs").as("split_n"))
    val corpusTot = cells.groupBy("source").agg(sum("n_docs").as("src_n"))
      .crossJoin(broadcast(cells.agg(sum("n_docs").as("corpus_n"))))
      .select(col("source"),
        expr("CAST(CAST(src_n AS DECIMAL(38,0)) * 1000000 " +
          "div corpus_n AS BIGINT)").as("corpus_share_ppm"))
    cells
      .join(broadcast(splitTot), Seq("split"))
      .join(broadcast(corpusTot), Seq("source"))
      .select(col("split"), col("source"), col("n_docs"),
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000 " +
          "div split_n AS BIGINT)").as("split_share_ppm"),
        col("corpus_share_ppm"))
      .withColumn("dev_ppm",
        abs(col("split_share_ppm") - col("corpus_share_ppm")))
  }

  /** PARETO-FRONT (skyline) SELECTION — the docs no other doc
    * dominates on BOTH criteria (quality basis points AND token
    * mass, maximize each): multi-objective curation without
    * collapsing the objectives into one weighted score first (any
    * fixed weighting silently discards part of the front; the front
    * itself is every weighting's optimum set).
    *
    * The classic skyline operator, distributed: because the quality
    * criterion lives on a BOUNDED integer domain (q_bp ∈ [0, 10⁴],
    * the shared scorer's basis points), the dominance frontier
    * collapses to a ≤10⁴-row model frame — per q_bp group the max
    * token count, then the strictly-greater-q suffix max via a
    * broadcast inequality self-join (the exclusivePrefixSum shape,
    * max instead of sum). A doc survives iff nothing with more
    * quality has at least its length (`amax < n`) and nothing with
    * EQUAL quality is strictly longer (`n = group max`); exact ties
    * on both axes all survive (neither dominates). One corpus scan,
    * one bounded aggregate, one broadcast join back — no pairwise
    * corpus join at any scale.
    */
  def paretoFront(documents: DataFrame): DataFrame = {
    val q = graft.text.TextAnalysis.qualityBpFrame(documents)
    val groups = q.groupBy("q_bp").agg(max("n_tokens").as("my"))
      .localCheckpoint() // the suffix-max self-join + output read it
    val amax = groups
      .join(broadcast(groups.select(col("q_bp").as("x2"),
        col("my").as("my2"))), col("x2") > col("q_bp"), "left")
      .groupBy("q_bp", "my").agg(max("my2").as("amax"))
    q.join(broadcast(amax), Seq("q_bp"))
      .filter((col("amax").isNull || col("amax") < col("n_tokens")) &&
        col("n_tokens") === col("my"))
      .select(col("doc_id"), col("n_tokens"), col("q_bp"))
  }

  /** UNIMAX language mixing (Chung et al. 2023) — budget-constrained
    * WATERFILLING: spend a token budget as uniformly as possible
    * across languages, capping each language at its available mass.
    * The published alternative to [[temperatureMix]]'s power law:
    * temperature still over-samples the head, UniMax gives every
    * language the same allocation unless it simply doesn't have the
    * tokens (then the surplus waterfalls to the rest).
    *
    * Exact integer algebra on the ≤|langs| model frame: languages
    * order by an ascending unique key (token mass · 2¹⁶ + a 4-nibble
    * md5 tie-break, widened through DECIMAL(38,0)); prefix mass and
    * rank come from [[ModelFrames.exclusivePrefixSum]] (never a
    * single-partition window); each row's waterfill candidate is
    * `(budget − prefix) div (m − rank)` and the FIRST capped row
    * (min key among `n_tokens > cand`) fixes the level. The level is
    * provably non-negative (each earlier uncapped row leaves
    * `budget − prefix ≥ 0`), so `div`-vs-floor divergence on
    * negative candidates can never reach an output value — negative
    * candidates only ever feed the `n_tokens > cand` verdict, which
    * both engines agree on by sign alone. The corpus is touched by
    * exactly ONE aggregate (per-lang token mass); everything after
    * is model-frame algebra, unchanged at 100 TB.
    */
  def unimax(documents: DataFrame, budgetPct: Long = 60L): DataFrame = {
    require(budgetPct >= 0 && budgetPct <= 100,
      s"budgetPct ($budgetPct) must be in [0, 100]")
    val perLang = documents
      .select(col("lang"),
        size(graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
    val totals = perLang.agg(sum("n_tokens").as("tot"), count(lit(1)).as("m"))
    val keyed = perLang.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("m"),
        expr(s"tot * $budgetPct div 100").as("budget_tokens"),
        expr("CAST(n_tokens AS DECIMAL(38,0)) * 65536 " +
          "+ CAST(conv(substring(md5(lang), 1, 4), 16, 10) AS BIGINT)")
          .as("k"))
      .localCheckpoint() // prefix line, rank line, and output read it
    val prefix = ModelFrames.exclusivePrefixSum(keyed, "k", "n_tokens", "p")
    val rank = ModelFrames.exclusivePrefixSum(
      keyed.withColumn("one", lit(1L)), "k", "one", "i")
    val cand = keyed
      .join(broadcast(prefix), Seq("k"))
      .join(broadcast(rank), Seq("k"))
      .withColumn("cand", expr("(budget_tokens - p) div (m - i)"))
      .localCheckpoint() // the boundary aggregate + the output read it
    val bound = cand.filter(col("n_tokens") > col("cand"))
      .agg(min(struct(col("k"), col("cand"))).as("b"))
      .select(col("b.k").as("jk"), col("b.cand").as("level_tokens"))
    cand.crossJoin(broadcast(bound))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("budget_tokens"), col("level_tokens"),
        when(col("jk").isNull || col("k") < col("jk"), col("n_tokens"))
          .otherwise(least(col("n_tokens"), col("level_tokens")))
          .as("alloc_tokens"))
      .withColumn("capped", col("alloc_tokens") < col("n_tokens"))
  }
}
