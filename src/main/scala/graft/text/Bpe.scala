package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Rounds

/** Distributed BYTE-PAIR-ENCODING training — the artifact a
  * pretraining pipeline builds FIRST: a merge table learned from the
  * corpus, plus the corpus re-segmented under it. Word-level BPE in
  * the classic formulation: ONE corpus scan builds the (word, freq)
  * vocabulary, and every training round after that is vocabulary-
  * sized — at 100 TB the corpus has billions of rows but the word
  * vocabulary has millions, so K merge rounds cost K small
  * aggregations, not K corpus passes.
  *
  * Words are carried as DOUBLE-DELIMITED SYMBOL STRINGS
  * (`__l__o__w__`), which makes the merge a single literal
  * `replace('_a__b_' → '_ab_')`: the pattern consumes only the INNER
  * half of each boundary delimiter, so consecutive occurrences (a
  * run like `aaaa` under pair (a,a)) keep the outer halves they
  * share and the left-to-right non-overlapping replace finds exactly
  * the canonical leftmost-greedy merge set — `aaaa → [aa][aa]`, not
  * `[aa][a][a]` (single delimiters get consumed by the first match
  * and silently skip run-adjacent occurrences; the multiplicity spec
  * pins this). The delimiter cannot occur inside a symbol (words are
  * lowercase alphabetic), so `_a__b_` anchors complete symbols only,
  * and both engines share replace's scan semantics, so the oracle
  * replays training bit for bit. Each round:
  *
  *  1. adjacent-pair counts: one map-side-combined aggregate over
  *     the vocabulary (pairs weighted by word frequency);
  *  2. the merge pair: a single `max(struct(cnt, a, b))` — the
  *     integer-argmax discipline (highest count, ties to the
  *     largest (a, b) pair, deterministic on any engine);
  *  3. rewrite: the one-row merge broadcasts and every word
  *     rewrites map-side.
  *
  * Rounds materialize through [[Rounds]] (lineage would otherwise
  * grow by the full pair-count subtree per round), so the loop
  * inherits the reliable-checkpoint opt-in. A corpus whose
  * vocabulary runs out of adjacent pairs before `steps` merges
  * yields fewer merge rows (never a failure).
  */
object Bpe {

  /** Shared corpus → (encoded word, frequency) aggregation: the
    * [[TextAnalysis.tokens]] split, lowercase-alphabetic words only
    * (the delimiter must not occur inside a symbol), each encoded as
    * `__c__h__a__r__`. */
  def wordVocab(documents: DataFrame): DataFrame =
    documents
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(col("tok").rlike("^[a-z]+$"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .select(concat(lit("__"),
        regexp_replace(col("tok"), "(.)", "$1__")).as("w"), col("freq"))

  private def syms(w: Column): Column = filter(split(w, "_"), x => x =!= "")

  /** Weighted adjacent-pair counts of the current vocabulary. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("freq"), syms(col("w")).as("s"))
      .filter(size(col("s")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(s) - 1), i -> " +
          "named_struct('a', element_at(s, i), 'b', element_at(s, i + 1)))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("cnt"))

  /** Train `steps` merges. Returns (merge table `(step, sym_a,
    * sym_b, pair_cnt)`, final re-segmented vocabulary `(w, freq)`).
    */
  def fit(documents: DataFrame, steps: Int): (DataFrame, DataFrame) = {
    require(steps >= 1, s"steps ($steps) must be positive")
    var vocab = Rounds.materialize(wordVocab(documents))
    val merges = Seq.newBuilder[DataFrame]
    for (step <- 1 to steps) {
      // one-row argmax frame; materialized so both its consumers
      // (the merge table and the rewrite) read a row, not the
      // pair-count lineage
      val best = Rounds.materialize(pairCounts(vocab)
        .agg(max(struct(col("cnt"), col("a"), col("b"))).as("m"))
        .select(lit(step.toLong).as("step"), col("m.a").as("sym_a"),
          col("m.b").as("sym_b"), col("m.cnt").as("pair_cnt"))
        .filter(col("sym_a").isNotNull)) // no pairs left: no merge row
      merges += best
      vocab = Rounds.materialize(
        vocab.join(broadcast(best), lit(true), "left")
          .select(
            // a missing merge row (exhausted corpus) leaves words as
            // they are — the left join + guard keep the loop total
            when(col("sym_a").isNull, col("w")).otherwise(expr(
              "replace(w, concat('_', sym_a, '__', sym_b, '_'), " +
                "concat('_', sym_a, sym_b, '_'))")).as("w"),
            col("freq")))
    }
    (merges.result().reduce(_ unionByName _), vocab)
  }

  /** The learned merge table, in training order. */
  def merges(documents: DataFrame, steps: Int = 8): DataFrame =
    mergeTable(fit(documents, steps))

  /** [[merges]] over an already-trained [[fit]] result — the K-round
    * recurrence is the expensive part, so a caller consuming both
    * the merge table and the segmentation (SparkEntry's bpe queries)
    * fits ONCE and reads both views (the fit's frames are
    * materialized, so re-reading them is row-scan cheap). */
  def mergeTable(fitted: (DataFrame, DataFrame)): DataFrame =
    fitted._1.orderBy("step")

  /** Corpus segment counts under the learned merges: for each final
    * token, the distinct word types containing it and its total
    * corpus occurrences (frequency-weighted, multiplicity counted).
    */
  def tokenCounts(documents: DataFrame, steps: Int = 8,
                  k: Int = 30): DataFrame =
    tokenCountsOf(fit(documents, steps), k)

  /** A learned merge table applied to a delimited-word expression:
    * the K replaces nest IN TRAINING ORDER inside one expression, so
    * application is a single codegen'd projection — the model
    * re-enters the plan as literal strings (the PCA-apply
    * convention), no join, no shuffle, no per-row state. Symbols are
    * lowercase alphabetic by [[wordVocab]] construction, so inlining
    * them into the SQL text is quote-safe. */
  def applyMergesCol(wCol: String, merges: Seq[(String, String)]): Column =
    expr(merges.foldLeft(wCol) { case (e, (a, b)) =>
      s"replace($e, '_${a}__${b}_', '_$a${b}_')" })

  /** Per-language TOKENIZER FERTILITY under the fitted merges —
    * tokens-per-word and chars-per-token, the numbers that decide
    * whether a tokenizer is fair to each language in the mix (a
    * high-fertility language pays more sequence positions for the
    * same text, so it is implicitly down-weighted at a fixed token
    * budget; the usual remedy is vocabulary rebalancing, and THIS is
    * the audit that triggers it). Both ratios are exact integer ppm
    * (`·10⁶ div`), over the alphabetic-word vocabulary the BPE
    * trains on.
    *
    * Cost: one corpus scan to the per-(lang, word) vocabulary, one
    * projection applying the K merges ([[applyMergesCol]] — the
    * merge table is model-sized and already on the driver), one
    * language-keyed aggregate of the vocabulary. The corpus is never
    * re-segmented row by row.
    */
  def fertility(documents: DataFrame,
                fitted: (DataFrame, DataFrame)): DataFrame = {
    val mergeRows = fitted._1.orderBy("step")
      .select("sym_a", "sym_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    documents
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(col("tok").rlike("^[a-z]+$"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("freq"))
      .select(col("lang"), col("freq"), length(col("tok")).as("chars"),
        concat(lit("__"), regexp_replace(col("tok"), "(.)", "$1__")).as("w"))
      .withColumn("n_syms",
        size(syms(applyMergesCol("w", mergeRows))).cast("long"))
      .groupBy("lang")
      .agg(sum("freq").as("n_words"),
        sum(col("freq") * col("n_syms")).as("n_tokens"),
        sum(col("freq") * col("chars")).as("n_chars"))
      // per-language corpus token counts exceed int64/10⁶ at the
      // 100 TB design point — both products widen through
      // DECIMAL(38,0) (the Events.burst / tokenBudget convention)
      .withColumn("fertility_ppm", expr(
        "CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000 " +
          "div n_words AS BIGINT)"))
      .withColumn("chars_per_token_ppm", expr(
        "CAST(CAST(n_chars AS DECIMAL(38,0)) * 1000000 " +
          "div n_tokens AS BIGINT)"))
  }

  /** [[tokenCounts]] over an already-trained [[fit]] result. */
  def tokenCountsOf(fitted: (DataFrame, DataFrame), k: Int): DataFrame = {
    val (_, vocab) = fitted
    vocab
      .select(col("w"), col("freq"), explode(syms(col("w"))).as("token"))
      .groupBy("token")
      .agg(countDistinct("w").as("n_words"), sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
  }
}
