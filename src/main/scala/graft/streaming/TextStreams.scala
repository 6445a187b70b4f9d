package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** One scored document: bigram-occurrence count and the integer-ppm
  * LM score (the bucket verdict joins on downstream from the cuts
  * frame; sub-bigram docs carry no LmScore at all). */
case class LmScore(n_bigrams: Long, score_ppm: Long)

/** Streaming text-quality operators. */
object TextStreams {

  /** LIVE HYGIENE ROUTE — [[TextAnalysis.encodingFlags]]' cascade on
    * the document stream, stateless (the `CdcStreams.dlqRoute`
    * discipline for text): every arriving doc carries its mojibake /
    * control-byte / whitespace-run flags, the cleaning-delta char
    * count, and an `is_dirty` verdict — split on it and the clean
    * side feeds tokenization while damaged docs land in a quarantine
    * sink WITH their diagnosis, instead of poisoning downstream
    * stats. One shared projection with the batch audit, so the two
    * paths classify identically by construction.
    */
  def hygieneRoute(docs: DataFrame): DataFrame =
    TextAnalysis.encodingFlags(docs)
      .withColumn("is_dirty", col("r") + col("c") + col("m") > 0)

  /** Streaming twin of [[TextAnalysis.lmBuckets]] — the live CCNet
    * quality gate: arriving documents score against a batch-fitted
    * [[TextAnalysis.LmGateModel]] (the anomalyStream refresh
    * contract: the model is fitted out-of-band and swapped in) and
    * bucket against its per-language tercile cuts. Fully STATELESS —
    * one pass per doc over its own bigrams against the broadcast ppm
    * map (per-doc work bounded by document length), then a
    * stream-static broadcast join to the cuts frame — so the gate
    * scales with ingest parallelism and restarts free.
    *
    * Semantics pinned to the batch operator (spec: identical rows
    * for a corpus scored by its own fit): per-occurrence ppm sum
    * divided once (integer div), sub-bigram docs emit explicit
    * `unscored` rows, and a language absent from the cuts falls to
    * `head` exactly as the batch left-join does. The one extension
    * the stream needs: a bigram unseen at fit time scores 0 ppm —
    * maximum surprise, the conservative verdict for novel text.
    */
  def lmGateStream(docs: DataFrame, model: TextAnalysis.LmGateModel)
                  (implicit spark: SparkSession): DataFrame = {
    val bPpm = spark.sparkContext.broadcast(model.ppm)
    // bounded-model probe (the contamination-bloom UDF precedent):
    // tokenization mirrors shingle_list(text, 2) EXACTLY — trim of
    // ASCII space 0x20 ONLY (Java String.trim also strips tabs and
    // newlines, which the batch expression keeps inside tokens),
    // split on single spaces with empties kept, pairs joined by one
    // space
    def trimSpaces(s: String): String = {
      var b = 0
      var e = s.length
      while (b < e && s.charAt(b) == ' ') b += 1
      while (e > b && s.charAt(e - 1) == ' ') e -= 1
      s.substring(b, e)
    }
    val score = udf { text: String =>
      val t = trimSpaces(Option(text).getOrElse("")).split(" ", -1)
      if (t.length < 2) None
      else {
        val m = bPpm.value
        var s = 0L
        var i = 0
        while (i < t.length - 1) {
          s += m.getOrElse(t(i) + " " + t(i + 1), 0L)
          i += 1
        }
        Some(LmScore(t.length - 1L, s / (t.length - 1L)))
      }
    }
    docs.select(col("doc_id"), col("lang"), score(col("text")).as("s"))
      .join(broadcast(model.cuts), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("s.n_bigrams"), lit(0L)).as("n_bigrams"),
        col("s.score_ppm").as("score_ppm"),
        when(col("s").isNull, lit("unscored"))
          .when(col("s.score_ppm") <= col("b1"), lit("tail"))
          .when(col("s.score_ppm") <= col("b2"), lit("middle"))
          .otherwise(lit("head")).as("bucket"))
  }
}
