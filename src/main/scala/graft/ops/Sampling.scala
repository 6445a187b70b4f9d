package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
