package graft

import graft.ops.Sampling

class SamplingSpec extends SparkSpec {

  test("temperature mixing flattens the source distribution") {
    import spark.implicits._
    // 90/10 skew: α=0.5 should boost the small source and shave the big
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++
      (91 to 100).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val out = Sampling.temperatureMix(docs, alpha = 0.5).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("raw_share"), r.getAs[Double]("temp_share"),
          r.getAs[Double]("boost"))).toMap
    val (bigRaw, bigTemp, bigBoost) = out("big")
    val (smallRaw, smallTemp, smallBoost) = out("small")
    assert(bigRaw == 0.9 && smallRaw == 0.1)
    assert(smallTemp > smallRaw && bigTemp < bigRaw) // flattened
    assert(smallBoost > 1.0 && bigBoost < 1.0)
    assert(math.abs(bigTemp + smallTemp - 1.0) < 1e-3) // still a distribution
  }

  test("leakage-safe split never separates a near-duplicate pair") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val split = Sampling.leakageSafeSplit(docs)
    val byDoc = split.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("keep_doc_id"), r.getAs[String]("split"))).toMap
    assert(byDoc.size == docs.count())
    // both splits are populated and keeper-hash determines membership
    assert(byDoc.values.map(_._2).toSet == Set("train", "val"))
    byDoc.foreach { case (_, (keeper, s)) =>
      assert(s == byDoc(keeper)._2, s"doc and its keeper split apart") }
    // every verified near-dup pair lands on one side of the boundary
    val pairs = graft.dedup.Dedup.minhashLsh(docs, 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(byDoc(a)._2 == byDoc(b)._2, s"pair ($a,$b) straddles the split") }
  }

  test("fixed-size sample returns exactly the n smallest-hash rows") {
    import org.apache.spark.sql.functions.{col, md5}
    val docs = Tables.documents(spark, sf)
    val got = Sampling.fixedSizeSample(docs, 20).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val expected = docs
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .collect().sortBy(_.getAs[String]("h")).take(20)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected && got.size == 20)
  }

  test("temperature apply boosts small sources and realizes its own rates") {
    import spark.implicits._
    val docs = ((1 to 900).map(i => (i.toLong, "big")) ++
      (901 to 1000).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val out = Sampling.temperatureApply(docs).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    val rate = bySource.view.mapValues(_.head.getAs[Int]("rate16")).toMap
    // α=0.5 flattening: the small source keeps a larger fraction
    assert(rate("small") > rate("big"))
    // the realized keep fraction tracks the declared rate16/16 —
    // md5 nibbles are uniform, so allow sampling noise
    bySource.foreach { case (src, rows) =>
      val kept = rows.count(_.getAs[Boolean]("kept")).toDouble / rows.length
      assert(math.abs(kept - rate(src) / 16.0) < 0.11,
        s"$src realized $kept vs declared ${rate(src) / 16.0}")
    }
  }

  test("per-stratum fixed-n keeps exactly n smallest-hash rows per source") {
    val n = 3
    val docs = Tables.documents(spark, sf)
    val out = Sampling.fixedPerStratum(docs, n).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    val sources = docs.select("source").distinct().count()
    assert(bySource.size == sources)
    bySource.foreach { case (src, rows) =>
      assert(rows.length == n, s"$src: ${rows.length} rows")
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to n).toSeq)
      // the kept rows really are the stratum's n smallest hashes
      val cutoff = rows.map(_.getAs[String]("h")).max
      val below = docs.filter(org.apache.spark.sql.functions.col("source") === src)
        .select(org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("doc_id").cast("string")).as("h"))
        .filter(org.apache.spark.sql.functions.col("h") < cutoff).count()
      assert(below < n, s"$src: $below hashes below the kept cutoff")
    }
    // deterministic: a second run returns the identical frame
    val again = Sampling.fixedPerStratum(docs, n).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("leak audit reports zero cross-split pairs for the keeper split") {
    val docs = Tables.documents(spark, sf)
    val r = Sampling.leakAudit(docs).collect().head
    val nPairs = graft.dedup.Dedup.minhashLsh(docs, 0.9).count()
    assert(r.getAs[Long]("n_pairs") == nPairs && nPairs > 0)
    // the whole point of splitting on the keeper id
    assert(r.getAs[Long]("n_cross_split") == 0L)
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_val") == docs.count())
  }

  test("leak audit fires on a split that ignores near-dup structure") {
    // positive control: iters=0 degenerates the keeper to the doc
    // itself (a plain per-doc hash split), so near-dup pairs land in
    // different splits and the audit must catch at least one
    val r = Sampling.leakAudit(Tables.documents(spark, sf), iters = 0)
      .collect().head
    assert(r.getAs[Long]("n_cross_split") > 0L,
      "audit failed to flag a leaky split")
  }

  test("temperature shares sum to one on real data") {
    val rows = Sampling.temperatureMix(Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("temp_share")).sum - 1.0) < 1e-2)
    assert(math.abs(rows.map(_.getAs[Double]("raw_share")).sum - 1.0) < 1e-2)
  }
}
