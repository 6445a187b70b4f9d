package graft

import graft.text.TextAnalysis

class TextSpec extends SparkSpec {

  test("boilerplate removal kills frequent segments everywhere, first copy included") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    def uniq(tag: String) = (1 to 8).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler ${uniq("x")}"),
      (2L, s"$boiler ${uniq("y")}"),
      (3L, uniq("z"))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplate(docs, segTokens = 8, minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_segs"), r.getAs[Long]("n_boiler_segs"),
          r.getAs[Double]("retained_ratio"))).toMap
    // unlike chunkDedup, doc 1 loses ITS copy of the shared segment too
    assert(out(1L) == (2L, 1L, 0.5))
    assert(out(2L) == (2L, 1L, 0.5))
    assert(out(3L) == (1L, 0L, 1.0))
  }

  test("zipf fits the rank-frequency line over a deterministic ranking") {
    import spark.implicits._
    // counts a=4, b=2, c=1 → OLS over (ln rank, ln n) has slope ≈ -1.2337
    val docs = Seq((1L, "a a a a b b c", "s1")).toDF("doc_id", "text", "source")
    val row = TextAnalysis.zipf(docs).collect().head
    assert(row.getAs[Long]("n_terms") == 3L)
    assert(math.abs(row.getAs[Double]("zipf_slope") + 1.2337) < 0.001)
  }

  test("zipf slope is negative for every source on real data") {
    val rows = TextAnalysis.zipf(Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("zipf_slope") < 0.0))
  }
}
