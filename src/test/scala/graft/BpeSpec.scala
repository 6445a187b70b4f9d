package graft

import graft.text.Bpe

/** BPE training on the classic planted vocabulary (low ×5, lower ×2,
  * newest ×6, widest ×3): the full 8-step merge sequence is known in
  * closed form under the deterministic argmax rule (highest count,
  * ties to the largest (a, b) pair), hand-derived:
  *
  *   es/st tie at 9 → (s,t); then (e,st); lo/ow tie at 7 → (o,w);
  *   (l,ow); ne/ew/w·est tie at 6 → (w,est); (n,e); (ne,west);
  *   wi/id/d·est tie at 3 → (w,i).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs() = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // one word per document — word frequency is what BPE trains on
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("the planted corpus trains the hand-derived merge sequence") {
    val got = Bpe.merges(docs(), steps = 8)
      .collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("sym_a"),
        r.getAs[String]("sym_b"), r.getAs[Long]("pair_cnt"))).toSeq
    val expected = Seq(
      (1L, "s", "t", 9L), (2L, "e", "st", 9L),
      (3L, "o", "w", 7L), (4L, "l", "ow", 7L),
      (5L, "w", "est", 6L), (6L, "n", "e", 6L),
      (7L, "ne", "west", 6L), (8L, "w", "i", 3L))
    assert(got === expected)
  }

  test("token counts under the learned merges segment the corpus correctly") {
    val got = Bpe.tokenCounts(docs(), steps = 8, k = 30)
      .collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("cnt"))).toMap
    // after 8 merges: low→[low], lower→[low,e,r], newest→[newest],
    // widest→[wi,d,est]
    assert(got("low") === (2L, 7L))    // 'low' ×5 and inside 'lower' ×2
    assert(got("newest") === (1L, 6L))
    assert(got("est") === (1L, 3L))    // only widest still exposes est
    assert(got("e") === (1L, 2L))      // lower's residual e
    assert(got("r") === (1L, 2L))
    assert(got("wi") === (1L, 3L) && got("d") === (1L, 3L))
    assert(got.size === 7)
  }

  test("a pair-less corpus yields no merges and unchanged tokens") {
    val single = Seq((1L, "a b c a")).toDF("doc_id", "text")
    assert(Bpe.merges(single, steps = 3).collect().isEmpty)
    val toks = Bpe.tokenCounts(single, steps = 3, k = 10)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("cnt")).toMap
    assert(toks === Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
  }

  test("fertility: per-language ratios replay against a pure-Scala apply") {
    // two languages sharing a corpus-wide fit: the merge table is
    // global, fertility is per-language — replayed independently
    // with java String.replace (same leftmost non-overlapping
    // semantics as the SQL replace the operator nests)
    val docs = Seq(
      (1L, "low low lower low", "en"), (2L, "low newest newest", "en"),
      (3L, "widest newest low lower", "de"), (4L, "low newest", "de"))
      .toDF("doc_id", "text", "lang")
    val fitted = Bpe.fit(docs, 8)
    val got = Bpe.fertility(docs, fitted).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_chars"), r.getAs[Long]("fertility_ppm"),
          r.getAs[Long]("chars_per_token_ppm")))).toMap

    val merges = fitted._1.orderBy("step").collect()
      .map(r => (r.getAs[String]("sym_a"), r.getAs[String]("sym_b"))).toSeq
    def enc(tok: String) = "__" + tok.flatMap(c => c.toString + "__")
    def applySeq(w: String) = merges.foldLeft(w) { case (s, (a, b)) =>
      s.replace(s"_${a}__${b}_", s"_$a${b}_") }
    def nSyms(w: String) = w.split("_").count(_.nonEmpty)
    val corpus = Seq(("low low lower low", "en"), ("low newest newest", "en"),
      ("widest newest low lower", "de"), ("low newest", "de"))
    val byLang = corpus.flatMap { case (t, l) =>
      t.split(" ").map(l -> _) }.groupBy(_._1)
    byLang.foreach { case (lang, toks) =>
      val words = toks.map(_._2)
      val nw = words.size.toLong
      val nt = words.map(w => nSyms(applySeq(enc(w))).toLong).sum
      val nc = words.map(_.length.toLong).sum
      assert(got(lang) === ((nw, nt, nc, nt * 1000000L / nw,
        nc * 1000000L / nt)), s"lang $lang")
    }
    assert(got.size === 2)
  }

  test("merge multiplicity counts repeated pairs inside one word") {
    // 'aaaa' ×2: pairs (a,a) appear 3 times per word → cnt 6; after
    // the merge the leftmost-greedy rewrite gives [aa, aa]
    val rep = Seq((1L, "aaaa"), (2L, "aaaa")).toDF("doc_id", "text")
    val m = Bpe.merges(rep, steps = 2).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("sym_a"),
        r.getAs[String]("sym_b"), r.getAs[Long]("pair_cnt"))).toSeq
    assert(m === Seq((1L, "a", "a", 6L), (2L, "aa", "aa", 2L)))
  }
}
