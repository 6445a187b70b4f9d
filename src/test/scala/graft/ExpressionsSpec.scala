package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HashOps
import graft.functions.expressions._

class ExpressionsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def strArray(xs: String*): ArrayData =
    ArrayData.toArrayData(xs.toArray.map(UTF8String.fromString))

  test("hash64 is deterministic and spread") {
    val h1 = HashOps.hash64(UTF8String.fromString("spark"))
    val h2 = HashOps.hash64(UTF8String.fromString("spark"))
    val h3 = HashOps.hash64(UTF8String.fromString("sparl"))
    assert(h1 == h2)
    assert(h1 != h3)
  }

  test("minhash estimates jaccard") {
    // two 200-element sets sharing 100 elements: true J = 100/300
    val a = strArray((0 until 200).map(i => s"x$i"): _*)
    val b = strArray((100 until 300).map(i => s"x$i"): _*)
    val k = 128
    val sa = HashOps.minhash(a, k).toLongArray()
    val sb = HashOps.minhash(b, k).toLongArray()
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / k
    assert(math.abs(est - 1.0 / 3.0) < 0.15, s"estimate $est")
  }

  test("byteEntropy matches closed-form values") {
    def e(s: String): Double = HashOps.byteEntropy(UTF8String.fromString(s))
    assert(e("") == 0.0)
    assert(e("aaaa") == 0.0)
    assert(math.abs(e("abab") - 1.0) < 1e-12)            // 2 symbols, uniform
    assert(math.abs(e("abcdabcd") - 2.0) < 1e-12)        // 4 symbols, uniform
    // 3:1 mix: -(3/4)log2(3/4) - (1/4)log2(1/4)
    val expected = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25)) / math.log(2)
    assert(math.abs(e("aaab") - expected) < 1e-12)
    // multi-byte UTF-8 counts bytes, not chars: 'é' = 2 bytes, both unique
    assert(e("é") == 1.0)
  }

  test("frameMeans: exact truncating basis-point means per frame, " +
    "remainder bytes ignored, degenerate shapes empty") {
    def means(bytes: Array[Byte], n: Long): Seq[Long] =
      HashOps.frameMeans(bytes, n).toLongArray().toSeq
    // 2 frames of 3 bytes + 1 remainder byte (ignored)
    val b = Array[Byte](10, 20, 30, 100, 110, 120, 127)
    // frame sums 60 and 330: 60·10⁴/(3·255)=784, 330·10⁴/(3·255)=4313
    assert(means(b, 2) === Seq(784L, 4313L))
    // unsigned bytes: -1 reads as 255 → mean exactly 10000 bp
    assert(means(Array[Byte](-1, -1), 1) === Seq(10000L))
    // n_frames exceeding length ⇒ flen 0 ⇒ empty (caller filters too)
    assert(means(Array[Byte](1, 2), 3) === Seq.empty)
    assert(means(Array.emptyByteArray, 1) === Seq.empty)
    // codegen path agrees with the interpreted kernel
    import spark.implicits._
    val got = Seq(("x", b)).toDF("k", "p")
      .select(frame_means(col("p"), lit(2L)).as("m"))
      .head().getSeq[Long](0)
    assert(got.toSeq === Seq(784L, 4313L))
  }

  test("simhash: identical token sets collide, disjoint sets don't") {
    val a = strArray("alpha", "beta", "gamma", "delta")
    val b = strArray("alpha", "beta", "gamma", "delta")
    val c = strArray("epsilon", "zeta", "eta", "theta")
    assert(HashOps.simhash(a) == HashOps.simhash(b))
    assert(HashOps.simhash(a) != HashOps.simhash(c))
  }

  test("rolling hash: order-sensitive fingerprint") {
    val h = (s: String) => HashOps.rollingHash(UTF8String.fromString(s))
    assert(h("abc") == h("abc"))
    assert(h("abc") != h("acb"))
    assert(h("") == 0L)
  }

  test("cosine kernel matches manual computation") {
    val a = ArrayData.toArrayData(Array(1.0f, 0.0f, 2.0f))
    val b = ArrayData.toArrayData(Array(0.5f, 1.0f, 2.0f))
    val exp = (1.0 * 0.5 + 2.0 * 2.0) /
      (math.sqrt(1 + 4) * math.sqrt(0.25 + 1 + 4))
    assert(math.abs(HashOps.cosineFF(a, b) - exp) < 1e-12)
    assert(HashOps.cosineFF(a, a) > 1.0 - 1e-12)
  }

  test("charGramSet equals the SQL array_distinct/substring formulation, " +
    "incl. multi-byte codepoints and the sub-q regime") {
    import spark.implicits._
    val texts = Seq("abcabcab", "aaaaaa", "ab", "", "héllo wörld héllo",
      "日本語のテキスト日本", "x y x y x", "abc")
    for (q <- Seq(2, 3)) {
      val df = texts.toDF("text")
      val got = df.select(
          graft.functions.expressions.char_gram_set(col("text"), q).as("g"))
        .collect().map(_.getAs[Seq[String]]("g").toSet)
      val want = df.select(expr(
          s"CASE WHEN length(text) >= $q THEN " +
            s"array_distinct(transform(sequence(1, length(text) - $q + 1), " +
            s"i -> substring(text, i, $q))) " +
            s"ELSE CAST(array() AS ARRAY<STRING>) END").as("g"))
        .collect().map(_.getAs[Seq[String]]("g").toSet)
      assert(got.toSeq == want.toSeq, s"q=$q")
    }
    // direct kernel sanity: "abcabcab" q=3 → windows abc bca cab ×2
    assert(HashOps.charGramSet(UTF8String.fromString("abcabcab"), 3)
      .numElements() == 3)
  }

  test("shingleCounts equals explode+group counts of shingle_list") {
    import spark.implicits._
    val texts = Seq("a b a b a", "x", "", "  a  b ", "w1 w2 w3 w1 w2")
    for (n <- Seq(1, 2)) {
      val df = texts.toDF("text")
      val got = df.select(
          graft.functions.expressions.shingle_counts(col("text"), n).as("s"))
        .select(explode(col("s")).as("s"))
        .groupBy(col("s.g").as("g")).agg(sum(col("s.k")).as("k"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      val want = df.select(
          explode(graft.functions.expressions.shingle_list(col("text"), n))
            .as("g"))
        .groupBy("g").agg(count(lit(1)).as("k"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(got == want, s"n=$n")
    }
  }

  test("expressions run inside dataframe plans (codegen path)") {
    import spark.implicits._
    val df = Seq(("a b c a", Array(1.0f, 2.0f)), ("d e f g", Array(2.0f, 4.0f)))
      .toDF("text", "vec")
    val out = df.select(
      rolling_hash64(col("text")).as("rh"),
      simhash64(split(col("text"), " ")).as("sh"),
      minhash_sig(split(col("text"), " "), 16).as("mh"),
      cosine_sim(col("vec"), col("vec")).as("self_cos"),
      lsh_sig(col("vec"), 8, 0).as("lsh")).collect()
    assert(out.length == 2)
    assert(out.forall(r => math.abs(r.getAs[Double]("self_cos") - 1.0) < 1e-12))
    assert(out.forall(r => r.getAs[Seq[Long]]("mh").length == 16))
    // codegen result equals interpreted kernel result
    assert(out(0).getAs[Long]("rh") ==
      HashOps.rollingHash(UTF8String.fromString("a b c a")))
    // parallel vectors share every hyperplane side
    assert(out(0).getAs[Long]("lsh") == out(1).getAs[Long]("lsh"))
  }
}
