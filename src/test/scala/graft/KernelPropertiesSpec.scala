package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen

import graft.dedup.Dedup

/** Property tests for the hand-rolled byte kernels: each must agree
  * with the compositional Spark-builtin definition on arbitrary
  * input, including the awkward cases (empty strings, consecutive
  * spaces, short docs).
  */
class KernelPropertiesSpec extends SparkSpec {

  private val word = Gen.oneOf("the", "fast", "key", "über", "naïve", "x", "", "a")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ", " ")
    pad <- Gen.oneOf("", " ", "  ")
  } yield pad + ws.mkString(sep) + pad

  test("shingle_set equals the compositional builtin definition") {
    import spark.implicits._
    val texts = (1 to 200).flatMap(_ => textGen.sample).distinct
    val df = texts.toDF("text")
    val toks = split(trim(col("text")), " ")
    val reference = array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i, lit(3)))))
        .otherwise(array().cast("array<string>")))
    val rows = df.select(col("text"),
      Dedup.shingleArray(col("text")).as("fast"), reference.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1).toList == r.getSeq[String](2).toList,
        s"text=${r.getString(0).replace(" ", "␣")}")
    }
  }

  test("shingle_list equals the compositional non-distinct definition") {
    import spark.implicits._
    val texts = (1 to 200).flatMap(_ => textGen.sample).distinct
    val df = texts.toDF("text")
    val toks = split(trim(col("text")), " ")
    val reference =
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", slice(toks, i, lit(2)))))
        .otherwise(array().cast("array<string>"))
    val rows = df.select(col("text"),
      graft.functions.expressions.shingle_list(col("text"), 2).as("fast"),
      reference.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1).toList == r.getSeq[String](2).toList,
        s"text=${r.getString(0).replace(" ", "␣")}")
    }
  }

  test("rolling hash matches a BigInt reference implementation") {
    val mod = BigInt(2).pow(61) - 1
    val samples = (1 to 300).flatMap(_ => Gen.asciiPrintableStr.sample) ++
      Seq("", "a", "ü§∂ multi-byte ✓", "x" * 5000)
    samples.foreach { s =>
      val expected = s.getBytes("UTF-8")
        .foldLeft(BigInt(0))((h, b) => (h * 31 + (b & 0xff)) mod mod)
      assert(BigInt(graft.functions.HashOps.rollingHash(
        UTF8String.fromString(s))) == expected, s"input=$s")
    }
  }

  test("byte entropy matches a multiset reference on arbitrary text") {
    def reference(s: String): Double = {
      val bs = s.getBytes("UTF-8")
      if (bs.isEmpty) 0.0
      else bs.groupBy(identity).values.map { g =>
        val p = g.length.toDouble / bs.length
        -p * (math.log(p) / math.log(2))
      }.sum
    }
    val samples = (1 to 300).flatMap(_ => Gen.asciiPrintableStr.sample) ++
      Seq("", "a", "ü§∂ multi-byte ✓", "x" * 5000)
    samples.foreach { s =>
      val got = graft.functions.HashOps.byteEntropy(UTF8String.fromString(s))
      assert(math.abs(got - reference(s)) < 1e-9, s"input=$s")
      val n = s.getBytes("UTF-8").length.toDouble
      assert(got >= 0.0 && got <= 8.0 + 1e-9 &&
        (n == 0 || got <= (math.log(n) / math.log(2)) + 1e-9))
      // permutation invariance: entropy sees the multiset, not order
      assert(math.abs(graft.functions.HashOps.byteEntropy(
        UTF8String.fromString(new String(s.toCharArray.reverse))) -
        got) < 1e-9 || s.getBytes("UTF-8").length != s.length)
    }
  }

  test("fused jaccard equals the set-semantics reference, dups and all") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val elem = Gen.oneOf("a", "b", "cc", "d", "", "é")
    val arr = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, elem))
    def toAD(xs: List[String]): ArrayData =
      ArrayData.toArrayData(xs.toArray.map(UTF8String.fromString))
    (1 to 300).flatMap(_ => Gen.zip(arr, arr).sample).foreach { case (a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val expected =
        if ((sa ++ sb).isEmpty) 0.0
        else (sa intersect sb).size.toDouble / (sa ++ sb).size
      val got = graft.functions.HashOps.jaccard(toAD(a), toAD(b))
      assert(math.abs(got - expected) < 1e-12, s"a=$a b=$b")
    }
  }

  test("vec_sub is exact float subtraction at any dimension") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val gen = for {
      n <- Gen.choose(0, 128)
      a <- Gen.listOfN(n, Gen.chooseNum(-1e6f, 1e6f))
      b <- Gen.listOfN(n, Gen.chooseNum(-1e6f, 1e6f))
    } yield (a.toArray, b.toArray)
    (1 to 200).flatMap(_ => gen.sample).foreach { case (a, b) =>
      val got = graft.functions.HashOps.subFF(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b)).toFloatArray()
      assert(got.toSeq == a.zip(b).map { case (x, y) => x - y }.toSeq)
    }
  }

  test("znorm distance is offset/amplitude invariant and NaN on flat windows") {
    import graft.functions.HashOps
    val zq = graft.ops.Events.znormPattern(
      Seq(0.0, 0.0, 1.0, 2.0, 4.0, 2.0, 1.0, 0.0))
    val winGen = Gen.listOfN(8, Gen.choose(-50.0, 50.0))
    val cases = (1 to 200).flatMap(_ => winGen.sample).filter { w =>
      val m = w.sum / w.length
      w.map(x => (x - m) * (x - m)).sum > 1e-6 // non-flat
    }
    assert(cases.nonEmpty)
    cases.foreach { w0 =>
      val w = w0.toArray
      val d = HashOps.znormDistD(w, zq)
      assert(!d.isNaN && d >= 0.0)
      // the UCR claim: z-normalization erases affine transforms of
      // the series (positive scale + shift)
      val affine = w.map(x => 7.0 * x + 1000.0)
      assert(math.abs(HashOps.znormDistD(affine, zq) - d) < 1e-6,
        s"affine variance: $d vs ${HashOps.znormDistD(affine, zq)}")
      // the query is z-normalized: a window equal to it scores 0
      assert(HashOps.znormDistD(zq, zq) < 1e-12)
    }
    // flat windows cannot be z-normalized
    assert(HashOps.znormDistD(Array.fill(8)(3.25), zq).isNaN)
    // the ArrayData kernel mirrors the double-array one bit-for-bit
    cases.take(20).foreach { w0 =>
      val w = w0.toArray
      val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(w)
      val zqAd = new org.apache.spark.sql.catalyst.util.GenericArrayData(zq)
      assert(java.lang.Double.compare(
        HashOps.znormDist(ad, zqAd), HashOps.znormDistD(w, zq)) == 0)
    }
  }

  test("LSH plane coefficients are uniform in [-1, 1)") {
    val coefs = for {
      table <- 0 until 8; p <- 0 until 16; j <- 0 until 64
    } yield graft.functions.HashOps.planeCoef(table, p, j)
    assert(coefs.forall(c => c >= -1.0 && c < 1.0),
      s"out of range: ${coefs.filterNot(c => c >= -1.0 && c < 1.0).take(3)}")
    val mean = coefs.sum / coefs.size
    val variance = coefs.map(c => (c - mean) * (c - mean)).sum / coefs.size
    // uniform[-1,1): mean 0, variance 1/3 — wide tolerances, this is
    // a bias check (the old kernel spanned [-1,3) with mean +1)
    assert(math.abs(mean) < 0.05, s"biased planes: mean=$mean")
    assert(math.abs(variance - 1.0 / 3.0) < 0.05, s"variance=$variance")
  }

  test("minhash band count and determinism across evaluations") {
    import spark.implicits._
    val df = (1 to 50).flatMap(_ => textGen.sample).distinct.toDF("text")
    val a = df.select(graft.functions.expressions.minhash_bands(
      Dedup.shingleArray(col("text")), 64, 16).as("b")).collect()
    val b = df.select(graft.functions.expressions.minhash_bands(
      Dedup.shingleArray(col("text")), 64, 16).as("b")).collect()
    assert(a.map(_.getSeq[Long](0)).zip(b.map(_.getSeq[Long](0)))
      .forall { case (x, y) => x == y })
    assert(a.forall(_.getSeq[Long](0).length == 16))
  }

  test("bin_entropy on UTF-8 bytes equals byte_entropy on the text") {
    import spark.implicits._
    import graft.functions.expressions.{bin_entropy, byte_entropy}
    val texts = (1 to 200).flatMap(_ => textGen.sample).distinct
    val rows = texts.toDF("text")
      .select(byte_entropy(col("text")).as("t"),
        bin_entropy(encode(col("text"), "UTF-8")).as("b")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("shard assignment is near-uniform over arbitrary long keys") {
    import spark.implicits._
    // md5 of the decimal rendering has no visible structure: over 16k
    // sequential AND scattered keys each of 8 shards holds ~1/8 ± 20%
    val keys = ((0L until 8000L) ++ (0L until 8000L).map(_ * 1000003L + 7L))
      .toDF("doc_id")
    val counts = keys
      .groupBy(graft.ops.Sampling.shardId(col("doc_id"), 8).as("s"))
      .count().collect().map(r => r.getAs[Int]("s") -> r.getAs[Long]("count"))
      .toMap
    assert(counts.keySet == (0 until 8).toSet)
    val expect = 16000.0 / 8
    counts.values.foreach(n =>
      assert(math.abs(n - expect) < expect * 0.2, s"skewed: $counts"))
  }

  test("redaction is idempotent: a second pass changes nothing") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).limit(100)
    val once = graft.text.TextAnalysis.redact(docs)
      .select(col("doc_id"), col("redacted_md5").as("m1"))
    // re-redact the already-redacted text by rebuilding a documents
    // frame whose text IS the redacted output — the tags contain no
    // digits and no lowercase email shape, so nothing changes
    val redactedText = docs.select(col("doc_id"),
      regexp_replace(regexp_replace(col("text"),
        "[a-z0-9]+@[a-z0-9]+\\.[a-z]+", "<EMAIL>"), "[0-9]+", "<NUM>")
        .as("text"))
    val twice = graft.text.TextAnalysis.redact(redactedText)
      .select(col("doc_id"), col("redacted_md5").as("m2"),
        col("n_emails"), col("n_nums"))
    val joined = once.join(twice, "doc_id").collect()
    assert(joined.length == 100)
    joined.foreach { r =>
      assert(r.getAs[String]("m1") == r.getAs[String]("m2"))
      assert(r.getAs[Long]("n_emails") == 0L && r.getAs[Long]("n_nums") == 0L)
    }
  }

  test("curriculum boundary-count identity holds for arbitrary (P, n, r)") {
    // Sampling.curriculum rests on one arithmetic identity: counting
    // the NTILE boundary ranks at or below a rank equals the closed
    // form the oracle replays —
    //   #{k in 1..P-1 : (k*n) div P <= r}  ==  (P*r + P - 1) div n
    // for every 0 <= r < n. The operator computes the left side
    // (broadcast boundary pairs, map-side counting); the DuckDB twin
    // computes the right; this pins them equal on arbitrary inputs
    // including the degenerate n < P regime where boundary ranks
    // collide and phases skip by design.
    val gen = for {
      p <- Gen.choose(2, 16)
      n <- Gen.choose(1L, 10000L)
      r <- Gen.choose(0L, n - 1)
    } yield (p, n, r)
    (1 to 500).flatMap(_ => gen.sample).foreach { case (p, n, r) =>
      val byCount = (1 until p).count(k => (k.toLong * n) / p <= r)
      val closed = ((p.toLong * r + p - 1) / n).toInt
      assert(byCount == closed, s"p=$p n=$n r=$r")
    }
    // exhaustive sweep of the small regime on top of the random one
    for (p <- 2 to 12; n <- 1L to 40L; r <- 0L until n) {
      val byCount = (1 until p).count(k => (k.toLong * n) / p <= r)
      assert(byCount == ((p * r + p - 1) / n).toInt, s"p=$p n=$n r=$r")
    }
  }
}
