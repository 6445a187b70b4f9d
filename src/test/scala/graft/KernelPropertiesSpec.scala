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
}
