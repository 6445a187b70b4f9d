package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HashOps

class ExtensionsSpec extends SparkSpec {

  test("custom functions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT rolling_hash64('abc') AS rh,
        |       simhash64(split('a b c', ' ')) AS sh,
        |       shingle_set('a b c d', 3) AS sg,
        |       cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cs,
        |       minhash_bands(array('x', 'y'), 16, 4) AS mb,
        |       byte_entropy('abab') AS be,
        |       vec_sub(array(CAST(3.0 AS FLOAT), CAST(1.0 AS FLOAT)),
        |               array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS vs,
        |       znorm_dist(array(CAST(0.0 AS DOUBLE), 1.0, 0.0, 1.0),
        |                  array(CAST(-1.0 AS DOUBLE), 1.0, -1.0, 1.0)) AS zd
        |""".stripMargin).collect()(0)
    assert(row.getAs[Long]("rh") ==
      HashOps.rollingHash(UTF8String.fromString("abc")))
    assert(row.getSeq[String](row.fieldIndex("sg")).toList == List("a b c", "b c d"))
    assert(math.abs(row.getAs[Double]("cs") - 1.0) < 1e-12)
    assert(row.getSeq[Long](row.fieldIndex("mb")).length == 4)
    assert(math.abs(row.getAs[Double]("be") - 1.0) < 1e-12)
    assert(row.getSeq[Float](row.fieldIndex("vs")).toList == List(2.0f, 0.0f))
    // (0,1,0,1) z-normalizes to exactly the query (-1,1,-1,1): dist 0
    assert(row.getAs[Double]("zd") == 0.0)
  }

  test("extensions class wires every builder without error") {
    // getOrCreate would reuse the suite session (ignoring extensions
    // config), so exercise the injection hook directly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    assert(GraftExtensions.builders.map(_._1).distinct.size ==
      GraftExtensions.builders.size)
    // non-literal arg to an int parameter is rejected with a clear error
    val e = intercept[IllegalArgumentException] {
      GraftExtensions.builders.toMap.apply("shingle_set")(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal("x"),
          org.apache.spark.sql.catalyst.expressions.AttributeReference(
            "n", org.apache.spark.sql.types.IntegerType)()))
    }
    assert(e.getMessage.contains("literal integer"))
  }

  test("wrong-arity SQL calls fail with the expected signature") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT simhash64()").collect()
    }
    assert(e.getMessage.contains("simhash64(tokens)"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT shingle_set('x')").collect()
    }
    assert(e2.getMessage.contains("shingle_set(text, n)"), e2.getMessage)
  }
}
