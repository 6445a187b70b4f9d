package graft

import org.apache.spark.sql.functions._

import graft.ops.{AsofJoin, Relational}

class AsofJoinSpec extends SparkSpec {

  test("backward as-of: latest right at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 9L, "r9"))
      .toDF("k", "t", "payload")
    val out = AsofJoin.join(left, right, "k", "t", "t",
        Map("payload" -> "matched"))
      .select("k", "t", "tag", "matched")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSet
    assert(out == Set(
      (1L, 10L, "a", "r10"),  // tie: right at equal ts is visible
      (1L, 20L, "b", "r15"),
      (2L, 5L, "c", null)))   // nothing at-or-before: left-outer null
  }

  test("seq tiebreak defines visibility at equal timestamps") {
    import spark.implicits._
    val left = Seq((1L, 10L, 5L)).toDF("k", "t", "s")
    val rightBefore = Seq((1L, 10L, 4L, "wins")).toDF("k", "t", "s", "p")
    val rightAfter = Seq((1L, 10L, 6L, "loses")).toDF("k", "t", "s", "p")
    def run(r: org.apache.spark.sql.DataFrame) =
      AsofJoin.join(left, r, "k", "t", "t", Map("p" -> "p"),
        seq = Some(("s", "s"))).select("p").head().getString(0)
    assert(run(rightBefore) == "wins")
    assert(run(rightAfter) == null)
  }

  test("generic operator reproduces the specialized attribution query") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).toSet
    val generic = canon(Relational.q28AsofGeneric(spark, sf))
    val special = canon(Relational.q18AsofAttribution(spark, sf))
    assert(generic == special && generic.nonEmpty)
  }
}
