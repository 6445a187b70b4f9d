package graft

import org.apache.spark.sql.functions.col

import graft.ops.Graph

class GraphSpec extends SparkSpec {

  test("pagerank concentrates mass on a planted hub") {
    import spark.implicits._
    // star: 1..5 all point at 6; 6 points back at 1
    val edges = Seq((1L, 6L), (2L, 6L), (3L, 6L), (4L, 6L), (5L, 6L), (6L, 1L))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    assert(pr(6L) > pr(1L), s"hub not on top: $pr")
    assert(pr(1L) > pr(2L)) // 1 receives the hub's whole outflow
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L) && pr(4L) == pr(5L))
    // fixed-point conservation: mass never exceeds the scale (it can
    // only leak through integer floors and dangling nodes)
    assert(pr.values.sum <= 1000000000000L)
  }

  test("pagerank is bit-identical across different partitionings") {
    def run(shufflePartitions: Int): Map[Long, Long] = {
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
      try {
        val edges = graft.sim.Similarity.knnGraph(
          Tables.embeddings(spark, sf), col("vec_id") % 7 === 0, 3)
          .select("src", "dst")
        Graph.pageRank(edges).collect()
          .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
      } finally spark.conf.set("spark.sql.shuffle.partitions", 4)
    }
    // different shuffle widths change the order partial sums meet —
    // the fixed-point claim is that the result cannot care
    val a = run(3)
    val b = run(7)
    assert(a == b && a.nonEmpty)
    assert(a.values.forall(_ > 0))
    assert(a.values.sum <= 1000000000000L)
  }
}
