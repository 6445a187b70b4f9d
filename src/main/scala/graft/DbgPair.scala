package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DbgPair {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .filter(col("doc_id").isin(1676L, 2026L))
    import graft.dedup.Dedup
    val sh = docs.select(col("doc_id"), Dedup.shingleArray(col("text")).as("sh"))
    val banded = sh.select(col("doc_id"),
      posexplode(graft.functions.expressions.minhash_bands(col("sh"), 64, 16)))
    banded.orderBy("doc_id", "pos").collect().grouped(16).foreach { g =>
      println(g.map(r => s"${r.getLong(0)}:${r.getInt(1)}=${r.getLong(2)}").mkString(" "))
    }
    spark.stop()
  }
}
