package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cdc.Changelog

/** Compaction/merge algebra: the incremental-view-maintenance path
  * must be indistinguishable from full replay, split anywhere.
  */
class CdcSpec extends SparkSpec {

  private def cl: DataFrame = Changelog.fromEvents(Tables.events(spark, sf))

  private def canon(df: DataFrame): Set[String] =
    df.orderBy("doc_id").collect().map(_.mkString("|")).toSet

  test("merge(compact(old), delta) == full replay, any split point") {
    val full = canon(Changelog.latestState(cl))
    for (frac <- Seq(0.25, 0.5, 0.9)) {
      val split = (cl.agg(max("seq")).head().getLong(0) * frac).toLong
      val base = Changelog.compactState(cl.filter(col("seq") <= split))
      val delta = cl.filter(col("seq") > split)
      val merged = canon(Changelog.liveState(Changelog.mergeState(base, delta)))
      assert(merged == full, s"divergence at split fraction $frac")
    }
  }

  test("merge is associative: two deltas fold like one") {
    val maxSeq = cl.agg(max("seq")).head().getLong(0)
    val (s1, s2) = (maxSeq / 3, 2 * maxSeq / 3)
    val base = Changelog.compactState(cl.filter(col("seq") <= s1))
    val d1 = cl.filter(col("seq") > s1 && col("seq") <= s2)
    val d2 = cl.filter(col("seq") > s2)
    val twoStep = Changelog.mergeState(Changelog.mergeState(base, d1), d2)
    val oneStep = Changelog.mergeState(base, d1.unionByName(d2))
    assert(canon(twoStep) == canon(oneStep))
  }

  test("disorder audit counts late arrivals and their worst lag") {
    import spark.implicits._
    // seq order 1,2,3 but the middle change's event time regresses 40us
    val log = Seq(
      ("d1", 1L, 1000L, Changelog.Insert, "", "{}", 0.0),
      ("d1", 2L, 960L, Changelog.Update, "firstName", "{}", 0.0),
      ("d1", 3L, 1010L, Changelog.Update, "lastName", "{}", 0.0),
      ("d2", 4L, 500L, Changelog.Insert, "", "{}", 0.0),
      ("d2", 5L, 600L, Changelog.Update, "firstName", "{}", 0.0))
      .toDF("doc_id", "seq", "ts_us", "op", "field_path", "payload", "amount")
    val rows = Changelog.disorderAudit(log).orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(rows == List(
      ("d1", 3L, 50L, 1L, 40L),  // one late row, 40us behind the max
      ("d2", 2L, 100L, 0L, 0L)))
  }

  test("compacted state retains tombstones; live view drops them") {
    val compact = Changelog.compactState(cl)
    val dead = compact.filter(col("last_op") === Changelog.Delete).count()
    assert(dead > 0, "test data should contain deleted docs")
    assert(Changelog.liveState(compact).count() == compact.count() - dead)
    // a tombstone's seq must beat a stale update arriving late
    import spark.implicits._
    val baseRows = Seq(("d1", 10L, Changelog.Delete, "", "{}", 3L))
      .toDF("doc_id", "last_seq", "last_op", "last_field", "last_payload", "n_changes")
    val lateUpdate = Seq(("d1", 5L, Changelog.Update, "firstName", "{\"v\":1}", 0.0))
      .toDF("doc_id", "seq", "op", "field_path", "payload", "amount")
    val merged = Changelog.mergeState(baseRows, lateUpdate)
    assert(Changelog.liveState(merged).count() == 0)
    assert(merged.head().getAs[Long]("n_changes") == 4L)
  }
}
