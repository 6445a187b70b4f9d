package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomPrefilter

class BloomPrefilterSpec extends SparkSpec {

  private def urgentKeys = Tables.orders(spark, sf)
    .filter(col("o_orderpriority") === "1-URGENT")
    .select("o_orderkey")

  test("bloom semi-join is row-identical to the plain semi-join") {
    val fact = Tables.lineitem(spark, sf)
    val keys = urgentKeys
    val bloomed = BloomPrefilter.semiJoin(fact, keys,
        "l_orderkey", "o_orderkey", expectedItems = 100000L)
      .select("l_orderkey", "l_linenumber")
    val plain = fact
      .join(keys, fact("l_orderkey") === keys("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("prefilter admits every member and prunes most non-members") {
    val fact = Tables.lineitem(spark, sf)
    val keys = urgentKeys
    val bloom = BloomPrefilter.keyBloom(keys, "o_orderkey", 100000L)
    val pre = BloomPrefilter.prefilter(fact, "l_orderkey", bloom)
    val total = fact.count()
    val kept = pre.count()
    val members = fact.join(keys,
      fact("l_orderkey") === keys("o_orderkey"), "left_semi").count()
    // no false negatives: every true member survives the cut
    assert(kept >= members)
    // the cut is real: non-members (~4/5 of the fact table at the
    // urgent-priority selectivity) mostly drop before any exchange.
    // fpp 3% ⇒ kept ≈ members + 0.03 · (total − members)
    assert(kept < members + (total - members) / 2,
      s"bloom pruned almost nothing: kept=$kept members=$members total=$total")
  }

  test("the bloom rides the plan as a scalar subquery, not a join") {
    val pre = BloomPrefilter.prefilter(Tables.lineitem(spark, sf),
      "l_orderkey", BloomPrefilter.keyBloom(urgentKeys, "o_orderkey", 100000L))
    val plan = pre.queryExecution.executedPlan.toString()
    assert(plan.contains("might_contain"), plan.take(500))
    assert(plan.contains("Subquery") || plan.contains("subquery"), plan.take(500))
  }

  test("saved bloom reloads to the identical survivor set; republish is a no-op") {
    val dir = s"/tmp/graft-test-bloom-${java.util.UUID.randomUUID()}"
    val bloom = BloomPrefilter.keyBloom(urgentKeys, "o_orderkey", 100000L)
    BloomPrefilter.save(spark, bloom, dir, version = 1L)
    // identical recomputation republished under the same version — the
    // immutable-artifact contract: second publish is a silent no-op
    BloomPrefilter.save(spark, bloom, dir, version = 1L)
    val loaded = BloomPrefilter.load(spark, dir)
    val fact = Tables.lineitem(spark, sf)
    val a = BloomPrefilter.prefilter(fact, "l_orderkey", bloom)
      .select("l_orderkey", "l_linenumber")
    val b = BloomPrefilter.prefilter(fact, "l_orderkey", loaded)
      .select("l_orderkey", "l_linenumber")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("numBits sizes by fpp and caps at 8 MiB") {
    assert(BloomPrefilter.numBits(1000L, 0.03) > 1000L)
    // tighter fpp costs more bits for the same item count
    assert(BloomPrefilter.numBits(1000L, 0.001) >
      BloomPrefilter.numBits(1000L, 0.03))
    assert(BloomPrefilter.numBits(Long.MaxValue / 2, 0.0001) ==
      8L * 1024 * 1024 * 8)
    intercept[IllegalArgumentException](BloomPrefilter.numBits(0L, 0.03))
  }
}
