package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Union, Window => LWindow}
import org.apache.spark.sql.functions._

import graft.ops.RankSelect

/** RankSelect's POINT-MASS short-circuit: a located bin whose in-bin
  * min == max (a column where most of a group shares ONE value) must
  * never reach the pass-2 window sort — without the short-circuit
  * that bin serializes into a single task at scale, and a median is
  * LIKELY to land in the heavy bin. Pins (a) value-correctness on a
  * planted 90%-one-value group against a brute-force sorted
  * reference, (b) the STRUCTURAL plan guarantee that the window sort
  * sits above a `bmin != bmax` filter (heavy bins excluded by
  * construction, not by runtime luck), and (c) the null / tie-column
  * contracts around the fast path.
  */
class PointMassSpec extends SparkSpec {
  import spark.implicits._

  private val bins = 256

  // group "a": 900 copies of 50.0 (the point mass — its bin holds no
  // other value at 256 bins over [50, 100000]) + a spread tail;
  // group "b": uniform, no mass — both selected in one call
  private def planted(): DataFrame = {
    val a = Seq.fill(900)(("a", 50.0)) ++ (1 to 100).map(i => ("a", i * 1000.0))
    val b = (1 to 500).map(i => ("b", i * 7.0))
    (a ++ b).toDF("g", "v")
  }

  private def bruteRank(rows: Seq[Double], r: Int): Double = rows.sorted.apply(r)

  private def select(df: DataFrame, rs: Seq[Long],
                     materialize: Boolean = true): DataFrame =
    RankSelect.at(df, bins, RankSelect.floatBin(bins), bounds =>
      bounds.select(col("g"),
        explode(array(rs.map(lit(_)): _*)).as("r"))
        .filter(col("r") < col("n")),
      materialize = materialize)._1

  test("ranks in a 90%-one-value bin and in normal bins both select exactly") {
    val df = planted()
    // rank 499 = group a's median (inside the mass), 10 and 950 in
    // the tail's normal bins; group b has no mass anywhere
    val got = select(df, Seq(10L, 499L, 950L))
      .select("g", "r", "v").as[(String, Long, Double)].collect()
      .map { case (g, r, v) => (g, r) -> v }.toMap
    val aVals = (Seq.fill(900)(50.0) ++ (1 to 100).map(_ * 1000.0))
    val bVals = (1 to 500).map(_ * 7.0).map(_.toDouble)
    assert(got(("a", 10L)) === bruteRank(aVals, 10))
    assert(got(("a", 499L)) === bruteRank(aVals, 499)) // == 50.0, the mass
    assert(got(("a", 950L)) === bruteRank(aVals, 950))
    assert(got(("b", 10L)) === bruteRank(bVals, 10))
    assert(got(("b", 499L)) === bruteRank(bVals, 499))
    assert(got.size === 5) // b has no rank 950 (n = 500)
  }

  test("a fully-degenerate group (every row one value) selects from the summary") {
    val df = (Seq.fill(1000)(("c", 9.5)) ++ (1 to 10).map(i => ("d", i * 1.0)))
      .toDF("g", "v")
    val got = select(df, Seq(0L, 500L, 999L))
      .select("g", "r", "v").as[(String, Long, Double)].collect().toSet
    // d (n = 10) keeps only rank 0; c answers all three from bin 0
    assert(got === Set(("c", 0L, 9.5), ("c", 500L, 9.5), ("c", 999L, 9.5),
      ("d", 0L, 1.0)))
  }

  test("the window sort is structurally fenced off from point-mass bins") {
    // materialize = false: the production default checkpoints the
    // ranks-sized selection (its optimizedPlan is a LogicalRDD scan);
    // the fence lives in the plan BEHIND that checkpoint
    val sel = select(planted(), Seq(499L), materialize = false)
    val plan = sel.queryExecution.optimizedPlan
    // only the pass-2 row_number window sorts bin ROWS — the
    // cumulative-histogram window runs on the groups×bins summary
    val windows = plan.collect {
      case w: LWindow
          if w.windowExpressions.exists(_.toString.contains("row_number")) => w
    }
    assert(windows.nonEmpty, "expected the pass-2 window in the plan")
    // every window's subtree must carry the bmin != bmax exclusion —
    // a heavy bin can NEVER reach the sort, whatever the data
    windows.foreach { w =>
      val fenced = w.collect {
        case f: Filter if f.condition.toString.contains("NOT (bmin") => f
      }
      assert(fenced.nonEmpty,
        s"window not fenced by a bmin != bmax filter:\n$w")
    }
    // and the heavy answers arrive through the summary-side union arm
    assert(plan.collect { case u: Union => u }.nonEmpty,
      "expected the point-mass union arm in the plan")
  }

  test("null values are excluded from both ranks and population") {
    val df = (Seq.fill(5)(("n", Option.empty[Double])) ++
      (1 to 9).map(i => ("n", Some(i * 1.0)))).toDF("g", "v")
    // n = 9 non-null values; rank 4 = their median, rank 8 = max
    val got = select(df, Seq(4L, 8L))
      .select("r", "v").as[(Long, Double)].collect().toMap
    assert(got === Map(4L -> 5.0, 8L -> 9.0))
  }

  test("tie columns disable the short-circuit and keep exact tie order") {
    // all-tied v: the rank-r row is determined purely by the tie
    // column, which the caller consumes — an arbitrary row is WRONG
    val df = (1 to 100).map(i => ("t", 3.0, f"id$i%03d")).toDF("g", "v", "id")
    val (sel, _) = RankSelect.at(df, bins, RankSelect.floatBin(bins),
      bounds => bounds.select(col("g"), lit(42L).as("r")),
      tie = Seq("id"), materialize = false)
    val got = sel.select("v", "id").as[(Double, String)].collect().toSeq
    assert(got === Seq((3.0, "id043"))) // 0-based rank 42 under (v, id)
    assert(sel.queryExecution.optimizedPlan.collect {
      case u: Union => u }.isEmpty,
      "tie-ful call must not take the summary short-circuit")
  }
}
