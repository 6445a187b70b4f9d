package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral, Literal}

import graft.functions.expressions._

/** SQL-side registration of the engine's custom expressions, so
  * `spark.sql("SELECT simhash64(split(text, ' ')) ...")` works the
  * same as the Column API. Install either via
  * `spark.sql.extensions=graft.GraftExtensions` /
  * `.withExtensions(new GraftExtensions)` at session build, or
  * post-hoc on a live session with [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectPlannerStrategy(_ => graft.plans.AsofStrategy)
    e.injectPlannerStrategy(_ => graft.plans.RangeStrategy)
    e.injectPlannerStrategy(_ => graft.plans.IntervalStrategy)
    e.injectOptimizerRule(_ => graft.plans.CollapseRepartitionIntoTopK)
    // operational kill-switch: plan-rewrite rules can be disabled
    // without a rebuild if a workload ever hits an unforeseen shape.
    // Gated on the VALUE, not presence — =false/=0/=no/empty
    // re-enables — but FAIL-SAFE in the disable direction: any other
    // set value (=on, =y, a typo) still disables, because silently
    // re-enabling a rewrite someone reached for the kill-switch to
    // stop is the one wrong default for a kill-switch
    val disabled = sys.env.get("GRAFT_DISABLE_RANK_REWRITE")
      .map(_.trim.toLowerCase)
      .exists(v => !Set("", "0", "false", "no").contains(v))
    if (!disabled)
      e.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
  }
}

object GraftExtensions {

  private def intArg(name: String, e: Expression): Int = e match {
    case IntegerLiteral(v) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name expects a literal integer argument, got $other")
  }

  /** Wrap a builder with an arity check so a wrong-arg-count SQL call
    * fails with the expected signature instead of an index error.
    */
  private def fn(name: String, signature: String)(
      build: Seq[Expression] => Expression): (String, Seq[Expression] => Expression) = {
    val arity = signature.count(_ == ',') + (if (signature.isEmpty) 0 else 1)
    name -> { args =>
      if (args.length != arity)
        throw new IllegalArgumentException(
          s"[WRONG_NUM_ARGS] $name requires $arity argument(s): " +
            s"$name($signature); got ${args.length}")
      build(args)
    }
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    fn("shingle_set", "text, n")(args =>
      ShingleSet(args(0), intArg("shingle_set", args(1)))),
    fn("shingle_list", "text, n")(args =>
      ShingleList(args(0), intArg("shingle_list", args(1)))),
    fn("minhash_sig", "shingles, k")(args =>
      MinHashSig(args(0), intArg("minhash_sig", args(1)))),
    fn("minhash_bands", "shingles, bands, rows")(args => MinHashBands(args(0),
      intArg("minhash_bands", args(1)), intArg("minhash_bands", args(2)))),
    fn("simhash64", "tokens")(args => SimHash64(args(0))),
    fn("rolling_hash64", "text")(args => RollingHash64(args(0))),
    fn("cosine_sim", "vec_a, vec_b")(args => CosineSim(args(0), args(1))),
    fn("dot_ff", "vec_a, vec_b")(args => DotFF(args(0), args(1))),
    fn("l2_sq", "vec_a, vec_b")(args => L2Sq(args(0), args(1))),
    fn("lsh_sig", "vec, planes, table")(args => LshSig(args(0),
      intArg("lsh_sig", args(1)), intArg("lsh_sig", args(2)))),
    fn("byte_entropy", "text")(args => ByteEntropy(args(0))),
    fn("bin_entropy", "payload")(args => BinEntropy(args(0))),
    fn("vec_sub", "vec_a, vec_b")(args => VecSubFF(args(0), args(1))),
    fn("jaccard_sim", "arr_a, arr_b")(args => JaccardSim(args(0), args(1))),
    fn("nearest_idx", "vec, cents")(args => NearestIdx(args(0), args(1))),
    fn("top_idx", "vec, cents, k")(args =>
      TopIdx(args(0), args(1), intArg("top_idx", args(2)))),
    fn("pq_encode", "vec, codebook")(args => PqEncode(args(0), args(1))),
    fn("adc_sum", "codes, lut")(args => AdcSum(args(0), args(1))),
    fn("znorm_dist", "window, zq")(args => ZnormDist(args(0), args(1))),
  )

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  /** Register every function on an already-built session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
