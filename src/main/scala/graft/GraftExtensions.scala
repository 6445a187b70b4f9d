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
  }
}

object GraftExtensions {

  private def intArg(name: String, e: Expression): Int = e match {
    case IntegerLiteral(v) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name expects a literal integer argument, got $other")
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "shingle_set" -> (args => ShingleSet(args(0), intArg("shingle_set", args(1)))),
    "shingle_list" -> (args => ShingleList(args(0), intArg("shingle_list", args(1)))),
    "minhash_sig" -> (args => MinHashSig(args(0), intArg("minhash_sig", args(1)))),
    "minhash_bands" -> (args => MinHashBands(args(0),
      intArg("minhash_bands", args(1)), intArg("minhash_bands", args(2)))),
    "simhash64" -> (args => SimHash64(args(0))),
    "rolling_hash64" -> (args => RollingHash64(args(0))),
    "cosine_sim" -> (args => CosineSim(args(0), args(1))),
    "dot_ff" -> (args => DotFF(args(0), args(1))),
    "lsh_sig" -> (args => LshSig(args(0),
      intArg("lsh_sig", args(1)), intArg("lsh_sig", args(2)))),
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
