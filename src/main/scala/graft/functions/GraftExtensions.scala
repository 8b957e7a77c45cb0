package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's native Catalyst expressions —
  * the idiomatic Spark extension point (SURVEY.md §7.3): with this
  * installed, `spark.sql("SELECT vec_cosine(a, b) ...")` parses, analyzes
  * and codegens exactly like a built-in function.
  *
  * Two installation paths:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (applied when the session is built);
  *  - per-session on a live session: `GraftFunctions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrune)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions." + name, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private def intArg(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: argument must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: expected integer literal, got $other")
    }
  }

  private def strArg(e: Expression, fn: String): String = {
    require(e.foldable, s"$fn: argument must be a literal string")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: expected string literal, got $other")
    }
  }

  /** Arity gate: a builder indexing args(i) without a length check turns
    * `SELECT vec_dot(a)` into an IndexOutOfBoundsException from deep inside
    * the planner — fail instead with a clean error naming the signature.
    */
  private def arity(n: Int, usage: String)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n)
        throw new IllegalArgumentException(
          s"wrong argument count: expected $n as in '$usage', " +
            s"got ${args.length}")
      f(args)
    }

  /** (name, info, builder) triples, shared by the extensions injector and
    * the live-session registrar.
    */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("DotProduct", "vec_dot(a, b) - dot product"),
      arity(2, "vec_dot(a, b)")(args => DotProduct(args(0), args(1)))),
    (FunctionIdentifier("vec_cosine"),
      info("CosineSimilarity", "vec_cosine(a, b) - cosine similarity"),
      arity(2, "vec_cosine(a, b)")(args =>
        CosineSimilarity(args(0), args(1)))),
    (FunctionIdentifier("vec_l2"),
      info("L2Norm", "vec_l2(a) - L2 norm"),
      arity(1, "vec_l2(a)")(args => L2Norm(args(0)))),
    (FunctionIdentifier("lsh_bucket"),
      info("HyperplaneBucket", "lsh_bucket(a, nPlanes) - LSH bucket id"),
      arity(2, "lsh_bucket(a, nPlanes)")(args =>
        HyperplaneBucket(args(0), intArg(args(1), "lsh_bucket")))),
    (FunctionIdentifier("vec_sq8"),
      info("Sq8Quantize", "vec_sq8(a) - symmetric int8 quantization codes"),
      arity(1, "vec_sq8(a)")(args => Sq8Quantize(args(0)))),
    (FunctionIdentifier("vec_i8_dot"),
      info("Int8Dot", "vec_i8_dot(a, b) - exact integer code dot product"),
      arity(2, "vec_i8_dot(a, b)")(args => Int8Dot(args(0), args(1)))),
    (FunctionIdentifier("unicode_normalize"),
      info("UnicodeNormalize",
        "unicode_normalize(s, 'NFC') - Unicode normalization " +
          "(NFC/NFD/NFKC/NFKD)"),
      arity(2, "unicode_normalize(s, form)")(args =>
        UnicodeNormalize(args(0),
          TextKernels.formOf(strArg(args(1), "unicode_normalize"))))))

  /** Register the functions into an already-built session's registry (the
    * same mechanism `injectFunction` uses at session build time).
    */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, inf, builder)
    }
}
