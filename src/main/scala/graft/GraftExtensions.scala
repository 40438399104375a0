package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.VectorExpressions.{DimCountVector, FloatVecDot, LongVecSqDist, MinHashLongs, SimHash64}

/** SparkSessionExtensions entry point: registers the library's native
  * expressions as SQL functions so `spark.sql` text can call them.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   -- or --
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * Example: SELECT fvec_dot(a.embedding, b.embedding) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.FuseFloatVecDot)
    e.injectOptimizerRule(_ => graft.plans.FuseLongVecSqDist)
    e.injectFunction((FunctionIdentifier("fvec_dot"),
      info("fvec_dot", "fvec_dot(a, b) - dot product of two float vectors"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("longvec_sqdist"),
      info("longvec_sqdist",
        "longvec_sqdist(a, b) - squared L2 between integer code vectors"),
      (args: Seq[Expression]) => LongVecSqDist(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("longvec_sqdist_checked"),
      info("longvec_sqdist_checked",
        "longvec_sqdist_checked(a, b) - squared L2 between integer " +
          "code vectors; raises ARITHMETIC_OVERFLOW instead of " +
          "wrapping (the ANSI twin FuseLongVecSqDist fuses into)"),
      (args: Seq[Expression]) =>
        LongVecSqDist(args(0), args(1), checked = true)))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit simhash of term hashes"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((FunctionIdentifier("minhash_longs"),
      info("minhash_longs",
        "minhash_longs(hashes, k) - k minhash minima in one pass"),
      (args: Seq[Expression]) => {
        // k must be a literal: it sizes the generated loop. Guarded so
        // SQL misuse surfaces as an analysis error, not an internal one.
        if (args.length != 2) throw new IllegalArgumentException(
          "minhash_longs(hashes, k) takes exactly 2 arguments")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: java.lang.Number, _) => v.intValue()
          case other => throw new IllegalArgumentException(
            s"minhash_longs: k must be an integer literal, got $other")
        }
        MinHashLongs(args.head, k)
      }))
    e.injectFunction((FunctionIdentifier("dim_counts"),
      info("dim_counts",
        "dim_counts(dims, n) - n-length float histogram of dim ids"),
      (args: Seq[Expression]) => {
        // n must be a literal: it sizes the output array and the
        // generated loop (the minhash_longs rule).
        if (args.length != 2) throw new IllegalArgumentException(
          "dim_counts(dims, n) takes exactly 2 arguments")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: java.lang.Number, _) => v.intValue()
          case other => throw new IllegalArgumentException(
            s"dim_counts: n must be an integer literal, got $other")
        }
        DimCountVector(args.head, n)
      }))
  }
}
