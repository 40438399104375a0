package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The optimizer rule must rewrite the composable HOF dot product into
  * the codegen expression without changing results. Plan assertions run
  * over the parquet-backed table — local Seq inputs constant-fold to
  * LocalRelation before any expression survives into the plan text. */
class FuseFloatVecDotSpec extends SparkSuite {

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), " +
      "(acc, p) -> acc + p)"

  private def pairs = {
    import org.apache.spark.sql.functions.col
    graft.sources.Tables(spark, sf0001, "embeddings")
      .limit(20).select(col("vec_id").as("i"), col("embedding").as("a"))
      .crossJoin(graft.sources.Tables(spark, sf0001, "embeddings")
        .limit(20).select(col("vec_id").as("j"), col("embedding").as("b")))
  }

  test("HOF dot product fuses to fvec_dot in the optimized plan") {
    val df = pairs.select(expr(hof).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("fvec_dot"), optimized)
  }

  test("fusion preserves results on real embeddings") {
    import spark.implicits._
    val viaHof = pairs.select($"i", $"j", expr(hof).as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaExpr = pairs.select($"i", $"j",
      graft.functions.VectorExpressions.fvecDot($"a", $"b").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(viaHof == viaExpr)
    assert(viaHof.nonEmpty)
  }

  test("non-matching shapes are left alone") {
    import spark.implicits._
    // double arrays (not float) must NOT fuse
    val doubled = pairs
      .withColumn("a", expr("transform(a, x -> cast(x as double))"))
      .withColumn("b", expr("transform(b, x -> cast(x as double))"))
      .select(expr(hof).as("d"))
    assert(!doubled.queryExecution.optimizedPlan.toString.contains("fvec_dot"))
    // different reducer must NOT fuse
    val other = pairs.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), " +
        "(acc, p) -> acc + p * 2)").as("d"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("fvec_dot"))
  }
}
