package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[FuseLongVecSqDist]] must rewrite the composable HOF squared-L2
  * into the codegen expression without changing results — and must NOT
  * fire on the negated mixed form or on non-long arrays. Plan
  * assertions run over the parquet-backed table (the FuseFloatVecDot
  * spec's device: local Seqs constant-fold away). */
class FuseLongVecSqDistSpec extends SparkSuite {

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), " +
      "cast(0 as bigint), (acc, p) -> acc + p)"

  /** Integer code vectors derived from real embeddings (q184's floor
    * quantization, simplified — the fusion only cares about types). */
  private def pairs = {
    def codes(c: String) =
      expr(s"transform($c, v -> cast(floor(v * 1024) as bigint))")
    graft.sources.Tables(spark, sf0001, "embeddings")
      .limit(20).select(col("vec_id").as("i"), codes("embedding").as("a"))
      .crossJoin(graft.sources.Tables(spark, sf0001, "embeddings")
        .limit(20).select(col("vec_id").as("j"),
          codes("embedding").as("b")))
  }

  test("HOF squared-L2 fuses to longvec_sqdist in the optimized plan") {
    val df = pairs.select(expr(hof).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("longvec_sqdist"), optimized)
    // the mirrored orientation (y−x)·(y−x) fuses too
    val mirrored = pairs.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> (y - x) * (y - x)), " +
        "cast(0 as bigint), (acc, p) -> acc + p)").as("d"))
    assert(mirrored.queryExecution.optimizedPlan.toString
      .contains("longvec_sqdist"))
  }

  test("fusion preserves results on real code vectors") {
    import spark.implicits._
    val viaHof = pairs.select($"i", $"j", expr(hof).as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaExpr = pairs.select($"i", $"j",
      graft.functions.VectorExpressions.longVecSqDist($"a", $"b").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(viaHof == viaExpr)
    assert(viaHof.nonEmpty)
    // sanity: self-distance is zero, symmetric pairs agree
    assert(viaHof.collect { case ((i, j), d) if i == j => d }
      .forall(_ == 0L))
  }

  test("non-matching shapes are left alone") {
    // the MIXED orientation (x−y)·(y−x) is the NEGATED square: no fuse
    val mixed = pairs.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (y - x)), " +
        "cast(0 as bigint), (acc, p) -> acc + p)").as("d"))
    assert(!mixed.queryExecution.optimizedPlan.toString
      .contains("longvec_sqdist"))
    // int arrays (not bigint) must NOT fuse
    val ints = pairs
      .withColumn("a", expr("transform(a, v -> cast(v as int))"))
      .withColumn("b", expr("transform(b, v -> cast(v as int))"))
      .select(expr(
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), " +
          "0, (acc, p) -> acc + p)").as("d"))
    assert(!ints.queryExecution.optimizedPlan.toString
      .contains("longvec_sqdist"))
  }
}
