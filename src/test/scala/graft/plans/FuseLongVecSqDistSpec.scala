package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[FuseLongVecSqDist]] must rewrite the composable HOF squared-L2
  * into the codegen expression without changing results OR failure
  * semantics — in BOTH eval modes the engine can run under. Spark
  * 4.1.2 sessions here are ANSI-default, so the primary assertions run
  * in the shipped config (→ the checked twin); the legacy form is
  * covered by flipping the conf for one block. Plan assertions run
  * over the parquet-backed table (the FuseFloatVecDot spec's device:
  * local Seqs constant-fold away). */
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

  private def withAnsi[A](on: Boolean)(body: => A): A = {
    val before = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", on.toString)
    try body finally spark.conf.set("spark.sql.ansi.enabled", before)
  }

  test("ANSI (shipped default) HOF fuses to the checked twin") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "this engine ships ANSI-default; the spec pins that assumption")
    val df = pairs.select(expr(hof).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("longvec_sqdist_checked"), optimized)
    // the mirrored orientation (y−x)·(y−x) fuses too
    val mirrored = pairs.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> (y - x) * (y - x)), " +
        "cast(0 as bigint), (acc, p) -> acc + p)").as("d"))
    assert(mirrored.queryExecution.optimizedPlan.toString
      .contains("longvec_sqdist_checked"))
  }

  test("LEGACY session HOF fuses to the wrapping form") {
    withAnsi(false) {
      val optimized = pairs.select(expr(hof).as("d"))
        .queryExecution.optimizedPlan.toString
      assert(optimized.contains("longvec_sqdist"), optimized)
      assert(!optimized.contains("longvec_sqdist_checked"), optimized)
    }
  }

  test("fusion preserves results on real code vectors (both modes)") {
    import spark.implicits._
    def run(ansi: Boolean): Map[(Long, Long), Long] = withAnsi(ansi) {
      pairs.select($"i", $"j", expr(hof).as("d")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val viaExpr = pairs.select($"i", $"j",
      graft.functions.VectorExpressions.longVecSqDist($"a", $"b").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val ansiRes = run(ansi = true)
    assert(ansiRes == viaExpr)
    assert(run(ansi = false) == viaExpr)
    assert(viaExpr.nonEmpty)
    // sanity: self-distance is zero
    assert(viaExpr.collect { case ((i, j), d) if i == j => d }
      .forall(_ == 0L))
  }

  test("checked twin raises ARITHMETIC_OVERFLOW where the HOF would") {
    // d = 8e9 per element → d·d ≈ 6.4e19 > Long.MaxValue: the multiply
    // overflows on the FIRST element in both the unfused HOF and the
    // fused checked loop.
    def big(v: String) = expr(s"transform(a, x -> cast($v as bigint))")
    val df = pairs.limit(1)
      .withColumn("a2", big("4000000000")).withColumn("b2", big("-4000000000"))
      .drop("a", "b").withColumnRenamed("a2", "a").withColumnRenamed("b2", "b")
    def overflows(body: => Unit): Unit = {
      val e = intercept[Throwable](body)
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.toLowerCase.contains("overflow"), msgs)
    }
    assert(df.select(expr(hof).as("d")).queryExecution.optimizedPlan
      .toString.contains("longvec_sqdist_checked"))
    overflows(df.select(expr(hof).as("d")).collect())
    // the wrapping legacy form must NOT raise — it wraps silently
    withAnsi(false) {
      val wrapped = df.select(expr(hof).as("d")).collect()
      assert(wrapped.length == 1)
    }
  }

  test("ragged prefix-sum overflow: fused raises exactly like the " +
      "unfused HOF (ADVICE r14)") {
    // per-element squares in range (3037000499² ≈ 0.9999·2⁶³) but the
    // two-element shared-prefix SUM overflows; lengths differ, so
    // zip_with pads a null at position 2 — the fold adds the full
    // prefix with exact arithmetic BEFORE that padding null reaches
    // it, so ANSI raises rather than yielding NULL. Built from the
    // parquet-backed columns (the spec's plan-assertion device):
    // literal arrays would constant-fold and raise at PLAN time.
    val df = pairs.limit(1)
      .withColumn("a2",
        expr("slice(transform(a, x -> cast(3037000499 as bigint)), 1, 2)"))
      .withColumn("b2",
        expr("slice(transform(b, x -> cast(0 as bigint)), 1, 3)"))
      .drop("a", "b").withColumnRenamed("a2", "a")
      .withColumnRenamed("b2", "b")
    def overflows(body: => Unit): Unit = {
      val e = intercept[Throwable](body)
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.toLowerCase.contains("overflow"), msgs)
    }
    val fused = df.select(expr(hof).as("d"))
    assert(fused.queryExecution.optimizedPlan.toString
      .contains("longvec_sqdist_checked"))
    overflows(fused.collect())
    // ground truth: the same query with the rule excluded (the unfused
    // interpreted HOF) must raise too — semantics, not coincidence
    val key = "spark.sql.optimizer.excludedRules"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.FuseLongVecSqDist")
    try {
      val unfused = df.select(expr(hof).as("d"))
      assert(!unfused.queryExecution.optimizedPlan.toString
        .contains("longvec_sqdist"), "rule exclusion did not take")
      overflows(unfused.collect())
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    // the wrapping legacy twin stays NULL on the same input
    withAnsi(false) {
      assert(df.select(expr(hof).as("d")).head.isNullAt(0))
    }
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
    // try_* arithmetic (overflow → NULL) never fuses
    val tried = pairs.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> try_multiply(try_subtract(x, y), " +
        "try_subtract(x, y))), cast(0 as bigint), " +
        "(acc, p) -> try_add(acc, p))").as("d"))
    assert(!tried.queryExecution.optimizedPlan.toString
      .contains("longvec_sqdist"))
  }
}
