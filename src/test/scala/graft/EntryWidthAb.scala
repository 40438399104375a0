package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Evidence run for the out-of-corpus ENTRY-WIDTH claim (VERDICT r15
  * #5 / r16 #8): q206 attributes the fleet's missed neighbors to
  * entry-point breadth — the two geometry-blind salted buckets each
  * query enters through — rather than hop depth. This A/B turns the
  * two entry levers on the 10× stress corpus against the SAME
  * standing graph and measures mean hit@5 of the fleet route plus the
  * mean entry width (corpus members per query's buckets), so the
  * claim becomes a curve beside DescentRoundsAb's:
  *
  *  - salts 2 → 3 (one more independent bucketing per query);
  *  - SeedBucketSize 16 → 8 (double the modulus — NARROWER buckets,
  *    the negative control: fewer entries per query must not help).
  *
  * A main like [[DescentRoundsAb]], not a CI gate: minutes-scale,
  * run once per round for PLANS.md. The production constants
  * ([[graft.queries.KnnGraphOps.SeedSalts]], SeedBucketSize 16) stay
  * put — the oracle arithmetic pins them; this tool documents what
  * turning them buys. */
object EntryWidthAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_stress10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-entry-width-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.queries.{KnnGraphOps, ServingIndexes}
    import graft.functions.VectorExpressions.cosine

    val emb = graft.sources.Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").persist()
    val isDelta = substring(md5($"vec_id".cast("string")), 1, 2) < "1a"
    val corpus = emb.filter(!isDelta).persist()
    val delta = emb.filter(isDelta).persist()
    val (nCorpus, nDelta) = (corpus.count(), delta.count())
    val idx = ServingIndexes.knnCorpusGraphIndex(spark, dir)
    val edges = spark.read.parquet(s"$idx/edges")
      .select($"a_id", $"b_id").persist()
    edges.count()
    println(s"[entry-ab] corpus $nCorpus, fleet $nDelta queries, " +
      s"standing graph ${idx}")

    // the exact arm once (q208's audit shape), reused by every config
    val pairs = corpus.select($"vec_id".as("nb_id"),
        $"embedding".as("c_emb"))
      .crossJoin(broadcast(delta.select($"vec_id".as("query_id"),
        $"embedding".as("q_emb"))))
      .select($"query_id", $"nb_id",
        nanvl(cosine($"q_emb", $"c_emb"),
          lit(Double.NegativeInfinity)).as("sim"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"sim".desc, $"nb_id".asc)
    val exact = pairs.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5).select($"query_id", $"nb_id").persist()
    exact.count()

    def measure(tag: String, salts: Seq[String],
        bucketSize: Long): Unit = {
      val nBuckets = math.max(1L, nCorpus / bucketSize)
      val entry = KnnGraphOps
        .seedBuckets(delta, nBuckets, salts)
        .select($"vec_id".as("d_id"), $"salt", $"bk")
        .join(KnnGraphOps.seedBuckets(corpus, nBuckets, salts)
          .select($"vec_id".as("c_id"), $"salt", $"bk"),
          Seq("salt", "bk"))
        .select($"d_id", $"c_id").distinct()
      val meanEntry = entry.groupBy($"d_id").count()
        .agg(avg($"count")).head().getDouble(0)
      // time the ROUTE alone (materialized through persist+count);
      // the exact-arm join below is audit bookkeeping, not the
      // serving cost the "flat route wall" claim is about
      val t0 = System.nanoTime()
      val routed = KnnGraphOps.deltaRouteOf(delta, corpus, edges,
          nBuckets, hops = KnnGraphOps.RouteHops, salts = salts)
        .filter($"rank" <= 5)
        .select($"vec_id".as("query_id"), $"nb_id")
        .persist()
      routed.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val hits = exact.join(routed, Seq("query_id", "nb_id")).count()
      routed.unpersist(blocking = false)
      val mean = hits.toDouble / (5.0 * nDelta)
      println(f"[entry-ab] $tag%-22s meanEntry=$meanEntry%7.1f " +
        f"hit@5=$mean%.3f (route ${sec}%.1f s)")
    }
    measure("salts=2 bucket=16 (prod)", KnnGraphOps.SeedSalts, 16L)
    measure("salts=3 bucket=16", Seq("a", "b", "c"), 16L)
    measure("salts=2 bucket=8", KnnGraphOps.SeedSalts, 8L)
    spark.stop()
  }
}
