package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Evidence run for the DescentRounds knob (round 15): recall@8 of
  * the NN-Descent graph against exact brute force on the q200 sample,
  * measured per round budget — the curve a deployment reads before
  * deciding whether to spend on more descent rounds (q200's gauge) or
  * a deeper route (q204's). A main like [[Stress10xSpec]], not a CI
  * gate: minutes-scale, run once per round for PLANS.md.
  *
  * Default corpus is the 10× stress tree (20k vectors, 10-copy hub
  * regime) — the scale where the shipped budget of 3 measured 0.047
  * and the knob documentation needs a slope, not a point. */
object DescentRoundsAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_stress10x")
    val maxRounds = args.lift(1).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-descent-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.queries.KnnGraphOps
    import graft.functions.VectorExpressions.cosine

    val emb = graft.sources.Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").persist()
    val n = emb.count()
    val k = KnnGraphOps.GraphK

    // the exact arm once (q200's shape: sample side broadcast, the
    // corpus scan never shuffles), reused by every round budget
    val sample = emb.filter($"vec_id" % KnnGraphOps.RecallSampleMod === 0)
    val pairs = emb.select($"vec_id".as("b_id"))
      .crossJoin(broadcast(sample.select($"vec_id".as("a_id"))))
      .filter($"a_id" =!= $"b_id")
      .join(emb.select($"vec_id".as("a_id"), $"embedding".as("a_emb")),
        "a_id")
      .join(emb.select($"vec_id".as("b_id"), $"embedding".as("b_emb")),
        "b_id")
      .select($"a_id", $"b_id",
        nanvl(cosine($"a_emb", $"b_emb"),
          lit(Double.NegativeInfinity)).as("sim"))
    val w = Window.partitionBy($"a_id").orderBy($"sim".desc, $"b_id".asc)
    val exact = pairs.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k).select($"a_id", $"b_id").persist()
    val nSampled = exact.select($"a_id").distinct().count()
    println(s"[descent-ab] corpus $n vectors, $nSampled sampled, k=$k")

    def recallAt(rounds: Int): (Double, Double) = {
      val t0 = System.nanoTime()
      val g = KnnGraphOps.nnDescentOf(emb, rounds = rounds).persist()
      g.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val hits = exact.join(g.select($"a_id", $"b_id"),
        Seq("a_id", "b_id")).count()
      g.unpersist(blocking = false)
      (hits.toDouble / (nSampled * k), sec)
    }
    for (r <- 1 to maxRounds) {
      val (rec, sec) = recallAt(r)
      println(f"[descent-ab] rounds=$r%d recall@$k%d = $rec%.3f " +
        f"(build ${sec}%.1f s)")
    }
    spark.stop()
  }
}
