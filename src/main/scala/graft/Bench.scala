package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query
  * wall-clock seconds over SPARK_GRAFT_SF_DIR.
  *
  * Timing honesty: results are materialized through the `noop` sink —
  * a bare count() would let Catalyst prune every unaggregated column
  * and under-report projection-heavy queries. A warm-up action absorbs
  * one-time JVM/codegen/scan-init cost so per-query numbers measure the
  * queries, not the first query's bad luck. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JVM, codegen, parquet footer reads
    graft.sources.Tables.names.foreach(n =>
      graft.sources.Tables(spark, sfDir, n).count())

    val selected =
      if (args.isEmpty) SparkEntry.queries.toSeq
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }.toSeq
    val results = selected.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: " + e.getMessage)
        name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stdout alone is buried in sbt [info] noise (round-1 BENCH had
    // "parsed": null) — also write the bare JSON line where a parser
    // can't miss it.
    for (p <- Seq("bench_out.json", "/tmp/bench_out.json")) {
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes("UTF-8"))
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}") }
    }
    spark.stop()
  }
}
