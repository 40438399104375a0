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
    // Registry order note: queries run name-sorted, so q42 (the first
    // consumer of the shared verified-pair table) pays its mining cost
    // and q45/q54 ride the materialization — the per-query numbers
    // reflect that documented attribution (ADVICE r2).
    val results = selected.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val r = try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val t = name -> (System.nanoTime() - t0) / 1e9
        // release each query's persisted result once consumed (q45's
        // cluster labels etc.) so cached blocks don't accumulate across
        // 61 queries in one JVM — but never the memoized pair table,
        // whose whole point is cross-query reuse
        if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
            && !graft.queries.DedupOps.isSharedArtifact(df))
          df.unpersist(blocking = false)
        t
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: " + e.getMessage)
        name -> -1.0
      }
      r
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // a second, short total-only line AFTER the full one: the round-2
    // driver tail-captured its own stdout and truncated the ~4 KB full
    // line mid-JSON ("parsed": null) — a trailing <120-byte line
    // survives any tail window, and a last-parseable-line parser picks
    // it up
    // n/failed travel with the short line so a crashed query (recorded
    // as -1 and excluded from the sum) can't masquerade as a
    // faster-looking total when only this line survives truncation
    val nFailed = results.count(_._2 < 0)
    val shortLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"failed":$nFailed,"sf":"$sfDir"}"""
    println(line)
    println(shortLine)
    // stdout alone is buried in sbt [info] noise — also write the bare
    // JSON where a parser can't miss it. The cwd copy is canonical;
    // /tmp is best-effort convenience (shared path, may be stale or
    // contended — ADVICE r2).
    for (p <- Seq("bench_out.json", "/tmp/bench_out.json")) {
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n" + shortLine + "\n").getBytes("UTF-8"))
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}") }
    }
    spark.stop()
  }
}
