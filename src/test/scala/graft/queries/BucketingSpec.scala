package graft.queries

import graft.SparkSuite
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The bucketed-layout contract: co-bucketed tables join with no
  * exchange (and no per-query sort) — one write-time shuffle bought a
  * shuffle-free join for every downstream query. This is the repeated-
  * join lever at 100 TB; local[4] proves the plan shape. */
class BucketingSpec extends SparkSuite {

  test("co-bucketed tables sort-merge-join without exchange OR sort") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      graft.operators.Operators.writeBucketed(
        Tables(spark, sf0001, "orders").select($"o_orderkey", $"o_custkey"),
        "orders_bkt", "o_custkey", buckets = 4)
      graft.operators.Operators.writeBucketed(
        Tables(spark, sf0001, "customer").select($"c_custkey", $"c_name"),
        "customer_bkt", "c_custkey", buckets = 4)
      // force SMJ so the assertion targets the exchange, not broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def joinPlan(): String = {
        val joined = spark.table("orders_bkt")
          .join(spark.table("customer_bkt"), $"o_custkey" === $"c_custkey")
        assert(joined.count() == Tables(spark, sf0001, "orders").count())
        joined.queryExecution.executedPlan.toString
      }
      val p = joinPlan()
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$p")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"), p)
      // sort elision needs the legacy scan-ordering flag, which is safe
      // here because writeBucketed guarantees one file per bucket
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val ps = joinPlan()
      assert(!ps.contains("Exchange hashpartitioning"), ps)
      assert(!ps.contains("Sort "),
        s"single-file buckets under the ordering flag must not re-sort:\n$ps")
    } finally {
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("partitioned layout prunes non-matching partitions at planning time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docs_part").toString
    try {
      graft.operators.Operators.writePartitioned(
        Tables(spark, sf0001, "documents").select($"doc_id", $"source"),
        dir, "source")
      // one directory per source value, no stray top-level part files
      val sources = Tables(spark, sf0001, "documents")
        .select($"source").distinct().as[String].collect().toSet
      val children = new java.io.File(dir).listFiles()
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(_.getName).toSet
      assert(children == sources.map(s => s"source=$s"), children)
      // a partition-column filter must prune at the scan: the plan's
      // scan node reads ONE partition and carries the partition filter
      val one = sources.head
      val df = spark.read.parquet(dir).filter($"source" === one)
      assert(df.count() ==
        Tables(spark, sf0001, "documents").filter($"source" === one).count())
      // the equality predicate inside PartitionFilters IS planning-time
      // pruning: those filters run against the file index before any
      // file is opened (a data filter would appear under PushedFilters
      // instead and still read every directory)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters: [isnotnull(source"), p)
      assert(p.replaceAll("#\\d+", "")
        .contains(s"(source = $one)"), p)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
