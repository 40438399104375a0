package graft.streaming

import graft.SparkSuite
import graft.reference.{Fixtures, Schemas}
import graft.sources.TopicSource
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Output-mode legality, checkpointed exactly-once restart, and
  * partition-pruned writes (SURVEY §2.8 mode/sort pairing, §2.12
  * checkpointing). */
class SinkSemanticsSpec extends SparkSuite {

  test("global sort is legal in complete mode, illegal in append") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    val agg = StreamingQueries.bikeShelterAgg(
      TopicSource.lift(ms.toDF(), Schemas.bikeStation, asArray = true))
      .orderBy($"window_start", $"name")
    // complete: starts and emits the sorted full table (ref Q4 pairing)
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("sorted_complete").start()
    ms.addData(Fixtures.bikeJson: _*)
    q.processAllAvailable()
    val names = spark.table("sorted_complete").collect()
      .map(_.getAs[String]("name"))
    q.stop()
    assert(names.toSeq == names.sorted.toSeq && names.nonEmpty)
    // append: global sort must be rejected up front
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      agg.writeStream.outputMode("append").format("memory")
        .queryName("sorted_append").start()
    }
    assert(ex.getMessage.toLowerCase.contains("sort"))
  }

  test("stream-appended compressed ANN index == batch-written index (contents and search)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_annidx").toString
    val batchIdx = s"$base/batch"
    val streamIdx = s"$base/stream"
    graft.queries.VectorOps.ivfPqWriteIndex(spark, sf0001, batchIdx)
    // same vectors through the streaming maintenance path, in two
    // checkpointed AvailableNow runs — appends, never a rebuild
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Array[Float])]
    val lifted = StreamingQueries.annIndexStream(
      ms.toDF().toDF("vec_id", "embedding"))
    ms.addData(rows.take(rows.length / 2): _*)
    StreamingQueries.toPartitionedParquet(lifted, streamIdx,
      s"$base/chk", "cell").awaitTermination()
    ms.addData(rows.drop(rows.length / 2): _*)
    StreamingQueries.toPartitionedParquet(lifted, streamIdx,
      s"$base/chk", "cell").awaitTermination()
    graft.queries.VectorOps.writeIndexParams(spark, streamIdx)
    // bit-identical index rows (the quantizer lifts are stateless and
    // shared verbatim with the batch build)
    def contents(p: String) = spark.read.parquet(p).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getAs[Long]("code"))).toSet
    assert(contents(streamIdx) == contents(batchIdx))
    assert(contents(streamIdx).size == rows.length)
    // and identical probe-pruned search answers over the two layouts
    val q = rows.find(_._1 == 0L).get._2
    def top(p: String) = graft.queries.VectorOps
      .ivfPqSearchIndexed(spark, p, q, probes = 4, excludeVecId = Some(0L))
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(top(streamIdx) == top(batchIdx))
    assert(top(streamIdx).size == 5)

    // compaction (segment seal): identical contents and identical
    // probe-pruned search answers before/after, and the small-files
    // debt actually clears — one data file per cell directory, where
    // the two appends above left more than one in at least one cell
    def filesPerCell(p: String): Map[String, Int] = {
      val cells = new java.io.File(p).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      cells.map(c => c.getName ->
        c.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val before = filesPerCell(streamIdx)
    assert(before.values.exists(_ > 1),
      s"appender left no small-files debt to compact: $before")
    val preTop = top(streamIdx)
    graft.queries.VectorOps.compactIndex(spark, streamIdx)
    assert(contents(streamIdx) == contents(batchIdx))
    assert(top(streamIdx) == preTop)
    val after = filesPerCell(streamIdx)
    assert(after.nonEmpty && after.values.forall(_ == 1),
      s"compaction left multi-file cells: $after")
    // the swap retired the streaming sink's metadata log with the old
    // directory (a stale log would mask compacted files from readers)
    assert(!new java.io.File(streamIdx, "_spark_metadata").exists())
  }

  test("checkpointed parquet sink: restart processes only new input") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_in").toString
    val out = Files.createTempDirectory("graft_out").toString
    val chk = Files.createTempDirectory("graft_chk").toString
    def writeFile(name: String, rows: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(in, name),
        String.join("\n", rows: _*).getBytes)

    writeFile("batch1.json", Fixtures.busReadingsJson.take(5))
    val parsed = TopicSource.fileStream(spark, in, Schemas.busPosition)
      .filter($"tempsReel" === "true")
    StreamingQueries.toParquet(parsed, out, chk).awaitTermination()
    val n1 = spark.read.parquet(out).count()

    writeFile("batch2.json", Fixtures.busReadingsJson.slice(5, 9))
    StreamingQueries.toParquet(parsed, out, chk).awaitTermination()
    val n2 = spark.read.parquet(out).count()

    // 5 rows in batch1 (all tempsReel=true), 3 of 4 in batch2
    assert(n1 == 5L, s"first run wrote $n1")
    assert(n2 == 8L, s"after restart total $n2 (no reprocessing)")
  }

  test("partitioned parquet write enables partition pruning on read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString
    graft.sources.Tables(spark, sf0001, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"event_type" === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(pruned.count() > 0)
  }
}
