package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The persisted BM25 posting-index loop (the lexical sibling of the
  * ANN/LSH storage loops): batch build == live q89, plan-audited
  * bucket pruning + column pruning, and the streaming posting upsert
  * whose maintained index keeps answering searches exactly as a
  * from-scratch rebuild on the grown corpus would. */
class PostingIndexSpec extends SparkSuite {

  test("posting index: indexed bm25 == live q89, bucket-pruned, " +
      "df-free scan") {
    val tmp = java.nio.file.Files.createTempDirectory("postidx")
      .toString + "/idx"
    try {
      TextOps.postingWriteIndex(spark, sf0001, tmp)
      val expect = TextOps.bm25TopK(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val indexed = TextOps.bm25SearchIndexed(spark, tmp)
      val got = indexed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect)
      assert(got.size == 20)
      // plan contract: the query terms' buckets constant-fold into
      // planning-time PartitionFilters, and the scan reads ONLY
      // (term, doc_id, tf) — first_pos (the q87 reporting column)
      // never travels on the search path
      val plan = indexed.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "")
      assert(plan.contains("PartitionFilters: ["), plan)
      assert(plan.contains("bucket IN (") || plan.contains("(bucket = "),
        plan)
      assert(!plan.contains("first_pos"), plan)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(tmp).getParentFile)
    }
  }

  test("posting upsert stream: maintained index == rebuild on the " +
      "grown corpus; replays never double-index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("postups").toString
    val idx = s"$base/idx"
    try {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
        .select($"doc_id", $"text")
      val ids = docs.select($"doc_id").orderBy($"doc_id")
        .collect().map(_.getLong(0)).toSeq
      val (baseIds, newIds) = ids.splitAt(ids.length / 2)
      // seed: batch-build over the FIRST half of the corpus
      TextOps.postingWriteIndexOf(docs.filter($"doc_id".isin(baseIds: _*)),
        idx)
      // stream the SECOND half in two micro-batches
      val rows = docs.filter($"doc_id".isin(newIds: _*))
        .orderBy($"doc_id").as[(Long, String)].collect().toSeq
      val ms = MemoryStream[(Long, String)]
      val (h1, h2) = rows.splitAt(rows.length / 2)
      ms.addData(h1: _*)
      graft.streaming.StreamingQueries.postingUpsertStream(
        ms.toDF().toDF("doc_id", "text"), idx, s"$base/chk")
        .awaitTermination()
      ms.addData(h2: _*)
      graft.streaming.StreamingQueries.postingUpsertStream(
        ms.toDF().toDF("doc_id", "text"), idx, s"$base/chk")
        .awaitTermination()
      // the maintained index answers EXACTLY as live q89 over the full
      // corpus: df re-derives at search time, so appended documents
      // shift scores precisely as a batch rebuild would
      val expect = TextOps.bm25TopK(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val got = TextOps.bm25SearchIndexed(spark, idx).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect)
      // replay: a fresh stream re-delivering the same documents adds
      // NOTHING — the doc-manifest anti-join holds
      val before = spark.read.parquet(s"$idx/postings").count()
      val ms2 = MemoryStream[(Long, String)]
      ms2.addData(rows: _*)
      graft.streaming.StreamingQueries.postingUpsertStream(
        ms2.toDF().toDF("doc_id", "text"), idx, s"$base/chk2")
        .awaitTermination()
      assert(spark.read.parquet(s"$idx/postings").count() == before)
      // and the manifest covers the corpus exactly once
      val manifest = spark.read.parquet(s"$idx/docs")
        .collect().map(_.getLong(0)).toSeq
      assert(manifest.length == ids.length)
      assert(manifest.distinct.length == ids.length)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(base))
    }
  }

  test("posting compaction repairs a half-landed replay to " +
      "rebuild-equality") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("postcomp")
      .toString + "/idx"
    try {
      TextOps.postingWriteIndex(spark, sf0001, tmp)
      val clean = spark.read.parquet(s"$tmp/postings").count()
      // simulate the documented at-least-once residue: a replayed
      // batch whose postings landed but whose manifest write crashed
      // re-appends identical posting rows for some documents
      val dup = spark.read.parquet(s"$tmp/postings")
        .filter($"doc_id" % 7 === 0)
        .localCheckpoint() // materialize before appending to the same path
      val nDup = dup.count()
      dup.write.mode("append").partitionBy("bucket")
        .parquet(s"$tmp/postings")
      assert(spark.read.parquet(s"$tmp/postings").count() == clean + nDup)
      TextOps.compactPostingIndex(spark, tmp)
      // exact-duplicate rows are the ONLY possible residue (posting
      // rows are deterministic in (term, doc_id)), so distinct-based
      // compaction restores the clean index bit-for-bit
      assert(spark.read.parquet(s"$tmp/postings").count() == clean)
      val expect = TextOps.bm25TopK(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val got = TextOps.bm25SearchIndexed(spark, tmp).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect)
      // no stray write-aside directories survive a clean compaction
      val files = new java.io.File(tmp).listFiles().map(_.getName).toSet
      assert(files == Set("postings", "docs"), files.toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(tmp).getParentFile)
    }
  }

  test("posting delete: shrunk index == rebuild without the deleted " +
      "docs; a deleted doc can re-index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("postdel").toString
    val tmp = s"$base/idx"
    try {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
        .select($"doc_id", $"text")
      TextOps.postingWriteIndex(spark, sf0001, tmp)
      // take down the live top-1 answer doc plus two more — deletion
      // must shift df and ranks exactly as a rebuild would
      val top1 = TextOps.bm25SearchIndexed(spark, tmp)
        .collect().head.getLong(0)
      val gone = Seq(top1, top1 + 7, top1 + 13)
      TextOps.deleteFromPostingIndex(spark, tmp, gone)
      val rebuilt = s"$base/rebuilt"
      TextOps.postingWriteIndexOf(
        docs.filter(!$"doc_id".isin(gone: _*)), rebuilt)
      def served(p: String) = TextOps.bm25SearchIndexed(spark, p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(served(tmp) == served(rebuilt))
      assert(!served(tmp).exists(r => gone.contains(r._1)))
      // the manifest shrank with the postings
      val manifest = spark.read.parquet(s"$tmp/docs")
        .collect().map(_.getLong(0)).toSet
      assert(gone.forall(id => !manifest.contains(id)))
      // a deleted doc RE-INDEXES through the normal append path (the
      // manifest anti-join no longer blocks it), restoring the
      // original full-corpus answers
      graft.streaming.StreamingQueries.postingAppendBatch(
        docs.filter($"doc_id".isin(gone: _*)), tmp)
      val full = TextOps.bm25TopK(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(served(tmp) == full)
      // no stray write-aside directories survive a clean delete
      val files = new java.io.File(tmp).listFiles().map(_.getName).toSet
      assert(files == Set("postings", "docs"), files.toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(base))
    }
  }
}
