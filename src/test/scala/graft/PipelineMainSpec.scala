package graft

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The composed end-to-end job: runs for real at sf0.001, writes real
  * artifacts, and the spec re-derives every reconciliation counter
  * from the registry functions INDEPENDENTLY of PipelineMain's own
  * arithmetic — the main must both succeed (its internal `require`s
  * are part of the test) and agree with the recomputation. */
class PipelineMainSpec extends SparkSuite {

  test("PipelineMain runs end-to-end, reconciles, and its artifacts " +
      "read back consistent") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_pipeline_spec").toString
    val counters = PipelineMain.runPipeline(spark, sf0001, out).toMap

    // independent recomputation of the headline counters
    val nDocs = graft.sources.Tables(spark, sf0001, "documents").count()
    assert(counters("n_docs") == nDocs)
    val corpus = graft.queries.PipelineOps.trainingCorpus(spark, sf0001)
    assert(counters("n_corpus") == corpus.count())
    val admitted = graft.queries.PipelineOps.docLineage(spark, sf0001)
      .filter($"admitted" === 1L).count()
    assert(counters("n_admitted") == admitted)
    assert(counters("yield_final") == admitted)
    assert(counters("yield_train") == counters("n_corpus"))
    assert(counters("manifest_tokens") == counters("packed_tokens"))

    // written artifacts read back with exactly the counted rows
    def n(name: String): Long = spark.read.parquet(s"$out/$name").count()
    assert(n("training_corpus") == counters("n_corpus"))
    assert(n("split") == nDocs)
    assert(n("lineage") == nDocs)
    assert(n("shards") == nDocs)
    assert(n("yield") > 0 && n("manifest") > 0)
    // the shard artifact is genuinely partitioned on disk (one
    // directory per shard — the loader's file-set contract)
    val shardDirs = new java.io.File(s"$out/shards").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard="))
    assert(shardDirs.length == 16, s"shard dirs: ${shardDirs.length}")

    // the admitted set is the corpus minus decon flags — admitted ⊆
    // corpus, and the difference is exactly the flagged trainers
    assert(admitted <= counters("n_corpus"))

    // the epoch schedule's contract, re-derived: per source, the
    // scheduled token mass lands in (budget − max_doc_tokens, budget]
    // — the formula's one-document overshoot bound
    val budget = 20000L
    val sched = spark.read.parquet(s"$out/schedule")
      .groupBy($"source")
      .agg(sum($"n_repeats" * $"n_tokens").as("sched"),
        max($"n_tokens").as("maxDoc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sched.nonEmpty)
    for ((src, s, maxDoc) <- sched) {
      assert(s <= budget, s"$src schedules $s > budget $budget")
      assert(s > budget - maxDoc,
        s"$src schedules $s, more than one doc ($maxDoc) short of $budget")
    }
    assert(counters("scheduled_tokens") == sched.map(_._2).sum)
  }
}
