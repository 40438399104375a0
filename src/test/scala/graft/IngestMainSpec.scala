package graft

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The composed serving tick: runs for real at sf0.001 (its internal
  * reconciliation `require`s are part of the test), the spec then
  * re-derives the policy counters independently, checks the written
  * artifacts, and RE-RUNS the tick against the same out directory —
  * the replay must be a no-op on the indexes (the manifest anti-join
  * contract: a retried ingest job must never double-index). */
class IngestMainSpec extends SparkSuite {

  test("IngestMain runs end-to-end, reconciles, and a replay is a " +
      "no-op on the indexes") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_ingest_spec").toString
    val counters = IngestMain.runIngest(spark, sf0001, out).toMap

    // independent recomputation of the delta split and the policy
    val all = graft.sources.Tables(spark, sf0001, "documents")
    val nDelta = all
      .filter(substring(md5($"doc_id".cast("string")), 1, 2) < "1a")
      .count()
    assert(counters("n_delta") == nDelta)
    assert(counters("n_corpus") == all.count() - nDelta)
    assert(nDelta > 0, "delta slice empty — the tick tested nothing")
    assert(counters("n_survivors") ==
      counters("n_admitted") - counters("n_admitted_dupped"))
    assert(counters("postings_after") ==
      counters("postings_before") + counters("postings_appended"))
    assert(counters("chunks_after") ==
      counters("chunks_before") + counters("chunks_appended"))
    // the gate admits a nontrivial slice and the index genuinely grew
    assert(counters("n_admitted") > 0)
    assert(counters("n_survivors") > 0)
    assert(counters("postings_appended") > 0)

    // artifacts read back with the counted rows
    def n(name: String): Long = spark.read.parquet(s"$out/$name").count()
    assert(n("admission") == nDelta)
    assert(n("novelty") == nDelta)
    assert(n("survivors") == counters("n_survivors"))

    // the survivor set equals admission minus near-dups, re-derived
    // from the written artifacts (not the counters)
    val admitted = spark.read.parquet(s"$out/admission")
      .filter($"keep_calibrated" === 1L).select($"doc_id")
    val dupped = spark.read.parquet(s"$out/dup_pairs")
      .select($"new_id".as("doc_id")).distinct()
    val expect = admitted.join(dupped, Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    val got = spark.read.parquet(s"$out/survivors")
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)

    // replay: same out dir, same data — the maintained indexes must
    // not change (the at-least-once contract absorbed at the manifest)
    val replay = IngestMain.runIngest(spark, sf0001, out).toMap
    assert(replay("postings_appended") == 0L, replay.toString)
    assert(replay("chunks_appended") == 0L, replay.toString)
    assert(replay("postings_after") == counters("postings_after"))
    assert(replay("chunks_after") == counters("chunks_after"))
    assert(replay("manifest_after") == counters("manifest_after"))
  }
}
