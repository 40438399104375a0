package graft.streaming

import graft.SparkSuite
import graft.queries.PipelineOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The composed ingest-time admission gate ([[StreamingQueries
  * .admissionStream]]) against batch q155: replaying the corpus as the
  * arriving stream must reproduce the batch decision matrix row for
  * row on every gate an ingest decision CAN make — the four per-row
  * gates exactly, and survivorship as the quarantine rule (an arrival
  * that near-dup-collides with the standing corpus is held, which for
  * singleton-cluster documents coincides with batch survivorship). */
class AdmissionStreamSpec extends SparkSuite {

  test("admission stream == batch q155 on per-row gates; " +
      "near-dup arrivals quarantined; votes consistent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("admis").toString
    val out = s"$base/out"
    try {
      val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      val rows = corpus
        .select($"doc_id", $"source", $"lang", $"text")
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3)))
      val ms = MemoryStream[(Long, String, String, String)]
      val (h1, h2) = rows.splitAt(rows.length / 2)
      ms.addData(h1.toIndexedSeq: _*)
      StreamingQueries.admissionStream(
        ms.toDF().toDF("doc_id", "source", "lang", "text"),
        corpus, out, s"$base/chk").awaitTermination()
      ms.addData(h2.toIndexedSeq: _*)
      StreamingQueries.admissionStream(
        ms.toDF().toDF("doc_id", "source", "lang", "text"),
        corpus, out, s"$base/chk").awaitTermination()

      val got = spark.read.parquet(out).collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
      val batch = PipelineOps.admissionMatrix(spark, sf0001).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))).toMap
      val nearDup = PipelineOps.docLineage(spark, sf0001).collect()
        .map(r => r.getLong(0) ->
          r.getLong(r.fieldIndex("is_near_dup"))).toMap

      // every batch-decided document got exactly one stream decision
      assert(got.keySet == batch.keySet)
      for ((id, (surv, qual, dec, cal, ds, votes, strict)) <- got) {
        val (bSurv, bQual, bDec, bCal, bDs, _, _) = batch(id)
        // per-row gates: frozen-parameter ingest == batch, always
        assert((qual, dec, cal, ds) == ((bQual, bDec, bCal, bDs)),
          s"doc $id per-row gates diverge")
        // survivorship: quarantine rule — collides with corpus ⟺
        // batch near-dup; equals batch survivorship on singletons
        assert(surv == 1L - nearDup(id), s"doc $id survivorship")
        if (nearDup(id) == 0L)
          assert(surv == bSurv, s"doc $id singleton survivorship")
        // votes/admit recompute from the emitted gates
        assert(votes == surv + qual + dec + cal + ds, s"doc $id votes")
        assert(strict == surv * qual * dec * cal * ds, s"doc $id strict")
      }
      // the matrix must not be vacuous: some admitted, some rejected
      assert(got.values.exists(_._7 == 1L))
      assert(got.values.exists(_._7 == 0L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(base))
    }
  }
}
