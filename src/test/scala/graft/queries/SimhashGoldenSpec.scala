package graft.queries

import graft.SparkSuite
import java.security.MessageDigest

/** Independent-engine regression gate for the simhash queries: every
  * golden below was computed by DuckDB (not by this engine) over the
  * same md5-derived 60-bit term hashes, so a pass means two unrelated
  * implementations agree bit-for-bit on every signature. The per-round
  * driver oracle re-proves the same equality at gate time; this spec
  * keeps the proof in `sbt test` where it fails fast during
  * development. The signatures golden is an md5 over the full sorted
  * output (plus pinned head/tail rows so a failure isn't opaque); the
  * 13-row pair set is committed verbatim. */
class SimhashGoldenSpec extends SparkSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("q43 signatures at sf0.01 match the DuckDB-derived golden") {
    val rows = DedupOps.simhashSignatures(spark, sf001)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 500)
    assert(rows.head == (0L, 147514936980875827L))
    assert(rows(1) == (1L, 75370420564339491L))
    assert(rows(2) == (2L, 630178482069912362L))
    assert(rows(498) == (498L, 224411317942823648L))
    assert(rows(499) == (499L, 43915008112790248L))
    val csv = rows.map { case (d, s) => s"$d,$s" }.mkString("\n")
    val md5 = MessageDigest.getInstance("MD5").digest(csv.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md5 == "2dacec1b11ab5149b1fed6c6264f7b80", s"md5=$md5")
  }

  test("q44 pair set at sf0.01 matches the DuckDB-derived golden") {
    val got = DedupOps.simhashPairs(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val golden = Set[(Long, Long, Int)](
      (58L, 293L, 3), (61L, 185L, 3), (70L, 447L, 1), (92L, 450L, 2),
      (98L, 290L, 3), (120L, 332L, 1), (152L, 178L, 3), (166L, 323L, 1),
      (267L, 413L, 1), (285L, 301L, 2), (310L, 389L, 3), (393L, 420L, 1),
      (458L, 462L, 0))
    assert(got == golden)
  }
}
