package graft.queries

import graft.SparkSuite
import java.security.MessageDigest

/** Committed-golden regression gate for the two rows-only queries the
  * DuckDB oracle can't check (xxhash64 isn't portable to it): q43
  * simhash signatures and q44 simhash near-dup pairs at sf0.01. The
  * signatures golden is an md5 over the full sorted output (plus pinned
  * head/tail rows so a failure isn't opaque); the 17-row pair set is
  * committed verbatim. Simhash64 is fully deterministic — any diff here
  * is a real behavior change in the expression or the blocking. */
class SimhashGoldenSpec extends SparkSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("q43 signatures at sf0.01 match the committed golden") {
    val rows = DedupOps.simhashSignatures(spark, sf001)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 500)
    assert(rows.head == (0L, -3877179158341346154L))
    assert(rows(1) == (1L, -2669756905684424048L))
    assert(rows(2) == (2L, -8367344732522435339L))
    assert(rows(498) == (498L, -2602740400643781424L))
    assert(rows(499) == (499L, -549096805899191728L))
    val csv = rows.map { case (d, s) => s"$d,$s" }.mkString("\n")
    val md5 = MessageDigest.getInstance("MD5").digest(csv.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md5 == "ca0e25cec1381d2e3d42475072f8e0d7", s"md5=$md5")
  }

  test("q44 pair set at sf0.01 matches the committed golden") {
    val got = DedupOps.simhashPairs(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val golden = Set(
      (8L, 245L, 2), (45L, 413L, 3), (58L, 293L, 0), (61L, 185L, 0),
      (70L, 447L, 1), (76L, 102L, 2), (98L, 290L, 2), (107L, 387L, 1),
      (120L, 332L, 3), (166L, 323L, 3), (251L, 473L, 3), (267L, 413L, 2),
      (285L, 301L, 0), (326L, 457L, 2), (393L, 420L, 0), (435L, 486L, 3),
      (458L, 462L, 2))
    assert(got == golden)
  }
}
