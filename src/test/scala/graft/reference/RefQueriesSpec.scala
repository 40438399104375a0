package graft.reference

import graft.SparkSuite

/** Golden end-to-end assertions for the four reference queries
  * (SURVEY.md §5.2). The DuckDB oracle also checks these; the goldens
  * here pin the expected VALUES independently of DuckDB. */
class RefQueriesSpec extends SparkSuite {

  test("Q1: min wait per in-range plane, suffixes and 25h handled") {
    val rows = RefQueries.planeBusMinWait(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(3), r.getLong(5)))
      .sortBy(_._1).toSeq
    assert(rows == Seq(("39ca84", 38, 15L), ("4b1805", 38, 5L),
      ("aaaaaa", 38, 23L)))
  }

  test("Q2: golden histogram (BASELINE.md, total 453)") {
    val hist = RefQueries.busAffluence(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val golden = Fixtures.q2Histogram
      .map { case (h, n) => f"$h%02d:00" -> n.toLong }.toMap
    assert(hist == golden)
    assert(hist.values.sum == 453L)
  }

  test("Q3: AT and BETWEEN inference, both directions") {
    val rows = RefQueries.busPositions(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getBoolean(3)))
      .toSet
    assert(rows == Set(
      ("2025-03-25 14:05:00", 1, "HBLI|BRTE", false),
      ("2025-03-25 14:05:00", 1, "CDCL", true),
      ("2025-03-25 14:05:00", 1, "SMTD|HERM", false),
      ("2025-03-25 14:06:00", 2, "FMIT", true),
      ("2025-03-25 14:06:00", 2, "GMAR|CRQU", false)))
  }

  test("Q4: bars, [No data], discrepancy, top-5 excludes Zenith") {
    val rows = RefQueries.bikeShelters(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(6), r.getLong(7)))
      .sortBy(_._3).toSeq
    assert(rows.map(_._1) ==
      Seq("Lieu Unique", "Gare Nord", "CRCY", "Commerce", "Beaulieu"))
    val bars = rows.map(t => t._1 -> t._2).toMap
    assert(bars("Lieu Unique") == "#" * 7 + "-" * 9 + "?") // 6.5->7, 8.5->9
    assert(bars("CRCY") == "####----??") // 4+4 vs 10 stands
    assert(bars("Beaulieu") == "[No data]") // null bikes
    assert(bars("Gare Nord") == "##" + "-" * 10)
  }
}
