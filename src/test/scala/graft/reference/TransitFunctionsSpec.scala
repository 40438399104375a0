package graft.reference

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Edge-case coverage of the three reimplemented UDF semantics
  * (SURVEY.md §5.1: null→"[No data]", "proche"→0, 25h→01:00, suffix
  * stripping). */
class TransitFunctionsSpec extends SparkSuite {
  import TransitFunctions._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head.get(0)

  test("minutesFromTemps: proche is zero, mn suffix stripped") {
    assert(eval1(minutesFromTemps(lit("proche"))) == 0)
    assert(eval1(minutesFromTemps(lit("3mn"))) == 3)
    assert(eval1(minutesFromTemps(lit("12mn"))) == 12)
  }

  test("normalizeHour: modulo 24, zero-padded") {
    assert(eval1(normalizeHour(lit("4h"))) == "04:00")
    assert(eval1(normalizeHour(lit("25h"))) == "01:00")
    assert(eval1(normalizeHour(lit("0h"))) == "00:00")
    assert(eval1(normalizeHour(lit("27h"))) == "03:00")
    assert(eval1(normalizeHour(lit("23h"))) == "23:00")
  }

  test("passageMinutes: TAN flag suffixes stripped") {
    assert(eval1(passageMinutes(lit("50d"))) == 50)
    assert(eval1(passageMinutes(lit("22v"))) == 22)
    assert(eval1(passageMinutes(lit("07"))) == 7)
  }

  test("occupancyBar: exact bar, discrepancy padding, null handling") {
    assert(eval1(occupancyBar(lit(7.0), lit(15), lit(8.0))) == "#" * 7 + "-" * 8)
    // 4 bikes + 4 free vs 10 stands -> 2 unexplained
    assert(eval1(occupancyBar(lit(4.0), lit(10), lit(4.0))) ==
      "####----??")
    // rounding is floor(x+0.5): 6.5 -> 7, 8.5 -> 9, discrepancy |15-16|=1
    assert(eval1(occupancyBar(lit(6.5), lit(15), lit(8.5))) ==
      "#" * 7 + "-" * 9 + "?")
    assert(eval1(occupancyBar(lit(null).cast("double"), lit(15), lit(8.0)))
      == "[No data]")
  }

  test("occupancyBar invariant: length == bike_stands when no discrepancy") {
    // property sweep without ScalaCheck plumbing: all (b, f) with b+f=stands
    for (stands <- Seq(1, 5, 12, 30); b <- 0 to stands) {
      val bar = eval1(occupancyBar(lit(b.toDouble), lit(stands),
        lit((stands - b).toDouble))).asInstanceOf[String]
      assert(bar.length == stands, s"b=$b stands=$stands bar=$bar")
    }
  }

  test("haversine: Nantes->Paris ~ 342 km") {
    val d = eval1(haversineMeters(lit(47.2184), lit(-1.5536),
      lit(48.8566), lit(2.3522))).asInstanceOf[Double]
    assert(d > 330000 && d < 355000, s"got $d")
  }
}
