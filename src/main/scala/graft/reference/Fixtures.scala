package graft.reference

import java.time.{LocalDateTime, ZoneOffset}

/** Deterministic fixtures shaped exactly like the reference's topics
  * (FIXTURES.md §1). Each fixture renders BOTH as JSON strings (the
  * Spark side parses them through from_json, exercising the real
  * Kafka-value code path) and as DuckDB VALUES SQL (the oracle side) —
  * one set of constants, two engines, hash-compared outputs.
  */
object Fixtures {

  private def epoch(s: String): Long =
    LocalDateTime.parse(s).toEpochSecond(ZoneOffset.UTC)

  // ---------------------------------------------------------------- Q1
  /** Business date of the bus schedule (`src/plane_naolib_consumer.py:86`
    * hard-codes it; our engine takes it as a parameter). */
  val q1Date = "2025-03-17"
  /** Day range filter (`src/plane_naolib_consumer.py:138-139` analog). */
  val q1Begin: Long = epoch("2025-03-17T00:00:00")
  val q1End: Long = epoch("2025-03-17T23:59:59")

  /** (icao24, callsign, lastSeen). D is out of range → filtered;
    * E arrives after the last bus → dropped by the inner join. */
  val planes: Seq[(String, String, Long)] = Seq(
    ("39ca84", "SAMU44  ", epoch("2025-03-17T06:30:00")),
    ("4b1805", "EZS1234 ", epoch("2025-03-17T09:10:00")),
    ("aaaaaa", "AFR77   ", epoch("2025-03-17T14:37:00")),
    ("bbbbbb", "LATE1   ", epoch("2025-03-18T10:00:00")),
    ("cccccc", "NIGHT9  ", epoch("2025-03-17T23:00:00")))

  def planeJson: Seq[String] = planes.map { case (icao, cs, seen) =>
    s"""{"icao24": "$icao", "firstSeen": ${seen - 3600},
       | "estDepartureAirport": "LFPG", "lastSeen": $seen,
       | "estArrivalAirport": "LFRS", "callsign": "$cs",
       | "estDepartureAirportHorizDistance": 600,
       | "estDepartureAirportVertDistance": 50,
       | "estArrivalAirportHorizDistance": 300,
       | "estArrivalAirportVertDistance": 20,
       | "departureAirportCandidatesCount": 0,
       | "arrivalAirportCandidatesCount": 0}""".stripMargin.replace("\n", "")
  }

  def planeValuesSql: String = planes.map { case (icao, cs, seen) =>
    s"('$icao', '$cs', CAST($seen AS BIGINT))"
  }.mkString("(VALUES ", ", ", ") p(icao24, callsign, lastSeen)")

  /** (bus line, heure, passages) — suffixes and a ≥24 hour included. */
  val busSchedule: Seq[(Int, String, Seq[String])] = Seq(
    (38, "6h", Seq("45")),
    (38, "7h", Seq("05", "35d")),
    (38, "9h", Seq("15")),
    (38, "15h", Seq("00v")),
    (98, "6h", Seq("50")),
    (98, "9h", Seq("20")),
    (98, "25h", Seq("30")))

  def busScheduleJson: Seq[String] = busSchedule.map { case (b, h, ps) =>
    s"""{"bus": $b, "heure": "$h", "passages": [${ps.map("\"" + _ + "\"").mkString(", ")}]}"""
  }

  def busScheduleValuesSql: String = busSchedule.map { case (b, h, ps) =>
    s"($b, '$h', [${ps.map("'" + _ + "'").mkString(", ")}])"
  }.mkString("(VALUES ", ", ", ") s(bus, heure, passages)")

  // ---------------------------------------------------------------- Q2
  /** Golden per-hour histogram (BASELINE.md / FIXTURES.md §2: stop
    * CRQU4, 2025-03-25, total 453). */
  val q2Histogram: Seq[(Int, Int)] = Seq(
    0 -> 6, 1 -> 6, 2 -> 6, 4 -> 1, 5 -> 9, 6 -> 14, 7 -> 35, 8 -> 35,
    9 -> 24, 10 -> 21, 11 -> 21, 12 -> 26, 13 -> 26, 14 -> 22, 15 -> 22,
    16 -> 34, 17 -> 34, 18 -> 35, 19 -> 25, 20 -> 20, 21 -> 14, 22 -> 11,
    23 -> 6)

  /** One message per (hour, passage): hours 0-2 are emitted in the TAN
    * ">24h" convention to exercise modulo-24 normalization; every third
    * passage carries a "d"/"v" flag suffix. */
  val q2Messages: Seq[(String, String)] = q2Histogram.flatMap {
    case (hour, n) =>
      val rawHour = if (hour <= 2) s"${hour + 24}h" else s"${hour}h"
      (0 until n).map { i =>
        val minute = (i * 60) / n
        val suffix = if (i % 3 == 1) "d" else if (i % 3 == 2) "v" else ""
        (rawHour, f"$minute%02d$suffix")
      }
  }

  def q2Json: Seq[String] = q2Messages.map { case (h, p) =>
    s"""{"numLigne": "23", "stop": "CRQU4", "heure": "$h", "passage": "$p"}"""
  }

  def q2ValuesSql: String = q2Messages.map { case (h, p) =>
    s"('$h', '$p')"
  }.mkString("(VALUES ", ", ", ") m(heure, passage)")

  // ---------------------------------------------------------------- Q3
  /** Ordered stop list for the fixture line (stands in for
    * `LIST_STOPS["C6"]`, `src/naolib_consumer.py:16-18`). */
  val route: Seq[String] =
    Seq("HBLI", "BRTE", "CDCL", "SMTD", "HERM", "CRQU", "GMAR", "FMIT")

  /** (sens, stop, temps, tempsReel, created_at) readings.
    * Window 14:05: sens 1 — bus AT CDCL (0 mn), bus between SMTD|HERM
    * (7>3); a tempsReel=false row must be ignored; duplicate CRQU
    * readings keep the min. Window 14:06: sens 2 — reversed route. */
  val busReadings: Seq[(Int, String, String, String, String)] = Seq(
    (1, "HBLI", "12mn", "true", "2025-03-25T14:05:10"),
    (1, "BRTE", "9mn", "true", "2025-03-25T14:05:11"),
    (1, "CDCL", "proche", "true", "2025-03-25T14:05:12"),
    (1, "SMTD", "7mn", "true", "2025-03-25T14:05:13"),
    (1, "HERM", "3mn", "true", "2025-03-25T14:05:14"),
    (1, "CRQU", "8mn", "true", "2025-03-25T14:05:15"),
    (1, "CRQU", "6mn", "true", "2025-03-25T14:05:45"),
    (1, "GMAR", "11mn", "true", "2025-03-25T14:05:16"),
    (1, "FMIT", "20mn", "false", "2025-03-25T14:05:17"),
    (2, "FMIT", "proche", "true", "2025-03-25T14:06:10"),
    (2, "GMAR", "4mn", "true", "2025-03-25T14:06:11"),
    (2, "CRQU", "2mn", "true", "2025-03-25T14:06:12"),
    (2, "HERM", "9mn", "true", "2025-03-25T14:06:13"))

  def busReadingsJson: Seq[String] = busReadings.map {
    case (sens, stop, temps, reel, at) =>
      s"""{"sens": $sens, "terminus": "T", "infotrafic": false,
         | "temps": "$temps", "tempsReel": "$reel", "stop": "$stop",
         | "numLigne": "C6", "created_at": "$at"}""".stripMargin
        .replace("\n", "")
  }

  def busReadingsValuesSql: String = busReadings.map {
    case (sens, stop, temps, reel, at) =>
      s"($sens, '$stop', '$temps', '$reel', TIMESTAMP '${at.replace("T", " ")}')"
  }.mkString("(VALUES ", ", ", ") rd(sens, stop, temps, tempsReel, created_at)")

  /** Route positions for both directions (sens 1 = forward, others =
    * reversed — `src/naolib_consumer.py:111-114`). */
  def routeValuesSql: String = {
    val fwd = route.zipWithIndex.map { case (s, i) => s"(1, $i, '$s')" }
    val rev = route.reverse.zipWithIndex.map { case (s, i) => s"(2, $i, '$s')" }
    (fwd ++ rev).mkString("(VALUES ", ", ", ") rt(sens, idx, stop)")
  }

  // ---------------------------------------------------------------- Q4
  /** Query point (the reference picks it from an enum of city spots,
    * `producer.ipynb` cell 1). */
  val q4Lat = 47.2154
  val q4Lon = -1.5457

  /** (name, number, address, lon, lat, bikes, freeStands, bikeStands,
    * last_update). String-typed numerics per the topic quirk; one null
    * reading (→ "[No data]"); CRCY has bikes+free != total (→ "?").
    * Distances from the query point are well separated so ranking is
    * float-noise-proof. */
  val bikeReadings: Seq[(String, String, String, Double, Double,
      Option[Int], Option[Int], Option[Int], String)] = Seq(
    ("Lieu Unique", "42", "2 Quai Ferdinand Favre", -1.5457, 47.2154,
      Some(7), Some(8), Some(15), "2025-03-25T14:05:10+01:00"),
    ("Lieu Unique", "42", "2 Quai Ferdinand Favre", -1.5457, 47.2154,
      Some(6), Some(9), Some(15), "2025-03-25T14:05:40+01:00"),
    ("Gare Nord", "7", "Cours John Kennedy", -1.5420, 47.2180,
      Some(2), Some(10), Some(12), "2025-03-25T14:05:20+01:00"),
    ("Commerce", "12", "Place du Commerce", -1.5560, 47.2130,
      Some(12), Some(3), Some(15), "2025-03-25T14:05:30+01:00"),
    ("CRCY", "3", "Rue de Crucy", -1.5380, 47.2110,
      Some(4), Some(4), Some(10), "2025-03-25T14:05:15+01:00"),
    ("Beaulieu", "21", "Ile de Nantes", -1.5300, 47.2000,
      None, Some(5), Some(12), "2025-03-25T14:05:25+01:00"),
    ("Zenith", "33", "Boulevard du Zenith", -1.6270, 47.2290,
      Some(1), Some(19), Some(20), "2025-03-25T14:05:35+01:00"))

  def bikeJson: Seq[String] = bikeReadings.map {
    case (name, num, addr, lon, lat, b, f, t, up) =>
      def opt(v: Option[Int]) = v.map("\"" + _ + "\"").getOrElse("null")
      def optInt(v: Option[Int]) = v.map(_.toString).getOrElse("null")
      s"""{"name": "$name", "number": "$num", "address": "$addr",
         | "position": {"lon": $lon, "lat": $lat},
         | "available_bikes": ${opt(b)},
         | "available_bike_stands": ${opt(f)},
         | "bike_stands": ${optInt(t)}, "last_update": "$up"}""".stripMargin
        .replace("\n", "")
  }

  def bikeValuesSql: String = bikeReadings.map {
    case (name, num, addr, lon, lat, b, f, t, up) =>
      def o(v: Option[Int]) = v.map(_.toString).getOrElse("NULL")
      s"('$name', '$addr', $lon, $lat, ${o(b)}, ${o(f)}, ${o(t)}, " +
        s"TIMESTAMPTZ '${up.replace("T", " ")}')"
  }.mkString("(VALUES ", ", ",
    ") bk(name, address, lon, lat, bikes, free_stands, bike_stands, last_update)")
}
