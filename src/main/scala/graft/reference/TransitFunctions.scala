package graft.reference

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Columnar reimplementations of the reference's three Python UDFs
  * (SURVEY.md §2.11) — the main physical win of the Scala engine: no
  * Python worker boundary, everything stays inside whole-stage codegen.
  */
object TransitFunctions {

  /** Wait-time parse: `"proche"` → 0, else strip the "mn" suffix
    * (`src/naolib_consumer.py:71-76`). */
  def minutesFromTemps(temps: Column): Column =
    when(temps === "proche", 0)
      .otherwise(regexp_replace(temps, "mn", "").cast("int"))

  /** Hour normalization: `"25h"` → `"01:00"` — the INTENT of
    * `parse_bus_time` (`batch_bus_affluence.ipynb:10103-10118`), i.e.
    * the cell-2 semantics without the digit-iteration bug
    * (SURVEY §2.11.3): hour modulo 24, zero-padded. */
  def normalizeHour(heure: Column): Column =
    format_string("%02d:00",
      regexp_replace(heure, "h", "").cast("int") % 24)

  /** Passage-minute parse: strip TAN flag suffixes (`"50d"`, `"22v"`)
    * to digits (`src/plane_naolib_consumer.py:81`). */
  def passageMinutes(passage: Column): Column =
    regexp_replace(passage, "[^0-9]", "").cast("int")

  /** ASCII occupancy bar — `compute_bar`
    * (`src/bike_consumer.py:103-122`): "#"×bikes + "-"×free + "?"×
    * |bike_stands − (bikes+free)|; any null input → "[No data]".
    * Inputs are rounded averages; rounding is explicit floor(x+0.5)
    * so the semantics don't depend on an engine's round() tie rule. */
  def occupancyBar(avgBikes: Column, bikeStands: Column,
      avgFreeStands: Column): Column = {
    val bikes = floor(avgBikes + 0.5).cast("int")
    val free = floor(avgFreeStands + 0.5).cast("int")
    val stands = bikeStands.cast("int")
    val discrepancy = abs(stands - (bikes + free))
    when(avgBikes.isNull || bikeStands.isNull || avgFreeStands.isNull,
      "[No data]")
      .otherwise(concat(
        repeat(lit("#"), bikes),
        repeat(lit("-"), free),
        repeat(lit("?"), discrepancy)))
  }

  /** Per-route-position minimum waits. Expects columns `rd`
    * (array<struct<stop,minutes>> — the collected readings of one
    * (window, direction) group) and `r` (ordered route array). A stop
    * with several readings in the window keeps the MINIMUM wait — the
    * deliberate determinism fix over the reference's
    * collect_list-order-dependent behavior (SURVEY §7.4.1). Kept as a
    * single array reduction so the whole Q3 pipeline needs only ONE
    * stateful aggregation (a streaming-legality requirement). */
  def waitsExpr: Column = expr(
    "transform(r, s -> array_min(transform(filter(rd, x -> x.stop = s), " +
      "x -> x.minutes)))")

  /** Position inference over `waits` + `r` (`detect_bus_positions`,
    * `src/naolib_consumer.py:89-114`): wait 0 ⇒ bus AT stop i;
    * else decreasing adjacent waits ⇒ bus BETWEEN stops i-1|i. */
  def positionsExpr: Column = expr(
    """filter(transform(sequence(0, size(r) - 1), i ->
      |  CASE WHEN waits[i] = 0
      |         THEN named_struct('location', r[i], 'at_stop', true)
      |       WHEN i > 0 AND waits[i-1] IS NOT NULL AND waits[i] IS NOT NULL
      |            AND waits[i-1] > waits[i]
      |         THEN named_struct('location', concat(r[i-1], '|', r[i]),
      |                           'at_stop', false)
      |       ELSE CAST(NULL AS STRUCT<location: STRING, at_stop: BOOLEAN>)
      |  END), x -> x IS NOT NULL)""".stripMargin)

  /** Haversine distance in meters — replaces the reference's
    * API-side `within_distance`/`order_by distance` pushdown
    * (`src/bike_producer.py:23-40`) with a native column expression. */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val r = lit(6371000.0)
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    r * lit(2.0) * asin(sqrt(a))
  }
}
