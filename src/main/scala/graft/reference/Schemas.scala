package graft.reference

import org.apache.spark.sql.types._

/** Consumer-declared schemas of the reference's six Kafka topics
  * (SURVEY.md §1.3). Schema is always explicit — the reference never
  * infers (`src/bike_consumer.py:39-60`, `src/naolib_consumer.py:37-46`,
  * `src/plane_naolib_consumer.py:26-47`), and neither do we.
  *
  * Deliberate quirks preserved (SURVEY §1.2):
  *  - numeric JSON fields declared STRING then cast downstream
  *    (`available_bikes`, `available_bike_stands` —
  *    `src/bike_consumer.py:54-55`);
  *  - `tempsReel` is a string "true"/"false", not a boolean
  *    (`src/naolib_consumer.py:68-70`);
  *  - the bike topic is parsed with an ARRAY schema even though the
  *    producer sends single objects — Spark's from_json wraps a lone
  *    object into a one-element array (`src/bike_consumer.py:60`,
  *    `src/bike_producer.py:90-92`).
  */
object Schemas {

  /** `plane_arrival` — `src/plane_naolib_consumer.py:26-40`. */
  val planeArrival: StructType = StructType(Seq(
    StructField("icao24", StringType),
    StructField("firstSeen", IntegerType),
    StructField("estDepartureAirport", StringType),
    StructField("lastSeen", IntegerType),
    StructField("estArrivalAirport", StringType),
    StructField("callsign", StringType),
    StructField("estDepartureAirportHorizDistance", IntegerType),
    StructField("estDepartureAirportVertDistance", IntegerType),
    StructField("estArrivalAirportHorizDistance", IntegerType),
    StructField("estArrivalAirportVertDistance", IntegerType),
    StructField("departureAirportCandidatesCount", IntegerType),
    StructField("arrivalAirportCandidatesCount", IntegerType)))

  /** `bus_airport` — `src/plane_naolib_consumer.py:42-47`. */
  val busAirport: StructType = StructType(Seq(
    StructField("bus", IntegerType),
    StructField("heure", StringType),
    StructField("passages", ArrayType(StringType))))

  /** `bus_position` — `src/naolib_consumer.py:37-46`. */
  val busPosition: StructType = StructType(Seq(
    StructField("sens", IntegerType),
    StructField("terminus", StringType),
    StructField("infotrafic", BooleanType),
    StructField("temps", StringType),
    StructField("tempsReel", StringType),
    StructField("stop", StringType),
    StructField("numLigne", StringType),
    StructField("created_at", StringType)))

  /** `bus_affluence_horaire` — `batch_bus_affluence.ipynb:10083-10088`. */
  val busAffluence: StructType = StructType(Seq(
    StructField("numLigne", StringType),
    StructField("stop", StringType),
    StructField("heure", StringType),
    StructField("passage", StringType)))

  /** `bike_stations` element — `src/bike_consumer.py:39-59`. */
  val bikeStation: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("number", StringType),
    StructField("address", StringType),
    StructField("position", StructType(Seq(
      StructField("lon", DoubleType),
      StructField("lat", DoubleType)))),
    StructField("available_bikes", StringType),
    StructField("available_bike_stands", StringType),
    StructField("bike_stands", IntegerType),
    StructField("last_update", StringType)))

  /** `wind` (legacy) — `src/previous_tp_code.py:116-124`. */
  val wind: StructType = StructType(Seq(
    StructField("created_at", StringType),
    StructField("entry_id", IntegerType),
    StructField("wind_speed", StringType)))
}
