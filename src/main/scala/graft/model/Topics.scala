package graft.model

/** Typed row models for the six reference topics (SURVEY.md §1.4:
  * `Dataset[CaseClass]` per topic with product encoders) and the
  * testdata tables. Use `df.as[BusPosition]` after the TopicSource
  * lift when compile-time field checks help; stay with DataFrame where
  * schema is dynamic.
  *
  * Field names/types mirror the consumer-declared schemas in
  * graft.reference.Schemas, including the deliberate string-typed
  * numerics (SURVEY §1.2).
  */
final case class PlaneArrival(
    icao24: String, firstSeen: Option[Int], estDepartureAirport: String,
    lastSeen: Option[Int], estArrivalAirport: String, callsign: String,
    estDepartureAirportHorizDistance: Option[Int],
    estDepartureAirportVertDistance: Option[Int],
    estArrivalAirportHorizDistance: Option[Int],
    estArrivalAirportVertDistance: Option[Int],
    departureAirportCandidatesCount: Option[Int],
    arrivalAirportCandidatesCount: Option[Int])

final case class BusAirport(bus: Option[Int], heure: String,
    passages: Seq[String])

final case class BusPosition(sens: Option[Int], terminus: String,
    infotrafic: Option[Boolean], temps: String, tempsReel: String,
    stop: String, numLigne: String, created_at: String)

final case class BusAffluence(numLigne: String, stop: String,
    heure: String, passage: String)

final case class GeoPoint(lon: Option[Double], lat: Option[Double])

final case class BikeStation(name: String, number: String, address: String,
    position: GeoPoint, available_bikes: String,
    available_bike_stands: String, bike_stands: Option[Int],
    last_update: String)

final case class WindReading(created_at: String, entry_id: Option[Int],
    wind_speed: String)

/** Testdata rows (FIXTURES.md §3). */
final case class EventRow(event_id: Long, user_id: Long,
    event_type: String, value: Double, props: String)

final case class DocumentRow(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)

final case class EmbeddingRow(vec_id: Long, embedding: Seq[Float],
    label: Int)
