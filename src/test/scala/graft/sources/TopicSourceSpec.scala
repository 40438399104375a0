package graft.sources

import graft.SparkSuite

/** The Kafka readers can't execute in this offline image (no
  * `spark-sql-kafka-0-10` jar), so this pins the part that CAN regress
  * silently: the exact option keys/values `kafkaBatch`/`kafkaStream`
  * hand to `format("kafka")`. Keys are the connector's documented
  * names — a typo here would only surface at deployment. */
class TopicSourceSpec extends SparkSuite {

  test("batch reader options carry bounded offsets") {
    val o = TopicSource.kafkaOptions("broker1:9092,broker2:9092", "bikes",
      startingOffsets = "earliest", endingOffsets = Some("latest"))
    assert(o == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "bikes",
      "startingOffsets" -> "earliest",
      "endingOffsets" -> "latest"))
  }

  test("stream reader options have NO endingOffsets (source rejects it)") {
    val o = TopicSource.kafkaOptions("b:9092", "naolib",
      startingOffsets = "latest", endingOffsets = None)
    assert(o == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "subscribe" -> "naolib",
      "startingOffsets" -> "latest"))
    assert(!o.contains("endingOffsets"))
  }

  test("blank broker or topic is rejected before reaching the connector") {
    intercept[IllegalArgumentException] {
      TopicSource.kafkaOptions("", "t", "earliest", None)
    }
    intercept[IllegalArgumentException] {
      TopicSource.kafkaOptions("b:9092", "", "earliest", None)
    }
  }

  test("kafkaBatch/kafkaStream wire options through the shared builder") {
    // Build the readers up to (but not through) load(): the DataFrameReader
    // itself isn't inspectable, but the shared kafkaOptions seam plus this
    // compile-time wiring means a regression must change one or the other.
    // JSON offset-range strings (per-partition form) must pass through intact.
    val ranged = TopicSource.kafkaOptions("b:9092", "t",
      startingOffsets = """{"t":{"0":23}}""",
      endingOffsets = Some("""{"t":{"0":99}}"""))
    assert(ranged("startingOffsets") == """{"t":{"0":23}}""")
    assert(ranged("endingOffsets") == """{"t":{"0":99}}""")
  }
}
