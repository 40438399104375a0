package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Transport façade for topic-shaped data (SURVEY.md §1.4). The
  * reference's only coupling to Kafka is the initial `value` parse
  * (`src/bike_consumer.py:62-71`); everything downstream is a schema'd
  * DataFrame. We keep that seam: `lift` is the shared JSON→columns
  * step, and the same query body runs over Kafka (deployment), files
  * (hermetic tests), or MemoryStream (streaming tests).
  *
  * The Kafka paths require `spark-sql-kafka-0-10` on the classpath —
  * standard in any Spark deployment but absent from this offline image,
  * so they are exercised in deployments, not in the local suite.
  */
object TopicSource {

  /** Kafka `value` (or raw JSON string column) → typed columns.
    * `asArray=true` parses with an array schema and explodes — needed
    * for topics whose producers may batch records, and preserving the
    * reference's single-object-as-array tolerance
    * (`src/bike_consumer.py:60`, SURVEY §1.2). */
  def lift(raw: DataFrame, schema: StructType,
      valueCol: String = "value", asArray: Boolean = false): DataFrame = {
    val str = col(valueCol).cast("string")
    if (asArray)
      raw.select(explode(from_json(str, ArrayType(schema))).as("data"))
        .select(col("data.*"))
    else
      raw.select(from_json(str, schema).as("data")).select(col("data.*"))
  }

  /** The exact option map both Kafka readers pass to `format("kafka")`.
    * Factored out (and unit-tested against the connector's documented
    * option names) because the offline image lacks the
    * `spark-sql-kafka-0-10` jar — a typo'd key here would otherwise
    * ship unnoticed. `endingOffsets` is batch-only: the streaming
    * source rejects it, so the stream map must not carry one. */
  def kafkaOptions(bootstrap: String, topic: String,
      startingOffsets: String,
      endingOffsets: Option[String]): Map[String, String] = {
    require(bootstrap.nonEmpty, "kafka.bootstrap.servers must be non-empty")
    require(topic.nonEmpty, "subscribe topic must be non-empty")
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets) ++
      endingOffsets.map("endingOffsets" -> _)
  }

  /** Bounded Kafka snapshot — `src/plane_naolib_consumer.py:50-54`. */
  def kafkaBatch(spark: SparkSession, bootstrap: String, topic: String,
      schema: StructType, asArray: Boolean = false,
      startingOffsets: String = "earliest",
      endingOffsets: String = "latest"): DataFrame =
    lift(spark.read.format("kafka")
      .options(kafkaOptions(bootstrap, topic, startingOffsets,
        Some(endingOffsets)))
      .load(), schema, asArray = asArray)

  /** Live Kafka stream — `src/bike_consumer.py:62-68`. */
  def kafkaStream(spark: SparkSession, bootstrap: String, topic: String,
      schema: StructType, asArray: Boolean = false,
      startingOffsets: String = "latest"): DataFrame =
    lift(spark.readStream.format("kafka")
      .options(kafkaOptions(bootstrap, topic, startingOffsets, None))
      .load(), schema, asArray = asArray)

  /** Hermetic streaming source: JSON-lines files under `path`, same
    * downstream shape as the Kafka stream. */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
      asArray: Boolean = false): DataFrame =
    lift(spark.readStream.format("text").load(path).toDF("value"),
      schema, asArray = asArray)
}
