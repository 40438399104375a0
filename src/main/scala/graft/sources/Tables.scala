package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Façade over the bounded sources the engine reads (SURVEY.md §1.4, §2.1).
  *
  * The reference couples to Kafka only through the initial `value` parse
  * (`src/bike_consumer.py:62-71`); everything downstream is schema'd
  * DataFrames. We keep the same separation: queries take a `DataFrame` in,
  * and this registry produces them from the driver's parquet testdata
  * (TESTDATA.md). Kafka batch/stream readers share the façade shape so a
  * query body never cares which transport fed it.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Bounded parquet read. Column pruning + predicate pushdown reach the
    * scan because we hand Catalyst the raw relation, never a cached or
    * collected copy.
    *
    * `events.ts` has shipped in two physical encodings across driver
    * testdata generations: TIMESTAMP(NANOS), which Spark 4 rejects
    * outright ([PARQUET_TYPE_ILLEGAL]) unless read as a bare long, and
    * plain TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Normalize both to
    * the same session-UTC TIMESTAMP column so downstream epoch math is
    * encoding-independent: nanos rebuild via exact integer division
    * (`div`, not `/` — a double quotient of an ~1.7e18 nano value loses
    * low bits and can shift the micro); NTZ casts to LTZ under the UTC
    * session zone, which preserves the stored wall-clock as the instant. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path)
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions
            .expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => raw
      }
    } else spark.read.parquet(path)
  }

  /** Register every table as a temp view so `spark.sql` text queries work
    * against the same relations the DataFrame API sees. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
