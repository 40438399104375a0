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
    * `events.ts` is stored as TIMESTAMP(NANOS), which Spark 4 rejects
    * outright ([PARQUET_TYPE_ILLEGAL]). We read nanos as a long
    * (legacy conf) and rebuild a micros timestamp with exact integer
    * division — `div`, not `/`, because a double quotient of an
    * ~1.7e18 nano value loses low bits and can shift the micro. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path)
        .withColumn("ts", org.apache.spark.sql.functions
          .expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(path)
  }

  /** Register every table as a temp view so `spark.sql` text queries work
    * against the same relations the DataFrame API sees. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
