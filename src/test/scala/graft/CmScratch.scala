package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Scratch investigation main — NOT a test; delete before commit. */
object CmScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("cm-scratch")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val fixture = Seq(
      (1L, "spark merge window spark"),
      (2L, "window beats the loop"),
      (3L, "spark spark spark"),
      (4L, ""))

    def mass(tag: String): Long = {
      val m = graft.queries.TextOps.cmSketchOf(fixture.toDF("doc_id", "text"))
        .collect().map(_.getLong(2)).sum
      println(s"### $tag: total mass = $m (expect 44)")
      m
    }

    args.headOption.getOrElse("stream") match {
      case "fresh" =>
        mass("fresh batch")
      case "stream" =>
        // reproduce the failing test ordering: stream FIRST
        val ms = MemoryStream[(Long, String)]
        val q = graft.streaming.StreamingQueries.cmSketchStream(
          ms.toDS().toDF("doc_id", "text"))
          .writeStream.outputMode("complete").format("memory")
          .queryName("cm_out").start()
        ms.addData(fixture.take(2): _*)
        q.processAllAvailable()
        ms.addData(fixture.drop(2): _*)
        q.processAllAvailable()
        val got = spark.table("cm_out").collect().map(_.getLong(2)).sum
        q.stop()
        println(s"### stream mass = $got (expect 44)")
        mass("batch after stream")
      case "batchfirst" =>
        mass("batch before stream")
        val ms = MemoryStream[(Long, String)]
        val q = graft.streaming.StreamingQueries.cmSketchStream(
          ms.toDS().toDF("doc_id", "text"))
          .writeStream.outputMode("complete").format("memory")
          .queryName("cm_out").start()
        ms.addData(fixture: _*)
        q.processAllAvailable()
        val got = spark.table("cm_out").collect().map(_.getLong(2)).sum
        q.stop()
        println(s"### stream mass = $got (expect 44)")
        mass("batch after stream")
    }
    spark.stop()
  }
}
