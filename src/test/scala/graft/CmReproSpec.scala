package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Scratch reproduction of the failing count-min test — delete before commit. */
class CmReproSpec extends SparkSuite {
  test("repro: streaming count-min mass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingQueries.cmSketchStream(
      ms.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cm_out").start()
    val fixture = Seq(
      (1L, "spark merge window spark"),
      (2L, "window beats the loop"),
      (3L, "spark spark spark"),
      (4L, ""))
    ms.addData(fixture.take(2): _*)
    q.processAllAvailable()
    ms.addData(fixture.drop(2): _*)
    q.processAllAvailable()
    val got = spark.table("cm_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    val want = graft.queries.TextOps.cmSketchOf(
      fixture.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    info(s"stream mass = ${got.toSeq.map(_._3).sum}; batch mass = ${want.toSeq.map(_._3).sum}")
    assert(got.toSeq.map(_._3).sum == 44L)
  }
}
