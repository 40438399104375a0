package graft
import org.apache.spark.sql.functions._
class CmDebugSpec extends SparkSuite {
  test("debug cm mass") {
    import spark.implicits._
    val docs = Seq((1L, "spark merge window spark"),(2L, "window beats the loop"),
      (3L, "spark spark spark"),(4L, "")).toDF("doc_id","text")
    val toksN = docs.select(explode(split($"text"," ")).as("t")).filter($"t" =!= "").count()
    info(s"token occurrences: $toksN")
    val bk = graft.queries.TextOps.cmBuckets(docs)
    info(s"bucket rows: ${bk.count()} (expect 4x tokens)")
    val sk = graft.queries.TextOps.cmSketchOf(docs).collect()
    val tot = sk.map(_.getLong(2)).sum
    info(s"sketch total: $tot  rows: ${sk.length}")
    sk.sortBy(r => (r.getLong(0), r.getLong(1))).foreach(r => info(r.toString))
  }
}
