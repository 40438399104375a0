package graft.model

import graft.SparkSuite
import graft.reference.{Fixtures, Schemas}
import graft.sources.{Tables, TopicSource}
import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._

/** Typed-Dataset path over the topic lifts + unit coverage of the
  * sorted merge-scan intersect expression. */
class TypedModelSpec extends SparkSuite {

  test("lift -> as[BusPosition] round-trips the fixture readings") {
    import spark.implicits._
    val ds = TopicSource.lift(Fixtures.busReadingsJson.toDF("value"),
      Schemas.busPosition).as[BusPosition]
    val rows = ds.collect()
    assert(rows.length == Fixtures.busReadings.length)
    assert(rows.count(_.tempsReel == "true") == 12)
    assert(rows.filter(_.temps == "proche").map(_.stop).sorted.toSeq ==
      Seq("CDCL", "FMIT"))
  }

  test("documents table reads as Dataset[DocumentRow]") {
    import spark.implicits._
    val ds = Tables(spark, sf0001, "documents").as[DocumentRow]
    assert(ds.head.text.nonEmpty)
    assert(ds.count() == 500)
  }

  test("sortedIntersectSize: merge-scan edge cases") {
    import spark.implicits._
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d"), 2),
      (Seq.empty[String], Seq("x"), 0),
      (Seq("a"), Seq.empty[String], 0),
      (Seq("a", "b"), Seq("c", "d"), 0),
      (Seq("a", "b", "c"), Seq("a", "b", "c"), 3))
    val df = cases.toDF("a", "b", "want")
    val got = df.withColumn("got",
      VectorExpressions.sortedIntersectSize($"a", $"b"))
    assert(got.filter($"got" =!= $"want").count() == 0)
  }

  test("sortedIntersectSize agrees with array_intersect on real tokens") {
    import spark.implicits._
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id",
        array_sort(array_distinct(split($"text", " "))).as("tok"))
      .limit(50)
    val a = docs.select($"doc_id".as("ai"), $"tok".as("ta"))
    val b = docs.select($"doc_id".as("bi"), $"tok".as("tb"))
    val joined = a.crossJoin(b).filter($"ai" < $"bi")
      .withColumn("m", VectorExpressions.sortedIntersectSize($"ta", $"tb"))
      .withColumn("ref", size(array_intersect($"ta", $"tb")))
    assert(joined.filter($"m" =!= $"ref").count() == 0)
  }
}
