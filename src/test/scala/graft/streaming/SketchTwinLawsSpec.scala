package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Conservation/merge laws for every mergeable-sketch streaming twin
  * (VERDICT r6 #7): random inputs chunked arbitrarily through a
  * MemoryStream must produce EXACTLY the batch sketch, and each
  * sketch's algebraic law must hold — mass conservation for the
  * Count-Min matrix (q122), elementwise-min mergeability for the HLL
  * registers (q114), per-window mass conservation for the histogram
  * bins (q112). The round-6 red test failed precisely on a
  * conservation check (the assertion itself aggregated through a Set,
  * collapsing equal counts); this suite keeps every law in CI with
  * the aggregation shapes that cannot dedup (Seq/Map sums). */
class SketchTwinLawsSpec extends SparkSuite {

  private val Vocab =
    Vector("spark", "merge", "window", "loop", "beats", "sketch")

  /** Random documents: some empty, plenty of within-doc duplicate
    * tokens (the round-6 trap), two sources. */
  private def docGen(n: Int): Gen[List[(Long, String, String)]] =
    Gen.listOfN(n, for {
      src <- Gen.oneOf("web", "wiki")
      k <- Gen.choose(0, 8)
      toks <- Gen.listOfN(k, Gen.oneOf(Vocab))
    } yield toks.mkString(" ") -> src).map(_.zipWithIndex.map {
      case ((text, src), i) => (i.toLong, src, text)
    })

  /** Feed `rows` through a MemoryStream in `nChunks` arbitrary slices,
    * run `twin` in complete mode, return the final table's rows. */
  private def streamed(rows: Seq[(Long, String, String)], nChunks: Int,
      twin: DataFrame => DataFrame, name: String): Seq[Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val q = twin(ms.toDS().toDF("doc_id", "source", "text"))
      .writeStream.outputMode("complete").format("memory")
      .queryName(name).start()
    try {
      val size = math.max(1, rows.size / nChunks)
      rows.grouped(size).foreach { chunk =>
        ms.addData(chunk: _*)
        q.processAllAvailable()
      }
      spark.table(name).collect().toSeq
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("count-min twin: stream == batch and mass conserves per hash " +
      "row, on random chunked corpora") {
    import spark.implicits._
    for ((trial, i) <- Gen.listOfN(4, docGen(14)).sample.get.zipWithIndex) {
      val got = streamed(trial, 1 + i % 3,
        df => StreamingQueries.cmSketchStream(df.select($"doc_id", $"text")),
        s"cm_law_$i")
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = graft.queries.TextOps.cmSketchOf(
        trial.toDF("doc_id", "source", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSet == want.toSet, s"trial $i: stream != batch")
      // conservation: each of the 4 hash rows sees every occurrence once
      val occurrences =
        trial.map(_._3.split(" ").count(_.nonEmpty).toLong).sum
      val perRow = got.groupBy(_._1).map { case (h, rs) =>
        h -> rs.map(_._3).sum }
      assert(perRow.keySet == Set(0L, 1L, 2L, 3L) || occurrences == 0,
        s"trial $i: rows $perRow")
      assert(perRow.values.forall(_ == occurrences),
        s"trial $i: mass $perRow != $occurrences")
    }
  }

  test("hll twin: stream == batch; whole sketch == elementwise min of " +
      "per-chunk sketches, on random chunked corpora") {
    import spark.implicits._
    for ((trial, i) <- Gen.listOfN(4, docGen(14)).sample.get.zipWithIndex) {
      def key(r: Row) = (r.getString(0), r.getLong(1))
      val got = streamed(trial, 1 + i % 3,
        df => StreamingQueries.hllRegistersStream(df),
        s"hll_law_$i")
        .map(r => key(r) -> r.getLong(2)).toMap
      val want = graft.queries.TextOps.hllRegistersOf(
        trial.toDF("doc_id", "source", "text")).collect()
        .map(r => key(r) -> r.getLong(2)).toMap
      assert(got == want, s"trial $i: stream != batch")
      // merge law: sketch(A ∪ B) = elementwise MIN of sketch(A), sketch(B)
      val (a, b) = trial.splitAt(trial.size / 2)
      val merged = Seq(a, b).filter(_.nonEmpty)
        .map(part => graft.queries.TextOps.hllRegistersOf(
          part.toDF("doc_id", "source", "text")).collect()
          .map(r => key(r) -> r.getLong(2)).toMap)
        .foldLeft(Map.empty[(String, Long), Long]) { (acc, m) =>
          (acc.keySet ++ m.keySet).map(k => k -> math.min(
            acc.getOrElse(k, Long.MaxValue),
            m.getOrElse(k, Long.MaxValue))).toMap
        }
      assert(merged == want, s"trial $i: merge law broken")
    }
  }

  test("histogram twin: closed windows == batch bins and per-window " +
      "mass conserves, on random chunked event batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val evGen = Gen.listOfN(24, for {
      et <- Gen.oneOf("click", "view")
      sec <- Gen.choose(0, 59)
      v <- Gen.choose(-50, 120)
    } yield (ts(f"2025-01-25 16:00:$sec%02d"), et, v.toDouble))
    for ((trial, i) <- Gen.listOfN(3, evGen).sample.get.zipWithIndex) {
      val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
      val name = s"hist_law_$i"
      val q = StreamingQueries.histogramBinsStream(
        ms.toDS().toDF("ts", "event_type", "value"))
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      val got = try {
        ms.addData(trial.take(trial.size / 2): _*)
        q.processAllAvailable()
        ms.addData(trial.drop(trial.size / 2): _*)
        q.processAllAvailable()
        // sentinel far past the window: watermark closes [16:00, 16:01)
        ms.addData((ts("2025-01-25 16:30:00"), "view", 1.0))
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      } finally {
        q.stop()
        spark.catalog.dropTempView(name)
      }
      val want = trial.toDF("ts", "event_type", "value")
        .select($"event_type",
          graft.queries.EventOps.histBin($"value").as("bin"))
        .groupBy($"event_type", $"bin").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.toSet == want.toSet, s"trial $i: stream != batch")
      // conservation: Σ bin counts per type == events of that type
      val perType = got.toSeq.groupBy(_._1)
        .map { case (t, rs) => t -> rs.map(_._3).sum }
      val wantPerType = trial.groupBy(_._2)
        .map { case (t, rs) => t -> rs.size.toLong }
      assert(perType == wantPerType,
        s"trial $i: mass $perType != $wantPerType")
    }
  }
}
