package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Driver-side recompute coverage for the multimodal decode pipeline —
  * the oracle hash proves the SQL-expressible shape; these pin the
  * typed mapPartitions path against an independent JVM recompute. */
class MultimodalOpsSpec extends SparkSuite {

  test("frame features: per-doc frame count, slicing, and digests match a recompute") {
    import spark.implicits._
    val docs = graft.sources.Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = MultimodalOps.frameFeatures(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx")) ->
        (r.getAs[Long]("n_chars_frame"), r.getAs[Long]("n_space"),
          r.getAs[String]("frame_md5"))).toMap
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    var n = 0
    for ((id, t) <- docs) {
      val nBytes = t.getBytes("UTF-8").length
      val nFrames = (1 + nBytes % 5).toInt
      val flen = t.length / nFrames // ASCII corpus: chars == code points
      for (fi <- 0 until nFrames) {
        val s = t.substring(fi * flen, fi * flen + flen)
        assert(got((id, fi.toLong)) ==
          ((flen.toLong, s.count(_ == ' ').toLong, md5hex(s))),
          s"doc $id frame $fi")
        n += 1
      }
    }
    assert(got.size == n) // no extra frames beyond the stub's n_frames
  }

  test("q140 packing: contiguous offsets, conserved costs, q50 frame counts") {
    val rows = MultimodalOps.mmPackedStream(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    assert(rows.nonEmpty)
    // frame counts must equal the q50 decode path's stub metadata
    val metaFrames = MultimodalOps.binaryMeta(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    rows.foreach { case (id, _, _, _, imgTok, _, _, _, _) =>
      assert(imgTok == metaFrames(id) * 64L,
        s"doc $id image tokens vs q50 frames")
    }
    // per shard: positions contiguous from 1, offsets exactly stack
    for ((_, g) <- rows.groupBy(_._2)) {
      val inOrder = g.sortBy(_._3)
      assert(inOrder.map(_._3).sameElements(1L to g.length))
      inOrder.foldLeft(0L) { case (off, r) =>
        assert(r._7 == off, s"doc ${r._1} offset gap")
        // cost = text + image tokens; seq span brackets the cost
        assert(r._6 == r._4 + r._5)
        assert(r._8 == r._7 / 256 && r._9 == (r._7 + r._6 - 1) / 256)
        off + r._6
      }
    }
  }
}
