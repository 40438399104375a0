package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupFusionOps, DedupOps}

/** Cross-query laws for the round-8 fusion family (q129–q132): each test
  * pins a relationship BETWEEN queries that the per-query DuckDB oracle
  * cannot see (it checks each result in isolation). */
class FusionOpsSpec extends SparkSuite {

  test("q129 verifies exactly the q44 candidate set, verdict consistent") {
    val ev = DedupFusionOps.editVerified(spark, sf0001).cache()
    val evPairs = ev.select("a_id", "b_id").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet
    val q44Pairs = DedupOps.simhashPairs(spark, sf0001)
      .select("a_id", "b_id").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    assert(evPairs == q44Pairs,
      "edit verification must cover the candidate set exactly")
    // verdict column is the threshold predicate, row by row
    assert(ev.filter(
      (col("edit_sim") >= 0.8) =!= col("confirmed")).count() == 0)
    assert(ev.filter(col("edit_sim") < 0 || col("edit_sim") > 1)
      .count() == 0, "edit similarity is a ratio in [0, 1]")
    ev.unpersist()
  }

  test("q130 matches only delta-newer pairs and agrees with q42 globally") {
    val dd = DedupFusionOps.deltaDedup(spark, sf0001).cache()
    // every new_id is on the delta side of the md5 split
    val offSplit = dd.withColumn("k",
        substring(md5(col("new_id").cast("string")), 1, 2))
      .filter(col("k") >= "1a").count()
    assert(offSplit == 0, "new_id must satisfy the delta split predicate")
    // delta-side matches are strictly older (smaller id)
    assert(dd.filter(col("match_side") === "delta" &&
      col("match_id") >= col("new_id")).count() == 0)
    // restriction law: q130's pair set == q42's verified pairs restricted
    // to those with a delta element as max-side or any delta×corpus pair
    val delta = (id: Long) =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).take(1).map("%02x".format(_))
        .mkString < "1a"
    val q42 = DedupOps.verifiedPairs(spark, sf0001)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = q42.flatMap { case (a, b) =>
      (delta(a), delta(b)) match {
        case (true, true)   => Seq((math.max(a, b), math.min(a, b)))
        case (true, false)  => Seq((a, b))
        case (false, true)  => Seq((b, a))
        case (false, false) => Nil
      }
    }.toSet
    val got = dd.select("new_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    dd.unpersist()
  }

  test("q131 fits are finite, keyed per language, and scale-free in ties") {
    val fits = DedupFusionOps.zipfFit(spark, sf0001).collect()
    assert(fits.nonEmpty)
    fits.foreach { r =>
      val (slope, icept) = (r.getDouble(2), r.getDouble(3))
      assert(!slope.isNaN && !icept.isNaN, s"degenerate fit for $r")
      assert(slope < 0, s"rank-frequency slope must be negative: $r")
      assert(r.getLong(1) > 1, "fit needs at least two rank points")
    }
  }

  test("q132 fusion labels are consistent with every contributing signal") {
    val labels = DedupFusionOps.fusionClusters(spark, sf0001).cache()
    val lbl = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each signal's pairs must land in one fused cluster
    val minhash = DedupOps.verifiedPairs(spark, sf0001)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val simhash = DedupOps.simhashPairs(spark, sf0001)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    (minhash ++ simhash).foreach { case (a, b) =>
      assert(lbl(a) == lbl(b), s"signal pair ($a,$b) split across clusters")
    }
    // exact-fingerprint groups collapse too
    graft.sources.Tables(spark, sf0001, "documents")
      .select(col("doc_id"), DedupOps.fingerprintExpr(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._2).values.filter(_.size > 1).foreach { g =>
        assert(g.map(p => lbl(p._1)).toSet.size == 1,
          s"exact-dup group ${g.map(_._1).sorted} split in fusion")
      }
    // label is the component minimum: no member smaller than its label
    assert(labels.filter(col("doc_id") < col("cluster_id")).count() == 0)
    // fusion refines q45: q45-same-cluster implies fusion-same-cluster
    val q45 = DedupOps.clusterLabels(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q45.groupBy(_._2).values.foreach { members =>
      val fused = members.keys.map(lbl).toSet
      assert(fused.size == 1,
        s"q45 cluster ${members.keys.toSeq.sorted} split in fusion")
    }
    labels.unpersist()
  }

  test("persisted LSH index: indexed delta dedup == q130, corpus read from disk") {
    val path = java.nio.file.Files
      .createTempDirectory("lsh-index").toString
    DedupFusionOps.lshWriteIndex(spark, sf0001, path)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))
    val live = DedupFusionOps.deltaDedup(spark, sf0001)
      .collect().map(key).toSet
    val indexed = DedupFusionOps.deltaDedupIndexed(spark, sf0001, path)
    val got = indexed.collect().map(key).toSet
    assert(got == live, "indexed delta dedup must equal the live form")
    assert(got.nonEmpty)
    // the corpus side really comes from the stored index, not a rescan
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains(path), s"plan must read the index at $path:\n$plan")
    // the index holds only the standing corpus: no delta doc appears
    val deltaIdSet = graft.sources.Tables(spark, sf0001, "documents")
      .select(col("doc_id"))
      .where(substring(md5(col("doc_id").cast("string")), 1, 2) < "1a")
      .collect().map(_.getLong(0)).toSet
    val indexIds = spark.read.parquet(s"$path/bands")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexIds.intersect(deltaIdSet).isEmpty,
      "index must exclude the delta side")
  }

  test("persisted span index: indexed novelty == live q139, read from disk") {
    val path = java.nio.file.Files
      .createTempDirectory("span-index").toString
    DedupFusionOps.spanWriteIndex(spark, sf0001, path)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val live = DedupFusionOps.noveltyScore(spark, sf0001)
      .collect().map(key).toSet
    val indexed = DedupFusionOps.noveltyScoreIndexed(spark, sf0001, path)
    val got = indexed.collect().map(key).toSet
    assert(got == live, "indexed novelty must equal the live form")
    assert(got.nonEmpty)
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains(path), s"plan must read the index at $path:\n$plan")
  }

  test("q139 novelty matches a driver-side window recompute") {
    val k = 8
    val all = graft.sources.Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"),
        (substring(md5(col("doc_id").cast("string")), 1, 2) < "1a")
          .as("is_delta"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    def wins(text: String): Seq[String] = {
      val tok = text.split(" ", -1).toSeq
      if (tok.length < k) Nil else tok.sliding(k).map(_.mkString(" ")).toSeq
    }
    val corpusGrams = all.filter(!_._3).flatMap(d => wins(d._2)).toSet
    val expected = all.filter(_._3).map { case (id, text, _) =>
      val w = wins(text)
      val novel = w.count(g => !corpusGrams.contains(g)).toLong
      val pct = if (w.isEmpty) 0L else 100L * novel / w.length
      (id, w.length.toLong, novel, pct)
    }.toSet
    val got = DedupFusionOps.noveltyScore(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(expected.nonEmpty)
    assert(got == expected)
    // sanity: at least one doc measured, percentages in range
    assert(got.forall { case (_, nw, nn, p) =>
      nn <= nw && p >= 0 && p <= 100 })
  }
}
