package graft.queries

import graft.SparkSuite

/** ANN correctness contract: exhaustive probing must equal brute
  * force; partial probing is approximate but measured. Also exercises
  * the SQL registration of the native expressions. */
class VectorSearchSpec extends SparkSuite {

  test("IVF with probes == cells equals brute-force top-5") {
    val brute = VectorOps.knnTopK(spark, sf0001).orderBy("rank")
      .collect().map(_.getLong(1)).toSeq
    val exhaustive = VectorOps.ivfSearch(spark, sf0001, nCells = 16,
      probes = 16).orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(exhaustive == brute)
  }

  test("IVF probe-4 recall is measured and nonzero") {
    val brute = VectorOps.knnTopK(spark, sf0001)
      .collect().map(_.getLong(1)).toSet
    val approx = VectorOps.ivfKnn(spark, sf0001)
      .collect().map(_.getLong(1)).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    info(s"IVF probes=4/16 recall@5 = $recall")
    assert(approx.size == 5)
    assert(recall >= 0.2) // random vectors scatter; exactness is the
                          // probes==cells case above
  }

  test("ANN recall audit (q83) flags exactly the driver-computed memberships") {
    val exact = VectorOps.knnTopK(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val adc5 = VectorOps.ivfPqAnn(spark, sf0001).collect()
      .map(_.getLong(1)).toSet
    val adc32 = VectorOps.ivfPqAnn(spark, sf0001, 4, 32).collect()
      .map(_.getLong(1)).toSet
    val got = VectorOps.annRecall(spark, sf0001).collect()
      .map(r => r.getAs[Long]("rank") -> ((r.getAs[Long]("vec_id"),
        r.getAs[Boolean]("in_adc"), r.getAs[Boolean]("in_shortlist32"))))
      .toMap
    assert(got.keySet == exact.map(_._1).toSet)
    for ((rank, id) <- exact)
      assert(got(rank) == ((id, adc5(id), adc32(id))), s"rank $rank")
    // shortlist32 ⊇ adc5 membership-wise on the flagged rows
    for ((_, (_, in5, in32)) <- got) assert(!in5 || in32)
  }

  test("embeddings dim is 64 — the constant the SRP oracle SQL pins") {
    val d = graft.sources.Tables(spark, sf0001, "embeddings")
      .selectExpr("size(embedding) AS d").distinct().collect()
    assert(d.map(_.getInt(0)).toSeq == Seq(64))
  }

  test("SRP probe-all (maxHamming == nbits) equals brute-force top-5") {
    val brute = VectorOps.knnTopK(spark, sf0001).orderBy("rank")
      .collect().map(_.getLong(1)).toSeq
    val all = VectorOps.srpAnn(spark, sf0001, nbits = 4, maxHamming = 4)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(all == brute)
  }

  test("SRP hamming-1 multi-probe recall is measured and nonzero") {
    val brute = VectorOps.knnTopK(spark, sf0001)
      .collect().map(_.getLong(1)).toSet
    val approx = VectorOps.srpAnn(spark, sf0001)
      .collect().map(_.getLong(1)).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    info(s"SRP nbits=4 hamming<=1 recall@5 = $recall")
    assert(approx.size == 5)
    assert(recall >= 0.2) // random vectors scatter across hyperplanes;
                          // exactness is the probe-all case above
  }

  test("PQ codes and ADC ranking match an independent driver-side recompute") {
    // independent path: raw embeddings read directly from parquet (not
    // via withPqCode), quantized and coded in plain Scala against the
    // same public codebook definition, then ADC-ranked — any Spark-side
    // expression slip (element_at off-by-one, shift/mask, argmin tie)
    // diverges from this
    val cb = VectorOps.pqCodebook()
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(v =>
        math.floor(v.toDouble * 1024).toLong).toArray).toMap
    def codeOf(qv: Array[Long]): Array[Int] =
      (0 until 8).map { s =>
        (0 until 16).map { w =>
          w -> (0 until 8).map { d =>
            val t = qv(s * 8 + d) - cb(s)(w)(d); t * t
          }.sum
        }.minBy { case (w, dist) => (dist, w) }._1
      }.toArray
    val expectCodes = rows.map { case (id, qv) =>
      id -> codeOf(qv).zipWithIndex.map { case (c, s) => c.toLong << (4 * s) }.sum
    }
    val gotCodes = VectorOps.pqCodes(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCodes == expectCodes)
    assert(gotCodes.values.toSet.size > 1, "quantizer must split the corpus")

    val qQv = rows(0L)
    val lut = (0 until 8).map(s => (0 until 16).map(w =>
      (0 until 8).map { d => val t = qQv(s * 8 + d) - cb(s)(w)(d); t * t }.sum))
    val expectTop = rows.toSeq.filter(_._1 != 0L).map { case (id, qv) =>
      val c = codeOf(qv)
      id -> (0 until 8).map(s => lut(s)(c(s))).sum
    }.sortBy { case (id, d) => (d, id) }.take(5)
    val gotTop = VectorOps.pqAnn(spark, sf0001).orderBy("rank").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toSeq
    assert(gotTop == expectTop)
  }

  test("doc ANN (q70) matches an independent driver-side recompute of the full loop") {
    // independent path: tokenize + feature-hash + densify + grid/PQ
    // assign + ADC rank, all in plain Scala from the raw documents
    // parquet — any slip anywhere in the composed engine pipeline
    // (q69 aggregation, densify sums, quantizer offsets, probe choice)
    // diverges from this
    def md5Long8(seed: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(seed.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8), 16)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = docs.map { case (id, text) =>
      val v = new Array[Long](64)
      text.split(" ", -1).foreach { t => v((md5Long8(t) % 64).toInt) += 1 }
      id -> v.map(c => math.floor(c.toFloat.toDouble * 1024).toLong)
    }
    val cents = VectorOps.ivfGridCentroids()
    def cellOf(q: Array[Long]): Int =
      cents.zipWithIndex.map { case (ct, i) =>
        (i, ct.zip(q).map { case (c, x) => val t = x - c; t * t }.sum)
      }.minBy { case (i, d) => (d, i) }._1
    val cb = VectorOps.pqCodebook()
    def codeOf(q: Array[Long]): Array[Int] =
      (0 until 8).map { s =>
        (0 until 16).map { w =>
          w -> (0 until 8).map { d =>
            val t = q(s * 8 + d) - cb(s)(w)(d); t * t
          }.sum
        }.minBy { case (w, dist) => (dist, w) }._1
      }.toArray
    val qQv = vecs(0L)
    val probeSet = cents.zipWithIndex.map { case (ct, i) =>
      (i, ct.zip(qQv).map { case (c, x) => val t = x - c; t * t }.sum)
    }.sortBy { case (i, d) => (d, i) }.take(4).map(_._1).toSet
    val lut = (0 until 8).map(s => (0 until 16).map(w =>
      (0 until 8).map { d => val t = qQv(s * 8 + d) - cb(s)(w)(d); t * t }.sum))
    val expect = vecs.toSeq
      .filter { case (id, q) => id != 0L && probeSet(cellOf(q)) }
      .map { case (id, q) =>
        val c = codeOf(q)
        id -> (0 until 8).map(s => lut(s)(c(s))).sum
      }.sortBy { case (id, d) => (d, id) }.take(5)
    val got = VectorOps.docAnn(spark, sf0001).orderBy("rank").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toSeq
    assert(got == expect)
    assert(expect.nonEmpty)
  }

  test("IVF-PQ with probes == cells equals plain PQ ADC top-5") {
    val pq = VectorOps.pqAnn(spark, sf0001).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val all = VectorOps.ivfPqAnn(spark, sf0001, probes = 16)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(all == pq)
  }

  test("persisted IVF index: probe-all == brute force, scan prunes to probed cells") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf").toString + "/idx"
    try {
      VectorOps.ivfWriteIndex(spark, sf0001, tmp)
      // probes == nCells over the on-disk index must equal brute force —
      // the same exactness contract as q37, now through the write path
      val brute = VectorOps.knnTopK(spark, sf0001).orderBy("rank")
        .collect().map(_.getLong(1)).toSeq
      val all = VectorOps.ivfSearchIndexed(spark, tmp, probes = 16)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
      assert(all == brute)
      // probe-4: the cell IN (...) predicate must be a PARTITION filter —
      // only the probed directories are listed and read
      val p4 = VectorOps.ivfSearchIndexed(spark, tmp, probes = 4)
      val plan = p4.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "")
      assert(plan.contains("PartitionFilters: [cell IN ("), plan)
      assert(p4.collect().length == 5)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(tmp).getParentFile)
    }
  }

  test("IVF-PQ rerank with probe-all + full shortlist equals brute force") {
    val brute = VectorOps.knnTopK(spark, sf0001).orderBy("rank")
      .collect().map(_.getLong(1)).toSeq
    val reranked = VectorOps.ivfPqRerank(spark, sf0001,
      probes = 16, shortlist = 1000000).orderBy("rank")
      .collect().map(_.getLong(1)).toSeq
    assert(reranked == brute)
    // and the default two-stage query returns a full top-5
    assert(VectorOps.ivfPqRerank(spark, sf0001).collect().length == 5)
  }

  test("compressed IVF-PQ index: indexed search == q68, partition-pruned, codes-only scan") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/idx"
    try {
      VectorOps.ivfPqWriteIndex(spark, sf0001, tmp)
      val qRow = spark.read.parquet(s"$sf0001/embeddings.parquet")
        .filter("vec_id = 0").select("embedding")
        .head.getSeq[Float](0).toArray
      // the on-disk compressed index must answer the q68 IVF-PQ query
      // identically — same probe set, same integer distances
      val expect = VectorOps.ivfPqAnn(spark, sf0001, probes = 4)
        .orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val indexed = VectorOps.ivfPqSearchIndexed(spark, tmp, qRow,
        probes = 4, excludeVecId = Some(0L))
      val got = indexed.orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect)
      // plan contract: probes land as planning-time partition filters,
      // and the scan reads ONLY (vec_id, code) — no embedding bytes
      // exist in this layout, which is the memory-feasibility argument
      val plan = indexed.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "")
      assert(plan.contains("PartitionFilters: [cell IN ("), plan)
      assert(plan.contains("ReadSchema: struct<vec_id:bigint,code:bigint>"), plan)
      assert(!plan.contains("embedding"), plan)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(tmp).getParentFile)
    }
  }

  test("extensions register fvec_dot/simhash64/minhash_longs for SQL") {
    // inject into the existing session the way withExtensions would
    new graft.GraftExtensions()
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    // direct registry path (same builders the extension injects)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fvec_dot",
      exprs => graft.functions.VectorExpressions.FloatVecDot(exprs(0), exprs(1)),
      "scala_udf")
    val d = spark.sql(
      "SELECT fvec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head.getDouble(0)
    assert(d == 11.0)
    // dim_counts through the same registry path: one-pass histogram
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dim_counts",
      exprs => graft.functions.VectorExpressions
        .DimCountVector(exprs(0), 4),
      "scala_udf")
    val h = spark.sql("SELECT dim_counts(array(0L, 1L, 1L, 3L, 7L), 4)")
      .head.getSeq[Float](0)
    assert(h == Seq(1f, 2f, 0f, 2f)) // 7 % 4 = 3 joins the last bucket
  }

  test("q134 hard negatives match a driver-side within-cell recompute") {
    // exact replication of the engine arithmetic: fvec_dot multiplies
    // in FLOAT then widens (VectorExpressions.FloatVecDot), norms are
    // sqrt of the self-dot, NaN demotes to -inf — so similarities are
    // bitwise-identical and the ranking must agree exactly
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0d; var i = 0
      while (i < a.length) { acc += (a(i) * b(i)).toDouble; i += 1 }
      acc
    }
    def sim(a: Array[Float], b: Array[Float]): Double = {
      val s = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      if (s.isNaN) Double.NegativeInfinity else s
    }
    val cents = VectorOps.ivfGridCentroids()
    def cellOf(v: Array[Float]): Int = {
      val q = v.map(x => math.floor(x.toDouble * 1024).toLong)
      cents.zipWithIndex.map { case (ct, i) =>
        (ct.zip(q).map { case (c, x) => val d = x - c; d * d }.sum, i)
      }.min._2
    }
    val rows = graft.sources.Tables(spark, sf0001, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val expected = (for {
      (_, cellRows) <- rows.toSeq.groupBy(r => cellOf(r._2)).toSeq
      (aId, aEmb, aLab) <- cellRows
      ((bId, bLab, _), i) <- cellRows.filter(_._3 != aLab)
        .map { case (bId, bEmb, bLab) => (bId, bLab, sim(aEmb, bEmb)) }
        .sortBy { case (bId, _, s) => (-s, bId) }
        .take(3).zipWithIndex
    } yield (aId, (i + 1).toLong, bId, bLab.toLong)).toSet
    val got = VectorOps.hardNegatives(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(expected.nonEmpty)
    assert(got == expected)
  }

  test("q136 triplets match a driver-side hardest-pos/hardest-neg recompute") {
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0d; var i = 0
      while (i < a.length) { acc += (a(i) * b(i)).toDouble; i += 1 }
      acc
    }
    def sim(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val cents = VectorOps.ivfGridCentroids()
    def cellOf(v: Array[Float]): Int = {
      val q = v.map(x => math.floor(x.toDouble * 1024).toLong)
      cents.zipWithIndex.map { case (ct, i) =>
        (ct.zip(q).map { case (c, x) => val d = x - c; d * d }.sum, i)
      }.min._2
    }
    val rows = graft.sources.Tables(spark, sf0001, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val expected = (for {
      (_, cellRows) <- rows.toSeq.groupBy(r => cellOf(r._2)).toSeq
      (aId, aEmb, aLab) <- cellRows
      cands = cellRows.filter(c => c._1 != aId)
        .map { case (bId, bEmb, bLab) => (bId, bLab, sim(aEmb, bEmb)) }
        .filter(!_._3.isNaN)
      poss = cands.filter(_._2 == aLab)
      negs = cands.filter(_._2 != aLab)
      if poss.nonEmpty && negs.nonEmpty
    } yield {
      val p = poss.minBy { case (bId, _, s) => (s, bId) }
      val n = negs.maxBy { case (bId, _, s) => (s, -bId) }
      (aId, p._1, n._1, n._3 >= p._3)
    }).toSet
    val got = VectorOps.tripletMargins(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(expected.nonEmpty)
    assert(got == expected)
  }

  test("q146 chunk retrieval: query doc excluded, ranks tight, ids valid") {
    import org.apache.spark.sql.functions._
    val got = VectorOps.chunkRetrieval(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (1L to got.length))
    assert(got.forall(_._2 != 0L), "query document must never surface")
    assert(got.map(_._4).toSeq.sliding(2).forall {
      case Seq(a, b) => a <= b; case _ => true
    }, "ADC distances must be ranked ascending")
    // every returned (doc, chunk) coordinate exists in q144's chunking
    val chunks = PipelineOps.ragChunks(spark, sf0001)
      .select(col("doc_id"), col("chunk_idx")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall(g => chunks((g._2, g._3))))
  }

  test("q141 drift report conserves vectors, ppm shares close to a million") {
    val rows = VectorOps.embeddingDrift(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val total = graft.sources.Tables(spark, sf0001, "embeddings").count()
    assert(rows.map(_._2).sum + rows.map(_._3).sum == total,
      "every vector lands in exactly one cell and one side")
    // truncating shares: sum within (1e6 - nCells, 1e6]
    val cPpm = rows.map(_._4).sum
    val dPpm = rows.map(_._5).sum
    assert(cPpm <= 1000000L && cPpm > 1000000L - rows.length)
    assert(dPpm <= 1000000L && dPpm > 1000000L - rows.length)
    rows.foreach { case (_, _, _, c, d, drift) =>
      assert(drift == math.abs(d - c))
    }
  }

  test("q157 Lloyd refinement: SSE monotone non-increasing, mass conserved") {
    val rows = VectorOps.kmeansRefine(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byRound = rows.groupBy(_._1)
    assert(byRound.keySet == Set(0L, 1L, 2L))
    // every vector is assigned every round (mass conservation)
    val ns = byRound.view.mapValues(_.map(_._3).sum).toMap
    assert(ns(0L) > 0 && ns(1L) == ns(0L) && ns(2L) == ns(0L))
    // Lloyd's invariant: total SSE never increases round over round
    val sse = byRound.view.mapValues(_.map(_._4).sum).toMap
    assert(sse(1L) <= sse(0L), s"round 1 SSE ${sse(1L)} > round 0 ${sse(0L)}")
    assert(sse(2L) <= sse(1L), s"round 2 SSE ${sse(2L)} > round 1 ${sse(1L)}")
    // training must actually buy something over the md5 seeds here
    assert(sse(1L) < sse(0L))
  }

  test("q137 confusion matrix conserves anchors, excludes the diagonal") {
    import org.apache.spark.sql.functions._
    val conf = VectorOps.labelConfusion(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(conf.nonEmpty)
    // a hard negative has a different label by construction
    assert(conf.forall { case (l, n, _, _) => l != n })
    // every rank-1 anchor lands in exactly one matrix cell
    val rank1 = VectorOps.hardNegatives(spark, sf0001)
      .filter(col("rank") === 1).count()
    assert(conf.map(_._3).sum == rank1, "anchor counts conserve")
    // ppm is the truncating integer share within each anchor label
    for ((lab, rows) <- conf.groupBy(_._1)) {
      val tot = rows.map(_._3).sum
      for ((_, _, n, ppm) <- rows)
        assert(ppm == 1000000L * n / tot, s"label $lab")
    }
  }
}
