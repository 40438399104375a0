package graft

import graft.reference.Schemas
import graft.sources.{Tables, TopicSource}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dirty-input and approximate-operator behavior, plus the
  * stream-stream join the reference lacks (SURVEY §2.5 "absent"). */
class RobustnessSpec extends SparkSuite {

  test("approx_count_distinct within 5% of exact") {
    import spark.implicits._
    val df = Tables(spark, sf0001, "events")
      .agg(countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id").as("approx"))
      .head
    val (exact, approx) = (df.getLong(0), df.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("approx_percentile (sketch path) brackets the exact percentile") {
    import spark.implicits._
    val rows = Tables(spark, sf0001, "events")
      .agg(expr("percentile(value, 0.5)").as("exact_p50"),
        expr("approx_percentile(value, 0.5, 1000)").as("approx_p50"),
        min($"value").as("lo"), max($"value").as("hi"))
      .head
    val (exact, approx) = (rows.getDouble(0), rows.getDouble(1))
    val span = rows.getDouble(3) - rows.getDouble(2)
    // sketch guarantees rank error <= 1/accuracy; value-space check is a
    // loose but deterministic bracket on this distribution
    assert(math.abs(approx - exact) <= span * 0.05,
      s"exact=$exact approx=$approx span=$span")
  }

  test("corrupt JSON records parse to null rows, not query failure") {
    import spark.implicits._
    val rows = Seq(
      """{"bus": 38, "heure": "6h", "passages": ["45"]}""",
      """{not json at all""",
      """{"bus": "not-an-int", "heure": "7h", "passages": []}""")
    val parsed = TopicSource.lift(rows.toDF("value"), Schemas.busAirport)
    // well-formed row survives; corrupt rows yield null fields
    assert(parsed.count() == 3)
    assert(parsed.filter($"bus".isNotNull).count() == 1)
    assert(parsed.filter($"bus" === 38).head.getString(1) == "6h")
  }

  test("stream-stream join: clicks joined to later purchases in-window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val c = clicks.toDF().toDF("user", "c_ts").withWatermark("c_ts", "1 minute")
    val b = buys.toDF().toDF("b_user", "b_ts").withWatermark("b_ts", "1 minute")
    val joined = c.join(b,
      $"user" === $"b_user" && $"b_ts" >= $"c_ts" &&
        $"b_ts" <= $"c_ts" + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ss_join").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    clicks.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:01:00")))
    buys.addData((1L, ts("2024-01-01 10:05:00")), // in range -> joins
      (2L, ts("2024-01-01 10:30:00")))            // outside 10 min -> no join
    q.processAllAvailable()
    val out = spark.table("ss_join").collect().map(_.getLong(0)).toSeq
    q.stop()
    assert(out == Seq(1L))
  }

  test("stream-static join: streaming facts enrich against a batch dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Tables(spark, sf0001, "nation")
      .select($"n_nationkey", $"n_name")
    val facts = MemoryStream[(Long, Double)]
    val q = facts.toDF().toDF("nationkey", "amount")
      .join(broadcast(dim), $"nationkey" === $"n_nationkey")
      .writeStream.outputMode("append").format("memory")
      .queryName("ss_static").start()
    facts.addData((0L, 10.0), (1L, 20.0), (9999L, 5.0)) // 9999: no dim row
    q.processAllAvailable()
    val out = spark.table("ss_static").collect()
      .map(r => (r.getAs[Long]("nationkey"), r.getAs[String]("n_name")))
      .toSet
    q.stop()
    assert(out.map(_._1) == Set(0L, 1L)) // inner join drops the orphan
    assert(out.forall(_._2.nonEmpty))
  }

  test("salted join result identical to plain join") {
    import spark.implicits._
    val plain = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = graft.operators.Operators.saltedJoin(
      Tables(spark, sf0001, "orders").withColumn("key", $"o_custkey"),
      Tables(spark, sf0001, "customer").withColumn("key", $"c_custkey"),
      "key", saltFactor = 8)
      .select($"o_orderkey", $"c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("degenerate vectors: short rows drop from cells, zero-norm never wins") {
    import spark.implicits._
    // a 64-dim corpus of two vectors + one SHORT (wrong-dim) + one
    // all-zero; the short row must get a NULL cell (NearestIndex's
    // degrade contract) and silently drop from every cell equi-join;
    // the zero-norm row must never win a similarity argmax (NaN
    // demotion) though it keeps a valid cell
    def vec(seed: Int): Seq[Float] =
      (0 until 64).map(d => ((seed * 31 + d) % 7 - 3) / 3.0f)
    val frame = Seq(
      (1L, vec(1), 0), (2L, vec(2), 1),
      (3L, Seq(1.0f, 2.0f), 0), // wrong dims
      (4L, Seq.fill(64)(0.0f), 1) // zero norm
    ).toDF("vec_id", "embedding", "label")
    val celled = graft.queries.VectorOps.withGridCell(frame)
    val cells = celled.collect()
      .map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("cell")))).toMap
    assert(cells(3L).isEmpty, "short vector must take a NULL cell")
    assert(cells(1L).nonEmpty && cells(2L).nonEmpty && cells(4L).nonEmpty)
    // the streaming hard-negative lookup on these frames (batch
    // execution of the same plan): doc 3 contributes nothing, and a
    // query landing in doc 4's cell can only pick 4 if NO real
    // cross-label vector shares the cell — never over one
    val qs = Seq((10L, vec(1), 1,
      java.sql.Timestamp.valueOf("2025-01-25 16:00:01")))
      .toDF("query_id", "embedding", "label", "event_ts")
    val out = graft.streaming.StreamingQueries
      .hardNegativeStream(qs, frame)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // query 10 (label 1) shares vec(1)'s cell with doc 1 (label 0):
    // the real vector must win over any degenerate candidate
    assert(out.get(10L).contains(1L), s"got $out")
  }

  test("degenerate vectors in the graph family: zero-norm and " +
      "wrong-dim rows never displace a real neighbor") {
    import spark.implicits._
    import graft.queries.KnnGraphOps
    // 20 real vectors + 1 zero-norm (cosine NaN -> -inf demotion) +
    // 1 wrong-dim (cosine NULL, sorts last under desc). n=22 puts the
    // whole frame in ONE seed bucket pair (nBuckets = 1), so every
    // node sees every other as a candidate — a real node's top-k is
    // then provably all-real, and the degenerate rows can only rank
    // each other
    def vec(seed: Int): Seq[Float] =
      (0 until 64).map(d => ((seed * 31 + d) % 7 - 3) / 3.0f)
    val rows = (1 to 20).map(i => (i.toLong, vec(i))) ++
      Seq((98L, Seq.fill(64)(0.0f)), (99L, Seq(1.0f, 2.0f)))
    val frame = rows.toDF("vec_id", "embedding")
    val g = KnnGraphOps.nnDescentOf(frame).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    val degen = Set(98L, 99L)
    // every vector (degenerate included) carries adjacency rows
    assert(g.map(_._1).toSet == rows.map(_._1).toSet)
    // no real node ranks a degenerate neighbor (its 19 real
    // candidates fill k=8 first)
    assert(g.forall { case (a, b, _) => degen(a) || !degen(b) },
      g.filter(e => !degen(e._1) && degen(e._2)).mkString(", "))
    // the zero-norm node's sims are all the -inf demotion; the
    // wrong-dim node's are NULL against real vectors (ragged dot)
    // and -inf against the zero-norm one (zero denominator → NaN →
    // demotion) — deterministic, never a raw NaN, never a raise
    assert(g.filter(_._1 == 98L)
      .forall(_._3.contains(Double.NegativeInfinity)))
    assert(g.filter(_._1 == 99L).forall(e =>
      e._3.isEmpty ||
        (e._2 == 98L && e._3.contains(Double.NegativeInfinity))))
    // and the insert path: a zero-norm arrival still routes (k rows,
    // ranked by the deterministic id tie-break), never crashes or NaNs
    val corpus = frame.filter($"vec_id" <= 20)
    val routed = KnnGraphOps.deltaRouteOf(
        Seq((98L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding"),
        corpus, KnnGraphOps.nnDescentOf(corpus)
          .select($"a_id", $"b_id"),
        nBuckets = 1L)
      .collect()
    assert(routed.length == KnnGraphOps.GraphK)
    assert(routed.forall(r =>
      r.getDouble(3) == Double.NegativeInfinity))
  }

  test("convergent descent on degenerate corpora: the ε-stop fires " +
      "immediately, never raises, and keeps the degenerate laws") {
    import spark.implicits._
    import graft.queries.KnnGraphOps
    // all-zero corpus: every cosine is the NaN→-inf demotion, the
    // topK tie-break is pure (sim desc, b_id asc) = lowest ids — so
    // round 1's merge reproduces the seed graph exactly and the
    // new-edge rate reads 0 < ε. The pin: the convergence loop
    // terminates on its FIRST check (no spin toward the cap on a
    // graph that cannot improve) and ANSI never raises on the
    // all-degenerate arithmetic.
    val zeros = (1 to 20).map(i => (i.toLong, Seq.fill(16)(0.0f)))
      .toDF("vec_id", "embedding")
    val (gz, zRounds, zConv) = KnnGraphOps.nnDescentToConvergence(zeros)
    assert(zConv && zRounds == 1,
      s"all-degenerate corpus must ε-stop at round 1, got $zRounds")
    val zRows = gz.collect()
    assert(zRows.map(_.getLong(0)).toSet == (1 to 20).map(_.toLong).toSet)
    assert(zRows.forall(_.getDouble(2) == Double.NegativeInfinity))
    // mixed frame (the nnDescentOf fixture above): convergence keeps
    // the law that no real node ranks a degenerate neighbor
    def vec(seed: Int): Seq[Float] =
      (0 until 64).map(d => ((seed * 31 + d) % 7 - 3) / 3.0f)
    val rows = (1 to 20).map(i => (i.toLong, vec(i))) ++
      Seq((98L, Seq.fill(64)(0.0f)), (99L, Seq(1.0f, 2.0f)))
    val (gm, _, mConv) = KnnGraphOps.nnDescentToConvergence(
      rows.toDF("vec_id", "embedding"))
    assert(mConv, "22-vector mixed corpus must converge before the cap")
    val degen = Set(98L, 99L)
    assert(gm.collect().forall(r =>
      degen(r.getLong(0)) || !degen(r.getLong(1))),
      "a converged real node must still never rank a degenerate neighbor")
  }

  test("calibration and DSIR lifts keep NULL/empty-text docs as rows") {
    import spark.implicits._
    // the synthetic corpus never carries NULL or empty text, so the
    // oracle hash can't witness these paths — pin them here (the
    // fertilityStream ADVICE lesson, applied batch-side)
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog sat too", "web"),
      (2L, null.asInstanceOf[String], "web"),
      (3L, "", "web"),
      (4L, "dog cat dog cat dog", "news"))
      .toDF("doc_id", "text", "source")

    val cal = graft.queries.TextOps.sourceCalibratedScoreOf(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(cal.keySet == Set(1L, 2L, 3L, 4L), s"docs dropped: $cal")
    // NULL and empty text score 0 and land in the bottom bin — their
    // percentile is the share of their source in bin ≤ 0, never null
    assert(cal(2L)._1 == 0L && cal(3L)._1 == 0L)
    assert(cal(2L) == cal(3L), "NULL and empty text must calibrate alike")
    // every percentile is a valid integer in (0, 100]
    assert(cal.values.forall(v => v._2 > 0 && v._2 <= 100), cal.toString)

    val feats = graft.queries.PipelineOps.dsirFeatures(docs)
    // NULL text yields no bigrams; single-token and empty texts none
    // either — feature rows exist only for docs 1 and 4
    val byDoc = feats.groupBy($"doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet == Set(1L, 4L), byDoc.toString)
    assert(byDoc(1L) == 10L && byDoc(4L) == 4L, byDoc.toString)
  }

  test("registry queries are eval-mode independent: a legacy session " +
      "returns the ANSI-default rows (sample across families)") {
    // deployment sessions differ on spark.sql.ansi.enabled; the
    // engine's integer-exact discipline means no query may depend on
    // it (an overflow or bad cast ANYWHERE would already have failed
    // the ANSI-default oracle gate — this pins the other direction:
    // legacy wrapping changes nothing either)
    val prefixes = Seq("q01_", "q42_", "q63_", "q89_", "q111_",
      "q148_", "q184_")
    val qs = graft.SparkEntry.queries.filter { case (k, _) =>
      prefixes.exists(k.startsWith) }
    assert(qs.size == prefixes.size,
      s"sample drifted: ${qs.keys.toSeq.sorted}")
    val before = spark.conf.get("spark.sql.ansi.enabled")
    assert(before == "true", "Spark 4 ships ANSI-default")
    for ((name, f) <- qs) {
      val ansi = f(spark, sf0001).collect()
        .map(_.toString).sorted.toSeq
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val legacy =
        try f(spark, sf0001).collect().map(_.toString).sorted.toSeq
        finally spark.conf.set("spark.sql.ansi.enabled", before)
      assert(ansi == legacy, s"$name diverges between eval modes")
      assert(ansi.nonEmpty, name)
    }
  }
}
