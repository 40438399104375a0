package graft

import org.apache.spark.sql.functions._

/** The vector-side tick: branch behavior, replay convergence, and the
  * crash matrix (the IngestMainSpec doctrine applied to
  * [[VectorIngestMain]]). All scenarios run the REAL main body on
  * sf0.001 and read every assertion back from storage. */
class VectorIngestMainSpec extends SparkSuite {

  private def freshOut(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"vingest-$tag").toString

  private def edgeSet(path: String): Set[(Long, Long, Long)] = {
    val f = new java.io.File(s"$path/knn_graph/edges_delta")
    if (!f.exists()) Set.empty
    else spark.read.parquet(s"$path/knn_graph/edges_delta")
      .select(col("vec_id"), col("rank"), col("nb_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
  }

  test("insert branch: survivors routed, counters reconcile, replay " +
      "is a no-op") {
    val out = freshOut("ins")
    val c1 = VectorIngestMain.runVectorIngest(spark, sf0001, out,
      forceVerdict = Some("insert")).toMap
    assert(c1("verdict_rebuild") == 0L)
    assert(c1("n_survivors") == c1("n_delta") - c1("n_sdc_dupped"))
    assert(c1("n_survivors") > 0L && c1("delta_rows") > 0L)
    assert(c1("edges_after") == c1("edges_before"))
    val first = edgeSet(out)
    assert(first.nonEmpty)
    // replay: same out dir, same verdict — storage must not move.
    // recall_ppm is excluded from the equality: the gauge reads the
    // LIVE serving view, which tick 1's own append legitimately
    // changed (edges_delta now serves beside edges) — idempotency is
    // a storage property, and the floor flag must stay clear
    val c2 = VectorIngestMain.runVectorIngest(spark, sf0001, out,
      forceVerdict = Some("insert")).toMap
    assert(c2 - "recall_ppm" == c1 - "recall_ppm",
      s"replay drifted: $c2 vs $c1")
    assert(c2("recall_floor_breached") == 0L)
    assert(edgeSet(out) == first)
  }

  test("crash-mid-insert: a torn edges_delta converges on replay") {
    val out = freshOut("torn")
    val c1 = VectorIngestMain.runVectorIngest(spark, sf0001, out,
      forceVerdict = Some("insert")).toMap
    val pristine = edgeSet(out)
    // simulate the torn write: batch 0 re-written from only half the
    // survivors (what a crash between task commits can leave behind
    // after a partial retry)
    import spark.implicits._
    val emb = graft.sources.Tables(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding")
    val isDelta = substring(md5($"vec_id".cast("string")), 1, 2) < "1a"
    val corpus = emb.filter(!isDelta)
    val half = emb.filter(isDelta).limit(c1("n_survivors").toInt / 2)
    graft.streaming.StreamingQueries.graphInsertBatch(
      half, corpus, s"$out/knn_graph", batchId = 0L)
    assert(edgeSet(out) != pristine, "fixture failed to tear")
    val c2 = VectorIngestMain.runVectorIngest(spark, sf0001, out,
      forceVerdict = Some("insert")).toMap
    // recall_ppm excluded: the gauge reads the live serving view (the
    // torn delta was part of it mid-test) — the insert-branch replay
    // test's storage-property rule
    assert(c2 - "recall_ppm" == c1 - "recall_ppm")
    assert(edgeSet(out) == pristine, "replay must heal the torn batch")
  }

  test("a footerless torn delta batch does not brick the tick " +
      "(stage 1b reads the serving view before the heal runs)") {
    val out = freshOut("footerless")
    val c1 = VectorIngestMain.runVectorIngest(spark, sf0001, out,
      forceVerdict = Some("insert")).toMap
    // the crash shape: a batch directory with no parquet footer and
    // no _SUCCESS — a whole-tree parquet read throws on it, and the
    // tick's new recall gauge runs BEFORE the insert path's healing
    // overwrite ever could
    val torn = new java.io.File(s"$out/knn_graph/edges_delta/batch=9")
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.getPath + "/garbage"),
      "not parquet".getBytes("UTF-8"))
    val c2 = VectorIngestMain.runVectorIngest(spark, sf0001, out,
      forceVerdict = Some("insert")).toMap
    assert(c2 - "recall_ppm" == c1 - "recall_ppm",
      s"torn batch must not change the tick's storage facts: $c2 vs $c1")
    assert(c2("recall_floor_breached") == 0L)
  }

  test("rebuild branch: edges absorbed, edges_delta retired") {
    val out = freshOut("reb")
    // first tick inserts, second is the drift-triggered rebuild: the
    // insert-then-rebuild transition a deployment actually walks
    val c1 = VectorIngestMain.runVectorIngest(spark, sf0001, out,
      forceVerdict = Some("insert")).toMap
    assert(c1("delta_rows") > 0L)
    val c2 = VectorIngestMain.runVectorIngest(spark, sf0001, out,
      forceVerdict = Some("rebuild")).toMap
    assert(c2("verdict_rebuild") == 1L)
    assert(c2("delta_rows") == 0L)
    assert(!new java.io.File(s"$out/knn_graph/edges_delta").exists())
    assert(c2("edges_after") >= c2("edges_before"))
    // the rebuilt standing graph covers corpus ∪ survivors
    val nodes = spark.read.parquet(s"$out/knn_graph/edges")
      .select(col("a_id")).distinct().count()
    assert(nodes > c2("n_corpus"),
      "rebuild must fold survivors into the standing graph")
  }

  test("natural verdict follows the drift thresholds and the recall " +
      "floor") {
    val out = freshOut("nat")
    val c = VectorIngestMain.runVectorIngest(spark, sf0001, out).toMap
    val expect =
      c("tv2_ppm") > VectorIngestMain.graphTv2ThresholdPpm ||
        c("max_cell_ppm") > VectorIngestMain.graphCellThresholdPpm ||
        c("recall_floor_breached") == 1L
    assert(c("verdict_rebuild") == (if (expect) 1L else 0L),
      s"verdict must be the drift-or-floor decision: $c")
    // the gauge itself reconciles with the policy row it enforces
    assert(c("recall_floor_ppm") == VectorIngestMain.graphRecallFloorPpm)
    assert(c("recall_floor_breached") ==
      (if (c("recall_ppm") < c("recall_floor_ppm")) 1L else 0L))
  }

  test("breached recall floor forces rebuild, and the rebuild heals " +
      "the gauge (VERDICT r15 #6)") {
    import spark.implicits._
    val out = freshOut("floor")
    val c1 = VectorIngestMain.runVectorIngest(spark, sf0001, out,
      forceVerdict = Some("insert")).toMap
    assert(c1("recall_floor_breached") == 0L,
      s"healthy index must clear the floor: $c1")
    // degrade the standing index IN PLACE (zero drift — the failure
    // mode only the serving gauge can see): every node's adjacency
    // collapses to one target, so routes see bucket entries only;
    // the delta tree goes too, else its healthy adjacency re-injects
    // good candidates through reverse edges
    val ids = spark.read.parquet(s"$out/knn_graph/edges")
      .select($"a_id").distinct().collect().map(_.getLong(0))
    val sink = ids.min
    ids.filter(_ != sink).map(a => (a, sink, 0.0)).toSeq
      .toDF("a_id", "b_id", "sim")
      .write.mode("overwrite").parquet(s"$out/knn_graph/edges")
    val hfs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    hfs.delete(
      new org.apache.hadoop.fs.Path(s"$out/knn_graph/edges_delta"), true)
    val c2 = VectorIngestMain.runVectorIngest(spark, sf0001, out).toMap
    assert(c2("recall_floor_breached") == 1L,
      s"degraded index must breach the floor: $c2")
    assert(c2("verdict_rebuild") == 1L,
      s"breached floor must force rebuild: $c2")
    // the rebuild heals: the next tick's gauge clears the floor again
    val c3 = VectorIngestMain.runVectorIngest(spark, sf0001, out,
      forceVerdict = Some("insert")).toMap
    assert(c3("recall_floor_breached") == 0L,
      s"rebuild must restore serving recall: $c3")
  }

  test("tick verdict == q197's knn_graph policy row verbatim " +
      "(one policy table — VERDICT r14 #3)") {
    val out = freshOut("pol")
    val c = VectorIngestMain.runVectorIngest(spark, sf0001, out).toMap
    val row = graft.queries.VectorOps.reindexDecision(spark, sf0001)
      .filter(col("index_family") === "knn_graph").collect()
    assert(row.length == 1, "q197 must carry the knn_graph family row")
    val r = row.head
    // same drift scalars in, same thresholds (one table), so the
    // tick's rebuild/insert arm must be q197's rebuild/keep verdict
    assert(r.getAs[Long]("tv2_ppm") == c("tv2_ppm"))
    assert(r.getAs[Long]("max_cell_ppm") == c("max_cell_ppm"))
    assert(!r.getAs[Boolean]("recall_gated"),
      "the graph family is drift-only; its row must not be recall-gated")
    // q197 reports the floor, the tick enforces it — parity with the
    // drift verdict is claimed (and holds) only while the floor is
    // clear, which a healthy fixture must be
    assert(r.getAs[Long]("recall_floor_ppm") == c("recall_floor_ppm"),
      "q197's graph row must carry the same floor the tick enforces")
    assert(c("recall_floor_breached") == 0L,
      s"healthy fixture breached the recall floor: $c")
    val q197Rebuild = r.getAs[String]("verdict") == "rebuild"
    assert(c("verdict_rebuild") == (if (q197Rebuild) 1L else 0L),
      s"tick verdict diverged from q197's graph row: $r vs $c")
  }
}
