package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** The knn-graph index lifecycle (VERDICT r14 #1): compaction absorbs
  * the nightly `edges_delta/batch=*` appends into `edges` and deletion
  * takes a vector down from BOTH sides of the adjacency — proved the
  * way the posting/chunk lifecycles are (SinkSemanticsSpec doctrine):
  * routed answers identical across compaction, deleted ids absent from
  * every adjacency and route, torn-write matrix green, and every
  * assertion read back from storage. All on sf0.001 with the real
  * bodies. */
class GraphIndexLifecycleSpec extends SparkSuite {

  private def fs =
    new Path("/tmp").getFileSystem(spark.sessionState.newHadoopConf())

  private def emb = graft.sources.Tables(spark, sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))
  private def isDelta =
    substring(md5(col("vec_id").cast("string")), 1, 2) < "1a"
  private def corpus = emb.filter(!isDelta)

  /** Fresh index: standing corpus graph + the delta split inserted as
    * TWO batches — two `edges_delta/batch=` directories, the
    * accumulation compaction exists to absorb. Deterministic content
    * (hash seed, exact scoring), so two builds compare equal. */
  private def buildIndex(tag: String): String = {
    val path = java.nio.file.Files
      .createTempDirectory(s"graphidx-$tag").toString
    KnnGraphOps.knnGraphWriteIndexOf(corpus, path)
    insertBatches(path)
    path
  }

  private def insertBatches(path: String): Unit = {
    import spark.implicits._
    val d = emb.filter(isDelta).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    graft.streaming.StreamingQueries.graphInsertBatch(
      d.take(d.length / 2).toSeq.toDF("vec_id", "embedding"),
      corpus, path, batchId = 0L)
    graft.streaming.StreamingQueries.graphInsertBatch(
      d.drop(d.length / 2).toSeq.toDF("vec_id", "embedding"),
      corpus, path, batchId = 1L)
  }

  /** The serving view, as storage facts. */
  private def edgeSet(path: String): Set[(Long, Long, Double)] =
    KnnGraphOps.readGraphEdges(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  /** Driver-side q201 route recompute (the OperatorPropertiesSpec
    * device) over an explicit edge set, so the spec can route the
    * pre-compaction view, its driver-capped image, and the
    * post-compaction storage and compare. Returns the 3-hop frontier
    * and the exact top-5. */
  private def routeOn(edges: Set[(Long, Long, Double)],
      start: Long): (Set[Long], Seq[Long]) = {
    val adj = edges.toSeq.groupBy(_._1)
      .map { case (k, rs) => k -> rs.map(_._2) }
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) Double.NegativeInfinity else d / den
    }
    val h1 = adj.getOrElse(start, Seq.empty).toSet
    val h2 = h1.flatMap(v => adj.getOrElse(v, Seq.empty))
    val h3 = h2.flatMap(v => adj.getOrElse(v, Seq.empty))
    val frontier = (h1 ++ h2 ++ h3) - start
    (frontier, frontier.toSeq
      .map(c => (cos(vecs(start), vecs(c)), c))
      .sortBy { case (s, id) => (-s, id) }.take(5).map(_._2))
  }

  private def route(path: String, start: Long): Seq[Long] =
    routeOn(edgeSet(path), start)._2

  /** The compaction contract's expected image: per-node top-k of the
    * view (sim desc, b_id asc) — the HNSW degree bound the absorb
    * re-asserts. */
  private def capK(edges: Set[(Long, Long, Double)])
      : Set[(Long, Long, Double)] =
    edges.toSeq.groupBy(_._1).values.flatMap(rs =>
      rs.sortBy { case (_, b, s) => (-s, b) }
        .take(KnnGraphOps.GraphK)).toSet

  private def perNodeCap(path: String): Long = {
    val counts = spark.read.parquet(s"$path/edges")
      .groupBy("a_id").count().agg(max("count")).collect()
    if (counts.head.isNullAt(0)) 0L else counts.head.getLong(0)
  }

  test("compaction = exactly topK(view): absorbs both delta batches, " +
      "retires the tree, keeps routes stable on the capped view, and " +
      "inserted vectors are searchable") {
    val path = buildIndex("compact")
    assert(fs.exists(new Path(s"$path/edges_delta/batch=0")))
    assert(fs.exists(new Path(s"$path/edges_delta/batch=1")))
    val before = edgeSet(path)
    val want = capK(before)
    val deltaIds = emb.filter(isDelta).collect().map(_.getLong(0)).sorted
    val dProbe = deltaIds.head
    // SEARCHABILITY (the bidirectional-link point): pre-compaction the
    // view must hold a reverse edge into the inserted vector, and a
    // 3-hop route from that corpus neighbor must REACH it
    val revSources = before.collect {
      case (a, b, _) if b == dProbe && !deltaIds.contains(a) => a
    }
    assert(revSources.nonEmpty,
      "inserted vector has no reverse (corpus -> delta) edge in view")
    val (frontier, _) = routeOn(before, revSources.head)
    assert(frontier.contains(dProbe),
      "an in-corpus route must reach the freshly inserted vector")
    // expected post-compaction routes, computed on the capped image
    val dRouteWant = routeOn(want, dProbe)._2
    val cRouteWant = routeOn(want, 0L)._2 // vec_id 0 is corpus ("cf…")
    assert(dRouteWant.nonEmpty)
    KnnGraphOps.compactGraphIndex(spark, path)
    assert(!fs.exists(new Path(s"$path/edges_delta")),
      "compaction must retire the delta tree")
    assert(!fs.exists(new Path(s"$path/edges.pre-compact")))
    assert(!fs.exists(new Path(s"$path/edges.compacting")))
    assert(edgeSet(path) == want,
      "post-compaction view must be exactly topK(pre-compaction view)")
    assert(route(path, dProbe) == dRouteWant,
      "a delta node's route must equal the capped-view route")
    assert(route(path, 0L) == cRouteWant)
    assert(perNodeCap(path) <= KnnGraphOps.GraphK)
    // delta adjacency now lives in edges itself
    val inEdges = spark.read.parquet(s"$path/edges")
      .filter(col("a_id") === dProbe).count()
    assert(inEdges > 0, "absorbed delta node missing from edges")
    // compacting again with nothing to absorb is a no-op
    KnnGraphOps.compactGraphIndex(spark, path)
    assert(edgeSet(path) == want)
  }

  test("compaction crash matrix: every torn state converges to the " +
      "clean result") {
    // the clean reference — builds are deterministic, so independently
    // built indexes compare equal by content
    val clean = buildIndex("cm-clean")
    KnnGraphOps.compactGraphIndex(spark, clean)
    val want = edgeSet(clean)

    // W1: died before any rename — a stale .compacting must be
    // overwritten, not wedge the run
    val w1 = buildIndex("cm-w1")
    fs.mkdirs(new Path(s"$w1/edges.compacting"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$w1/edges.compacting/garbage"),
      "not parquet".getBytes("UTF-8"))
    KnnGraphOps.compactGraphIndex(spark, w1)
    assert(edgeSet(w1) == want, "stale .compacting must not wedge")
    assert(!fs.exists(new Path(s"$w1/edges_delta")))

    // W2: died between the two renames — the only live edges copy sits
    // at .pre-compact; recovery must restore it and redo the absorb
    val w2 = buildIndex("cm-w2")
    assert(fs.rename(new Path(s"$w2/edges"),
      new Path(s"$w2/edges.pre-compact")))
    KnnGraphOps.compactGraphIndex(spark, w2)
    assert(edgeSet(w2) == want, "between-renames crash must recover")
    assert(!fs.exists(new Path(s"$w2/edges_delta")))

    // W3: died after the swap but before the delta delete — edges
    // already holds the absorbed rows and the ORIGINAL delta tree is
    // still there (copied aside before the compact and restored, the
    // faithful crash state: re-running insertBatches instead would
    // route against the absorbed graph and produce DIFFERENT rows —
    // reverse edges open paths through other delta nodes' adjacency).
    // The re-absorb of rows already inside the capped union must be
    // idempotent (pair-keyed MAX + topK of a subset union).
    val w3 = buildIndex("cm-w3")
    val aside = new Path(s"$w3/edges_delta.aside")
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(s"$w3/edges_delta"),
      fs, aside, false, spark.sessionState.newHadoopConf())
    KnnGraphOps.compactGraphIndex(spark, w3)
    assert(fs.rename(aside, new Path(s"$w3/edges_delta")))
    KnnGraphOps.compactGraphIndex(spark, w3)
    assert(edgeSet(w3) == want, "re-absorb must be idempotent")
    assert(!fs.exists(new Path(s"$w3/edges_delta")))
  }

  test("writer-generation fallback (ADVICE r15): a rev-less delta tree " +
      "reads as all-forward; a sim-less tree fails loud with the " +
      "rebuild remediation") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graphidx-oldgen").toString
    KnnGraphOps.knnGraphWriteIndexOf(corpus, path)
    // shape A — pre-bidirectional writer: (vec_id, rank, nb_id, sim),
    // no rev column. Fallback: every row is FORWARD adjacency.
    val cids = corpus.orderBy(col("vec_id")).limit(2)
      .collect().map(_.getLong(0))
    val dId = emb.filter(isDelta).orderBy(col("vec_id")).limit(1)
      .collect().head.getLong(0)
    Seq((dId, 1L, cids(0), 0.9), (dId, 2L, cids(1), 0.8))
      .toDF("vec_id", "rank", "nb_id", "sim")
      .write.mode("overwrite").parquet(s"$path/edges_delta/batch=0")
    val normalized = KnnGraphOps.readDeltaEdges(spark, path)
    assert(normalized.columns.contains("rev"))
    assert(normalized.filter(col("rev")).count() == 0L,
      "a rev-less tree must normalize to all-forward rows")
    val view = edgeSet(path)
    assert(view.contains((dId, cids(0), 0.9)) &&
      view.contains((dId, cids(1), 0.8)),
      "the old tree's forward adjacency must serve through the view")
    // and compaction absorbs the normalized tree like a current one
    KnnGraphOps.compactGraphIndex(spark, path)
    assert(!fs.exists(new Path(s"$path/edges_delta")))
    assert(spark.read.parquet(s"$path/edges")
      .filter(col("a_id") === dId).count() == 2L)
    // shape B — pre-sim writer: (vec_id, rank, nb_id). Not recoverable
    // read-side (compaction would rank null-sim edges); must fail loud
    // with the remediation, never absorb silently.
    Seq((dId, 1L, cids(0)), (dId, 2L, cids(1)))
      .toDF("vec_id", "rank", "nb_id")
      .write.mode("overwrite").parquet(s"$path/edges_delta/batch=0")
    val e = intercept[IllegalArgumentException] {
      KnnGraphOps.readDeltaEdges(spark, path)
    }
    assert(e.getMessage.contains("rebuild"),
      "the error must spell out the remediation")
    val e2 = intercept[IllegalArgumentException] {
      KnnGraphOps.compactGraphIndex(spark, path)
    }
    assert(e2.getMessage.contains("pre-sim"))
  }

  test("torn (footerless) delta batches are invisible to every reader " +
      "and mixed-generation trees normalize per directory") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graphidx-mixedgen").toString
    KnnGraphOps.knnGraphWriteIndexOf(corpus, path)
    // batch=0: CURRENT writer (forward + reverse rows, rev column)
    val d = emb.filter(isDelta).orderBy(col("vec_id")).limit(2)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    graft.streaming.StreamingQueries.graphInsertBatch(
      d.toSeq.toDF("vec_id", "embedding"), corpus, path, batchId = 0L)
    val newGen = KnnGraphOps.readDeltaEdges(spark, path)
    val nFwd = newGen.filter(!col("rev")).count()
    val nRev = newGen.filter(col("rev")).count()
    assert(nFwd > 0 && nRev == nFwd)
    // batch=1: OLD writer (sim present, no rev column) — committed
    val cid = corpus.orderBy(col("vec_id")).limit(1)
      .collect().head.getLong(0)
    Seq((d.head._1, 1L, cid, 0.5))
      .toDF("vec_id", "rank", "nb_id", "sim")
      .write.mode("overwrite").parquet(s"$path/edges_delta/batch=1")
    // batch=2: TORN (footerless garbage, no _SUCCESS) — the crash
    // shape a whole-tree read throws on before any heal can run
    fs.mkdirs(new Path(s"$path/edges_delta/batch=2"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/edges_delta/batch=2/garbage"),
      "not parquet".getBytes("UTF-8"))
    // per-directory normalization: the old batch reads rev=false, the
    // new batch keeps its genuine reverse twins (a single whole-tree
    // footer would have erased one or the other), the torn batch is
    // skipped — not thrown on
    val mixed = KnnGraphOps.readDeltaEdges(spark, path)
    assert(mixed.filter(col("rev")).count() == nRev,
      "new-gen reverse twins must survive a mixed-generation read")
    assert(mixed.filter(!col("rev")).count() == nFwd + 1,
      "old-gen rows must read as forward adjacency")
    // the serving view composes it the same way
    val view = edgeSet(path)
    assert(view.contains((d.head._1, cid, 0.5)))
    // compaction absorbs the committed batches and retires the whole
    // tree, torn dir included (its replay would recreate it)
    KnnGraphOps.compactGraphIndex(spark, path)
    assert(!fs.exists(new Path(s"$path/edges_delta")))
    assert(spark.read.parquet(s"$path/edges")
      .filter(col("a_id") === d.head._1).count() > 0)
  }

  test("delete removes the vector from every adjacency and route, " +
      "heals affected nodes, leaves untouched nodes byte-identical") {
    val path = buildIndex("del")
    // snapshot from the COMPACTED state (delete's own first step), so
    // the untouched-rows assertion compares like with like — the
    // uncapped pre-compaction view is test 1's subject, not this one's
    KnnGraphOps.compactGraphIndex(spark, path)
    // victims: the two highest-in-degree corpus nodes (guaranteed b_id
    // appearances — the hard case, where serving would keep returning
    // them), never the route probe
    val g0all = KnnGraphOps.readGraphEdges(spark, path)
    val victims = g0all.groupBy("b_id").count()
      .filter(col("b_id") =!= 0).orderBy(desc("count"), col("b_id"))
      .limit(2).collect().map(_.getLong(0)).toSeq
    assert(victims.size == 2)
    val affected = g0all
      .filter(col("b_id").isin(victims: _*) &&
        !col("a_id").isin(victims: _*))
      .select("a_id").distinct().collect().map(_.getLong(0)).toSet
    assert(affected.nonEmpty)
    val untouched = g0all
      .filter(!col("a_id").isin((victims ++ affected): _*) &&
        !col("b_id").isin(victims: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

    val unrouted = KnnGraphOps.deleteFromGraphIndex(spark, path,
      victims, emb)
    assert(unrouted == 0L,
      "every affected node must re-route on this corpus")

    val g1 = spark.read.parquet(s"$path/edges")
    assert(g1.filter(col("a_id").isin(victims: _*) ||
      col("b_id").isin(victims: _*)).count() == 0,
      "deleted ids must vanish from BOTH adjacency sides")
    assert(!fs.exists(new Path(s"$path/edges_delta")),
      "delete runs on the compacted index")
    // untouched nodes byte-identical
    val after = g1.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(untouched.subsetOf(after),
      "nodes not referencing a victim must be untouched")
    // healed: every affected node still routes, within cap, victim-free
    val healedRows = g1.filter(col("a_id").isin(affected.toSeq: _*))
    assert(healedRows.select("a_id").distinct().count() == affected.size,
      "every affected node must be healed, not dropped")
    assert(perNodeCap(path) <= KnnGraphOps.GraphK)
    // routes are victim-free (the serving heal)
    assert(route(path, 0L).intersect(victims).isEmpty)
    for (a <- affected.take(3))
      assert(route(path, a).intersect(victims).isEmpty)
    // re-deleting the same ids is a no-op
    val snap = edgeSet(path)
    assert(KnnGraphOps.deleteFromGraphIndex(spark, path, victims, emb)
      == 0L)
    assert(edgeSet(path) == snap, "delete must be idempotent")
  }
}
