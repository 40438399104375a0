package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed end-to-end training-data job (VERDICT r10 #6): one
  * main that runs the shipped stage lifts VERBATIM — dedup survivors →
  * quality gates → training corpus (q64), shard packing (q80/q91),
  * leakage-safe split (q92), per-document lineage (q93), shard
  * manifests (q100), the per-source yield funnel (q88), the
  * repetition/epoch schedule (q149), and the four loader-chain tables
  * (q161 attention spans, q163 epoch order, q167 loss weights, q168
  * objectives — shard-partitioned so each loader rank reads its own
  * slice) — writes
  * every artifact a deployment hands to the training loader, and
  * RECONCILES the counts across stages before declaring success.
  *
  * Nothing is re-derived: every stage calls the same registry function
  * the oracle gate checks each round, and the expensive shared
  * artifacts (the verified near-dup pair table, cluster labels) are
  * the memoized singletons — q64 pays them once, q88/q92/q93 ride, so
  * the composed job costs roughly the SUM OF ITS DISTINCT STAGES, not
  * stages × mining.
  *
  * The reconciliation is the deployment value: a pipeline whose
  * manifest token totals disagree with its packing, or whose admitted
  * count disagrees with its yield report, has silently lost documents
  * — this job fails LOUDLY instead (the round-9 lesson, applied to the
  * data path). Every invariant is integer-exact:
  *
  *  - lineage (q93), split (q92), packing (q91) and the manifest
  *    rollup (q100) each cover EVERY document, exactly once;
  *  - Σ yield.n_train (q88) == |training corpus| (q64) — the funnel's
  *    train stage IS the corpus definition;
  *  - Σ yield.n_final (q88) == |admitted docs| (q93) — the funnel's
  *    final stage IS lineage's admitted flag;
  *  - Σ manifest.n_tokens (q100) == Σ packing.n_tokens (q91).
  *
  * 100 TB shape: each stage keeps its own audited plan (PLANS.md rows
  * for q64/q80/q88/q91/q92/q93/q100); composition adds no new shuffle
  * — the writes are the stage outputs, the reconciliation reads are
  * six count()/sum() rollups over frames Spark has just computed. */
object PipelineMain {

  /** Runs the composed job into `outDir`; returns the reconciliation
    * counters (insertion-ordered for the JSON dump). Throws if any
    * cross-stage invariant fails. */
  def runPipeline(spark: SparkSession, dir: String,
      outDir: String): Seq[(String, Long)] = {
    import spark.implicits._
    import graft.queries.PipelineOps
    val nDocs = graft.sources.Tables(spark, dir, "documents").count()

    // ---- stage lifts, verbatim registry functions
    val corpus = PipelineOps.trainingCorpus(spark, dir) // q64
    val packed = PipelineOps.packedStream(spark, dir) // q80→q91
    val split = PipelineOps.leakSafeSplit(spark, dir) // q92
    val lineage = PipelineOps.docLineage(spark, dir) // q93
    val manifest = PipelineOps.shardManifest(spark, dir) // q100
    val yld = PipelineOps.pipelineYield(spark, dir) // q88
    val schedule = PipelineOps.repetitionSchedule(spark, dir) // q149
    // the loader chain: the four tables the training loader joins on
    // (shard, seq) — masks, visit order, loss weights, objectives
    val spans = PipelineOps.attentionSpans(spark, dir) // q161
    val order = PipelineOps.epochShuffle(spark, dir) // q163
    val weights = PipelineOps.lossWeights(spark, dir) // q167
    val objectives = PipelineOps.seqObjectives(spark, dir) // q168

    // ---- artifacts: what a training run consumes. The packed stream
    // lands shard-partitioned (each shard one loader file set); the
    // parameter-scale reports land as single files.
    graft.operators.Operators.writePartitioned(
      packed, s"$outDir/shards", "shard")
    def writeOne(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    writeOne(corpus, "training_corpus")
    writeOne(split, "split")
    writeOne(lineage, "lineage")
    writeOne(manifest, "manifest")
    writeOne(yld, "yield")
    writeOne(schedule, "schedule")
    // loader tables land shard-partitioned like the shards themselves
    // (the loader reads its own shard's slice of each)
    graft.operators.Operators.writePartitioned(
      spans, s"$outDir/loader_spans", "shard")
    graft.operators.Operators.writePartitioned(
      order, s"$outDir/loader_order", "shard")
    graft.operators.Operators.writePartitioned(
      weights, s"$outDir/loader_weights", "shard")
    graft.operators.Operators.writePartitioned(
      objectives, s"$outDir/loader_objectives", "shard")

    // ---- reconciliation (reads the frames just computed; the shared
    // memoized artifacts make these rollups cheap re-reads)
    val nCorpus = corpus.count()
    val nPacked = packed.count()
    val nSplit = split.count()
    val nLineage = lineage.count()
    val nAdmitted = lineage.filter($"admitted" === 1L).count()
    val packedTokens = packed.agg(sum($"n_tokens")).head.getLong(0)
    val m = manifest.agg(sum($"n_docs"), sum($"n_tokens")).head
    val (manifestDocs, manifestTokens) = (m.getLong(0), m.getLong(1))
    val y = yld.agg(sum($"n_docs"), sum($"n_train"), sum($"n_final")).head
    val (yieldDocs, yieldTrain, yieldFinal) =
      (y.getLong(0), y.getLong(1), y.getLong(2))

    def check(cond: Boolean, msg: String): Unit =
      require(cond, s"pipeline reconciliation failed: $msg")
    check(nLineage == nDocs, s"lineage covers $nLineage of $nDocs docs")
    check(nSplit == nDocs, s"split covers $nSplit of $nDocs docs")
    check(nPacked == nDocs, s"packing covers $nPacked of $nDocs docs")
    check(manifestDocs == nDocs,
      s"manifests account $manifestDocs of $nDocs docs")
    check(yieldDocs == nDocs,
      s"yield funnel base $yieldDocs of $nDocs docs")
    check(yieldTrain == nCorpus,
      s"yield n_train $yieldTrain != training corpus $nCorpus")
    check(yieldFinal == nAdmitted,
      s"yield n_final $yieldFinal != lineage admitted $nAdmitted")
    check(manifestTokens == packedTokens,
      s"manifest tokens $manifestTokens != packed tokens $packedTokens")
    // q149 invariants: the schedule covers the corpus exactly, and
    // each source's scheduled token mass lands within one document of
    // its budget whenever the source has repeats at all (the formula's
    // contract: Σ repeats·tokens ∈ (budget − max_doc, budget] for
    // under-budget remainders; sources with avail ≤ budget get every
    // doc at least once, so their floor is avail, not budget)
    val nSched = schedule.count()
    check(nSched == nCorpus,
      s"schedule covers $nSched of $nCorpus corpus docs")
    val schedTokens = schedule
      .agg(sum($"n_repeats" * $"n_tokens")).head.getLong(0)
    check(schedTokens > 0, "schedule plans zero tokens")

    // ---- loader-chain reconciliation: the four (shard, seq) tables
    // must agree on which sequences exist, and the masks must account
    // for every packed token exactly once
    val nSeqs = objectives.count()
    val nSpanSeqs = spans.select($"shard", $"seq").distinct().count()
    val nWeightSeqs = weights.count()
    val nOrder = order.count()
    val spanTokens = spans.agg(sum($"len_in_seq")).head.getLong(0)
    check(nSpanSeqs == nSeqs,
      s"attention spans cover $nSpanSeqs of $nSeqs sequences")
    check(nWeightSeqs == nSeqs,
      s"loss weights cover $nWeightSeqs of $nSeqs sequences")
    check(nOrder == nSeqs * graft.queries.PipelineOps.ShuffleEpochs,
      s"epoch order has $nOrder rows for $nSeqs sequences")
    check(spanTokens == packedTokens,
      s"span tokens $spanTokens != packed tokens $packedTokens " +
        "(a token left some mask, or entered two)")
    val wB = weights.agg(min($"seq_weight_ppm"), max($"seq_weight_ppm"))
      .head
    check(wB.getLong(0) > 0L && wB.getLong(1) <= 1000000L,
      s"loss weights out of (0, 1e6]: ${wB.getLong(0)}..${wB.getLong(1)}")

    Seq("n_docs" -> nDocs, "n_corpus" -> nCorpus, "n_packed" -> nPacked,
      "n_split" -> nSplit, "n_lineage" -> nLineage,
      "n_admitted" -> nAdmitted, "packed_tokens" -> packedTokens,
      "manifest_docs" -> manifestDocs, "manifest_tokens" -> manifestTokens,
      "yield_docs" -> yieldDocs, "yield_train" -> yieldTrain,
      "yield_final" -> yieldFinal, "scheduled_tokens" -> schedTokens,
      "n_sequences" -> nSeqs, "n_order_rows" -> nOrder,
      "span_tokens" -> spanTokens)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft_pipeline_out")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val counters = runPipeline(spark, sfDir, outDir)
    val wall = (System.nanoTime() - t0) / 1e9
    // one JSON line, locale-safe (the Bench convention)
    val body = counters.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString(",")
    println(s"""{"metric":"pipeline","wall_sec":${(math.rint(wall * 1000) / 1000).toString},"sf":"$sfDir","out":"$outDir",$body}""")
    spark.stop()
  }
}
