package graft

import graft.reference.TransitFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based suites (SURVEY.md §5.4): the engine's algebraic
  * invariants on random inputs, evaluated through the real columnar
  * expressions (batched per property to keep Spark round-trips sane). */
class PropertySpec extends SparkSuite {

  test("hour normalization is total and correct on 0h..47h") {
    import spark.implicits._
    val got = (0 until 48).map(h => s"${h}h").toDF("heure")
      .select(TransitFunctions.normalizeHour($"heure").as("n"))
      .collect().map(_.getString(0))
    val want = (0 until 48).map(h => f"${h % 24}%02d:00")
    assert(got.toSeq == want)
  }

  test("occupancy bar length == stands + discrepancy for random loads") {
    import spark.implicits._
    val gen = for {
      stands <- Gen.choose(0, 60)
      bikes <- Gen.choose(0, 60)
      free <- Gen.choose(0, 60)
    } yield (bikes, stands, free)
    val cases = Gen.listOfN(200, gen).sample.get
    val rows = cases.toDF("b", "s", "f")
      .select($"b", $"s", $"f", TransitFunctions.occupancyBar(
        $"b".cast("double"), $"s", $"f".cast("double")).as("bar"))
      .collect()
    for (r <- rows) {
      val (b, s, f, bar) = (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getString(3))
      val disc = math.abs(s - (b + f))
      assert(bar.length == b + f + disc, s"b=$b s=$s f=$f bar=$bar")
      assert(bar.count(_ == '#') == b && bar.count(_ == '-') == f &&
        bar.count(_ == '?') == disc)
    }
  }

  test("asofForward picks min strictly-later right time on random data") {
    import spark.implicits._
    val gen = for {
      key <- Gen.choose(0L, 5L)
      t <- Gen.choose(0L, 1000L)
    } yield (key, t)
    val left = Gen.listOfN(120, gen).sample.get.zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, t) }
    val right = Gen.listOfN(120, gen).sample.get
    val lDf = left.toDF("id", "key", "t")
    val rDf = right.toDF("key", "rt")
    val got = graft.operators.Operators
      .asofForward(lDf, rDf, "key", "t", "rt", "next")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val byKey = right.groupBy(_._1)
    for ((id, k, t) <- left) {
      val want = byKey.getOrElse(k, Nil).map(_._2).filter(_ > t)
        .sorted.headOption
      assert(got(id) == want, s"id=$id k=$k t=$t")
    }
  }

  test("sessionize: no intra-session gap exceeds the threshold; " +
    "every inter-session gap does") {
    import spark.implicits._
    val gen = for {
      key <- Gen.choose(0L, 3L)
      t <- Gen.choose(0L, 5000L)
    } yield (key, t)
    val events = Gen.listOfN(300, gen).sample.get.zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, t) }
    val df = events.toDF("id", "key", "ts_s")
    val out = graft.operators.Operators
      .sessionize(df, "key", "ts_s", "id", gapS = 100L)
      .select($"key", $"session_idx", $"ts_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((key, sessions) <- out.groupBy(_._1)) {
      val bySession = sessions.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (idx, es) => (idx, es.map(_._3).sorted) }
      for ((_, ts) <- bySession if ts.size > 1; w <- ts.sliding(2))
        assert(w(1) - w(0) <= 100, s"intra-session gap ${w(0)}->${w(1)}")
      if (bySession.size > 1)
        for (w <- bySession.sliding(2)) {
          val (ts1, ts2) = (w(0)._2, w(1)._2)
          assert(ts2.head - ts1.last > 100,
            s"inter-session gap ${ts1.last}->${ts2.head}")
        }
    }
  }

  test("minhash signature: permutation-min property on random sets") {
    import spark.implicits._
    // identical input sets yield identical signatures; disjoint large
    // random sets rarely collide on many components
    val base = Gen.listOfN(40, Gen.choose(Long.MinValue, Long.MaxValue))
      .sample.get
    val df = Seq(
      (1L, base), (2L, base),
      (3L, base.map(_ ^ 0x5DEECE66DL))).toDF("id", "hs")
    val sigs = df.select($"id",
      graft.functions.VectorExpressions.minhashLongs($"hs", 62).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    val agree = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree < 10, s"disjoint sets agreed on $agree/62 components")
  }

  test("piiRedact is idempotent and total on random PII-injected text") {
    import spark.implicits._
    // random filler with PII fragments spliced at random positions —
    // the property holds for ANY input: redacting twice equals
    // redacting once (sentinels contain nothing any pattern matches),
    // and no email-shaped substring survives one pass
    val word = Gen.listOfN(5, Gen.alphaNumChar).map(_.mkString)
    val piiFrag = Gen.oneOf("a.b@example.com", "X9@HOST.ORG",
      "+33-555-0042", "10.0.3.77")
    val token = Gen.oneOf(word, piiFrag) // mixes filler and PII
    val gen = Gen.listOfN(8, token).map(_.mkString(" "))
    val texts = Gen.listOfN(200, gen).sample.get
    val out = texts.toDF("text")
      .select($"text",
        graft.queries.PipelineOps.piiRedact($"text").as("once"))
      .select($"text", $"once",
        graft.queries.PipelineOps.piiRedact($"once").as("twice"))
      .collect()
    val emailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    for (r <- out) {
      assert(r.getString(1) == r.getString(2),
        s"not idempotent on: ${r.getString(0)}")
      assert(emailRe.findFirstIn(r.getString(1)).isEmpty,
        s"email survived: ${r.getString(1)}")
    }
  }

  test("span scrub/dedup equal a driver reference on random corpora " +
    "(union coverage; q75 keeps one canonical occurrence per dup gram)") {
    import spark.implicits._
    // reference implementation of the span family's exact semantics:
    // coverage is the UNION over duplicated k-windows (q74), or over
    // their NON-CANONICAL occurrences (q75, canonical = lexicographic
    // min (doc_id, i)); rebuild keeps uncovered positions in order,
    // one row per input doc. Tokenization mirrors Spark's split(): a
    // doc is split(" ", -1), so empty text is one empty token.
    def reference(docs: Seq[(Long, String)], k: Int, keepOne: Boolean)
        : (Map[Long, (String, Long)], Int) = {
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }.toMap
      val wins = for {
        (id, tk) <- toks.toSeq if tk.length >= k
        i <- 1 to tk.length - k + 1
      } yield (id, i, tk.slice(i - 1, i - 1 + k).mkString(" "))
      val byGram = wins.groupBy(_._3)
      val dupGrams = byGram.filter(_._2.map(_._1).distinct.size > 1)
      var survivingCanonicals = 0
      val removal = dupGrams.toSeq.flatMap { case (_, occ) =>
        val occs = occ.map(o => (o._1, o._2)).sortBy(identity)
        val dropped = if (keepOne) occs.tail else occs
        if (keepOne) {
          assert(occs.size - dropped.size == 1) // exactly one canonical
          survivingCanonicals += 1
        }
        dropped
      }
      val covered = removal
        .flatMap { case (id, i) => (i until i + k).map(id -> _) }.toSet
      val rebuilt = docs.map { case (id, _) =>
        val kept = toks(id).zipWithIndex
          .collect { case (t, p0) if !covered((id, p0 + 1)) => t }
        id -> (kept.mkString(" "), kept.length.toLong)
      }.toMap
      (rebuilt, survivingCanonicals)
    }
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", "d")
    for (trial <- 1 to 3) {
      val shared = Seq.fill(5)(alphabet(rnd.nextInt(4))).mkString(" ")
      val docs = (1L to 10L).map { id =>
        val n = rnd.nextInt(12) // 0..11 tokens: includes sub-k docs
        val body = Seq.fill(n)(alphabet(rnd.nextInt(4))).mkString(" ")
        // two docs embed a guaranteed shared 5-run (dup 3-windows exist)
        id -> (if (id <= 2) s"$shared $body".trim else body)
      }
      val df = docs.toDF("doc_id", "text")
      def collectOut(out: org.apache.spark.sql.DataFrame) =
        out.collect().map(r =>
          r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      val (wantScrub, _) = reference(docs, 3, keepOne = false)
      assert(collectOut(graft.queries.DedupOps.scrubSpansOf(df, 3))
        == wantScrub, s"trial $trial scrub")
      val (wantDedup, canonicals) = reference(docs, 3, keepOne = true)
      assert(collectOut(graft.queries.DedupOps.dedupSpansOf(df, 3))
        == wantDedup, s"trial $trial dedup")
      assert(canonicals > 0, s"trial $trial generated no dup grams")
      // keep-one must never remove MORE than scrub (its removal set is
      // a strict subset per gram)
      for ((id, (_, nScrub)) <- wantScrub)
        assert(wantDedup(id)._2 >= nScrub, s"trial $trial doc $id")
    }
  }

  test("span rebuild contract survives NULL, empty, and sub-k text") {
    // the r8 map-side rebuild must keep the old form's
    // one-row-per-input-doc contract on the edges the oracle corpus
    // doesn't contain: NULL text -> ("", 0); empty text -> one empty
    // token kept; sub-k docs pass through; fully-covered docs empty
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "a b c a b c a b c"), // exact copy: every window cross-dup
      (3L, null.asInstanceOf[String]),
      (4L, ""),
      (5L, "z z")
    ).toDF("doc_id", "text")
    for (out <- Seq(graft.queries.DedupOps.scrubSpansOf(df, 3))) {
      val m = out.collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(m.keySet == Set(1L, 2L, 3L, 4L, 5L))
      assert(m(1L) == ("", 0L) && m(2L) == ("", 0L))
      assert(m(3L) == ("", 0L))
      assert(m(4L) == ("", 1L))
      assert(m(5L) == ("z z", 2L))
    }
    // keep-one retains only CANONICAL occurrences: each gram's
    // (doc 1, first i) survives, so doc 1 keeps one "a b c" period and
    // loses its own later repeats; the copy is scrubbed to empty
    val d = graft.queries.DedupOps.dedupSpansOf(df, 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(d(1L) == ("a b c", 3L))
    assert(d(2L) == ("", 0L))
    assert(d(3L) == ("", 0L) && d(4L) == ("", 1L) && d(5L) == ("z z", 2L))
  }

  test("simhash 16-bit chunk blocking is lossless for hamming <= 3") {
    // the pigeonhole contract q44's candidate join relies on: flipping
    // at most 3 bits of a 64-bit signature cannot touch all 4 16-bit
    // chunks, so every true near-dup pair shares at least one (j, chunk)
    // blocking key — blocking never drops a qualifying pair
    def chunks(x: Long): Seq[Long] =
      (0 until 4).map(j => (x >>> (j * 16)) & 0xFFFFL)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val a = rnd.nextLong()
      val nFlips = rnd.nextInt(4) // 0..3
      val b = (1 to nFlips).foldLeft(a)((v, _) => v ^ (1L << rnd.nextInt(64)))
      assert(java.lang.Long.bitCount(a ^ b) <= 3)
      assert(chunks(a).zip(chunks(b)).exists { case (x, y) => x == y },
        s"no shared chunk for a=$a b=$b")
    }
  }
}
