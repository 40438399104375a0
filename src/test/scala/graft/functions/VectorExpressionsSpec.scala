package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import VectorExpressions._

/** The codegen expressions must agree with the interpreted built-in
  * (zip_with/aggregate) composition they replace, under both codegen
  * and forced-interpreted evaluation. */
class VectorExpressionsSpec extends SparkSuite {

  test("FloatVecDot matches interpreted zip_with/aggregate fold") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.25f), Array(2.0f, 8.0f)),
      (Array.empty[Float], Array.empty[Float])).toDF("a", "b")
    val got = df.select(fvecDot($"a", $"b").as("d")).collect().map(_.getDouble(0))
    val ref = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), " +
        "(acc, p) -> acc + p)").as("d")).collect().map(_.getDouble(0))
    assert(got.toSeq == ref.toSeq)
    assert(got(0) == 32.0 && got(1) == -1.0 && got(2) == 0.0)
  }

  test("FloatVecDot null propagation") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(fvecDot($"a", $"b")).head.isNullAt(0))
  }

  test("FloatVecDot ragged lengths yield NULL, matching zip_with semantics") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f))).toDF("a", "b")
    assert(df.select(fvecDot($"a", $"b")).head.isNullAt(0))
    // the HOF form it fuses from is also NULL here (zip_with pads)
    val hof = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), " +
        "(acc, p) -> acc + p)"))
    assert(hof.head.isNullAt(0))
  }

  test("cosine of identical vectors is 1") {
    import spark.implicits._
    val df = Seq((Array(0.3f, 0.4f, 1.2f), Array(0.3f, 0.4f, 1.2f)))
      .toDF("a", "b")
    val c = df.select(cosine($"a", $"b")).head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("LongVecSqDist: checked twin == wrapping form on the in-range " +
      "domain, both == the driver-side recompute") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)((
      Array.fill(16)(rnd.nextInt(1 << 20).toLong - (1 << 19)),
      Array.fill(16)(rnd.nextInt(1 << 20).toLong - (1 << 19))))
    val df = rows.toDF("a", "b")
    val wrap = df.select(longVecSqDist($"a", $"b").as("d"))
      .collect().map(_.getLong(0))
    val chk = df.select(longVecSqDistChecked($"a", $"b").as("d"))
      .collect().map(_.getLong(0))
    val exp = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum }
    assert(wrap.toSeq == exp)
    assert(chk.toSeq == exp)
  }

  test("LongVecSqDist twins: null-element, overflow, and ragged-prefix " +
      "fidelity (the ANSI HOF contract)") {
    import spark.implicits._
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    // null element → NULL from both twins
    val nul = spark.range(1).select(
      expr("array(1L, cast(null as bigint), 3L)").as("a"),
      expr("array(1L, 2L, 3L)").as("b"))
    assert(nul.select(longVecSqDist($"a", $"b")).head.isNullAt(0))
    assert(nul.select(longVecSqDistChecked($"a", $"b")).head.isNullAt(0))
    // overflow AFTER a null element: the wrapping form short-circuits
    // to NULL; the checked form still checks every common-prefix
    // square (zip_with evaluates them all) and must raise
    val ov = spark.range(1).select(
      expr("array(cast(null as bigint), 4000000000L)").as("a"),
      expr("array(0L, -4000000000L)").as("b"))
    assert(ov.select(longVecSqDist($"a", $"b")).head.isNullAt(0))
    val e1 = intercept[Throwable](
      ov.select(longVecSqDistChecked($"a", $"b")).collect())
    assert(msgs(e1).toLowerCase.contains("overflow"), msgs(e1))
    // unequal lengths: NULL from the wrapping form; the checked form
    // still checks the SHARED prefix before yielding NULL
    val rag = spark.range(1).select(
      expr("array(4000000000L)").as("a"),
      expr("array(-4000000000L, 1L)").as("b"))
    assert(rag.select(longVecSqDist($"a", $"b")).head.isNullAt(0))
    val e2 = intercept[Throwable](
      rag.select(longVecSqDistChecked($"a", $"b")).collect())
    assert(msgs(e2).toLowerCase.contains("overflow"), msgs(e2))
    // and a ragged pair whose shared prefix stays in range is NULL
    // from both, no raise
    val ragOk = spark.range(1).select(
      expr("array(5L)").as("a"), expr("array(1L, 2L)").as("b"))
    assert(ragOk.select(longVecSqDistChecked($"a", $"b")).head.isNullAt(0))
    // ragged pair, every per-element square in range, but the shared
    // prefix SUM overflows: the unfused fold adds the full prefix with
    // addExact BEFORE zip_with's padding null reaches it, so the
    // checked twin must RAISE, not return NULL (ADVICE r14 — the old
    // init conflated length mismatch with element nulls and skipped
    // every add check on ragged input). 3037000499² ≈ 0.9999·2⁶³.
    val ragSum = spark.range(1).select(
      expr("array(3037000499L, 3037000499L)").as("a"),
      expr("array(0L, 0L, 1L)").as("b"))
    assert(ragSum.select(longVecSqDist($"a", $"b")).head.isNullAt(0))
    val e3 = intercept[Throwable](
      ragSum.select(longVecSqDistChecked($"a", $"b")).collect())
    assert(msgs(e3).toLowerCase.contains("overflow"), msgs(e3))
    // equal-length twin sanity: the same prefix with matched lengths
    // raises from both the checked twin and the raw semantics
    val eqSum = spark.range(1).select(
      expr("array(3037000499L, 3037000499L)").as("a"),
      expr("array(0L, 0L)").as("b"))
    val e4 = intercept[Throwable](
      eqSum.select(longVecSqDistChecked($"a", $"b")).collect())
    assert(msgs(e4).toLowerCase.contains("overflow"), msgs(e4))
    // phase order: a multiply overflow at a LATER position fires even
    // when an earlier ADD overflow exists too (zip_with evaluates all
    // squares before the fold adds any) — the checked twin must not
    // raise-at-first-site in interleaved order; both orders raise
    // ARITHMETIC_OVERFLOW here, so the pin is simply that it raises
    // on inputs where an interleaved loop would ALSO raise — and that
    // a null element before the add-overflow position still lets the
    // later multiply check fire while suppressing the adds entirely
    val nullThenMul = spark.range(1).select(
      expr("array(3037000499L, cast(null as bigint), 4000000000L)").as("a"),
      expr("array(0L, 0L, -4000000000L)").as("b"))
    val e5 = intercept[Throwable](
      nullThenMul.select(longVecSqDistChecked($"a", $"b")).collect())
    assert(msgs(e5).toLowerCase.contains("overflow"), msgs(e5))
    // null element at position 0 with an in-range tail: adds are fully
    // suppressed (fold nulls immediately) → NULL, no raise
    val nullHead = spark.range(1).select(
      expr("array(cast(null as bigint), 2L)").as("a"),
      expr("array(1L, 2L)").as("b"))
    assert(nullHead.select(longVecSqDistChecked($"a", $"b"))
      .head.isNullAt(0))
  }

  test("SimHash64: hand-computed single/multi term behavior") {
    import spark.implicits._
    // one term: simhash == that term's hash (every bit decided by it)
    val df = Seq(Tuple1(Array(0x0123456789abcdefL))).toDF("th")
    assert(df.select(simhash64($"th")).head.getLong(0) == 0x0123456789abcdefL)
    // majority vote: two of three terms share all bits
    val df3 = Seq(Tuple1(Array(-1L, -1L, 0L))).toDF("th")
    assert(df3.select(simhash64($"th")).head.getLong(0) == -1L)
    // tie (one 1-bit, one 0-bit) resolves to 0 (strict majority for 1)
    val df2 = Seq(Tuple1(Array(-1L, 0L))).toDF("th")
    assert(df2.select(simhash64($"th")).head.getLong(0) == 0L)
  }

  test("SimHash64 deterministic over documents and close for near-dups") {
    val sigs = graft.queries.DedupOps.simhashSignatures(spark, sf0001)
    val a = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.size == 500)
  }

  test("NearestIndex rank 0/1 == driver-side (dist, index) sort on " +
      "random vectors, ties included") {
    import spark.implicits._
    import graft.functions.VectorExpressions.{nearestIndex, secondNearestIndex}
    val rnd = new scala.util.Random(1234)
    // tiny value domain so distance TIES actually occur
    val table: IndexedSeq[IndexedSeq[Long]] =
      IndexedSeq.fill(6)(IndexedSeq.fill(4)(rnd.nextInt(3).toLong))
    val vecs = Seq.fill(80)(Array.fill(4)(rnd.nextInt(3).toFloat))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val got = vecs.toDF("id", "v")
      .select($"id", nearestIndex($"v", table, 0, 1L).as("c1"),
        secondNearestIndex($"v", table, 0, 1L).as("c2"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    for ((id, v) <- vecs) {
      val ranked = table.zipWithIndex.map { case (ct, i) =>
        (ct.zip(v.map(x => math.floor(x.toDouble).toLong))
          .map { case (c, q) => val t = q - c; t * t }.sum, i)
      }.sorted
      assert(got(id) == (ranked(0)._2, ranked(1)._2),
        s"id=$id got=${got(id)} want=${(ranked(0)._2, ranked(1)._2)}")
    }
  }

  test("NearestIndex distance mode emits the argmin's value, with the " +
      "same NULL contract") {
    import spark.implicits._
    import graft.functions.VectorExpressions.{nearestDistance, nearestIndex}
    val rnd = new scala.util.Random(99)
    val table: IndexedSeq[IndexedSeq[Long]] =
      IndexedSeq.fill(5)(IndexedSeq.fill(4)(rnd.nextInt(5).toLong))
    val vecs = Seq.fill(50)(Array.fill(4)(rnd.nextFloat() * 4))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val got = vecs.toDF("id", "v")
      .select($"id", nearestIndex($"v", table, 0, 1L).as("c"),
        nearestDistance($"v", table, 0, 1L).as("d"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    for ((id, v) <- vecs) {
      val q = v.map(x => math.floor(x.toDouble).toLong)
      val dists = table.map(ct => ct.zip(q)
        .map { case (c, x) => val t = x - c; t * t }.sum)
      val (c, d) = got(id)
      assert(d == dists.min && d == dists(c),
        s"id=$id got=$d want=${dists.min} at index $c")
    }
    // short vector: NULL distance, matching the index mode's contract
    val short = Seq((0L, Array(1f, 2f))).toDF("id", "v")
      .select(nearestDistance($"v", table, 0, 1L).as("d")).collect()
    assert(short.head.isNullAt(0))
  }

  test("PqAdcDist equals the driver-side codeword-distance sum; " +
      "short vectors yield NULL") {
    import spark.implicits._
    import graft.functions.VectorExpressions.pqAdcDist
    val rnd = new scala.util.Random(7)
    // 2 subspaces x 16 words x 3 dims; packed 4-bit nibble codes
    val cb: IndexedSeq[IndexedSeq[IndexedSeq[Long]]] =
      IndexedSeq.fill(2)(IndexedSeq.fill(16)(
        IndexedSeq.fill(3)(rnd.nextInt(9).toLong - 4)))
    val rows = Seq.fill(40)((
      Array.fill(6)(rnd.nextFloat() * 8 - 4),
      ((rnd.nextInt(16) | (rnd.nextInt(16) << 4))).toLong))
      .zipWithIndex.map { case ((v, c), i) => (i.toLong, v, c) }
    val got = rows.toDF("id", "v", "code")
      .select($"id", pqAdcDist($"v", $"code", cb, 2L).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, v, code) <- rows) {
      val want = (0 until 2).map { s =>
        val w = ((code >> (4 * s)) & 15L).toInt
        (0 until 3).map { d =>
          val q = math.floor(v(s * 3 + d).toDouble * 2L).toLong
          val t = q - cb(s)(w)(d); t * t
        }.sum
      }.sum
      assert(got(id) == want, s"id=$id got=${got(id)} want=$want")
    }
    // short vector: NULL, FloatVecDot's degradation rule
    val short = Seq((0L, Array(1f, 2f), 3L)).toDF("id", "v", "code")
      .select(pqAdcDist($"v", $"code", cb, 2L).as("adc")).collect()
    assert(short.head.isNullAt(0))
  }

  test("SortedIntersectSize long specialization == array_intersect " +
      "size on sorted-distinct random long sets; string path intact") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      def set() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted.toArray
      (i.toLong, set(), set())
    }
    val got = rows.toDF("id", "a", "b")
      .select($"id", sortedIntersectSize($"a", $"b").as("n"),
        size(array_intersect($"a", $"b")).as("want"))
      .collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(2), r.toString))
    // the string path (q41's contract) still merge-scans correctly
    val s = Seq((Array("a", "b", "d"), Array("b", "c", "d", "e")))
      .toDF("x", "y")
      .select(sortedIntersectSize($"x", $"y")).collect()
    assert(s.head.getInt(0) == 2)
  }

  test("SortedIntersectSize rejects unimplemented element types at " +
      "analysis time (ADVICE r11)") {
    import spark.implicits._
    // array<int> has no specialization — before checkInputDataTypes it
    // fell into the string branch and ClassCastExceptioned at RUN time
    val ints = Seq((Array(1, 2), Array(2, 3))).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(sortedIntersectSize($"a", $"b")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("sorted_intersect_size"))
    // mixed long/string must also fail analysis, not execution
    val mixed = Seq((Array(1L, 2L), Array("a"))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      mixed.select(sortedIntersectSize($"a", $"b")).collect()
    }
  }
}
