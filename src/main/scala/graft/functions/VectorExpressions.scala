package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expressions for the vector / hashing hot paths.
  *
  * The built-in alternative (`zip_with` + `aggregate` higher-order
  * functions) evaluates interpreted, allocating a lambda frame per
  * element; at 100 TB embedding scans that is the bottleneck. These
  * expressions generate tight Java loops inside whole-stage codegen —
  * preference order (b) of the build contract: a custom `Expression`
  * before any UDF.
  */
object VectorExpressions {

  /** dot(array<float>, array<float>) → double.
    * Products in float (matching what an engine computing over float
    * vectors produces), accumulation in double, element order
    * left-to-right — deterministic across runs and partitions.
    *
    * NULL semantics mirror the composable HOF form it can replace
    * (`aggregate(zip_with(a,b,*),0D,+)`): unequal lengths or any null
    * element yield NULL — zip_with pads the short side with nulls and
    * a null product nullifies the running sum, so the optimizer fusion
    * rule is a true semantic identity. */
  case class FloatVecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "fvec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var acc = 0.0d
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += (x.getFloat(i) * y.getFloat(i)).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val bad = ctx.freshName("bad")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |boolean $bad = ($n != $b.numElements());
           |for (int $i = 0; !$bad && $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
           |  $acc += (double)($a.getFloat($i) * $b.getFloat($i));
           |}
           |${ev.isNull} = $bad;
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): FloatVecDot =
      copy(left = newLeft, right = newRight)
  }

  /** simhash64(array<long>) → long: sign-aggregate the 64 bit planes of
    * pre-hashed terms (pair with `xxhash64` over tokens). A bit is set
    * when strictly more terms have it set than clear. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val cnt = new Array[Int](64)
      var i = 0
      while (i < hs.numElements()) {
        val h = hs.getLong(i)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) cnt(j) += 1 else cnt(j) -= 1
          j += 1
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 64) { if (cnt(j) > 0) out |= (1L << j); j += 1 }
      java.lang.Long.valueOf(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cnt = ctx.addMutableState("int[]", "simhashCnt",
        v => s"$v = new int[64];")
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val out = ctx.freshName("out")
        s"""
           |java.util.Arrays.fill($cnt, 0);
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  long $h = $a.getLong($i);
           |  for (int $j = 0; $j < 64; $j++) {
           |    if ((($h >>> $j) & 1L) == 1L) $cnt[$j]++; else $cnt[$j]--;
           |  }
           |}
           |long $out = 0L;
           |for (int $j = 0; $j < 64; $j++) {
           |  if ($cnt[$j] > 0) $out |= (1L << $j);
           |}
           |${ev.value} = $out;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** minhash_longs(array<long>, k) → array<long>: k MinHash minima over
    * pre-hashed set elements in ONE traversal. The composable
    * alternative (k × `array_min(transform(...))`) re-walks the array k
    * times with interpreted lambdas — this was the measured hot spot of
    * the LSH dedup at sf0.1. Hash family: xxhash64 of the element under
    * k fixed seeds (seed_i = XXH64(i, 42), the same mixing Spark's
    * xxhash64 uses internally). */
  case class MinHashLongs(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_longs"

    private lazy val seeds: Array[Long] =
      Array.tabulate(numHashes)(i =>
        org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(i.toLong, 42L))

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < hs.numElements()) {
        val h = hs.getLong(i)
        var j = 0
        while (j < numHashes) {
          val g = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(h, seeds(j))
          if (g < mins(j)) mins(j) = g
          j += 1
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val seedsRef = ctx.addReferenceObj("mhSeeds", seeds, "long[]")
      val mins = ctx.freshName("mins")
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val g = ctx.freshName("g")
        s"""
           |long[] $mins = new long[$numHashes];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  long $h = $a.getLong($i);
           |  for (int $j = 0; $j < $numHashes; $j++) {
           |    long $g = org.apache.spark.sql.catalyst.expressions.XXH64
           |      .hashLong($h, $seedsRef[$j]);
           |    if ($g < $mins[$j]) $mins[$j] = $g;
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData
           |  .toArrayData($mins);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashLongs =
      copy(child = newChild)
  }

  def minhashLongs(hashes: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashLongs(GraftBridge.expression(hashes), numHashes))

  /** dim_counts(array<long>, n) → array<float>: bucket-count the dim
    * ids into an n-length float histogram in ONE traversal — the
    * hashing-trick densify as a compiled loop. The composable form
    * (n × `filter(dims, x == d)`) re-walks the id array n times with
    * interpreted lambdas; at n = 64 that was the measured hot spot of
    * the chunk-vectorize path (q146: 18 s of a 30 s query). Ids index
    * via floor-mod so any long is total; callers (rowDocVector) feed
    * non-negative `% n` values, for which floor-mod is the identity.
    * Counts are small integers — exact in float, the docVectors
    * contract. NULL array or any NULL element → NULL (the HOF-chain
    * mirror, FloatVecDot's rule). */
  case class DimCountVector(child: Expression, n: Int)
      extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "dim_counts"

    override def nullSafeEval(input: Any): Any = {
      val ds = input.asInstanceOf[ArrayData]
      val counts = new Array[Float](n)
      var i = 0
      while (i < ds.numElements()) {
        if (ds.isNullAt(i)) return null
        val d = ((ds.getLong(i) % n) + n) % n
        counts(d.toInt) += 1f
        i += 1
      }
      ArrayData.toArrayData(counts)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val cnt = ctx.freshName("cnt")
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        val bad = ctx.freshName("bad")
        s"""
           |float[] $cnt = new float[$n];
           |boolean $bad = false;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  if ($a.isNullAt($i)) { $bad = true; break; }
           |  long $d = (($a.getLong($i) % $n) + $n) % $n;
           |  $cnt[(int) $d] += 1f;
           |}
           |${ev.isNull} = $bad;
           |${ev.value} = $bad ? null
           |  : org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($cnt);
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): DimCountVector =
      copy(child = newChild)
  }

  def dimCounts(dims: Column, n: Int): Column =
    GraftBridge.column(DimCountVector(GraftBridge.expression(dims), n))

  /** sorted_intersect_size(array<T>, array<T>) → int for T ∈ {string,
    * long}: merge-scan intersection count over two SORTED,
    * de-duplicated arrays. Replaces `size(array_intersect(a, b))` in
    * the Jaccard hot loop — the built-in builds a hash set per row
    * pair; the merge scan is a single pass and needs no per-pair
    * allocation. Jaccard follows as inter / (|a| + |b| - inter). The
    * long specialization (element compare = one branch, no UTF8String
    * dispatch) serves hashed-domain set comparison (q164). Caller
    * contract: inputs sorted+distinct (array_sort(array_distinct(...))
    * once per document, BEFORE the pair join — amortized over all
    * pairs the document appears in). */
  case class SortedIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def prettyName: String = "sorted_intersect_size"

    /** Only the two specialized element types are implemented; anything
      * else (array<int>, array<double>, …) must fail at ANALYSIS time —
      * without this check the string branch below would ClassCastException
      * at execution (ADVICE r11). */
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst
        .analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      import org.apache.spark.sql.types.{ArrayType, StringType}
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<string> or two array<bigint> " +
            s"arguments (sorted, distinct), got ${l.sql} and ${r.sql}")
      }
    }

    private lazy val longElems = left.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var n = 0
      if (longElems) {
        while (i < x.numElements() && j < y.numElements()) {
          val l = x.getLong(i); val r = y.getLong(j)
          if (l == r) { n += 1; i += 1; j += 1 }
          else if (l < r) i += 1
          else j += 1
        }
      } else {
        while (i < x.numElements() && j < y.numElements()) {
          val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
          if (c == 0) { n += 1; i += 1; j += 1 }
          else if (c < 0) i += 1
          else j += 1
        }
      }
      java.lang.Integer.valueOf(n)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val n = ctx.freshName("n")
        val c = ctx.freshName("c")
        val body = if (longElems)
          s"""
             |while ($i < $a.numElements() && $j < $b.numElements()) {
             |  long ${c}l = $a.getLong($i); long ${c}r = $b.getLong($j);
             |  if (${c}l == ${c}r) { $n++; $i++; $j++; }
             |  else if (${c}l < ${c}r) $i++;
             |  else $j++;
             |}
           """.stripMargin
        else
          s"""
             |while ($i < $a.numElements() && $j < $b.numElements()) {
             |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
             |  if ($c == 0) { $n++; $i++; $j++; }
             |  else if ($c < 0) $i++;
             |  else $j++;
             |}
           """.stripMargin
        s"""
           |int $i = 0; int $j = 0; int $n = 0;
           |$body
           |${ev.value} = $n;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectSize =
      copy(left = newLeft, right = newRight)
  }

  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectSize(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** longvec_sqdist(array<bigint>, array<bigint>) → bigint: squared L2
    * between two integer code vectors — the SQ8 serving distance
    * (q184), [[FloatVecDot]]'s integer sibling. Same NULL contract:
    * unequal lengths or any null element yield NULL, matching the
    * `aggregate(zip_with(...))` HOF it replaces in the hot path (the
    * HOF lambda is interpreted per element; this is one codegen loop).
    * Caller bounds the element domain (|a−b| ≤ 255 at 64 dims keeps
    * the sum < 2³², far from overflow).
    *
    * `checked = true` is the ANSI twin [[graft.plans.FuseLongVecSqDist]]
    * fuses ANSI-mode HOF trees into: every subtract/multiply/add goes
    * through [[org.apache.spark.sql.catalyst.util.MathUtils]]' exact
    * ops, raising Spark's ARITHMETIC_OVERFLOW exactly where the unfused
    * HOF would. The unfused form is PHASE-ORDERED — `zip_with` builds
    * the whole squares array before `aggregate` folds it — so the
    * checked loop runs two passes in that order (ADVICE r14): pass 1
    * subtract/multiply-checks EVERY non-null shared-prefix element (a
    * null at position 2 does not mask a multiply overflow at position
    * 5, and unequal lengths still check the shared prefix); pass 2
    * add-checks the squares until the first null SQUARE — the first
    * null ELEMENT, or position min(n,m) when lengths differ (zip_with's
    * null padding enters the fold only after the shared prefix), so a
    * ragged pair whose prefix SUM overflows raises rather than
    * returning NULL. Length mismatch suppresses only the final result,
    * never the prefix arithmetic. */
  case class LongVecSqDist(left: Expression, right: Expression,
      checked: Boolean = false)
      extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String =
      if (checked) "longvec_sqdist_checked" else "longvec_sqdist"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst
        .analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      import org.apache.spark.sql.types.ArrayType
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> arguments, " +
            s"got ${l.sql} and ${r.sql}")
      }
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (!checked) {
        if (n != y.numElements()) return null
        var acc = 0L
        var i = 0
        while (i < n) {
          if (x.isNullAt(i) || y.isNullAt(i)) return null
          val d = x.getLong(i) - y.getLong(i)
          acc += d * d
          i += 1
        }
        acc
      } else {
        // ANSI fidelity, zip_with-then-fold phase order: pass 1 checks
        // every non-null shared-prefix square; pass 2 add-checks until
        // the first null square (first null element — or min(n,m) when
        // lengths differ, where zip_with's padding nulls the fold).
        import org.apache.spark.sql.catalyst.util.MathUtils
        val m = y.numElements()
        val k = math.min(n, m)
        var firstNull = k
        var i = 0
        while (i < k) {
          if (x.isNullAt(i) || y.isNullAt(i)) {
            if (firstNull == k) firstNull = i
          } else {
            val d = MathUtils.subtractExact(x.getLong(i), y.getLong(i))
            MathUtils.multiplyExact(d, d)
          }
          i += 1
        }
        var acc = 0L
        i = 0
        while (i < firstNull) {
          // pass 1 proved these positions non-null and square-in-range
          val d = x.getLong(i) - y.getLong(i)
          acc = MathUtils.addExact(acc, d * d)
          i += 1
        }
        if (firstNull < k || n != m) null else acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        val p = ctx.freshName("p")
        val bad = ctx.freshName("bad")
        if (!checked)
          s"""
             |int $n = $a.numElements();
             |long $acc = 0L;
             |boolean $bad = ($n != $b.numElements());
             |for (int $i = 0; !$bad && $i < $n; $i++) {
             |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
             |  long $d = $a.getLong($i) - $b.getLong($i);
             |  $acc += $d * $d;
             |}
             |${ev.isNull} = $bad;
             |${ev.value} = $acc;
           """.stripMargin
        else {
          val mu = "org.apache.spark.sql.catalyst.util.MathUtils"
          val k = ctx.freshName("k")
          val fn = ctx.freshName("firstNull")
          s"""
             |int $n = $a.numElements();
             |int $k = java.lang.Math.min($n, $b.numElements());
             |int $fn = $k;
             |for (int $i = 0; $i < $k; $i++) {
             |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
             |    if ($fn == $k) $fn = $i;
             |  } else {
             |    long $d = $mu.subtractExact($a.getLong($i), $b.getLong($i));
             |    long $p = $mu.multiplyExact($d, $d);
             |  }
             |}
             |long $acc = 0L;
             |for (int $i = 0; $i < $fn; $i++) {
             |  long $d = $a.getLong($i) - $b.getLong($i);
             |  $acc = $mu.addExact($acc, $d * $d);
             |}
             |${ev.isNull} = ($fn < $k || $n != $b.numElements());
             |${ev.value} = $acc;
           """.stripMargin
        }
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): LongVecSqDist =
      copy(left = newLeft, right = newRight)
  }

  def longVecSqDist(a: Column, b: Column): Column =
    GraftBridge.column(LongVecSqDist(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** The ANSI twin — overflow raises instead of wrapping; equal to
    * [[longVecSqDist]] everywhere the sum stays in range. */
  def longVecSqDistChecked(a: Column, b: Column): Column =
    GraftBridge.column(LongVecSqDist(
      GraftBridge.expression(a), GraftBridge.expression(b),
      checked = true))

  /** nearest_index(array<float>) → int: quantize the embedding slice
    * [start, start+rowLen) by floor(v×scale) — exact: float→double cast
    * and ×2^k are lossless, floor is unambiguous — then argmin over the
    * rows of a LITERAL centroid table by squared-L2, ties to the LOWEST
    * row index (strict `<` keeps the first minimum — the same tie-break
    * as the oracles' `ORDER BY dist, idx`). This is the coarse/product
    * quantizer assignment of the ANN index paths (grid-IVF cell, PQ
    * codeword): the table rides the generated class as a reference
    * object and the loop is tight generated Java. Why a native
    * expression: the unrolled element_at form of the same math
    * overflowed Janino at PQ size (~2k terms, silent interpreted
    * fallback), a zip_with/aggregate fold is CodegenFallback
    * (interpreted per row), and even a `transform` quantize lambda
    * ejects its whole projection from whole-stage codegen — quantizing
    * INSIDE the expression (hoisted into a per-row buffer) keeps the
    * entire assignment compiled and compact. */
  /** `rank` selects which neighbor to return: 0 = the argmin (the
    * default, byte-identical generated code to the original), 1 = the
    * SECOND-nearest row under the same (dist, index) order — the
    * multi-probe assignment device (q124): a vector's two cells are
    * `NearestIndex(..., rank = 0)` and `NearestIndex(..., rank = 1)`,
    * both integer-exact, so the probed candidate set — and therefore
    * the dedup verdict — stays oracle-hash-checkable (the oracle's
    * mirror is `ROW_NUMBER() OVER (ORDER BY dist, c) <= 2`). */
  case class NearestIndex(child: Expression, table: Array[Array[Long]],
      start: Int, scale: Long, rank: Int = 0,
      emitDist: Boolean = false) extends UnaryExpression {
    require(rank == 0 || rank == 1, s"rank must be 0 or 1, got $rank")
    require(!emitDist || rank == 0, "emitDist only defined for rank 0")
    private val rows = table.length
    private val rowLen = table(0).length
    override def nullIntolerant: Boolean = true
    override def dataType: DataType =
      if (emitDist) org.apache.spark.sql.types.LongType
      else org.apache.spark.sql.types.IntegerType
    override def prettyName: String =
      if (emitDist) "nearest_dist" else "nearest_index"

    // short or null-element arrays yield NULL (the row drops out of
    // assignment) — same contract as FloatVecDot, and an INTENTIONAL
    // change from the HOF form this replaced (ADVICE r4): element_at on
    // a short array would have thrown under ANSI mode rather than
    // degrading, and reading past numElements on unsafe arrays would
    // return garbage that LOOKS like a valid cell. Degenerate vectors
    // now drop out of the index instead of poisoning one cell; callers
    // that rank on a NULL-able derived column must guard the sort
    // (rankedTopK's nanvl / adcSearch's isNotNull filter).
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() < start + rowLen) return null
      val q = new Array[Long](rowLen)
      var d = 0
      while (d < rowLen) {
        if (v.isNullAt(start + d)) return null
        q(d) = math.floor(v.getFloat(start + d).toDouble * scale).toLong
        d += 1
      }
      var best = Long.MaxValue; var bi = 0; var w = 0
      var second = Long.MaxValue; var si = 0
      while (w < rows) {
        var acc = 0L; d = 0
        while (d < rowLen) {
          val t = q(d) - table(w)(d); acc += t * t; d += 1
        }
        // (dist, index) order: a later row tying `best` ranks second
        if (acc < best) {
          second = best; si = bi; best = acc; bi = w
        } else if (acc < second) { second = acc; si = w }
        w += 1
      }
      if (emitDist) java.lang.Long.valueOf(best)
      else java.lang.Integer.valueOf(if (rank == 0) bi else si)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tbl = ctx.addReferenceObj("centroidTable", table, "long[][]")
      val buf = ctx.addMutableState("long[]", "quantBuf",
        v => s"$v = new long[$rowLen];")
      nullSafeCodeGen(ctx, ev, a => {
        val w = ctx.freshName("w")
        val d = ctx.freshName("d")
        val t = ctx.freshName("t")
        val acc = ctx.freshName("acc")
        val best = ctx.freshName("best")
        val bi = ctx.freshName("bi")
        val bad = ctx.freshName("bad")
        if (rank == 0)
          s"""
             |boolean $bad = $a.numElements() < ${start + rowLen};
             |for (int $d = 0; !$bad && $d < $rowLen; $d++) {
             |  if ($a.isNullAt($start + $d)) { $bad = true; break; }
             |  $buf[$d] = (long) Math.floor((double) $a.getFloat($start + $d) * ${scale}L);
             |}
             |long $best = Long.MAX_VALUE; int $bi = 0;
             |for (int $w = 0; !$bad && $w < $rows; $w++) {
             |  long $acc = 0L;
             |  for (int $d = 0; $d < $rowLen; $d++) {
             |    long $t = $buf[$d] - $tbl[$w][$d];
             |    $acc += $t * $t;
             |  }
             |  if ($acc < $best) { $best = $acc; $bi = $w; }
             |}
             |${ev.isNull} = $bad;
             |${ev.value} = ${if (emitDist) best else bi};
           """.stripMargin
        else {
          val second = ctx.freshName("second")
          val si = ctx.freshName("si")
          s"""
             |boolean $bad = $a.numElements() < ${start + rowLen};
             |for (int $d = 0; !$bad && $d < $rowLen; $d++) {
             |  if ($a.isNullAt($start + $d)) { $bad = true; break; }
             |  $buf[$d] = (long) Math.floor((double) $a.getFloat($start + $d) * ${scale}L);
             |}
             |long $best = Long.MAX_VALUE; int $bi = 0;
             |long $second = Long.MAX_VALUE; int $si = 0;
             |for (int $w = 0; !$bad && $w < $rows; $w++) {
             |  long $acc = 0L;
             |  for (int $d = 0; $d < $rowLen; $d++) {
             |    long $t = $buf[$d] - $tbl[$w][$d];
             |    $acc += $t * $t;
             |  }
             |  if ($acc < $best) {
             |    $second = $best; $si = $bi; $best = $acc; $bi = $w;
             |  } else if ($acc < $second) { $second = $acc; $si = $w; }
             |}
             |${ev.isNull} = $bad;
             |${ev.value} = $si;
           """.stripMargin
        }
      })
    }

    override protected def withNewChildInternal(newChild: Expression): NearestIndex =
      copy(child = newChild)
  }

  /** pq_adc_dist(emb, code) → long: the asymmetric distance (ADC) of a
    * QUERY vector against a corpus PQ code, per row, with the codebook
    * as an expression parameter — Σ over subspaces of the squared-L2
    * between the query's quantized sub-vector and the codeword each
    * 4-bit nibble of `code` names. This removes the per-query
    * driver-side LUT from the search path entirely: a TABLE (or
    * stream) of query vectors equi-joins the codes table on probe
    * cell and every (query, candidate) pair scores inside whole-stage
    * codegen — the multi-query serving form, where per-query driver
    * work would serialize the batch. NULL contract: short or
    * null-element arrays yield NULL and a NULL code row drops
    * (FloatVecDot's rule). */
  case class PqAdcDist(left: Expression, right: Expression,
      codebook: Array[Array[Array[Long]]], scale: Long)
      extends BinaryExpression {
    private val subs = codebook.length
    private val words = codebook(0).length
    private val subDim = codebook(0)(0).length
    require(words == 16, "packed 4-bit nibble layout requires 16 words")
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "pq_adc_dist"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val code = b.asInstanceOf[Long]
      if (v.numElements() < subs * subDim) return null
      var acc = 0L
      var s = 0
      while (s < subs) {
        val w = ((code >> (4 * s)) & 15L).toInt
        var d = 0
        while (d < subDim) {
          if (v.isNullAt(s * subDim + d)) return null
          val q = math.floor(
            v.getFloat(s * subDim + d).toDouble * scale).toLong
          val t = q - codebook(s)(w)(d)
          acc += t * t
          d += 1
        }
        s += 1
      }
      java.lang.Long.valueOf(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tbl = ctx.addReferenceObj("pqCodebook", codebook, "long[][][]")
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val s = ctx.freshName("s")
        val d = ctx.freshName("d")
        val w = ctx.freshName("w")
        val q = ctx.freshName("q")
        val t = ctx.freshName("t")
        val acc = ctx.freshName("acc")
        val bad = ctx.freshName("bad")
        val idx = ctx.freshName("idx")
        s"""
           |boolean $bad = $a.numElements() < ${subs * subDim};
           |long $acc = 0L;
           |for (int $s = 0; !$bad && $s < $subs; $s++) {
           |  int $w = (int)(($b >> (4 * $s)) & 15L);
           |  for (int $d = 0; $d < $subDim; $d++) {
           |    int $idx = $s * $subDim + $d;
           |    if ($a.isNullAt($idx)) { $bad = true; break; }
           |    long $q = (long) Math.floor((double) $a.getFloat($idx) * ${scale}L);
           |    long $t = $q - $tbl[$s][$w][$d];
           |    $acc += $t * $t;
           |  }
           |}
           |${ev.isNull} = $bad;
           |${ev.value} = $acc;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdcDist =
      copy(left = newLeft, right = newRight)
  }

  def pqAdcDist(emb: Column, code: Column,
      codebook: IndexedSeq[IndexedSeq[IndexedSeq[Long]]],
      scale: Long): Column =
    GraftBridge.column(PqAdcDist(GraftBridge.expression(emb),
      GraftBridge.expression(code),
      codebook.map(_.map(_.toArray).toArray).toArray, scale))

  def nearestIndex(emb: Column, table: IndexedSeq[IndexedSeq[Long]],
      start: Int, scale: Long): Column =
    GraftBridge.column(NearestIndex(GraftBridge.expression(emb),
      table.map(_.toArray).toArray, start, scale))

  /** The second-nearest row under the same (dist, index) order — the
    * probe-2 assignment of [[NearestIndex]]. */
  def secondNearestIndex(emb: Column, table: IndexedSeq[IndexedSeq[Long]],
      start: Int, scale: Long): Column =
    GraftBridge.column(NearestIndex(GraftBridge.expression(emb),
      table.map(_.toArray).toArray, start, scale, rank = 1))

  /** The squared-L2 distance TO the nearest row (the argmin's value,
    * not its index) — the quantization/reconstruction error of an
    * assignment, emitted by the same compiled loop as [[nearestIndex]]
    * so the two can never disagree about which row won. */
  def nearestDistance(emb: Column, table: IndexedSeq[IndexedSeq[Long]],
      start: Int, scale: Long): Column =
    GraftBridge.column(NearestIndex(GraftBridge.expression(emb),
      table.map(_.toArray).toArray, start, scale, emitDist = true))

  /** srp_bucket(array<float>) → long: the signed-random-projection
    * bucket — bit b set iff the dot product of the floor(v×scale)
    * quantization with integer hyperplane b is strictly positive. Same
    * integer-exact contract and same codegen rationale as
    * [[NearestIndex]]; one quantize pass feeds all hyperplanes. */
  case class SrpBucket(child: Expression, planes: Array[Array[Long]],
      scale: Long) extends UnaryExpression {
    private val nbits = planes.length
    private val dim = planes(0).length
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = LongType
    override def prettyName: String = "srp_bucket"

    // same NULL contract as NearestIndex: short or null-element arrays
    // yield NULL, and the row drops out of every bucket join/probe
    // (the oracle's unnest produces no rows for such vectors — same
    // absence). NOT parity with the old HOF form (ADVICE r4): that
    // when(dot > 0, ...).otherwise(0) kept null-element vectors in
    // bucket 0 and element_at on a short array threw under ANSI —
    // dropping the row matches the oracle better than either.
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() < dim) return null
      val q = new Array[Long](dim)
      var d = 0
      while (d < dim) {
        if (v.isNullAt(d)) return null
        q(d) = math.floor(v.getFloat(d).toDouble * scale).toLong
        d += 1
      }
      var bucket = 0L; var b = 0
      while (b < nbits) {
        var dot = 0L; d = 0
        while (d < dim) { dot += q(d) * planes(b)(d); d += 1 }
        if (dot > 0L) bucket |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(bucket)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tbl = ctx.addReferenceObj("hyperplanes", planes, "long[][]")
      val buf = ctx.addMutableState("long[]", "srpQuantBuf",
        v => s"$v = new long[$dim];")
      nullSafeCodeGen(ctx, ev, a => {
        val b = ctx.freshName("b")
        val d = ctx.freshName("d")
        val dot = ctx.freshName("dot")
        val bucket = ctx.freshName("bucket")
        val bad = ctx.freshName("bad")
        s"""
           |boolean $bad = $a.numElements() < $dim;
           |for (int $d = 0; !$bad && $d < $dim; $d++) {
           |  if ($a.isNullAt($d)) { $bad = true; break; }
           |  $buf[$d] = (long) Math.floor((double) $a.getFloat($d) * ${scale}L);
           |}
           |long $bucket = 0L;
           |for (int $b = 0; !$bad && $b < $nbits; $b++) {
           |  long $dot = 0L;
           |  for (int $d = 0; $d < $dim; $d++) {
           |    $dot += $buf[$d] * $tbl[$b][$d];
           |  }
           |  if ($dot > 0L) $bucket |= (1L << $b);
           |}
           |${ev.isNull} = $bad;
           |${ev.value} = $bucket;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): SrpBucket =
      copy(child = newChild)
  }

  def srpBucket(emb: Column, planes: IndexedSeq[IndexedSeq[Long]],
      scale: Long): Column =
    GraftBridge.column(SrpBucket(GraftBridge.expression(emb),
      planes.map(_.toArray).toArray, scale))

  /** Column wrappers. */
  def fvecDot(a: Column, b: Column): Column =
    GraftBridge.column(FloatVecDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def simhash64(termHashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(termHashes)))

  /** dot ÷ norm-product with IEEE zero-norm semantics in EVERY eval
    * mode: a zero denominator yields NaN — the dot is then zero too
    * (a zero norm forces a zero dot; a fully underflowed norm product
    * implies an underflowed dot), so NaN is the IEEE 0/0 answer — and
    * the suite's documented NaN → nanvl(-∞) demotion contract holds
    * under the shipped ANSI sessions, where a bare `/` RAISES
    * DIVIDE_BY_ZERO and would kill a 100 TB job on its first
    * degenerate vector (found by RobustnessSpec's graph-family pin,
    * round 15; Spark 4.1 ANSI checks double division too).
    * Bit-identical to `/` wherever the denominator is nonzero; the
    * CaseWhen branch is evaluated conditionally, so no error escapes
    * the guarded row. */
  def normDiv(dot: Column, den: Column): Column =
    when(den === 0.0, lit(Double.NaN)).otherwise(dot / den)

  /** Cosine similarity over float vectors, built on the codegen dot;
    * zero-norm → NaN via [[normDiv]] (nanvl-demotable, never a raise). */
  def cosine(a: Column, b: Column): Column =
    normDiv(fvecDot(a, b), sqrt(fvecDot(a, a)) * sqrt(fvecDot(b, b)))
}
