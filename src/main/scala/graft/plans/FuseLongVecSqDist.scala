package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.functions.VectorExpressions.LongVecSqDist

/** Optimizer rule: recognize the interpreted higher-order-function
  * squared-L2 distance over integer code vectors
  *
  *   aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L,
  *             (acc, p) -> acc + p)
  *
  * and fuse it into the codegen [[LongVecSqDist]] expression —
  * [[FuseFloatVecDot]]'s integer sibling, serving the SQ8/PQ code
  * domain (q184). Numerically identical: pure long arithmetic,
  * left-to-right accumulation. The square may be written (x−y)·(x−y)
  * or (y−x)·(y−x) — equal by algebra, both accepted; a MIXED form
  * (x−y)·(y−x) is the NEGATED square and must not fuse.
  *
  * Every arithmetic node must carry LEGACY eval mode: under
  * `spark.sql.ansi.enabled` the unfused HOF raises
  * ARITHMETIC_OVERFLOW on long overflow while [[LongVecSqDist]]'s
  * codegen wraps silently, so fusing an ANSI-mode expression would
  * change observable failure semantics — the same discipline Spark's
  * own rewrites keep (ADVICE r13). The shipped SQ8/PQ callers bound
  * the domain far below overflow either way; the guard is for any
  * future ANSI session this rule is injected into.
  */
object FuseLongVecSqDist extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def isZeroL(e: Expression): Boolean = e match {
    case Literal(v: java.lang.Long, LongType) => v.longValue() == 0L
    case c: Cast => c.dataType == LongType && (c.child match {
      case Literal(v: java.lang.Number, _) => v.longValue() == 0L
      case _ => false
    })
    case _ => false
  }

  /** merge must be (acc, p) -> acc + p over longs, legacy eval mode. */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(
        Add(l: NamedLambdaVariable, r: NamedLambdaVariable, EvalMode.LEGACY),
        Seq(acc: NamedLambdaVariable, p: NamedLambdaVariable), _) =>
      l.exprId == acc.exprId && r.exprId == p.exprId
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(arg: NamedLambdaVariable), _) => v.exprId == arg.exprId
    case _ => false
  }

  /** Both Multiply operands must be the SAME-ORIENTED difference of the
    * two lambda variables: (x−y)·(x−y) or (y−x)·(y−x). */
  private def isSquaredDiff(mul: Expression,
      xa: NamedLambdaVariable, ya: NamedLambdaVariable): Boolean = {
    def orient(e: Expression): Option[Boolean] = e match {
      case Subtract(l: NamedLambdaVariable, r: NamedLambdaVariable,
            EvalMode.LEGACY)
          if l.exprId == xa.exprId && r.exprId == ya.exprId => Some(true)
      case Subtract(l: NamedLambdaVariable, r: NamedLambdaVariable,
            EvalMode.LEGACY)
          if l.exprId == ya.exprId && r.exprId == xa.exprId => Some(false)
      case _ => None
    }
    mul match {
      case Multiply(l, r, EvalMode.LEGACY) =>
        (orient(l), orient(r)) match {
          case (Some(p), Some(q)) => p == q
          case _ => false
        }
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mul,
              Seq(xa: NamedLambdaVariable, ya: NamedLambdaVariable), _)),
            zero, merge, finish)
          if isLongArray(a) && isLongArray(b) &&
            isSquaredDiff(mul, xa, ya) &&
            isZeroL(zero) && isSumMerge(merge) && isIdentity(finish) =>
        LongVecSqDist(a, b)
    }
}
