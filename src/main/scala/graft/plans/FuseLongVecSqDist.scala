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
  * Eval-mode discipline (ADVICE r13 → resolved r14): fusing must not
  * change failure semantics, and Spark 4.1.2 sessions here are
  * ANSI-default, so a LEGACY-only guard left the rule dead in the
  * shipped config. The rule now fuses BOTH modes, each into the
  * matching twin: a tree whose arithmetic is uniformly LEGACY fuses
  * into the wrapping `LongVecSqDist(checked = false)`; uniformly ANSI
  * fuses into `checked = true`, whose exact ops raise the same
  * ARITHMETIC_OVERFLOW at the same element the unfused HOF would.
  * Mixed modes (only constructible by hand) and TRY mode (overflow →
  * NULL at the failing node, a shape the fused loop does not model)
  * never fuse.
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

  /** merge must be (acc, p) -> acc + p over longs; returns the Add's
    * eval mode (TRY rejected — overflow→NULL is not fusable). Note
    * Spark 4.1 wraps the mode in [[NumericEvalContext]] — matching a
    * bare `EvalMode.X` against it compiles (equality pattern) but is
    * never true, the r13 trap. */
  private def mergeMode(f: Expression): Option[EvalMode.Value] = f match {
    case LambdaFunction(
        Add(l: NamedLambdaVariable, r: NamedLambdaVariable,
          NumericEvalContext(mode, _)),
        Seq(acc: NamedLambdaVariable, p: NamedLambdaVariable), _)
        if l.exprId == acc.exprId && r.exprId == p.exprId &&
          mode != EvalMode.TRY =>
      Some(mode)
    case _ => None
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(arg: NamedLambdaVariable), _) => v.exprId == arg.exprId
    case _ => false
  }

  /** Both Multiply operands must be the SAME-ORIENTED difference of the
    * two lambda variables: (x−y)·(x−y) or (y−x)·(y−x). Returns the
    * shared eval mode of subtracts and multiply iff they all agree
    * (TRY rejected). */
  private def squaredDiffMode(mul: Expression,
      xa: NamedLambdaVariable, ya: NamedLambdaVariable)
      : Option[EvalMode.Value] = {
    def orient(e: Expression): Option[(Boolean, EvalMode.Value)] = e match {
      case Subtract(l: NamedLambdaVariable, r: NamedLambdaVariable,
            NumericEvalContext(mode, _))
          if l.exprId == xa.exprId && r.exprId == ya.exprId =>
        Some((true, mode))
      case Subtract(l: NamedLambdaVariable, r: NamedLambdaVariable,
            NumericEvalContext(mode, _))
          if l.exprId == ya.exprId && r.exprId == xa.exprId =>
        Some((false, mode))
      case _ => None
    }
    mul match {
      case Multiply(l, r, NumericEvalContext(mode, _))
          if mode != EvalMode.TRY =>
        (orient(l), orient(r)) match {
          case (Some((p, m1)), Some((q, m2)))
              if p == q && m1 == mode && m2 == mode => Some(mode)
          case _ => None
        }
      case _ => None
    }
  }

  /** The single eval mode of ALL five arithmetic nodes, or None. */
  private def fusableMode(mul: Expression, xa: NamedLambdaVariable,
      ya: NamedLambdaVariable, merge: Expression)
      : Option[EvalMode.Value] =
    for {
      sq <- squaredDiffMode(mul, xa, ya)
      mg <- mergeMode(merge)
      if sq == mg
    } yield sq

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mul,
              Seq(xa: NamedLambdaVariable, ya: NamedLambdaVariable), _)),
            zero, merge, finish)
          if isLongArray(a) && isLongArray(b) &&
            isZeroL(zero) && isIdentity(finish) &&
            fusableMode(mul, xa, ya, merge).isDefined =>
        LongVecSqDist(a, b,
          checked = fusableMode(mul, xa, ya, merge).contains(EvalMode.ANSI))
    }
}
