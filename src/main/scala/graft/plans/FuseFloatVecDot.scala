package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, Decimal, DoubleType, FloatType}
import graft.functions.VectorExpressions.FloatVecDot

/** Optimizer rule: recognize the interpreted higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, p) -> acc + p)
  *
  * over float arrays and fuse it into the codegen [[FloatVecDot]]
  * expression. Numerically identical: both multiply in float and
  * accumulate left-to-right in double. Users (and SQL text) can write
  * the natural composable form and still get the tight generated loop —
  * registered via [[graft.GraftExtensions]] `injectOptimizerRule`.
  */
object FuseFloatVecDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def sameVars(p: (NamedLambdaVariable, NamedLambdaVariable),
      q: (NamedLambdaVariable, NamedLambdaVariable)): Boolean =
    p._1.exprId == q._1.exprId && p._2.exprId == q._2.exprId

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(v, DoubleType) => v == 0.0d
    case c: Cast => isZeroD(c.child) || (c.child match {
      // numeric literal kinds only — toString.toDouble on an arbitrary
      // literal (e.g. a string) would throw inside the optimizer
      case Literal(v: java.lang.Number, _) => v.doubleValue() == 0.0
      case Literal(d: Decimal, _) => d.toDouble == 0.0
      case _ => false
    })
    case _ => false
  }

  /** merge must be (acc, p) -> acc + p (with p possibly cast to double). */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r, _),
        Seq(acc: NamedLambdaVariable, p: NamedLambdaVariable), _) =>
      l.exprId == acc.exprId && (r match {
        case v: NamedLambdaVariable => v.exprId == p.exprId
        case c: Cast => c.dataType == DoubleType && (c.child match {
          case v: NamedLambdaVariable => v.exprId == p.exprId
          case _ => false
        })
        case _ => false
      })
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(arg: NamedLambdaVariable), _) => v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(
              Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
              Seq(xa: NamedLambdaVariable, ya: NamedLambdaVariable), _)),
            zero, merge, finish)
          if isFloatArray(a) && isFloatArray(b) &&
            (sameVars((x, y), (xa, ya)) || sameVars((x, y), (ya, xa))) &&
            isZeroD(zero) && isSumMerge(merge) && isIdentity(finish) =>
        FloatVecDot(a, b)
    }
}
