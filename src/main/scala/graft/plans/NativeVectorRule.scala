package graft.plans

import graft.functions.{DotProductExpr, SqDistExpr}
import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, Subtract, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the interpreted higher-order-function spelling
  * of the two hot vector kernels into their native codegen expressions —
  * so a USER who writes the idiomatic
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)
  *
  * (or the (x-y)*(x-y) squared-distance variant) gets
  * [[graft.functions.DotProductExpr]] / [[graft.functions.SqDistExpr]]
  * without knowing the kernels exist. The HOF form runs interpreted
  * lambdas per element (the corpus-quality kernel measured 42.7 s → 0.2 s
  * for the analogous rewrite); the kernels are whole-stage-codegen
  * primitive loops documented bit-identical to the sequential HOF fold.
  *
  * The match is deliberately STRICT — rewrite only when semantics are
  * provably identical:
  *  - both inputs are array<double> (float arrays fold in FLOAT precision
  *    element-wise in the HOF form, which the double kernel would not
  *    reproduce bit-for-bit);
  *  - the seed is literal double 0.0, the merge is `acc + element` in
  *    that order, and the finish lambda is the identity;
  *  - the zip lambda multiplies (or subtracts-and-squares) the two zip
  *    variables in argument order.
  * Anything else is left untouched.
  */
object NativeVectorRule extends Rule[LogicalPlan] {

  private def isZeroD(e: Expression): Boolean = e match {
    // raw-bits check: -0.0 == 0.0 is true, but a -0.0 seed is observable
    // (empty arrays return the seed; -0.0 + -0.0 = -0.0) — not bit-identical
    case Literal(v: Double, DoubleType) => java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(
        Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
        Seq(la: NamedLambdaVariable, lv: NamedLambdaVariable), _) =>
      acc.exprId == la.exprId && v.exprId == lv.exprId
    case _ => false
  }

  // (x, y) -> x * y over the zip variables, in argument order
  private def isPairProduct(f: Expression): Boolean = f match {
    case LambdaFunction(
        Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _) =>
      x.exprId == lx.exprId && y.exprId == ly.exprId
    case _ => false
  }

  // (x, y) -> (x - y) * (x - y) over the zip variables
  private def isPairSqDiff(f: Expression): Boolean = f match {
    case LambdaFunction(
        Multiply(
          Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
          Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _),
        Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _) =>
      x1.exprId == lx.exprId && y1.exprId == ly.exprId &&
        x2.exprId == lx.exprId && y2.exprId == ly.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, zip), zero, merge, finish)
        if isZeroD(zero) && isSumMerge(merge) && isIdentityFinish(finish) &&
          isDoubleArray(a) && isDoubleArray(b) && isPairProduct(zip) =>
      DotProductExpr(a, b)
    case ArrayAggregate(ZipWith(a, b, zip), zero, merge, finish)
        if isZeroD(zero) && isSumMerge(merge) && isIdentityFinish(finish) &&
          isDoubleArray(a) && isDoubleArray(b) && isPairSqDiff(zip) =>
      SqDistExpr(a, b)
  }
}
