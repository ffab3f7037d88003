package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted HigherOrderFunction dot-product
  * patterns into the codegen'd [[DotProduct]] expression.
  *
  * Catalyst never codegens lambda functions (`ArrayAggregate`/`ZipWith`
  * run interpreted, ~6× slower in the r2 bench), so a user writing the
  * idiomatic
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * y), 0D, (acc, v) -> acc + v) — dot
  *   aggregate(a, 0D, (acc, x) -> acc + double(x) * x)                           — norm²
  *
  * silently leaves whole-stage codegen. Both fold left-to-right with
  * double accumulation — exactly [[DotProduct]]'s loop — so the rewrite is
  * bit-identical, not approximate: IEEE double add/multiply of the same
  * operands in the same order, with multiply/add operand order free to
  * flip (both IEEE-commutative).
  *
  * The guard deliberately requires the multiply itself to be
  * DOUBLE-typed (i.e. at least one operand widened to double, which
  * widens both under Catalyst's type coercion): a float-typed
  * `(x, y) -> x * y` rounds every product to FLOAT before accumulating,
  * which [[DotProduct]] does not — rewriting that shape (or its
  * `cast(x*y as double)` variant) would silently change results, so
  * those stay on the interpreted path. [[DotProduct]]'s null/length
  * semantics equal the fold's (see its scaladoc), so no further guards
  * are needed for nullable array elements.
  *
  * Registered by [[graft.extensions.GraftExtensions]]
  * (`spark.sql.extensions`) or via `spark.experimental.extraOptimizations`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  /** The lambda variable itself, possibly widened float→double. */
  private object VarD {
    def unapply(e: Expression): Option[NamedLambdaVariable] = e match {
      case v: NamedLambdaVariable => Some(v)
      case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
      case _ => None
    }
  }

  /** DOUBLE-typed x·y over the two given lambda variables (either operand
    * order). The dataType check is a correctness guard, not an
    * optimization: a FloatType multiply rounds each product to float
    * before the fold, which DotProduct's all-double loop would not.
    */
  private def isMul(e: Expression, a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    e match {
      case Multiply(VarD(x), VarD(y), _) if e.dataType == DoubleType =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }

  /** acc + v over the two given lambda variables (either operand order). */
  private def isAccAdd(e: Expression, acc: NamedLambdaVariable, v: NamedLambdaVariable): Boolean =
    e match {
      case Add(VarD(x), VarD(y), _) =>
        (x.exprId == acc.exprId && y.exprId == v.exprId) ||
          (x.exprId == v.exprId && y.exprId == acc.exprId)
      case _ => false
    }

  private object ZeroD {
    def unapply(e: Expression): Boolean = e match {
      case Literal(0.0, DoubleType) => true
      case _ => false
    }
  }

  /** finish lambda is the identity. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  private def isFloatArray(e: Expression): Boolean =
    e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(mul, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        ZeroD(),
        LambdaFunction(add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        finish)
        if isFloatArray(a) && isFloatArray(b) &&
          isMul(mul, x, y) && isAccAdd(add, acc, v) && isIdentity(finish) =>
      DotProduct(a, b)
    // aggregate(a, 0D, (acc, x) -> acc + x * x)  ==  dot(a, a)
    case ArrayAggregate(
        a,
        ZeroD(),
        LambdaFunction(Add(VarD(acc), mul, _), Seq(accV: NamedLambdaVariable, x: NamedLambdaVariable), _),
        finish)
        if isFloatArray(a) && acc.exprId == accV.exprId &&
          isMul(mul, x, x) && isIdentity(finish) =>
      DotProduct(a, a)
  }
}
