package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst dot product over two float-array columns.
  *
  * The pure-DataFrame formulation (`aggregate(zip_with(a, b, _*_), 0d,
  * _+_)`) is semantically identical but runs interpreted — Catalyst does
  * not codegen HigherOrderFunction lambdas, which made the brute-force
  * cosine queries the bench hot spot (BASELINE.md r2). This expression
  * emits a tight loop inside whole-stage codegen with the exact same
  * left-to-right IEEE accumulation order as the lambda fold, so the DuckDB
  * oracle mirror (an equivalent explicit fold) is unchanged.
  *
  * Lives under org.apache.spark.sql because `AbstractDataType` (for
  * ExpectsInputTypes) and the Column↔Expression bridge are private[sql] —
  * the sanctioned extension point for native expressions.
  *
  * Null/shape semantics — chosen to be EXACTLY the zip_with/aggregate
  * fold's, so [[DotProductRewrite]] is a pure substitution: null if
  * either array is null, if the lengths differ (zip_with would pad with
  * nulls and poison the fold), or if any element in range is null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  // null is produced for shape/element-null mismatches even when both
  // input arrays are non-nullable
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $x.getFloat($i)) * $y.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** [[DotProduct]]'s exact-integer sibling: Σ aᵢ·bᵢ over two LONG-array
  * columns, accumulated in Long — the quantize-then-integer-arithmetic
  * discipline's inner product (nearest-centroid assignment keys on
  * ‖c‖² − 2·⟨x, c⟩ over 10⁶-grain quantized components, all exact
  * BIGINTs on both engines). Same null/shape semantics as [[DotProduct]];
  * overflow is the CALLER's bound to prove (the contract caller
  * [[graft.queries.VectorOps.vecCentroidAssignOn]] documents
  * |aᵢ|,|bᵢ| ≤ 4·10⁶ and dim ≤ 64 → |Σ| ≤ 64·(4·10⁶)² ≈ 1.03·10¹⁵
  * ≪ 2⁶³).
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getLong($i) * $y.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

/** Public bridge for graft code (Column ↔ Expression conversion is
  * private[sql]).
  */
object VectorExpressions {
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dotProductLong(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductLong(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
