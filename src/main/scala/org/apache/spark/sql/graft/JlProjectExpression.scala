package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native JL sign projection: `embDims` float components → `projDims`
  * quantized double components, y_i = floor(Σ_j s(i,j)·x_j / 4 · 10⁶ +
  * ½) / 10⁶ with a fixed ±1 sign matrix.
  *
  * Why native ([[DotProduct]]'s rationale, compounded): the inline ±
  * chain formulation is a ~1024-node tree that blew janino's method
  * limits once q_vec_project's posexplode fused it into a Generate
  * stage — every run paid a ~4 s FAILED whole-stage compile and fell
  * back to interpretation; the HOF fold (`aggregate`/`zip_with` per
  * component) fixed the blowup but still cost ~2.5 s of one-time
  * generated-class compilation for its 16 fallback wrappers. This
  * expression is one compact nested loop in codegen — compiles
  * instantly, runs in whole-stage codegen — with the EXACT IEEE
  * accumulation of both prior forms and of the DuckDB oracle's
  * left-assoc ± chain: s·x with s = ±1.0 is exact negation,
  * accumulation ascends j, the division by 4 is a power of two, and
  * quantization is the repo's explicit floor(x·10⁶ + ½) (never
  * round(), whose tie rule differs between engines).
  *
  * Null/shape semantics — pinned to the SQL oracle's NULL propagation
  * (the r14 advice caught the divergence): a dirty embedding (null
  * element, wrong length) yields an array of `projDims` NULL components,
  * NOT a null array. Every projected component mixes every input, so in
  * the oracle's per-component ± chain ONE null operand nulls ALL
  * `projDims` sums — DuckDB still emits `projDims` rows (with null
  * `val`) per dirty vector, and a whole-null array here would make
  * posexplode emit ZERO rows for it: silent row loss vs the oracle.
  * Only a null INPUT array stays null (SQL's outer expression is null
  * there too, but the contract query unnests a per-row ARRAY literal of
  * the component expressions, which is never null — so dirty-but-present
  * is the case that must match row-for-row). The sign matrix rides to
  * executors once as a reference object, not as literals in the
  * generated source.
  */
case class JlProject(child: Expression, projDims: Int, embDims: Int,
    signs: Seq[Double]) extends UnaryExpression with ExpectsInputTypes {

  require(signs.length == projDims * embDims,
    s"sign matrix must be $projDims x $embDims, got ${signs.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = true)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_jl_project"

  @transient private lazy val signArr: Array[Double] = signs.toArray

  // projDims null components — the dirty-input answer (doc above); one
  // shared immutable instance, GenericArrayData never mutates its backing
  @transient private lazy val allNull: GenericArrayData =
    new GenericArrayData(new Array[Any](projDims))

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != embDims) return allNull
    val out = new Array[Double](projDims)
    var i = 0
    while (i < projDims) {
      var acc = 0.0
      val base = i * embDims
      var j = 0
      while (j < embDims) {
        if (x.isNullAt(j)) return allNull
        acc += signArr(base + j) * x.getFloat(j).toDouble
        j += 1
      }
      out(i) = math.floor(acc / 4.0 * 1000000.0 + 0.5) / 1000000.0
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.addReferenceObj("jlSigns", signArr, "double[]")
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nulls = ctx.addReferenceObj("jlAllNull", allNull,
        "org.apache.spark.sql.catalyst.util.GenericArrayData")
      s"""
         |boolean $bad = ($x.numElements() != $embDims);
         |if (!$bad) {
         |  double[] $out = new double[$projDims];
         |  for (int $i = 0; $i < $projDims && !$bad; $i++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $embDims; $j++) {
         |      if ($x.isNullAt($j)) { $bad = true; break; }
         |      $acc += $s[$i * $embDims + $j] * (double) $x.getFloat($j);
         |    }
         |    $out[$i] = Math.floor($acc / 4.0 * 1000000.0 + 0.5) / 1000000.0;
         |  }
         |  if (!$bad) ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
         |if ($bad) ${ev.value} = $nulls;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

/** Native hyperplane-sign bucket: `planes` fixed ±1 hyperplanes over an
  * `embDims`-float embedding → one int in [0, 2^planes), bit i (MSB
  * first) set when Σ_j s(i,j)·x_j ≥ 0.
  *
  * Why native ([[JlProject]]'s rationale, measured on q_vec_drift): the
  * inline ±-chain bucket formulation — 4 × 64-term reduceLeft chains
  * inside the melt projection — cost a CONSTANT ~5.3 s per session at
  * BOTH sf0.001 and sf0.1 (TimeQ, identical to the decimal), i.e. the
  * entire query was generated-code compilation, not data. This
  * expression is one nested loop; the query drops to scan-bound.
  *
  * Bit-exactness vs the DuckDB oracle: accumulation ascends j exactly
  * like the SQL's left-associated ± chain (s = ±1.0 is exact negation),
  * and the sign test is on the RAW sum — no scaling, no quantization
  * (contrast [[JlProject]], whose floor-quantization would flip signs
  * of tiny negatives).
  *
  * Null/shape semantics: null on a null array, a wrong length, or any
  * null element — the bucket is a SCALAR, so null is the honest dirty
  * answer here (contrast [[JlProject]], whose array output must keep
  * its projDims shape so downstream posexplode never loses rows).
  */
case class PlaneSignBucket(child: Expression, planes: Int, embDims: Int,
    signs: Seq[Double]) extends UnaryExpression with ExpectsInputTypes {

  require(signs.length == planes * embDims,
    s"sign matrix must be $planes x $embDims, got ${signs.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_plane_bucket"

  @transient private lazy val signArr: Array[Double] = signs.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != embDims) return null
    var bucket = 0
    var i = 0
    while (i < planes) {
      var acc = 0.0
      val base = i * embDims
      var j = 0
      while (j < embDims) {
        if (x.isNullAt(j)) return null
        acc += signArr(base + j) * x.getFloat(j).toDouble
        j += 1
      }
      if (acc >= 0.0) bucket |= 1 << (planes - 1 - i)
      i += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.addReferenceObj("planeSigns", signArr, "double[]")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val b = ctx.freshName("bucket")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |if ($x.numElements() != $embDims) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $b = 0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $planes && !$bad; $i++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $embDims; $j++) {
         |      if ($x.isNullAt($j)) { $bad = true; break; }
         |      $acc += $s[$i * $embDims + $j] * (double) $x.getFloat($j);
         |    }
         |    if (!$bad && $acc >= 0.0) $b |= 1 << ($planes - 1 - $i);
         |  }
         |  if ($bad) ${ev.isNull} = true;
         |  else ${ev.value} = $b;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : PlaneSignBucket = copy(child = newChild)
}

object JlProjectExpression {
  def jlProject(emb: Column, projDims: Int, embDims: Int,
      signs: Seq[Double]): Column =
    ExpressionUtils.column(JlProject(
      ExpressionUtils.expression(emb), projDims, embDims, signs))

  def planeBucket(emb: Column, planes: Int, embDims: Int,
      signs: Seq[Double]): Column =
    ExpressionUtils.column(PlaneSignBucket(
      ExpressionUtils.expression(emb), planes, embDims, signs))
}
