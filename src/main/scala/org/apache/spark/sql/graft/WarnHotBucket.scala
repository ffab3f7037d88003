package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType, StringType}

/** Side-effecting guard predicate for the LSH hot-bucket cap
  * (graft.operators.BandedHamming): logs one WARN naming the dropped
  * bucket, adds its row count to a telemetry counter, and returns false
  * so the filter drops the row.
  *
  * A native expression instead of a Scala UDF for two reasons: it stays
  * inside whole-stage codegen (the guard sits in every LSH candidate
  * join's filter — an interpreted ScalaUDF node there would break the
  * "no interpreted UDFs in the hot path" property the ANN specs pin),
  * and its evaluation cost is only paid on the over-cap marker rows the
  * caller routes to it (the common-case row short-circuits on the
  * `count <= cap` disjunct before this expression is reached).
  *
  * At-least-once semantics: the candidate self-join references the
  * guarded subtree from both branches, and task retries re-run filters,
  * so a hot bucket may be warned (and counted) more than once per query.
  * The counter is diagnostic telemetry — "did the guard fire, roughly
  * how big was the bucket" — not an exact audit.
  */
case class WarnHotBucket(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "graft_warn_hot_bucket"

  override protected def nullSafeEval(desc: Any, n: Any): Any =
    WarnHotBucket.hit(desc.toString, n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, n) =>
      s"org.apache.spark.sql.graft.WarnHotBucket$$.MODULE$$.hit($d.toString(), $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WarnHotBucket =
    copy(left = newLeft, right = newRight)
}

object WarnHotBucket {
  /** Rows dropped by the guard (see at-least-once note above). */
  val droppedRows = new java.util.concurrent.atomic.AtomicLong

  private lazy val log = org.slf4j.LoggerFactory.getLogger(WarnHotBucket.getClass)

  /** Invoked from codegen'd filters on over-cap marker rows only. */
  def hit(desc: String, n: Long): Boolean = {
    droppedRows.addAndGet(n)
    log.warn(s"hot bucket [$desc] with $n rows (> maxBucket cap) pulled " +
      "out of the quadratic candidate join; members pair via other bands " +
      "or, where rescueHot is on, via linear star edges to the bucket rep")
    false
  }

  /** Column bridge (Column ↔ Expression conversion is private[sql]). */
  def column(desc: Column, n: Column): Column =
    ExpressionUtils.column(WarnHotBucket(
      ExpressionUtils.expression(desc), ExpressionUtils.expression(n)))
}
