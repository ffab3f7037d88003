package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native AS-OF join — the whole-operator Catalyst extension path
  * (SURVEY.md §2.B `q_join_asof` documents the composed window-emulation
  * form; this is the same semantics as a first-class operator):
  *
  *   for each left row, attach the LATEST right row of the same key with
  *   right.ts <= left.ts (left-outer: unmatched left rows keep nulls).
  *
  * Why a custom operator: the composed form (union/lag or join +
  * row_number) materializes every candidate (left, right) pair before
  * ranking — at 100 TB a hot key with many right rows explodes the
  * intermediate. This operator is a single merge pass over the two
  * sides, each hash-partitioned by key and sorted by (key, ts): state
  * per partition is ONE remembered right row, the intermediate never
  * exists. Layering:
  *
  *   [[AsOfJoin]]        logical node  (what to compute)
  *   [[AsOfJoinStrategy]] planner rule (logical → physical), injected via
  *                        `graft.extensions.GraftExtensions`
  *   [[AsOfJoinExec]]    physical merge (how), declaring its required
  *                        distribution + ordering so EnsureRequirements
  *                        inserts exactly the exchanges/sorts needed
  *   [[AsOfJoinApi.asof]] user-facing DataFrame entry point
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching equi-key lists")
  require(leftKeys.zip(rightKeys).forall { case (l, r) => l.dataType.sameType(r.dataType) },
    s"as-of join key types must match pairwise: " +
      s"${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTs.dataType.sameType(rightTs.dataType),
    s"as-of ts types must match: ${leftTs.dataType} vs ${rightTs.dataType}")
  require(Seq(org.apache.spark.sql.types.TimestampType,
      org.apache.spark.sql.types.TimestampNTZType,
      org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.DateType).exists(_.sameType(leftTs.dataType)),
    s"as-of ts must be an integral time type, got ${leftTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides hash-clustered on the equi keys: EnsureRequirements
    * co-partitions them (and AQE may still coalesce) — the operator never
    * sees rows of one key split across partitions.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Sorted by (key..., ts) ascending on both sides so one forward merge
    * pass suffices.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsBound = BindReferences.bindReference(lTsExpr, lOut)
      val rTsBound = BindReferences.bindReference(rTsExpr, rOut)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      // null-boxed ts: SQL comparison semantics (null ts never matches)
      def tsOf(bound: Expression, row: InternalRow): java.lang.Long =
        bound.eval(row) match {
          case null => null
          case n: Number => n.longValue()
        }

      // rCur holds the iterator's RAW row: upstream iterators reuse the
      // object only across next() calls, and we copy the row if (and only
      // if) it is retained as the candidate beyond the next advance
      var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
      var candidate: InternalRow = null
      var candKey: UnsafeRow = null

      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = tsOf(lTsBound, l)
        // SQL equi-join semantics: a null key (or null ts) matches nothing
        if (lk.anyNull || lt == null) {
          resultProj(joined(l, nullRight))
        } else {
          if (candKey != null && keyOrd.compare(candKey, lk) != 0) {
            candidate = null; candKey = null
          }
          var done = false
          while (!done && rCur != null) {
            val rk = rKeyProj(rCur)
            val rt = tsOf(rTsBound, rCur)
            if (rk.anyNull || rt == null) {
              // never a match for any left row; nulls sort first, skip
              rCur = if (rIter.hasNext) rIter.next() else null
            } else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) {
                rCur = if (rIter.hasNext) rIter.next() else null
              } else if (c == 0 && rt.longValue() <= lt.longValue()) {
                candidate = rCur.copy()
                candKey = rk.copy()
                rCur = if (rIter.hasNext) rIter.next() else null
              } else {
                done = true
              }
            }
          }
          resultProj(joined(l, if (candidate != null) candidate else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point (the Column↔Expression and Dataset.ofRows
  * bridges are private[sql], hence this package).
  */
object AsOfJoinApi {

  /** Columns built with `functions.col("x")` arrive as UnresolvedAttribute
    * (this entry point bypasses the analyzer) — resolve them by name
    * against the owning side so users get either a working join or a
    * usable error, never an opaque UnresolvedException from `.dataType`.
    */
  private def resolveAgainst(plan: LogicalPlan, c: Column, side: String,
      spark: org.apache.spark.sql.classic.SparkSession): Expression = {
    // session converter, NOT ExpressionUtils.expression: the latter wraps
    // the column in a lazy ColumnNodeExpression that claims resolved=true
    // (dataType NullType) even around an UnresolvedAttribute
    val e = spark.expression(c)
    if (e.resolved) e
    else e match {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        plan.resolve(u.nameParts, spark.sessionState.analyzer.resolver)
          .getOrElse(throw new IllegalArgumentException(
            s"as-of join: cannot resolve column '${u.name}' against the $side " +
              s"side (available: ${plan.output.map(_.name).mkString(", ")})"))
      case other => throw new IllegalArgumentException(
        "as-of join keys must be plain columns of a join side " +
          s"(df(\"col\") or col(\"name\")); got unresolved expression: $other")
    }
  }

  def asof(leftDf: DataFrame, rightDf: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTs: Column, rightTs: Column): DataFrame = {
    val spark = leftDf.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // self-register the planner strategy for vanilla sessions (no
    // GraftExtensions in spark.sql.extensions) — otherwise the AsOfJoin
    // node fails planning with an opaque assertion at action time
    val em = spark.sessionState.experimentalMethods
    if (!em.extraStrategies.contains(AsOfJoinStrategy))
      em.extraStrategies = AsOfJoinStrategy +: em.extraStrategies
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    // this entry point bypasses the analyzer's DeduplicateRelations:
    // overlapping attribute ids (self-as-of, shared lineage) would bind
    // right columns to left ordinals — reject instead of corrupting
    val overlap = lPlan.outputSet.intersect(rPlan.outputSet)
    require(overlap.isEmpty,
      s"as-of join sides share attributes $overlap — rename one side " +
        "(df.select(col(\"x\").as(\"x2\"), ...)) before joining")
    val node = AsOfJoin(
      lPlan, rPlan,
      leftKeys.map(resolveAgainst(lPlan, _, "left", spark)),
      rightKeys.map(resolveAgainst(rPlan, _, "right", spark)),
      resolveAgainst(lPlan, leftTs, "left", spark),
      resolveAgainst(rPlan, rightTs, "right", spark))
    Dataset.ofRows(spark, node)
  }
}
