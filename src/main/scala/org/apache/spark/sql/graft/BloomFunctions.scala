package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** DataFrame-level access to Spark's bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`) — the pair the
  * optimizer's own `InjectRuntimeFilter` rule wires into shuffle joins,
  * exposed so an operator can build the same semi-join pruning
  * DELIBERATELY. Spark only injects the runtime filter when the
  * application side scans past `spark.sql.optimizer.runtime.bloomFilter.
  * applicationSideScanSizeThreshold` (10 GB default), which is exactly
  * the regime the bench fixtures never reach — an explicit filter makes
  * the 100 TB plan testable at any scale, with the engine's sizing knobs
  * in the caller's hands instead of the optimizer's thresholds.
  *
  * Protocol (mirrors the injector): hash the value to a Long with
  * `xxhash64` on BOTH sides; the probe side must pass the bloom as a
  * scalar subquery (`BloomFilterMightContain` type-checks only constant
  * or subquery filters, so a broadcast-join column would be rejected).
  * No false negatives ever — callers composing
  * prefilter-then-exact-verify keep exact results at any sizing.
  */
object BloomFunctions {

  /** Aggregate a `xxhash64`-hashed Long column into one binary bloom
    * filter cell. Duplicates don't change the filter, so feed RAW rows —
    * no distinct pass before the build.
    */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(hashed),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of `hashed` against the single-row, single-column
    * bloom frame `bloomDf` (the [[bloomAgg]] output), attached as a
    * scalar subquery — evaluated once, result broadcast to every task.
    */
  def mightContain(bloomDf: DataFrame, hashed: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      ExpressionUtils.expression(hashed)))
}
