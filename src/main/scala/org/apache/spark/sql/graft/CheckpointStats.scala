package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Replaces a checkpointed DataFrame's inherited plan statistics with
  * measured truth.
  *
  * Why this exists: `Dataset.localCheckpoint`/`checkpoint` cut the
  * lineage (the new plan is a leaf [[LogicalRDD]]) but deliberately
  * carry the ORIGIN plan's **estimated** `Statistics` forward
  * (`originStats`), so the optimizer keeps making the same broadcast
  * decisions it would have made for the un-checkpointed plan. For a
  * one-shot checkpoint that is the right trade. For an ITERATIVE
  * algorithm it is an exponential bug: the size estimate of a join is a
  * product over its children, so round N's estimate is a product of
  * round N−1's inherited estimate with itself — `sizeInBytes` becomes a
  * BigInt whose digit count multiplies every round, and by round ~8 the
  * driver sits for minutes inside `BigInteger.multiply` (Toom-Cook)
  * *planning*, touching no data at all. Diagnosed on the semantic-dedup
  * clustering path, whose cosine graph needs ~12 label-propagation
  * rounds; the text graphs converge in ≤5 and never surfaced it.
  *
  * The checkpoint has just MATERIALIZED the data, so the estimate it
  * inherits is strictly worse than what we can know: callers pass the
  * measured row count (one cheap count over materialized blocks, or a
  * value they already track) and a bounded per-row width. The rebuilt
  * leaf carries `Statistics(rowCount · avgRowBytes, rowCount)` — small,
  * truthful, and constant across rounds, so broadcast-vs-SMJ decisions
  * stay correct at any scale and planning cost stays O(plan size).
  */
object CheckpointStats {

  /** Rebuild `df`'s LogicalRDD leaf with measured stats. `df` must be
    * the direct result of an (eager) `checkpoint`/`localCheckpoint`;
    * any other plan shape is returned unchanged.
    */
  def withMeasuredStats(df: DataFrame, rowCount: Long, avgRowBytes: Long): DataFrame =
    df.queryExecution.logical match {
      case lr: LogicalRDD =>
        val spark = df.sparkSession.asInstanceOf[ClassicSession]
        val stats = Statistics(
          sizeInBytes = BigInt(math.max(rowCount, 1L)) * avgRowBytes,
          rowCount = Some(BigInt(rowCount)))
        Dataset.ofRows(spark,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(spark, Some(stats), None))
      case _ => df
    }

  /** The durable-checkpoint directory backing `df`, if `df` is the
    * result of a reliable `checkpoint()` (None for `localCheckpoint` —
    * executor-local blocks have no file). Lets an iterative caller
    * delete superseded rounds' checkpoints instead of accumulating one
    * full copy per round.
    */
  def checkpointFile(df: DataFrame): Option[String] =
    df.queryExecution.logical match {
      case lr: LogicalRDD => lr.rdd.getCheckpointFile
      case _ => None
    }
}
