package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path (SURVEY.md §7.7).
  *
  * AQE's skew-join split handles skewed SORT-MERGE joins automatically;
  * manual salting is still the tool for (a) skewed aggregations, where a
  * single hot key funnels into one reducer, and (b) engines/paths where
  * AQE cannot rewrite (e.g. a skewed key under a broadcast-unfriendly
  * join). Both helpers preserve exact results: the salt only widens the
  * intermediate key space.
  */
object Skew {

  /** Two-phase aggregation over a skewed grouping key: partial-aggregate
    * by (key, salt) — spreading a hot key over `salts` reducers — then
    * final-aggregate by key. The aggregates must be algebraic (sum/count/
    * min/max style): `partials` run in phase one and `finals` re-aggregate
    * the phase-one columns by their output names, e.g.
    * `partials = Seq(count(lit(1)).as("n"), sum($"x").as("s"))` with
    * `finals = Seq(sum($"n").as("n"), sum($"s").as("s"))`.
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finals.head, finals.tail: _*)

  /** Salted COUNT(*) by `key` — the common case of [[saltedAgg]]. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    saltedAgg(df, key, salts,
      partials = Seq(count(lit(1)).as("__partial")),
      finals = Seq(sum(col("__partial")).as("n")))

  /** Salted inner equi-join: the large (skewed) side gets a per-row salt
    * in [0, salts); the small side is replicated `salts` times; the join
    * key becomes (key, salt). Result is row-identical to the unsalted
    * join — every large-side row still meets every matching small-side
    * row exactly once.
    */
  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String, salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLarge.join(replicatedSmall,
        saltedLarge(largeKey) === replicatedSmall(smallKey) &&
          saltedLarge("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
