package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One driver-contract query: a DataFrame builder plus (when the semantics
  * are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL that the
  * driver's t2 gate executes on the same parquet tables.
  *
  * Semantics derive from the reference `icaropires/pdf2dataset` surface and
  * the north-star extensions; see SURVEY.md §2 for the per-query provenance
  * (the reference checkout was empty this round — SURVEY.md §0).
  */
final case class ContractQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Fixture-table loaders. One parquet file per table under the sf dir. */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}

/** Determinism helpers for oracle-checked float outputs (SURVEY.md §7.6 R1).
  *
  * Double-precision SUM/AVG accumulate in partition order, so raw double
  * aggregates are not reproducible across engines. Rule: aggregate over
  * exact DECIMAL intermediates (both engines compute the identical exact
  * value), round to 4dp (both engines round decimal ties away from zero —
  * probed on DuckDB 1.0.0), and emit DOUBLE. AVG = double(sum_dec)/count,
  * a single deterministic double division.
  */
object Det {
  /** Monetary/measure double -> exact decimal. Fits |x| < 1e8 at 4dp. */
  def money(c: Column): Column = c.cast(DecimalType(12, 4))

  /** Small-rate double (discount/tax-like, |x| < 100) -> exact decimal. */
  def rate(c: Column): Column = c.cast(DecimalType(6, 4))

  /** Final float output: round exact decimal (or deterministic double) to
    * 4dp and emit DOUBLE — the hash-stable output convention.
    */
  def out(c: Column): Column = round(c, 4).cast(DoubleType)

  /** Deterministic average from an exact decimal sum. */
  def avgOf(sumDec: Column, n: Column): Column =
    round(sumDec.cast(DoubleType) / n, 4).cast(DoubleType)
}
