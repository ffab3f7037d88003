package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the contract queries from the per-domain modules. Only
  * locally-oracle-green queries are registered (the declared set is the
  * t2 denominator).
  */
object SparkEntry {
  private def modules: Seq[ContractQuery] =
    Relational.all ++ Aggregates.all ++ Functions.all ++ TextOps.all ++
      VectorOps.all ++ EventOps.all ++ Extraction.all ++ Formats.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.aggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
