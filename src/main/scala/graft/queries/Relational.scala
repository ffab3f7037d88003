package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational core (SURVEY.md §2.B): projection/filter, the full join
  * matrix, hash/distinct/approx/grouping-set aggregation, windows, sorts,
  * top-k and set operations — pure `org.apache.spark.sql.functions` +
  * DataFrame combinators so Catalyst/AQE/codegen handle the physical plan
  * (pushdown, broadcast selection, partial aggregation, Expand,
  * TakeOrderedAndProject) without custom operators.
  *
  * Every query orders by a unique key tuple and emits floats via
  * [[Det.out]] so the driver's DuckDB hash-compare is deterministic.
  */
object Relational {
  import Det._

  private def ts(s: String): Column = lit(s).cast(TimestampType)

  /** Flagship: TPC-H Q1-shaped multi-aggregate over lineitem. */
  def aggGroup(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.t(spark, dir, "lineitem")
    val disc  = money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
    val charge = disc * (lit(1) + rate(col("l_tax")))
    l.filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        out(sum(money(col("l_quantity")))).as("sum_qty"),
        out(sum(money(col("l_extendedprice")))).as("sum_base_price"),
        out(sum(disc)).as("sum_disc_price"),
        out(sum(charge)).as("sum_charge"),
        avgOf(sum(money(col("l_quantity"))), count(lit(1))).as("avg_qty"),
        avgOf(sum(money(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
        avgOf(sum(rate(col("l_discount"))), count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val aggGroupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4)))), 4) AS DOUBLE) AS sum_charge,
      |  CAST(round(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_qty,
      |  CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_price,
      |  CAST(round(CAST(sum(CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val all: Seq[ContractQuery] = Seq(
    ContractQuery("q_agg_group", aggGroup, Some(aggGroupSql))
  )
}
