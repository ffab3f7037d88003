package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The typed Dataset[T] surface (SURVEY.md §1.3): case-class Encoders
  * give compile-time column safety where the schema is static — the
  * engine's task rows (graft.extract.ExtractTask) already flow through
  * this path; here the relational side is exercised too, asserting the
  * typed plans produce exactly the untyped DataFrame results (same
  * Catalyst plans underneath — Encoders are a front-end, not an engine).
  */
// top-level: an inner case class has no stable outer scope for Encoders
case class Li(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

class TypedApiSpec extends AnyFunSuite with SparkSessionFixture {

  private def lineitem = {
    val s = spark
    import s.implicits._
    graft.queries.Tables.t(spark, Sf0001, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag").as[Li]
  }

  test("typed filter + map equals the untyped plan") {
    val s = spark
    import s.implicits._
    val typed = lineitem.filter(_.l_quantity < 10.0).map(_.l_orderkey)
      .collect().sorted
    val untyped = graft.queries.Tables.t(spark, Sf0001, "lineitem")
      .filter(col("l_quantity") < 10.0).select(col("l_orderkey"))
      .collect().map(_.getLong(0)).sorted
    assert(typed.toSeq == untyped.toSeq && typed.nonEmpty)
  }

  test("groupByKey typed aggregation equals groupBy") {
    val s = spark
    import s.implicits._
    val typed = lineitem.groupByKey(_.l_returnflag)
      .agg(sum($"l_quantity").as[Double], count(lit(1)).as[Long])
      .collect().map { case (k, q, n) => (k, math.round(q * 10000), n) }
      .sortBy(_._1)
    val untyped = graft.queries.Tables.t(spark, Sf0001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 10000), r.getLong(2)))
      .sortBy(_._1)
    assert(typed.toSeq == untyped.toSeq)
  }

  test("typed joinWith yields typed pairs consistent with the untyped join") {
    val s = spark
    import s.implicits._
    val orders = graft.queries.Tables.t(spark, Sf0001, "orders")
      .select(col("o_orderkey").as("ok")).as[Long]
    val pairs = lineitem.joinWith(orders, lineitem("l_orderkey") === orders("ok"))
    val n = pairs.count()
    val untypedN = graft.queries.Tables.t(spark, Sf0001, "lineitem")
      .join(graft.queries.Tables.t(spark, Sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(n == untypedN && n > 0)
  }
}
