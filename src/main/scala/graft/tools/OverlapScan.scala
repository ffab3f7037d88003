package graft.tools

import graft.queries.{Tables, TextOps}

/** Measure the materialize-once engine default of
  * [[graft.queries.TextOps.sourceOverlapOn]] /
  * [[graft.queries.TextOps.noveltyCurveOn]] against the contract rows'
  * stateless plans (which re-run the corpus window explode 3×/2× —
  * PLANS.md honest-cost note). Feeds the BASELINE.md OverlapScan table.
  *
  * Usage: sbt "runMain graft.tools.OverlapScan"  (SFD env overrides the
  * default sf0.1 fixture dir). Two rounds; read the second (warm).
  */
object OverlapScan {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SFD", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.t(spark, sf, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    for (round <- 1 to 2) {
      time(s"overlap_stateless_r$round")(
        TextOps.sourceOverlapOn(docs, materialize = false).count())
      time(s"overlap_materialized_r$round")(
        TextOps.sourceOverlapOn(docs).count())
      time(s"novelty_stateless_r$round")(
        TextOps.noveltyCurveOn(docs, materialize = false).count())
      time(s"novelty_materialized_r$round")(
        TextOps.noveltyCurveOn(docs).count())
    }
    spark.stop()
  }
}
