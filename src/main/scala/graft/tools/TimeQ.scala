package graft.tools

/** Time individual contract queries outside the full bench: warm one
  * session, run each named query once, print `TIME <name> <sec>`.
  *
  * Usage: sbt "runMain graft.tools.TimeQ q_curate,q_knn_pq"  (SFD env
  * overrides the default sf0.1 fixture dir). Complements Explain.scala
  * (plan of one query) and Bench.scala (the full driver-shaped run).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: TimeQ <q_name>[,<q_name>...]   (SFD env overrides sf dir)")
      sys.exit(2)
    }
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    var failed = false
    for (q <- args(0).split(",")) {
      graft.SparkEntry.queries.get(q) match {
        case None =>
          System.err.println(s"unknown query '$q' — names are SparkEntry.queries keys")
          failed = true
        case Some(fn) =>
          val t0 = System.nanoTime()
          fn(spark, sys.env.getOrElse("SFD", "/root/testdata/sf0.1")).count()
          println(f"TIME $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
