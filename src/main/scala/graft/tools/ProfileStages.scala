package graft.queries

import org.apache.spark.sql.SparkSession

/** Stage-level timing probe for the slow bench queries — attributes a
  * composed pipeline's wall-clock to its memoized stages by forcing them
  * in order on a fresh session (each later line pays only its own
  * incremental cost, exactly as Bench does across queries). Not part of
  * the contract; a local perf tool.
  *
  * Usage: scripts/run.sh graft.queries.ProfileStages [sfDir]
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }

    val docs = Tables.t(spark, sfDir, "documents")
    time("documents.count")(docs.count())
    time("shingle+pairs (jaccard)")(TextOps.neardupJaccard(spark, sfDir).count())
    time("cluster labels (CC)")(TextOps.dedupCluster(spark, sfDir).count())
    time("curate (reasons+order)")(TextOps.curate(spark, sfDir).count())
    time("curate_delta (anti-join)")(TextOps.curateDelta(spark, sfDir).count())
    spark.stop()
  }
}
