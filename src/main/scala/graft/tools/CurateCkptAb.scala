package graft.tools

import org.apache.spark.sql.SparkSession

/** Alternated A/B for the stage-3 trunk materialization in the curate
  * variants (OPTIMIZATION_r18.md §7): times q_curate_containment and
  * q_curate_semantic with the [[graft.operators.Materialize]] posture
  * (`spark.graft.materialize` local vs lazy — r19; this A/B toggled the
  * per-site ckptStage3 hatch before the knobs were unified) toggled per
  * repetition in ONE session (bench session shape: local[32], 32
  * shuffle partitions), after warming the shared label memos so both
  * variants price only their own pipeline. Alternation inside one
  * process is the repo's host-noise discipline — a roving stall hits
  * both arms equally across rounds.
  */
object CurateCkptAb {
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
    // shared memos both arms ride (bench warm rows): jaccard labels +
    // cosine clusters — built once, outside the timed region
    graft.queries.TextOps.dedupCluster(spark, sfDir).count()
    graft.queries.VectorOps.dedupClusterCosine(spark, sfDir).count()
    def run(name: String, f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $name%-34s $s%7.3f s (rows=$n)")
      s
    }
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    for (r <- 1 to rounds; ckpt <- Seq(false, true)) {
      spark.conf.set(graft.operators.Materialize.ConfKey,
        if (ckpt) "local" else "lazy")
      run(s"r$r ckpt=$ckpt q_curate_containment",
        graft.queries.TextOps.curateContainment(spark, sfDir).count())
      run(s"r$r ckpt=$ckpt q_curate_semantic",
        graft.queries.TextOps.curateSemantic(spark, sfDir).count())
    }
    spark.conf.unset(graft.operators.Materialize.ConfKey)
    spark.stop()
  }
}
