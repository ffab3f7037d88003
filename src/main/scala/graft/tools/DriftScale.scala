package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions
import graft.operators.NnDescent
import graft.queries.{Tables, VectorOps}

/** Graph-drift observability at scale (r14): measures the
  * [[NnDescent.edgeStaleness]] probe's VALUE separation (benign vs
  * blind appends) and its COST against corpus size, on the hard
  * expanded regime (noise 0.3). The claims under test:
  *
  *  - a benign append (fresh jitters of parents the index already
  *    serves — every new vector's true neighborhood is in the graph at
  *    insert time) reads staleness ≈ 0 and is NOT flagged;
  *  - a blind append (whole new cloud families in ONE batch — no
  *    member can propose a same-batch sibling) reads a clearly
  *    separated staleness and IS flagged via the staleness input;
  *  - the probe costs one corpus pass with a 256-row broadcast side —
  *    timing should scale ~linearly with corpus size, far below a
  *    rebuild.
  *
  * Usage: sbt "runMain graft.tools.DriftScale [factor]"   (default 10)
  */
object DriftScale {
  def main(args: Array[String]): Unit = {
    val factor = if (args.length > 0) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.t(spark, "/root/testdata/sf0.1", "embeddings")
    def withN2(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("embedding"),
        VectorExpressions.dotProduct(col("embedding"), col("embedding")).as("n2"))
    val corpus = VectorOps.expandEmbeddings(emb, factor, noise = 0.3)
      .localCheckpoint(true)
    // init: clouds of parents >= 500 (4/5 of the corpus at sf0.1's 5000
    // parents); blind append: parents < 500's clouds, ONE batch
    val init = withN2(corpus.filter(col("parent") >= 500)).localCheckpoint(true)
    val blind = withN2(corpus.filter(col("parent") < 500)).localCheckpoint(true)
    // benign append: fresh jitters (new copy index) of ALREADY-SERVED
    // parents — true neighbors in the graph at insert time
    val benign = withN2(VectorOps.expandEmbeddings(
        emb.filter(col("vec_id") >= 1000), factor = 2, noise = 0.3, seed = 77L)
      .filter(col("copy") === 1) // copy 0 is the UNjittered original
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")))
      .localCheckpoint(true)
    println(s"corpus=${corpus.count()} init=${init.count()} " +
      s"blind=${blind.count()} benign=${benign.count()}")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    def stalenessOf(dir: String): (Long, Double, Double, Double) = {
      val r = NnDescent.edgeStaleness(spark, dir).collect().head
      (r.getAs[Long]("n_appended_sampled"),
        r.getAs[Double]("stored_top1_mean"),
        r.getAs[Double]("exact_top1_mean"), r.getAs[Double]("staleness"))
    }

    // ---- benign append path
    val dirB = java.nio.file.Files.createTempDirectory("drift_benign").toString
    t("build (benign path)") {
      NnDescent.writeIndex(init.unionByName(blind).localCheckpoint(true),
        dirB, k = 10, iters = 2, cells = 64)
    }
    t("append benign") { NnDescent.appendIndex(spark, benign, dirB, "a1", k = 10) }
    val sB = t("edgeStaleness (benign)") { stalenessOf(dirB) }
    println(f"benign: n=${sB._1} stored=${sB._2}%.3f exact=${sB._3}%.3f " +
      f"staleness=${sB._4}%.3f")
    val vB = NnDescent.driftSummary(spark, dirB, growthMax = 1e9,
      residRatioMax = 1e9).head.getAs[Boolean]("rebuild_recommended")
    println(s"benign flagged (staleness-only thresholds): $vB")

    // ---- blind append path
    val dirX = java.nio.file.Files.createTempDirectory("drift_blind").toString
    t("build (blind path)") {
      NnDescent.writeIndex(init, dirX, k = 10, iters = 2, cells = 64)
    }
    t("append blind") { NnDescent.appendIndex(spark, blind, dirX, "a1", k = 10) }
    val sX = t("edgeStaleness (blind)") { stalenessOf(dirX) }
    println(f"blind:  n=${sX._1} stored=${sX._2}%.3f exact=${sX._3}%.3f " +
      f"staleness=${sX._4}%.3f")
    val vX = NnDescent.driftSummary(spark, dirX, growthMax = 1e9,
      residRatioMax = 1e9).head.getAs[Boolean]("rebuild_recommended")
    println(s"blind flagged (staleness-only thresholds): $vX")

    Seq(dirB, dirX).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    spark.stop()
  }
}
