package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions
import graft.operators.NnDescent
import graft.queries.{Tables, VectorOps}

/** Graph-index scale harness on the HARD expanded regime (noise 0.3 —
  * neighbors barely closer than strangers): build-knob × search-budget
  * sweep at `factor`× the sf0.1 embeddings, recall@5 vs brute force.
  * Source of the BASELINE.md r13 graph tables (10×: 0.938 vs the IVF
  * np8 probe ceiling 0.706; 100× dup-dense: 0.608 vs IVF 0.784 — the
  * crossover behind DEPLOY.md's multiplicity-vs-beam regime rule).
  *
  * Usage: sbt "runMain graft.tools.NndHard [factor]"
  */
object NndHard {
  def main(args: Array[String]): Unit = {
    val factor = if (args.length > 0) args(0).toInt else 10
    val noise = if (args.length > 1) args(1).toDouble else 0.3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.t(spark, "/root/testdata/sf0.1", "embeddings")
    val corpus = VectorOps.expandEmbeddings(emb, factor, noise = noise)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val base = corpus.select(col("vec_id"), col("embedding"),
      VectorExpressions.dotProduct(col("embedding"), col("embedding")).as("n2"))
      .localCheckpoint(true)
    val qPred = col("vec_id") % factor === 0 && col("vec_id") < 100L * factor
    val queries = base.filter(qPred).localCheckpoint(true)
    val truth = VectorOps.knn(corpus, queries.select(col("vec_id"), col("embedding")), 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def rec(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.count(got.contains).toDouble / truth.size
    }
    // cluster-collapse path (VectorOps.knnViaReps): semantic-dedup
    // labels are the one-time model; rep search runs at cluster scale
    val tl0 = System.nanoTime()
    val labels = VectorOps.semanticClustersLshOn(
        corpus.select(col("vec_id"), col("embedding")), 0.9,
        numPlanes = 64, bands = 4)
      .select(col("vec_id"), col("rep")).localCheckpoint(true)
    val nReps = labels.select(countDistinct(col("rep"))).head.getLong(0)
    println(f"labels ${(System.nanoTime()-tl0)/1e9}%.1f s  reps=$nReps")
    for (m <- Seq(4, 8)) {
      val t1 = System.nanoTime()
      val r = rec(VectorOps.knnViaReps(base, queries, 5, m, labels,
        (reps, qs) => VectorOps.knn(
          reps.select(col("vec_id"), col("embedding")),
          qs.select(col("vec_id"), col("embedding")), m)))
      println(f"  collapse_brute m=$m  recall=$r%.3f  ${(System.nanoTime()-t1)/1e9}%.1f s")
    }

    for ((iters, cap, rand) <- Seq((2, 90, 40), (4, 150, 80))) {
      val t0 = System.nanoTime()
      val g = NnDescent.buildGraph(base, k = 10, iters = iters, cells = 64,
        candCap = cap, randPerRound = rand).localCheckpoint(true)
      println(f"corpus=${base.count()}"); println(f"build iters=$iters cap=$cap rand=$rand  ${(System.nanoTime()-t0)/1e9}%.1f s")
      for ((beam, hops, np, hubs) <- Seq((30, 4, 8, 16), (60, 5, 8, 16), (120, 6, 12, 24))) {
        val t1 = System.nanoTime()
        val r = rec(NnDescent.searchGraphRouted(base, g, queries, 5, beam,
          hops, cells = 64, nprobe = np, hubsPerCell = hubs))
        println(f"  beam=$beam hops=$hops np=$np hubs=$hubs  recall=$r%.3f  ${(System.nanoTime()-t1)/1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
