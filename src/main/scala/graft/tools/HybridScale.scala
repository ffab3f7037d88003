package graft.tools

import org.apache.spark.sql.functions._

/** Offline measurement: exact vs routed hybrid retrieval
  * ([[graft.queries.TextOps.searchHybridOn]] /
  * [[graft.queries.TextOps.searchHybridRouted]]) as the EMBEDDING
  * corpus grows — the claim under test is that the routed form's
  * semantic side is index-probe-shaped (per-query work bounded by
  * beam×hops×degree) while the exact form re-scans every vector per
  * query. The corpus expands via the seeded near-dup cloud generator
  * ([[graft.queries.VectorOps.expandEmbeddings]], the ANN-harness
  * workload shape); the lexical side is IDENTICAL in both forms, so
  * the wall delta isolates the semantic backend. Prints
  * `HYBRID <n_vecs> <form> <sec> <overlap>/20` per corpus (overlap =
  * fused top-20 agreement with the exact form — the LawsSpec law at
  * growing scale); the one-time index build is priced on its own line,
  * NOT inside the search walls (a persisted index is built once and
  * probed forever — the bench-vs-lifecycle distinction BASELINE.md
  * documents for q_knn_graph).
  *
  * Usage: scripts/run.sh graft.tools.HybridScale [factors...]
  * (default 1 8 32; SFD overrides the sf dir)
  */
object HybridScale {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val dir = sys.env.getOrElse("SFD", "/root/testdata/sf0.1")
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 8, 32)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    for (f <- factors) {
      val embs = (if (f == 1) base
        else graft.queries.VectorOps.expandEmbeddings(base, f, noise = 0.05)
          .select(col("vec_id"), col("embedding")))
        .localCheckpoint(true)
      val n = embs.count()
      val idx = java.nio.file.Files.createTempDirectory("hybscale").toString
      try {
        val withN2 = embs.select(col("vec_id"), col("embedding"),
          org.apache.spark.sql.graft.VectorExpressions
            .dotProduct(col("embedding"), col("embedding")).as("n2"))
        // geometry scales with the corpus (the r14 fixed-budget lesson,
        // now the SHIPPED writeIndex default — r16 Ivf.defaultCells):
        // the harness exercises the default so it validates what a
        // caller actually gets, and prints the derived count
        val cells = graft.operators.Ivf.defaultCells(n)
        val (_, tBuild) = timed(graft.operators.NnDescent
          .writeIndex(withN2, idx, k = 10, iters = 2))
        println(f"HYBRID $n build($cells cells, derived default) $tBuild%.2f s")
        val (exact, tExact) = timed(
          graft.queries.TextOps.searchHybridOn(docs, embs).collect())
        println(f"HYBRID $n exact $tExact%.2f s 20/20")
        for (np <- Seq(3, 8)) {
          val (routed, tRouted) = timed(graft.queries.TextOps
            .searchHybridRouted(spark, docs, embs, idx, hops = 4,
              nprobe = np).collect())
          val overlap = routed.map(_.getLong(0)).toSet
            .intersect(exact.map(_.getLong(0)).toSet).size
          println(f"HYBRID $n routed(np=$np) $tRouted%.2f s $overlap/20")
        }
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(idx))
    }
    spark.stop()
  }
}
