package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object NndTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val b = graft.queries.VectorOps.expandEmbeddings(raw, 4, 0.05)
      .select(col("vec_id"), col("embedding"),
        org.apache.spark.sql.graft.VectorExpressions.dotProduct(col("embedding"), col("embedding")).as("n2"))
      .localCheckpoint(true)
    val ideal = graft.queries.VectorOps.knn(
      b.select(col("vec_id"), col("embedding")),
      b.select(col("vec_id"), col("embedding")), 10)
      .agg(avg(col("cos"))).head.getDouble(0)
    println(s"ideal mean deg-10 sim: $ideal")
    val queries = b.filter(col("vec_id") % 4 === 0 && col("vec_id") < 80)
    val truth = graft.queries.VectorOps.knn(
      b.select(col("vec_id"), col("embedding")),
      queries.select(col("vec_id"), col("embedding")), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // true sibling pairs: cos >= 0.9 (the near-dup cloud structure)
    val sib = graft.queries.VectorOps.neardupCosineAt(
      b.select(col("vec_id"), col("embedding")), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"sibling pairs: ${sib.size}")
    val true10 = graft.queries.VectorOps.knn(
      b.select(col("vec_id"), col("embedding")),
      b.select(col("vec_id"), col("embedding")), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((iters, cap) <- Seq((2, 30), (4, 60))) {
      // cells PINNED at 16: every recorded tuning series (BASELINE.md
      // r13) was built at 16-cell ring init — the r16 derived default
      // would silently re-grain the series and misattribute the shift
      val g = graft.operators.NnDescent.buildGraph(b, k = 10, iters = iters,
          cells = 16, candCap = cap)
        .localCheckpoint(true)
      val gset = g.select(col("src"), col("dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val edgeRec = true10.count(gset.contains).toDouble / true10.size
      println(f"graph iters=$iters cap=$cap edgeRecall@10=$edgeRec%.3f")
      for ((beam, hops, entries) <- Seq((20,3,8),(40,6,64))) {
        val got = graft.operators.NnDescent.searchGraph(b, g, queries, 5, beam, hops, entries)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = truth.count(got.contains).toDouble / truth.size
        println(f"  FIXED  beam=$beam hops=$hops entries=$entries recall@5=$rec%.3f")
      }
      for ((beam, hops, nprobe, hubs) <- Seq((20,3,3,8),(30,4,3,8),(30,4,4,16),(40,6,4,16))) {
        val t0 = System.nanoTime()
        val got = graft.operators.NnDescent.searchGraphRouted(b, g, queries, 5, beam, hops,
            cells = 16, nprobe = nprobe, hubsPerCell = hubs)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = truth.count(got.contains).toDouble / truth.size
        println(f"  ROUTED beam=$beam hops=$hops nprobe=$nprobe hubs=$hubs recall@5=$rec%.3f  ${(System.nanoTime()-t0)/1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
