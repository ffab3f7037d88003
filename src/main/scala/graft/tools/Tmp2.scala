package graft.tools
import org.apache.spark.sql.functions._
object Tmp2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val b = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // CLUSTERED workload (the expander doc's "near-duplicate cloud, the
    // workload shape ANN/dedup sees in a real crawl corpus"): everything
    // expanded 600x; queries are five jittered members whose true top-5
    // are twin siblings at cosine ~0.97
    val emb = graft.queries.VectorOps.expandEmbeddings(
        b.repartition(32), 600, 0.08)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    println("corpus=" + emb.count())
    val q = emb.filter(col("vec_id").isin(601L, 1201L, 1801L, 2401L, 3001L))
      .localCheckpoint(true)
    val bf = graft.queries.VectorOps.knn(emb, q, 5)
      .select(col("q_id"), col("vec_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val before = graft.operators.BandedHamming.droppedHotBucketRows.get()
    for ((p, bn) <- Seq((48, 8), (16, 8))) {
      val t0 = System.nanoTime()
      val got = graft.queries.VectorOps.knnLshAt(emb, q, 5,
          numPlanes = p, bands = bn, maxBucket = 100000)
        .select(col("q_id"), col("vec_id")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      println(f"CLUST1M planes=$p bands=$bn recall=${(got intersect bf).size / 25.0}%.2f ${(System.nanoTime()-t0)/1e9}%.1f s dropped=${graft.operators.BandedHamming.droppedHotBucketRows.get() - before}")
    }
    spark.stop()
  }
}
