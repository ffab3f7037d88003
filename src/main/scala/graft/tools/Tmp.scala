package graft.tools
import org.apache.spark.sql.functions._
object Tmp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val b = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val emb = b.filter(col("vec_id") < 5)
      .unionByName(graft.queries.VectorOps.expandEmbeddings(
          b.filter(col("vec_id") >= 5).repartition(32), 600, 0.08)
        .select((col("vec_id") + 5).as("vec_id"), col("embedding")))
      .localCheckpoint(true)
    println("corpus=" + emb.count())
    val before = graft.operators.BandedHamming.droppedHotBucketRows.get()
    val q = emb.filter(col("vec_id") < 5)
    val bf = graft.queries.VectorOps.knn(emb, q, 5)
      .select(col("q_id"), col("vec_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    for ((p, bn) <- Seq((48, 8), (56, 8), (64, 8), (96, 16), (40, 8))) {
      val t0 = System.nanoTime()
      val got = graft.queries.VectorOps.knnLshAt(emb, q, 5,
          numPlanes = p, bands = bn, maxBucket = 100000)
        .select(col("q_id"), col("vec_id")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      println(f"GRID1M planes=$p bands=$bn recall=${(got intersect bf).size / 25.0}%.2f ${(System.nanoTime()-t0)/1e9}%.1f s dropped=${graft.operators.BandedHamming.droppedHotBucketRows.get() - before}")
    }
    spark.stop()
  }
}
