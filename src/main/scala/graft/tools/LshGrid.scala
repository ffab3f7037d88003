package graft.tools
import org.apache.spark.sql.functions._

/** Measured (numPlanes, bands) grid for knnLshAt across the 3 SFs —
  * the r17 evidence behind the derived banding default (BASELINE.md).
  */
object LshGrid {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val q = emb.filter(col("vec_id") < 5)
      val bf = graft.queries.VectorOps.knn(emb, q, 5)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((p, b) <- Seq((16, 16), (16, 8), (24, 12), (24, 8), (32, 16),
          (32, 8))) {
        val t0 = System.nanoTime()
        val got = graft.queries.VectorOps.knnLshAt(emb, q, 5,
            numPlanes = p, bands = b)
          .select(col("q_id"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = (got intersect bf).size.toDouble / bf.size
        println(f"LSHGRID $sf planes=$p bands=$b recall@5=$rec%.3f ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
