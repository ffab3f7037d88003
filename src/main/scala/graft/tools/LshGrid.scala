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
    // above-tier corpora via the deterministic expander: 50k×4 = 200k
    // and 50k×24 = 1.2M vectors — the 2¹⁶..2²⁰ (16×8) tier and the
    // first derived row past it (24×8), measured rather than asserted
    val sizes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "sf0.001" -> (() => spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")),
      "sf0.01" -> (() => spark.read
        .parquet("/root/testdata/sf0.01/embeddings.parquet")),
      "sf0.1" -> (() => spark.read
        .parquet("/root/testdata/sf0.1/embeddings.parquet")),
      // the queries (vec_id < 5) stay UNEXPANDED: expanding them too
      // surrounds each query with jittered twins at near-identical
      // distances and every banding scores the same tie-limited recall
      // (measured first — 0.88/0.68 across ALL configs at ×4/×24); the
      // split form measures banding against independent-ish neighbors
      "sf0.1x4" -> (() => {
        val b = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        b.filter(col("vec_id") < 5)
          .unionByName(graft.queries.VectorOps.expandEmbeddings(
              b.filter(col("vec_id") >= 5), 4, 0.08)
            .select((col("vec_id") + 5).as("vec_id"), col("embedding")))
      }),
      "sf0.1x24" -> (() => {
        val b = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        b.filter(col("vec_id") < 5)
          .unionByName(graft.queries.VectorOps.expandEmbeddings(
              b.filter(col("vec_id") >= 5), 24, 0.08)
            .select((col("vec_id") + 5).as("vec_id"), col("embedding")))
      }))
    for ((sf, mk) <- sizes) {
      val emb = mk()
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val q = emb.filter(col("vec_id") < 5)
      val bf = graft.queries.VectorOps.knn(emb, q, 5)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val grid = if (sf.contains("x")) Seq((16, 16), (16, 8), (24, 8),
        (40, 8), (48, 8))
        else Seq((16, 16), (16, 8), (24, 12), (24, 8), (32, 16), (32, 8))
      for ((p, b) <- grid; cap <- Seq(100000, Int.MaxValue)) {
        val t0 = System.nanoTime()
        val got = graft.queries.VectorOps.knnLshAt(emb, q, 5,
            numPlanes = p, bands = b, maxBucket = cap)
          .select(col("q_id"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = (got intersect bf).size.toDouble / bf.size
        val capS = if (cap == Int.MaxValue) "uncapped" else "cap100k"
        println(f"LSHGRID $sf planes=$p bands=$b $capS recall@5=$rec%.3f ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
