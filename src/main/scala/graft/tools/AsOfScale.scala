package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.{Tables, VectorOps}

/** Measures the as-of snapshot-read law at scale: the cost of an as-of
  * probe must be proportional to the SNAPSHOT (the history prefix's
  * batches), not to the live index. Builds a cosine index from the
  * sf0.1 embeddings expanded `factor`× (default 10× → 20 000 vectors),
  * admitted as 1 init + `nBatches−1` appends of equal size, then times
  * `cosineDeltaIndexedAsOf` of a fixed 200-vector probe batch at
  * prefix 1, prefix nBatches/2, prefix nBatches, and the plain live
  * read. Prints one JSON line per measurement for BASELINE.md.
  *
  * Usage: scripts/run.sh graft.tools.AsOfScale [sfDir] [factor] [nBatches]
  */
object AsOfScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val nBatches = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = VectorOps.expandEmbeddings(
      Tables.t(spark, sfDir, "embeddings"), factor, noise = 0.05)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    require(nBatches >= 4, "need >= 4 batches for the prefix sweep")
    // a fixed probe batch with ids disjoint from the corpus
    val probes = corpus.limit(200)
      .select((col("vec_id") + lit(10000000L)).as("vec_id"),
        col("embedding"))
      .localCheckpoint(true)

    val idx = java.nio.file.Files.createTempDirectory("asof_scale").toString
    def slice(i: Int) = corpus
      .filter(pmod(xxhash64(col("vec_id")), lit(nBatches)) === i)
    VectorOps.writeCosineIndex(slice(0), idx)
    (1 until nBatches).foreach(i =>
      VectorOps.appendCosineIndex(slice(i), idx, f"t$i%02d"))

    def time[A](what: String)(f: => A): Unit = {
      f // warm (plans, code gen)
      val t0 = System.nanoTime()
      f
      println(s"""{"probe":"$what","sec":${(System.nanoTime() - t0) / 1e9}}""")
    }
    def asOfCount(tag: String): Long =
      VectorOps.cosineDeltaIndexedAsOf(spark, idx, probes, 0.8,
        asOf = tag).count()
    time(s"asof_prefix_1_of_$nBatches")(asOfCount("init"))
    time(s"asof_prefix_half")(asOfCount(f"t${nBatches / 2 - 1}%02d"))
    time(s"asof_prefix_full")(asOfCount(f"t${nBatches - 1}%02d"))
    time("live_read")(
      VectorOps.cosineDeltaIndexed(spark, idx, probes, 0.8).count())
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(idx))
    spark.stop()
  }
}
