package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions
import graft.operators.{Ivf, Pq}
import graft.queries.{Tables, VectorOps}

/** ANN recall/latency at 10× fixture scale (r8 verdict task 2): expands
  * the sf0.1 embeddings (2 000 × 64-d unit vectors) into a deterministic
  * 20 000-vector near-duplicate cloud via [[VectorOps.expandEmbeddings]],
  * then measures recall@5 and wall time of each approximate path —
  * LSH / IVF / PQ at two pruning settings each, plus the r13 NN-Descent
  * graph index (fixed vs routed entries; [[graft.tools.NndHard]] sweeps
  * the heavy-build/wide-beam graph regime separately) — against the
  * brute-force top-5 truth. Prints one JSON line per (method, setting)
  * plus a summary line for BASELINE.md.
  *
  * Usage: scripts/run.sh graft.tools.AnnScale [sfDir] [factor] [noise]
  *
  * `noise` (default 0.05) sets the near-duplicate jitter: 0.05 is the
  * easy regime (recall saturates at the probe ceiling for every coding),
  * 0.3 the hard regime where quantization error is the bottleneck and
  * residual (IVFADC) coding separates from plain PQ.
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val noise = if (args.length > 2) args(2).toDouble else 0.05
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.t(spark, sfDir, "embeddings")
    val corpus = VectorOps.expandEmbeddings(emb, factor, noise = noise)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val n = corpus.count()
    val base = corpus.select(col("vec_id"), col("embedding"),
      VectorExpressions.dotProduct(col("embedding"), col("embedding")).as("n2"))
      .localCheckpoint(true)
    // queries: the unjittered copy-0 rows of the 100 lowest parents — a
    // realistic search batch, large enough that per-query pruning (not
    // per-job overhead) dominates the latency comparison
    val qPred = col("vec_id") % factor === 0 && col("vec_id") < 100L * factor
    val queries = base.filter(qPred).localCheckpoint(true)
    val nq = queries.count()

    def pairs(df: DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
        .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }

    def timed(label: String)(f: => DataFrame): (Map[Long, Set[Long]], Double) = {
      val t0 = System.nanoTime()
      val p = pairs(f)
      (p, (System.nanoTime() - t0) / 1e9)
    }

    val (truth, tBrute) = timed("brute")(VectorOps.knn(corpus, queries, 5))
    def recall(got: Map[Long, Set[Long]]): Double = {
      val hits = truth.toSeq.map { case (q, t) =>
        t.count(got.getOrElse(q, Set.empty).contains) }.sum
      hits.toDouble / truth.values.map(_.size).sum
    }

    // one-time model builds, reported separately from per-search latency
    val tc0 = System.nanoTime()
    val cents = Ivf.train(base, k = 64, iters = 2).localCheckpoint(true)
    val tCents = (System.nanoTime() - tc0) / 1e9
    val tb0 = System.nanoTime()
    val books = Pq.train(base, m = 8, ks = 16, iters = 2).localCheckpoint(true)
    val tBooks = (System.nanoTime() - tb0) / 1e9
    // the r13 q_knn_pq knob family (ks=64): 4× codebook entries per
    // subspace — quantization error drops, the ADC LUT stays tiny
    // (m·ks = 512 doubles/query)
    val tb640 = System.nanoTime()
    val books64 = Pq.train(base, m = 8, ks = 64, iters = 2).localCheckpoint(true)
    val tBooks64 = (System.nanoTime() - tb640) / 1e9

    // graph index (r13): NN-Descent build is the one-time model here;
    // routed search re-derives the entry assignment per batch (the
    // in-memory posture — the persisted form reads it from the index)
    val tg0 = System.nanoTime()
    val graph = graft.operators.NnDescent
      .buildGraph(base, k = 10, iters = 2, cells = 64)
      .localCheckpoint(true)
    val tGraph = (System.nanoTime() - tg0) / 1e9

    val runs = Seq(
      ("graph_fixed_e8_b20h3", () => graft.operators.NnDescent
        .searchGraph(base, graph, queries, k = 5, beam = 20, hops = 3)),
      ("graph_routed_np4h8_b20h3", () => graft.operators.NnDescent
        .searchGraphRouted(base, graph, queries, k = 5, beam = 20,
          hops = 3, cells = 64, nprobe = 4, hubsPerCell = 8)),
      ("graph_routed_np8h16_b30h4", () => graft.operators.NnDescent
        .searchGraphRouted(base, graph, queries, k = 5, beam = 30,
          hops = 4, cells = 64, nprobe = 8, hubsPerCell = 16)),
      ("lsh_p16b8", () => VectorOps.knnLshAt(corpus, queries, 5,
        numPlanes = 16, bands = 8)),
      ("lsh_derived", () => VectorOps.knnLshAt(corpus, queries, 5)),
      ("lsh_p32b16", () => VectorOps.knnLshAt(corpus, queries, 5,
        numPlanes = 32, bands = 16)),
      ("ivf_np4", () => Ivf.search(base, cents, qPred, k = 5, nprobe = 4)),
      ("ivf_np8", () => Ivf.search(base, cents, qPred, k = 5, nprobe = 8)),
      ("pq_s50", () => Pq.search(base, books, queries, k = 5,
        shortlist = 50, m = 8)),
      ("pq_s200", () => Pq.search(base, books, queries, k = 5,
        shortlist = 200, m = 8)),
      ("pq_ks64_s50", () => Pq.search(base, books64, queries, k = 5,
        shortlist = 50, m = 8)),
      ("pq_ks64_s100", () => Pq.search(base, books64, queries, k = 5,
        shortlist = 100, m = 8)))

    // the materialized IVF-PQ index path: ADC over probed cells only
    val idxDir = java.nio.file.Files.createTempDirectory("annscale_ivfpq").toString
    val ti0 = System.nanoTime()
    Pq.writeIndex(base, cents, books, idxDir, m = 8)
    val tIdx = (System.nanoTime() - ti0) / 1e9
    // residual-encoded twin (IVFADC): same centroids, codebooks trained
    // on x − c(cell). Tight-shortlist rows for BOTH codings expose where
    // residual pays (hard regime) and where both saturate (easy regime).
    val resDir = java.nio.file.Files.createTempDirectory("annscale_res").toString
    val tr0 = System.nanoTime()
    Pq.writeIndexResidual(base, cents, resDir, m = 8, ks = 16, iters = 2)
    val tRes = (System.nanoTime() - tr0) / 1e9
    val idxRuns = Seq(
      ("ivfpq_np4_s50", () => Pq.searchIndex(spark, idxDir, queries, k = 5,
        nprobe = 4, shortlist = 50, m = 8)),
      ("ivfpq_np8_s200", () => Pq.searchIndex(spark, idxDir, queries, k = 5,
        nprobe = 8, shortlist = 200, m = 8)),
      ("ivfpq_np8_s10", () => Pq.searchIndex(spark, idxDir, queries, k = 5,
        nprobe = 8, shortlist = 10, m = 8)),
      ("ivfpqres_np8_s10", () => Pq.searchIndexResidual(spark, resDir,
        queries, k = 5, nprobe = 8, shortlist = 10, m = 8)),
      ("ivfpqres_np8_s200", () => Pq.searchIndexResidual(spark, resDir,
        queries, k = 5, nprobe = 8, shortlist = 200, m = 8)))

    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"corpus":$n,"queries":$nq,"noise":$noise,"brute_s":${f(tBrute)},"ivf_train_s":${f(tCents)},"pq_train_s":${f(tBooks)},"pq_train_ks64_s":${f(tBooks64)},"ivfpq_index_s":${f(tIdx)},"ivfpqres_index_s":${f(tRes)},"graph_build_s":${f(tGraph)}}""")
    (runs ++ idxRuns).foreach { case (name, run) =>
      val (got, secs) = timed(name)(run())
      println(s"""{"method":"$name","recall_at_5":${f(recall(got))},"search_s":${f(secs)}}""")
    }
    spark.stop()
  }
}
