package graft.tools

import org.apache.spark.sql.SparkSession
import graft.extract.Multimodal

/** Hash-kind media index at ingest scale (r15): the [[MediaScale]]
  * twin for the image/audio (banded 64-bit fingerprint) family, driving
  * [[Multimodal.mediaHashDelta]] batch by batch with synthetic
  * fingerprints — no decode, so the measurement isolates exactly what
  * the r15 radius-1 multi-probe changed: the banded probe + admit
  * machinery against a growing stored corpus.
  *
  * Dups are RE-ENCODES, not byte copies: a planted dup's hash is its
  * original's hash with 4–6 random bit flips spread anywhere in the 64
  * bits. The pre-multi-probe exact-band join provably missed every
  * spread whose flips straddle all four bands (MultimodalSpec pins one);
  * with multi-probe the 6-bit radius is a pigeonhole GUARANTEE, so the
  * harness asserts recall through growth, per batch.
  *
  * What the 100 TB story claims and this measures: per-batch probe cost
  * tracks the BATCH (decode-free here, so pure candidate machinery),
  * not the stored corpus — the corpus side contributes its 4 exact
  * postings per stored hash to bucket-keyed shuffles only for PROBED
  * buckets.
  *
  * Usage: scripts/run.sh graft.tools.MediaHashScale [batches] [perBatch] [dupRate]
  */
object MediaHashScale {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.length > 0) args(0).toInt else 8
    val perBatch = if (args.length > 1) args(1).toInt else 20000
    val dupRate = if (args.length > 2) args(2).toDouble else 0.1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val idx = java.nio.file.Files.createTempDirectory("media_hash_scale").toString
    // deterministic splitmix-style hash per (batch, i) — uniform 64-bit
    def baseHash(b: Int, i: Int): Long = {
      var z = b.toLong * 1000003L + i + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    try {
      var totalRows = 0
      val times = Array.newBuilder[Double]
      var lastRecall = 1.0
      (0 until nBatches).foreach { b =>
        val rb = new scala.util.Random(b * 104729L + 17)
        val rows = (0 until perBatch).map { i =>
          val isDup = b > 0 && rb.nextDouble() < dupRate
          if (isDup) {
            // originals from batch 0 only (the MediaScale accounting
            // lesson: a dup-of-dup's stored hash differs from the
            // generator formula)
            val oi = rb.nextInt(perBatch)
            // re-encode: 4-6 flips at DISTINCT random positions — free
            // to straddle all four bands, the exact-band blind spot
            val h = 4 + rb.nextInt(3)
            val bits = rb.shuffle((0 until 64).toList).take(h)
            val mask = bits.foldLeft(0L)((m, p) => m | (1L << p))
            (s"m_${b}_$i", baseHash(0, oi) ^ mask, s"m_0_$oi")
          } else (s"m_${b}_$i", baseHash(b, i), null)
        }
        val planted = rows.collect { case (id, _, orig) if orig != null =>
          (id, orig) }.toSet
        val df = rows.map(t => (t._1, t._2)).toDF("med_id", "ahash")
          .repartition(cpus.toInt).localCheckpoint(true)
        val t0 = System.nanoTime()
        val pairs = Multimodal.mediaHashDelta(spark, idx, df, s"b$b", "image")
          .select("id1", "id2", "cross").collect()
        val secs = (System.nanoTime() - t0) / 1e9
        val crossFound = pairs.collect {
          case r if r.getBoolean(2) => (r.getString(0), r.getString(1)) }.toSet
        val found = planted.count { case (d, o) => crossFound.contains((d, o)) }
        val recall = if (planted.isEmpty) 1.0 else found.toDouble / planted.size
        totalRows += perBatch
        times += secs
        lastRecall = recall
        println(f"""{"batch":$b,"corpus_hashes":$totalRows,"delta_s":$secs%.2f,""" +
          f""""cross_pairs":${crossFound.size},"planted":${planted.size},""" +
          f""""found":$found,"recall":$recall%.3f}""")
      }
      val ts = times.result()
      println(f"""{"summary":"hash-media ingest scale (multi-probe)","batches":$nBatches,""" +
        f""""hashes":$totalRows,"first_delta_s":${ts.head}%.2f,""" +
        f""""last_delta_s":${ts.last}%.2f,""" +
        f""""growth":${ts.last / ts.head}%.2f,"last_recall":$lastRecall%.3f}""")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
      spark.stop()
    }
  }
}
