package graft.tools

import org.apache.spark.sql.SparkSession
import graft.extract.Multimodal

/** Video frame-set index at ingest scale (r14): synthesizes a growing
  * clip corpus, ingests it batch by batch through [[Multimodal
  * .videoFrameDelta]], and measures what the 100 TB story claims —
  * per-batch probe+admit cost bounded by the BATCH's signature fan-out
  * (plus one columnar scan of the stored frames), not by quadratic
  * pair-work, while planted cross-batch duplicates keep being caught
  * through the persisted frame sets alone.
  *
  * Corpus shape: 1 000-byte clips (10 stub-decoded frames each);
  * `dupRate` of every batch's clips share an 800-byte prefix with a
  * uniformly-chosen clip from an EARLIER batch (overlap 8/10, jaccard
  * 8/12 — above the 0.5 default), the rest are fresh random content.
  * Recall = planted cross-batch dups whose (dup, original) pair the
  * delta reports. Prints one JSON line per batch plus a summary.
  *
  * Usage: scripts/run.sh graft.tools.MediaScale [batches] [clipsPerBatch] [dupRate]
  */
object MediaScale {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.length > 0) args(0).toInt else 8
    val perBatch = if (args.length > 1) args(1).toInt else 2000
    val dupRate = if (args.length > 2) args(2).toDouble else 0.1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val idx = java.nio.file.Files.createTempDirectory("media_scale").toString
    // deterministic corpus: clip (b, i) is seeded by (b, i); a dup's
    // prefix is its ORIGINAL's bytes, so the match is exact-by-content
    def blob(seed: Long, n: Int): Array[Byte] = {
      val r = new scala.util.Random(seed)
      val b = new Array[Byte](n); r.nextBytes(b); b
    }
    def clipBytes(b: Int, i: Int): Array[Byte] =
      blob(b.toLong * 1000003L + i, 1000)
    try {
      var totalClips = 0
      val times = Array.newBuilder[Double]
      var lastRecall = 1.0
      (0 until nBatches).foreach { b =>
        // ONE sequential PRNG per batch: seeding a fresh Random per
        // clip from consecutive seeds makes the FIRST draw cluster
        // (java.util.Random scrambles seeds weakly) — whole batches
        // then come out all-dup or no-dup
        val rb = new scala.util.Random(b * 104729L + 17)
        val rows = (0 until perBatch).map { i =>
          val isDup = b > 0 && rb.nextDouble() < dupRate
          if (isDup) {
            // originals come from batch 0 only: a later batch's clip
            // may itself be a dup, whose STORED content differs from
            // clipBytes — referencing it would corrupt the planted
            // accounting (the pair legitimately would not exist)
            val oi = rb.nextInt(perBatch)
            (s"c_${b}_$i", clipBytes(0, oi).take(800) ++
              blob(b.toLong * 15485863L + i, 200), s"c_0_$oi")
          } else (s"c_${b}_$i", clipBytes(b, i), null)
        }
        val planted = rows.collect { case (id, _, orig) if orig != null =>
          (id, orig) }.toSet
        val df = rows.map(t => (t._1, t._2)).toDF("path", "content")
          .repartition(cpus.toInt).localCheckpoint(true)
        val t0 = System.nanoTime()
        val pairs = Multimodal.videoDedupDelta(spark, idx, df, s"b$b",
            everyNthMs = 500, durationMs = 5000)
          .select("id1", "id2", "cross").collect()
        val secs = (System.nanoTime() - t0) / 1e9
        val crossFound = pairs.collect {
          case r if r.getBoolean(2) => (r.getString(0), r.getString(1)) }.toSet
        val found = planted.count { case (d, o) => crossFound.contains((d, o)) }
        val recall = if (planted.isEmpty) 1.0
          else found.toDouble / planted.size
        totalClips += perBatch
        times += secs
        lastRecall = recall
        println(f"""{"batch":$b,"corpus_clips":$totalClips,"delta_s":$secs%.2f,""" +
          f""""cross_pairs":${crossFound.size},"planted":${planted.size},""" +
          f""""found":$found,"recall":$recall%.3f}""")
      }
      val ts = times.result()
      println(f"""{"summary":"video-index ingest scale","batches":$nBatches,""" +
        f""""clips":$totalClips,"first_delta_s":${ts.head}%.2f,""" +
        f""""last_delta_s":${ts.last}%.2f,""" +
        f""""growth":${ts.last / ts.head}%.2f,"last_recall":$lastRecall%.3f}""")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
      spark.stop()
    }
  }
}
