package graft.extract

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.control.NonFatal

/** Multimodal columns (north-star §2.D): images/audio/video ride beside
  * text as opaque `binary` columns with typed metadata structs; per-row
  * media ops are narrow transformations (no shuffle), so a 100 TB media
  * corpus is just more input partitions.
  *
  * Image decode/resize are REAL (JDK ImageIO — PNG/JPEG/BMP/GIF, works
  * offline); audio feature-extraction and video frame-sampling have no
  * codec in this environment, so they are deterministic STUBS behind the
  * [[AudioDecoder]]/[[VideoDecoder]] traits — a production deployment
  * binds javacv/ffmpeg there, the Spark-side schema/partitioning/batch
  * shape is real and tested (MultimodalSpec).
  */
object Multimodal {

  val imageMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("error", StringType)))

  /** Decode image header → typed metadata struct. Invalid bytes yield a
    * metadata row with `error` set — never a failed job (the pdf2dataset
    * error-column rule applied to media).
    */
  val decodeImageMeta: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      override def call(bytes: Array[Byte]): Row =
        try {
          val in = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          val readers = ImageIO.getImageReaders(in)
          if (!readers.hasNext) Row(null, null, null, "decode: unknown format")
          else {
            val r = readers.next()
            r.setInput(in)
            val row = Row(r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0), null)
            r.dispose()
            row
          }
        } catch {
          // NonFatal only: the never-fail contract covers decode errors,
          // not OOM/interrupt — those must still fail the task
          case NonFatal(e) => Row(null, null, null, s"decode: ${e.getMessage}")
        }
    }, imageMetaType)

  /** Decode → optional bilinear resize → re-encode in `format` ("jpeg",
    * "png", "bmp", "gif" — whatever ImageIO writes). THROWS on
    * undecodable input or unknown target format, so pipeline callers
    * capture the failure in their error column (the pdf2dataset rule);
    * UDF wrappers that want null-on-error catch at their layer.
    */
  def transcode(bytes: Array[Byte], size: Option[(Int, Int)],
      format: String): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null)
      throw new IllegalArgumentException("transcode: not a decodable image")
    val (w, h) = size.getOrElse((img.getWidth, img.getHeight))
    // TYPE_INT_RGB (no alpha): the JPEG encoder rejects ARGB rasters
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(out, format, bos))
      throw new IllegalArgumentException(s"transcode: no encoder for format '$format'")
    bos.toByteArray
  }

  /** Real image resize (bilinear) → `format` bytes (PNG default); null on
    * undecodable input.
    */
  def resizeImage(w: Int, h: Int, format: String = "png")
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Array[Byte]] {
      override def call(bytes: Array[Byte]): Array[Byte] =
        try transcode(bytes, Some((w, h)), format)
        catch { case NonFatal(_) => null }
    }, BinaryType)

  /** Offline stand-in for an audio feature extractor (e.g. MFCC): a
    * production binding would decode PCM and window it; the stub derives a
    * deterministic fixed-length feature vector from the payload so the
    * schema (array<float>) and distributed shape are exercised end-to-end.
    */
  trait AudioDecoder extends Serializable {
    def features(bytes: Array[Byte], nCoeffs: Int): Array[Float]
  }

  object StubAudioDecoder extends AudioDecoder {
    override def features(bytes: Array[Byte], nCoeffs: Int): Array[Float] = {
      val out = new Array[Float](nCoeffs)
      var h = 1125899906842597L // FNV-ish deterministic mix of the payload
      bytes.foreach(b => h = h * 31 + b)
      (0 until nCoeffs).foreach { i =>
        h = h * 6364136223846793005L + 1442695040888963407L
        out(i) = (h >>> 40).toFloat / (1 << 24)
      }
      out
    }
  }

  /** Offline stand-in for video frame sampling: a production binding
    * returns one JPEG per sampled timestamp; the stub emits deterministic
    * per-frame byte payloads. The fan-out (one row per sampled frame) is
    * the real, tested part — it is the same explode shape as the page
    * fan-out.
    */
  trait VideoDecoder extends Serializable {
    def sampleFrames(bytes: Array[Byte], everyNthMs: Long, durationMs: Long): Seq[(Long, Array[Byte])]
  }

  object StubVideoDecoder extends VideoDecoder {
    override def sampleFrames(bytes: Array[Byte], everyNthMs: Long,
        durationMs: Long): Seq[(Long, Array[Byte])] = {
      (0L until durationMs by everyNthMs).map { ts =>
        ts -> s"FRAME:$ts:${bytes.length}".getBytes("UTF-8")
      }
    }
  }

  /** Attach decoded image metadata + a resized thumbnail to a DataFrame
    * with a binary `content` column.
    */
  def withImageColumns(df: DataFrame, contentCol: String = "content",
      thumbW: Int = 32, thumbH: Int = 32): DataFrame =
    df.withColumn("image_meta", decodeImageMeta(col(contentCol)))
      .withColumn("thumbnail", resizeImage(thumbW, thumbH)(col(contentCol)))

  /** Audio feature column (stub-backed; see [[AudioDecoder]]). */
  def withAudioFeatures(df: DataFrame, decoder: AudioDecoder = StubAudioDecoder,
      contentCol: String = "content", nCoeffs: Int = 16): DataFrame = {
    val f = udf((bytes: Array[Byte]) => decoder.features(bytes, nCoeffs))
    df.withColumn("audio_features", f(col(contentCol)))
  }

  /** Partition-batched decode — the Scala analog of Python's
    * `mapInPandas`: the decoder is initialized ONCE per partition (not
    * per row, which matters when the production binding loads a native
    * codec or model), then streamed over the partition's rows. Input
    * (path, content) → output (path, format, width, height, error);
    * per-row failures land in `error`, never fail the task.
    */
  def decodeImageMetaBatched(df: DataFrame, contentCol: String = "content",
      pathCol: String = "path"): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("error", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(pathCol), col(contentCol)).mapPartitions { it =>
      // per-partition init happens HERE (codec/model load in production)
      it.map { r =>
        val path = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val in = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          val readers = ImageIO.getImageReaders(in)
          if (!readers.hasNext) Row(path, null, null, null, "decode: unknown format")
          else {
            val reader = readers.next()
            reader.setInput(in)
            val row = Row(path, reader.getFormatName,
              reader.getWidth(0), reader.getHeight(0), null)
            reader.dispose()
            row
          }
        } catch {
          case NonFatal(e) => Row(path, null, null, null, s"decode: ${e.getMessage}")
        }
      }
    }(enc)
  }

  /** Perceptual average-hash (aHash) of an image: decode (real ImageIO),
    * bilinear-downsample to 8×8, luma = (299r + 587g + 114b)/1000 in
    * exact integer math, bit i set iff pixel i's luma > the 64-pixel
    * mean. Near-duplicate images (re-encodes, small edits, format
    * changes) land within a few bits; unrelated images differ in ~32.
    * Returns null (not a throw) on undecodable bytes — the media leaf
    * rule. This is the only non-relational step of [[imageDedup]].
    */
  def imageAHash: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], java.lang.Long] {
      override def call(bytes: Array[Byte]): java.lang.Long =
        try {
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          if (img == null) null
          else {
            val small = new java.awt.image.BufferedImage(8, 8,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = small.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, 8, 8, null)
            g.dispose()
            val luma = new Array[Long](64)
            var sum = 0L
            var i = 0
            while (i < 64) {
              val rgb = small.getRGB(i % 8, i / 8)
              luma(i) = (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)) / 1000L
              sum += luma(i)
              i += 1
            }
            var h = 0L
            i = 0
            while (i < 64) { // strict '>' vs mean*64 keeps it all-integer
              if (luma(i) * 64L > sum) h |= (1L << i)
              i += 1
            }
            java.lang.Long.valueOf(h)
          }
        } catch { case NonFatal(_) => null }
    }, LongType)

  /** Image near-duplicate pairs over a (`idCol`, binary `contentCol`)
    * frame: aHash per image (the only decode pass — one narrow map over
    * the corpus), then the SAME banded candidate plan as text SimHash
    * dedup — 4×16-bit bands of the 64-bit hash, pairs meet only in a
    * shared band bucket (shuffle by (band, value), never all-pairs),
    * Hamming ≤ `maxHamming` verified by bit_count on candidates only.
    * Undecodable rows drop out before banding instead of poisoning a
    * bucket with null values. Degenerate hashes — flat/low-contrast
    * images all aHash to 0 (strict '>' vs the mean), so every such image
    * shares every band bucket — are defused by BandedHamming's hot-bucket
    * guard: any (band, value) bucket holding more than `maxBucket` rows
    * is dropped with a warning rather than going quadratic.
    */
  def imageDedup(df: DataFrame, idCol: String = "path",
      contentCol: String = "content", maxHamming: Int = 6,
      maxBucket: Int = graft.operators.BandedHamming.DefaultMaxBucket)
      : DataFrame = {
    val hashed = df
      .select(col(idCol).as("img_id"), imageAHash(col(contentCol)).as("ahash"))
      .filter(col("ahash").isNotNull)
    graft.operators.BandedHamming
      .pairs(hashed, "img_id", "ahash", bands = 4, maxHamming = maxHamming,
        maxBucket = maxBucket)
  }

  /** Cluster labels over [[imageDedup]]'s verified near-dup pairs —
    * image parity with the text path
    * ([[graft.queries.VectorOps.dedupClusterLsh]]): every decodable
    * image gets (img_id, rep_id, is_dup), so a group of mutual
    * near-dups (re-encodes, pixel tweaks, format changes) collapses to
    * ONE representative instead of a bag of pairwise edges.
    *
    * [[graft.operators.ConnectedComponents]] iterates over Long node
    * ids (its convergence check sums labels), so string ids are mapped
    * through xxhash64 — deterministic across runs, and injectivity over
    * THIS corpus is asserted with one cheap aggregate (p(any collision)
    * ≈ n²/2⁶⁴; a silent collision would wrongly merge two clusters, so
    * it fails loudly instead). The representative is the member with
    * the minimum id hash — arbitrary but stable; resolve a
    * domain-preferred keeper downstream (the [[graft.queries.TextOps
    * .dedupKeepBest]] pattern) if representative choice matters.
    * The hash pass is materialized once (eager localCheckpoint): decode
    * is the expensive step on a media corpus, and it feeds the pair
    * join, the id map and the iterative CC rounds.
    */
  def imageDedupClusters(df: DataFrame, idCol: String = "path",
      contentCol: String = "content", maxHamming: Int = 6,
      maxBucket: Int = graft.operators.BandedHamming.DefaultMaxBucket)
      : DataFrame = {
    val hashed = df
      .select(col(idCol).as("img_id"), imageAHash(col(contentCol)).as("ahash"))
      .filter(col("ahash").isNotNull)
      .localCheckpoint(true)
    val ids = hashed.select(col("img_id"), xxhash64(col("img_id")).as("nid"))
    val collided = ids.groupBy(col("nid"))
      .agg(countDistinct(col("img_id")).as("c"))
      .filter(col("c") > 1).limit(1).count()
    require(collided == 0L,
      "imageDedupClusters: xxhash64(img_id) collision — two distinct ids share " +
        "a 64-bit hash on this corpus; disambiguate the id column")
    val pairs = graft.operators.BandedHamming
      .pairs(hashed, "img_id", "ahash", bands = 4, maxHamming = maxHamming,
        maxBucket = maxBucket)
    val edges = pairs
      .join(ids.select(col("img_id").as("id1"), col("nid").as("src")), "id1")
      .join(ids.select(col("img_id").as("id2"), col("nid").as("dst")), "id2")
      .select(col("src"), col("dst"))
    // iterate ONLY the near-dup subgraph (the text-path posture):
    // runOnPairs checkpoints the banded pair join once (it would
    // otherwise re-execute for the node scan and every CC round) and
    // images in no pair keep rep = self via the left join, never
    // entering the rounds — per-round shuffles scale with
    // |dup candidates|, not |corpus|
    val labels = graft.operators.ConnectedComponents.runOnPairs(edges)
    val repNames = ids.select(col("nid").as("rep_nid"), col("img_id").as("rep_id"))
    ids.join(labels, col("nid") === col("id"), "left")
      .withColumn("rep_n", coalesce(col("rep"), col("nid")))
      .join(repNames, col("rep_n") === col("rep_nid"))
      .select(col("img_id"), col("rep_id"),
        (col("img_id") =!= col("rep_id")).as("is_dup"))
  }

  /** Frame-sample fan-out: one row per sampled frame (ts_ms, frame). */
  def sampleVideoFrames(df: DataFrame, decoder: VideoDecoder = StubVideoDecoder,
      contentCol: String = "content", everyNthMs: Long = 1000,
      durationMs: Long = 5000): DataFrame = {
    val f = udf((bytes: Array[Byte]) =>
      decoder.sampleFrames(bytes, everyNthMs, durationMs))
    df.withColumn("frame", explode(f(col(contentCol))))
      .withColumn("frame_ts_ms", col("frame._1"))
      .withColumn("frame_bytes", col("frame._2"))
      .drop("frame")
  }

  // ------------------------------------------------------ audio (real)

  /** Audio decode is REAL for the formats the JDK ships codecs for
    * (WAV/AIFF/AU carrying PCM, plus µ-law/a-law via the built-in
    * converters — `javax.sound.sampled`, works offline); compressed
    * formats (MP3/Opus/…) still need the [[AudioDecoder]] binding.
    * The r13 additions follow the image discipline exactly: typed
    * metadata with an error column (never a failed job), a 64-bit
    * perceptual fingerprint, and banded near-dup over it.
    */
  val audioMetaType: StructType = StructType(Seq(
    StructField("encoding", StringType),
    StructField("sample_rate", FloatType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType),
    StructField("error", StringType)))

  /** Decode audio header → typed metadata struct; undecodable bytes set
    * `error` — the media-leaf never-fail rule.
    */
  val decodeAudioMeta: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      override def call(bytes: Array[Byte]): Row =
        try {
          val aff = javax.sound.sampled.AudioSystem
            .getAudioFileFormat(new ByteArrayInputStream(bytes))
          val f = aff.getFormat
          val frames = aff.getFrameLength.toLong
          val durMs =
            if (frames >= 0 && f.getFrameRate > 0)
              (frames * 1000L / f.getFrameRate.toLong)
            else -1L
          Row(f.getEncoding.toString.toLowerCase, f.getSampleRate,
            f.getChannels, f.getSampleSizeInBits, frames, durMs, null)
        } catch {
          case NonFatal(e) =>
            Row(null, null, null, null, null, null, s"decode: ${e.getMessage}")
        }
    }, audioMetaType)

  /** Decode audio bytes to channel-mixed 16-bit PCM samples (JDK codec
    * chain: non-PCM encodings the JDK can convert — µ-law/a-law — are
    * routed through PCM_SIGNED 16-bit first). Throws on undecodable
    * input; callers own the null-vs-error policy.
    */
  private def monoSamples(bytes: Array[Byte]): Array[Int] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val raw = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val f0 = raw.getFormat
    val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      f0.getSampleRate, 16, f0.getChannels, f0.getChannels * 2,
      f0.getSampleRate, false)
    val in =
      if (f0.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          f0.getSampleSizeInBits == 16) raw
      else AudioSystem.getAudioInputStream(target, raw)
    val fmt = in.getFormat
    val data = in.readAllBytes()
    val ch = fmt.getChannels
    val big = fmt.isBigEndian
    val n = data.length / (2 * ch)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      var acc = 0
      var c = 0
      while (c < ch) {
        val o = (i * ch + c) * 2
        val s =
          if (big) ((data(o) << 8) | (data(o + 1) & 0xff)).toShort
          else ((data(o + 1) << 8) | (data(o) & 0xff)).toShort
        acc += s
        c += 1
      }
      out(i) = acc / ch
      i += 1
    }
    out
  }

  /** Perceptual frame-energy hash of an audio payload — the aHash
    * discipline applied to sound: decode to mono 16-bit PCM (real JDK
    * codecs), split into 64 equal frames, per-frame energy = Σ|sample|
    * in exact Long math, bit i set iff frame i's energy × 64 > total
    * energy (strict '>' vs the mean, all-integer — the image rule).
    * Invariances by construction: re-encode/container change (same
    * samples ⇒ same bits), uniform amplitude scaling (energies and
    * their mean scale together ⇒ the comparisons are unchanged up to
    * rounding), small local edits (a few frames flip ⇒ few bits).
    * Degenerate inputs — silence or constant-energy tones — hash to 0
    * exactly like flat images, and the SAME hot-bucket guard defuses
    * them downstream. Null (not a throw) on undecodable bytes.
    */
  def audioAHash: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], java.lang.Long] {
      override def call(bytes: Array[Byte]): java.lang.Long =
        try {
          val s = monoSamples(bytes)
          if (s.length < 64) null
          else {
            val energy = new Array[Long](64)
            var total = 0L
            var i = 0
            while (i < s.length) {
              val e = math.abs(s(i).toLong)
              energy(i * 64 / s.length) += e
              total += e
              i += 1
            }
            // frames are equal-sized up to integer division remainder;
            // compare frame_mean vs global_mean cross-multiplied so the
            // uneven tail frame is weighted by ITS true length
            var h = 0L
            var f = 0
            while (f < 64) {
              val lo = (f.toLong * s.length / 64).toInt
              val hi = ((f + 1).toLong * s.length / 64).toInt
              if (hi > lo && energy(f) * s.length > total * (hi - lo)) h |= (1L << f)
              f += 1
            }
            java.lang.Long.valueOf(h)
          }
        } catch { case NonFatal(_) => null }
    }, LongType)

  /** REAL audio feature vector where the JDK decodes: `nFrames`
    * normalized frame energies (RMS per frame / overall RMS) — the
    * feature-extraction slot's offline-honest instantiation beside the
    * [[AudioDecoder]] stub (which stands in for MFCC-class extractors
    * needing a DSP library). Null on undecodable input.
    */
  def audioEnergyFeatures(nFrames: Int = 16)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Array[Float]] {
      override def call(bytes: Array[Byte]): Array[Float] =
        try {
          val s = monoSamples(bytes)
          if (s.length < nFrames) null
          else {
            val sq = new Array[Double](nFrames)
            val cnt = new Array[Long](nFrames)
            var i = 0
            while (i < s.length) {
              val f = i * nFrames / s.length
              sq(f) += s(i).toDouble * s(i)
              cnt(f) += 1
              i += 1
            }
            val totalRms = math.sqrt(sq.sum / s.length)
            if (totalRms == 0) new Array[Float](nFrames)
            else (0 until nFrames).map(f =>
              (math.sqrt(sq(f) / math.max(cnt(f), 1L)) / totalRms).toFloat
            ).toArray
          }
        } catch { case NonFatal(_) => null }
    }, ArrayType(FloatType, containsNull = false))

  /** Attach decoded audio metadata + fingerprint + energy features. */
  def withAudioColumns(df: DataFrame, contentCol: String = "content",
      nFrames: Int = 16): DataFrame =
    df.withColumn("audio_meta", decodeAudioMeta(col(contentCol)))
      .withColumn("audio_hash", audioAHash(col(contentCol)))
      .withColumn("audio_energy", audioEnergyFeatures(nFrames)(col(contentCol)))

  /** Audio near-duplicate pairs — [[imageDedup]]'s exact plan over
    * [[audioAHash]]: one decode pass (the only non-relational step),
    * 4×16-bit banded candidates (shuffle by (band, value), never
    * all-pairs), Hamming ≤ `maxHamming` verified on candidates only,
    * undecodable rows dropped before banding, hot buckets (silence,
    * constant tones — all hash 0) defused by the banding guard.
    */
  def audioDedup(df: DataFrame, idCol: String = "path",
      contentCol: String = "content", maxHamming: Int = 6,
      maxBucket: Int = graft.operators.BandedHamming.DefaultMaxBucket)
      : DataFrame = {
    val hashed = df
      .select(col(idCol).as("img_id"), audioAHash(col(contentCol)).as("ahash"))
      .filter(col("ahash").isNotNull)
    graft.operators.BandedHamming
      .pairs(hashed, "img_id", "ahash", bands = 4, maxHamming = maxHamming,
        maxBucket = maxBucket)
      .select(col("id1").as("audio_id1"), col("id2").as("audio_id2"),
        col("hamming"))
  }
}
