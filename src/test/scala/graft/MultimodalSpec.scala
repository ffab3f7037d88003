package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Multimodal

/** Multimodal columns: REAL image decode/resize through Spark (JDK
  * ImageIO), stub-backed audio features and video frame fan-out — schema,
  * null/error capture, and distributed shape all exercised.
  */
class MultimodalSpec extends AnyFunSuite with SparkSessionFixture {

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, rgb)))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaDf = {
    import spark.implicits._
    Seq(
      (1L, png(64, 48, 0xff0000)),
      (2L, png(16, 16, 0x00ff00)),
      (3L, Array[Byte](1, 2, 3, 4)) // not an image
    ).toDF("id", "content")
  }

  test("image decode yields typed metadata; invalid bytes get error, not a crash") {
    val rows = Multimodal.withImageColumns(mediaDf)
      .select("id", "image_meta.format", "image_meta.width",
        "image_meta.height", "image_meta.error")
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "png" && rows(0).getInt(2) == 64 && rows(0).getInt(3) == 48)
    assert(rows(1).getInt(2) == 16)
    assert(rows(2).isNullAt(1) && rows(2).getString(4).startsWith("decode:"))
  }

  test("resize produces a real decodable thumbnail of the target size") {
    val thumb = Multimodal.withImageColumns(mediaDf, thumbW = 8, thumbH = 8)
      .filter(col("id") === 1).select("thumbnail").collect()(0).getAs[Array[Byte]](0)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(thumb))
    assert(back.getWidth == 8 && back.getHeight == 8)
    // resized solid-red image stays red
    assert((back.getRGB(4, 4) & 0xffffff) == 0xff0000)
  }

  test("invalid image resize yields null, row survives") {
    val rows = Multimodal.withImageColumns(mediaDf)
      .select("id", "thumbnail").orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(2).isNullAt(1))
  }

  test("batched (mapPartitions) decode matches the per-row UDF path") {
    import spark.implicits._
    val df = mediaDf.withColumn("path", concat(lit("f"), $"id"))
    val batched = Multimodal.decodeImageMetaBatched(df)
      .collect().map(r => (r.getString(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.isNullAt(4)))
      .sortBy(_._1)
    val perRow = Multimodal.withImageColumns(df)
      .select($"path", $"image_meta.format", $"image_meta.width",
        $"image_meta.height", $"image_meta.error")
      .collect().map(r => (r.getString(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.isNullAt(4)))
      .sortBy(_._1)
    assert(batched.toSeq == perRow.toSeq)
    // the invalid row survived with an error, in both paths
    assert(batched.count(!_._5) == 1)
  }

  test("audio features: fixed length, deterministic, schema array<float>") {
    val df = Multimodal.withAudioFeatures(mediaDf, nCoeffs = 16)
    assert(df.schema("audio_features").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false))
    val a = df.orderBy("id").select("audio_features").collect().map(_.getSeq[Float](0))
    val b = df.orderBy("id").select("audio_features").collect().map(_.getSeq[Float](0))
    assert(a.forall(_.length == 16))
    assert(a.toSeq == b.toSeq) // deterministic
    assert(a(0) != a(1))       // payload-dependent
  }

  test("video frame sampling fans out one row per frame") {
    val rows = Multimodal.sampleVideoFrames(mediaDf.filter(col("id") === 1),
      everyNthMs = 1000, durationMs = 5000)
      .select("id", "frame_ts_ms", "frame_bytes").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(1)).sorted.toSeq == Seq(0L, 1000L, 2000L, 3000L, 4000L))
    assert(new String(rows.head.getAs[Array[Byte]](2), "UTF-8").startsWith("FRAME:"))
  }
}
