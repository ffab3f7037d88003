package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth beyond the parquet fixtures and binaryFile
  * corpus scans: csv, json(lines) and orc round-trips through the same
  * DataFrame path, with explicit schemas on read (schema inference is a
  * full extra pass at 100 TB — production reads always declare).
  */
class SourcesSpec extends AnyFunSuite with SparkSessionFixture {

  private def sample = graft.queries.Tables.t(spark, Sf0001, "documents")
    .select(col("doc_id"), col("lang"), col("n_chars"))
    .orderBy(col("doc_id"))

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  private def roundTrip(fmt: String, opts: Map[String, String]): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString
    try {
      sample.write.mode("overwrite").options(opts).format(fmt).save(dir)
      val back = spark.read.options(opts).schema(schema).format(fmt).load(dir)
      assert(back.schema == schema)
      val a = sample.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      val b = back.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      assert(a.toSeq == b.toSeq, s"$fmt round-trip mismatch")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("csv round-trip with header")(roundTrip("csv", Map("header" -> "true")))
  test("json-lines round-trip")(roundTrip("json", Map.empty))
  test("orc round-trip")(roundTrip("orc", Map.empty))

  test("parquet codec round-trips: snappy, gzip, zstd, lz4") {
    for (codec <- Seq("snappy", "gzip", "zstd", "lz4")) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_$codec").toString
      try {
        sample.write.mode("overwrite").option("compression", codec).parquet(dir)
        val back = spark.read.parquet(dir)
        assert(back.count() == sample.count(), s"$codec round-trip lost rows")
        val ext = Map("snappy" -> "snappy", "gzip" -> "gz",
          "zstd" -> "zstd", "lz4" -> "lz4")(codec)
        val files = new java.io.File(dir).listFiles.map(_.getName)
        assert(files.exists(_.contains(s".$ext")),
          s"$codec extension .$ext missing in ${files.toSeq}")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }
  }

  test("csv malformed rows survive as nulls in PERMISSIVE mode") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv").toString
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.csv"),
        "1,en,100\nnot_a_long,de,7\n3,fr,300\n".getBytes)
      val df = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(dir)
      val rows = df.collect().sortBy(r => if (r.isNullAt(0)) -1L else r.getLong(0))
      assert(rows.length == 3)
      // the malformed row survives with the unparseable column null —
      // the pdf2dataset never-fail rule at the source layer
      assert(rows.exists(r => r.isNullAt(0) && r.getString(1) == "de"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("events nanos conf is scoped to the load, not leaked into the session") {
    // the events loader needs spark.sql.legacy.parquet.nanosAsLong=true for
    // its one TIMESTAMP(NANOS) read; leaking it would silently truncate any
    // future nanos table that must NOT be read as long. After the load the
    // session must be back to strict Spark-4 behavior: the same nanos file
    // read directly is refused, not silently long-ified.
    val events = graft.queries.Tables.t(spark, Sf0001, "events")
    assert(events.count() > 0)
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false")
    intercept[Exception] {
      spark.read.parquet(s"$Sf0001/events.parquet").schema
    }
  }
}
