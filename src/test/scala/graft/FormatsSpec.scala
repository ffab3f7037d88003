package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Formats, Tables}

/** Text-format interchange (JSONL/CSV): the contract queries prove
  * fixture fidelity end-to-end against DuckDB; these specs prove the
  * DIALECT on content the fixture is too polite to contain — embedded
  * newlines, quotes, backslashes, the null-vs-empty-string distinction,
  * microsecond timestamps, doubles that need all 17 digits — plus the
  * loud-failure posture on corrupt input.
  */
class FormatsSpec extends AnyFunSuite with SparkSessionFixture {
  import spark.implicits._

  private val nastyStrings = Seq[(Long, String)](
    1L -> "plain",
    2L -> "line\nbreak and\ttab",
    3L -> "\"double\" and 'single' quotes",
    4L -> "back\\slash, comma, and a \\\" mix",
    5L -> "unicode: café 日本語 😀",
    6L -> "", // empty string — must NOT come back as null
    7L -> null,
    8L -> "{\"k\": 1, \"v\": [true, null]}" // JSON-in-a-string
  )

  private def roundTripRows(df: org.apache.spark.sql.DataFrame,
      write: (org.apache.spark.sql.DataFrame, String) => Unit,
      read: String => org.apache.spark.sql.DataFrame): Seq[Row] = {
    val tmp = java.nio.file.Files.createTempDirectory("fmt").toString
    try {
      write(df, s"$tmp/out")
      read(s"$tmp/out").orderBy("id").collect().toSeq
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
  private type Row = org.apache.spark.sql.Row

  private val idText = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))

  test("JSONL round-trips every nasty string bit-identically, incl. null vs empty") {
    val df = nastyStrings.toDF("id", "s")
    val back = roundTripRows(df,
      (d, p) => Formats.writeJsonl(d, p),
      p => Formats.readJsonl(spark, p, idText))
    assert(back.map(r => (r.getLong(0), r.getString(1))) ==
      nastyStrings.sortBy(_._1))

    // JSON encodes null structurally, so even the CSV null sentinel
    // itself survives as a string — the reason sentinel-prone columns
    // belong here (see the CSV test's pinned limit)
    val sentinel = Seq((1L, "\\N"), (2L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val sentBack = roundTripRows(sentinel,
      (d, p) => Formats.writeJsonl(d, p),
      p => Formats.readJsonl(spark, p, idText))
    assert(sentBack.map(r => (r.getLong(0), Option(r.getString(1)))) ==
      Seq(1L -> Some("\\N"), 2L -> None))
  }

  test("CSV round-trips quotes/commas/backslashes and keeps null distinct from empty") {
    // CSV is the flat-tabular format: embedded newlines are out of its
    // contract (they break byte-range splitting; JSONL carries those) —
    // everything else must survive
    val flat = nastyStrings.filterNot { case (_, s) =>
      s != null && s.contains("\n") }
    val df = flat.toDF("id", "s")
    val back = roundTripRows(df,
      (d, p) => Formats.writeCsv(d, p),
      p => Formats.readCsv(spark, p, idText))
    assert(back.map(r => (r.getLong(0), r.getString(1))) == flat.sortBy(_._1))

    // pinned LIMIT of the dialect (documented on CsvNull): a value
    // literally equal to the null sentinel round-trips to null — CSV
    // cannot encode null losslessly against arbitrary strings; JSONL
    // carries such columns (first test covers the same value fine
    // through JSON's structural null)
    val sentinel = Seq((1L, "\\N"), (2L, "ok")).toDF("id", "s")
    val sentBack = roundTripRows(sentinel,
      (d, p) => Formats.writeCsv(d, p),
      p => Formats.readCsv(spark, p, idText))
    assert(sentBack.map(r => (r.getLong(0), Option(r.getString(1)))) ==
      Seq(1L -> None, 2L -> Some("ok")))
  }

  test("CSV round-trips microsecond timestamps and full-precision doubles") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("x", DoubleType)))
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-03-01 23:59:59.000001"), 0.1),
      (2L, java.sql.Timestamp.valueOf("1999-12-31 00:00:00.999999"),
        1.7976931348623157e308),
      (3L, java.sql.Timestamp.valueOf("2026-03-01 12:00:00"),
        2.2250738585072014e-308)
    ).toDF("id", "ts", "x")
    val back = roundTripRows(df,
      (d, p) => Formats.writeCsv(d, p),
      p => Formats.readCsv(spark, p, schema))
    assert(back.map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))) ==
      df.orderBy("id").collect().toSeq
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))))
  }

  test("FAILFAST: a corrupt JSONL line is a loud scan error, not a null row") {
    val tmp = java.nio.file.Files.createTempDirectory("fmtbad")
    val f = tmp.resolve("part-00000.json")
    java.nio.file.Files.write(f,
      "{\"id\": 1, \"s\": \"ok\"}\nNOT JSON AT ALL\n".getBytes("UTF-8"))
    val e = intercept[Exception] {
      Formats.readJsonl(spark, tmp.toString, idText).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => t.getMessage != null &&
      (t.getMessage.contains("Malformed") || t.getMessage.contains("FAILFAST"))))
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("contract round-trips equal the direct parquet read at sf0.001") {
    val jl = Formats.scanJsonl(spark, Sf0001).collect().toSeq
    val direct = Tables.t(spark, Sf0001, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(jl == direct, "JSONL round-trip must be lossless on the fixture")

    val cs = Formats.scanCsv(spark, Sf0001).collect().toSeq
    val directEv = Tables.t(spark, Sf0001, "events")
      .select(col("event_id"), graft.queries.Det.tsOut(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .orderBy(col("event_id")).collect().toSeq
    assert(cs == directEv, "CSV round-trip must be lossless on the fixture")
  }

  test("JSONL schema evolution: missing fields null, extra fields ignored, type conflict loud") {
    val tmp = java.nio.file.Files.createTempDirectory("fmt_evo")
    // three generations of shards in one corpus dir: v1 lacks `lang`,
    // v2 matches the schema, v3 carries an extra field
    java.nio.file.Files.write(tmp.resolve("v1.json"),
      "{\"id\": 1, \"s\": \"old\"}\n".getBytes("UTF-8"))
    java.nio.file.Files.write(tmp.resolve("v2.json"),
      "{\"id\": 2, \"s\": \"cur\", \"lang\": \"en\"}\n".getBytes("UTF-8"))
    java.nio.file.Files.write(tmp.resolve("v3.json"),
      "{\"id\": 3, \"s\": \"new\", \"lang\": \"de\", \"extra\": 9}\n"
        .getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("lang", StringType)))
    val got = Formats.readJsonl(spark, tmp.toString, schema)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    // reader-schema semantics: absent field -> null (old shards stay
    // readable), unknown field -> dropped (new shards don't break old
    // readers) — the classic forward/backward compatibility pair
    assert(got.toSeq == Seq((1L, "old", None), (2L, "cur", Some("en")),
      (3L, "new", Some("de"))))
    // a TYPE conflict is not evolution, it's corruption: FAILFAST errors
    java.nio.file.Files.write(tmp.resolve("v4.json"),
      "{\"id\": \"not a number\", \"s\": \"x\"}\n".getBytes("UTF-8"))
    intercept[Exception] {
      Formats.readJsonl(spark, tmp.toString, schema).collect()
    }
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("streaming JSONL front door: dropped gz shards flow through continuous curation") {
    import graft.queries.CurateConfig
    import graft.streaming.CurateIngest
    val root = java.nio.file.Files.createTempDirectory("fmt_stream")
    val watch = root.resolve("watch"); java.nio.file.Files.createDirectory(watch)
    val Seq(state, out, ckpt) = Seq("state", "out", "ckpt").map { n =>
      root.resolve(n).toString
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("n_chars", LongType)))
    def doc(id: Long, prefix: String) = {
      val text = (0 until 40).map(i => s"${prefix}w$i").mkString(" ")
      (id, text, text.length.toLong)
    }
    // the atomic-drop convention: write the shard OUTSIDE the watched
    // dir, then move its files in (a file source must never list a
    // half-written shard)
    var n = 0
    def drop(rows: Seq[(Long, String, Long)]): Unit = {
      val staging = root.resolve(s"staging$n"); n += 1
      Formats.writeJsonl(rows.toDF("doc_id", "text", "n_chars"),
        staging.toString)
      java.nio.file.Files.list(staging).forEach { f =>
        if (f.getFileName.toString.startsWith("part-"))
          java.nio.file.Files.move(f,
            watch.resolve(s"shard$n-${f.getFileName}"))
      }
    }
    val alpha = doc(1L, "alpha")
    val q = CurateIngest.run(
      Formats.readJsonlStream(spark, watch.toString, schema),
      state, out, ckpt, CurateConfig())
    try {
      drop(Seq(alpha))
      q.processAllAvailable()
      drop(Seq((2L, alpha._2, alpha._3), doc(3L, "bravo")))
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = spark.read.parquet(s"$out/batch=b1").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("kept"), Option(r.getAs[String]("drop_reason")))))
      .toMap
    assert(verdicts == Map(
      2L -> ((false, Some("exact_dup"))), // cross-SHARD dup via the index
      3L -> ((true, None))))
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("streaming CSV source == batch read of the same shards (dialect parity)") {
    val root = java.nio.file.Files.createTempDirectory("fmt_csv_stream")
    val watch = root.resolve("watch"); java.nio.file.Files.createDirectory(watch)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    // stage-then-move, as the front-door convention demands
    val staging = root.resolve("staging")
    Formats.writeCsv(Seq((1L, "a,b"), (2L, "\\N"), (3L, null: String))
      .toDF("id", "s"), staging.toString)
    java.nio.file.Files.list(staging).forEach { f =>
      if (f.getFileName.toString.startsWith("part-"))
        java.nio.file.Files.move(f, watch.resolve(f.getFileName))
    }
    val q = Formats.readCsvStream(spark, watch.toString, schema)
      .writeStream.format("memory").queryName("fmt_csv_stream_t")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("fmt_csv_stream_t").orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    val batch = Formats.readCsv(spark, watch.toString, schema)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(streamed == batch, "one dialect, two execution modes")
    // and the dialect laws hold through the stream: quoted comma kept,
    // sentinel-collision and real null both arrive as null
    assert(streamed == Seq(1L -> Some("a,b"), 2L -> None, 3L -> None))
    spark.catalog.dropTempView("fmt_csv_stream_t")
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("scratch dirs do not leak: a contract run leaves no _scratch entries behind") {
    Formats.scanJsonl(spark, Sf0001).count()
    val wh = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      "_scratch")
    val left = Option(wh.list()).getOrElse(Array.empty[String])
      .filter(_.startsWith("graft_jsonl"))
    assert(left.isEmpty, s"leaked scratch dirs: ${left.mkString(", ")}")
  }
}
