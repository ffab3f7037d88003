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

  // ---------------------------------------------------------------------
  // Fixture-drift canary. The driver regenerates /root/testdata between
  // rounds and has already changed events.ts parquet flavor once
  // (TIMESTAMP(NANOS) → TIMESTAMP(MICROS), 2026-08-13), which surfaced as
  // 17 scattered test failures instead of one named one. These pins make
  // the NEXT silent regeneration fail here, by name, with the drift in the
  // message. If a pin fails: update it AND check Tables.loadEvents /
  // EventPipelines.readEvents still canonicalize the new flavor.
  // ---------------------------------------------------------------------

  /** Spark-inferred schema of every fixture column the engine reads,
    * rendered `name:simpleString`. timestamp_ntz == parquet
    * TIMESTAMP(isAdjustedToUTC=false, MICROS); a nanos regeneration makes
    * the plain events read THROW (Spark 4 refuses NANOS), which this test
    * reports as drift too.
    */
  private val pinnedSchemas = Map(
    "region" -> "r_regionkey:int, r_name:string",
    "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
      "c_acctbal:double, c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, p_type:string, " +
      "p_size:int, p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
      "o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
      "l_linenumber:int, l_quantity:double, l_extendedprice:double, " +
      "l_discount:double, l_tax:double, l_returnflag:string, " +
      "l_linestatus:string, l_shipdate:timestamp_ntz"),
    "events" -> ("event_id:bigint, ts:timestamp_ntz, user_id:bigint, " +
      "event_type:string, value:double, props:string"),
    "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
    "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")

  test("fixture canary: physical parquet schema of every table is the pinned flavor") {
    val drift = pinnedSchemas.toSeq.sortBy(_._1).flatMap { case (t, want) =>
      val got =
        try spark.read.parquet(s"$Sf0001/$t.parquet").schema
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
        catch { case e: Exception => s"<read refused: ${e.getMessage.take(120)}>" }
      if (got == want) Nil else Seq(s"$t:\n  pinned: $want\n  actual: $got")
    }
    assert(drift.isEmpty,
      "FIXTURE DRIFT — the driver regenerated /root/testdata with a new " +
        "physical schema. Update the pin and re-check the events loader " +
        "flavor branch.\n" + drift.mkString("\n"))
  }

  test("events loader canonicalizes any fixture flavor to TimestampType µs") {
    val events = graft.queries.Tables.t(spark, Sf0001, "events")
    assert(events.schema("ts").dataType == TimestampType)
    assert(events.count() > 0)
    // scale sanity: a ns-as-µs (or µs-as-ns) mixup lands ~1000× off, i.e.
    // year ≈ 56,000 or ≈ 1970 — either side of this window
    val yr = events.agg(max(year(col("ts")))).head.getInt(0)
    assert(yr > 2000 && yr < 2100, s"events.ts decoded to year $yr — unit mixup")
    // the nanos conf must never leak out of the scoped legacy read
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false")
  }
}
