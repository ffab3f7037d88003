package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Tables, TextOps}

/** The `graft.Main curate` CLI surface: argument contract, end-to-end run,
  * resume (only missing verdicts re-emitted), and the durable-state path.
  */
class CliCurateSpec extends AnyFunSuite with SparkSessionFixture {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // --- parse: the exit-code-2 surface (main prints usage and exits 2 on
  // --- IllegalArgumentException — same dispatch as the extract CLI)

  test("parse: positional args + flags") {
    val cfg = CurateCli.parse(Seq("in.parquet", "out", "--state", "s",
      "--jaccard", "0.7", "--normalize-hash", "--no-resume", "--num-cpus", "4"))
    assert(cfg == CurateCli.Config("in.parquet", "out", Some("s"), 0.7,
      segmentWidth = None, normalizeHash = true, resume = false,
      numCpus = Some(4)))
    assert(CurateCli.parse(Seq("a", "b", "--segment-width", "6"))
      .segmentWidth == Some(6))
    assert(!CurateCli.parse(Seq("a", "b")).normalizeHash,
      "normalized hashing must be opt-in")
  }

  test("parse: malformed input throws with a usable message") {
    for (bad <- Seq(
        Seq("only_one"),
        Seq("a", "b", "c"),
        Seq("a", "b", "--jaccard", "nope"),
        Seq("a", "b", "--jaccard", "1.5"),
        Seq("a", "b", "--num-cpus", "0"),
        Seq("a", "b", "--state"),
        Seq("a", "b", "--segment-width", "0"),
        Seq("a", "b", "--segment-width", "8", "--state", "s"),
        Seq("a", "b", "--frobnicate")))
      intercept[IllegalArgumentException](CurateCli.parse(bad))
  }

  test("end-to-end run == curateOn; rerun on complete output writes nothing") {
    val docs = Tables.t(spark, Sf0001, "documents")
    val in = tmp("cli_in")
    val out = s"${tmp("cli_out")}/verdicts"
    docs.write.mode("overwrite").parquet(in)
    val n = CurateCli.run(spark, CurateCli.Config(in, out))
    assert(n == docs.count())
    val got = spark.read.parquet(out)
    assert(got.count() == n)
    assert(got.filter(col("kept")).count() ==
      TextOps.curateOn(docs).filter(col("kept")).count())
    // complete output + resume on: nothing to do
    assert(CurateCli.run(spark, CurateCli.Config(in, out)) == 0L)
  }

  test("--segment-width runs the composed pipeline") {
    val docs = Tables.t(spark, Sf0001, "documents")
    val in = tmp("cli_seg_in")
    val out = s"${tmp("cli_seg_out")}/verdicts"
    docs.write.mode("overwrite").parquet(in)
    val cfg = CurateCli.parse(Seq(in, out, "--segment-width", "8"))
    assert(CurateCli.run(spark, cfg) == docs.count())
    val got = spark.read.parquet(out)
    assert(got.filter(col("drop_reason") === "segment_dup").count() > 0,
      "the fixture's full copies must drop as segment_dup")
    val want = TextOps.curateOn(docs,
      graft.queries.CurateConfig(segmentDedupWidth = Some(8)))
    assert(got.orderBy(col("doc_id")).collect().toSeq.map(_.toString) ==
      want.collect().toSeq.map(_.toString))
  }

  test("resume: an interrupted run's rerun emits ONLY the missing verdicts") {
    val docs = Tables.t(spark, Sf0001, "documents")
    val in = tmp("cli_rin")
    val out = s"${tmp("cli_rout")}/verdicts"
    docs.write.mode("overwrite").parquet(in)
    // the interruption: half the verdicts made it out
    TextOps.curateOn(docs).filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(out)
    val n = CurateCli.run(spark, CurateCli.Config(in, out))
    assert(n == docs.filter(col("doc_id") % 2 === 1).count(),
      "resume must emit exactly the missing half")
    // the union equals the full pipeline, no duplicates
    val got = spark.read.parquet(out)
    assert(got.count() == docs.count())
    assert(got.select(col("doc_id")).distinct().count() == docs.count())
  }

  test("resume composes with --segment-width: delta-only, union == composed run") {
    val docs = Tables.t(spark, Sf0001, "documents")
    val in = tmp("cli_srin")
    val out = s"${tmp("cli_srout")}/verdicts"
    docs.write.mode("overwrite").parquet(in)
    val composedCfg = graft.queries.CurateConfig(segmentDedupWidth = Some(8))
    TextOps.curateOn(docs, composedCfg).filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(out)
    val cfg = CurateCli.parse(Seq(in, out, "--segment-width", "8"))
    assert(CurateCli.run(spark, cfg) ==
      docs.filter(col("doc_id") % 2 === 1).count(),
      "resume must emit exactly the missing half of the composed run")
    val got = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    val want = TextOps.curateOn(docs, composedCfg).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got == want, "resumed union must equal the full composed run")
  }

  test("durable state: first run builds it, a new 'session' reuses it for resume") {
    val docs = Tables.t(spark, Sf0001, "documents")
    val in = tmp("cli_sin")
    val state = tmp("cli_state")
    val out = s"${tmp("cli_sout")}/verdicts"
    docs.write.mode("overwrite").parquet(in)
    val n = CurateCli.run(spark, CurateCli.Config(in, out, Some(state)))
    assert(n == docs.count())
    assert(new java.io.File(s"$state/index/bands").exists())
    assert(new java.io.File(s"$state/labels").exists())
    assert(new java.io.File(s"$state/reasons").exists())
    // "restart": drop half the output; the state-backed resume fills in
    // exactly the other half, bit-identical to the persisted reasons
    val full = spark.read.parquet(out).cache()
    full.count()
    full.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(out)
    val n2 = CurateCli.run(spark, CurateCli.Config(in, out, Some(state)))
    assert(n2 == docs.count() - full.filter(col("doc_id") % 2 === 0).count())
    assert(spark.read.parquet(out).count() == docs.count())
    full.unpersist()
  }
}
