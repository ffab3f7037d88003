package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Tables, TextOps, VectorOps}

/** Durable curation state: the persisted index is the one-shingle-pass
  * source of near-dup pairs, labels, and verdicts — a restarted session
  * must rebuild each of them from the artifacts alone, bit-identical to
  * the in-session pipeline on the fixture corpus.
  */
class CurateStateSpec extends AnyFunSuite with SparkSessionFixture {

  private def docs =
    Tables.t(spark, Sf0001, "documents").select(col("doc_id"), col("text"))

  private def pairSet(df: DataFrame): Seq[(Long, Long, Double)] =
    df.select(col("d1"), col("d2"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted

  private def verdicts(df: DataFrame): Seq[(Long, Boolean, String)] =
    df.select(col("doc_id"), col("kept"), col("drop_reason")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq.sortBy(_._1)

  test("minhashPairsIndexed == minhashPairsOn: fresh build, after an " +
      "append increment, and after compaction") {
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val path = java.nio.file.Files.createTempDirectory("cs_idx").toString

    VectorOps.writeNeardupIndex(corpus, path)
    assert(pairSet(VectorOps.minhashPairsIndexed(spark, path)) ==
      pairSet(VectorOps.minhashPairsOn(corpus)), "fresh index diverged")

    VectorOps.appendNeardupIndex(batch, path, "b1")
    val wantFull = pairSet(VectorOps.minhashPairsOn(docs))
    assert(pairSet(VectorOps.minhashPairsIndexed(spark, path)) == wantFull,
      "index + increment diverged from the one-shot run")

    VectorOps.compactNeardupIndex(spark, path, numFiles = 2)
    assert(pairSet(VectorOps.minhashPairsIndexed(spark, path)) == wantFull,
      "post-compaction read diverged")
  }

  test("replayed increment re-created after compaction: duplicate set rows " +
      "do not duplicate verified pairs") {
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val path = java.nio.file.Files.createTempDirectory("cs_replay").toString
    VectorOps.writeNeardupIndex(corpus, path)
    VectorOps.appendNeardupIndex(batch, path, "b1")
    VectorOps.compactNeardupIndex(spark, path, numFiles = 2)
    // the at-least-once window: the same increment replays AFTER the
    // compaction folded it into batch=init — every batch doc's set rows
    // now exist twice in sets/
    VectorOps.appendNeardupIndex(batch, path, "b1")
    val batchIds = batch.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val setsDup = spark.read.parquet(s"$path/sets")
      .groupBy(col("doc_id")).count().filter(col("count") > 1).count()
    assert(setsDup > 0, "test setup must actually create duplicated set rows")
    val got = pairSet(VectorOps.minhashPairsIndexed(spark, path))
    assert(got == got.distinct, "verified pairs contain duplicate rows")
    assert(got == pairSet(VectorOps.minhashPairsOn(docs)),
      "replay-window read diverged from the one-shot run")
  }

  test("curateFromState == in-session curateOn, bit-identical on the fixture") {
    val d = Tables.t(spark, Sf0001, "documents")
    val path = java.nio.file.Files.createTempDirectory("cs_state").toString
    TextOps.writeCurateState(d, path)
    // artifacts exist and reasons/ carries one verdict per doc
    assert(spark.read.parquet(s"$path/reasons").count() == d.count())
    assert(verdicts(TextOps.curateFromState(d, path)) ==
      verdicts(TextOps.curateOn(d)),
      "state-backed verdicts diverged from the in-session pipeline")
  }

  test("restart-resume: done ∪ delta == full state-backed run, nothing re-emitted") {
    val d = Tables.t(spark, Sf0001, "documents")
    val path = java.nio.file.Files.createTempDirectory("cs_resume").toString
    TextOps.writeCurateState(d, path)
    val full = TextOps.curateFromState(d, path)
    // the interruption: only half the verdicts made it to the output —
    // the surviving rows ARE the persisted reasons restricted to them
    val done = spark.read.parquet(s"$path/reasons")
      .filter(col("doc_id") % 2 === 0)
    val delta = TextOps.resumeCurateFromState(d, path, done)
    assert(delta.filter(col("doc_id") % 2 === 0).count() == 0,
      "resume re-emitted already-done rows")
    assert(verdicts(done.unionByName(delta)) == verdicts(full),
      "done ∪ delta diverged from the full state-backed run")
    // and the resumed half agrees row-for-row with the persisted reasons
    assert(verdicts(delta) ==
      verdicts(spark.read.parquet(s"$path/reasons")
        .filter(col("doc_id") % 2 === 1)))
  }
}
