package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Tables, VectorOps}
import graft.streaming.NeardupStream

/** Streaming near-dup dedup (NeardupStream) against the batch SimHash
  * truth: the per-row signature must be bit-identical to the batch
  * aggregate signature, and the stateful banded pipeline must find
  * exactly the batch pair set — including pairs whose members arrive in
  * different micro-batches (the whole point of the state).
  */
class StreamingNeardupSpec extends AnyFunSuite with SparkSessionFixture {

  test("per-row simhash expression == batch 64-buffer aggregate signature") {
    val docs = Tables.t(spark, Sf0001, "documents")
    val batch = VectorOps.simhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = docs
      .select(col("doc_id"), NeardupStream.simhashCol(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow.size == 500)
    assert(perRow == batch)
  }

  test("streamed pairs across two micro-batches == batch dedup_simhash") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val want = VectorOps.dedupSimhash(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(want.nonEmpty, "fixture must contain planted near-dups")

    // Split so at least one known pair spans the batch boundary: its d1
    // arrives in batch 1, its d2 in batch 2 — found only via state. The
    // even/odd split below puts even ids in batch 1, so the planted
    // pair must have an even d1 (want's ordering shifts whenever the
    // derived banding finds more pairs — r18).
    val planted = want.find(p => p._1 % 2 == 0 && p._1 != p._2).get
    val (lo, hi) = (planted._1, planted._2)
    val docs = Tables.t(spark, Sf0001, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val batch1 = docs.filter(d => d._1 % 2 == 0 && d._1 != hi)
    val batch2 = docs.filterNot(batch1.contains)
    assert(batch1.exists(_._1 == lo) && batch2.exists(_._1 == hi))

    val input = MemoryStream[(Long, String)]
    // match the banding the batch form DERIVES at this corpus size
    // (8×8 below ~524k docs — BandedHamming.simhashBanding, r18); the
    // stream twin keeps an explicit knob because an unbounded stream
    // cannot be counted
    val (batchBands, _) = graft.operators.BandedHamming.simhashBanding(500L)
    val pairs = NeardupStream.pairsStream(
      input.toDF().toDF("doc_id", "text"), bands = batchBands)
    val q = pairs.writeStream.format("memory").queryName("nd_stream")
      .outputMode("append").start()
    try {
      input.addData(batch1.toSeq)
      q.processAllAvailable()
      val afterB1 = spark.table("nd_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!afterB1.contains((lo, hi)),
        "the planted cross-batch pair must not exist before batch 2")

      input.addData(batch2.toSeq)
      q.processAllAvailable()
      // A pair agreeing on several bands emits once per band — dedup on
      // collect (documented caveat; batch `pairs` dedups with distinct).
      val got = spark.table("nd_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want)
      assert(got.contains(planted))
    } finally q.stop()
  }

  test("NULL text -> NULL signature; null docs emit no pairs") {
    import spark.implicits._
    val df = Seq((1L, Option("a b c")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val sigs = df
      .select(col("doc_id"), NeardupStream.simhashCol(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(sigs(1L).isDefined && sigs(2L).isEmpty)
    // two null docs must NOT collide on an all-zero signature
    // (flatMapGroupsWithState runs in batch mode with empty state)
    val nulls = Seq((3L, Option.empty[String]), (4L, Option.empty[String]))
      .toDF("doc_id", "text")
    assert(NeardupStream.pairsStream(nulls).count() == 0)
  }

  test("bucket state survives a query restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("nd_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("nd_out").toString
    val input = MemoryStream[(Long, String)]
    val pairs = NeardupStream.pairsStream(input.toDF().toDF("doc_id", "text"))
    // memory sink cannot recover from a checkpoint — a durable sink is
    // what a restartable production pipeline writes to anyway
    def start() = pairs.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val doc = "the quick brown fox jumps over the lazy dog again and again"

    val q1 = start()
    try {
      input.addData(Seq((1L, doc)))
      q1.processAllAvailable()
    } finally q1.stop()

    // the restarted query must find the cross-restart pair — possible
    // only if doc 1's bucket members were recovered from the state store
    val q2 = start()
    try {
      input.addData(Seq((2L, doc + " tail")))
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((1L, 2L)),
        s"pair across restart not found (state lost?): $got")
    } finally q2.stop()
  }

  test("watermarked stream: in-window pairs survive, late-late pairs are " +
      "lost, and ONLY those — the exact loss bound") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    val aText = "the quick brown fox jumps over the lazy dog every single day"
    val cText = "completely different words about spark shuffle partitioning here now"

    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val pairs = NeardupStream.pairsStreamWatermarked(
      input.toDF().toDF("doc_id", "text", "ts"), delay = "10 minutes")
    val q = pairs.writeStream.format("memory").queryName("nd_wm")
      .outputMode("append").start()
    try {
      // batch 1: A and A' arrive 5 min apart — inside the delay window
      input.addData(Seq((1L, aText, ts("10:00")), (2L, aText + " tail", ts("10:05"))))
      q.processAllAvailable()
      // batch 2: C advances the watermark to 10:50 (11:00 − 10 min)
      input.addData(Seq((3L, cText, ts("11:00"))))
      q.processAllAvailable()
      // batch 3: B is byte-identical to A (hamming 0 — every band agrees,
      // so content can NEVER be why its pairs are missed) but arrives
      // with ts < watermark — dropped as late, so (A, B)/(A', B) are the
      // late-late pairs lost; D is byte-identical to C and inside the
      // window — found via state
      input.addData(Seq(
        (4L, aText, ts("10:00")),
        (5L, cText, ts("10:55"))))
      q.processAllAvailable()
      val got = spark.table("nd_wm")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 2L), (3L, 5L)),
        s"watermark loss bound violated: $got")
    } finally q.stop()
  }

  test("bucket cap: late arrivals still match retained members; late-late pairs lost") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 5 identical docs → every band bucket is the same degenerate
    // population. Cap 3: ids 1..3 are retained, 4 and 5 only probe, so
    // every pair except (4,5) is found — degraded but bounded, exactly
    // the documented posture.
    val input = MemoryStream[(Long, String)]
    val pairs = NeardupStream.pairsStream(
      input.toDF().toDF("doc_id", "text"), maxBucket = 3)
    val q = pairs.writeStream.format("memory").queryName("nd_cap")
      .outputMode("append").start()
    try {
      input.addData((1L to 5L).map(i => (i, "same boilerplate text here")))
      q.processAllAvailable()
      val got = spark.table("nd_cap")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val all = (for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)).toSet
      assert(got == all - ((4L, 5L)))
    } finally q.stop()
  }
}
