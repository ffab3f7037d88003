package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.TopkStream

/** Streaming heavy-hitters monitor (TopkStream): the sharded MG state
  * must accumulate across micro-batches, emit each touched shard's full
  * summary per batch, and — in the exact regime (shard vocabulary ≤ m) —
  * report the true running counts of everything seen so far. The lossy
  * bound itself is TopKFreq's law (UdafSpec); here the contract is the
  * streaming lifecycle: cross-batch accumulation, disjoint shard
  * vocabularies, bounded per-batch emission.
  */
class StreamingTopkSpec extends AnyFunSuite with SparkSessionFixture {

  test("sharded MG state accumulates across batches; exact regime reports true counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val q = TopkStream.heavyHitters(mem.toDF().toDF("tok"),
        m = 64, shards = 4)
      .writeStream.format("memory").queryName("t_topk")
      .outputMode("append").start()
    try {
      val batch1 = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
      val batch2 = Seq.fill(4)("alpha") ++ Seq.fill(2)("delta")
      mem.addData(batch1: _*)
      q.processAllAvailable()
      val after1 = spark.table("t_topk").collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(after1 == Map("alpha" -> 5L, "beta" -> 3L, "gamma" -> 1L))

      mem.addData(batch2: _*)
      q.processAllAvailable()
      // per-batch emissions are cumulative snapshots: the LATEST estimate
      // per token is the running count over both batches
      val latest = spark.table("t_topk").collect()
        .map(r => r.getString(1) -> r.getLong(2))
        .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).max }
      assert(latest == Map(
        "alpha" -> 9L, "beta" -> 3L, "gamma" -> 1L, "delta" -> 2L))

      // shard vocabularies are disjoint: no token reports under two shards
      val perTokShards = spark.table("t_topk").collect()
        .map(r => r.getString(1) -> r.getInt(0)).distinct
        .groupBy(_._1).map { case (t, xs) => t -> xs.length }
      assert(perTokShards.values.forall(_ == 1), s"token in 2 shards: $perTokShards")

      // bounded emission: each batch emitted at most (touched shards × m)
      assert(spark.table("t_topk").count() <= 2L * 4 * 64)
    } finally q.stop()
  }

  test("windowed lifecycle: watermark seals a window into a final snapshot and resets state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400000L
    val hour = 3600000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = TopkStream.heavyHittersWindowed(mem.toDF().toDF("ts", "tok"),
        windowMs = day, delayMs = hour, m = 64, shards = 4)
      .writeStream.format("memory").queryName("t_topk_win")
      .outputMode("append").start()
    try {
      def rows() = spark.table("t_topk_win").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getBoolean(4)))
      // day 0 traffic: alpha×3, beta×1
      mem.addData((ts(1000), "alpha"), (ts(2000), "alpha"), (ts(3000), "alpha"),
        (ts(4000), "beta"))
      q.processAllAvailable()
      assert(rows().toSet == Set((0L, "alpha", 3L, false), (0L, "beta", 1L, false)),
        "open window emits live (closed=false) summaries")

      // day 2 traffic advances the watermark past day-0's end + delay...
      mem.addData((ts(2 * day + 1000), "gamma"))
      q.processAllAvailable()
      // ...and the NEXT batch (timeouts fire against the previous
      // batch's watermark) seals day 0: final snapshot, state removed
      mem.addData((ts(2 * day + 2000), "gamma"))
      q.processAllAvailable()
      val sealedRows = rows().filter(_._4)
      assert(sealedRows.toSet == Set((0L, "alpha", 3L, true), (0L, "beta", 1L, true)),
        s"day-0 must seal with its exact final counts, got ${sealedRows.toSeq}")

      // what the reset drops: a day-0 straggler behind the watermark is
      // discarded by the engine — it neither reopens the sealed window
      // nor starts fresh state, so the snapshot stays uncontradicted
      val day0Before = rows().count(_._1 == 0L)
      mem.addData((ts(5000), "alpha"))
      q.processAllAvailable()
      val after = rows()
      assert(after.count(_._1 == 0L) == day0Before,
        "no new day-0 rows may appear after its window sealed")
      assert(!after.exists(r => r._1 == 0L && r._2 == "alpha" && r._3 > 3L),
        "sealed day-0 counts must never grow")
      assert(after.filter(_._4).toSet == sealedRows.toSet, "exactly one seal per window")
    } finally q.stop()
  }

  test("closed snapshots merge to the batch daily rollup (stream/batch parity)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // two days of typed events, deliberately skewed differently per day
    val day0 = Seq.fill(3)("alpha") ++ Seq.fill(2)("beta") ++ Seq("gamma")
    val day1 = Seq.fill(1)("alpha") ++ Seq.fill(4)("beta") ++ Seq.fill(2)("delta")
    val rows0 = day0.zipWithIndex.map { case (t, i) => (ts(1000L + i), t) }
    val rows1 = day1.zipWithIndex.map { case (t, i) => (ts(day + 1000L + i), t) }

    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = TopkStream.heavyHittersWindowed(mem.toDF().toDF("ts", "tok"),
        windowMs = day, delayMs = 3600000L, m = 64, shards = 4)
      .writeStream.format("memory").queryName("t_topk_par")
      .outputMode("append").start()
    try {
      mem.addData(rows0: _*); q.processAllAvailable()
      mem.addData(rows1: _*); q.processAllAvailable()
      // flush rows in a far window: first advances the watermark past
      // both days, second fires their timeouts (seals)
      mem.addData((ts(10 * day), "flush")); q.processAllAvailable()
      mem.addData((ts(10 * day + 1), "flush")); q.processAllAvailable()

      // consumer contract: per sealed window, union the shard snapshots
      // (disjoint vocab slices); merge windows in order via TopKFreq.merge
      val mg = new graft.functions.TopKFreq(64)
      val closed = spark.table("t_topk_par").collect()
        .filter(r => r.getBoolean(4) && r.getLong(0) < 10 * day)
        .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
      assert(closed.map(_._1).toSet == Set(0L, day), "both days sealed")
      val perWindow = closed.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (_, xs) => xs.map(x => x._2 -> x._3).toMap }
      val merged = perWindow.foldLeft(Map.empty[String, Long])(mg.merge)
      val streamTop = merged.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)

      // the batch twin over the same rows must agree exactly (exact
      // regime): sealed snapshots ARE topkMergeDailyOn's day artifacts
      val batchTop = graft.queries.EventOps.topkMergeDailyOn(
          (rows0 ++ rows1).toDF("ts", "event_type"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(streamTop == batchTop,
        s"stream $streamTop vs batch $batchTop")

      // ...and the snapshots persist straight into the day-summary
      // layout: stream → storage → rollup with no raw-event rescan.
      // (day strings via UTC epoch-days — the session TZ convention)
      val path = java.nio.file.Files.createTempDirectory("topk_stream_days").toString
      closed.toSeq
        .map { case (ws, tok, est) =>
          (java.time.LocalDate.ofEpochDay(ws / day).toString, tok, est)
        }
        .toDF("day", "tok", "est")
        .write.mode("overwrite").partitionBy("day").parquet(path)
      val fromDisk = graft.queries.EventOps.topkFromSummaries(spark, path)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(fromDisk == batchTop,
        "persisted stream snapshots must answer the rollup exactly")
    } finally q.stop()
  }

  test("a hot token floods only its own shard's state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    // m=2: the hot token's shard is under eviction pressure, other
    // shards' summaries must be untouched by it
    val q = TopkStream.heavyHitters(mem.toDF().toDF("tok"),
        m = 2, shards = 8)
      .writeStream.format("memory").queryName("t_topk_hot")
      .outputMode("append").start()
    try {
      mem.addData(Seq.fill(100)("hot") ++ Seq("calm1", "calm2", "calm3"): _*)
      q.processAllAvailable()
      val rows = spark.table("t_topk_hot").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      val hotShard = rows.find(_._2 == "hot").get._1
      // MG undercount bound inside the hot shard: n_shard ≤ 103, m=2 →
      // est ≥ 100 − 103/3; in practice the hot count dominates
      assert(rows.find(_._2 == "hot").get._3 >= 100L - 103L / 3)
      // every calm token in ANOTHER shard is reported exactly once
      rows.filter(t => t._1 != hotShard).foreach { case (_, tok, est) =>
        assert(est == 1L, s"calm token $tok distorted: $est")
      }
    } finally q.stop()
  }
}
