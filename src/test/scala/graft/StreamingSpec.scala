package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EventOps
import graft.streaming.EventPipelines

/** Batch/stream parity (Trigger.AvailableNow over static input must equal
  * the batch plan) and the streaming-only semantics: watermark late-data
  * drop and arbitrary stateful processing.
  */
class StreamingSpec extends AnyFunSuite with SparkSessionFixture {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString("|"))

  test("tumbling window: stream (AvailableNow) == batch") {
    val stream = EventPipelines.runAvailableNow(spark,
      EventPipelines.tumbling(EventPipelines.readEvents(spark, Sf0001)),
      "t_tumbling")
    val batch = EventOps.streamTumbling(spark, Sf0001)
    assert(canon(stream) == canon(batch))
  }

  test("sliding window: stream (AvailableNow) == batch") {
    val stream = EventPipelines.runAvailableNow(spark,
      EventPipelines.sliding(EventPipelines.readEvents(spark, Sf0001)),
      "t_sliding")
    val batch = EventOps.streamSliding(spark, Sf0001)
    assert(canon(stream) == canon(batch))
  }

  test("session window: stream (AvailableNow) == batch") {
    val stream = EventPipelines.runAvailableNow(spark,
      EventPipelines.sessions(EventPipelines.readEvents(spark, Sf0001)),
      "t_sessions")
    val batch = EventOps.streamSession(spark, Sf0001)
    assert(canon(stream) == canon(batch))
  }

  test("daily rollup: stream (AvailableNow) == batch on the exact columns") {
    val stream = EventPipelines.runAvailableNow(spark,
      EventPipelines.rollupDaily(EventPipelines.readEvents(spark, Sf0001)),
      "t_rollup_daily")
    // the batch form also carries countDistinct(user_id) — unsupported in
    // streaming aggregation — so parity covers the exact shared columns
    val batch = EventOps.rollupTime(spark, Sf0001)
      .select(col("day_us"), col("event_type"), col("n"), col("sum_value"))
    assert(canon(stream) == canon(batch))
  }

  test("stream-stream interval join (purchase x prior-hour views) == batch") {
    val stream = EventPipelines.runAvailableNow(spark,
      EventPipelines.purchaseViewJoin(
        EventPipelines.readEvents(spark, Sf0001),
        EventPipelines.readEvents(spark, Sf0001)),
      "t_ssjoin", outputMode = "append")
    // batch twin: identical logic over the batch read
    val ev = graft.queries.Tables.t(spark, Sf0001, "events")
    val batch = EventPipelines.purchaseViewJoin(ev, ev)
    assert(canon(stream) == canon(batch))
    assert(stream.count() > 0)
  }

  test("streaming dedup emits one row per (user, type)") {
    val stream = EventPipelines.runAvailableNow(spark,
      EventPipelines.dedup(EventPipelines.readEvents(spark, Sf0001)),
      "t_dedup", outputMode = "append")
    val batch = EventOps.streamDedup(spark, Sf0001)
    // streaming dropDuplicates keeps the first row encountered (arrival
    // order), batch keeps the min-(ts,event_id) row; the KEY SET must match.
    assert(canon(stream.select("user_id", "event_type")) ==
      canon(batch.select("user_id", "event_type")))
  }

  test("watermark drops late rows beyond the delay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val counts = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("n"))
    val q = counts.writeStream.format("memory").queryName("t_late")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    // batch 1: two on-time rows advance the watermark to 11:50
    mem.addData((t("2024-01-01 10:15:00"), 1L), (t("2024-01-01 12:00:00"), 2L))
    q.processAllAvailable()
    // batch 2: a row in the 10:00 window — 10:00-11:00 is fully below the
    // 11:50 watermark, so this late row must be DROPPED
    mem.addData((t("2024-01-01 10:30:00"), 3L))
    q.processAllAvailable()
    // batch 3: push the watermark far ahead so the 10:00 window finalizes
    mem.addData((t("2024-01-01 20:00:00"), 4L))
    q.processAllAvailable()
    q.stop()
    val by = spark.table("t_late").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(by("2024-01-01 10:00:00.0") == 1L, s"late row must not count: $by")
  }

  test("transformWithState: running per-user counts via ValueState (TWS + RocksDB)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    class CountProcessor extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {
      @transient private var count: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
          tv: TimerValues): Iterator[(Long, Long)] = {
        val n = (if (count.exists()) count.get() else 0L) + rows.size
        count.update(n)
        Iterator((key, n))
      }
    }

    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Long)]
      val out = mem.toDS().groupByKey(_._1)
        .transformWithState(new CountProcessor, TimeMode.None(),
          OutputMode.Update(), Encoders.product[(Long, Long)])
        .toDF("user_id", "n")
      val q = out.writeStream.format("memory").queryName("t_tws")
        .outputMode("update").start()
      mem.addData((1L, 10L), (1L, 11L), (2L, 20L))
      q.processAllAvailable()
      mem.addData((1L, 12L), (3L, 30L))
      q.processAllAvailable()
      q.stop()
      // update-mode memory sink appends one row per (batch, key): the
      // latest row per key carries the running count across batches
      val last = spark.table("t_tws").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(last == Map(1L -> 3L, 2L -> 1L, 3L -> 1L), last.toString)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("foreachBatch chunked parquet sink: streaming incremental writes round-trip") {
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-sink")
      .resolve("events.parquet").toString
    val stream = EventPipelines.readEvents(spark, Sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // the streaming twin of Pipeline's bounded-memory chunked sink
        batch.write.mode("append").option("maxRecordsPerFile", 200L).parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val back = spark.read.parquet(outDir)
    assert(back.count() == 1000)
    val files = new java.io.File(outDir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 5, s"chunking should bound records per file, got $files files")
  }

  test("stateful funnel via flatMapGroupsWithState: signup then purchase") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)] // user, type, seq
    val funnel = mem.toDF().toDF("user_id", "event_type", "seq")
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[String, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, events, state: GroupState[String]) =>
          var stage = state.getOption.getOrElse("start")
          val out = scala.collection.mutable.Buffer[(Long, String)]()
          events.toSeq.sortBy(_._3).foreach { case (_, tpe, _) =>
            (stage, tpe) match {
              case ("start", "signup") => stage = "signed"
              case ("signed", "purchase") =>
                stage = "converted"; out += ((user, "converted"))
              case _ => ()
            }
          }
          state.update(stage)
          out.iterator
      }.toDF("user_id", "status")
    val q = funnel.writeStream.format("memory").queryName("t_funnel")
      .outputMode("append").start()
    mem.addData((1L, "signup", 1L), (2L, "view", 1L))
    q.processAllAvailable()
    mem.addData((1L, "purchase", 2L), (2L, "purchase", 2L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_funnel").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSet == Set((1L, "converted")), rows.mkString(","))
  }

  test("streaming daily sketches: watermark-sealed days persist into the " +
      "day= layout; ranged rollup answers from storage; late rows and the " +
      "unsealed head are excluded") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("hll_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hll_stream_ck").toString
    val mem = MemoryStream[(Timestamp, Long)]
    val q = EventPipelines.runDailySketches(
      mem.toDF().toDF("ts", "user_id"), path, ckpt)
    // Instant-based construction: the expected day= labels are UTC, and
    // Timestamp.valueOf parses in the JVM DEFAULT timezone, which
    // nothing in the build pins — this test must be green on any host
    def t(s: String) =
      Timestamp.from(java.time.Instant.parse(s.replace(" ", "T") + "Z"))
    try {
      // days 1-2 arrive, then a day-4 row pushes the watermark past both
      mem.addData(
        (t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 11:00:00"), 2L),
        (t("2024-01-01 12:00:00"), 1L), // dup user within day 1
        (t("2024-01-02 09:00:00"), 3L), (t("2024-01-02 10:00:00"), 4L),
        (t("2024-01-02 11:00:00"), 5L))
      q.processAllAvailable()
      mem.addData((t("2024-01-04 12:00:00"), 9L))
      q.processAllAvailable()
      // a straggler behind the watermark must NOT reopen sealed day 1
      mem.addData((t("2024-01-01 23:00:00"), 99L))
      q.processAllAvailable()
    } finally q.stop()
    // sealed: days 1-2. The day-4 head is ahead of the final watermark —
    // never emitted (the heavyHittersWindowed seal semantics, built-in).
    val dayDirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dayDirs == Set("day=2024-01-01", "day=2024-01-02"),
      s"sealed-day layout: $dayDirs")
    val got = EventOps.distinctFromSketches(spark, path).head
    assert(got.getLong(0) == 5L, s"2+3 distinct users, got ${got.getLong(0)}")
    assert(got.getLong(1) == 2L)
    // ranged read: day 2 only
    val d2 = EventOps.distinctFromSketches(spark, path,
      fromDay = Some("2024-01-02"), untilDay = Some("2024-01-03")).head
    assert(d2.getLong(0) == 3L && d2.getLong(1) == 1L)
    // parity: stream-built sketches estimate exactly like the batch
    // writer over the same sealed rows (HLL registers are max-merged —
    // order-independent)
    val batchPath = java.nio.file.Files.createTempDirectory("hll_batch").toString
    EventOps.writeDailySketches(
      Seq(
        (t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 11:00:00"), 2L),
        (t("2024-01-01 12:00:00"), 1L),
        (t("2024-01-02 09:00:00"), 3L), (t("2024-01-02 10:00:00"), 4L),
        (t("2024-01-02 11:00:00"), 5L)).toDF("ts", "user_id"), batchPath)
    val b = EventOps.distinctFromSketches(spark, batchPath).head
    assert(b.getLong(0) == got.getLong(0) && b.getLong(1) == got.getLong(1))

    // one store, two writers: a batch backfill of a day the stream never
    // saw lands beside the streamed days (same layout + labeling), and
    // the ranged read answers across both without caring who wrote what
    EventOps.writeDailySketches(
      Seq((t("2024-01-03 08:00:00"), 7L), (t("2024-01-03 09:00:00"), 8L))
        .toDF("ts", "user_id"),
      path)
    val mixed = EventOps.distinctFromSketches(spark, path).head
    assert(mixed.getLong(0) == 7L && mixed.getLong(1) == 3L,
      s"streamed days 1-2 (5 users) + backfilled day 3 (2 users): $mixed")
    // an empty range over the mixed store answers 0, not a null trip
    val none = EventOps.distinctFromSketches(spark, path,
      fromDay = Some("2030-01-01"), untilDay = Some("2030-02-01")).head
    assert(none.getLong(0) == 0L && none.getLong(1) == 0L)
  }
}
