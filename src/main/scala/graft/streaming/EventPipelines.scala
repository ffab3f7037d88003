package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming twins of the batch event queries (SURVEY.md §2.E).
  *
  * Design rule: batch/stream parity. Each pipeline here is the same
  * logical plan as its `graft.queries.EventOps` batch form, driven by
  * `readStream` + `Trigger.AvailableNow` — which Structured Streaming
  * guarantees produces the batch answer over static input. StreamingSpec
  * asserts that equality, plus the streaming-only semantics (watermark
  * late-data drop, stateful processing) that have no batch analog.
  *
  * At scale these run with watermark-bounded state in the RocksDB state
  * store; the fixed event-time watermark below is what bounds state for
  * windows/dedup on an unbounded stream.
  */
object EventPipelines {

  /** The events schema as a streaming source requires it declared. `ts` is
    * declared per fixture flavor by [[readEvents]]: LongType for the
    * TIMESTAMP(NANOS) flavor (truncated to µs in the plan), TimestampType
    * for the TIMESTAMP(MICROS) flavor (read directly).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** [[rawSchema]] with `ts` already a TimestampType — the µs-flavor read. */
  val microsSchema: StructType = StructType(rawSchema.map {
    case StructField("ts", _, n, m) => StructField("ts", TimestampType, n, m)
    case f => f
  })

  /** Streaming scan of an events parquet directory, flavor-aware like the
    * batch loader (graft.queries.Tables.loadEvents): a one-footer batch
    * sniff picks the declared stream schema. µs-flavor files are read with
    * an explicit TimestampType `ts` (stored µs == epoch µs, independent of
    * session timezone); ns-flavor files are read as raw ns LONG — the
    * nanosAsLong conf is set/restored around source construction, same
    * leak discipline as the batch loader — and truncated to µs in-plan.
    * Either way downstream pipelines see one canonical TimestampType `ts`.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val microsFlavor =
      scala.util.Try(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType)
        .toOption.exists(t => t == TimestampType || t == TimestampNTZType)
    if (microsFlavor)
      spark.readStream.schema(microsSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
    else {
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try
        spark.readStream.schema(rawSchema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Tumbling 1h window counts/sums with a 10-minute watermark. */
  def tumbling(events: DataFrame): DataFrame = {
    import graft.queries.Det._
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), out(sum(money(col("value")))).as("sum_value"))
      .select(tsOut(col("w.start")).as("wstart_us"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Sliding 1h windows every 15 min, count per window (matches the
    * batch q_stream_sliding shape).
    */
  def sliding(events: DataFrame): DataFrame = {
    import graft.queries.Det._
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(tsOut(col("w.start")).as("wstart_us"), col("n"))
  }

  /** Per-user 30-minute-gap session windows. */
  def sessions(events: DataFrame): DataFrame = {
    import graft.queries.Det._
    events.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), tsOut(col("w.start")).as("session_start_us"),
        tsOut(col("w.end")).as("session_end_us"), col("n_events"))
  }

  /** Calendar-day rollup per event type — the streaming twin of the batch
    * q_rollup_time MINUS the distinct-user column: COUNT(DISTINCT) is
    * unsupported in streaming aggregations, so the stream form carries
    * approx_count_distinct at scale; the parity test compares only the
    * exact columns.
    */
  def rollupDaily(events: DataFrame): DataFrame = {
    import graft.queries.Det._
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), out(sum(money(col("value")))).as("sum_value"))
      .select(tsOut(col("w.start")).as("day_us"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Streaming per-day HLL sketches — the distinct-count twin of
    * [[TopkStream.heavyHittersWindowed]]'s day-scale lifecycle, built
    * from the BUILT-IN windowed-agg machinery instead of custom state
    * (`hll_sketch_agg` buffers are mergeable, so the streaming agg's
    * partial/final split just works): in APPEND mode a day's sketch row
    * is emitted exactly once, when the watermark seals the window —
    * stragglers behind the watermark are dropped, never reopening a
    * sealed day. Feed [[runDailySketches]] to persist each sealed day
    * into [[graft.queries.EventOps.writeDailySketches]]' `day=` layout,
    * and [[graft.queries.EventOps.distinctFromSketches]] answers ranged
    * distinct-user rollups over the LIVE stream's history from storage.
    */
  def dailySketches(events: DataFrame, lgK: Int = 12): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"))
      // label with the shared UTC-day expression, NOT to_date: the
      // window buckets are epoch(=UTC)-aligned, and a session-timezone
      // rendering of the UTC-midnight window start would shift the
      // day= label (and diverge from the batch writer) on any non-UTC
      // session
      .select(graft.queries.EventOps.utcDay(col("w.start")).as("day"),
        col("sk"))

  /** Run [[dailySketches]] into the persisted `day=` sketch layout.
    * Dynamic partition overwrite per day keeps an at-least-once replay
    * idempotent (a re-emitted sealed day rewrites only its own dir),
    * exactly as the batch writer.
    */
  def runDailySketches(events: DataFrame, path: String,
      checkpoint: String, lgK: Int = 12)
      : org.apache.spark.sql.streaming.StreamingQuery =
    dailySketches(events, lgK).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.toDF().repartition(col("day"))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("day").parquet(path)
      }
      .start()

  /** Streaming dedup on (user_id, event_type) within the watermark. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"))

  /** Stream–stream interval join: each purchase matched to the same
    * user's view events in the preceding hour. Both sides carry
    * watermarks and the join predicate carries the time bound — together
    * they let Spark expire view-side state once the watermark passes
    * p_ts, which is what keeps join state finite on an unbounded stream.
    * (Inner-join results are emitted as matches arrive; the watermark
    * affects only state cleanup, so AvailableNow equals the batch join.)
    */
  def purchaseViewJoin(events: DataFrame, events2: DataFrame): DataFrame = {
    import graft.queries.Det._
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "10 minutes")
    val views = events2.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
      .withWatermark("v_ts", "10 minutes")
    purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts"))
      .select(col("p_id"), col("v_id"), col("p_user").as("user_id"),
        tsOut(col("p_ts")).as("p_ts_us"), tsOut(col("v_ts")).as("v_ts_us"))
  }

  /** Run any of the above to completion over static input and return the
    * result (AvailableNow processes everything then stops). Aggregations
    * use "complete" so the windows still ahead of the final watermark are
    * emitted too; dedup streams use "append".
    */
  def runAvailableNow(spark: SparkSession, pipeline: DataFrame,
      queryName: String, outputMode: String = "complete"): DataFrame = {
    val q = pipeline.writeStream
      .format("memory").queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
