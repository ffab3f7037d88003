package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming-shaped operators in their batch form (SURVEY.md §2.E).
  *
  * Batch/stream parity is the design rule: each query here is the exact
  * logical plan that `graft.streaming.EventPipelines` runs as a
  * Structured-Streaming `readStream` + `Trigger.AvailableNow` job
  * (StreamingSpec asserts stream-result == batch-result). The driver's
  * Verify/Bench harness calls batch APIs, so the batch form is what is
  * declared here.
  *
  * Window starts are emitted as epoch microseconds ([[Det.tsOut]]) — all
  * bucket arithmetic is exact integer µs on both engines.
  */
object EventOps {
  import Det._

  private val HourUs = 3600000000L
  private val SlideUs = 900000000L // 15 minutes
  private val GapUs = 1800000000L  // 30 minutes

  // -------------------------------------------------- tumbling window

  /** One-hour tumbling window counts + sums per event type. */
  def streamTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), out(sum(money(col("value")))).as("sum_value"))
      .select(tsOut(col("w.start")).as("wstart_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("wstart_us"), col("event_type"))

  val streamTumblingSql: String =
    s"""SELECT (epoch_us(ts) // $HourUs) * $HourUs AS wstart_us, event_type,
       |  count(*) AS n, ${Sql.out(s"sum(${Sql.money("value")})")} AS sum_value
       |FROM events
       |GROUP BY wstart_us, event_type
       |ORDER BY wstart_us, event_type""".stripMargin

  // --------------------------------------------------- sliding window

  /** One-hour window sliding every 15 minutes (each event lands in 4
    * windows — Spark's `window()` expansion, mirrored by an explicit
    * 4-bucket unnest in the oracle).
    */
  def streamSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(tsOut(col("w.start")).as("wstart_us"), col("n"))
      .orderBy(col("wstart_us"))

  val streamSlidingSql: String =
    s"""SELECT wstart_us, count(*) AS n
       |FROM (SELECT unnest([(epoch_us(ts) // $SlideUs) * $SlideUs - i * $SlideUs
       |                     for i in range(0, 4)]) AS wstart_us
       |      FROM events)
       |GROUP BY wstart_us
       |ORDER BY wstart_us""".stripMargin

  // --------------------------------------------------- session window

  /** Per-user session windows with a 30-minute inactivity gap. The oracle
    * is the classic gaps-and-islands rewrite (lag + running sum), which is
    * exactly the semantics of Spark's `session_window`: a session ends
    * when the next event is >= gap after the previous EVENT (session end =
    * last event + gap).
    */
  def streamSession(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), tsOut(col("w.start")).as("session_start_us"),
        tsOut(col("w.end")).as("session_end_us"), col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))

  val streamSessionSql: String =
    s"""WITH marked AS (
       |  SELECT user_id, epoch_us(ts) AS tus,
       |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= $GapUs
       |         OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sessions AS (
       |  SELECT user_id, tus,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY tus
       |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM marked)
       |SELECT user_id, min(tus) AS session_start_us,
       |  max(tus) + $GapUs AS session_end_us,
       |  count(*) AS n_events
       |FROM sessions
       |GROUP BY user_id, sid
       |ORDER BY user_id, session_start_us""".stripMargin

  // ------------------------------------------- row-level sessionization

  /** Row-level session assignment — the materialized complement of
    * [[streamSession]]'s per-session aggregate: every event gets its
    * (session_seq, event_seq) within the user's timeline, the form a
    * pipeline persists so downstream joins can group by session. Classic
    * gaps-and-islands: lag to mark session starts, running sum to number
    * them. Shuffles once by user_id; both window functions share one
    * (partition, order) so Catalyst plans a single Window node.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tsu = unix_micros(col("ts"))
    val prev = lag(tsu, 1).over(wOrd)
    Tables.t(spark, dir, "events")
      .withColumn("new_s",
        when(prev.isNull || tsu - prev >= lit(GapUs), 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_s")).over(wRun))
      .withColumn("event_seq", row_number().over(wOrd).cast(LongType))
      .select(col("event_id"), col("user_id"), tsOut(col("ts")).as("ts_us"),
        col("session_seq"), col("event_seq"))
      .orderBy(col("event_id"))
  }

  val sessionizeSql: String =
    s"""WITH marked AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= $GapUs
       |         THEN 1 ELSE 0 END AS new_s,
       |    row_number() OVER w AS event_seq
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
       |SELECT event_id, user_id, ts_us,
       |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq,
       |  event_seq
       |FROM marked
       |ORDER BY event_id""".stripMargin

  // ------------------------------------------------ time-bucket rollup

  private val DayUs = 86400000000L

  /** Calendar-day rollup per event type — the partition-shaped aggregate
    * every event warehouse materializes (at 100 TB this is the query that
    * rides parquet partitioning on date). Exact: day bucket is integer µs
    * arithmetic, value sums ride exact decimal.
    */
  def rollupTime(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        out(sum(money(col("value")))).as("sum_value"))
      .select(tsOut(col("day")).as("day_us"), col("event_type"),
        col("n"), col("n_users"), col("sum_value"))
      .orderBy(col("day_us"), col("event_type"))

  val rollupTimeSql: String =
    s"""SELECT (epoch_us(ts) // $DayUs) * $DayUs AS day_us, event_type,
       |  count(*) AS n, count(DISTINCT user_id) AS n_users,
       |  ${Sql.out(s"sum(${Sql.money("value")})")} AS sum_value
       |FROM events
       |GROUP BY day_us, event_type
       |ORDER BY day_us, event_type""".stripMargin

  // --------------------------------------------------- streaming dedup

  /** First event per (user, type) — the batch twin of `dropDuplicates`
    * within a watermark.
    */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        tsOut(col("ts")).as("ts_us"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val streamDedupSql =
    """SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |                               ORDER BY ts ASC, event_id ASC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // --------------------------------------------- stream–static enrich

  /** Stream–static enrichment join: events against the customer dimension
    * (broadcast at scale; no watermark needed for stream-static).
    */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.t(spark, dir, "customer")
    Tables.t(spark, dir, "events")
      .join(broadcast(c), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), out(sum(money(col("value")))).as("sum_value"))
      .orderBy(col("c_mktsegment"))
  }

  val streamJoinSql: String =
    s"""SELECT c_mktsegment, count(*) AS n_events,
       |  ${Sql.out(s"sum(${Sql.money("value")})")} AS sum_value
       |FROM events JOIN customer ON user_id = c_custkey
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  val all: Seq[ContractQuery] = Seq(
    ContractQuery("q_stream_tumbling", streamTumbling, Some(streamTumblingSql)),
    ContractQuery("q_stream_sliding", streamSliding, Some(streamSlidingSql)),
    ContractQuery("q_stream_session", streamSession, Some(streamSessionSql)),
    ContractQuery("q_stream_dedup", streamDedup, Some(streamDedupSql)),
    ContractQuery("q_stream_join", streamJoin, Some(streamJoinSql)),
    ContractQuery("q_sessionize", sessionize, Some(sessionizeSql)),
    ContractQuery("q_rollup_time", rollupTime, Some(rollupTimeSql))
  )
}
