package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** UTC calendar-day label of a timestamp ("yyyy-MM-dd"), derived from
    * the epoch — NOT `to_date`, which renders in the SESSION timezone.
    * Every `day=` store (MG summaries, HLL sketches, streamed sketches)
    * labels with this one expression, so day attribution is identical
    * between the batch writers, the streaming window buckets (Spark's
    * `window(ts, "1 day")` is epoch-aligned, i.e. UTC), and any two
    * sessions regardless of their timezone conf. On a UTC session it
    * equals `to_date` exactly (the oracle's CAST(ts AS DATE) semantics).
    *
    * FLOOR, not truncation: pmod's non-negative remainder makes the
    * subtraction land on the day's UTC midnight for negative epochs too
    * (plain `div` would collapse [-1 day, 0) onto 1970-01-01). The
    * division is then of an exact multiple of DayUs, so the double
    * quotient is exact for |ts| < 2^53 µs (years ~1684–2255).
    */
  private[graft] def utcDay(ts: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val us = unix_micros(ts)
    date_add(lit(java.sql.Date.valueOf("1970-01-01")),
      ((us - pmod(us, lit(DayUs))) / lit(DayUs)).cast(IntegerType))
      .cast(StringType)
  }

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

  // --------------------------------------------------- funnel analysis

  /** Ordered-step funnel (signup → view → purchase): each step counts only
    * if it happens strictly AFTER the user's previous step and within a
    * 24-hour conversion window of it (real funnels always carry a step
    * deadline — and it is what creates drop-off).
    *
    * Step semantics are GREEDY FIRST-QUALIFYING-EVENT (the Amplitude-style
    * convention, not exists-a-chain): step k anchors on the EARLIEST
    * event satisfying step k−1's window, and step k+1's window is measured
    * from that anchor only. A user whose purchase falls within 24 h of a
    * LATER view — but outside the window of the earliest qualifying
    * view — counts as stage 2, even though some ordered chain exists.
    * The oracle SQL encodes the identical greedy rule, so this is a
    * documented convention, not an engine divergence; exists-a-chain
    * semantics would need a per-user ordered scan (window/UDAF) instead
    * of the partial-aggregatable min-chain below.
    *
    * The sequencing is three min-aggregations chained by user_id joins —
    * every shuffle is on the same key, so at scale the exchanges line up
    * (no re-partition between steps) and each step's input shrinks to the
    * surviving cohort. No window over the whole user timeline is needed —
    * the per-step aggregate is partial-aggregatable (map-side combine),
    * which a row_number() formulation would forfeit.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tsu"))
    val t1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t1"))
    val t2 = ev.filter(col("event_type") === "view")
      .join(t1, Seq("user_id"))
      .filter(col("tsu") > col("t1") && col("tsu") <= col("t1") + lit(DayUs))
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id"))
      .filter(col("tsu") > col("t2") && col("tsu") <= col("t2") + lit(DayUs))
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t3"))
    ev.select(col("user_id")).distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(
        when(col("t3").isNotNull, lit(3L))
          .when(col("t2").isNotNull, lit(2L))
          .when(col("t1").isNotNull, lit(1L))
          .otherwise(lit(0L)).as("funnel_stage"))
      .groupBy(col("funnel_stage"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("funnel_stage"))
  }

  val eventsFunnelSql: String =
    s"""WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
      |t1 AS (SELECT user_id, min(tsu) AS t1 FROM ev
      |       WHERE event_type = 'signup' GROUP BY user_id),
      |t2 AS (SELECT ev.user_id, min(tsu) AS t2 FROM ev JOIN t1 USING (user_id)
      |       WHERE event_type = 'view' AND tsu > t1
      |         AND tsu <= t1 + $DayUs GROUP BY ev.user_id),
      |t3 AS (SELECT ev.user_id, min(tsu) AS t3 FROM ev JOIN t2 USING (user_id)
      |       WHERE event_type = 'purchase' AND tsu > t2
      |         AND tsu <= t2 + $DayUs GROUP BY ev.user_id),
      |u AS (SELECT DISTINCT user_id FROM ev)
      |SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
      |                 WHEN t2 IS NOT NULL THEN 2
      |                 WHEN t1 IS NOT NULL THEN 1
      |                 ELSE 0 END AS BIGINT) AS funnel_stage,
      |  count(*) AS n_users
      |FROM u LEFT JOIN t1 USING (user_id)
      |       LEFT JOIN t2 USING (user_id)
      |       LEFT JOIN t3 USING (user_id)
      |GROUP BY funnel_stage
      |ORDER BY funnel_stage""".stripMargin

  // --------------------------------------------------- cohort retention

  private val WeekUs = 604800000000L

  /** Weekly cohort retention: users bucketed by first-active week, then
    * (cohort, week-offset) distinct-user counts — the triangle matrix
    * behind every retention chart. All bucket math is exact integer µs
    * (`div`, not double division). The cohort week rides a min() window
    * over the user partition — one shuffle by user_id and NO self-join
    * (the agg+join form costs an extra exchange and a join of the events
    * scan against itself) — then one distinct-agg shuffle on the
    * (cohort, offset) pair.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.t(spark, dir, "events")
      .select(col("user_id"),
        expr(s"unix_micros(ts) div $WeekUs").as("wk"))
      .withColumn("cohort_wk", min(col("wk")).over(w))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_wk"), col("offset_wk"))
  }

  val retentionSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) // $WeekUs AS wk FROM events),
       |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id)
       |SELECT cohort_wk, wk - cohort_wk AS offset_wk,
       |  count(DISTINCT user_id) AS n_users
       |FROM ev JOIN cohort USING (user_id)
       |GROUP BY cohort_wk, offset_wk
       |ORDER BY cohort_wk, offset_wk""".stripMargin

  // ------------------------------------------------- SCD2 state history

  /** Slowly-changing-dimension (type 2) intervals from an event stream:
    * collapse each user's consecutive same-state runs, then emit
    * [valid_from, valid_to) ranges (NULL valid_to = current state). Two
    * window passes share one (user_id, ts, event_id) sort — the change
    * filter preserves partitioning AND order, so Catalyst plans a single
    * exchange+sort for both Window nodes. This is the CDC-compaction shape
    * a 100 TB event log rolls into a dimension table.
    */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.t(spark, dir, "events")
      .withColumn("prev_state", lag(col("event_type"), 1).over(w))
      .filter(col("prev_state").isNull || col("event_type") =!= col("prev_state"))
      .withColumn("valid_to_us", lead(unix_micros(col("ts")), 1).over(w))
      // event_id rides along as change provenance AND the ORDER BY
      // tiebreak — (user_id, valid_from_us) alone can tie when two state
      // changes land on the same microsecond
      .select(col("user_id"), col("event_id"), col("event_type").as("state"),
        tsOut(col("ts")).as("valid_from_us"), col("valid_to_us"))
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))
  }

  val scd2IntervalsSql: String =
    """WITH chg AS (
      |  SELECT user_id, event_type AS state, event_id, epoch_us(ts) AS tsu,
      |    lag(event_type) OVER w AS prev_state
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |kept AS (
      |  SELECT user_id, state, event_id, tsu FROM chg
      |  WHERE prev_state IS NULL OR state <> prev_state)
      |SELECT user_id, event_id, state, tsu AS valid_from_us,
      |  lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id)
      |    AS valid_to_us
      |FROM kept
      |ORDER BY user_id, valid_from_us, event_id""".stripMargin

  // ------------------------------------------------- anomaly detection

  /** Daily-volume anomaly flags — the pipeline-monitoring op that guards
    * a 100 TB ingest (a stuck upstream shows up as a volume z-score
    * excursion). `|z| > 2` is tested as a CROSS-MULTIPLIED integer
    * predicate: (x·n − Σx)² > 4·(n·Σx² − (Σx)²) — with population σ² =
    * (n·Σx² − (Σx)²)/n², that is exactly z² > 4 — so both engines compare
    * exact integers and no float rounding can disagree. The squares and
    * cross-products are carried in DECIMAL(38,0) (DuckDB: HUGEINT), not
    * BIGINT: at the ingest scale this op is pitched at, Σx² and dev²
    * blow past Int64 near ~3·10⁹ events/day, while the 38-digit
    * intermediates stay exact to ~10¹⁶ events/day — past any real
    * corpus. One day-bucket aggregate, one broadcast 1-row stats table.
    */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val daily = Tables.t(spark, dir, "events")
      .groupBy((expr(s"unix_micros(ts) div $DayUs") * DayUs).as("day_us"))
      .agg(count(lit(1)).as("n_events"))
    val x = col("n_events").cast(d38)
    val stats = daily.agg(count(lit(1)).cast(d38).as("nd"),
      sum(x).cast(d38).as("s"),
      sum(x * x).cast(d38).as("ss"))
    val dev = x * col("nd") - col("s")
    daily.crossJoin(broadcast(stats))
      .select(col("day_us"), col("n_events"),
        when(dev * dev > (col("nd") * col("ss") - col("s") * col("s")) * 4L,
          lit(1L)).otherwise(lit(0L)).as("is_spike"))
      .orderBy(col("day_us"))
  }

  val eventsAnomalySql: String =
    s"""WITH daily AS (
       |  SELECT (epoch_us(ts) // $DayUs) * $DayUs AS day_us,
       |    count(*) AS n_events
       |  FROM events GROUP BY day_us),
       |stats AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS nd,
       |    CAST(sum(CAST(n_events AS HUGEINT)) AS HUGEINT) AS s,
       |    CAST(sum(CAST(n_events AS HUGEINT) * n_events) AS HUGEINT) AS ss
       |  FROM daily)
       |SELECT day_us, n_events,
       |  CAST(CASE WHEN (CAST(n_events AS HUGEINT) * nd - s)
       |                 * (CAST(n_events AS HUGEINT) * nd - s)
       |                 > (nd * ss - s * s) * 4
       |            THEN 1 ELSE 0 END AS BIGINT) AS is_spike
       |FROM daily CROSS JOIN stats
       |ORDER BY day_us""".stripMargin

  // ------------------------------------ frequent-items sketch rollup

  /** Daily Misra–Gries summaries merged to a global event-type top-10 —
    * the frequencies analogue of [[Aggregates.aggHllMerge]]'s sketch
    * rollup: a production pipeline stores one ≤ m-entry summary per
    * day/partition and answers "top items overall" by MERGING summaries
    * (PODS'12 rule via [[graft.functions.TopKFreq.merge]]), never
    * rescanning raw events. The per-day summaries build as PER-TASK
    * PARTIALS through the typed-Aggregator path (the same
    * ObjectHashAggregate shape as [[TextOps.topkSketch]]): every task
    * folds its slice of a day into a ≤ m-counter buffer and only buffers
    * shuffle — at 100 TB a day is billions of rows across thousands of
    * tasks and no task ever materializes one (the r10 `mapGroups` form
    * did exactly that — one executor sorted a whole day). Day summaries
    * merge on the driver in day order — ≤ days × m entries by
    * construction. The fixture stream has 5 event types over ~30 days,
    * so m = 64 is the EXACT regime (per-day and merged vocab fit, and MG
    * is order/layout-independent there — UdafSpec pins layout invariance
    * for this rollup) and the query carries a full DuckDB oracle; the
    * lossy regime's counter values are partition-dependent like every
    * mergeable sketch, bounded by the pinned n/(m+1) law.
    */
  def topkMergeDaily(spark: SparkSession, dir: String): DataFrame =
    topkMergeDailyOn(Tables.t(spark, dir, "events"))

  /** Engine surface of [[topkMergeDaily]] over any (ts, event_type)
    * frame; exposed for the spec's layout-invariance law.
    */
  def topkMergeDailyOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val mg = new graft.functions.TopKFreq(64)
    val merged = dailySummaries(events, mg).collect().sortBy(_._1).map(_._2)
      .foldLeft(Map.empty[String, Long])(mg.merge)
    merged.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
      .toDF("event_type", "est")
      .orderBy(col("est").desc, col("event_type"))
  }

  /** The per-day summary aggregation of [[topkMergeDailyOn]] — exposed
    * so the spec can pin its PLAN (partial-mode ObjectHashAggregate, no
    * MapGroups) and its exact-regime layout invariance directly on the
    * production dataflow.
    */
  private[graft] def dailySummaries(events: DataFrame,
      mg: graft.functions.TopKFreq): Dataset[(String, Map[String, Long])] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(utcDay(col("ts")).as("day"), col("event_type"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(mg.toColumn)
  }

  val topkMergeDailySql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS est
      |FROM events GROUP BY event_type
      |ORDER BY est DESC, event_type LIMIT 10""".stripMargin

  /** Persist per-day MG summaries under `path/day=<day>` — the durable
    * form of the rollup's design: a pipeline stores ONE ≤ m-entry
    * summary per day as it lands (each day's dir written independently,
    * so backfilling or re-running a day overwrites only that day — the
    * `batch=` replay discipline, keyed by day), and every later "top
    * items over [range]" answer reads summaries, never raw events.
    */
  def writeDailySummaries(events: DataFrame, path: String,
      m: Int = 64): Unit =
    dailySummaryRows(events, m)
      // dynamic overwrite: only the days present in THIS batch are
      // replaced — a backfill rewrites its own day dirs and leaves the
      // rest of the history untouched (replay-idempotent per day)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(path)

  /** The (day, tok, est) rows [[writeDailySummaries]] persists, exposed
    * so RollupProfile can time the aggregate against the noop sink
    * separately from the parquet commit.
    */
  private[graft] def dailySummaryRows(events: DataFrame, m: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    dailySummaries(events, new graft.functions.TopKFreq(m))
      .flatMap { case (day, summary) =>
        summary.toSeq.map { case (tok, est) => (day, tok, est) }
      }
      .toDF("day", "tok", "est")
      // one task per day: the frame is ≤ days × m rows, but a single
      // writer would create the 30 day dirs SEQUENTIALLY (file open +
      // commit each) — day-hash distribution writes them in parallel
      // (measured 2.6 s → ~1 s on the 30-day fixture)
      .repartition(col("day"))
  }

  /** Global top-k from PERSISTED day summaries ([[writeDailySummaries]]):
    * reads ≤ days × m rows, folds each day's rows back into its summary
    * map and merges in day order ([[graft.functions.TopKFreq.merge]]) —
    * the raw event stream is never rescanned, which is the entire point
    * of storing mergeable sketches at 100 TB. Exact whenever each day's
    * vocabulary fit its budget (then summaries ARE the counts and the
    * merge is a pointwise sum); lossy regime carries the PODS'12 bound.
    *
    * `fromDay`/`untilDay` (inclusive/exclusive ISO dates) answer the
    * production ask "top items over [d1, d2)": the range lands as a
    * filter on the `day=` PARTITION column, so the read lists and scans
    * only the requested days' dirs — with years of history on disk a
    * one-week rollup touches seven files, not the archive
    * ([[summariesRange]] is the scan, exposed for the plan pin).
    */
  def topkFromSummaries(spark: SparkSession, path: String,
      k: Int = 10, m: Int = 64, fromDay: Option[String] = None,
      untilDay: Option[String] = None): DataFrame = {
    import spark.implicits._
    val mg = new graft.functions.TopKFreq(m)
    val days = summariesRange(spark, path, fromDay, untilDay)
      .select(col("day"), col("tok"), col("est"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.map(r => r._2 -> r._3).toMap }
    val merged = days.foldLeft(Map.empty[String, Long])(mg.merge)
    merged.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
      .toDF("event_type", "est")
      .orderBy(col("est").desc, col("event_type"))
  }

  /** The day-ranged summary scan behind [[topkFromSummaries]] — a plain
    * comparison on the `day=` partition column (ISO dates order
    * lexicographically), which Catalyst turns into partition pruning at
    * file listing. Exposed so the spec pins PartitionFilters on the
    * executed plan, the [[graft.operators.Ivf.searchIndex]] discipline.
    */
  private[graft] def summariesRange(spark: SparkSession, path: String,
      fromDay: Option[String], untilDay: Option[String]): DataFrame = {
    dayRanged(spark.read
      .schema("tok STRING, est BIGINT, day STRING").parquet(path),
      fromDay, untilDay)
  }

  /** The `[fromDay, untilDay)` fold over a `day=`-partitioned store —
    * ONE owner of the pruning law for both rollup families, so a
    * boundary fix can never apply to one and silently skip the other.
    */
  private def dayRanged(df: DataFrame, fromDay: Option[String],
      untilDay: Option[String]): DataFrame = {
    val lo = fromDay.map(d => col("day") >= d)
    val hi = untilDay.map(d => col("day") < d)
    (lo.toSeq ++ hi.toSeq).foldLeft(df)(_.filter(_))
  }

  // ------------------------------------ persisted daily HLL sketches

  /** Persist one HLL sketch of distinct users per day under
    * `path/day=<day>` — the distinct-count twin of
    * [[writeDailySummaries]], completing the "answer rollups from
    * storage, never rescan raw" posture for both mergeable-sketch
    * families. Each day's sketch builds through partial aggregation
    * (Datasketches HLL buffers merge map-side, so tasks shuffle ≤ one
    * ~2^lgK-register buffer each, never rows), and dynamic partition
    * overwrite makes a day's backfill rewrite only its own dir — the
    * same per-day replay discipline as the MG pair.
    */
  def writeDailySketches(events: DataFrame, path: String,
      lgK: Int = 12): Unit =
    dailySketchRows(events, lgK)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(path)

  /** The (day, sk) rows [[writeDailySketches]] persists — see
    * [[dailySummaryRows]].
    */
  private[graft] def dailySketchRows(events: DataFrame, lgK: Int): DataFrame =
    events
      .groupBy(utcDay(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"))
      .repartition(col("day"))

  /** Distinct-user estimate over stored day sketches
    * ([[writeDailySketches]]): union the (≤ days, KB-sized) sketches and
    * estimate — raw events are never rescanned. `fromDay`/`untilDay`
    * range-prune on the `day=` partition column exactly as
    * [[topkFromSummaries]]. Returns one row (approx_users, n_days);
    * accuracy is the standard HLL ~1.04/√2^lgK relative error, spec-
    * bounded against the exact distinct count.
    */
  def distinctFromSketches(spark: SparkSession, path: String,
      fromDay: Option[String] = None, untilDay: Option[String] = None)
      : DataFrame =
    dayRanged(spark.read.schema("sk BINARY, day STRING").parquet(path),
      fromDay, untilDay)
      // a range matching zero stored days must answer 0, not a NULL
      // aggregate the caller's .getLong trips over
      .agg(coalesce(hll_sketch_estimate(hll_union_agg(col("sk"))), lit(0L))
          .as("approx_users"),
        count(lit(1)).as("n_days"))

  /** Contract surface of the r12 storage-rollup posture, end-to-end:
    * persist per-day MG summaries to a scratch dir, then answer "top
    * event types over [min_day+7, min_day+14)" FROM STORAGE through the
    * day-range partition-pruned read ([[topkFromSummaries]]) — the write
    * AND the ranged rollup both inside the oracled query, so the whole
    * store-then-answer path is hash-verified against DuckDB counting raw
    * events (exact regime: each day's 5-type vocabulary fits m = 64, so
    * summaries are counts and the merge is a pointwise sum).
    */
  def topkRange(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.t(spark, dir, "events")
    val tmp = scratchDir(spark, "graft_topk_range")
    try {
      writeDailySummaries(events, tmp)
      // min day from the store's OWN day= listing — the write already
      // saw every row, so a second events scan just to learn the first
      // day would be a wasted job
      val d0 = minStoredDay(spark, tmp)
      // topkFromSummaries collects and returns a LOCAL frame, so the
      // scratch store can be deleted before returning (a bench run
      // must not leak a rollup store into /tmp per invocation)
      topkFromSummaries(spark, tmp, k = 10,
        fromDay = Some(d0.plusDays(7).toString),
        untilDay = Some(d0.plusDays(14).toString))
    } finally deleteRecursively(spark, tmp)
  }

  /** Scratch root for the store-then-answer contract queries. The day
    * stores are written BY EXECUTORS (parquet task commits), so on any
    * distributed deployment the root must live on a filesystem every
    * executor and the driver share — a driver-local `java.io.tmpdir`
    * path would scatter task files across hosts' local disks and the
    * follow-up read would see a partial (or empty) store. Resolution:
    * the `spark.graft.scratchDir` conf key when set (point it at HDFS/
    * object storage on a cluster), else the SQL warehouse dir — shared
    * by construction on a deployed cluster, `./spark-warehouse` under
    * local mode. A UUID leaf keeps concurrent invocations disjoint; the
    * caller deletes the leaf in `finally`.
    */
  private[graft] def scratchDir(spark: SparkSession, prefix: String): String = {
    val root = spark.conf.getOption("spark.graft.scratchDir")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir"))
    val dir = s"$root/_scratch/$prefix-${java.util.UUID.randomUUID()}"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
    dir
  }

  private[graft] def deleteRecursively(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Earliest `day=` partition of a day store — one directory listing,
    * no Spark job.
    */
  private def minStoredDay(spark: SparkSession,
      path: String): java.time.LocalDate = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val days = fs.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith("day=")).map(_.stripPrefix("day=")).toSeq
    require(days.nonEmpty, s"$path holds no day= partitions")
    java.time.LocalDate.parse(days.min)
  }

  val topkRangeSql: String =
    """WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS est
      |FROM events, b
      |WHERE CAST(ts AS DATE) >= d0 + INTERVAL 7 DAY
      |  AND CAST(ts AS DATE) < d0 + INTERVAL 14 DAY
      |GROUP BY event_type
      |ORDER BY est DESC, event_type LIMIT 10""".stripMargin

  /** The distinct-count twin end-to-end: persist per-day HLL sketches,
    * answer "distinct users over [min_day+7, min_day+14)" by unioning
    * the stored sketches ([[distinctFromSketches]]). Sketch internals
    * are engine-specific → no SQL oracle; Containment records the
    * relative error against the exact ranged distinct count per round.
    */
  def distinctDays(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.t(spark, dir, "events")
    val tmp = scratchDir(spark, "graft_distinct_days")
    try {
      writeDailySketches(events, tmp)
      val d0 = minStoredDay(spark, tmp)
      // distinctFromSketches is lazy over the scratch store — collect
      // its one row before the store is deleted, return it locally
      val r = distinctFromSketches(spark, tmp,
        fromDay = Some(d0.plusDays(7).toString),
        untilDay = Some(d0.plusDays(14).toString)).head
      import spark.implicits._
      Seq((r.getLong(0), r.getLong(1))).toDF("approx_users", "n_days")
    } finally deleteRecursively(spark, tmp)
  }

  // ------------------------------------------------ touch attribution

  /** Last-touch revenue attribution: each purchase is credited to the
    * SAME user's most recent prior touch (click or view — ties on equal
    * timestamps break to the larger event_id, deterministically), then
    * rolled up to (purchase day, touch type) — the classic marketing /
    * session-labeling pass, and relationally the per-purchase as-of
    * lookup q_join_asof runs per-key. Purchases with no prior touch are
    * excluded (documented: attribution answers "which touch", not
    * "how much revenue total" — q_rollup_time answers that).
    *
    * Exactness: values ride the [[Det.money]] decimal (exact sums in
    * any order), days via [[utcDay]]'s integer µs arithmetic, and the
    * last-touch pick is a row_number over (ts, event_id) — unique by
    * event_id, so rank 1 is deterministic cross-engine.
    *
    * Scale: the touch×purchase join is keyed by user_id (per-user
    * bounded work, never a global product), the window is keyed by
    * purchase id, and the final rollup is map-side-combinable over
    * days × touch types.
    */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame =
    eventsAttributionOn(Tables.t(spark, dir, "events"))

  /** [[eventsAttribution]] over any events frame — the engine surface:
    * conversion and touch types are the caller's taxonomy.
    */
  def eventsAttributionOn(ev: DataFrame,
      conversionType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view")): DataFrame = {
    val purchases = ev.filter(col("event_type") === conversionType)
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_id"), money(col("value")).as("v"))
    val touches = ev.filter(col("event_type").isin(touchTypes.map(x => x: Any): _*))
      .select(col("user_id"), col("ts").as("t_ts"),
        col("event_id").as("t_id"), col("event_type").as("touch_type"))
    val w = Window.partitionBy(col("p_id"))
      .orderBy(col("t_ts").desc, col("t_id").desc)
    purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(utcDay(col("p_ts")).as("day"), col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        out(sum(col("v"))).as("attributed_value"))
      .orderBy(col("day"), col("touch_type"))
  }

  val eventsAttributionSql: String =
    s"""WITH p AS (
       |  SELECT user_id, ts AS p_ts, event_id AS p_id,
       |         ${Sql.money("value")} AS v
       |  FROM events WHERE event_type = 'purchase'),
       |t AS (
       |  SELECT user_id, ts AS t_ts, event_id AS t_id,
       |         event_type AS touch_type
       |  FROM events WHERE event_type IN ('click', 'view')),
       |ranked AS (
       |  SELECT p.p_id, p.p_ts, p.v, t.touch_type,
       |    row_number() OVER (PARTITION BY p.p_id
       |                       ORDER BY t.t_ts DESC, t.t_id DESC) AS rn
       |  FROM p JOIN t ON p.user_id = t.user_id AND t.t_ts < p.p_ts)
       |SELECT strftime(make_timestamp((epoch_us(p_ts) // $DayUs) * $DayUs),
       |    '%Y-%m-%d') AS day,
       |  touch_type, count(*) AS n_purchases,
       |  ${Sql.out("sum(v)")} AS attributed_value
       |FROM ranked WHERE rn = 1
       |GROUP BY day, touch_type
       |ORDER BY day, touch_type""".stripMargin

  val all: Seq[ContractQuery] = Seq(
    ContractQuery("q_events_attribution", eventsAttribution,
      Some(eventsAttributionSql)),
    ContractQuery("q_topk_merge", topkMergeDaily, Some(topkMergeDailySql)),
    ContractQuery("q_topk_range", topkRange, Some(topkRangeSql)),
    ContractQuery("q_distinct_days", distinctDays, None),
    ContractQuery("q_stream_tumbling", streamTumbling, Some(streamTumblingSql)),
    ContractQuery("q_stream_sliding", streamSliding, Some(streamSlidingSql)),
    ContractQuery("q_stream_session", streamSession, Some(streamSessionSql)),
    ContractQuery("q_stream_dedup", streamDedup, Some(streamDedupSql)),
    ContractQuery("q_stream_join", streamJoin, Some(streamJoinSql)),
    ContractQuery("q_sessionize", sessionize, Some(sessionizeSql)),
    ContractQuery("q_rollup_time", rollupTime, Some(rollupTimeSql)),
    ContractQuery("q_events_funnel", eventsFunnel, Some(eventsFunnelSql)),
    ContractQuery("q_retention", retention, Some(retentionSql)),
    ContractQuery("q_scd2_intervals", scd2Intervals, Some(scd2IntervalsSql)),
    ContractQuery("q_events_anomaly", eventsAnomaly, Some(eventsAnomalySql))
  )
}
