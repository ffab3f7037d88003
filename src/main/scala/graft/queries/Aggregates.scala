package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational core, part 2 (SURVEY.md §2.B): hash/distinct/approx
  * aggregation, grouping sets/rollup/cube, filtered aggregates, pivot,
  * summary statistics and the window-function family.
  *
  * All aggregates run through exact DECIMAL/BIGINT accumulators (see
  * [[Det]]) so partial+final aggregation over any partitioning yields the
  * identical value — the property that makes the same plan reproducible on
  * a 1000-executor cluster.
  */
object Aggregates {
  import Det._

  private def ts(s: String): Column = lit(s).cast(TimestampType)

  // ---------------------------------------------------------- flagship Q1

  /** TPC-H Q1-shaped multi-aggregate over lineitem (flagship).
    * Averages use the exact scaled-integer scheme of [[Det.avg4]].
    */
  def aggGroup(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.t(spark, dir, "lineitem")
    val disc = money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
    val charge = disc * (lit(1) + rate(col("l_tax")))
    l.filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        out(sum(money(col("l_quantity")))).as("sum_qty"),
        out(sum(money(col("l_extendedprice")))).as("sum_base_price"),
        out(sum(disc)).as("sum_disc_price"),
        out(sum(charge)).as("sum_charge"),
        avg4(sum(moneyInt(col("l_quantity"))), count(lit(1))).as("avg_qty"),
        avg4(sum(moneyInt(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
        avg4(sum(moneyInt(col("l_discount"))), count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val aggGroupSql: String = {
    import Sql._
    s"""SELECT l_returnflag, l_linestatus,
       |  ${out(s"sum(${money("l_quantity")})")} AS sum_qty,
       |  ${out(s"sum(${money("l_extendedprice")})")} AS sum_base_price,
       |  ${out(s"sum(${money("l_extendedprice")} * (1 - ${rate("l_discount")}))")} AS sum_disc_price,
       |  ${out(s"sum(${money("l_extendedprice")} * (1 - ${rate("l_discount")}) * (1 + ${rate("l_tax")}))")} AS sum_charge,
       |  ${avg4(sumMoneyInt("l_quantity"), "count(*)")} AS avg_qty,
       |  ${avg4(sumMoneyInt("l_extendedprice"), "count(*)")} AS avg_price,
       |  ${avg4(sumMoneyInt("l_discount"), "count(*)")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  // ------------------------------------------------------ distinct + HLL

  /** Distinct aggregates (Catalyst expands to the two-phase plan). */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))

  val aggDistinctSql =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** HyperLogLog++ approximate distinct — sketch values are
    * engine-specific, so no SQL oracle; AggregatesSpec bounds the relative
    * error against the exact count instead.
    */
  def aggApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy(col("l_returnflag"))

  // --------------------------------------- grouping sets / rollup / cube

  /** GROUPING SETS ((status, priority), (status), ()) with grouping_id. */
  def aggGsets(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        out(sum(money(col("o_totalprice")))).as("total"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val aggGsetsSql =
    s"""SELECT o_orderstatus, o_orderpriority,
       |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       |  count(*) AS n, ${Sql.out(s"sum(${Sql.money("o_totalprice")})")} AS total
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
       |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** ROLLUP over lineitem discounted revenue. */
  def aggRollup(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.t(spark, dir, "lineitem")
    val disc = money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
    l.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        out(sum(disc)).as("revenue"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  val aggRollupSql =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       |  count(*) AS n,
       |  ${Sql.out(s"sum(${Sql.money("l_extendedprice")} * (1 - ${Sql.rate("l_discount")}))")} AS revenue
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** CUBE over events by (event_type, day). */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "events")
      .withColumn("day_us", tsOut(date_trunc("day", col("ts"))))
      .cube(col("event_type"), col("day_us"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
      .orderBy(col("gid"), col("event_type").asc_nulls_first,
        col("day_us").asc_nulls_first)

  val aggCubeSql =
    """SELECT event_type, day_us,
      |  CAST(grouping_id(event_type, day_us) AS BIGINT) AS gid, count(*) AS n
      |FROM (SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us FROM events)
      |GROUP BY CUBE (event_type, day_us)
      |ORDER BY gid, event_type ASC NULLS FIRST, day_us ASC NULLS FIRST""".stripMargin

  // ------------------------------------------- filtered agg + HAVING

  /** Conditional aggregates + HAVING over per-customer orders. */
  def aggHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
        out(sum(money(col("o_totalprice")))).as("total"))
      .filter(col("n_orders") > 12)
      .orderBy(col("o_custkey"))

  val aggHavingSql =
    s"""SELECT o_custkey, count(*) AS n_orders,
       |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       |  ${Sql.out(s"sum(${Sql.money("o_totalprice")})")} AS total
       |FROM orders
       |GROUP BY o_custkey
       |HAVING count(*) > 12
       |ORDER BY o_custkey""".stripMargin

  // --------------------------------------------------------------- pivot

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot event counts into one column per event type. */
  def pivotQ(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.t(spark, dir, "events")
      .withColumn("bucket", col("user_id") % 10)
      .groupBy(col("bucket"))
      .pivot("event_type", eventTypes)
      .count()
    eventTypes.foldLeft(p) { (df, t) =>
      df.withColumn(t, coalesce(col(t), lit(0L)))
    }.orderBy(col("bucket"))
  }

  val pivotSql: String = {
    val cells = eventTypes.map(t =>
      s"CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS $t")
    s"""SELECT user_id % 10 AS bucket, ${cells.mkString(", ")}
       |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  // --------------------------------------------------------------- stats

  /** Universal summary statistics. stddev is recomputed from exact decimal
    * sums (sqrt((Σx² − (Σx)²/n)/(n−1))) with an op ordering mirrored in the
    * oracle, because native stddev accumulates doubles in partition order.
    */
  def statsSummary(spark: SparkSession, dir: String): DataFrame = {
    def stats(c: String, p: String): Seq[Column] = {
      val s1 = sum(money(col(c))).cast(DoubleType)
      val s2 = sum(money(col(c)) * money(col(c))).cast(DoubleType)
      val n = count(lit(1))
      Seq(
        min(col(c)).as(s"${p}_min"),
        max(col(c)).as(s"${p}_max"),
        avg4(sum(moneyInt(col(c))), n).as(s"${p}_avg"),
        round(sqrt((s2 - s1 * s1 / n) / (n - lit(1))), 4).as(s"${p}_std"))
    }
    Tables.t(spark, dir, "lineitem")
      .agg(count(lit(1)).as("n"),
        (stats("l_quantity", "qty") ++ stats("l_extendedprice", "price")): _*)
  }

  val statsSummarySql: String = {
    def stats(c: String, p: String): String = {
      val s1 = s"CAST(sum(${Sql.money(c)}) AS DOUBLE)"
      // DECIMAL(19,4) operands force DuckDB onto int128 storage (width<=18
      // stays int64 and the multiply overflows); the value is the same
      // exact square Spark computes at (12,4)x(12,4) -> (25,8).
      val s2 = s"CAST(sum(CAST($c AS DECIMAL(19,4)) * CAST($c AS DECIMAL(19,4))) AS DOUBLE)"
      s"""min($c) AS ${p}_min, max($c) AS ${p}_max,
         |  ${Sql.avg4(Sql.sumMoneyInt(c), "count(*)")} AS ${p}_avg,
         |  round(sqrt(($s2 - $s1 * $s1 / count(*)) / (count(*) - 1)), 4) AS ${p}_std""".stripMargin
    }
    s"""SELECT count(*) AS n,
       |  ${stats("l_quantity", "qty")},
       |  ${stats("l_extendedprice", "price")}
       |FROM lineitem""".stripMargin
  }

  // ------------------------------------------------------------- windows

  /** row_number / rank / dense_rank per customer by order value. */
  def winRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val winRankSql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
      |ORDER BY o_custkey, rn""".stripMargin

  /** lag/lead analytics: per-user deltas and inter-event gaps. */
  def winLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"),
        (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  val winLagSql =
    """SELECT event_id, user_id, value,
      |  value - lag(value, 1) OVER w AS delta,
      |  epoch_us(lead(ts, 1) OVER w) - epoch_us(ts) AS gap_us
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY event_id""".stripMargin

  /** Running (cumulative) revenue per customer — ROWS frame. */
  def winRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        out(sum(money(col("o_totalprice"))).over(w)).as("cum_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val winRunningSql: String =
    s"""SELECT o_custkey, o_orderkey,
       |  ${Sql.out(s"sum(${Sql.money("o_totalprice")}) OVER w")} AS cum_total
       |FROM orders
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Trailing one-hour average per user — RANGE frame on epoch micros.
    * The average divides an exact decimal sum by the frame count (one
    * deterministic double division), so the sliding-frame accumulation
    * order that differs between engines cannot surface.
    */
  def winRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0L)
    // BIGINT sliding sum of 4dp-scaled values: exact on both engines like
    // the DECIMAL form, but the window's add/remove arithmetic stays cheap
    // Long math instead of per-row decimal allocation.
    val sumInt = sum(moneyInt(col("value"))).over(w)
    val cnt = count(lit(1)).over(w)
    Tables.t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        round((sumInt.cast(DoubleType) / lit(10000.0)) / cnt, 4).as("trailing_avg"),
        cnt.as("n_in_window"))
      .orderBy(col("event_id"))
  }

  val winRangeSql: String =
    s"""SELECT event_id, user_id,
       |  round((CAST(sum(${Sql.moneyInt("value")}) OVER w AS DOUBLE) / 10000.0) / (count(*) OVER w), 4) AS trailing_avg,
       |  count(*) OVER w AS n_in_window
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
       |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  /** ntile quartiles of order value within each status. */
  def winNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("o_orderkey"))
  }

  val winNtileSql =
    """SELECT o_orderkey, o_orderstatus,
      |  ntile(4) OVER (PARTITION BY o_orderstatus
      |                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS quartile
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Top-3 orders per customer (window + filter — the per-group top-k
    * plan that scales: no global sort, one shuffle by customer).
    */
  def topkGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  val topkGroupSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ------------------------------------------------- exact percentiles

  /** Exact interpolated quartiles of l_quantity per return flag. Spark's
    * `percentile` and DuckDB's `quantile_cont` both implement ANSI
    * PERCENTILE_CONT (rank p·(n−1), linear interpolation); over integer
    * quantities with quarter fractions every intermediate is an exact
    * double, so the engines agree bit-for-bit with no rounding needed.
    */
  def aggPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("q50"),
        expr("percentile(l_quantity, 0.75)").as("q75"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val aggPercentileSql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.5) AS q50,
      |  quantile_cont(l_quantity, 0.75) AS q75,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------ exact correlation

  /** Pearson correlation of (quantity, price) per return flag via the
    * five-exact-sums formulation: x, y and their products are exact
    * BIGINTs (y = price rounded to whole units keeps y² summable in
    * BIGINT to ~sf150), every sum is order-independent, and the final
    * expression is one identical sequence of double ops on both engines —
    * unlike native corr(), whose per-partition co-moment accumulation is
    * partition-order dependent.
    */
  def aggCorr(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast(LongType)
    val y = round(col("l_extendedprice"), 0).cast(LongType)
    val n = count(lit(1))
    Tables.t(spark, dir, "lineitem")
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy(col("l_returnflag"))
      .agg(n.as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("l_returnflag"), col("n"),
        round((col("n").cast(DoubleType) * col("sxy").cast(DoubleType) -
          col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
          (sqrt(col("n").cast(DoubleType) * col("sxx").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) *
            sqrt(col("n").cast(DoubleType) * col("syy").cast(DoubleType) -
              col("sy").cast(DoubleType) * col("sy").cast(DoubleType))), 6)
          .as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  val aggCorrSql =
    """WITH s AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
      |               CAST(round(l_extendedprice, 0) AS BIGINT) AS y
      |        FROM lineitem)
      |  GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |         CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |        (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |         sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
      |              CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |    AS corr_qty_price
      |FROM s ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------ listagg

  /** Ordered string aggregation: nation names per region. collect_list
    * order is partition-dependent, so the list is sorted before joining —
    * the deterministic form of LISTAGG/string_agg.
    */
  def aggListagg(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "nation")
      .join(Tables.t(spark, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy(col("r_name"))

  val aggListaggSql =
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  count(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ------------------------------------------------------ max_by/min_by

  /** Richest/poorest customer per nation via max_by/min_by (DuckDB
    * arg_max/arg_min) over a tie-free surrogate ordering key: acctbal
    * quantized at 4dp × 10^10 + custkey is strictly monotonic in
    * (acctbal, custkey) while custkey < 10^10 (~TPC-H sf 65000; the
    * product still fits BIGINT: |acctbal·10^4| ≤ 10^8, ×10^10 = 10^18 <
    * 2^63) — composite arg_max keys are not supported by DuckDB 1.0, so
    * the tiebreak is packed into one BIGINT. A per-row assert_true fails
    * the job loudly if custkey ever reaches the bleed point instead of
    * silently mis-ranking.
    */
  def aggMinmaxBy(spark: SparkSession, dir: String): DataFrame = {
    val Mult = 10000000000L // 1e10
    val guard = coalesce(
      assert_true(col("c_custkey") >= 0 && col("c_custkey") < lit(Mult),
        lit(s"aggMinmaxBy packed key needs 0 <= c_custkey < 1e10")).cast(LongType),
      lit(0L))
    val key = moneyInt(col("c_acctbal")) * lit(Mult) + col("c_custkey") + guard
    Tables.t(spark, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(max_by(col("c_custkey"), key).as("richest"),
        min_by(col("c_custkey"), key).as("poorest"),
        count(lit(1)).as("n_cust"))
      .orderBy(col("c_nationkey"))
  }

  val aggMinmaxBySql: String = {
    val key = s"${Sql.moneyInt("c_acctbal")} * 10000000000 + c_custkey"
    s"""SELECT c_nationkey,
       |  arg_max(c_custkey, $key) AS richest,
       |  arg_min(c_custkey, $key) AS poorest,
       |  count(*) AS n_cust
       |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  }

  // ----------------------------------------------------------- mode

  /** Per-language modal source (most frequent value, smallest source on
    * count ties): count aggregation then a min_by over the composite
    * (-n, source) key — fully partial-aggregatable, no window. DuckDB 1.0
    * rejects composite arg_min keys, so the oracle spells the identical
    * tiebreak with a nested row_number.
    */
  def aggMode(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.t(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("lang"))
      .agg(min_by(struct(col("source"), col("n")),
        struct((-col("n")).as("negn"), col("source"))).as("m"),
        sum(col("n")).as("n_docs"))
      .select(col("lang"), col("m.source").as("mode_source"),
        col("m.n").as("mode_n"), col("n_docs"))
      .orderBy(col("lang"))
  }

  // CAST: DuckDB sum(BIGINT) is HUGEINT, which the driver's pandas bridge
  // widens to float64 ("218.0" vs Spark's "218" — r4 hash mismatch)
  val aggModeSql: String =
    """WITH counts AS (
      |  SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY lang
      |                               ORDER BY n DESC, source ASC) AS rn,
      |    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_docs
      |  FROM counts)
      |SELECT lang, source AS mode_source, n AS mode_n, n_docs
      |FROM ranked WHERE rn = 1 ORDER BY lang""".stripMargin

  // ------------------------------------------------------- histogram

  /** Fixed-width histogram of order totals: bucket = ⌊price/50000⌋.
    * Bucketing is one IEEE divide + floor (identical on both engines);
    * per-bucket min/max ride exact decimal. The shape that survives
    * 100 TB: single hash aggregation, ~tens of buckets out.
    */
  def aggHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "orders")
      .groupBy(floor(col("o_totalprice") / 50000.0).cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n"),
        out(min(money(col("o_totalprice")))).as("lo"),
        out(max(money(col("o_totalprice")))).as("hi"))
      .orderBy(col("bucket"))

  val aggHistogramSql: String =
    s"""SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       |  count(*) AS n,
       |  ${Sql.out(s"min(${Sql.money("o_totalprice")})")} AS lo,
       |  ${Sql.out(s"max(${Sql.money("o_totalprice")})")} AS hi
       |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin

  // ------------------------------------------------ filtered aggregates

  /** Filtered aggregation (the SQL FILTER clause surface): per-status
    * order counts and sums restricted by independent predicates inside
    * ONE aggregation pass — versus the naive multi-scan union. count_if /
    * sum(when) compile to the same partial-aggregatable plan.
    */
  def aggFiltered(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_all"),
        count_if(col("o_totalprice") > 200000.0).as("n_big"),
        count_if(col("o_orderpriority") === "1-URGENT").as("n_urgent"),
        out(sum(when(col("o_totalprice") > 200000.0, money(col("o_totalprice")))))
          .as("sum_big"))
      .orderBy(col("o_orderstatus"))

  val aggFilteredSql: String =
    s"""SELECT o_orderstatus,
       |  count(*) AS n_all,
       |  count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
       |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       |  ${Sql.out(s"sum(${Sql.money("o_totalprice")}) FILTER (WHERE o_totalprice > 200000.0)")} AS sum_big
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------- first/last/nth window

  /** first_value/last_value/nth_value over the full partition (explicit
    * unbounded frame on both engines — last_value's default frame stops
    * at CURRENT ROW, a classic cross-engine trap).
    */
  def winFirstlast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        first(col("event_type")).over(w).as("first_et"),
        last(col("event_type")).over(w).as("last_et"),
        nth_value(col("event_type"), 2).over(w).as("second_et"))
      .orderBy(col("event_id"))
  }

  val winFirstlastSql =
    """SELECT event_id, user_id,
      |  first_value(event_type) OVER w AS first_et,
      |  last_value(event_type) OVER w AS last_et,
      |  nth_value(event_type, 2) OVER w AS second_et
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY event_id""".stripMargin

  // -------------------------------------------- bool / bit aggregates

  /** bool_and/bool_or (ANSI EVERY/ANY) per order status. */
  def aggBool(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
        expr("bool_or(o_totalprice > 400000)").as("any_over_400k"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  val aggBoolSql =
    """SELECT o_orderstatus,
      |  bool_and(o_totalprice > 1000) AS all_over_1k,
      |  bool_or(o_totalprice > 400000) AS any_over_400k,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** bit_and/bit_or/bit_xor aggregates over order keys. */
  def aggBitagg(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("bit_and(l_orderkey)").as("key_and"),
        expr("bit_or(l_orderkey)").as("key_or"),
        expr("bit_xor(l_orderkey)").as("key_xor"))
      .orderBy(col("l_returnflag"))

  val aggBitaggSql =
    """SELECT l_returnflag,
      |  bit_and(l_orderkey) AS key_and,
      |  bit_or(l_orderkey) AS key_or,
      |  bit_xor(l_orderkey) AS key_xor
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------ exact moment stats

  /** Variance/skewness/kurtosis per return flag from exact integer power
    * sums (Σx..Σx⁴ in BIGINT — x = l_quantity ≤ 50, so Σx⁴ fits to
    * ~sf10⁵), finished by ONE identical double formula on both engines.
    * The built-in skewness()/kurtosis() accumulate central moments in
    * partition order and are not reproducible, let alone cross-engine;
    * raw power sums are order-independent and exact.
    */
  def aggMoments(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast(LongType)
    val d: Column => Column = _.cast(DoubleType)
    Tables.t(spark, dir, "lineitem")
      .select(col("l_returnflag"), x.as("x"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      .select({
        val n = d(col("n")); val s1 = d(col("s1")); val s2 = d(col("s2"))
        val s3 = d(col("s3")); val s4 = d(col("s4"))
        val mu = s1 / n
        val m2 = s2 / n - mu * mu
        val m3 = s3 / n - lit(3.0) * mu * (s2 / n) + lit(2.0) * mu * mu * mu
        val m4 = s4 / n - lit(4.0) * mu * (s3 / n) +
          lit(6.0) * mu * mu * (s2 / n) - lit(3.0) * mu * mu * mu * mu
        Seq(col("l_returnflag"), col("n"),
          round(m2, 6).as("var_pop"),
          round(m3 / sqrt(m2 * m2 * m2), 6).as("skewness"),
          round(m4 / (m2 * m2) - lit(3.0), 6).as("kurtosis"))
      }: _*)
      .orderBy(col("l_returnflag"))
  }

  val aggMomentsSql =
    """WITH s AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS s1, CAST(sum(x*x) AS BIGINT) AS s2,
      |    CAST(sum(x*x*x) AS BIGINT) AS s3, CAST(sum(x*x*x*x) AS BIGINT) AS s4
      |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x FROM lineitem)
      |  GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 6) AS var_pop,
      |  round((CAST(s3 AS DOUBLE) / n - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
      |         + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
      |        / sqrt((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
      |               * (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
      |               * (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))), 6) AS skewness,
      |  round((CAST(s4 AS DOUBLE) / n - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
      |         + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
      |         - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
      |        / ((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
      |           * (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))) - 3.0, 6) AS kurtosis
      |FROM s ORDER BY l_returnflag""".stripMargin

  // ------------------------------------- distribution window functions

  /** percent_rank/cume_dist over a UNIQUE ordering (totalprice, orderkey)
    * — both are single exact-integer divisions, bit-identical across
    * engines when the ordering is tie-free.
    */
  def winDist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("o_orderkey"))
  }

  val winDistSql =
    """SELECT o_orderkey, o_orderstatus,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus
      |             ORDER BY o_totalprice ASC, o_orderkey ASC)
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------ mergeable sketches

  /** HLL sketch build + MERGE — the two-level distinct-count pattern of a
    * 100 TB warehouse: daily user sketches materialize once (partial
    * aggregation, bytes per day, not users per day), then ANY rollup
    * (here weekly) unions sketches instead of rescanning raw events.
    * Sketch bytes are Datasketches-version-specific → no SQL oracle;
    * AggregatesSketchSpec bounds the estimates against exact distincts.
    */
  def aggHllMerge(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.t(spark, dir, "events")
      .groupBy(date_trunc("week", col("ts")).as("week"),
        date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    daily
      .groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
        count(lit(1)).as("n_days"))
      .select(unix_micros(col("week")).as("week_us"),
        col("approx_users"), col("n_days"))
      .orderBy(col("week_us"))
  }

  /** Approximate quantiles (KLL-style `approx_percentile`) per order
    * status — the sketch path for the exact [[aggPercentile]]; at scale
    * the exact ANSI percentile needs a per-group sort while the sketch is
    * one mergeable pass. Sketch internals are engine-specific → no SQL
    * oracle; AggregatesSketchSpec bounds each approx quartile against the
    * exact one.
    */
  def aggApproxPct(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(approx_percentile(col("o_totalprice"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("q"))
      .select(col("o_orderstatus"),
        round(col("q").getItem(0), 4).as("p25"),
        round(col("q").getItem(1), 4).as("p50"),
        round(col("q").getItem(2), 4).as("p75"))
      .orderBy(col("o_orderstatus"))

  val all: Seq[ContractQuery] = Seq(
    ContractQuery("q_agg_group", aggGroup, Some(aggGroupSql)),
    ContractQuery("q_agg_distinct", aggDistinct, Some(aggDistinctSql)),
    ContractQuery("q_agg_approx", aggApprox, None),
    ContractQuery("q_agg_gsets", aggGsets, Some(aggGsetsSql)),
    ContractQuery("q_agg_rollup", aggRollup, Some(aggRollupSql)),
    ContractQuery("q_agg_cube", aggCube, Some(aggCubeSql)),
    ContractQuery("q_agg_having", aggHaving, Some(aggHavingSql)),
    ContractQuery("q_pivot", pivotQ, Some(pivotSql)),
    ContractQuery("q_stats_summary", statsSummary, Some(statsSummarySql)),
    ContractQuery("q_win_rank", winRank, Some(winRankSql)),
    ContractQuery("q_win_lag", winLag, Some(winLagSql)),
    ContractQuery("q_win_running", winRunning, Some(winRunningSql)),
    ContractQuery("q_win_range", winRange, Some(winRangeSql)),
    ContractQuery("q_win_ntile", winNtile, Some(winNtileSql)),
    ContractQuery("q_topk_group", topkGroup, Some(topkGroupSql)),
    ContractQuery("q_agg_percentile", aggPercentile, Some(aggPercentileSql)),
    ContractQuery("q_agg_corr", aggCorr, Some(aggCorrSql)),
    ContractQuery("q_agg_listagg", aggListagg, Some(aggListaggSql)),
    ContractQuery("q_agg_minmax_by", aggMinmaxBy, Some(aggMinmaxBySql)),
    ContractQuery("q_win_firstlast", winFirstlast, Some(winFirstlastSql)),
    ContractQuery("q_agg_bool", aggBool, Some(aggBoolSql)),
    ContractQuery("q_agg_bitagg", aggBitagg, Some(aggBitaggSql)),
    ContractQuery("q_win_dist", winDist, Some(winDistSql)),
    ContractQuery("q_agg_moments", aggMoments, Some(aggMomentsSql)),
    ContractQuery("q_agg_mode", aggMode, Some(aggModeSql)),
    ContractQuery("q_agg_histogram", aggHistogram, Some(aggHistogramSql)),
    ContractQuery("q_agg_filtered", aggFiltered, Some(aggFilteredSql)),
    ContractQuery("q_agg_hll_merge", aggHllMerge, None),
    ContractQuery("q_agg_approx_pct", aggApproxPct, None)
  )
}
