package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar / collection function surface (SURVEY.md §2.C): string,
  * date/time, math, conditional, cast, array, explode, higher-order and
  * JSON functions — all codegen'd built-ins, no UDFs, so every expression
  * stays inside whole-stage codegen and the vectorized parquet reader's
  * column pruning.
  *
  * Cross-engine notes: Spark `length`/`size`/`year` return INT while DuckDB
  * returns BIGINT — Spark casts to long; Spark `ceil`/`floor` return LONG
  * while DuckDB returns DOUBLE — the oracle casts to BIGINT. Per-row double
  * math is deterministic for fixed inputs, so a local sf0.01 oracle pass is
  * definitive (the driver reads the same bytes).
  */
object Functions {
  import Det._

  private val D = DoubleType

  // -------------------------------------------------------------- string

  def fnString(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "part")
      .select(col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        length(col("p_name")).cast(LongType).as("name_len"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), " ", "_").as("type_u"),
        lpad(col("p_partkey").cast(StringType), 8, "0").as("key_pad"),
        substring(col("p_name"), 1, 10).as("name10"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        element_at(split(col("p_name"), " "), 1).as("first_word"))
      .orderBy(col("p_partkey"))

  val fnStringSql =
    """SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
      |  length(p_name) AS name_len,
      |  trim('  ' || p_brand || '  ') AS trimmed,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  replace(p_type, ' ', '_') AS type_u,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
      |  substring(p_name, 1, 10) AS name10,
      |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
      |  string_split(p_name, ' ')[1] AS first_word
      |FROM part ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------------------ date/time

  def fnDate(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mo"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("dy"),
        tsOut(date_trunc("month", col("o_orderdate"))).as("month_start_us"),
        datediff(lit("2000-01-01").cast(TimestampType), col("o_orderdate"))
          .cast(LongType).as("days_to_y2k"),
        tsOut(add_months(col("o_orderdate"), 3).cast(TimestampType)).as("plus3mo_us"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("ymd"))
      .orderBy(col("o_orderkey"))

  val fnDateSql =
    """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |  day(o_orderdate) AS dy,
      |  epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
      |  date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k,
      |  epoch_us(date_trunc('day', o_orderdate) + INTERVAL 3 MONTH) AS plus3mo_us,
      |  strftime(o_orderdate, '%Y-%m-%d') AS ymd
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- math

  def fnMath(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price_r2"),
        abs(col("l_discount") - 0.03).as("abs_disc"),
        ceil(col("l_quantity")).as("qty_ceil"),
        floor(col("l_quantity")).as("qty_floor"),
        round(log(col("l_quantity")), 6).as("ln_qty"),
        round(log10(col("l_extendedprice")), 6).as("log10_price"),
        round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
        pmod(col("l_linenumber") - 3, lit(5)).as("ln_mod"),
        signum(col("l_discount") - 0.03).cast(IntegerType).as("disc_sign"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
        least(col("l_quantity"), col("l_discount") * 100).as("l"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val fnMathSql =
    """SELECT l_orderkey, l_linenumber,
      |  round(l_extendedprice, 2) AS price_r2,
      |  abs(l_discount - 0.03) AS abs_disc,
      |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
      |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
      |  round(ln(l_quantity), 6) AS ln_qty,
      |  round(log10(l_extendedprice), 6) AS log10_price,
      |  round(pow(l_quantity, 2), 4) AS qty_sq,
      |  ((l_linenumber - 3) % 5 + 5) % 5 AS ln_mod,
      |  CAST(sign(l_discount - 0.03) AS INTEGER) AS disc_sign,
      |  round(sqrt(l_extendedprice), 6) AS sqrt_price,
      |  greatest(l_quantity, l_discount * 100) AS g,
      |  least(l_quantity, l_discount * 100) AS l
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // --------------------------------------------------------- conditional

  def fnCase(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "orders")
      .select(col("o_orderkey"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("band"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending")).as("status_n"),
        when(col("o_orderpriority").like("1-%") ||
          col("o_orderpriority").like("2-%"), "urgent")
          .otherwise("normal").as("urgency"))
      .orderBy(col("o_orderkey"))

  val fnCaseSql =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 300000 THEN 'high'
      |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS band,
      |  coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_n,
      |  CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
      |       THEN 'urgent' ELSE 'normal' END AS urgency
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------- cast/try_cast

  def fnCast(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "events")
      .select(col("event_id"),
        col("user_id").cast(StringType).as("uid_str"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"),
        expr("try_cast(event_type AS INT)").as("bad_int"),
        floor(col("value")).cast(LongType).as("v_floor"),
        tsOut(date_format(col("ts"), "yyyy-MM-dd").cast(TimestampType)).as("day_us"))
      .orderBy(col("event_id"))

  val fnCastSql =
    """SELECT event_id, CAST(user_id AS VARCHAR) AS uid_str,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
      |  TRY_CAST(event_type AS INTEGER) AS bad_int,
      |  CAST(floor(value) AS BIGINT) AS v_floor,
      |  epoch_us(CAST(strftime(ts, '%Y-%m-%d') AS TIMESTAMP)) AS day_us
      |FROM events ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------- array

  def fnArray(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        size(toks).cast(LongType).as("n_tokens"),
        size(array_distinct(toks)).cast(LongType).as("n_distinct"),
        array_contains(toks, "join").as("has_join"),
        element_at(toks, 1).as("first_tok"),
        concat_ws(",", slice(array_sort(array_distinct(toks)), 1, 3)).as("top3_sorted"))
      .orderBy(col("doc_id"))
  }

  val fnArraySql =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |  list_contains(string_split(text, ' '), 'join') AS has_join,
      |  string_split(text, ' ')[1] AS first_tok,
      |  array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3), ',') AS top3_sorted
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- explode

  /** Generator/UDTF class: token frequencies via explode. */
  def explodeQ(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(20)

  val explodeSql =
    """SELECT tok, count(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT 20""".stripMargin

  // ------------------------------------------------------- higher-order

  /** Lambda expressions over the 64-dim embedding arrays — transform /
    * filter / aggregate / zip_with, all pure Catalyst (codegen-friendly,
    * no UDF). Both engines fold left over the same element order, and
    * every element is cast to DOUBLE before arithmetic, so the IEEE
    * sequence is identical.
    */
  def fnHof(spark: SparkSession, dir: String): DataFrame = {
    val e = col("embedding")
    val casted: Column => Column = x => x.cast(D)
    Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"),
        round(aggregate(e, lit(0.0), (a, x) => a + casted(x) * x), 6).as("norm2"),
        round(aggregate(filter(e, x => x > 0), lit(0.0), (a, x) => a + casted(x)), 6).as("sum_pos"),
        round(element_at(transform(e, x => casted(x) * 2), 1), 6).as("first_2x"),
        round(aggregate(zip_with(e, reverse(e), (a, b) => casted(a) * b),
          lit(0.0), (a, x) => a + x), 6).as("dot_rev"))
      .orderBy(col("vec_id"))
  }

  val fnHofSql =
    """SELECT vec_id,
      |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) * x)), (a, b) -> a + b), 6) AS norm2,
      |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(list_filter(embedding, x -> x > 0), x -> CAST(x AS DOUBLE))), (a, b) -> a + b), 6) AS sum_pos,
      |  round(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)[1], 6) AS first_2x,
      |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    [CAST(embedding[i] AS DOUBLE) * embedding[65 - i] for i in range(1, 65)]), (a, b) -> a + b), 6) AS dot_rev
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- JSON

  def fnJson(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"),
        get_json_object(col("props"), "$.missing").isNotNull.as("has_missing"))
      .orderBy(col("event_id"))

  val fnJsonSql =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
      |  json_extract_string(props, '$.missing') IS NOT NULL AS has_missing
      |FROM events ORDER BY event_id""".stripMargin

  /** Schema-full JSON parsing (SURVEY.md §1.3: `events.props` →
    * `from_json(schema)`): props parsed BOTH as a typed struct and as a
    * MapType, exercising struct field access and map functions over real
    * parsed data — the companion to [[fnJson]]'s path-extraction form.
    * Oracle: DuckDB json_extract / json_keys.
    */
  def fnFromJson(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables.t(spark, dir, "events")
      .select(col("event_id"),
        from_json(col("props"), schema).as("p"),
        from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
      .select(col("event_id"),
        col("p.k").as("k_val"),
        (col("p.k") % 10).as("k_mod10"),
        map_keys(col("m")).getItem(0).as("first_key"),
        size(map_keys(col("m"))).cast(LongType).as("n_keys"),
        element_at(col("m"), lit("k")).as("k_from_map"))
      .orderBy(col("event_id"))
  }

  val fnFromJsonSql =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod10,
      |  (json_keys(props))[1] AS first_key,
      |  len(json_keys(props)) AS n_keys,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_from_map
      |FROM events ORDER BY event_id""".stripMargin

  // -------------------------------------------------------- levenshtein

  /** Edit-distance over part strings — the string-similarity primitive of
    * fuzzy dedup (integer outputs, exact on both engines).
    */
  def fnLevenshtein(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "part")
      .select(col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).cast(LongType).as("lev_brand_type"),
        levenshtein(col("p_name"), col("p_brand")).cast(LongType).as("lev_name_brand"),
        levenshtein(substring(col("p_name"), 1, 8), substring(col("p_type"), 1, 8))
          .cast(LongType).as("lev_name8_type8"))
      .orderBy(col("p_partkey"))

  val fnLevenshteinSql =
    """SELECT p_partkey,
      |  levenshtein(p_brand, p_type) AS lev_brand_type,
      |  levenshtein(p_name, p_brand) AS lev_name_brand,
      |  levenshtein(substring(p_name, 1, 8), substring(p_type, 1, 8)) AS lev_name8_type8
      |FROM part ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------------------ bitwise

  /** Bitwise and/or/xor/shift over event ids (DuckDB: `^` is POWER, so
    * the oracle spells xor() by name).
    */
  def fnBitwise(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "events")
      .select(col("event_id"),
        col("event_id").bitwiseAND(lit(255L)).as("band"),
        col("event_id").bitwiseOR(lit(15L)).as("bor"),
        col("event_id").bitwiseXOR(col("user_id")).as("bxor"),
        shiftleft(col("event_id").bitwiseAND(lit(15L)), 2).as("shl"),
        shiftright(col("event_id"), 3).as("shr"))
      .orderBy(col("event_id"))

  val fnBitwiseSql =
    """SELECT event_id,
      |  event_id & 255 AS band,
      |  event_id | 15 AS bor,
      |  xor(event_id, user_id) AS bxor,
      |  (event_id & 15) << 2 AS shl,
      |  event_id >> 3 AS shr
      |FROM events ORDER BY event_id""".stripMargin

  // ----------------------------------------------------- try_* functions

  /** Error-tolerant scalar functions — the expression-level form of the
    * reference's never-fail error-capture rule: division by zero and
    * out-of-bounds access yield NULL rows, not failed jobs. DuckDB has no
    * try_divide, so the oracle spells the identical semantics with CASE;
    * DuckDB list indexing is natively NULL-on-out-of-bounds.
    */
  def fnTry(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "part")
      .select(col("p_partkey"),
        expr("try_divide(p_retailprice, p_size - 25)").as("per_size"),
        expr("try_element_at(split(p_name, ' '), 5)").as("word5"))
      .orderBy(col("p_partkey"))

  val fnTrySql =
    """SELECT p_partkey,
      |  CASE WHEN p_size - 25 = 0 THEN NULL
      |       ELSE p_retailprice / (p_size - 25) END AS per_size,
      |  string_split(p_name, ' ')[5] AS word5
      |FROM part ORDER BY p_partkey""".stripMargin

  val all: Seq[ContractQuery] = Seq(
    ContractQuery("q_fn_string", fnString, Some(fnStringSql)),
    ContractQuery("q_fn_date", fnDate, Some(fnDateSql)),
    ContractQuery("q_fn_math", fnMath, Some(fnMathSql)),
    ContractQuery("q_fn_case", fnCase, Some(fnCaseSql)),
    ContractQuery("q_fn_cast", fnCast, Some(fnCastSql)),
    ContractQuery("q_fn_array", fnArray, Some(fnArraySql)),
    ContractQuery("q_explode", explodeQ, Some(explodeSql)),
    ContractQuery("q_fn_hof", fnHof, Some(fnHofSql)),
    ContractQuery("q_fn_json", fnJson, Some(fnJsonSql)),
    ContractQuery("q_fn_from_json", fnFromJson, Some(fnFromJsonSql)),
    ContractQuery("q_fn_levenshtein", fnLevenshtein, Some(fnLevenshteinSql)),
    ContractQuery("q_fn_bitwise", fnBitwise, Some(fnBitwiseSql)),
    ContractQuery("q_fn_try", fnTry, Some(fnTrySql))
  )
}
