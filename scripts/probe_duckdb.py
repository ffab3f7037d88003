#!/usr/bin/env python3
"""Probe DuckDB 1.0.0 for dialect features the oracle SQL will rely on."""
import duckdb

con = duckdb.connect()
probes = {
    "list_reduce": "SELECT list_reduce([1.0,2.0,3.0]::DOUBLE[], (a,x) -> a+x)",
    "list_zip_lambda": "SELECT list_transform(list_zip([1.0,2.0],[3.0,4.0]), x -> CAST(x.list_1 AS DOUBLE)*CAST(x.list_2 AS DOUBLE))",
    "list_sort": "SELECT list_sort(['b','a'])",
    "list_distinct": "SELECT list_distinct(['a','a','b'])",
    "list_slice": "SELECT ['a','b','c','d'][1:2]",
    "list_extract": "SELECT (['a','b','c'])[3]",
    "list_contains": "SELECT list_contains(['a','b'],'a')",
    "array_slice_fn": "SELECT list_slice(['a','b','c','d'], 1, 2)",
    "md5": "SELECT md5('abc')",
    "sha256": "SELECT sha256('abc')",
    "regexp_extract_all_len": "SELECT len(regexp_extract_all('a1 b22 c', '[0-9]+'))",
    "regexp_extract": "SELECT regexp_extract('Brand#13', '[0-9]+')",
    "nulls_first": "SELECT * FROM (VALUES (1),(NULL)) t(a) ORDER BY a ASC NULLS FIRST",
    "grouping_fn": "SELECT grouping(a) FROM (VALUES (1)) t(a) GROUP BY GROUPING SETS ((a),())",
    "time_bucket_hour": "SELECT time_bucket(INTERVAL '1 hour', TIMESTAMP '2024-01-05 10:42:31')",
    "time_bucket_15m": "SELECT time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-01-05 10:42:31')",
    "cast_dec_parity": "SELECT CAST(CAST(0.1 AS DOUBLE)+CAST(0.2 AS DOUBLE) AS DECIMAL(12,4))",
    "epoch_fn": "SELECT epoch(TIMESTAMP '2024-01-05 10:42:31.123456')",
    "datediff": "SELECT date_diff('day', DATE '1995-03-15', DATE '2000-01-01')",
    "add_months": "SELECT CAST(DATE '1995-03-15' + INTERVAL 3 MONTH AS DATE)",
    "lpad": "SELECT lpad('7', 5, '0')",
    "split_part": "SELECT split_part('a b c', ' ', 2)",
    "strpos": "SELECT strpos('0123456789abcdef', 'c')",
    "unnest_genseries": "SELECT u FROM (SELECT unnest(generate_series(1, 3)) u)",
    "lateral_unnest": "SELECT t.d, s.i FROM (VALUES (1)) t(d), unnest(generate_series(1,3)) s(i)",
    "gen_subscripts": "SELECT generate_subscripts([10,20,30], 1)",
    "try_cast": "SELECT TRY_CAST('abc' AS INTEGER), TRY_CAST('42' AS INTEGER)",
    "json_extract_string": "SELECT json_extract_string('{\"k\": 87}', '$.k')",
    "pmod_emu": "SELECT ((-7 % 3) + 3) % 3",
    "spark_pmod_neg": "SELECT ((-7) % 3)",
    "count_case": "SELECT count(CASE WHEN 1=0 THEN 1 END)",
    "stddev_samp": "SELECT stddev_samp(a) FROM (VALUES (1.0),(2.0)) t(a)",
    "row_number_nulls": "SELECT row_number() OVER (ORDER BY a DESC NULLS LAST) FROM (VALUES (1),(NULL)) t(a)",
    "repeat": "SELECT repeat('ab', 3)",
    "concat_ws": "SELECT concat_ws(' ', 'a', 'b')",
    "levenshtein": "SELECT levenshtein('abc','abd')",
    "list_cosine": "SELECT list_cosine_similarity([1.0,0.0],[1.0,0.0])",
    "interval_mult": "SELECT TIMESTAMP '2024-01-05 10:00:00' - 2 * INTERVAL '15 minutes'",
    "range_window": "SELECT sum(a) OVER (ORDER BY b RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) FROM (VALUES (1.0, 10),(2.0, 20)) t(a,b)",
    "substr_1based": "SELECT substring('abcdef', 2, 3)",
    "instr": "SELECT instr('abcdef', 'cd')",
    "translate": "SELECT translate('abc','ab','xy')",
    "sign_d": "SELECT sign(-2.5)",
    "ln_log10": "SELECT ln(2.0), log10(100.0)",
    "power": "SELECT pow(2.0, 10)",
    "greatest": "SELECT greatest(1.0, 2.0), least(1.0, 2.0)",
    "date_trunc_month": "SELECT date_trunc('month', TIMESTAMP '1995-03-15 10:00:00')",
    "scalar_subq_join": "SELECT count(*) FROM (VALUES (1),(2)) a(x) JOIN (VALUES (1)) b(y) ON b.y = 1 + a.x % (SELECT count(*) FROM (VALUES (1),(2)) c)",
    "hex": "SELECT hex(255)",
}
for name, sql in probes.items():
    try:
        r = con.execute(sql).fetchall()
        print(f"OK   {name}: {r[:3]}")
    except Exception as e:
        print(f"FAIL {name}: {str(e).splitlines()[0][:120]}")
