#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>
       oracle_check.py --selftest

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
paired oracle SQL from oracle_sql.json in DuckDB against the sfDir tables, and
compares: schema (column names sorted), per-column TYPES (r16 verdict task 3 —
the driver hashes typed values, so any oracle-vs-Spark result-type divergence
the string compare below cannot see, e.g. HUGEINT vs BIGINT or DECIMAL vs
DOUBLE, is flagged as a failure in its own right), row count, and per-row
values with columns sorted by name. Exits nonzero if any query mismatches.

--selftest proves the type gate fires: a deliberately-mistyped fixture
(BIGINT parquet vs HUGEINT- and DECIMAL-typed oracles) must FAIL, and a
correctly-typed one must PASS.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0 (semantically equal, repr differs)
        # 4dp outputs: exact repr after round-trip
        return repr(v)
    if v is None:
        return "NULL"
    return str(v)


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(canon(r[i]) for i in order) for r in cur.fetchall()]
    # keep the raw order too: the driver's compare may be order-sensitive,
    # so the mirror must be at least as strict (ADVICE r1)
    return [cols[i] for i in order], data, cols


def rows_of_rel(rel):
    # relation-API twin of rows_of: one bind serves the type scan AND the
    # row fetch (binding twice was pure waste, and a query the relation
    # API rejects but execute() accepts would mis-report)
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    return [cols[i] for i in order], data, cols


def canon_type(t):
    """Canonical DuckDB type string for hash-parity comparison.

    Strict by default (DECIMAL(38,2) != DOUBLE, HUGEINT != BIGINT), with
    ONE empirical equivalence class: integer widths up to 64 bits
    collapse to BIGINT — Spark window functions emit INT32 ranks where
    DuckDB emits BIGINT and those rows have hash-matched in the driver
    for 16 straight rounds, while HUGEINT (int128) demonstrably DID
    hash-mismatch (the q_dup_rate_by_source r15 red row), so it stays
    its own type. DuckDB's own aliases collapse to their canonical name.
    """
    u = str(t).upper()
    for a, b in (("TEXT", "VARCHAR"), ("STRING", "VARCHAR"),
                 ("TINYINT", "BIGINT"), ("SMALLINT", "BIGINT"),
                 ("INTEGER", "BIGINT"), ("INT1", "BIGINT"),
                 ("INT2", "BIGINT"), ("INT4", "BIGINT"), ("INT8", "BIGINT"),
                 ("INT32", "BIGINT"), ("INT64", "BIGINT"),
                 ("FLOAT8", "DOUBLE"), ("BOOL", "BOOLEAN")):
        if u == a:
            return b
    return u


def type_mismatches(spark_rel, duck_rel):
    """Per-column canonical-type diffs between the Spark parquet output
    (as DuckDB reads it — the driver's own vantage point) and the oracle
    result, matched on sorted column names."""
    st = dict(zip(spark_rel.columns, (canon_type(t) for t in spark_rel.types)))
    dt = dict(zip(duck_rel.columns, (canon_type(t) for t in duck_rel.types)))
    return [(c, st[c], dt[c]) for c in sorted(set(st) & set(dt))
            if st[c] != dt[c]]


def selftest():
    import tempfile
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        con.execute(f"COPY (SELECT CAST(1 AS BIGINT) AS v, 'x' AS k) "
                    f"TO '{d}/out.parquet' (FORMAT PARQUET)")
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{d}/out.parquet')")
        bad_hugeint = con.sql("SELECT sum(CAST(1 AS BIGINT)) AS v, 'x' AS k")
        bad_decimal = con.sql("SELECT CAST(1 AS DECIMAL(38,2)) AS v, 'x' AS k")
        good = con.sql("SELECT CAST(1 AS BIGINT) AS v, 'x' AS k")
        assert type_mismatches(spark_rel, bad_hugeint) == \
            [("v", "BIGINT", "HUGEINT")], "HUGEINT fixture must fire"
        assert type_mismatches(spark_rel, bad_decimal) == \
            [("v", "BIGINT", "DECIMAL(38,2)")], "DECIMAL fixture must fire"
        good_int32 = con.sql("SELECT CAST(1 AS INTEGER) AS v, 'x' AS k")
        assert type_mismatches(spark_rel, good) == [], \
            "correctly-typed fixture must pass"
        assert type_mismatches(spark_rel, good_int32) == [], \
            "int-width difference (<= 64 bits) is hash-equal, must pass"
    print("SELFTEST PASS (type gate fires on HUGEINT and DECIMAL fixtures)")


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = []
    for name, sql in sorted(oracle.items()):
        qdir = out / name
        if not qdir.exists():
            failures.append((name, "no spark output written"))
            continue
        try:
            # The driver hashes typed values, not strings: ANY result-type
            # divergence between the Spark parquet output and the oracle
            # (HUGEINT from a bare sum(BIGINT) — the q_dup_rate_by_source
            # r15 red row — DECIMAL vs DOUBLE, width'd types) can
            # hash-mismatch even when every printed value is equal. Compare
            # full schemas from the driver's own vantage point: the parquet
            # as DuckDB reads it vs the oracle relation's types.
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            rel = con.sql(sql)
            mism = type_mismatches(spark_rel, rel)
            if mism:
                failures.append(
                    (name, "result TYPE mismatch (driver hashes typed "
                     f"values): {[f'{c}: spark={s1} oracle={s2}' for c, s1, s2 in mism]}"))
                continue
            spark_cols, spark_rows, spark_raw = rows_of_rel(spark_rel)
            duck_cols, duck_rows, duck_raw = rows_of_rel(rel)
        except Exception as e:
            failures.append((name, f"exec error: {e}"))
            continue
        if spark_cols != duck_cols:
            failures.append((name, f"cols spark={spark_cols} duck={duck_cols}"))
            continue
        if spark_raw != duck_raw:
            failures.append(
                (name, f"column ORDER differs: spark={spark_raw} duck={duck_raw}"))
            continue
        if len(spark_rows) != len(duck_rows):
            failures.append((name, f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}"))
            continue
        # exact order-sensitive compare first; fall back to sorted compare info
        if spark_rows != duck_rows:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b)
            sorted_match = sorted(spark_rows) == sorted(duck_rows)
            failures.append((name, f"row {diff[0]} spark={diff[1]} duck={diff[2]} (order-insensitive match: {sorted_match})"))
            continue
        print(f"PASS {name} ({len(spark_rows)} rows)")
    if failures:
        for name, msg in failures:
            print(f"FAIL {name}: {msg}")
        sys.exit(1)
    print(f"ALL PASS ({len(oracle)} oracle queries)")


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
    else:
        main(sys.argv[1], sys.argv[2])
