#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
paired oracle SQL from oracle_sql.json in DuckDB against the sfDir tables, and
compares: schema (column names sorted), row count, and per-row values with
columns sorted by name. Exits nonzero if any query mismatches.
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
            spark_cols, spark_rows, spark_raw = rows_of(
                con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')"))
            # The driver hashes typed values, not strings: a DuckDB HUGEINT
            # (int128, e.g. from a bare sum(BIGINT)) hash-mismatches Spark's
            # int64 even when every value is equal (the q_dup_rate_by_source
            # r15 red row). Flag int128-typed oracle columns so the local
            # gate catches the class before the driver does — the house fix
            # is CAST(... AS BIGINT) (cf. Sql.sumMoneyInt). Cursor
            # description erases DuckDB types to 'NUMBER'; the relation API
            # keeps them.
            rel = con.sql(sql)
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if "HUGEINT" in str(t).upper()]
            if huge:
                failures.append(
                    (name, f"oracle columns typed HUGEINT (cast to BIGINT): {huge}"))
                continue
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
    main(sys.argv[1], sys.argv[2])
