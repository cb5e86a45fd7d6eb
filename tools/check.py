"""Local oracle harness — approximates the driver's t2 correctness check.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()`` on
DuckDB at sf0.01 (override with SF_DIR), compares row-count, schema (column
names), and order-insensitive values.  Floats are compared exactly AND with
tolerance; any exact mismatch is flagged loudly since the driver hashes
values.

Usage: python tools/check.py [name ...]

Fast pre-commit gate: ``python tools/check.py --analyze`` builds every
``queries()`` entry at sf0.001 and forces analysis via ``.schema`` without
executing — catches type/resolution errors (e.g. an operator rejecting
TIMESTAMP_NTZ) in seconds.  Run it before any end-of-round commit.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from amazon_lookout_for_equipment_python_sdk_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm_cell(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def atomic_schema_problems(spark_df):
    """Driver contract: the driver canonicalizes results with pandas
    ``sort_values`` over every column, which raises on list/dict cells.
    Any top-level array/map/struct column therefore fails the driver even
    when values are right (r4's embedding_l2_normalize).  Flag them here
    so the divergence cannot pass locally again."""
    bad = [
        f.name
        for f in spark_df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    return (
        [f"non-atomic top-level column(s) {bad}: driver canonicalizer "
         "cannot hash list/struct cells — posexplode to scalar rows"]
        if bad
        else []
    )


def oracle_dtype_problems(spark_df, rel):
    """Driver contract, twin of :func:`atomic_schema_problems` (r6's two
    red rows): the driver canonicalizes the DuckDB side via pandas, and
    DuckDB ``sum(BIGINT)`` returns HUGEINT (int128) which pandas renders
    as **float64** — lossy past 2^53 and dtype-hashed differently from
    Spark's exact int64 even when small.  Python-value equality below
    cannot see it (int 300 == 300), so flag any oracle column whose
    DuckDB type is HUGEINT/DECIMAL while Spark returns an integral type:
    the SQL needs an explicit ``CAST(sum(...) AS BIGINT)``."""
    integral = {"long", "integer", "short", "byte"}
    s_types = {f.name: f.dataType.typeName() for f in spark_df.schema.fields}
    bad = []
    for col, dtype in zip(rel.columns, rel.types):
        d = str(dtype).upper()
        if (d.startswith(("HUGEINT", "UHUGEINT", "DECIMAL"))
                and s_types.get(col) in integral):
            bad.append(f"{col}:{d}")
    return (
        [f"oracle dtype: {bad} — DuckDB HUGEINT/DECIMAL canonicalizes to "
         "float64 in the driver hasher vs Spark's integral; wrap the "
         "aggregate in CAST(... AS BIGINT)"]
        if bad
        else []
    )


def compare(name, spark_df, con, sql):
    t0 = time.time()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    t1 = time.time()
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    t2 = time.time()

    problems = atomic_schema_problems(spark_df)
    problems += oracle_dtype_problems(spark_df, rel)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        a = rows_to_multiset(s_cols, s_rows)
        b = rows_to_multiset(d_cols, d_rows)
        n_exact = sum(1 for x, y in zip(a, b) if x == y)
        if n_exact != len(a):
            # find first diff + max float delta
            max_d = 0.0
            first = None
            for x, y in zip(a, b):
                if x != y:
                    if first is None:
                        first = (x, y)
                    for u, v in zip(x, y):
                        if isinstance(u, float) and isinstance(v, float):
                            max_d = max(max_d, abs(u - v))
                        elif u != v:
                            max_d = float("inf")
            problems.append(
                f"values: {len(a)-n_exact}/{len(a)} rows differ, "
                f"max_float_delta={max_d}\n  spark={first[0]}\n  duck ={first[1]}"
            )
    status = "OK " if not problems else "FAIL"
    print(f"[{status}] {name}: {len(s_rows)} rows  spark={t1-t0:.1f}s duck={t2-t1:.1f}s")
    for p in problems:
        print(f"       {p}")
    return not problems


def analyze_all() -> None:
    """Analysis-only sweep: resolve every query's plan at sf0.001.

    ``.schema`` triggers full analysis (resolution + type checking) without
    running a job, so the whole registry checks in seconds."""
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("check")
    qs = entrymod.queries()
    bad = 0
    t0 = time.time()
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            _ = df.schema
            shape = atomic_schema_problems(df)
            if shape:
                print(f"[ERR ] {name}: {shape[0]}")
                bad += 1
            else:
                print(f"[OK  ] {name}")
        except Exception as e:  # noqa: BLE001
            print(f"[ERR ] {name}: {type(e).__name__}: {e}")
            bad += 1
    print(f"\n{len(qs) - bad}/{len(qs)} analyzed clean in {time.time()-t0:.1f}s")
    sys.exit(1 if bad else 0)


def main():
    if "--analyze" in sys.argv[1:]:
        analyze_all()
        return
    only = set(sys.argv[1:])
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok = bad = rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(get_spark("check"), SF_DIR)
            if name in oracles:
                if compare(name, df, con, oracles[name]):
                    ok += 1
                else:
                    bad += 1
            else:
                n = df.count()
                print(f"[ROWS] {name}: {n} rows (no oracle)")
                rows_only += 1
        except Exception as e:  # noqa: BLE001
            print(f"[ERR ] {name}: {type(e).__name__}: {e}")
            bad += 1
    print(f"\n{ok} ok, {bad} fail, {rows_only} rows-only")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
