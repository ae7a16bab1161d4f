"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count, schema arity, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    """pandas frame → sorted list of canonical row tuples."""
    df = df[sorted(df.columns)]

    def canon(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            return f"{v:.9g}"
        return str(v)

    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

    import __spark_entry__ as entrymod
    from deduplidog_spark import get_spark

    spark = get_spark("oracle-check", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok = fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows, {len(sdf.columns)} cols")
            continue
        ddf = con.execute(oracles[name]).df()
        s_rows, d_rows = normalize(sdf), normalize(ddf)
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: row count spark={len(s_rows)} duckdb={len(d_rows)}")
            fail += 1
            continue
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, ddf.columns)):
            print(f"FAIL {name}: columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
            fail += 1
            continue
        if s_rows != d_rows:
            diff = [
                (a, b) for a, b in zip(s_rows, d_rows) if a != b
            ][:3]
            print(f"FAIL {name}: values differ, first diffs: {diff}")
            fail += 1
            continue
        print(f"OK   {name}: {len(s_rows)} rows")
        ok += 1
    print(f"\n{ok} oracle-matched, {fail} failed")
    spark.stop()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
