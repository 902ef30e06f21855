"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at a given SF, compare row count,
column names, and order-insensitive values. Usage:

    python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype("float64").round(6)
        elif "int" in str(pdf[c].dtype).lower():
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as e
    from information_retrieval_images_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as ex:
            failures.append((name, f"SPARK ERROR {ex}"))
            print(f"FAIL {name}: spark error {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (no oracle — rows-only)")
            continue
        try:
            want = normalize(con.sql(oracles[name]).df())
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR {ex}"))
            print(f"FAIL {name}: duckdb error {str(ex)[:300]}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append((name, f"columns {list(got.columns)} vs {list(want.columns)}"))
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} vs {len(want)}"))
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-6, atol=1e-6)
            print(f"ok   {name}: rows={len(got)} MATCH")
        except AssertionError as ex:
            failures.append((name, "value mismatch"))
            print(f"FAIL {name}: value mismatch\n{str(ex)[:500]}")
    spark.stop()
    print(f"\n{len(qs) - len(failures)}/{len(qs)} matched")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
