"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB over the same sf dir; compare row count, column names,
and values (columns sorted by name, rows sorted).

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrypoint  # noqa: E402
from local_etl_csv_to_postgresql_spark.plans.analytics import TABLES  # noqa: E402
from local_etl_csv_to_postgresql_spark.session import get_spark  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple)) or hasattr(v, "tolist")
                else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    a, b = canon(spark_df), canon(oracle_df)
    # The driver's hasher serializes values WITH their dtype, so an
    # equal-valued int64 vs float64 (e.g. DuckDB SUM(INT) -> HUGEINT ->
    # pandas float) still hash-mismatches. Flag dtype-kind drift here so
    # the local gate catches what the driver would.
    for col in a.columns:
        ka, kb = a[col].dtype.kind, b[col].dtype.kind
        if ka != kb and {ka, kb} <= {"i", "u", "f"}:
            problems.append(
                f"dtype [{col}]: spark={a[col].dtype} oracle={b[col].dtype}"
                " (driver hash would mismatch)"
            )
    if len(a) == len(b):
        n_bad = 0
        for col in a.columns:
            av, bv = a[col].tolist(), b[col].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                if not values_equal(x, y):
                    n_bad += 1
                    if n_bad <= 3:
                        problems.append(f"value [{col}][row {i}]: spark={x!r} oracle={y!r}")
        if n_bad > 3:
            problems.append(f"... {n_bad} mismatched values total")
    return problems


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    queries = entrypoint.queries()
    oracles = entrypoint.oracle_sql()
    n_pass = n_fail = n_skip = 0
    import time as _time

    t_start = _time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = _time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows={len(sdf)})")
            n_skip += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name} ({len(sdf)} rows):")
            for p in problems:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(sdf)} rows) [{_time.time() - t0:.1f}s]")
            n_pass += 1
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip"
        f" in {_time.time() - t_start:.0f}s"
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
