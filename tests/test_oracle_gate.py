"""Full-contract oracle gate: EVERY ``__spark_entry__.queries()`` entry
runs on Spark and its ``oracle_sql()`` twin on DuckDB at sf0.001, with
the same row/column/value/dtype comparison ``scripts/check_oracle.py``
applies (itself a replica of the driver's hash gate).

The driver certifies only the first 50 entries per round, so queries
outside the rotation window have no fresh driver row for up to two
rounds — this gate makes a regression in ANY query loud between driver
runs (VERDICT r3, task 3). Select with ``pytest -m oracle``; deselect
with ``-m "not oracle"`` when iterating on unrelated code.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as ep
from scripts.check_oracle import compare

SF = "/root/testdata/sf0.001"

_QUERIES = ep.queries()
_ORACLES = ep.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    duckdb = pytest.importorskip("duckdb")
    from local_etl_csv_to_postgresql_spark.plans.analytics import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.oracle
@pytest.mark.integration
@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata not present")
# dict order preserved: dd06 builds the materialized cluster-label
# intermediate dd07 consumes, same as the driver's execution order
@pytest.mark.parametrize("name", list(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = _QUERIES[name](spark, SF).toPandas()
    if name not in _ORACLES:
        # rows-only by design (engine-specific results): hll01, es06
        assert len(sdf) >= 0
        return
    odf = duck.execute(_ORACLES[name]).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)
