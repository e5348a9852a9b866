"""transformWithState per-user totals (stateful.replay_tws_totals).

The transformWithState Python worker requires the protobuf package
(its state-server protocol); the build container does not ship it, so
this module skips there and runs the full two-batch replay wherever
protobuf is available (any standard PySpark 4 deployment).
"""

from __future__ import annotations

import importlib.util
import os

import pytest

SF = "/root/testdata/sf0.001"

def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


pytestmark = [
    pytest.mark.skipif(
        not _has_protobuf(),
        reason="protobuf not installed (transformWithState worker protocol)",
    ),
    pytest.mark.skipif(
        not os.path.isdir(SF), reason="driver testdata not present"
    ),
]


def test_tws_totals_equal_batch_groupby(spark):
    from pyspark.sql import functions as F

    from local_etl_csv_to_postgresql_spark.plans.analytics import load
    from local_etl_csv_to_postgresql_spark.streaming.stateful import (
        replay_tws_totals,
    )

    emitted = replay_tws_totals(spark, f"{SF}/events.parquet")
    # counts strictly increase and cents are non-negative, so the
    # final state per user is the per-column max over emissions
    final = emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_cents").alias("total_cents"),
    )
    expect = (
        load(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("total_cents"),
        )
    )
    got = {
        r["user_id"]: (r["n_events"], r["total_cents"])
        for r in final.collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["total_cents"])
        for r in expect.collect()
    }
    assert got == want
