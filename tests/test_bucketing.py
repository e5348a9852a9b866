"""Bucketed tables: the write-once-shuffle-never join layout.

Pins the property that matters at 100 TB: a join between two tables
bucketed on the join key runs WITHOUT any Exchange in the physical
plan (the shuffle happened once, at write time), while the same join
over plain frames shuffles both sides. Also pins bucket pruning on
point predicates over the bucket key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_etl_csv_to_postgresql_spark.operators.bucketing import (
    colocated_join,
    join_is_exchange_free,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10_000, 3).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("b")
    )
    write_bucketed(left, "bk_left", "k", buckets=4)
    write_bucketed(right, "bk_right", "k", buckets=4)
    yield "bk_left", "bk_right"
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    lt, rt = bucketed_pair
    # merge hint: at this toy size Spark would otherwise broadcast —
    # the bucketed layout exists for the sizes where broadcast can't.
    joined = spark.table(lt).hint("merge").join(spark.table(rt), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert join_is_exchange_free(joined)

    # the same join over unbucketed frames shuffles both sides
    raw_l = spark.range(0, 10_000).select(F.col("id").alias("k"))
    raw_r = spark.range(0, 10_000, 3).select(F.col("id").alias("k"))
    unbucketed = raw_l.join(raw_r.hint("merge"), "k")
    assert not join_is_exchange_free(unbucketed)


def test_bucketed_join_result_correct(spark, bucketed_pair):
    lt, rt = bucketed_pair
    got = (
        colocated_join(spark, lt, rt, "k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a").alias("sa"),
            F.sum("b").alias("sb"),
        )
        .collect()[0]
    )
    # right side = multiples of 3 below 10k -> 3334 matches
    assert got["n"] == 3334
    assert got["sa"] == sum(2 * k for k in range(0, 10_000, 3))
    assert got["sb"] == sum(k % 7 for k in range(0, 10_000, 3))


def test_bucket_pruning_on_point_lookup(spark, bucketed_pair):
    lt, _ = bucketed_pair
    # DisableUnnecessaryBucketedScan turns the bucketed scan off for a
    # bare filter (it only weighs join/agg distribution needs, not
    # pruning) — disable it to let the point lookup touch 1 bucket.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(lt).filter(F.col("k") == 4242)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 4" in plan
        assert df.count() == 1
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
