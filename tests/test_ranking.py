"""operators/ranking.py: the distributed two-phase rank must agree
exactly with the engine's own window functions (which are safe at test
scale), including NTILE bucket-size semantics and tie handling."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from local_etl_csv_to_postgresql_spark.operators.ranking import (
    attach_global_row_number,
    exact_ntile,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_global_row_number_matches_window(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 37 % 251).alias("v")
    )
    got = attach_global_row_number(
        df, order_by=[F.asc("v"), F.asc("id")], rn_col="rn", partitions=8
    )
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = df.withColumn("rn", F.row_number().over(w))
    assert _rows(got, "id", "rn") == _rows(want, "id", "rn")


def test_grouped_row_number_and_totals(spark):
    df = spark.range(600).select(
        F.col("id"),
        (F.col("id") % 3).alias("grp"),
        (F.col("id") * 13 % 101).alias("v"),
    )
    got = attach_global_row_number(
        df,
        order_by=[F.desc("v"), F.asc("id")],
        partition_by=["grp"],
        rn_col="rn",
        total_col="n",
        partitions=8,
    )
    w = Window.partitionBy("grp").orderBy(F.desc("v"), F.asc("id"))
    want = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    assert _rows(got, "id", "rn", "n") == _rows(want, "id", "rn", "n")


def test_running_sum_matches_window_prefix_sum(spark):
    df = spark.range(800).select(
        F.col("id"),
        (F.col("id") % 4).alias("grp"),
        (F.col("id") * 7 % 53).alias("v"),
    )
    got = attach_global_row_number(
        df,
        order_by=[F.asc("id")],
        partition_by=["grp"],
        rn_col="rn",
        running_sum_of="v",
        running_sum_col="run",
        partitions=8,
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("run", F.sum("v").over(w))
    assert _rows(got, "id", "run") == _rows(want, "id", "run")


@pytest.mark.parametrize("n,tiles", [(1000, 10), (997, 10), (7, 10), (13, 4)])
def test_exact_ntile_matches_engine_ntile(spark, n, tiles):
    """Uneven n (997 % 10 != 0) exercises the first-r-buckets-get-one-
    extra rule; n < tiles exercises the bucket==rn degenerate case."""
    df = spark.range(n).select((F.col("id") + 1).alias("rn"))
    got = df.select(
        "rn", exact_ntile(F.col("rn"), F.lit(n).cast("long"), tiles).alias("t")
    )
    want = spark.range(n).select(F.col("id").alias("k")).select(
        (F.col("k") + 1).alias("rn"),
        F.ntile(tiles).over(Window.orderBy("k")).alias("t"),
    )
    assert _rows(got, "rn", "t") == _rows(want, "rn", "t")


def test_null_group_keys_are_kept(spark):
    """Rows whose partition_by key is NULL must get row numbers like any
    other group (window semantics treat NULL as one group) — the offset
    join is null-safe, not a plain equi-join that drops them."""
    df = spark.range(300).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id") % 3)
        .alias("grp"),
        (F.col("id") * 11 % 97).alias("v"),
    )
    got = attach_global_row_number(
        df,
        order_by=[F.asc("v"), F.asc("id")],
        partition_by=["grp"],
        rn_col="rn",
        total_col="n",
        partitions=8,
    )
    assert got.count() == 300  # no rows silently dropped
    w = Window.partitionBy("grp").orderBy(F.asc("v"), F.asc("id"))
    want = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    assert _rows(got, "id", "rn", "n") == _rows(want, "id", "rn", "n")


def test_offset_matrix_guard_fires_on_high_cardinality(spark):
    """A high-cardinality partition_by (one group per row) violates the
    driver-metadata contract and must raise, not OOM the driver."""
    from local_etl_csv_to_postgresql_spark.operators import ranking

    df = spark.range(2000).select(
        F.col("id"), F.col("id").alias("grp"), (F.col("id") % 7).alias("v")
    )
    orig = ranking._MAX_OFFSET_ROWS
    ranking._MAX_OFFSET_ROWS = 1000
    try:
        with pytest.raises(ValueError, match="low-cardinality"):
            attach_global_row_number(
                df,
                order_by=[F.asc("v")],
                partition_by=["grp"],
                rn_col="rn",
                partitions=8,
            )
    finally:
        ranking._MAX_OFFSET_ROWS = orig


def test_ties_colocated_min_max_recover_rank_and_cume(spark):
    """With no tie-break in order_by, min/max of the attached row number
    over each tie group must reproduce rank() and the cume_dist
    numerator — the contract q35 relies on."""
    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 7).alias("v")  # heavy ties
    )
    got = attach_global_row_number(
        df, order_by=[F.asc("v")], rn_col="rn", total_col="n", partitions=8
    )
    wt = Window.partitionBy("v")
    got = (
        got.withColumn("rank", F.min("rn").over(wt))
        .withColumn("cume_n", F.max("rn").over(wt))
        .select("id", "rank", "cume_n")
    )
    w = Window.orderBy("v")
    want = df.select(
        "id",
        F.rank().over(w).alias("rank"),
        (F.cume_dist().over(w) * 500).cast("long").alias("cume_n"),
    )
    assert _rows(got, "id", "rank", "cume_n") == _rows(want, "id", "rank", "cume_n")


def test_multi_column_running_sums_match_window(spark):
    """running_sum_of accepts a sequence: each output must equal the
    equivalent SUM() OVER (PARTITION BY g ORDER BY o) window — the
    contract ks01's two-CDF computation relies on (both cumulative
    sample counts in one shuffle)."""
    df = spark.range(2000).select(
        F.col("id"),
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 11).alias("o"),
        (F.col("id") % 5).alias("x"),
        (F.col("id") % 4).alias("y"),
    )
    got = attach_global_row_number(
        df,
        order_by=[F.asc("o"), F.asc("id")],
        partition_by=["g"],
        rn_col="rn",
        partitions=8,
        running_sum_of=["x", "y"],
        running_sum_col=["cx", "cy"],
    )
    w = (
        Window.partitionBy("g")
        .orderBy("o", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.select(
        "id", F.sum("x").over(w).alias("cx"), F.sum("y").over(w).alias("cy")
    )
    assert _rows(got, "id", "cx", "cy") == _rows(want, "id", "cx", "cy")


def test_running_sum_col_name_mismatch_raises(spark):
    df = spark.range(10).select(F.col("id"), (F.col("id") % 2).alias("x"))
    with pytest.raises(ValueError, match="one output per"):
        attach_global_row_number(
            df,
            order_by=[F.asc("id")],
            rn_col="rn",
            running_sum_of=["x", "x"],
            running_sum_col=["only_one"],
        )
