"""exact_percentile_cont: distributed selection vs Spark's built-in
exact ``percentile`` aggregate (which is itself oracle-matched to
PostgreSQL/DuckDB PERCENTILE_CONT in the q04 gate)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from local_etl_csv_to_postgresql_spark.operators.quantile import (
    exact_percentile_cont,
)


def _builtin(spark, values, p):
    df = spark.createDataFrame([(float(v),) for v in values], ["v"])
    return df.agg(F.expr(f"percentile(v, {p})").alias("x")).collect()[0]["x"]


@pytest.mark.parametrize("p", [0.0, 0.25, 0.5, 0.9, 1.0])
def test_matches_builtin_random(spark, p):
    rng = random.Random(42)
    values = [round(rng.uniform(-1000, 1000), 2) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in values], ["amount"])
    got = exact_percentile_cont(df, "amount", p, partitions=8).collect()[0][
        "percentile"
    ]
    assert got == pytest.approx(_builtin(spark, values, p), abs=1e-9)


def test_duplicates_and_single_value(spark):
    values = [5.0] * 100 + [7.0] * 3
    df = spark.createDataFrame([(v,) for v in values], ["amount"])
    got = exact_percentile_cont(df, "amount", 0.5, partitions=4).collect()[0][
        "percentile"
    ]
    assert got == 5.0

    one = spark.createDataFrame([(42.0,)], ["amount"])
    assert (
        exact_percentile_cont(one, "amount", 0.5).collect()[0]["percentile"]
        == 42.0
    )


def test_interpolation_even_count(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (10.0,)], ["amount"])
    got = exact_percentile_cont(df, "amount", 0.5, partitions=2).collect()[0][
        "percentile"
    ]
    assert got == 2.5


def test_nulls_ignored_and_empty(spark):
    df = spark.createDataFrame(
        [(None,), (1.0,), (None,), (3.0,)], "amount double"
    )
    got = exact_percentile_cont(df, "amount", 0.5).collect()[0]["percentile"]
    assert got == 2.0

    empty = spark.createDataFrame([], "amount double")
    assert (
        exact_percentile_cont(empty, "amount", 0.5).collect()[0]["percentile"]
        is None
    )


def test_rejects_bad_p(spark):
    df = spark.createDataFrame([(1.0,)], ["amount"])
    with pytest.raises(ValueError):
        exact_percentile_cont(df, "amount", 1.5)


def test_multi_percentiles_match_numpy_and_single(spark):
    """exact_percentiles_cont amortizes one selection pass across the
    probability list; every value must equal numpy's linear
    interpolation AND the single-p operator bit-for-bit."""
    import numpy as np

    from local_etl_csv_to_postgresql_spark.operators.quantile import (
        exact_percentiles_cont,
    )

    rng = np.random.default_rng(7)
    data = rng.normal(100.0, 25.0, size=501).round(2)
    df = spark.createDataFrame([(float(v),) for v in data], ["amount"])
    ps = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = exact_percentiles_cont(df, "amount", ps, partitions=8)
    assert [p for p, _ in got] == ps
    for p, v in got:
        assert v == pytest.approx(float(np.percentile(data, 100 * p)), abs=1e-9)
        single = exact_percentile_cont(df, "amount", p, partitions=8)
        assert v == single.collect()[0]["percentile"]


def test_multi_percentiles_empty_and_dupes(spark):
    from local_etl_csv_to_postgresql_spark.operators.quantile import (
        exact_percentiles_cont,
    )

    empty = spark.createDataFrame([], "amount double")
    assert exact_percentiles_cont(empty, "amount", [0.5, 0.9]) == [
        (0.5, None),
        (0.9, None),
    ]
    # empty probability list short-circuits before any Spark work
    # (no range shuffle, no opaque .filter(None) crash)
    df_one = spark.createDataFrame([(1.0,)], ["amount"])
    assert exact_percentiles_cont(df_one, "amount", []) == []
    # heavy ties: all quantiles collapse to the single value
    df = spark.createDataFrame([(5.0,)] * 40, ["amount"])
    for _, v in exact_percentiles_cont(df, "amount", [0.1, 0.5, 0.9]):
        assert v == 5.0


def test_discrete_rank_values_matches_sorted(spark):
    """exact_discrete_rank_values returns the exact order statistics a
    full sort would: swept over odd/even n, duplicates, negatives, and
    a seeded random multiset, for several rank patterns including the
    rs02 median pair."""
    import random

    from local_etl_csv_to_postgresql_spark.operators.quantile import (
        exact_discrete_rank_values,
    )

    rng = random.Random(13)
    datasets = [
        [3.0],
        [2.0, 1.0],
        [5.0, 5.0, 5.0, 5.0],
        [-2.5, 0.0, 7.5, 7.5, -2.5, 3.25, 9.0],
        [round(rng.uniform(-100, 100), 3) for _ in range(501)],
        [round(rng.uniform(-1, 1), 1) for _ in range(500)],  # heavy ties
    ]
    for vals in datasets:
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        want = sorted(vals)
        n = len(vals)
        median_pair = sorted({(n + 1) // 2 - 1, (n + 2) // 2 - 1})
        for ranks in ([0], [n - 1], median_pair, [0, n // 2, n - 1]):
            got_n, got = exact_discrete_rank_values(
                df, "v", lambda _n, r=ranks: r
            )
            assert got_n == n
            assert got == [want[r] for r in ranks]


def test_discrete_rank_values_empty_nulls_and_bounds(spark):
    from local_etl_csv_to_postgresql_spark.operators.quantile import (
        exact_discrete_rank_values,
    )

    import pytest as _pytest

    empty = spark.createDataFrame([], "v double")
    n, vals = exact_discrete_rank_values(empty, "v", lambda n: [0, 1])
    assert n == 0 and vals == [None, None]
    # nulls are ignored, not counted
    df = spark.createDataFrame([(None,), (4.0,), (None,), (1.0,)], "v double")
    n, vals = exact_discrete_rank_values(df, "v", lambda n: [0, n - 1])
    assert n == 2 and vals == [1.0, 4.0]
    # out-of-range rank is a loud error, not a silent wrong pick
    with _pytest.raises(ValueError, match="outside"):
        exact_discrete_rank_values(df, "v", lambda n: [n])
    # empty rank list on non-empty data: (n, []), not a filter(None) crash
    n, vals = exact_discrete_rank_values(df, "v", lambda n: [])
    assert n == 2 and vals == []
