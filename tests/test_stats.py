"""Property tests for the distributed two-sample statistics
(operators/stats.py) against sequential Python reference
implementations — the same verify-by-independent-construction pattern
the ranking and temporal operators use."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from local_etl_csv_to_postgresql_spark.operators.stats import (
    chi_square_independence,
    two_sample_ks,
)


def _python_ks(a: list[float], b: list[float]) -> float:
    """Sequential two-sample KS on the pooled support."""
    support = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    best = 0.0
    for v in support:
        fa = sum(1 for x in a if x <= v) / na
        fb = sum(1 for x in b if x <= v) / nb
        best = max(best, abs(fa - fb))
    return best


def _python_chi2(pairs: list[tuple[int, int]]) -> dict[int, float]:
    """Per-a-value chi-square contributions, mirroring the operator's
    per-cell 6dp rounding so sums compare exactly."""
    n = len(pairs)
    obs = Counter(pairs)
    ra = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    out: dict[int, float] = {}
    for a in ra:
        total = 0.0
        for b in cb:
            e = ra[a] * cb[b] / n
            o = obs.get((a, b), 0)
            total += round((o - e) * (o - e) / e, 6)
        out[a] = round(total, 6)
    return out


@settings(max_examples=4, deadline=None)
@given(
    a=st.lists(st.integers(0, 20), min_size=1, max_size=60),
    b=st.lists(st.integers(0, 20), min_size=1, max_size=60),
)
def test_two_sample_ks_matches_bruteforce(spark, a, b):
    rows = [("g", float(v), 1) for v in a] + [("g", float(v), 0) for v in b]
    df = spark.createDataFrame(rows, ["g", "v", "side"])
    got = two_sample_ks(df, "g", "v", side_a=F.col("side") == 1).collect()[0]
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["ks_stat"] == pytest.approx(_python_ks(a, b), abs=2e-6)


def test_two_sample_ks_identical_samples_zero(spark):
    rows = [("g", float(v % 7), s) for v in range(50) for s in (0, 1)]
    df = spark.createDataFrame(rows, ["g", "v", "side"])
    got = two_sample_ks(df, "g", "v", side_a=F.col("side") == 1).collect()[0]
    assert got["ks_stat"] == 0.0


def test_two_sample_ks_empty_side_null(spark):
    df = spark.createDataFrame([("g", 1.0, 0), ("g", 2.0, 0)], ["g", "v", "side"])
    got = two_sample_ks(df, "g", "v", side_a=F.col("side") == 1).collect()[0]
    assert got["n_a"] == 0 and got["ks_stat"] is None


@settings(max_examples=4, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 4)),
        min_size=2,
        max_size=80,
    )
)
def test_chi_square_matches_bruteforce(spark, pairs):
    df = spark.createDataFrame(
        [(a, b) for a, b in pairs], ["a", "b"]
    )
    got = {
        r["a"]: (r["n_rows"], r["chi2_part"])
        for r in chi_square_independence(df, "a", "b").collect()
    }
    want = _python_chi2(pairs)
    ra = Counter(a for a, _ in pairs)
    assert set(got) == set(want)
    for a in want:
        assert got[a][0] == ra[a]
        assert got[a][1] == pytest.approx(want[a], abs=2e-6)


def test_chi_square_independent_uniform_is_zero(spark):
    # perfectly proportional grid -> expected == observed -> chi2 0
    rows = [(a, b) for a in range(3) for b in range(4) for _ in range(5)]
    df = spark.createDataFrame(rows, ["a", "b"])
    for r in chi_square_independence(df, "a", "b").collect():
        assert r["chi2_part"] == 0.0


def test_null_categories_and_values_dropped(spark):
    """NULL group/value rows must be excluded, not silently miscounted
    (the dense-grid and totals joins are null-unsafe)."""
    rows = [("g", 1.0, 1), ("g", 2.0, 0), (None, 3.0, 1), ("g", None, 0)]
    df = spark.createDataFrame(rows, ["g", "v", "side"])
    got = two_sample_ks(df, "g", "v", side_a=F.col("side") == 1).collect()
    assert len(got) == 1
    assert got[0]["n_a"] == 1 and got[0]["n_b"] == 1

    pairs = [(1, 1), (1, 2), (2, 1), (None, 2), (1, None)]
    df2 = spark.createDataFrame(
        [(a, b) for a, b in pairs], "a int, b int"
    )
    out = {r["a"]: r["n_rows"] for r in chi_square_independence(df2, "a", "b").collect()}
    assert out == {1: 2, 2: 1}


def _python_psi(a_bins, b_bins, n_bins, eps=0.5):
    na, nb = len(a_bins), len(b_bins)
    import math
    total = 0.0
    for k in range(n_bins):
        p = (sum(1 for x in a_bins if x == k) + eps) / (na + eps * n_bins)
        q = (sum(1 for x in b_bins if x == k) + eps) / (nb + eps * n_bins)
        total += round((p - q) * math.log(p / q), 6)
    return round(total, 6)


@settings(max_examples=4, deadline=None)
@given(
    a=st.lists(st.integers(0, 7), min_size=1, max_size=60),
    b=st.lists(st.integers(0, 7), min_size=1, max_size=60),
)
def test_psi_matches_bruteforce(spark, a, b):
    from local_etl_csv_to_postgresql_spark.operators.stats import (
        population_stability_index,
    )

    rows = [("g", v, 1) for v in a] + [("g", v, 0) for v in b]
    df = spark.createDataFrame(rows, ["g", "bin", "side"])
    got = population_stability_index(
        df, "g", "bin", side_a=F.col("side") == 1, n_bins=8
    ).collect()[0]
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["psi"] == pytest.approx(_python_psi(a, b, 8), abs=2e-6)
