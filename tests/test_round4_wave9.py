"""Invariant checks for the round-4 wave-9 queries (drift family,
embedding QC, graph/skew audits): mathematical bounds that must hold
on ANY input, checked on the driver testdata. The value-level
certification lives in the oracle gate; these pin the semantics a
hash can't express (non-negativity, normalization, ranges)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as ep

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def _rows(spark, name):
    return ep.queries()[name](spark, SF).collect()


@needs_testdata
def test_psi_nonnegative_and_flag_consistent(spark):
    for r in _rows(spark, "psi01_value_stability"):
        assert r["psi"] >= 0.0  # every (p-q)ln(p/q) term is >= 0
        assert r["drifted"] == (r["psi"] > 0.25)
        assert r["n_early"] > 0 and r["n_late"] > 0


@needs_testdata
def test_ks_stat_in_unit_interval(spark):
    for r in _rows(spark, "ks01_value_drift"):
        assert 0.0 <= r["ks_stat"] <= 1.0


@needs_testdata
def test_chi_square_parts_nonnegative(spark):
    for r in _rows(spark, "cs01_chi_square_mix"):
        assert r["chi2_part"] >= 0.0
        assert r["n_events"] > 0


@needs_testdata
def test_jsd_bounded_by_ln2(spark):
    rows = _rows(spark, "src01_source_divergence")
    assert len(rows) == 190  # C(20, 2) source pairs
    for r in rows:
        assert -1e-9 <= r["jsd"] <= 0.6931472 + 1e-9
        assert r["source_a"] < r["source_b"]


@needs_testdata
def test_degree_profile_shares_normalize(spark):
    rows = _rows(spark, "gr01_candidate_degree_profile")
    assert rows, "candidate graph must not be empty on the testdata"
    assert abs(sum(r["endpoint_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 1 <= r["min_degree"] <= r["max_degree"]
        # bucket b holds degrees with bit length b
        assert r["min_degree"] >= 2 ** (r["bucket"] - 1)
        assert r["max_degree"] < 2 ** r["bucket"]


@needs_testdata
def test_minhash_calibration_ranges(spark):
    for r in _rows(spark, "dd10_minhash_calibration"):
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["mean_est"] <= 1.0
        assert 0.0 <= r["mean_exact"] <= 1.0
        assert r["mean_abs_err"] >= 0.0
        assert r["n_pairs"] > 0


@needs_testdata
def test_interarrival_cv2_nonnegative(spark):
    for r in _rows(spark, "ia01_interarrival_stats"):
        assert r["mean_gap_s"] > 0
        assert r["cv2"] >= 0.0  # population variance / mean^2


@needs_testdata
def test_skew_audit_bounds(spark):
    rows = _rows(spark, "sk01_key_skew_audit")
    assert {r["join_key"] for r in rows} == {
        "events.user_id",
        "orders.o_custkey",
        "lineitem.l_orderkey",
    }
    for r in rows:
        assert r["skew_ratio"] >= 1.0  # max >= avg by definition
        assert 0.0 < r["top1_share"] <= 1.0
        assert r["max_key_rows"] <= r["n_rows"]


@needs_testdata
def test_silhouette_in_range(spark):
    for r in _rows(spark, "es10_label_silhouette"):
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert r["mean_own_dist"] >= 0.0


@needs_testdata
def test_vocab_coverage_rates(spark):
    for r in _rows(spark, "tx10_vocab_coverage"):
        assert 0.0 <= r["oov_token_rate"] <= 1.0
        assert 0.0 <= r["oov_type_rate"] <= 1.0
        assert r["covered_tokens"] <= r["n_tokens"]
        assert r["n_types"] <= r["n_tokens"]


@needs_testdata
def test_locf_fill_carries_only_after_observation(spark):
    rows = _rows(spark, "win02_locf_fill")
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, seq in by_user.items():
        seq.sort(key=lambda r: r["day"])
        seen = False
        for r in seq:
            if r["n_events"] > 0:
                seen = True
                assert not r["is_filled"]
            elif r["is_filled"]:
                assert seen, f"user {user} carried before first observation"
            else:
                assert r["locf_value"] is None
