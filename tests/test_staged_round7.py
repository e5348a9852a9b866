"""Round-7 staged surface: operators implemented and locally certified
this round but not yet registered in ``__spark_entry__.queries()`` (the
round-6 certification window's ten new-entry slots are spent — see
``ROUND7_STAGED_QUERIES`` in functions/entrypoints.py).

Each staged query runs through the SAME Spark-vs-DuckDB compare harness
as the driver gate, so registration next round is a two-line dict move
with the certification evidence already green.
"""

from __future__ import annotations

import os

import pytest

from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
    EXTENSION_QUERIES,
    ROUND7_PROMOTED,
    ROUND8_PROMOTED,
    ROUND7_STAGED_ORACLE,
    ROUND7_STAGED_QUERIES,
)
from scripts.check_oracle import compare

# Invariant tests below index queries by name. Promoted queries move to
# EXTENSION_QUERIES at round boundaries (ROUND7_PROMOTED); the ones
# still staged stay in ROUND7_STAGED_QUERIES — look up in either.
QUERIES = {**EXTENSION_QUERIES, **ROUND7_STAGED_QUERIES}

SF = "/root/testdata/sf0.001"
# the scale the round driver's own gate runs at — certification must
# hold here too, AUTOMATICALLY, or a scale-dependent hash flip (tie
# orders, hash-band populations) ships with all repo checks green
DRIVER_SF = "/root/testdata/sf0.01"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


@pytest.fixture(
    scope="module", params=[SF, DRIVER_SF], ids=["sf0.001", "sf0.01"]
)
def sf_dir(request):
    if not os.path.isdir(request.param):
        pytest.skip("driver testdata not present")
    return request.param


@pytest.fixture(scope="module")
def duck(sf_dir):
    duckdb = pytest.importorskip("duckdb")
    from local_etl_csv_to_postgresql_spark.plans.analytics import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_every_staged_query_has_oracle():
    assert set(ROUND7_STAGED_QUERIES) == set(ROUND7_STAGED_ORACLE)


def test_promoted_queries_were_sf01_swept():
    """Promotion precondition (r7 verdict task 3, the dd14 lesson made
    structural): every query promoted into the live registry this round
    AND every still-staged query must have a recorded sf0.1 wall in
    scripts/staged_sf01_walls.json (written by scripts/staged_sweep.py).
    A staged query with sf0.001/sf0.01 certification but no measured
    sf0.1 wall is exactly how dd14 shipped a 396.7 s interpreted-lambda
    plan — this test makes that promotion path impossible."""
    import json

    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        ROUND8_PROMOTED,
        ROUND9_PROMOTED,
        ROUND10_PROMOTED,
        ROUND11_PROMOTED,
        ROUND12_PROMOTED,
        ROUND13_PROMOTED,
    )

    path = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "staged_sf01_walls.json"
    )
    with open(path) as fh:
        walls = json.load(fh)
    required = (
        set(ROUND7_STAGED_QUERIES)
        | set(ROUND8_PROMOTED)
        | set(ROUND9_PROMOTED)
        | set(ROUND10_PROMOTED)
        | set(ROUND11_PROMOTED)
        | set(ROUND12_PROMOTED)
        | set(ROUND13_PROMOTED)
    )
    missing = required - set(walls)
    assert missing == set(), (
        f"no recorded sf0.1 wall for: {sorted(missing)} — run "
        "scripts/staged_sweep.py before promoting"
    )
    for name in required:
        assert walls[name]["sec"] < 60.0, (
            f"{name}: recorded sf0.1 wall {walls[name]['sec']} s is a "
            "dd14-class escape; fix the plan before promoting"
        )


def test_staged_names_not_yet_registered():
    """A staged query must NOT appear in queries() yet: an unregistered
    name can never violate the never-certified-in-window invariant, and
    a registered one must graduate OUT of the staged dict."""
    import __spark_entry__ as ep

    overlap = set(ROUND7_STAGED_QUERIES) & set(ep.queries())
    assert overlap == set(), f"graduated queries still staged: {overlap}"


@pytest.mark.integration
@pytest.mark.parametrize("name", list(ROUND7_STAGED_QUERIES))
def test_staged_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(ROUND7_STAGED_ORACLE[name]).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.oracle
@pytest.mark.integration
@pytest.mark.parametrize("name", ROUND7_PROMOTED + ROUND8_PROMOTED)
def test_promoted_query_matches_oracle_at_driver_scale(spark, name):
    """The round-7/8 promotions left the staged harness (which certified
    them at BOTH sf0.001 and sf0.01); test_oracle_gate covers the live
    registry at sf0.001 only. This keeps the sf0.01 (driver-gate scale)
    certification pinned locally until the driver's own rows land."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        EXTENSION_ORACLE,
    )
    from local_etl_csv_to_postgresql_spark.plans.analytics import TABLES

    if not os.path.isdir(DRIVER_SF):
        pytest.skip("driver testdata not present")
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{DRIVER_SF}/{t}.parquet'"
            )
        sdf = QUERIES[name](spark, DRIVER_SF).toPandas()
        odf = con.execute(EXTENSION_ORACLE[name]).fetchdf()
    finally:
        con.close()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)


@needs_testdata
@pytest.mark.integration
def test_es13_adc_invariants(spark):
    """ADC search output invariants: k rows, codes within [0, K·init
    id range), non-negative ascending distances, query excluded."""
    out = QUERIES["es13_pq_adc_search"](spark, SF).collect()
    assert len(out) == 10
    dists = [r["adc_dist"] for r in out]
    assert all(d >= 0 for d in dists)
    assert dists == sorted(dists)
    assert all(r["vec_id"] != 0 for r in out)


@needs_testdata
@pytest.mark.integration
def test_dd13_semdedup_invariants(spark):
    """Cluster membership is a partition of the corpus; removed docs
    are a subset of dup-pair participants."""
    out = QUERIES["dd13_semantic_dedup"](spark, SF).collect()
    assert len(out) == 8
    assert sum(r["n_members"] for r in out) == 500
    for r in out:
        assert 0 <= r["n_removed"] <= r["n_dup_pairs"]
        assert r["n_removed"] <= r["n_members"]


@needs_testdata
@pytest.mark.integration
def test_ir01_dsir_invariants(spark):
    """DSIR scores rank RAW (non-target) docs only, descending."""
    out = QUERIES["ir01_dsir_importance"](spark, SF).collect()
    assert len(out) == 20
    assert all(r["lang"] != "en" for r in out)
    ws = [r["dsir_weight"] for r in out]
    assert ws == sorted(ws, reverse=True)
    assert all(r["n_grams"] > 0 for r in out)


@needs_testdata
@pytest.mark.integration
def test_sl01_leakage_invariants(spark):
    """Split pairs are ordered, bounded by the 3 splits; doc counts
    are at least 1 per side wherever a shared chunk exists."""
    out = QUERIES["sl01_split_leakage"](spark, SF).collect()
    assert 0 < len(out) <= 3
    for r in out:
        assert r["split_a"] < r["split_b"]
        assert r["n_shared_chunks"] >= 1
        assert r["n_docs_a"] >= 1 and r["n_docs_b"] >= 1


@needs_testdata
@pytest.mark.integration
def test_xl01_crosslingual_invariants(spark):
    """Lang pairs are unordered-canonical and never same-language;
    mean cosine sits at or above the operating threshold."""
    out = QUERIES["xl01_crosslingual_neardup"](
        spark, SF
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["lang_lo"] < r["lang_hi"]
        assert r["n_pairs"] >= 1
        assert r["avg_cosine"] >= 0.35


@needs_testdata
@pytest.mark.integration
def test_st11_watermarked_dedup_invariants(spark):
    """ALL THREE drop/emit paths actually executed: the late filter
    dropped rows, at least one old first delivery was LOST (emitted <
    st04's distinct set — the semantic difference bounded state buys),
    and at least one in-horizon re-delivery was dropped AS A DUPLICATE
    against live state (delivered − late-dropped − emitted > 0) —
    without the last check, a plain watermark filter with no dedup at
    all would pass the oracle compare."""
    from pyspark.sql import functions as F

    out = QUERIES["st11_watermarked_dedup"](spark, SF).collect()
    from local_etl_csv_to_postgresql_spark.streaming import stateful as st

    assert st.LAST_WMDEDUP_DROPPED > 0
    n_emitted = sum(r["n_events"] for r in out)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_distinct = ev.select("event_id").distinct().count()
    assert 0 < n_emitted < n_distinct
    # reconstruct the delivered-row count from the replay's split rules
    old = F.col("ts") < F.lit(st.LATE_CUTOFF).cast("timestamp")
    n_a = ev.filter(F.col("event_id") % st.LATE_MOD != 0).count()
    n_b = ev.filter(
        (F.col("event_id") % st.LATE_MOD == 1) & old
    ).count()
    n_c = ev.filter(F.col("event_id") % st.LATE_MOD == 0).count() + ev.filter(
        F.col("event_id") % st.LATE_MOD == 2
    ).count()
    delivered = n_a + n_b + n_c
    dup_dropped = delivered - st.LAST_WMDEDUP_DROPPED - n_emitted
    assert dup_dropped > 0


@needs_testdata
@pytest.mark.integration
def test_q51_returned_revenue_invariants(spark):
    """Top-20 frame: strictly rank-ordered revenue, distinct customers,
    every row positive (a returned-item group with zero revenue cannot
    enter the top 20 while any positive group exists)."""
    out = QUERIES["q51_returned_item_revenue"](
        spark, SF
    ).collect()
    assert len(out) == 20
    revs = [r["revenue"] for r in out]
    assert revs == sorted(revs, reverse=True)
    assert all(v > 0 for v in revs)
    assert len({r["c_custkey"] for r in out}) == 20


@needs_testdata
@pytest.mark.integration
def test_ss04_temporal_split_invariants(spark):
    """Conservation + leakage bounds: row counts partition the corpus
    exactly; leaked users never exceed either side's distinct users;
    both sides are non-empty for every type (the cutoff sits
    mid-corpus by construction — the st11 lesson: a boundary split
    would certify only one path)."""
    out = QUERIES["ss04_temporal_split_audit"](
        spark, SF
    ).collect()
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r["n_train"] + r["n_test"] for r in out) == total
    for r in out:
        assert r["n_train"] > 0 and r["n_test"] > 0
        assert r["n_users_train"] <= r["n_train"]
        assert r["n_users_test"] <= r["n_test"]
        assert r["n_leaked_users"] <= min(
            r["n_users_train"], r["n_users_test"]
        )
        assert r["n_leaked_users"] > 0  # mid-corpus cutoff must leak


@needs_testdata
@pytest.mark.integration
def test_gr02_pagerank_invariants(spark):
    """Fixed-point sanity: ranks are positive, bounded by total mass,
    rank-ordered; every ranked node has at least one verified
    neighbour (isolated docs never enter the graph)."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        PR_UNITS,
    )

    out = QUERIES["gr02_candidate_pagerank"](
        spark, SF
    ).collect()
    assert len(out) > 0
    ranks = [r["rank_units"] for r in out]
    assert ranks == sorted(ranks, reverse=True)
    for r in out:
        assert 0 < r["rank_units"] <= PR_UNITS
        assert r["n_neighbors"] >= 1


@needs_testdata
@pytest.mark.integration
def test_st12_upsert_rejected_redeliveries(spark):
    """The protocol claim the oracle compare can't see: rows WERE
    re-delivered (batch B overlaps batch A) and the sink rejected
    every one — final table cardinality equals the distinct corpus
    while delivered rows exceed it. Without the overlap check a
    degenerate split with no duplicates would certify nothing."""
    from pyspark.sql import functions as F

    from local_etl_csv_to_postgresql_spark.streaming.stateful import (
        replay_foreachbatch_upsert,
    )

    fact = replay_foreachbatch_upsert(spark, f"{SF}/events.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_distinct = ev.select("event_id").distinct().count()
    assert fact.count() == n_distinct
    assert fact.select("event_id").distinct().count() == n_distinct
    n_redelivered = ev.filter(F.col("event_id") % 10 == 3).count()
    assert n_redelivered > 0


@needs_testdata
@pytest.mark.integration
def test_ct03_fuzzy_contamination_invariants(spark):
    """The eval source never reports itself; counts are consistent
    (distinct docs <= pairs); every surviving match is at or above
    the operating threshold."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        CT03_EVAL_SOURCE,
        CT03_THRESHOLD,
    )

    out = QUERIES["ct03_fuzzy_contamination"](
        spark, SF
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["source"] != CT03_EVAL_SOURCE
        assert 1 <= r["n_contaminated_docs"] <= r["n_pairs"]
        assert 1 <= r["n_eval_docs_hit"] <= r["n_pairs"]
        assert CT03_THRESHOLD <= r["max_jaccard"] <= 1.0


@needs_testdata
@pytest.mark.integration
def test_win04_interpolation_invariants(spark):
    """Interpolated values sit within each user's observed envelope
    (a straight line between two points cannot escape them); edge
    rows are exactly the NULL-valued rows; every (user, day) cell of
    the grid is present exactly once."""
    import collections

    rows = QUERIES["win04_linear_interpolation"](
        spark, SF
    ).collect()
    seen = collections.Counter((r["user_id"], r["day"]) for r in rows)
    assert max(seen.values()) == 1
    by_user: dict = collections.defaultdict(list)
    for r in rows:
        if r["fill_kind"] == "obs":
            by_user[r["user_id"]].append(r["value_filled"])
        assert (r["value_filled"] is None) == (r["fill_kind"] == "edge")
    n_interp = 0
    for r in rows:
        if r["fill_kind"] == "interp":
            n_interp += 1
            lo, hi = min(by_user[r["user_id"]]), max(by_user[r["user_id"]])
            # floor-at-1e-6 can dip 1 micro-unit below the envelope
            assert lo - 1e-6 <= r["value_filled"] <= hi
    assert n_interp > 0  # the gap path must actually execute


@needs_testdata
@pytest.mark.integration
def test_hll02_sketch_invariants(spark):
    """Register digest stays within its construction bounds (m
    registers, each contributing at most 2^(rest_bits+1) units) and
    the estimate lands within sane HLL error of the exact count
    (256 registers -> ~6.5% std err; 25% is a hard regression line)."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        HLL_M,
        HLL_REST_BITS,
    )

    out = QUERIES["hll02_deterministic_hll"](
        spark, SF
    ).collect()
    assert len(out) > 0
    cap = HLL_M * (1 << (HLL_REST_BITS + 1))
    for r in out:
        assert 1 <= r["occupied"] <= HLL_M
        assert 0 < r["register_digest"] <= cap
        assert abs(r["rel_err"]) < 0.25
        assert r["estimate"] > 0


@needs_testdata
@pytest.mark.integration
def test_q5x_tpch_closeout_invariants(spark):
    """The wave-11/12 TPC-H shapes: sanity bounds the oracles don't
    state (non-empty, limits honored, pivot counts partition)."""
    q52 = QUERIES["q52_shipping_priority"](spark, SF).collect()
    assert 0 < len(q52) <= 10
    revs = [r["revenue"] for r in q52]
    assert revs == sorted(revs, reverse=True)
    q53 = QUERIES["q53_order_priority_check"](
        spark, SF
    ).collect()
    assert {r["o_orderpriority"] for r in q53} <= {
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
    }
    assert all(r["order_count"] > 0 for r in q53)
    q55 = QUERIES["q55_priority_pivot_by_status"](
        spark, SF
    ).collect()
    assert {r["l_linestatus"] for r in q55} == {"F", "O"}
    q56 = QUERIES["q56_promo_revenue_share"](
        spark, SF
    ).collect()
    assert len(q56) == 1
    assert 0.0 <= q56[0]["promo_revenue_pct"] <= 100.0
    assert q56[0]["promo_revenue"] <= q56[0]["total_revenue"]
    q58 = QUERIES["q58_large_volume_orders"](
        spark, SF
    ).collect()
    assert 0 < len(q58) <= 20
    assert all(r["total_qty"] > 250 for r in q58)


@needs_testdata
@pytest.mark.integration
def test_cm01_sketch_inequality(spark):
    """The Count-Min defining property: estimates never underestimate,
    and with 4x512 cells over this vocab most top tokens are exact."""
    out = QUERIES["cm01_countmin_heavy_hitters"](
        spark, SF
    ).collect()
    assert len(out) == 10
    for r in out:
        assert r["cm_estimate"] >= r["true_count"]
        assert r["overestimate"] == r["cm_estimate"] - r["true_count"]
    counts = [r["true_count"] for r in out]
    assert counts == sorted(counts, reverse=True)


@needs_testdata
@pytest.mark.integration
def test_es14_truncation_recall_bounds(spark):
    """Truncated-retrieval recalls are valid fractions, and the wider
    prefix can't do worse ON AVERAGE (per-query it may tie or flip;
    the corpus-mean monotonicity is the property truncation sells)."""
    out = QUERIES["es14_truncated_dim_recall"](
        spark, SF
    ).collect()
    assert len(out) == 10
    for r in out:
        assert 0.0 <= r["recall_d16"] <= 1.0
        assert 0.0 <= r["recall_d32"] <= 1.0
    m16 = sum(r["recall_d16"] for r in out) / len(out)
    m32 = sum(r["recall_d32"] for r in out) / len(out)
    assert m32 >= m16 - 0.1


@needs_testdata
@pytest.mark.integration
def test_tx14_cross_entropy_invariants(spark):
    """Cross-entropy is positive and bounded by log2 of the model
    denominator space; every scored doc has >= 1 bigram."""
    out = QUERIES["tx14_bigram_cross_entropy"](
        spark, SF
    ).collect()
    assert len(out) == 20
    ces = [r["cross_entropy"] for r in out]
    assert ces == sorted(ces, reverse=True)
    for r in out:
        assert r["n_bigrams"] >= 1
        assert 0.0 < r["cross_entropy"] < 30.0


@needs_testdata
@pytest.mark.integration
def test_win05_streak_invariants(spark):
    """Islands partition the active days: longest <= total, streak
    count <= active days, and all users present."""
    out = QUERIES["win05_activity_streaks"](
        spark, SF
    ).collect()
    assert len(out) > 0
    for r in out:
        assert 1 <= r["longest_streak"] <= r["n_active_days"]
        assert 1 <= r["n_streaks"] <= r["n_active_days"]


@needs_testdata
@pytest.mark.integration
def test_ss05_shard_partition_invariants(spark):
    """Shards partition the corpus exactly and rel_load averages 1."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        SS05_SHARDS,
    )

    out = QUERIES["ss05_shard_balance_audit"](
        spark, SF
    ).collect()
    assert len(out) <= SS05_SHARDS
    assert sum(r["n_docs"] for r in out) == 500
    mean_rel = sum(r["rel_load"] * r["n_docs"] for r in out)
    for r in out:
        assert r["token_mass"] > 0 and r["char_mass"] > 0
        assert 0 < r["rel_load"]


@needs_testdata
@pytest.mark.integration
def test_es15_jl_distortion_bounds(spark):
    """JL distortion concentrates near 1: every consecutive pair's
    ratio lands in a generous (0.4, 1.8) band at k=16, and the mean
    sits inside (0.75, 1.25) — the lemma's whole promise."""
    out = QUERIES["es15_jl_projection_qc"](
        spark, SF
    ).collect()
    assert len(out) == 20
    ds = [r["distortion"] for r in out]
    for d in ds:
        assert 0.4 < d < 1.8
    assert 0.75 < sum(ds) / len(ds) < 1.25
    for r in out:
        assert r["id_b"] == r["id_a"] + 1
        assert r["d_full"] > 0 and r["d_proj"] > 0


@needs_testdata
@pytest.mark.integration
def test_mm06_dedup_accounting(spark):
    """Re-delivered payloads are all caught: dup count equals the
    re-crawled subset size, and distinct+dups == delivered."""
    out = QUERIES["mm06_payload_dedup_audit"](
        spark, SF
    ).collect()
    assert len(out) > 0
    total_dups = sum(r["n_dup_deliveries"] for r in out)
    assert total_dups == 500 // 17 + (1 if 0 % 17 == 0 else 0)
    for r in out:
        assert r["n_delivered"] == r["n_distinct_payloads"] + r["n_dup_deliveries"]
        assert r["byte_mass"] > 0


@needs_testdata
@pytest.mark.integration
def test_st13_null_emission_happened(spark):
    """The left-outer semantics must actually exercise BOTH paths:
    matched pairs and watermark-evicted null rows, with the
    per-user accounting partitioning exactly."""
    out = QUERIES["st13_left_outer_attribution"](
        spark, SF
    ).collect()
    assert len(out) > 0
    assert sum(r["n_pairs"] for r in out) > 0
    assert sum(r["n_unmatched_views"] for r in out) > 0
    for r in out:
        assert r["n_output_rows"] == r["n_pairs"] + r["n_unmatched_views"]
        assert r["user_id"] >= 0


@needs_testdata
@pytest.mark.integration
def test_fz01_fuzzy_pairs_invariants(spark):
    """Blocking respected (pairs share a head noun), ordering total,
    distances in the configured band, pairs canonical (a < b)."""
    out = QUERIES["fz01_fuzzy_name_pairs"](spark, SF).collect()
    assert 0 < len(out) <= 25
    dists = [r["lev_dist"] for r in out]
    assert dists == sorted(dists)
    for r in out:
        assert 1 <= r["lev_dist"] <= 4
        assert r["name_a"] < r["name_b"]
        assert r["name_a"].split(" ")[-1] == r["name_b"].split(" ")[-1]
        assert r["n_parts_a"] >= 1 and r["n_parts_b"] >= 1


@needs_testdata
@pytest.mark.integration
def test_pa01_k_anonymity_invariants(spark):
    """Class sizes partition the table exactly; band edges honest."""
    out = QUERIES["pa01_k_anonymity_audit"](spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r["n_rows"] for r in out) == n_cust
    for r in out:
        assert 1 <= r["min_k"] <= r["max_k"]
        assert r["n_rows"] >= r["n_classes"] * r["min_k"]
        assert r["n_rows"] <= r["n_classes"] * r["max_k"]


@needs_testdata
@pytest.mark.integration
def test_ii01_inverted_index_invariants(spark):
    """Head is df-ordered; posting prefixes are ascending, bounded by
    10, and never exceed the term's df."""
    out = QUERIES["ii01_inverted_index"](spark, SF).collect()
    assert len(out) == 20
    dfs = [r["df"] for r in out]
    assert dfs == sorted(dfs, reverse=True)
    for r in out:
        ids = [int(x) for x in r["top_docs"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(10, r["df"])
        assert r["tf"] >= r["df"]


@needs_testdata
@pytest.mark.integration
def test_rs01_mad_invariants(spark):
    """MAD is non-negative; by construction at most half the group can
    sit beyond 3 MAD (for MAD > 0); median within the value range."""
    out = QUERIES["rs01_mad_outliers"](spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert r["mad"] >= 0
        assert 0 <= r["n_outliers"] <= r["n"] // 2


@needs_testdata
@pytest.mark.integration
def test_cr01_correlation_invariants(spark):
    """Pearson r is bounded; every event type reports."""
    out = QUERIES["cr01_value_time_correlation"](
        spark, SF
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["n"] > 0
        assert r["value_time_corr"] is None or -1.0 <= r["value_time_corr"] <= 1.0


@needs_testdata
@pytest.mark.integration
def test_win06_ohlc_invariants(spark):
    """low <= {open, close} <= high per bucket; bucket counts positive;
    buckets unique per (type, day)."""
    out = QUERIES["win06_daily_ohlc"](spark, SF).collect()
    assert len(out) > 0
    seen = set()
    for r in out:
        key = (r["event_type"], r["day"])
        assert key not in seen
        seen.add(key)
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n_events"] >= 1


@needs_testdata
@pytest.mark.integration
def test_q59_forecast_revenue_invariants(spark):
    """One row; revenue positive and consistent with the row count
    (each qualifying line contributes price*discount <= price*0.07)."""
    out = QUERIES["q59_forecast_revenue"](spark, SF).collect()
    assert len(out) == 1
    assert out[0]["n_lineitems"] > 0
    assert out[0]["revenue"] > 0


@needs_testdata
@pytest.mark.integration
def test_tx15_heaps_invariants(spark):
    """Cumulative vocab is the running sum, ends at the corpus distinct
    vocabulary, and decile 0 carries the largest novelty mass."""
    from pyspark.sql import functions as F

    out = QUERIES["tx15_heaps_vocab_growth"](spark, SF).collect()
    assert 1 <= len(out) <= 10
    run = 0
    for r in out:
        run += r["new_terms"]
        assert r["cum_vocab"] == run
        assert 0 <= r["decile"] <= 9
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            ).alias("t")
        )
        .agg(F.countDistinct("t"))
        .collect()[0][0]
    )
    assert out[-1]["cum_vocab"] == vocab
    assert out[0]["new_terms"] == max(r["new_terms"] for r in out)


@needs_testdata
@pytest.mark.integration
def test_pa02_l_diversity_invariants(spark):
    """l is bounded by the sensitive-attribute cardinality and by every
    class's size; rows partition the customer table."""
    out = QUERIES["pa02_l_diversity_audit"](spark, SF).collect()
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    n_seg = cust.select("c_mktsegment").distinct().count()
    assert sum(r["n_rows"] for r in out) == cust.count()
    for r in out:
        assert 1 <= r["l_distinct"] <= n_seg
        assert r["l_distinct"] <= r["max_k"]
        assert r["min_k"] >= r["l_distinct"]


@needs_testdata
@pytest.mark.integration
def test_st14_content_dedup_invariants(spark):
    """The stream delivered every document twice, yet each (lang,
    content) survives exactly once: distinct-content totals are below
    the raw doc count (the corpus HAS exact dups), char mass equals the
    batch-distinct recomputation, and every content maps to one lang
    bucket."""
    from pyspark.sql import functions as F
    from local_etl_csv_to_postgresql_spark.functions.dedup import hash60

    out = QUERIES["st14_content_dedup"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    n_emitted = sum(r["n_contents"] for r in out)
    # this corpus has no exact-content dups (its dup families are
    # near-dups), so the collapse to prove is the DELIVERY one: the
    # replay stage holds the file twice, the state store emits once
    from local_etl_csv_to_postgresql_spark.streaming import stateful as st

    _, stage = st._REPLAY_STAGE_CACHE[f"dedup2x::{SF}/documents.parquet"]
    delivered = spark.read.parquet(stage).count()
    assert delivered == 2 * n_docs
    assert n_emitted == n_docs  # each content exactly once
    batch = (
        docs.select("lang", hash60(F.col("text")).alias("fp"),
                    F.length("text").alias("len"))
        .groupBy("lang", "fp")
        .agg(F.max("len").alias("len"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("len").alias("mass"))
        .collect()
    )
    expect = {r["lang"]: (r["n"], r["mass"]) for r in batch}
    for r in out:
        assert expect[r["lang"]] == (r["n_contents"], r["char_mass"])


@needs_testdata
@pytest.mark.integration
def test_hq02_merge_exact_everywhere(spark):
    """Mergeability holds for EVERY group (the property the operator
    certifies), and merged quantiles are ordered p50<=p95<=p99."""
    out = QUERIES["hq02_mergeable_histogram"](
        spark, SF
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["merge_exact"] is True
        assert r["merged_p50"] <= r["merged_p95"] <= r["merged_p99"]


@needs_testdata
@pytest.mark.integration
def test_inc03_merge_exact_and_split_nondegenerate(spark):
    """The snapshot/batch split actually has rows on BOTH sides (else
    the merge proves nothing), and every merged statistic equals the
    full recompute."""
    from pyspark.sql import functions as F

    out = QUERIES["inc03_incremental_rollup_maintenance"](
        spark, SF
    ).collect()
    assert len(out) > 0
    assert all(r["merge_exact"] is True for r in out)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ts = F.timestamp_micros(F.expr("ts div 1000")) if dict(ev.dtypes).get(
        "ts"
    ) == "bigint" else F.col("ts").cast("timestamp")
    n_old = ev.filter(ts < F.lit("2024-01-16")).count()
    n_new = ev.filter(ts >= F.lit("2024-01-16")).count()
    assert n_old > 0 and n_new > 0
    assert sum(r["n_events"] for r in out) == n_old + n_new


@needs_testdata
@pytest.mark.integration
def test_tx16_nb_langid_invariants(spark):
    """The confusion matrix partitions the corpus exactly; the trained
    classifier beats chance overall (diagonal mass > 1/|L|); labels
    stay within the language roster."""
    out = QUERIES["tx16_trigram_nb_langid"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert sum(r["n_docs"] for r in out) == n_docs
    diag = sum(r["n_docs"] for r in out if r["lang_true"] == r["lang_pred"])
    assert diag > n_docs / len(langs)  # better than chance
    for r in out:
        assert r["lang_true"] in langs and r["lang_pred"] in langs


@needs_testdata
@pytest.mark.integration
def test_ts01_forecast_error_invariants(spark):
    """Every event type reports; both error legs scored a meaningful
    share of the series; MAEs are non-negative and the ratio is
    consistent with its legs."""
    out = QUERIES["ts01_seasonal_naive_error"](
        spark, SF
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_naive"] >= r["n_seasonal"] > 0
        assert r["mae_seasonal24"] >= 0 and r["mae_naive1"] >= 0
        if r["mase24"] is not None:
            expect = r["mae_seasonal24"] / r["mae_naive1"]
            assert abs(r["mase24"] - expect) < 1e-3


@needs_testdata
@pytest.mark.integration
def test_cur02_funnel_invariants(spark):
    """Monotone funnel per label (each stage only removes); stage-1
    removes exactly 3 per label (the es08 top-3 screen); totals
    partition the corpus; at least one near-dup was dropped overall
    (the corpus HAS >=0.35 pairs)."""
    out = QUERIES["cur02_embedding_curation_funnel"](
        spark, SF
    ).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert sum(r["n_vectors"] for r in out) == emb.count()
    for r in out:
        assert r["n_vectors"] - r["n_after_outlier"] == 3
        assert r["n_after_dedup"] <= r["n_after_outlier"]
    assert sum(r["n_after_outlier"] - r["n_after_dedup"] for r in out) > 0


@needs_testdata
@pytest.mark.integration
def test_dd14_rolling_hash_invariants(spark):
    """Signatures are within the modulus; collisions are consistent
    (n_docs - n_signatures); at least one collision corpus-wide (the
    near-dup corpus shares 32-char runs); every long-enough doc is
    fingerprinted."""
    from pyspark.sql import functions as F

    out = QUERIES["dd14_rolling_hash_signature"](
        spark, SF
    ).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_long = docs.filter(
        F.length(
            F.regexp_replace(F.lower("text"), "[^a-z0-9]+", "")
        ) >= 32
    ).count()
    assert sum(r["n_docs_fingerprinted"] for r in out) == n_long
    assert sum(r["n_collisions"] for r in out) > 0
    for r in out:
        assert r["n_collisions"] == r["n_docs_fingerprinted"] - r["n_signatures"]
        assert 0 <= r["min_signature"] < 2147483647


@needs_testdata
@pytest.mark.integration
def test_bm01_bm25_invariants(spark):
    """Top-15 scores are positive, descending, and every row matched
    between 1 and 4 query terms; doc_id breaks ties ascending."""
    out = QUERIES["bm01_bm25_retrieval"](spark, SF).collect()
    assert len(out) == 15
    scores = [r["bm25_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    for r in out:
        assert 1 <= r["n_terms_matched"] <= 4


@needs_testdata
@pytest.mark.integration
def test_dd15_dup_gram_invariants(spark):
    """Duplicated grams are a subset of all grams; the corpus has
    cross-doc duplication (the near-dup docs guarantee it); fraction
    is consistent with the counts."""
    out = QUERIES["dd15_duplicated_gram_fraction"](
        spark, SF
    ).collect()
    assert len(out) > 0
    assert sum(r["n_duplicated"] for r in out) > 0
    for r in out:
        assert 0 <= r["n_duplicated"] <= r["n_grams"]
        assert abs(
            r["dup_fraction"] - round(r["n_duplicated"] / r["n_grams"], 6)
        ) < 1e-9


@needs_testdata
@pytest.mark.integration
def test_tc01_triangle_invariants(spark):
    """Euler-consistent census: every triangle needs 3 wedges; node
    and edge counts bound each other; transitivity in (0, 1]."""
    out = QUERIES["tc01_neardup_triangles"](
        spark, SF
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_triangles"] > 0
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    assert r["n_nodes"] <= 2 * r["n_edges"]
    assert 0 < r["transitivity"] <= 1.0


@needs_testdata
@pytest.mark.integration
def test_pa03_t_closeness_invariants(spark):
    """Total variation distance lies in [0, 1]; output is the sorted
    top-20; class sizes are positive."""
    out = QUERIES["pa03_t_closeness_audit"](
        spark, SF
    ).collect()
    assert 0 < len(out) <= 20
    ts = [r["t_closeness"] for r in out]
    assert ts == sorted(ts, reverse=True)
    for r in out:
        assert 0.0 <= r["t_closeness"] <= 1.0
        assert r["class_size"] >= 1


@needs_testdata
@pytest.mark.integration
def test_ts02_cusum_invariants(spark):
    """CUSUM is non-negative by construction; alarms imply the max
    exceeded the threshold; target/slack are consistent integers."""
    out = QUERIES["ts02_cusum_level_shift"](
        spark, SF
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["max_cusum_cents"] >= 0
        assert r["slack_cents"] == r["target_cents"] // 20
        if r["n_alarm_hours"] > 0:
            assert r["max_cusum_cents"] > 8 * r["slack_cents"]
            assert r["first_alarm_hour"] is not None
        else:
            assert r["first_alarm_hour"] is None


@needs_testdata
@pytest.mark.integration
def test_sync01_checksum_diff_invariants(spark):
    """Fault injection is detected: every bucket holding a deleted or
    corrupted key mismatches, every untouched bucket matches, and the
    row-count delta equals the number of deleted keys."""
    out = QUERIES["sync01_bucket_checksum_diff"](
        spark, SF
    ).collect()
    assert len(out) > 0
    n_del = sum(r["rows_primary"] - r["rows_replica"] for r in out)
    assert n_del > 0
    mismatched = [r for r in out if not r["checksum_match"]]
    assert mismatched, "fault injection must flag at least one bucket"
    for r in out:
        assert r["rows_primary"] >= r["rows_replica"]
        if r["rows_primary"] != r["rows_replica"]:
            assert not r["checksum_match"]


@needs_testdata
@pytest.mark.integration
def test_fs01_fellegi_sunter_invariants(spark):
    """Scores are descending; full-agreement pairs outrank any pair
    with a disagreement (weights are monotone); agreement flags are
    booleans on every row."""
    out = QUERIES["fs01_fellegi_sunter_scores"](
        spark, SF
    ).collect()
    assert len(out) == 25
    scores = [r["fs_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    full = [r for r in out
            if r["agree_brand"] and r["agree_type"] and r["agree_head"]]
    partial = [r for r in out
               if not (r["agree_brand"] and r["agree_type"]
                       and r["agree_head"])]
    if full and partial:
        assert min(r["fs_score"] for r in full) >= max(
            r["fs_score"] for r in partial
        )


@needs_testdata
@pytest.mark.integration
def test_dp01_contribution_invariants(spark):
    """Mean <= max; clipping keeps a positive fraction <= 1; clipped
    users exist iff some contribution exceeds the bound."""
    out = QUERIES["dp01_contribution_bounding"](
        spark, SF
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["mean_contrib_cents"] <= r["max_contrib_cents"]
        assert r["clip_bound_cents"] == 2 * r["mean_contrib_cents"]
        assert 0 < r["kept_mass_fraction"] <= 1.0
        if r["max_contrib_cents"] > r["clip_bound_cents"]:
            assert r["n_users_clipped"] >= 1
            assert r["kept_mass_fraction"] < 1.0


@needs_testdata
@pytest.mark.integration
def test_fd01_g3_invariants(spark):
    """Key-based FDs hold with g3 = 0; g3 is bounded by rows minus
    groups; pair counts sit between group count and row count."""
    out = {r["fd"]: r for r in QUERIES[
        "fd01_functional_dependencies"](spark, SF).collect()}
    assert len(out) == 5
    key_fd = out["orders.o_orderkey -> o_orderstatus"]
    assert key_fd["holds"] and key_fd["g3_violations"] == 0
    for r in out.values():
        assert r["n_lhs_groups"] <= r["n_lhs_rhs_pairs"] <= r["n_rows"]
        assert 0 <= r["g3_violations"] <= r["n_rows"] - r["n_lhs_groups"]
        assert r["holds"] == (r["g3_violations"] == 0)


@needs_testdata
@pytest.mark.integration
def test_rk01_rank_agreement_invariants(spark):
    """Tau algebra: C + D = k(k-1)/2 on tie-free rankings; tau in
    [-1, 1]; the two legs are positively correlated on this corpus
    (tf dominates BM25 for a fixed short query)."""
    out = QUERIES["rk01_rank_agreement"](spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pairs"] == r["k"] * (r["k"] - 1) // 2
    assert r["n_concordant"] + r["n_discordant"] == r["n_pairs"]
    assert -1.0 <= r["kendall_tau"] <= 1.0
    assert r["kendall_tau"] > 0


@needs_testdata
@pytest.mark.integration
def test_tx17_continuation_invariants(spark):
    """Top continuation count never exceeds its context total; the
    conditional probability is consistent; contexts arrive in
    traffic order."""
    out = QUERIES["tx17_bigram_continuations"](
        spark, SF
    ).collect()
    assert len(out) == 20
    counts = [r["ctx_count"] for r in out]
    assert counts == sorted(counts, reverse=True)
    for r in out:
        assert 1 <= r["top_count"] <= r["ctx_count"]
        assert r["n_continuations"] >= 1
        assert abs(
            r["top_prob"] - round(r["top_count"] / r["ctx_count"], 6)
        ) < 1e-9


@needs_testdata
@pytest.mark.integration
def test_imb01_imbalance_invariants(spark):
    """ESS lies in [1, n_langs]; the dominant share is at least the
    uniform share and consistent with ESS extremes."""
    out = QUERIES["imb01_label_imbalance"](
        spark, SF
    ).collect()
    assert len(out) > 0
    for r in out:
        assert 1.0 <= r["effective_labels"] <= r["n_langs"] + 1e-9
        assert r["dominant_share"] >= 1.0 / r["n_langs"] - 1e-9
        assert r["dominant_lang"] is not None
