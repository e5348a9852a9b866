"""Semantic edge-case tests for the round-4 additions: adversarial
title-casing (std02), URL rule filtering (uf01), PPS systematic
sampling (ss02), the packing export sink round-trip (pk02), SCD2 merge
invariants (scd01), gap-fill completeness (win01), and the rank-decade
profile (zipf01)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as ep

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_std02_matches_python_str_title(spark):
    """Each std02 row's standardized value must equal Python's own
    trim+collapse+str.title() — the reference semantics
    (src/transform.py:66-87) pinned on the adversarial charset."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        _TITLE_CASES,
        std02_title_adversarial,
    )

    got = {
        r["case_id"]: r["standardized"]
        for r in std02_title_adversarial(spark, SF).collect()
    }
    for case_id, raw in _TITLE_CASES:
        if raw is None:
            assert got[case_id] is None
        else:
            assert got[case_id] == " ".join(raw.split()).title(), raw


@needs_testdata
def test_uf01_rule_counts_partition_docs(spark):
    """First-match-wins classes are disjoint: blocked counts + kept
    must sum to n_docs in every source."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        uf01_url_filter,
    )

    for r in uf01_url_filter(spark, SF).collect():
        assert (
            r["n_blocked_tld"]
            + r["n_blocked_subdomain"]
            + r["n_blocked_path"]
            + r["n_kept"]
            == r["n_docs"]
        )


@needs_testdata
def test_ss02_selects_exactly_k_per_language(spark):
    """PPS systematic sampling crosses each of the K boundaries exactly
    once, so every language with positive token mass samples exactly
    PPS_K docs (no doc in this corpus spans multiple boundaries)."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        PPS_K,
        ss02_pps_sample,
    )

    from local_etl_csv_to_postgresql_spark.functions import text as tx
    from local_etl_csv_to_postgresql_spark.plans.analytics import load

    rows = ss02_pps_sample(spark, SF).collect()
    assert rows
    # a doc spanning multiple boundaries (tok*K >= tot) collapses them
    # into one selection; exactly-K holds when no doc does
    max_tok = {
        r["lang"]: r["m"]
        for r in load(spark, SF, "documents")
        .select("lang", tx.token_count("text").alias("t"))
        .groupBy("lang")
        .agg(F.max("t").alias("m"))
        .collect()
    }
    for r in rows:
        assert 1 <= r["n_sampled"] <= PPS_K
        if max_tok[r["lang"]] * PPS_K < r["total_tokens"]:
            assert r["n_sampled"] == PPS_K


@needs_testdata
def test_pk02_export_roundtrip_preserves_totals(spark):
    """The written artifact must carry every doc exactly once: shard
    accounting sums equal the source corpus totals."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        pk02_packing_export,
    )
    from local_etl_csv_to_postgresql_spark.functions import text as tx
    from local_etl_csv_to_postgresql_spark.plans.analytics import load

    acc = pk02_packing_export(spark, SF)
    got = acc.agg(
        F.sum("n_docs").alias("d"), F.sum("total_tokens").alias("t")
    ).first()
    docs = load(spark, SF, "documents")
    want = docs.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum(tx.token_count("text")).alias("t"),
    ).first()
    assert got["d"] == want["d"]
    assert got["t"] == want["t"]


@needs_testdata
def test_scd01_version_invariants(spark):
    """SCD2: every supplier has exactly one OPEN row; closed rows exist
    only for changed keys (1/7 of suppliers, minus zero-balance
    no-ops)."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        scd01_scd2_merge,
    )
    from local_etl_csv_to_postgresql_spark.plans.analytics import load

    out = scd01_scd2_merge(spark, SF)
    tot = out.agg(
        F.sum("n_current").alias("cur"), F.sum("n_closed").alias("cls")
    ).first()
    sup = load(spark, SF, "supplier")
    n_sup = sup.count()
    n_changed = sup.filter(
        (F.col("s_suppkey") % 7 == 0) & (F.col("s_acctbal") != 0)
    ).count()
    assert tot["cur"] == n_sup  # one open version per key
    assert tot["cls"] == n_changed  # one closed version per changed key


@needs_testdata
def test_win01_grid_is_dense(spark):
    """Gap-fill contract: exactly (hours in span) x (types) rows, and
    the zero-filled rows carry 0 counts, not NULLs."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        win01_gapfill_rollup,
    )
    from local_etl_csv_to_postgresql_spark.plans.analytics import load

    out = win01_gapfill_rollup(spark, SF)
    ev = load(spark, SF, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    )
    b = ev.agg(F.min("h").alias("mn"), F.max("h").alias("mx")).first()
    hours = int((b["mx"] - b["mn"]).total_seconds() // 3600) + 1
    n_types = ev.select("event_type").distinct().count()
    rows = out.collect()
    assert len(rows) == hours * n_types
    assert all(r["n_events"] is not None and r["total_value"] is not None
               for r in rows)
    assert any(r["n_events"] == 0 for r in rows)  # sf0.001 has gaps


@needs_testdata
def test_zipf01_mass_sums_to_one(spark):
    """Per language the decade masses must partition the token mass:
    pct_mass sums to 1 (±rounding) and total_freq sums to the exact
    token count."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        zipf01_rank_decades,
        _docs_words,
    )

    out = zipf01_rank_decades(spark, SF)
    per_lang = (
        out.groupBy("lang")
        .agg(F.sum("pct_mass").alias("p"), F.sum("total_freq").alias("f"))
        .collect()
    )
    toks = (
        _docs_words(spark, SF)
        .select("lang", F.explode("__words").alias("w"))
        .groupBy("lang")
        .count()
        .collect()
    )
    want = {r["lang"]: r["count"] for r in toks}
    for r in per_lang:
        assert abs(r["p"] - 1.0) < 1e-3
        assert r["f"] == want[r["lang"]]


@needs_testdata
def test_st08_really_drops_late_rows(spark):
    """st08 must exercise the REAL late filter: the replay's
    numRowsDroppedByWatermark accounting is positive (old stragglers
    whose window closed against the on-time watermark), and the
    emitted mass is smaller than the input."""
    from local_etl_csv_to_postgresql_spark.streaming import stateful as stf
    from local_etl_csv_to_postgresql_spark.streaming.queries import (
        st08_late_data_drop,
    )
    from local_etl_csv_to_postgresql_spark.plans.analytics import load
    from pyspark.sql import functions as F

    out = st08_late_data_drop(spark, SF)
    emitted = out.agg(F.sum("n_events_emitted")).first()[0]
    assert stf.LAST_LATE_DROPPED > 0
    n_input = load(spark, SF, "events").count()
    assert emitted < n_input
    assert emitted + stf.LAST_LATE_DROPPED <= n_input


@needs_testdata
def test_hq01_bins_bracket_exact_percentiles(spark):
    """Histogram quantiles are monotone and within one bin width of the
    exact percentile (the bounded-error contract)."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        hq01_histogram_quantiles,
    )
    from local_etl_csv_to_postgresql_spark.plans.analytics import load

    out = {r["event_type"]: r for r in hq01_histogram_quantiles(spark, SF).collect()}
    exact = (
        load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("p50"))
        .collect()
    )
    for r in exact:
        row = out[r["event_type"]]
        assert row["p50_bin"] <= row["p95_bin"] <= row["p99_bin"]
        assert abs(row["p50_bin"] - r["p50"]) <= 1.0  # within bin width


@needs_testdata
def test_wm01_median_mass_property(spark):
    """Docs at or below the reported threshold must carry >= half the
    language's token mass; strictly below it, less than half."""
    from local_etl_csv_to_postgresql_spark.functions import text as tx
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        wm01_token_mass_median,
    )
    from local_etl_csv_to_postgresql_spark.plans.analytics import load

    med = {r["lang"]: r for r in wm01_token_mass_median(spark, SF).collect()}
    docs = load(spark, SF, "documents").select(
        "lang", "n_chars", tx.token_count("text").alias("t")
    )
    for lang, r in med.items():
        at_or_below = (
            docs.filter(
                (F.col("lang") == lang)
                & (F.col("n_chars") <= r["median_mass_chars"])
            )
            .agg(F.sum("t"))
            .first()[0]
        )
        assert 2 * at_or_below >= r["total_tokens"]


@needs_testdata
def test_cur01_funnel_is_monotone(spark):
    """Each stage can only shrink the surviving set."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        cur01_curation_funnel,
    )

    for r in cur01_curation_funnel(spark, SF).collect():
        assert (
            r["n_input"]
            >= r["n_quality"]
            >= r["n_after_dedup"]
            >= r["n_clean"]
            >= 0
        )
