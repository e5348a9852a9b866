"""Semantic edge-case tests for the round-1 additions: RANGE-frame
moving average, retention, hash sampling, cluster representatives,
label centroids, tf-idf ranking, and the sliding-window rollup."""

from __future__ import annotations

import datetime
import math
import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as ep

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_ma7_range_frame_spans_gap_days(spark):
    """A RANGE frame must look back 7 calendar days, not 7 rows: with a
    gap in the day sequence, the row before the gap falls out of the
    frame."""
    from local_etl_csv_to_postgresql_spark.plans.analytics import dec
    from pyspark.sql import Window

    rows = [
        (datetime.datetime(2024, 1, 1), 10.0),
        (datetime.datetime(2024, 1, 2), 20.0),
        (datetime.datetime(2024, 1, 10), 40.0),  # >6 days after both
    ]
    df = spark.createDataFrame(rows, ["day", "rev"])
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.to_date(F.lit("1990-01-01"))))
        .rangeBetween(-6, 0)
    )
    out = {
        r["day"].day: r["ma"]
        for r in df.select(
            "day",
            (F.sum(dec("rev")).over(w).cast("double")
             / F.count(F.lit(1)).over(w)).alias("ma"),
        ).collect()
    }
    assert out[1] == 10.0
    assert out[2] == 15.0   # days 1-2 in frame
    assert out[10] == 40.0  # days 4-10: only day 10 — ROWS would give 70/3


def test_retention_counts_users_active_on_consecutive_days(spark):
    from local_etl_csv_to_postgresql_spark.plans.analytics import (
        q33_user_retention,
    )

    # build a tiny parquet events table: u1 active d1+d2, u2 only d1
    import tempfile

    tmp = tempfile.mkdtemp(prefix="ret_")
    rows = [
        (1, datetime.datetime(2024, 1, 1, 8), 1, "view", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 9), 2, "view", 1.0, "{}"),
        (3, datetime.datetime(2024, 1, 2, 8), 1, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = {r["day"].day: r for r in q33_user_retention(spark, tmp).collect()}
    assert out[1]["active_users"] == 2
    assert out[1]["retained_users"] == 1
    assert out[1]["retention_pct"] == 50.0
    assert out[2]["retained_users"] == 0  # no day 3


@needs_testdata
def test_hash_sample_is_deterministic_and_close_to_rate(spark):
    q = ep.queries()["ss01_hash_sample"]
    a = q(spark, SF).collect()
    b = q(spark, SF).collect()
    assert a == b
    total = sum(r["n_docs"] for r in a)
    sampled = sum(r["n_sampled"] for r in a)
    assert 0.03 < sampled / total < 0.25  # ~10% without RNG


@needs_testdata
def test_cluster_representatives_pick_longest_then_min_id(spark):
    comp = ep.queries()["dd06_neardup_clusters"](spark, SF)
    reps = {
        r["component"]: r
        for r in ep.queries()["dd07_cluster_representatives"](spark, SF).collect()
    }
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    clusters: dict[int, list[int]] = {}
    for r in comp.collect():
        clusters.setdefault(r["component"], []).append(r["doc_id"])
    multi = {c: ids for c, ids in clusters.items() if len(ids) >= 2}
    assert set(reps) == set(multi)
    for c, ids in multi.items():
        best = sorted(ids, key=lambda i: (-docs[i], i))[0]
        assert reps[c]["rep_doc_id"] == best
        assert reps[c]["cluster_size"] == len(ids)


@needs_testdata
def test_label_centroids_match_numpy_mean(spark):
    import numpy as np

    out = ep.queries()["es05_label_centroids"](spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    for row in out[:50]:
        expect = float(
            np.mean([v[row["dim"]] for v in by_label[row["label"]]])
        )
        assert math.isclose(row["centroid"], expect, abs_tol=1e-5)


@needs_testdata
def test_tfidf_downweights_ubiquitous_words(spark):
    rows = ep.queries()["tx07_tfidf_top_terms"](spark, SF).collect()
    assert rows, "expected top terms"
    for r in rows:
        # a word in every doc has idf=0 and can never outrank one that
        # isn't; every surfaced term must have df < n_docs side computed
        assert r["tfidf"] > 0
        assert 1 <= r["rk"] <= 5
        expect = round(r["tf"] * math.log(_n_docs(spark, r["lang"]) / r["df"]), 6)
        assert math.isclose(r["tfidf"], expect, rel_tol=1e-9)


def _n_docs(spark, lang):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("lang") == lang)
        .count()
    )


@needs_testdata
def test_chunking_covers_every_token_exactly_once(spark):
    from local_etl_csv_to_postgresql_spark.functions import text as tx

    chunks = ep.queries()["tx08_chunk_stats"](spark, SF)
    per_doc = {
        r["doc_id"]: r["total"]
        for r in chunks.groupBy("doc_id")
        .agg(F.sum("chunk_tokens").alias("total"))
        .collect()
    }
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.size(tx.words("text")).alias("n"))
        .collect()
    )
    for r in docs:
        assert per_doc.get(r["doc_id"], 0) == r["n"]
    sizes = [r["chunk_tokens"] for r in chunks.collect()]
    assert all(1 <= s <= 32 for s in sizes)


@needs_testdata
def test_unpivot_is_inverse_of_the_wide_aggregate(spark):
    rows = ep.queries()["q34_priority_metrics_unpivot"](spark, SF).collect()
    by_prio: dict[str, dict[str, float]] = {}
    for r in rows:
        by_prio.setdefault(r["o_orderpriority"], {})[r["metric"]] = r["value"]
    for prio, metrics in by_prio.items():
        assert set(metrics) == {"avg_amount", "total_amount", "transaction_count"}
        assert metrics["transaction_count"] > 0
        assert math.isclose(
            metrics["avg_amount"],
            metrics["total_amount"] / metrics["transaction_count"],
            rel_tol=1e-6,
        )


@needs_testdata
def test_hll_estimate_tracks_exact_count(spark):
    for r in ep.queries()["hll01_distinct_users_sketch"](spark, SF).collect():
        assert abs(r["approx_users"] - r["exact_users"]) <= max(
            3, 0.1 * r["exact_users"]
        )


def test_json_extraction_handles_missing_keys(spark):
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        json01_props_stats,
    )
    import tempfile

    tmp = tempfile.mkdtemp(prefix="json_")
    rows = [
        (1, datetime.datetime(2024, 1, 1), 1, "view", 1.0, '{"k": 5}'),
        (2, datetime.datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
        (3, datetime.datetime(2024, 1, 1), 1, "click", 1.0, '{"k": 7}'),
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = {r["event_type"]: r for r in json01_props_stats(spark, tmp).collect()}
    assert out["view"]["n_events"] == 2
    assert out["view"]["sum_k"] == 5      # missing key -> NULL, not error
    assert out["view"]["avg_k"] == 5.0    # avg over non-null k only
    assert out["click"]["max_k"] == 7


def test_funnel_chains_asof_with_tolerance(spark):
    from local_etl_csv_to_postgresql_spark.plans.analytics import (
        fn01_purchase_funnel,
    )
    import tempfile

    tmp = tempfile.mkdtemp(prefix="funnel_")
    d = datetime.datetime
    rows = [
        # u1: view 09:00 -> click 09:30 -> purchase 10:00  (full chain)
        (1, d(2024, 1, 1, 9, 0), 1, "view", 1.0, "{}"),
        (2, d(2024, 1, 1, 9, 30), 1, "click", 1.0, "{}"),
        (3, d(2024, 1, 1, 10, 0), 1, "purchase", 1.0, "{}"),
        # u2: click 08:00, purchase 10:00 -> click outside 1h (no chain)
        (4, d(2024, 1, 1, 8, 0), 2, "click", 1.0, "{}"),
        (5, d(2024, 1, 1, 10, 0), 2, "purchase", 1.0, "{}"),
        # u3: view 07:00, click 09:50, purchase 10:00 -> click matches
        # but its view is >1h before the click (click only)
        (6, d(2024, 1, 1, 7, 0), 3, "view", 1.0, "{}"),
        (7, d(2024, 1, 1, 9, 50), 3, "click", 1.0, "{}"),
        (8, d(2024, 1, 1, 10, 0), 3, "purchase", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    (row,) = fn01_purchase_funnel(spark, tmp).collect()
    assert row["purchases"] == 3
    assert row["with_prior_click"] == 2  # u1, u3
    assert row["full_chain"] == 1        # u1 only


def test_sliding_rollup_puts_each_event_in_two_windows(spark):
    from local_etl_csv_to_postgresql_spark.streaming.windows import (
        sliding_rollup,
    )

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 15), 1, "view", 1.0),
        (2, datetime.datetime(2024, 1, 1, 0, 45), 1, "view", 1.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = sliding_rollup(df, duration="1 hour", slide="30 minutes",
                         watermark=None).collect()
    assert sum(r["event_count"] for r in out) == 4  # 2 events x 2 windows
    starts = {r["window_start"].strftime("%H:%M") for r in out}
    assert starts == {"23:30", "00:00", "00:30"}
