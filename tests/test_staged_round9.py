"""Round-9 staged surface invariants: operators implemented during
round 8 and registered into ``ROUND7_STAGED_QUERIES`` AFTER the
round-8 promotion block, awaiting the round-9 certification window.

Oracle certification at sf0.001 AND sf0.01 rides the shared
parametrized harness in tests/test_staged_round7.py (which sweeps the
staged dict); this file pins the semantic invariants the hash compare
alone can't express."""

from __future__ import annotations

import os

import pytest

from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
    EXTENSION_QUERIES,
    ROUND7_STAGED_QUERIES,
)

# Promoted queries move to EXTENSION_QUERIES at round boundaries; the
# ones still staged stay in ROUND7_STAGED_QUERIES — look up in either.
QUERIES = {**EXTENSION_QUERIES, **ROUND7_STAGED_QUERIES}

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


@needs_testdata
@pytest.mark.integration
def test_mk01_markov_invariants(spark):
    """Per-from_type probabilities sum to 1 (within rounding of the
    bounded row count); transition count equals total events minus the
    number of users with at least one event (each user with n events
    contributes exactly n-1 transitions)."""
    from local_etl_csv_to_postgresql_spark.plans.analytics import load
    from pyspark.sql import functions as F

    rows = QUERIES["mk01_event_markov_transitions"](spark, SF).collect()
    assert rows
    by_from: dict = {}
    for r in rows:
        assert r["n_trans"] >= 1
        assert 0.0 < r["prob"] <= 1.0
        by_from.setdefault(r["from_type"], []).append(r["prob"])
    for ft, probs in by_from.items():
        assert abs(sum(probs) - 1.0) <= 1e-6 * len(probs) + 1e-9, ft
    ev = load(spark, SF, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_trans"] for r in rows) == n_events - n_users


@needs_testdata
@pytest.mark.integration
def test_mk01_transitions_match_pure_python(spark):
    """Recompute the full transition table in pure Python on the tiny
    slice — catches a wrong window ordering (ts ties broken by
    event_id) that a same-shaped oracle would reproduce."""
    from local_etl_csv_to_postgresql_spark.plans.analytics import load

    rows = QUERIES["mk01_event_markov_transitions"](spark, SF).collect()
    ev = load(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    seqs: dict = {}
    for e in ev:
        seqs.setdefault(e["user_id"], []).append(
            (e["ts"], e["event_id"], e["event_type"])
        )
    ref: dict = {}
    for s in seqs.values():
        s.sort()
        for a, b in zip(s, s[1:]):
            ref[(a[2], b[2])] = ref.get((a[2], b[2]), 0) + 1
    got = {(r["from_type"], r["to_type"]): r["n_trans"] for r in rows}
    assert got == ref


@needs_testdata
@pytest.mark.integration
def test_kl01_kl_invariants(spark):
    """KL is non-negative (Gibbs' inequality) for every source;
    vocab_size never exceeds n_tokens; per-source token totals
    partition the corpus token count."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        _docs_words,
    )
    from pyspark.sql import functions as F

    rows = QUERIES["kl01_source_unigram_kl"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["kl_bits"] >= 0.0, r["source"]
        assert 1 <= r["vocab_size"] <= r["n_tokens"]
    corpus_tokens = (
        _docs_words(spark, SF)
        .select(F.explode("__words").alias("t"))
        .count()
    )
    assert sum(r["n_tokens"] for r in rows) == corpus_tokens


@needs_testdata
@pytest.mark.integration
def test_kl01_zero_for_identical_distribution(spark):
    """A single-source corpus has P_s == Q, so KL must be exactly 0 —
    pins the sign/ratio orientation (a p/q ↔ q/p transposition still
    yields non-negative values on real data, but not zero here)."""
    import pandas as pd

    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        kl01_source_unigram_kl,
    )

    docs = QUERIES  # noqa: F841 (lookup table unused here)
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["alpha beta gamma", "beta gamma", "alpha alpha"],
            "lang": ["en"] * 3,
            "source": ["only"] * 3,
            "n_chars": [16, 10, 11],
        }
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(pdf).write.parquet(f"{tmp}/documents.parquet")
        out = kl01_source_unigram_kl(spark, tmp).collect()
    assert len(out) == 1
    assert out[0]["kl_bits"] == 0.0


@needs_testdata
@pytest.mark.integration
def test_nv01_novelty_invariants_and_python_ref(spark):
    """novelty_pct in [0, 100] and n_novel <= n_val_grams; recompute
    the distinct-5-gram anti-join in pure Python on the tiny slice."""
    from local_etl_csv_to_postgresql_spark.plans.analytics import load

    rows = QUERIES["nv01_ngram_novelty"](spark, SF).collect()
    assert rows
    import re

    docs = load(spark, SF, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    train: dict = {}
    val: dict = {}
    for d in docs:
        words = re.findall(r"[a-z0-9]+", (d["text"] or "").lower())
        grams = {
            " ".join(words[i : i + 5]) for i in range(len(words) - 4)
        }
        tgt = train if d["doc_id"] % 2 == 0 else val
        tgt.setdefault(d["lang"], set()).update(grams)
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_val_grams"]
        assert 0.0 <= r["novelty_pct"] <= 100.0
        v = val.get(r["lang"], set())
        t = train.get(r["lang"], set())
        assert r["n_val_grams"] == len(v)
        assert r["n_novel"] == len(v - t)
