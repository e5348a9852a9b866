"""Round-5 additions: deterministic Lloyd's k-means (es06's new
oracle-certifiable trainer), the corpus-growth manifest (inc02), the
TPC-H-Q20-shape dominance chain (q40), and the cur01 scale-defect fix
(no forced broadcast on the data-dependent dup-drop set)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import local_etl_csv_to_postgresql_spark.functions.similarity as sim
from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
    cur01_curation_funnel,
    inc02_corpus_growth_manifest,
)

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_lloyd_centroids_refine_and_handle_empty_clusters(spark):
    """Lloyd's loop on clean cluster structure: after 2 iterations the
    centroids must land on the true cluster means (to the 6 dp the
    update rounds to), and a centroid that captures no members must
    keep its previous position instead of going NULL."""
    import random

    rnd = random.Random(3)
    vecs = []
    for i in range(60):
        center = [10.0 if (i % 3) == d else 0.0 for d in range(6)]
        vecs.append((i, [c + rnd.uniform(-0.2, 0.2) for c in center]))
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    # 6 seed centroids over 3 true clusters -> some seeds go empty
    cents = sim.lloyd_centroids(emb, n_centroids=6, n_iter=2).collect()
    assert len(cents) == 6
    assert all(r["__cvec"] is not None for r in cents)
    # every surviving centroid with members sits near a true center:
    # its argmax dim holds ~10, the rest ~0
    for r in cents:
        v = r["__cvec"]
        assert max(v) > 9.0
        assert sorted(v)[-2] < 1.0


def test_lloyd_ivf_topk_deterministic_and_plausible(spark):
    """Same contract the Spark ML variant is pinned to
    (test_ivf_kmeans_ann_deterministic_and_plausible), now for the
    oracle-certifiable trainer: reproducible, and the query's cell
    contains its true neighbors."""
    import random

    rnd = random.Random(11)
    vecs = []
    for i in range(60):
        center = [10.0 if (i % 3) == d else 0.0 for d in range(8)]
        vecs.append((i, [c + rnd.uniform(-0.5, 0.5) for c in center]))
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    run = lambda: [  # noqa: E731
        (r["vec_id"], r["cosine_sim"])
        for r in sim.lloyd_ivf_topk(
            emb, query_vec_id=0, k=5, n_centroids=6, n_iter=2
        ).collect()
    ]
    a, b = run(), run()
    assert a == b
    assert len(a) == 5
    assert all(vid % 3 == 0 for vid, _ in a)
    assert all(s > 0.99 for _, s in a)


def test_inc02_collision_semantics(spark, tmp_path):
    """The driver corpus is dup-free at the fingerprint, so the hash
    row certifies the zero path; pin the collision paths on constructed
    batches: batch 0 seeds, batch 1 carries one prior-corpus dup (same
    text modulo case/punct jitter), batch 2 carries an in-batch dup
    pair plus one prior dup."""
    rows = [
        (0, "src0", "alpha beta gamma"),
        (1, "src0", "delta epsilon"),
        (2, "src1", "Alpha, beta GAMMA!"),  # prior dup of doc 0
        (3, "src1", "zeta eta"),
        (4, "src2", "theta iota"),
        (5, "src2", "theta;iota"),  # in-batch dup of doc 4
        (6, "src2", "delta epsilon"),  # prior dup of doc 1
    ]
    spark.createDataFrame(rows, ["doc_id", "source", "text"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["batch"]: r
        for r in inc02_corpus_growth_manifest(spark, str(tmp_path)).collect()
    }
    assert (out[0]["n_docs"], out[0]["n_new"], out[0]["corpus_size"]) == (2, 2, 2)
    assert (out[1]["n_prior_dups"], out[1]["n_new"]) == (1, 1)
    assert out[1]["corpus_size"] == 3
    assert (
        out[2]["n_docs"],
        out[2]["n_prior_dups"],
        out[2]["n_inbatch_dups"],
        out[2]["n_new"],
    ) == (3, 1, 1, 1)
    assert out[2]["corpus_size"] == 4


@needs_testdata
def test_inc02_windows_share_one_fingerprint_exchange(spark):
    """Both classification windows (min-batch and first-occurrence
    row_number) must ride ONE fingerprint shuffle; the only allowed
    SinglePartition exchange is the documented metadata-scale running
    total over per-batch rollup rows."""
    plan = inc02_corpus_growth_manifest(
        spark, SF
    )._jdf.queryExecution().executedPlan().toString()
    fp_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning(__fp" in l
    ]
    assert len(fp_exchanges) == 1, plan


@needs_testdata
def test_cur01_no_forced_broadcast_on_dup_drop(spark):
    """Round-4 verdict defect #1: the near-dup drop set is
    data-dependent (10-30% of a real crawl), so its join must carry NO
    broadcast hint — AQE chooses from measured size. The analyzed plan
    holds exactly the two bounded-side hints (the contamination-set
    joins); a third means someone re-forced the dup_drop broadcast."""
    analyzed = cur01_curation_funnel(
        spark, SF
    )._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint (strategy=broadcast)") == 2, analyzed


def _ref_lloyd(vecs: dict, k: int, iters: int):
    """Sequential NumPy/Decimal reference of similarity.lloyd_centroids'
    contract: lowest-id init, argmax-cosine assignment with lowest-cid
    tie-break, per-dim means as exact DECIMAL(25,12) sums divided in
    double and rounded 6 dp HALF_UP (Spark's F.round rule), empty
    clusters keep position."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    def q12(x: float) -> Decimal:
        return Decimal(repr(float(x))).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )

    def r6(x: float) -> float:
        return float(
            Decimal(repr(float(x))).quantize(
                Decimal("1e-6"), rounding=ROUND_HALF_UP
            )
        )

    ids = sorted(vecs)
    cents = {i: list(map(float, vecs[i])) for i in ids[:k]}
    for _ in range(iters):
        members: dict = {c: [] for c in cents}
        for i in ids:
            v = np.asarray(vecs[i], dtype=np.float64)
            best, best_sim = None, None
            for cid in sorted(cents):
                c = np.asarray(cents[cid], dtype=np.float64)
                denom = float(np.sqrt((v * v).sum()) * np.sqrt((c * c).sum()))
                sim = float((v * c).sum()) / denom if denom else None
                if sim is not None and (best_sim is None or sim > best_sim):
                    best, best_sim = cid, sim
            if best is None:
                best = sorted(cents)[0]
            members[best].append(i)
        for cid, mids in members.items():
            if not mids:
                continue
            dims = len(vecs[mids[0]])
            cents[cid] = [
                r6(
                    float(
                        sum(q12(vecs[m][d]) for m in mids)
                    )
                    / len(mids)
                )
                for d in range(dims)
            ]
    return cents


def test_lloyd_matches_sequential_reference(spark):
    """Independent correctness pin beyond the DuckDB oracle: the
    distributed Lloyd kernel must equal a sequential NumPy/Decimal
    reference bit-for-bit on the 6 dp centroid grid."""
    import random

    rnd = random.Random(17)
    vecs = {
        i: [round(rnd.uniform(-1, 1), 3) for _ in range(5)]
        for i in range(40)
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    got = {
        int(r["__cid"]): [round(x, 6) for x in r["__cvec"]]
        for r in sim.lloyd_centroids(emb, n_centroids=4, n_iter=2).collect()
    }
    want = {
        cid: [round(x, 6) for x in c]
        for cid, c in _ref_lloyd(vecs, 4, 2).items()
    }
    assert got == want


def test_prefix_filter_equals_naive_on_borderline_pairs(spark, tmp_path):
    """dd11's prefix filter vs a naive all-pairs Jaccard on constructed
    docs that straddle t=0.8: an exact duplicate, a just-above pair,
    a just-below pair, and unrelated docs — the filter must return
    EXACTLY the naive ≥ t set."""
    from pyspark.sql import functions as F

    import local_etl_csv_to_postgresql_spark.functions.dedup as dd
    from local_etl_csv_to_postgresql_spark.functions import entrypoints as ep

    base = "w%d"  # distinct words
    mk = lambda idxs: " ".join(base % i for i in idxs)  # noqa: E731
    rows = [
        # docs 0/1: identical 12-word text -> 10 shingles, J = 1.0
        (0, "src0", mk(range(12))),
        (1, "src0", mk(range(12))),
        # docs 2/3: 21 vs 22 words sharing a 21-word prefix:
        # 19 vs 20 shingles, overlap 19, J = 19/20 = 0.95 >= 0.8
        (2, "src0", mk(range(21))),
        (3, "src0", mk(list(range(21)) + [99])),
        # docs 4/5: share 10 of 13 leading words -> J below 0.8
        (4, "src0", mk(range(13))),
        (5, "src0", mk(list(range(10)) + [50, 51, 52])),
        (6, "src0", mk(range(100, 112))),  # unrelated
    ]
    spark.createDataFrame(rows, ["doc_id", "source", "text"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    ep.reset_shared_intermediates()
    try:
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ep.dd11_prefix_filter_pairs(
                spark, str(tmp_path)
            ).collect()
        }
    finally:
        ep.reset_shared_intermediates()
    docs = ep._docs_words(spark, str(tmp_path)).select(
        "doc_id", dd.shingles(F.col("__words")).alias("s")
    )
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    naive = {
        (r["id_a"], r["id_b"]): r["j"]
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", dd.jaccard(F.col("sa"), F.col("sb")).alias("j")
        )
        .filter(F.col("j") >= 0.8)
        .collect()
    }
    assert got == naive
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (2, 3) in got and got[(2, 3)] == 0.95
    assert (4, 5) not in got


def test_expectations_violation_semantics(spark):
    """dq01's kernel on dirty constructed rows: NULL predicate results
    count as violations, uniqueness rides the same scan, pass_rate is
    exact-integer-derived."""
    from pyspark.sql import functions as F

    from local_etl_csv_to_postgresql_spark.operators.expectations import (
        Expectation,
        evaluate,
    )

    rows = [
        (1, 10.0, "view"),
        (1, -5.0, "view"),      # dup id + value violation
        (None, 20.0, "click"),  # null id
        (3, None, "bogus"),     # NULL value -> violation; bad type
    ]
    df = spark.createDataFrame(rows, ["event_id", "value", "event_type"])
    out = {
        r["rule"]: (r["violations"], r["passed"], r["pass_rate"])
        for r in evaluate(
            df,
            [
                Expectation("id_not_null", F.col("event_id").isNull()),
                Expectation(
                    "value_nonneg", (F.col("value") < 0)
                ),
                Expectation(
                    "type_ok", ~F.col("event_type").isin(["view", "click"])
                ),
            ],
            unique_cols=("event_id",),
        ).collect()
    }
    assert out["id_not_null"] == (1, False, 0.75)
    # -5 violates; NULL value coalesces to violation
    assert out["value_nonneg"] == (2, False, 0.5)
    assert out["type_ok"] == (1, False, 0.75)
    # count('event_id')=3 non-null, 2 distinct -> 1 duplicate
    assert out["event_id_unique"] == (1, False, 0.75)
    # names interpolate into the generated stack() SQL, so
    # non-identifiers and empty rule sets must be rejected up front
    with pytest.raises(ValueError):
        evaluate(df, [Expectation("has nulls", F.col("value").isNull())])
    with pytest.raises(ValueError):
        evaluate(df, [Expectation("x'); drop", F.col("value").isNull())])
    with pytest.raises(ValueError):
        evaluate(df, [])


def test_expectations_empty_batch_fails_closed(spark):
    """r5 advice: a 0-row batch used to report pass_rate NULL (0/0)
    with passed=True for every rule, so an upstream outage sailed
    through the gate green. Empty input now FAILS every rule, with
    pass_rate NULL marking 'no evidence'."""
    from pyspark.sql import functions as F

    from local_etl_csv_to_postgresql_spark.operators.expectations import (
        Expectation,
        evaluate,
    )

    df = spark.createDataFrame([], "event_id long, value double")
    out = {
        r["rule"]: (r["violations"], r["passed"], r["pass_rate"])
        for r in evaluate(
            df,
            [Expectation("value_nonneg", F.col("value") < 0)],
            unique_cols=("event_id",),
        ).collect()
    }
    assert out["value_nonneg"] == (0, False, None)
    assert out["event_id_unique"] == (0, False, None)


@needs_testdata
def test_q40_dominance_threshold_is_exact(spark):
    """Every returned supplier must genuinely dominate some PROMO part
    (recompute the threshold independently), and the nation panel must
    hold — the semi-join chain cannot widen the result."""
    from local_etl_csv_to_postgresql_spark.plans.analytics import (
        load,
        q40_dominant_part_suppliers,
    )

    out = q40_dominant_part_suppliers(spark, SF).collect()
    suppliers = {r["suppkey"] for r in out}
    li = (
        load(spark, SF, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(
            load(spark, SF, "part").filter(F.col("p_type") == "PROMO"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
    )
    tot = li.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    dominant = {
        r["l_suppkey"]
        for r in li.join(tot, "l_partkey")
        .filter(2 * F.col("sq") > F.col("tq"))
        .collect()
    }
    nat = {
        r["n_nationkey"]
        for r in load(spark, SF, "nation")
        .filter(F.col("n_name").isin([f"NATION_{i}" for i in range(5)]))
        .collect()
    }
    panel = {
        r["s_suppkey"]
        for r in load(spark, SF, "supplier")
        .filter(F.col("s_nationkey").isin(list(nat)))
        .collect()
    }
    assert suppliers == dominant & panel
    assert suppliers, "sf0.001 must produce at least one dominant supplier"
