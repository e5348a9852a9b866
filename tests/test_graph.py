"""connected_components semantics (operators/graph.py): min-label
components, singletons, chain propagation, and the non-convergence
guard."""

from __future__ import annotations

import pytest

from local_etl_csv_to_postgresql_spark.operators.graph import (
    connected_components,
)


def _cc(spark, vertex_ids, edge_pairs, **kw):
    v = spark.createDataFrame([(i,) for i in vertex_ids], ["id"])
    e = spark.createDataFrame(edge_pairs or [(0, 0)], ["src", "dst"])
    if not edge_pairs:
        e = e.limit(0)
    out = connected_components(v, e, **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def test_two_components_and_singleton(spark):
    # {1,2,3} clique-ish, {5,6} pair, 9 isolated
    got = _cc(spark, [1, 2, 3, 5, 6, 9], [(2, 1), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}


def test_chain_propagates_across_diameter(spark):
    # a 6-hop chain: the min label must travel end to end
    chain = [(i, i + 1) for i in range(1, 7)]
    got = _cc(spark, list(range(1, 8)), chain)
    assert set(got.values()) == {1}


def test_no_edges_all_singletons(spark):
    got = _cc(spark, [4, 7], [])
    assert got == {4: 4, 7: 7}


def test_nonconvergence_raises(spark):
    chain = [(i, i + 1) for i in range(1, 7)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, list(range(1, 8)), chain, max_iter=2)


def test_reliable_checkpoint_knob(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_CC_CKPT_DIR switches the per-round lineage
    truncation from localCheckpoint (executor-pinned blocks) to
    reliable checkpoint(dir) — the dynamic-allocation-safe path
    (r6 verdict task 5). Same fixpoint either way."""
    import local_etl_csv_to_postgresql_spark.operators.graph as g

    ckpt = tmp_path / "cc_ckpt"
    monkeypatch.setenv("SPARK_GRAFT_CC_CKPT_DIR", str(ckpt))
    got = _cc(spark, [1, 2, 3, 5, 6, 9], [(2, 1), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}
    # the reliable path actually wrote checkpoint data to the dir
    assert any(ckpt.rglob("*")), "checkpoint dir unused"
    # and the truncator picks localCheckpoint when the knob is unset
    monkeypatch.delenv("SPARK_GRAFT_CC_CKPT_DIR")
    fn = g._lineage_truncator(spark)
    df = spark.range(3)
    assert fn(df).count() == 3


def _cc_star(spark, ids, pairs, **kw):
    from local_etl_csv_to_postgresql_spark.operators.graph import (
        connected_components_star,
    )

    v = spark.createDataFrame([(i,) for i in ids], "id long")
    e = spark.createDataFrame(
        [(a, b) for a, b in pairs] or [(None, None)], "src long, dst long"
    ).dropna()
    out = connected_components_star(v, e)
    return {r["id"]: r["component"] for r in out.collect()}


def test_star_contraction_matches_label_propagation(spark):
    """Same fixpoint as connected_components on every shape: cliques,
    a pair, an isolate, and a long chain (the case star contraction
    exists for — O(log n) alternations, not diameter rounds)."""
    ids = list(range(1, 21))
    pairs = (
        [(2, 1), (2, 3), (5, 6)]
        + [(i, i + 1) for i in range(10, 20)]  # 10..20 chain
    )
    star = _cc_star(spark, ids, pairs)
    label = _cc(spark, ids, pairs)
    assert star == label
    assert star[20] == 10 and star[4] == 4


def test_star_contraction_no_edges(spark):
    assert _cc_star(spark, [3, 9], []) == {3: 3, 9: 9}
