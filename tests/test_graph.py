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
