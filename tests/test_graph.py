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


# --- ktruss semantics -------------------------------------------------------


def _truss(spark, edge_pairs, k):
    from local_etl_csv_to_postgresql_spark.operators.graph import ktruss

    e = spark.createDataFrame(edge_pairs, ["id_a", "id_b"])
    out, rounds = ktruss(spark, e, k)
    return {
        (r["a"], r["b"]): r["support"] for r in out.collect()
    }, rounds


def test_ktruss_triangle_with_pendant(spark):
    # triangle {1,2,3} + pendant edge (3,4): the pendant closes no
    # triangle and peels; each triangle edge keeps support 1
    got, rounds = _truss(spark, [(1, 2), (2, 3), (1, 3), (3, 4)], 3)
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 1}
    assert rounds == 2  # peel the pendant, then confirm the fixpoint


def test_ktruss_chain_and_star_empty(spark):
    # trees have no triangles: every edge peels in round 1 and the
    # empty set confirms in round 2
    got, _ = _truss(spark, [(1, 2), (2, 3), (3, 4)], 3)
    assert got == {}
    got, _ = _truss(spark, [(0, i) for i in range(1, 6)], 3)
    assert got == {}


def test_ktruss_k4_clique_survives_4truss(spark):
    # K4: every edge closes exactly 2 triangles — the whole clique is
    # its own 4-truss (support >= 2), one confirming round
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got, rounds = _truss(spark, k4, 4)
    assert got == {(a, b): 2 for a, b in k4}
    assert rounds == 1


def test_ktruss_cascade_peel(spark):
    # two triangles sharing edge (1,2), plus a third triangle hanging
    # off vertex 3 by a bridge: 4-truss (support >= 2) keeps ONLY the
    # shared edge's... nothing — peeling (1,2)'s neighbors' supports
    # cascades: edges of each triangle have support 1 except the
    # shared (1,2) with 2; k=4 drops the support-1 edges in round 1,
    # which strands (1,2) in round 2 — the cascade the iterative
    # definition exists for (a one-shot support filter would KEEP it)
    edges = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)]
    got, _ = _truss(spark, edges, 4)
    assert got == {}
    # same graph at k=3 survives whole (every edge closes a triangle)
    got3, _ = _truss(spark, edges, 3)
    assert set(got3) == set(edges)
    assert got3[(1, 2)] == 2


def test_ktruss_matches_python_peel_on_seeded_random_graph(spark):
    # G(n, m) with a fixed seed: the Spark fixpoint must equal the
    # reference Python peel edge-for-edge and support-for-support
    import random

    rng = random.Random(7)
    n, m = 24, 60
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    k = 4

    def peel(es):
        cur = set(es)
        while True:
            adj = {}
            for a, b in cur:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            sup = {(a, b): len(adj[a] & adj[b]) for a, b in cur}
            nxt = {e for e, c in sup.items() if c >= k - 2}
            if nxt == cur:
                return sup
            cur = nxt

    want = peel(edges)
    got, _ = _truss(spark, sorted(edges), k)
    assert got == want


def test_ktruss_rejects_k_leq_2(spark):
    """r11 ADVICE item 1 pinned: for k <= 2 the truss is the whole
    graph by definition, but the peeling loop's support rows only
    exist for triangle edges — it would silently return triangle
    edges only. The operator must reject the vacuous k loudly."""
    from local_etl_csv_to_postgresql_spark.operators.graph import ktruss

    e = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    for k in (0, 1, 2):
        with pytest.raises(ValueError, match="k >= 3"):
            ktruss(spark, e, k)
