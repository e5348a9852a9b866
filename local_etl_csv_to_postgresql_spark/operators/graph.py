"""Distributed connected components — the clustering step that turns
near-duplicate PAIRS (minhash/simhash/embedding candidates) into
dedup GROUPS, so a pipeline can keep one representative per cluster.

Not in the reference (its dedup stops at keep-first on exact keys,
`/root/reference/src/transform.py` duplicate handling); this is part of
the training-data extension surface, where transitive near-dup closure
is the standard step between LSH candidate generation and document
selection.

Scale design (100 TB): iterative min-label propagation expressed as
DataFrame joins — each round is one join + one aggregate (both shuffle
on the vertex id, so AQE can coalesce and skew-split), and the loop
stops at a fixpoint. Rounds needed = graph diameter; near-dup graphs
are dense little cliques (diameter 2-3), so the loop is short. For
adversarially long chain graphs, swap in the large-star/small-star
alternation (Kiveris et al., "Connected Components in MapReduce and
Beyond", SOCC'14) — same join primitives, O(log n) rounds. The result
at fixpoint (label = min reachable id) is deterministic and
iteration-count-independent, which is what lets DuckDB's recursive-CTE
transitive closure oracle-match it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every vertex with the smallest vertex id reachable from it
    (undirected reachability): ``(id, component)``.

    Vertices absent from ``edges`` come back as their own singleton
    component. Raises if ``max_iter`` rounds don't reach the fixpoint
    (diameter > max_iter) rather than returning a wrong partial answer.
    """
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    und = e.union(e.select(F.col("__d").alias("__s"), F.col("__s").alias("__d")))
    und = und.distinct().persist()

    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).persist()

    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und["__s"] == labels["id"])
            .select(F.col("__d").alias("id"), "component")
        )
        new_labels = (
            labels.select("id", "component")
            .union(nbr_min)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            und.unpersist()
            return labels
    und.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter exceeds max_iter — raise it or use "
        "star-contraction for long-chain graphs"
    )
