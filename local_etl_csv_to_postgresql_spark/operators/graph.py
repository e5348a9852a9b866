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

    # only edge-touched vertices can ever change label — iterate on that
    # (usually tiny) frame and fold the untouched rest back in as
    # singletons at the end. In a dedup corpus the near-dup subgraph is
    # orders of magnitude smaller than the corpus, so this turns every
    # round's join from corpus-sized to candidate-sized.
    active = und.select(F.col("__s").alias("id")).distinct().persist()
    labels = active.select("id", F.col("id").alias("component")).persist()

    def _finish(active_labels: DataFrame) -> DataFrame:
        allv = vertices.select(F.col(id_col).alias("id"))
        return allv.join(active_labels, "id", "left").select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )

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
            active.unpersist()
            return _finish(labels)
    und.unpersist()
    active.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter exceeds max_iter — raise it or use "
        "star-contraction for long-chain graphs"
    )
