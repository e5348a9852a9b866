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
    # localCheckpoint truncates lineage: without it every round's job
    # re-analyzes the full upstream plan (LSH candidate generation is a
    # deep tree), and Catalyst time — not the shuffle — dominates the
    # loop. On a real cluster with dynamic allocation swap this for
    # reliable checkpoint(dir) (localCheckpoint pins blocks to live
    # executors), same as GraphX/GraphFrames' periodic checkpointing.
    und = und.distinct().localCheckpoint()

    # only edge-touched vertices can ever change label — iterate on that
    # (usually tiny) frame and fold the untouched rest back in as
    # singletons at the end. In a dedup corpus the near-dup subgraph is
    # orders of magnitude smaller than the corpus, so this turns every
    # round's join from corpus-sized to candidate-sized.
    labels = (
        und.select(F.col("__s").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint()
    )
    id_type = labels.schema["component"].dataType

    def _finish(active_labels: DataFrame) -> DataFrame:
        allv = vertices.select(F.col(id_col).alias("id"))
        return allv.join(active_labels, "id", "left").select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )

    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und["__s"] == labels["id"])
            .select(
                F.col("__d").alias("id"),
                "component",
                F.lit(None).cast(id_type).alias("__old"),
            )
        )
        # one shuffle per round: the same groupBy computes the new label
        # (min over own + neighbour labels) AND carries the old label
        # through, so the fixpoint check is a filter on the aggregated
        # frame instead of a second join against the previous round.
        agg = (
            labels.select("id", "component", F.col("component").alias("__old"))
            .union(nbr_min)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.min("__old").alias("__old"),
            )
            .localCheckpoint()
        )
        changed = agg.filter(F.col("component") != F.col("__old")).count()
        labels = agg.select("id", "component")
        if changed == 0:
            return _finish(labels)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter exceeds max_iter — raise it or use "
        "star-contraction for long-chain graphs"
    )
