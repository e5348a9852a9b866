"""Distributed EXACT percentile (percentile_cont semantics).

Reference parity: the reference computes an exact median with
``PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY amount)`` run by
PostgreSQL on a single node (sql/queries.sql:64, src/run_queries.py:234).
Spark's built-in exact ``percentile`` aggregate reproduces the value but
concentrates every input value into ONE final aggregation buffer — the
single operator in this engine that cannot scale to 100 TB.

This module implements the classic distributed-selection alternative:

1. range-partition the value column into P ordered buckets
   (``repartitionByRange`` — sampled boundaries, same mechanism as a
   distributed sort's first phase);
2. count each bucket (tiny O(P) metadata collected to the driver, the
   same scale of information AQE already collects per shuffle);
3. turn the global target rank(s) ``h = (n-1)*p`` into (bucket, local
   rank) coordinates using the bucket counts;
4. sort ONLY the bucket(s) holding the target ranks (a per-partition
   window over N/P rows) and pick the two neighboring values;
5. linearly interpolate ``lo + (h - floor(h)) * (hi - lo)``.

No stage ever materializes more than N/P values in one task, so the
operator scales out with partitions — exactness without the
single-reducer funnel. Cost is one extra pass over the (persisted,
single-column) shuffled values.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def exact_percentile_cont(
    df: DataFrame,
    value_col: str,
    p: float,
    out_col: str = "percentile",
    partitions: int | None = None,
) -> DataFrame:
    """1-row DataFrame holding the exact p-quantile (continuous
    interpolation, nulls ignored) of ``df[value_col]`` as a double.

    Eagerly runs the O(P) bucket-count job; the returned frame's final
    collect runs the selection pass. The intermediate single-column
    range shuffle is persisted (memory-and-disk) so the two passes share
    it; it is released before returning.
    """
    [(_, value)] = exact_percentiles_cont(df, value_col, [p], partitions)
    return df.sparkSession.range(1).select(
        F.lit(value).cast("double").alias(out_col)
    )


def exact_percentiles_cont(
    df: DataFrame,
    value_col: str,
    ps: list[float],
    partitions: int | None = None,
) -> list[tuple[float, float]]:
    """Exact percentile_cont for MANY probabilities in one operator
    run: one range shuffle, one O(P) bucket-count job, and ONE
    selection pass that sorts only the union of buckets holding any
    target rank — amortizing the dominant cost across the whole
    probability list (k quantiles cost one pass, not k). Returns
    ``[(p, value), ...]`` in input order; empty input yields None
    values.

    Same semantics per p as :func:`exact_percentile_cont` (continuous
    interpolation, nulls ignored, doubles); that function now shares
    this implementation.
    """
    for p in ps:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile must be in [0, 1], got {p}")
    if not ps:
        # short-circuit before any Spark work: an empty probability
        # list would otherwise pay the range shuffle and bucket-count
        # job only to crash on .filter(None) in the selection pass
        return []
    spark = df.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    vals = (
        df.select(F.col(value_col).cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .repartitionByRange(partitions, F.col("__v"))
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        bucket_counts = sorted(
            (r["__pid"], r["n"])
            for r in vals.groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        n = sum(c for _, c in bucket_counts)
        if n == 0:
            return [(p, None) for p in ps]

        def locate(global_rank: int) -> tuple[int, int]:
            offset = 0
            for pid, cnt in bucket_counts:
                if global_rank < offset + cnt:
                    return pid, global_rank - offset
                offset += cnt
            raise AssertionError("rank beyond total count")

        # every (bucket, local-rank) coordinate any p needs, deduped
        needed: dict[tuple[int, int], None] = {}
        coords = []
        for p in ps:
            h = (n - 1) * p
            lo_rank = math.floor(h)
            hi_rank = min(lo_rank + 1, n - 1)
            lo = locate(lo_rank)
            hi = locate(hi_rank)
            needed[lo] = None
            needed[hi] = None
            coords.append((h, lo_rank, lo, hi))

        pids = sorted({pid for pid, _ in needed})
        w = Window.partitionBy("__pid").orderBy("__v")
        cond = None
        for pid, local in needed:
            c = (F.col("__pid") == pid) & (F.col("__rn") == local)
            cond = c if cond is None else cond | c
        picked = {
            (r["__pid"], r["__rn"]): r["__v"]
            for r in vals.filter(F.col("__pid").isin(pids))
            .withColumn("__rn", F.row_number().over(w) - 1)
            .filter(cond)
            .collect()
        }
        out = []
        for p, (h, lo_rank, lo, hi) in zip(ps, coords):
            lo_v, hi_v = picked[lo], picked[hi]
            out.append((p, lo_v + (h - lo_rank) * (hi_v - lo_v)))
        return out
    finally:
        vals.unpersist()


def exact_discrete_rank_values(
    df: DataFrame,
    value_col: str,
    ranks_for_n,
    partitions: int | None = None,
) -> tuple[int, list[float]]:
    """Exact values at caller-chosen DISCRETE 0-based global ranks of
    ``df[value_col]`` ascending (nulls ignored), selected WITHOUT a
    full global sort: the same range-partition + O(P) bucket-count +
    sort-only-the-target-buckets mechanism as
    :func:`exact_percentiles_cont`, but returning the order statistics
    themselves instead of interpolating — for consumers whose
    determinism contract is "AVG of the two middle values" (the rs02
    discrete-median rule: interpolation's ``lo + f·(hi-lo)`` vs
    ``(lo+hi)/2`` formulations differ in the last ulp across engines,
    exact rank values do not).

    ``ranks_for_n`` maps the (exact) total count n to the list of
    0-based ranks wanted — a callable because the interesting ranks
    (median pair, tertiles) depend on n. Returns ``(n, values)`` with
    values in the order requested. Cost: one single-column range
    shuffle persisted across two passes; no task ever holds more than
    ~n/P values, so the selection scales out where a global
    row_number would funnel the sort.
    """
    spark = df.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    vals = (
        df.select(F.col(value_col).cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .repartitionByRange(partitions, F.col("__v"))
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        bucket_counts = sorted(
            (r["__pid"], r["n"])
            for r in vals.groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        n = sum(c for _, c in bucket_counts)
        ranks = list(ranks_for_n(n))
        if n == 0:
            return 0, [None for _ in ranks]
        if not ranks:
            # Mirror the n == 0 short-circuit: with no ranks requested the
            # OR-chain below would stay None and vals.filter(None) raises.
            return n, []
        for r in ranks:
            if not 0 <= r < n:
                raise ValueError(f"rank {r} outside [0, {n})")

        def locate(global_rank: int) -> tuple[int, int]:
            offset = 0
            for pid, cnt in bucket_counts:
                if global_rank < offset + cnt:
                    return pid, global_rank - offset
                offset += cnt
            raise AssertionError("rank beyond total count")

        coords = [locate(r) for r in ranks]
        needed = dict.fromkeys(coords)
        pids = sorted({pid for pid, _ in needed})
        w = Window.partitionBy("__pid").orderBy("__v")
        cond = None
        for pid, local in needed:
            c = (F.col("__pid") == pid) & (F.col("__rn") == local)
            cond = c if cond is None else cond | c
        picked = {
            (r["__pid"], r["__rn"]): r["__v"]
            for r in vals.filter(F.col("__pid").isin(pids))
            .withColumn("__rn", F.row_number().over(w) - 1)
            .filter(cond)
            .collect()
        }
        return n, [picked[c] for c in coords]
    finally:
        vals.unpersist()
