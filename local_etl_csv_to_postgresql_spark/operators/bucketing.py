"""Bucketed-table layout: pre-shuffled storage for co-located joins.

The reference's warehouse relies on PostgreSQL indexes for its star
joins (sql/create_tables.sql defines the surrogate-key indexes); the
Spark-native analogue for *large* join inputs is bucketing — write both
sides hash-partitioned (and sorted) on the join key so later joins read
already-co-located data and skip the exchange entirely.

When to use (100 TB design):
- dims that FIT a broadcast never need this (the engine broadcasts
  them, see plans/analytics.py);
- fact ↔ fact-sized joins (events↔events, lineitem↔orders, repeated
  self-joins of a 100 TB fact on the same key) pay a full shuffle of
  BOTH sides on every query. Bucketing moves that shuffle into the
  write path ONCE; every subsequent join on the bucket key is
  exchange-free (SortMergeJoin over pre-sorted bucket files — with
  ``sortBy`` the per-task sort is also free).

Bucket count sizing: total_size / buckets should fit a single task's
memory (~128-256 MB of compressed parquet per bucket per batch); at
100 TB that is O(100k) buckets, well within metastore limits. Bucket
pruning (`spark.sql.sources.bucketing.enabled`, on by default) also
skips non-matching buckets on point predicates over the bucket key —
note DisableUnnecessaryBucketedScan only weighs join/agg distribution
needs, so pruning-only queries want
`spark.sql.sources.bucketing.autoBucketedScan.enabled=false`.

Two default-off behaviors worth knowing at scale: Spark does not
propagate the `sortBy` order out of a bucketed scan unless
`spark.sql.legacy.bucketedTableScan.outputOrdering=true` (the join
still needs its per-task Sort, but never an Exchange), and writing
with one task per bucket (done below via `repartition`) is what makes
that flag usable at all (multi-file buckets must be merge-sorted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table keyed for exchange-free equi-joins on ``key``.

    Bucketed output demands one file per (task, bucket); repartitioning
    by the bucket key first makes each task own whole buckets — without
    it, N tasks × B buckets sliver files appear (same failure mode the
    month-partitioned fact writer guards against).
    """
    writer = (
        df.repartition(buckets, df[key])
        .write.mode(mode)
        .bucketBy(buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two tables bucketed on ``key``; with matching bucket
    counts the physical plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)


def join_is_exchange_free(df: DataFrame) -> bool:
    """True when the plan contains a join but no shuffle — the check
    tests use to pin the co-located property (mirrors reading
    `.explain` output for `Exchange`)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
