"""Distributed two-sample statistics: the drift monitors a production
pipeline runs between yesterday's data and today's (train-vs-serve
skew, crawl-mix shift) — expressed so no step funnels a group through
a single task.

Not in the reference (its SQL library has no statistical tests,
/root/reference/sql/queries.sql); part of this engine's training-data
extension surface.

Scale design (100 TB):
- ``two_sample_ks``: per (group, value) counts shuffle once; both
  empirical CDFs ride ONE multi-column distributed prefix sum
  (operators/ranking.attach_global_row_number — range partition +
  in-partition window, never a per-group sort task). The supremum
  compares exact int64 cross-products |cum_a·n_b − cum_b·n_a|, so no
  float CDF participates in the argmax; the one divide happens after.
  Exact while n_a·n_b < 2^63 (~3e9 rows per side) — beyond that,
  switch the comparator to normalized doubles.
- ``chi_square_independence``: one count aggregate; the expected grid
  is the outer product of two broadcast marginal vectors derived from
  the (tiny, localCheckpoint-pinned) observed grid — the raw input is
  scanned exactly once. Per-cell contributions round to 6 dp and sum
  as DECIMAL(25,6): order-independent, so shuffle arrival cannot
  wiggle the statistic.
- ``population_stability_index``: same conditional-count + dense-grid
  shape as the chi-square, over caller-supplied fixed-width bins —
  sample-quantile bins would not replay across engines or runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ranking import attach_global_row_number

__all__ = ["two_sample_ks", "chi_square_independence", "population_stability_index"]


def two_sample_ks(
    df: DataFrame,
    group_col: str,
    value_col: str,
    side_a: Column,
    ks_col: str = "ks_stat",
) -> DataFrame:
    """Per ``group_col``: the two-sample Kolmogorov-Smirnov statistic
    between rows where ``side_a`` holds (sample A) and the rest
    (sample B), over ``value_col``.

    Returns one row per group: ``(group_col, n_a, n_b, ks_col)``;
    ``ks_col`` is NULL when either sample is empty. Rounded to 6 dp.
    NULL groups and NULL values are dropped up front (a null value has
    no place on a CDF, and the totals join is null-unsafe); coalesce
    to sentinels first to treat them as categories.
    """
    tagged = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).alias("__val"),
        side_a.cast("long").alias("__a"),
    ).na.drop(subset=["__g", "__val"])
    per_value = tagged.groupBy("__g", "__val").agg(
        F.sum("__a").alias("__ca"),
        F.sum(F.lit(1) - F.col("__a")).alias("__cb"),
    )
    cdf = attach_global_row_number(
        per_value,
        order_by=[F.asc("__val")],
        partition_by=["__g"],
        rn_col="__rn",
        running_sum_of=["__ca", "__cb"],
        running_sum_col=["__cum_a", "__cum_b"],
    )
    # sample sizes are the final cumulative counts — aggregating the
    # checkpointed CDF frame avoids a second scan of the source
    totals = cdf.groupBy("__g").agg(
        F.max("__cum_a").cast("long").alias("__na"),
        F.max("__cum_b").cast("long").alias("__nb"),
    )
    sup = F.max(
        F.abs(
            F.col("__cum_a") * F.col("__nb")
            - F.col("__cum_b") * F.col("__na")
        )
    )
    return (
        cdf.join(F.broadcast(totals), "__g")
        .groupBy("__g")
        .agg(
            F.max("__na").alias("n_a"),
            F.max("__nb").alias("n_b"),
            F.round(
                sup.cast("double")
                / (F.max("__na") * F.max("__nb")).cast("double"),
                6,
            ).alias(ks_col),
        )
        .withColumn(
            ks_col,
            F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), F.col(ks_col)),
        )
        .withColumnRenamed("__g", group_col)
        .orderBy(group_col)
    )


def chi_square_independence(
    df: DataFrame,
    a_col: str,
    b_col: str,
    chi2_col: str = "chi2_part",
) -> DataFrame:
    """Chi-square independence contributions between two LOW-cardinality
    categorical columns: one row per ``a_col`` value with its share of
    the statistic summed over the dense ``a × b`` grid (zero cells
    contribute their full expectation). Sum the column for the total
    statistic; dof = (|a|-1)(|b|-1).

    Returns ``(a_col, n_rows, chi2_col)``. Both columns must be
    low-cardinality (the marginal vectors broadcast). NULL categories
    are dropped up front — the dense-grid join is null-unsafe, so a
    null key would silently contribute expectation without its
    observed count; callers who want nulls as a category must coalesce
    them to a sentinel first.
    """
    ev = df.select(F.col(a_col).alias("__a"), F.col(b_col).alias("__b")).na.drop(
        subset=["__a", "__b"]
    )
    obs = (
        ev.groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
        .localCheckpoint(eager=False)
    )
    rt = obs.groupBy("__a").agg(F.sum("__o").alias("__rt"))
    ct = obs.groupBy("__b").agg(F.sum("__o").alias("__ct"))
    tot = obs.agg(F.sum("__o").alias("__n"))
    grid = (
        F.broadcast(rt)
        .crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(tot))
        .join(obs, ["__a", "__b"], "left")
        .withColumn("__o", F.coalesce(F.col("__o"), F.lit(0)))
    )
    e = (
        F.col("__rt").cast("double")
        * F.col("__ct").cast("double")
        / F.col("__n").cast("double")
    )
    o = F.col("__o").cast("double")
    contrib = F.round((o - e) * (o - e) / e, 6).cast("decimal(25,6)")
    return (
        grid.withColumn("__c", contrib)
        .groupBy("__a")
        .agg(
            F.max("__rt").cast("bigint").alias("n_rows"),
            F.sum("__c").cast("double").alias(chi2_col),
        )
        .withColumnRenamed("__a", a_col)
        .orderBy(a_col)
    )


def population_stability_index(
    df: DataFrame,
    group_col: str,
    bin_col: str,
    side_a: Column,
    n_bins: int,
    psi_col: str = "psi",
    smoothing: float = 0.5,
) -> DataFrame:
    """Per ``group_col``: the Population Stability Index between rows
    where ``side_a`` holds (reference sample) and the rest, over a
    PRE-BINNED integer column ``bin_col`` in ``[0, n_bins)`` —
    callers choose the binning (fixed-width keeps the metric
    reproducible; sample-quantile bins do not replay across engines).

    PSI = Σ_bins (p−q)·ln(p/q) with ``smoothing`` Laplace counts so
    empty bins contribute finite mass. One conditional-count
    aggregate; the dense grid crosses per-group totals with the bin
    spine (both broadcast); per-bin terms round to 6 dp and sum as
    DECIMAL(25,6) — shuffle-order independent. NULL groups/bins drop
    (see chi_square_independence for the rationale).

    Returns ``(group_col, n_a, n_b, psi_col)``.
    """
    spark = df.sparkSession
    ev = df.select(
        F.col(group_col).alias("__g"),
        F.col(bin_col).alias("__bin"),
        side_a.cast("long").alias("__a"),
    ).na.drop(subset=["__g", "__bin"])
    obs = (
        ev.groupBy("__g", "__bin")
        .agg(
            F.sum("__a").alias("__ca"),
            F.sum(F.lit(1) - F.col("__a")).alias("__cb"),
        )
        .localCheckpoint(eager=False)
    )
    totals = obs.groupBy("__g").agg(
        F.sum("__ca").cast("long").alias("__na"),
        F.sum("__cb").cast("long").alias("__nb"),
    )
    bins = spark.range(0, n_bins).select(F.col("id").cast("int").alias("__bin"))
    grid = (
        F.broadcast(totals)
        .crossJoin(F.broadcast(bins))
        .join(obs, ["__g", "__bin"], "left")
        .select(
            "__g",
            "__na",
            "__nb",
            F.coalesce(F.col("__ca"), F.lit(0)).alias("__ca"),
            F.coalesce(F.col("__cb"), F.lit(0)).alias("__cb"),
        )
    )
    # smoothing adds `smoothing` to every bin, so totals grow by
    # smoothing * n_bins on each side
    p = (F.col("__ca").cast("double") + F.lit(float(smoothing))) / (
        F.col("__na").cast("double") + F.lit(float(smoothing) * n_bins)
    )
    q = (F.col("__cb").cast("double") + F.lit(float(smoothing))) / (
        F.col("__nb").cast("double") + F.lit(float(smoothing) * n_bins)
    )
    contrib = F.round((p - q) * F.log(p / q), 6).cast("decimal(25,6)")
    return (
        grid.withColumn("__c", contrib)
        .groupBy("__g")
        .agg(
            F.max("__na").alias("n_a"),
            F.max("__nb").alias("n_b"),
            F.sum("__c").cast("double").alias(psi_col),
        )
        .withColumnRenamed("__g", group_col)
        .orderBy(group_col)
    )
