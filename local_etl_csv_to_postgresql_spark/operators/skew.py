"""Skew-resistant aggregation via key salting.

AQE's skew-join splitting handles skewed JOINS, but a groupBy whose key
distribution is pathological (one key = 50% of a 100 TB table) still
funnels that key's rows to one reducer. Salting splits each key into
``n_salts`` subkeys for a partial aggregate, then combines the partials
in a second (tiny) aggregation — the classic two-stage rewrite, kept
deterministic by using exact (decimal / long) partial states so the
combine order can't change results.

For algebraic aggregates only (sum/count/min/max — anything with an
associative partial state). Non-algebraic aggregates (exact median)
need a different strategy (e.g. pre-partition by key range).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    salt_on: Column | str,
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage sum/count over ``group_cols`` with a salt derived from
    ``salt_on`` (any high-cardinality column; hashing it spreads each
    group over ``n_salts`` reducers in stage 1).

    Returns one row per group with ``n`` (count) and, for every numeric
    column pre-aliased ``__sum_<name>``, its exact total. Callers shape
    the input with those aliases; see sa01 in functions/entrypoints.py.
    """
    salt = F.pmod(F.hash(F.col(salt_on) if isinstance(salt_on, str) else salt_on),
                  F.lit(n_salts)).alias("__salt")
    sum_cols = [c for c in df.columns if c.startswith("__sum_")]
    stage1 = (
        df.select(*group_cols, salt, *sum_cols)
        .groupBy(*group_cols, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(c).alias(c) for c in sum_cols],
        )
    )
    return stage1.groupBy(*group_cols).agg(
        F.sum("__n").cast("long").alias("n"),
        *[F.sum(c).alias(c) for c in sum_cols],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_source: Column | str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: replicate the (small) right side once
    per salt value and join on (key, salt), so a hot key's rows spread
    over ``n_salts`` reducers instead of melting one.

    The left side derives its salt deterministically from
    ``salt_source`` (any high-cardinality left column); the right side
    explodes a literal salt array. Use when AQE's skew-join splitting
    can't help (e.g. the skew is in a non-shuffle-join or the planner
    under-estimates it); results are identical to a plain join.
    """
    salt_col = F.pmod(
        F.hash(F.col(salt_source) if isinstance(salt_source, str) else salt_source),
        F.lit(n_salts),
    )
    salted_left = left.withColumn("__salt", salt_col)
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_left.join(salted_right, [key, "__salt"]).drop("__salt")
