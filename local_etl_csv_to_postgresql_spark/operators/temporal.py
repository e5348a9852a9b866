"""Temporal joins Spark lacks natively: as-of join and point-in-interval
range join, both expressed as single-shuffle DataFrame plans.

Neither exists in the reference (its engine stops at equi-joins,
`/root/reference/sql/queries.sql`); they are part of this engine's
training-data extensions — event-stream feature engineering needs
"latest fact as of t" and "facts within a window around t" constantly.

Scale design (100 TB):
- ``asof_join`` is the union-then-window formulation: tag both inputs,
  union, ONE shuffle on the key columns, then a per-key ordered window
  carries the latest right-side payload forward. No range condition ever
  reaches a join operator, so there is no O(n*m) blow-up and no
  broadcast-nested-loop fallback — cost is a sort within each key
  partition, exactly what a 1000-executor shuffle does well. Skewed
  keys can be pre-salted upstream (operators/skew.py) if one entity
  dominates.
- ``range_join_count`` buckets time into fixed bins: each interval
  covers at most ``ceil(span/bin)+1`` bins, so the interval side
  explodes by a small constant, the join is a pure equi-join on
  (key, bin) — shuffle-hash/sort-merge eligible, AQE-coalescible —
  and the exact range predicate filters inside the joined partitions.
  This is the standard bin-bucketing trick (cf. Databricks range-join
  hints) expressed with public DataFrame ops only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "epoch_seconds", "range_join_count"]


def epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds of a timestamp of EITHER flavor.

    ``CAST(x AS BIGINT)`` works on TIMESTAMP but is an analysis error on
    TIMESTAMP_NTZ; routing through ``cast("timestamp")`` first (a no-op
    for TIMESTAMP, a session-tz reinterpretation for NTZ — the engine
    pins the session to UTC, see session.py) makes the epoch math accept
    both. Pure expression, folds into whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    tiebreak: str | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the nearest right row on
    the same key — ``direction="backward"`` (default) takes the latest
    right row with ``right_ts <= left_ts``, ``direction="forward"`` the
    earliest with ``right_ts >= left_ts`` (both inclusive — a right row
    at exactly ``left_ts`` matches either way).

    ``right_cols`` come back prefixed ``asof_`` (null when no match).
    ``tiebreak`` orders right rows sharing a timestamp (backward: the
    greatest wins; forward: the smallest), keeping results
    deterministic. ``tolerance_seconds`` nulls out matches farther than
    the window, like pandas ``merge_asof`` — gap measured on
    floor-epoch-seconds in the match direction.

    One shuffle on ``on``; no range join, no cross product. The forward
    variant is the same union+window plan with the carry reversed: a
    forward-looking ``first(ignorenulls)`` frame instead of a
    backward-looking ``last``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    right_cols = [c for c in right_cols if c not in on]
    payload = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in right_cols],
    )
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        payload.alias("__payload"),
    )
    l_rows = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l_rows.unionByName(
        r.select(*on, "__ts", "__side", "__tb", "__payload"),
        allowMissingColumns=True,
    )
    if direction == "backward":
        # right rows sort BEFORE left rows at the same instant
        # (inclusive semantics); among simultaneous right rows the
        # greatest tiebreak sorts last, so last(ignorenulls) picks it
        w = (
            Window.partitionBy(*on)
            .orderBy(
                F.col("__ts").asc(),
                F.col("__side").asc(),
                F.col("__tb").asc_nulls_last(),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("__payload", ignorenulls=True).over(w)
        gap = epoch_seconds("__ts") - epoch_seconds(F.col("__m.__rts"))
    else:
        # right rows sort AFTER left rows at the same instant (still
        # visible to the forward-looking frame that starts at
        # currentRow); among simultaneous right rows the smallest
        # tiebreak sorts first, so first(ignorenulls) picks it
        w = (
            Window.partitionBy(*on)
            .orderBy(
                F.col("__ts").asc(),
                F.col("__side").desc(),
                F.col("__tb").asc_nulls_last(),
            )
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("__payload", ignorenulls=True).over(w)
        gap = epoch_seconds(F.col("__m.__rts")) - epoch_seconds("__ts")
    matched = (
        unioned.withColumn("__m", carry).filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        matched = matched.withColumn(
            "__m", F.when(gap <= F.lit(tolerance_seconds), F.col("__m"))
        )
    out_cols = [c for c in left.columns]
    result = matched.select(
        *out_cols,
        F.col("__m.__rts").alias(f"asof_{right_ts}"),
        *[F.col(f"__m.{c}").alias(f"asof_{c}") for c in right_cols],
    )
    return result


def range_join_count(
    points: DataFrame,
    anchors: DataFrame,
    on: Sequence[str],
    point_ts: str,
    anchor_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    bin_seconds: int | None = None,
    count_alias: str = "n_in_range",
) -> tuple[DataFrame, Column]:
    """Count, for every anchor row, the points on the same key whose
    timestamp falls in ``[anchor_ts + lower, anchor_ts + upper)``
    (seconds, lower may be negative for look-back windows).

    Returns ``(joined, count_col)`` where ``joined`` is the
    anchor-grain frame with ``count_alias`` attached.

    Bin-bucketing: both sides bucket time into ``bin_seconds`` bins
    (default = window span); the anchor side explodes into every bin
    its window touches (a small constant), the join is a pure equi-join
    on (key, bin), and the exact predicate runs post-join. Anchors with
    zero matching points are kept (left join) with count 0.
    """
    on = list(on)
    span = upper_seconds - lower_seconds
    if span <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")
    bin_s = bin_seconds or span

    p_epoch = epoch_seconds(point_ts)
    a_epoch = epoch_seconds(anchor_ts)
    p = points.select(
        *on,
        p_epoch.alias("__pe"),
        (p_epoch - (p_epoch % bin_s)).alias("__bin"),
    )
    lo = a_epoch + F.lit(lower_seconds)
    hi = a_epoch + F.lit(upper_seconds)
    a = anchors.select(
        "*",
        lo.alias("__lo"),
        hi.alias("__hi"),
        F.explode(
            F.sequence(
                lo - (lo % bin_s),
                (hi - F.lit(1)) - ((hi - F.lit(1)) % bin_s),
                F.lit(bin_s),
            )
        ).alias("__bin"),
    )
    # out-of-range matches are NULLed (not filtered): dropping the row
    # would lose anchors whose every bin-mate is out of range, which must
    # still appear with count 0. Anchor rows must be unique (carry a key)
    # since the count groups by the full anchor row.
    joined = a.join(p, on=[*on, "__bin"], how="left").withColumn(
        "__hit",
        F.when(
            (F.col("__pe") >= F.col("__lo")) & (F.col("__pe") < F.col("__hi")),
            F.col("__pe"),
        ),
    )
    counted = (
        joined.groupBy(*[F.col(c) for c in anchors.columns])
        .agg(F.count("__hit").alias(count_alias))
    )
    return counted, F.col(count_alias)
