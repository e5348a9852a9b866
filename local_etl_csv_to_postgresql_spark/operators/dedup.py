"""Exact keyed deduplication (D1, reference src/transform.py:140-144).

The reference's ``drop_duplicates(subset=['transaction_id'],
keep='first')`` keeps the first occurrence in FILE ORDER. Spark's
``dropDuplicates`` keeps an arbitrary row, which breaks golden-value
parity when duplicate ids carry different payloads (reference fixture
dirty_transform_data does exactly that).

``keep_first_dedup`` reproduces keep-first: a deterministic per-row
ordinal (monotonically_increasing_id, which encodes partition-index ×
row-in-partition and therefore preserves input file order for a fresh
file scan) + row_number over the key ordered by that ordinal.

Scale note: this is one shuffle on the dedup key — the same shuffle a
plain dropDuplicates needs — so keep-first costs nothing extra. Skewed
keys (one id duplicated millions of times) are handled by AQE skew-join
splitting; true dedup skew at 100 TB would pre-aggregate min(ordinal)
per key (map-side combinable) and semi-join, which is what
``keep_first_dedup(agg_strategy=True)`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ORD = "__file_order"


def keep_first_dedup(
    df: DataFrame, keys: list[str], agg_strategy: bool = False
) -> DataFrame:
    """Drop duplicate ``keys`` keeping the first row in input order."""
    with_ord = df.withColumn(_ORD, F.monotonically_increasing_id())
    if agg_strategy:
        # Two map-side-combinable aggs instead of a full-row shuffle:
        # min(ordinal) per key, then inner join back on (key, ordinal).
        firsts = with_ord.groupBy(*keys).agg(F.min(_ORD).alias(_ORD))
        return with_ord.join(firsts, keys + [_ORD], "inner").drop(_ORD)
    w = Window.partitionBy(*keys).orderBy(F.col(_ORD).asc())
    return (
        with_ord.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", _ORD)
    )
