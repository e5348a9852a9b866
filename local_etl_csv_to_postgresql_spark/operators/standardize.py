"""Scalar standardization functions (F1-F4, reference
src/transform.py:45-161).

The reference applies Python ``str.title()`` row-wise via Series.apply.
Python ``title()`` uppercases the first letter after ANY non-letter
("o'brien-smith" -> "O'Brien-Smith"), while Spark ``initcap`` only
capitalizes after whitespace — a correctness-relevant divergence because
merchant names contain hyphens/commas/apostrophes and become dimension
natural keys (SURVEY §2.10 caveat, §7.4-3).

``python_title`` reproduces ``str.title()`` exactly with built-in
expressions only (split on letter/non-letter boundaries via regex
lookarounds + transform/upper/lower) — no Python UDF, stays inside
whole-stage codegen, so the hot path is JVM-vectorized even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Split at every boundary between a letter and a non-letter (both
# directions), keeping all characters. Java regex; \p{L} = unicode letter.
_BOUNDARY = r"(?<=\p{L})(?!\p{L})|(?<!\p{L})(?=\p{L})"


def python_title(col: Column | str) -> Column:
    """Exact Python ``str.title()`` as a JVM-side expression.

    Tokens are maximal letter-runs or non-letter-runs; letter-runs get
    upper(first)+lower(rest), non-letter runs pass through.
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, _BOUNDARY)
    titled = F.transform(
        parts,
        lambda t: F.when(
            t.rlike(r"^\p{L}"),
            F.concat(
                F.upper(F.substring(t, 1, 1)),
                F.lower(t.substr(F.lit(2), F.length(t))),
            ),
        ).otherwise(t),
    )
    return F.array_join(titled, "")


def standardize_category(col: Column | str) -> Column:
    """F1 (reference src/transform.py:45-63): null-passthrough,
    strip + title-case."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), None).otherwise(python_title(F.trim(c)))


def standardize_merchant(col: Column | str) -> Column:
    """F2 (reference src/transform.py:66-87): strip, collapse internal
    whitespace, title-case."""
    c = F.col(col) if isinstance(col, str) else col
    collapsed = F.regexp_replace(F.trim(c), r"\s+", " ")
    return F.when(c.isNull(), None).otherwise(python_title(collapsed))


def standardize_payment_method(col: Column | str) -> Column:
    """F3 (reference src/transform.py:90-106): strip + title-case."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), None).otherwise(python_title(F.trim(c)))


def register_sql_functions(spark) -> None:
    """SQL-callable parity for the standardize trio (SURVEY §2.10: the
    reference exposes them as named functions; we register UDF wrappers
    so ``spark.sql("SELECT standardize_merchant(...)")`` works).

    These are row-at-a-time Python UDFs — exact ``str.title()`` by
    construction — intended for ad-hoc SQL convenience only. The hot
    path stays on the Column expressions above (JVM codegen); nothing in
    the engine calls these.
    """

    def _cat(s: str | None) -> str | None:
        return None if s is None else s.strip().title()

    def _merch(s: str | None) -> str | None:
        return None if s is None else " ".join(s.split()).title()

    def _pm(s: str | None) -> str | None:
        return None if s is None else s.strip().title()

    spark.udf.register("standardize_category", _cat, "string")
    spark.udf.register("standardize_merchant", _merch, "string")
    spark.udf.register("standardize_payment_method", _pm, "string")
