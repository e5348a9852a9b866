"""Declarative data-quality expectations (a Deequ-shaped audit,
Spark-first).

The reference hard-codes its validation rules in the transform step
(``src/transform.py`` null/amount/date checks → P2-P8 in SURVEY §2.2);
this kernel generalizes them into the declarative form a production
data-quality gate uses: a list of named row-wise violation predicates
plus column-uniqueness checks, ALL evaluated in ONE
conditional-aggregation pass over the table (never a scan per rule —
at 100 TB, N rules must not mean N scans). Uniqueness rides the same
aggregate via count - countDistinct.

The one-row aggregate then unpivots (``stack``) into the
(rule, violations, passed, pass_rate) report shape — a driver-trivial
projection, no extra shuffle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# rule names are interpolated into a stack() SQL expression, so they
# are constrained to identifiers — a quote or space would otherwise
# break (or inject into) the generated SQL
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


@dataclass(frozen=True)
class Expectation:
    """A named row-wise rule: ``violation`` is True for rows that FAIL
    (NULL predicate results count as violations — an unparseable value
    cannot satisfy a constraint)."""

    name: str
    violation: Column


def evaluate(
    df: DataFrame,
    expectations: list[Expectation],
    unique_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(rule, violations, passed, pass_rate) — one row per rule, one
    scan total. pass_rate rounds to 6 dp from exact integer counts.

    Raises ``ValueError`` for an empty rule set (stack(0) is not valid
    SQL) or a rule/column name that is not a plain identifier (names
    are interpolated into the generated stack() expression)."""
    if not expectations and not unique_cols:
        raise ValueError("evaluate() needs at least one rule")
    for nm in [e.name for e in expectations] + list(unique_cols):
        if not _NAME_RE.match(nm):
            raise ValueError(
                f"rule/column name must be an identifier: {nm!r}"
            )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    names: list[str] = []
    for e in expectations:
        names.append(e.name)
        aggs.append(
            # outer coalesce: SUM over zero rows is NULL, but an empty
            # batch has 0 OBSERVED violations (it fails the gate via
            # the explicit __n = 0 rule instead)
            F.coalesce(
                F.sum(F.coalesce(e.violation, F.lit(True)).cast("long")),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"__r_{e.name}")
        )
    for c in unique_cols:
        names.append(f"{c}_unique")
        aggs.append(
            (F.count(c) - F.countDistinct(c))
            .cast("bigint")
            .alias(f"__r_{c}_unique")
        )
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', __r_{n}" for n in names)
    return (
        row.select(
            "__n",
            F.expr(
                f"stack({len(names)}, {stack_args}) AS (rule, violations)"
            ),
        )
        .select(
            "rule",
            "violations",
            # FAIL-CLOSED on an empty batch (r5 advice): 0 rows used to
            # yield pass_rate NULL (0/0) with passed=True for every
            # rule, so an upstream outage sailed through the quality
            # gate looking fully green. Zero rows now fails every rule
            # explicitly, with pass_rate NULL marking "no evidence".
            ((F.col("violations") == 0) & (F.col("__n") > 0)).alias(
                "passed"
            ),
            F.when(
                F.col("__n") > 0,
                F.round(
                    F.lit(1.0)
                    - F.col("violations").cast("double") / F.col("__n"),
                    6,
                ),
            ).alias("pass_rate"),
        )
        .orderBy("rule")
    )
