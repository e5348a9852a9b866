"""Analytics query runner — the reference's second entry point
(src/run_queries.py) re-expressed over Spark SQL.

Parses the ``queries/analytics.sql`` corpus (same data-file contract as
the reference: ``-- Purpose:`` descriptions, blank-line separation,
trailing ``;`` stripped — src/run_queries.py:130-177), executes each
with ``spark.sql`` against the registered warehouse views, and renders
fixed-width console tables capped at 100 display rows
(src/run_queries.py:78-127). ``--validation`` runs the data-quality
subset (record counts, orphans, duplicates, amount profile —
src/run_queries.py:180-282).

Scale note: the runner never collects more than ``display_limit`` rows
to the driver (``df.take``), so a 100 TB fact table can back any corpus
query without driver OOM; the full result stays distributed.
"""

from __future__ import annotations

import argparse
import re
import sys
import time
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

DEFAULT_CORPUS = Path(__file__).resolve().parents[1] / "queries" / "analytics.sql"
DISPLAY_LIMIT = 100


@dataclass
class CorpusQuery:
    description: str
    sql: str


def parse_queries_file(path: str | Path) -> list[CorpusQuery]:
    """Split the corpus on blank lines; a query's description is its
    ``-- Purpose:`` line, its text runs from SELECT/WITH onward."""
    out: list[CorpusQuery] = []
    blocks = re.split(r"\n\s*\n", Path(path).read_text())
    for block in blocks:
        lines = block.strip().splitlines()
        desc = ""
        start = None
        for i, line in enumerate(lines):
            stripped = line.strip()
            m = re.match(r"--\s*Purpose:\s*(.+)", stripped)
            if m:
                desc = m.group(1).strip()
            if start is None and re.match(r"(SELECT|WITH)\b", stripped, re.I):
                start = i
        if start is None:
            continue  # header comment block
        sql = "\n".join(lines[start:]).strip().rstrip(";")
        out.append(CorpusQuery(description=desc or "(no description)", sql=sql))
    return out


def display_table(rows: list[dict], total_count: int | None = None) -> str:
    """Fixed-width rendering with the reference's 100-row display cap."""
    if not rows:
        return "(no rows)"
    cols = list(rows[0].keys())
    shown = rows[:DISPLAY_LIMIT]
    widths = {
        c: max(len(str(c)), *(len(_fmt(r[c])) for r in shown)) for c in cols
    }
    sep = "-+-".join("-" * widths[c] for c in cols)
    lines = [
        " | ".join(str(c).ljust(widths[c]) for c in cols),
        sep,
    ]
    for r in shown:
        lines.append(" | ".join(_fmt(r[c]).ljust(widths[c]) for c in cols))
    total = total_count if total_count is not None else len(rows)
    if total > len(shown):
        lines.append(f"... ({total - len(shown)} more rows, {total} total)")
    return "\n".join(lines)


def _fmt(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.2f}"
    return str(v)


def run_query(spark: SparkSession, q: CorpusQuery) -> tuple[list[dict], int]:
    df: DataFrame = spark.sql(q.sql)
    # take() bounds driver memory; a separate count() reports true size
    rows = [r.asDict() for r in df.take(DISPLAY_LIMIT + 1)]
    total = len(rows) if len(rows) <= DISPLAY_LIMIT else df.count()
    return rows[:DISPLAY_LIMIT], total


def run_corpus(
    spark: SparkSession,
    corpus_path: str | Path = DEFAULT_CORPUS,
    only: list[int] | None = None,
    quiet: bool = False,
) -> int:
    queries = parse_queries_file(corpus_path)
    failures = 0
    for i, q in enumerate(queries, start=1):
        if only and i not in only:
            continue
        t0 = time.time()
        try:
            rows, total = run_query(spark, q)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"\n[{i}] {q.description}\n  FAILED: {str(e).splitlines()[0]}")
            continue
        if not quiet:
            print(f"\n[{i}] {q.description}  ({time.time() - t0:.2f}s)")
            print(display_table(rows, total))
    return failures


VALIDATION_QUERY_INDEXES = [1, 2, 3, 4]  # counts, orphans, dups, amounts


def run_validation(spark: SparkSession, corpus_path: str | Path = DEFAULT_CORPUS) -> int:
    """Data-quality report: the reference's --validation mode."""
    print("=" * 60)
    print("WAREHOUSE VALIDATION REPORT")
    print("=" * 60)
    return run_corpus(spark, corpus_path, only=VALIDATION_QUERY_INDEXES)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Run the analytics query corpus")
    ap.add_argument("--corpus", default=str(DEFAULT_CORPUS))
    ap.add_argument("--warehouse", default=None, help="warehouse root path")
    ap.add_argument("--validation", action="store_true", help="data-quality subset only")
    ap.add_argument(
        "--verify-schema", action="store_true",
        help="warehouse schema/constraint introspection report",
    )
    ap.add_argument("--query", type=int, action="append", help="run only query #N (repeatable)")
    args = ap.parse_args(argv)

    from .config import WarehouseConfig
    from .session import get_spark
    from .warehouse import Warehouse

    spark = get_spark("run_queries")
    cfg = WarehouseConfig(path=args.warehouse) if args.warehouse else WarehouseConfig()
    wh = Warehouse(spark, cfg)
    wh.register_views()
    if args.verify_schema:
        report = [r.asDict() for r in wh.verify_schema().collect()]
        print(display_table(report))
        failures = sum(1 for r in report if r["status"] == "fail")
    elif args.validation:
        failures = run_validation(spark, args.corpus)
    else:
        failures = run_corpus(spark, args.corpus, only=args.query)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
