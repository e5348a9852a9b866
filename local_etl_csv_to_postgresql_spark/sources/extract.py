"""Extraction: CSV scan + structural validation + quality profiling.

Reference parity (SURVEY §2.1):
- S1 CSV scan            — reference src/extract.py:107-227
- S2 file metadata probe — reference src/extract.py:23-61
- S3 structural check    — reference src/extract.py:64-104
- A12 null profiling     — reference src/extract.py:100-102,190-203

Spark-first notes: the scan reads with an explicit all-string schema (no
inference pass — at 100 TB a second pass to infer types is a full extra
scan). Structural validation inspects ``df.columns`` (driver-side, free)
and does ONE distributed aggregation for emptiness + all-null-row count;
profiling computes every per-column null count in a single job via
conditional aggregation rather than a count per column.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import REQUIRED_CSV_COLUMNS
from ..schemas import TRANSACTIONS_CSV_SCHEMA


class ExtractError(Exception):
    """Raised when extraction fails (missing file, empty file, bad structure)."""


def get_file_info(file_path: str) -> dict:
    """File metadata probe (reference src/extract.py:23-61).

    Driver-side os.stat — unchanged from the reference; at cluster scale
    this becomes a FileSystem.getFileStatus call but stays a metadata op.
    """
    exists = os.path.exists(file_path)
    info = {"path": file_path, "exists": exists}
    if exists:
        st = os.stat(file_path)
        info.update(
            {
                "size_bytes": st.st_size,
                "size_mb": round(st.st_size / (1024 * 1024), 2),
                "modified_time": datetime.fromtimestamp(
                    st.st_mtime, tz=timezone.utc
                ).isoformat(),
                "is_file": os.path.isfile(file_path),
            }
        )
    return info


def validate_csv_structure(
    df: DataFrame, required_columns: tuple[str, ...] = REQUIRED_CSV_COLUMNS
) -> tuple[bool, str]:
    """Structural validation (reference src/extract.py:64-104).

    Checks: required columns present (extra columns tolerated — reference
    tests/test_extract.py:100-108), frame non-empty. Returns (ok, message)
    like the reference instead of raising, so callers control fail-fast.
    """
    missing = [c for c in required_columns if c not in df.columns]
    if missing:
        return False, f"Missing required columns: {missing}"
    # isEmpty is a LIMIT-1 job — cheapest possible emptiness probe.
    if df.isEmpty():
        return False, "CSV file contains no data rows"
    return True, "Structure valid"


def count_all_null_rows(
    df: DataFrame, columns: tuple[str, ...] = REQUIRED_CSV_COLUMNS
) -> int:
    """Rows where every required field is null (reference warns on these,
    src/extract.py:88-92). One aggregation, map-side combinable."""
    cols = [c for c in columns if c in df.columns]
    all_null = None
    for c in cols:
        cond = F.col(c).isNull()
        all_null = cond if all_null is None else (all_null & cond)
    row = df.select(
        F.coalesce(F.sum(F.when(all_null, 1).otherwise(0)), F.lit(0)).alias("n")
    ).first()
    return int(row["n"])


def profile_dataframe(df: DataFrame) -> dict:
    """Null/duplicate/quality profiling (reference src/extract.py:190-203,
    A12). Single job: total count + per-column null counts + duplicate
    transaction_id count via conditional aggregation.
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in df.columns:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c))
    if "transaction_id" in df.columns:
        aggs.append(
            (F.count("transaction_id") - F.count_distinct("transaction_id")).alias(
                "__dup_txn"
            )
        )
    row = df.agg(*aggs).first().asDict()
    total = int(row.pop("__total"))
    dup = int(row.pop("__dup_txn", 0) or 0)
    return {
        "row_count": total,
        "null_counts": {c: int(row[c] or 0) for c in df.columns},
        "duplicate_transaction_ids": dup,
    }


def extract_transactions(
    spark: SparkSession,
    file_path: str,
    required_columns: tuple[str, ...] = REQUIRED_CSV_COLUMNS,
) -> DataFrame:
    """CSV scan with fail-fast structural validation (reference
    src/extract.py:107-227, S1+S3).

    Reads header CSV with the all-string declared schema; extra columns
    beyond the schema are preserved by re-reading with the actual header
    when present. Raises ExtractError on missing/empty/bad-structure input
    (reference raises FileNotFoundError/EmptyDataError/ValueError — we
    normalize to one error type with the cause in the message).
    """
    info = get_file_info(file_path)
    if not info["exists"]:
        raise ExtractError(f"File not found: {file_path}")
    if info.get("size_bytes", 0) == 0:
        raise ExtractError(f"File is empty: {file_path}")

    # Read with header + all columns as string. Keep extra columns:
    # inferSchema=False + no declared schema makes every column string
    # while preserving whatever header the file has.
    df = spark.read.option("header", True).option("inferSchema", False).csv(file_path)

    ok, msg = validate_csv_structure(df, required_columns)
    if not ok:
        raise ExtractError(f"Invalid CSV structure: {msg}")
    return df


def extract_transactions_jsonl(
    spark: SparkSession,
    file_path: str,
    required_columns: tuple[str, ...] = REQUIRED_CSV_COLUMNS,
) -> DataFrame:
    """JSON-Lines scan with the same downstream contract as the CSV
    path: every required field read AS STRING (the declared schema makes
    the JSON parser stringify scalars), so transform's coercion/
    validation rules apply unchanged regardless of source format.

    Same fail-fast structural checks as ``extract_transactions``; a
    line that isn't valid JSON surfaces as an all-null row (PERMISSIVE
    mode), which the all-null profile then reports — dirty lines are a
    data-quality signal, not a job abort, exactly like dirty CSV cells.
    """
    info = get_file_info(file_path)
    if not info["exists"]:
        raise ExtractError(f"File not found: {file_path}")
    if info.get("size_bytes", 0) == 0:
        raise ExtractError(f"File is empty: {file_path}")

    df = spark.read.schema(TRANSACTIONS_CSV_SCHEMA).json(file_path)
    ok, msg = validate_csv_structure(df, required_columns)
    if not ok:
        raise ExtractError(f"Invalid JSONL structure: {msg}")
    return df


def extract_transactions_columnar(
    spark: SparkSession,
    file_path: str,
    fmt: str = "parquet",
    required_columns: tuple[str, ...] = REQUIRED_CSV_COLUMNS,
) -> DataFrame:
    """Parquet/ORC scan normalized to the transform contract: whatever
    types the columnar file carries, every column is cast to STRING so
    the coercion/validation rules apply identically across source
    formats (a parquet batch with int64 user_id behaves exactly like
    the CSV's string user_id). Column pruning/pushdown still reach the
    scan — the casts sit above it. Same fail-fast structural checks as
    the CSV path."""
    info = get_file_info(file_path)
    if not info["exists"]:
        raise ExtractError(f"File not found: {file_path}")
    if info.get("is_file", True) and info.get("size_bytes", 0) == 0:
        raise ExtractError(f"File is empty: {file_path}")

    reader = spark.read.orc if fmt == "orc" else spark.read.parquet
    df = reader(file_path)
    df = df.select([F.col(c).cast("string").alias(c) for c in df.columns])
    ok, msg = validate_csv_structure(df, required_columns)
    if not ok:
        raise ExtractError(f"Invalid {fmt.upper()} structure: {msg}")
    return df


def extract_any(
    spark: SparkSession,
    file_path: str,
    fmt: str = "auto",
    required_columns: tuple[str, ...] = REQUIRED_CSV_COLUMNS,
) -> DataFrame:
    """Format-dispatching extract: ``csv``, ``jsonl``, ``parquet``,
    ``orc``, or ``auto`` (by file extension, defaulting to CSV).
    Compression suffixes (``.gz``/``.bz2``/``.zst``) are transparent:
    Spark's text sources decompress natively, so ``tx.csv.gz`` routes
    to the CSV reader."""
    if fmt == "auto":
        name = file_path.lower()
        for comp in (".gz", ".bz2", ".zst"):
            if name.endswith(comp):
                name = name[: -len(comp)]
                break
        ext = name.rsplit(".", 1)[-1]
        if ext in ("jsonl", "json", "ndjson"):
            fmt = "jsonl"
        elif ext in ("parquet", "orc"):
            fmt = ext
        else:
            fmt = "csv"
    if fmt == "jsonl":
        return extract_transactions_jsonl(spark, file_path, required_columns)
    if fmt == "csv":
        return extract_transactions(spark, file_path, required_columns)
    if fmt in ("parquet", "orc"):
        return extract_transactions_columnar(
            spark, file_path, fmt, required_columns
        )
    raise ExtractError(f"Unknown source format: {fmt}")


__all__ = [
    "ExtractError",
    "extract_transactions",
    "extract_transactions_jsonl",
    "extract_transactions_columnar",
    "extract_any",
    "get_file_info",
    "validate_csv_structure",
    "count_all_null_rows",
    "profile_dataframe",
    "TRANSACTIONS_CSV_SCHEMA",
]
