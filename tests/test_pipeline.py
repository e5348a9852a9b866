"""ETL pipeline orchestration + extraction contract
(reference tests/test_extract.py + src/etl_pipeline.py semantics)."""

from __future__ import annotations

import pytest

from local_etl_csv_to_postgresql_spark.config import (
    EngineConfig,
    ValidationConfig,
    WarehouseConfig,
)
from local_etl_csv_to_postgresql_spark.pipeline import run_etl_pipeline
from local_etl_csv_to_postgresql_spark.sources.extract import (
    ExtractError,
    extract_transactions,
    profile_dataframe,
    validate_csv_structure,
)
from local_etl_csv_to_postgresql_spark.sources.generator import (
    generate_transactions,
    write_transactions_csv,
)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "tx.csv"
    rows = generate_transactions(300, 20, 1, seed=7)
    rows[5]["amount"] = "not_a_number"
    rows[6]["category"] = "Nope"
    rows[7]["transaction_id"] = rows[4]["transaction_id"]
    write_transactions_csv(str(p), rows)
    return str(p)


def test_extract_reads_and_validates(spark, csv_path):
    df = extract_transactions(spark, csv_path)
    assert df.count() == 300
    ok, _ = validate_csv_structure(df)
    assert ok


def test_extract_missing_file_raises(spark):
    with pytest.raises(ExtractError, match="not found"):
        extract_transactions(spark, "/nonexistent/file.csv")


def test_extract_bad_structure_raises(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(ExtractError, match="Missing required columns"):
        extract_transactions(spark, str(p))


def test_profile_counts(spark, csv_path):
    df = extract_transactions(spark, csv_path)
    prof = profile_dataframe(df)
    assert prof["row_count"] == 300
    assert prof["duplicate_transaction_ids"] == 1
    assert set(prof["null_counts"]) == set(df.columns)


def test_pipeline_end_to_end_and_rerun(spark, csv_path, tmp_path):
    cfg = EngineConfig(warehouse=WarehouseConfig(path=str(tmp_path / "wh")))
    res = run_etl_pipeline(spark, csv_path, cfg)
    assert res.status == "success"
    assert res.extracted_rows == 300
    # 1 dup dropped, 2 invalid rows
    assert res.transformed_rows == 297
    assert res.loaded_rows == 297
    rerun = run_etl_pipeline(spark, csv_path, cfg)
    assert rerun.loaded_rows == 0 and rerun.skipped_rows == 297


def test_pipeline_dry_run_writes_nothing(spark, csv_path, tmp_path):
    wh_path = tmp_path / "wh_dry"
    cfg = EngineConfig(warehouse=WarehouseConfig(path=str(wh_path)))
    res = run_etl_pipeline(spark, csv_path, cfg, dry_run=True)
    assert res.status == "dry_run"
    assert not wh_path.exists()


def test_pipeline_missing_file_fails_cleanly(spark, tmp_path):
    cfg = EngineConfig(warehouse=WarehouseConfig(path=str(tmp_path / "whx")))
    res = run_etl_pipeline(spark, "/no/such.csv", cfg)
    assert res.status == "failed"
    assert "not found" in res.error
