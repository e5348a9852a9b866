"""P2-P8 validation rules, one rule per test + accounting
(reference tests/test_transform.py:222-377)."""

from __future__ import annotations

from datetime import datetime

import pytest

from local_etl_csv_to_postgresql_spark.config import ValidationConfig
from local_etl_csv_to_postgresql_spark.operators.validate import (
    ValidationError,
    validate_transactions,
)
from tests.conftest import rows_to_df

CFG = ValidationConfig(max_valid_ts=datetime(2024, 1, 1))


def _ids(df):
    return sorted(r["transaction_id"] for r in df.select("transaction_id").collect())


def test_valid_rows_survive(spark, valid_rows):
    res = validate_transactions(rows_to_df(spark, valid_rows), CFG)
    assert res.valid_rows == 3
    assert res.input_rows == 3
    assert all(v == 0 for v in res.issue_counts.values())


def test_invalid_matrix(spark, invalid_rows):
    res = validate_transactions(rows_to_df(spark, invalid_rows), CFG)
    assert _ids(res.valid) == ["ok"]
    ic = res.issue_counts
    assert ic["invalid_date"] == 3  # future, too-old, null-date
    assert ic["invalid_amount"] == 3  # negative, zero, non-numeric
    assert ic["amount_exceeds_max"] == 1
    assert ic["invalid_category"] == 1
    assert ic["invalid_payment_method"] == 1
    assert ic["invalid_user_id"] == 1  # only 'x'
    # null date row also trips null_required_fields
    assert ic["null_required_fields"] == 1


def test_amount_rounding_and_types(spark):
    rows = [["t1", "2023-06-15", "Groceries", "10.005", "M", "Cash", "7"]]
    res = validate_transactions(rows_to_df(spark, rows), CFG)
    row = res.valid.first()
    assert abs(row["amount"] - 10.0) < 0.011  # rounded to 2dp
    assert row["user_id"] == 7
    assert str(row["date"]) == "2023-06-15"


def test_all_invalid_raises(spark):
    rows = [["t1", "2023-06-15", "Nope", "10.00", "M", "Cash", "1"]]
    with pytest.raises(ValidationError):
        validate_transactions(rows_to_df(spark, rows), CFG)


def test_whitelists_can_be_disabled(spark):
    rows = [["t1", "2023-06-15", "AnyCat", "10.00", "M", "AnyPay", "1"]]
    cfg = ValidationConfig(
        max_valid_ts=datetime(2024, 1, 1),
        enforce_category_whitelist=False,
        enforce_payment_whitelist=False,
    )
    res = validate_transactions(rows_to_df(spark, rows), cfg)
    assert res.valid_rows == 1


def test_invalid_frame_carries_failed_rules(spark, invalid_rows):
    res = validate_transactions(rows_to_df(spark, invalid_rows), CFG)
    failed = {
        r["transaction_id"]: set(r["__failed_rules"]) for r in res.invalid.collect()
    }
    assert failed["t3"] == {"invalid_category"}
    assert failed["t6"] == {"amount_exceeds_max"}
    assert "invalid_user_id" in failed["t9"]
