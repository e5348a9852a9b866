"""F1-F4 standardization semantics (reference tests/test_transform.py:44-179).

The load-bearing detail is exact Python ``str.title()`` parity — the
reference's merchant names contain hyphens/apostrophes/commas and the
titled string becomes a dimension natural key (SURVEY §7.4-3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_etl_csv_to_postgresql_spark.operators.standardize import (
    python_title,
    standardize_category,
    standardize_merchant,
    standardize_payment_method,
)

TITLE_CASES = [
    "o'brien's shop",
    "Blankenship-Strickland",
    "ellison, fleming and hatfield",
    "ABC-DEF",
    "abc1def",
    "PIX",
    "crédit-agricolé",
    "x",
    "McDonald's 24/7 mart",
    "a-b-c d'e",
    "HERNANDEZ, anderson and O'Brien",
]


@pytest.mark.parametrize("raw", TITLE_CASES)
def test_python_title_matches_str_title(spark, raw):
    out = spark.createDataFrame([(raw,)], ["s"]).select(
        python_title("s").alias("t")
    ).first()["t"]
    assert out == raw.title()


def test_standardize_category_strip_title(spark):
    df = spark.createDataFrame([("  groceries  ",), (None,)], ["category"])
    got = [r["c"] for r in df.select(standardize_category("category").alias("c")).collect()]
    assert got == ["Groceries", None]


def test_standardize_merchant_collapses_whitespace(spark):
    df = spark.createDataFrame([("  store    a  b ",)], ["merchant"])
    got = df.select(standardize_merchant("merchant").alias("m")).first()["m"]
    assert got == "Store A B"


def test_standardize_payment_method(spark):
    df = spark.createDataFrame([("credit card",), ("PIX",)], ["pm"])
    got = [r["p"] for r in df.select(standardize_payment_method("pm").alias("p")).collect()]
    assert got == ["Credit Card", "Pix"]


def test_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "merchant string")
    got = df.select(
        standardize_merchant("merchant").alias("m"),
        standardize_payment_method(F.col("merchant")).alias("p"),
    ).first()
    assert got["m"] is None and got["p"] is None


def test_sql_registered_functions(spark):
    from local_etl_csv_to_postgresql_spark.operators.standardize import (
        register_sql_functions,
    )

    register_sql_functions(spark)
    row = spark.sql(
        "SELECT standardize_category('  groceries ') AS c, "
        "standardize_merchant('  o''brien-smith   and  co ') AS m, "
        "standardize_payment_method('digital wallet') AS p"
    ).first()
    assert row["c"] == "Groceries"
    assert row["m"] == "O'Brien-Smith And Co"
    assert row["p"] == "Digital Wallet"
