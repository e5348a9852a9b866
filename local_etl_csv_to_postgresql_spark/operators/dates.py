"""Date attribute derivation + dim_date seeding (F8-F12, S11).

Reference: src/transform.py:371-407 (pandas date attributes) and
sql/populate_dim_date.sql:20-76 (GENERATE_SERIES seed). Canonical
semantics follow the reference's *Python* path (unpadded month/day
names — the reference's SQL path space-pads and is internally
inconsistent, SURVEY §7.4-8).

ISO day-of-week: Spark ``dayofweek`` is 1=Sunday; the reference uses
``isocalendar().day`` (1=Monday..7=Sunday). We use ``F.weekday`` (0=Mon)
+ 1 to match (SURVEY §7.4-7).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def date_key(col: Column | str) -> Column:
    """F8: YYYYMMDD integer encoding (reference src/transform.py:380)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("int")


def iso_day_of_week(col: Column | str) -> Column:
    """F11: ISO day-of-week 1=Mon..7=Sun (reference src/transform.py:394)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.weekday(c) + F.lit(1)).cast("int")


def with_date_attributes(df: DataFrame, date_col: str = "date") -> DataFrame:
    """Attach the 11 dim_date attributes to ``date_col`` (F8-F12)."""
    d = F.col(date_col)
    return (
        df.withColumn("date_key", date_key(d))
        .withColumn("year", F.year(d).cast("int"))
        .withColumn("quarter", F.quarter(d).cast("int"))
        .withColumn("month", F.month(d).cast("int"))
        .withColumn("month_name", F.date_format(d, "MMMM"))
        .withColumn("day", F.dayofmonth(d).cast("int"))
        .withColumn("day_of_week", iso_day_of_week(d))
        .withColumn("day_name", F.date_format(d, "EEEE"))
        .withColumn("week_of_year", F.weekofyear(d).cast("int"))
        .withColumn("is_weekend", iso_day_of_week(d).isin(6, 7))
    )


def build_dim_date(
    spark: SparkSession,
    start: date = date(2022, 1, 1),
    end: date = date(2026, 12, 31),
) -> DataFrame:
    """S11: continuous calendar dimension via sequence+explode (the Spark
    form of GENERATE_SERIES, reference sql/populate_dim_date.sql:20-76).

    The sequence is built from one row then exploded — the explode
    parallelizes across partitions after a repartition, so even a
    century-long calendar is distributed work, not a driver loop.
    """
    days = spark.sql(
        f"SELECT explode(sequence(date'{start.isoformat()}', "
        f"date'{end.isoformat()}', interval 1 day)) AS date"
    )
    out = with_date_attributes(days, "date")
    return out.select(
        "date_key", "date", "year", "quarter", "month", "month_name",
        "day", "day_of_week", "day_name", "week_of_year", "is_weekend",
    )


def build_dim_date_from_facts(df: DataFrame, date_col: str = "date") -> DataFrame:
    """Reference Python path: dim_date from the distinct dates actually
    present (src/transform.py:371-407), sorted ascending."""
    return (
        with_date_attributes(df.select(F.col(date_col).alias("date")).distinct(), "date")
        .select(
            "date_key", "date", "year", "quarter", "month", "month_name",
            "day", "day_of_week", "day_name", "week_of_year", "is_weekend",
        )
        .orderBy("date")
    )
