"""Property-based tests (hypothesis) for the custom semantics the
engine re-implements by hand — the places a golden-value test can't
cover the input space:

- python_title must equal str.title() on arbitrary text (the SURVEY
  §7.4-3 fixture-sensitive divergence from initcap),
- merchant standardization must equal the reference's
  ' '.join(s.split()).title() composition,
- session_window islands must equal a pure-Python gap scan,
- dim_date attributes must equal Python datetime/isocalendar.

Batched: each property collects its examples first and runs ONE Spark
job over all of them (a per-example Spark round-trip would be minutes).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from local_etl_csv_to_postgresql_spark.operators.dates import with_date_attributes
from local_etl_csv_to_postgresql_spark.operators.standardize import (
    python_title,
    standardize_merchant,
)
from local_etl_csv_to_postgresql_spark.streaming.windows import session_summary

# printable-ish text incl. unicode letters, punctuation, whitespace runs
TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "Zs"),
    ),
    max_size=40,
)


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_python_title_equals_str_title(spark, data):
    samples = [data.draw(TEXT) for _ in range(200)] + [
        "o'brien's", "Blankenship-Strickland", "ellison, fleming and hatfield",
        "MiXeD   caSe", "42nd street", "ünïcode-nämes", "",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = [r["t"] for r in df.select(python_title("s").alias("t")).collect()]
    assert got == [s.title() for s in samples]


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_standardize_merchant_matches_reference_composition(spark, data):
    samples = [data.draw(TEXT) for _ in range(150)]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = [r["t"] for r in df.select(standardize_merchant("s").alias("t")).collect()]
    expected = [" ".join(s.split()).title() for s in samples]
    assert got == expected


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_session_windows_match_python_islands(spark, data):
    gap = 600  # seconds
    base = dt.datetime(2024, 3, 1)
    events = []
    for user in range(4):
        offsets = sorted(
            data.draw(
                st.lists(st.integers(0, 30_000), min_size=1, max_size=40)
            )
        )
        events += [(user, base + dt.timedelta(seconds=o)) for o in offsets]

    df = spark.createDataFrame(events, "user_id long, ts timestamp")
    got = {
        r["user_id"]: (r["session_count"], r["event_count"])
        for r in session_summary(df, gap=f"{gap} seconds").collect()
    }

    expected = {}
    for user in {u for u, _ in events}:
        ts = sorted(t for u, t in events if u == user)
        sessions = 1
        for a, b in zip(ts, ts[1:]):
            # session_window merges an event at exactly last+gap
            if (b - a).total_seconds() > gap:
                sessions += 1
        expected[user] = (sessions, len(ts))
    assert got == expected


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_exact_ntile_matches_engine_ntile_swept(spark, data):
    """exact_ntile(rn, n, tiles) must equal the engine's NTILE for
    random (n, tiles) — including n < tiles, n % tiles != 0, tiles = 1.
    Batched: all cases in one frame, one window job; the engine NTILE
    per row is selected from one ntile(t) column per distinct t."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        exact_ntile,
    )

    pairs = [
        data.draw(st.tuples(st.integers(1, 60), st.integers(1, 12)))
        for _ in range(25)
    ] + [(1, 1), (1, 12), (12, 12), (13, 12)]
    rows = [
        (cid, rn + 1, n, t)
        for cid, (n, t) in enumerate(pairs)
        for rn in range(n)
    ]
    df = spark.createDataFrame(
        rows, "case_id long, rn long, n long, tiles int"
    )
    w = Window.partitionBy("case_id").orderBy("rn")
    sel = None
    for t in sorted({t for _, t in pairs}):
        c = F.ntile(t).over(w)
        sel = (
            F.when(F.col("tiles") == t, c)
            if sel is None
            else sel.when(F.col("tiles") == t, c)
        )
    out = df.select(
        exact_ntile(F.col("rn"), F.col("n"), F.col("tiles")).alias("mine"),
        sel.alias("engine"),
    ).collect()
    assert all(r["mine"] == r["engine"] for r in out)


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_date_attributes_match_python_calendar(spark, data):
    days = [
        data.draw(
            st.dates(min_value=dt.date(2020, 1, 2), max_value=dt.date(2026, 12, 30))
        )
        for _ in range(60)
    ]
    df = spark.createDataFrame([(d,) for d in days], "date date")
    rows = with_date_attributes(df, "date").collect()
    for r in rows:
        d: dt.date = r["date"]
        iso = d.isocalendar()
        assert r["date_key"] == int(d.strftime("%Y%m%d"))
        assert r["year"] == d.year
        assert r["quarter"] == (d.month - 1) // 3 + 1
        assert r["month"] == d.month
        assert r["month_name"] == d.strftime("%B")
        assert r["day"] == d.day
        assert r["day_of_week"] == iso.weekday
        assert r["day_name"] == d.strftime("%A")
        assert r["week_of_year"] == iso.week
        assert r["is_weekend"] == (iso.weekday in (6, 7))


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_pps_boundary_selection_matches_python_scan(spark, data):
    """The PPS systematic-sampling rule (ss02) on top of the
    DISTRIBUTED prefix sum must select exactly the same ids as a pure
    sequential Python scan of the same (group, id, weight) rows — the
    property that pins operators/ranking.py's running_sum_of against
    reorderings, for arbitrary weights including zeros and
    boundary-spanning heavy items."""
    from pyspark.sql import functions as F

    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
    )

    K = 7
    rows = []
    for g in range(data.draw(st.integers(min_value=1, max_value=4))):
        n = data.draw(st.integers(min_value=1, max_value=60))
        for i in range(n):
            w = data.draw(
                st.one_of(
                    st.integers(min_value=0, max_value=9),
                    st.integers(min_value=0, max_value=500),
                )
            )
            rows.append((f"g{g}", i, w))

    # Python reference: sequential scan per group
    want: set[tuple[str, int]] = set()
    from collections import defaultdict

    per = defaultdict(list)
    for g, i, w in rows:
        per[g].append((i, w))
    for g, items in per.items():
        tot = sum(w for _, w in items)
        if tot == 0:
            continue
        run = 0
        for i, w in sorted(items):
            before, run = run, run + w
            if (before * K) // tot < (run * K) // tot:
                want.add((g, i))

    df = spark.createDataFrame(rows, ["g", "id", "w"])
    ranked = attach_global_row_number(
        df,
        order_by=[F.asc("id")],
        partition_by=["g"],
        rn_col="__rn",
        running_sum_of="w",
        running_sum_col="__run",
        partitions=5,  # force multi-partition offsets even for tiny data
    )
    tot = df.groupBy("g").agg(F.sum("w").cast("bigint").alias("__tot"))
    got = {
        (r["g"], r["id"])
        for r in ranked.join(tot, "g")
        .filter(F.col("__tot") > 0)
        .filter(
            F.expr(f"((__run - w) * {K}) div __tot < (__run * {K}) div __tot")
        )
        .collect()
    }
    assert got == want
