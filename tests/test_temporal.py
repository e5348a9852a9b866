"""Edge-case semantics of the temporal joins (operators/temporal.py):
inclusive as-of ties, deterministic tiebreaks, tolerance windows, and
the range join's zero-count anchors and bin-boundary handling."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from local_etl_csv_to_postgresql_spark.operators.temporal import (
    asof_join,
    range_join_count,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _frame(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_matches_latest_at_or_before(spark):
    left = _frame(
        spark,
        [(1, 10, ts("2024-01-01 00:01:00")), (2, 10, ts("2024-01-01 00:05:00"))],
        ["id", "k", "ts"],
    )
    right = _frame(
        spark,
        [
            (100, 10, ts("2024-01-01 00:00:30")),
            (101, 10, ts("2024-01-01 00:02:00")),
        ],
        ["rid", "k", "ts"],
    )
    out = {
        r["id"]: r["asof_rid"]
        for r in asof_join(
            left, right, on=["k"], right_cols=["rid"], tiebreak="rid"
        ).collect()
    }
    assert out == {1: 100, 2: 101}


def test_asof_tie_is_inclusive_and_tiebreak_deterministic(spark):
    t = ts("2024-01-01 00:01:00")
    left = _frame(spark, [(1, 10, t)], ["id", "k", "ts"])
    # two right rows at EXACTLY the left timestamp: both eligible
    # (inclusive), greatest tiebreak wins
    right = _frame(spark, [(7, 10, t), (9, 10, t)], ["rid", "k", "ts"])
    rows = asof_join(
        left, right, on=["k"], right_cols=["rid"], tiebreak="rid"
    ).collect()
    assert rows[0]["asof_rid"] == 9


def test_asof_no_match_yields_nulls(spark):
    left = _frame(spark, [(1, 10, ts("2024-01-01 00:00:00"))], ["id", "k", "ts"])
    right = _frame(
        spark, [(7, 10, ts("2024-01-01 00:00:01"))], ["rid", "k", "ts"]
    )
    rows = asof_join(
        left, right, on=["k"], right_cols=["rid"], tiebreak="rid"
    ).collect()
    assert rows[0]["asof_rid"] is None and rows[0]["asof_ts"] is None


def test_asof_key_isolation(spark):
    t = ts("2024-01-01 00:05:00")
    left = _frame(spark, [(1, 10, t)], ["id", "k", "ts"])
    right = _frame(
        spark, [(7, 99, ts("2024-01-01 00:00:00"))], ["rid", "k", "ts"]
    )
    rows = asof_join(
        left, right, on=["k"], right_cols=["rid"], tiebreak="rid"
    ).collect()
    assert rows[0]["asof_rid"] is None


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _frame(spark, [(1, 10, ts("2024-01-01 00:10:00"))], ["id", "k", "ts"])
    right = _frame(
        spark, [(7, 10, ts("2024-01-01 00:00:00"))], ["rid", "k", "ts"]
    )
    stale = asof_join(
        left, right, on=["k"], right_cols=["rid"], tiebreak="rid",
        tolerance_seconds=60,
    ).collect()
    assert stale[0]["asof_rid"] is None
    fresh = asof_join(
        left, right, on=["k"], right_cols=["rid"], tiebreak="rid",
        tolerance_seconds=600,
    ).collect()
    assert fresh[0]["asof_rid"] == 7


def test_range_join_counts_and_bounds(spark):
    # anchor window = [anchor-60, anchor): the -60 edge is included,
    # the anchor instant itself is not
    anchor_t = ts("2024-01-01 00:02:00")
    anchors = _frame(spark, [(1, 10, anchor_t)], ["aid", "k", "ts"])
    points = _frame(
        spark,
        [
            (10, ts("2024-01-01 00:01:00")),  # exactly lower bound: in
            (10, ts("2024-01-01 00:01:30")),  # inside
            (10, ts("2024-01-01 00:02:00")),  # exactly upper bound: out
            (10, ts("2024-01-01 00:00:59")),  # just before window: out
            (99, ts("2024-01-01 00:01:30")),  # other key: out
        ],
        ["k", "ts"],
    )
    counted, _ = range_join_count(
        points, anchors, on=["k"], point_ts="ts", anchor_ts="ts",
        lower_seconds=-60, upper_seconds=0,
    )
    assert counted.collect()[0]["n_in_range"] == 2


def test_range_join_keeps_zero_count_anchors(spark):
    # every candidate point shares the anchor's bin but misses the
    # window — the anchor must still come back with count 0
    anchors = _frame(
        spark, [(1, 10, ts("2024-01-01 00:02:00"))], ["aid", "k", "ts"]
    )
    points = _frame(
        spark, [(10, ts("2024-01-01 00:02:30"))], ["k", "ts"]
    )
    counted, _ = range_join_count(
        points, anchors, on=["k"], point_ts="ts", anchor_ts="ts",
        lower_seconds=-60, upper_seconds=0,
    )
    rows = counted.collect()
    assert len(rows) == 1 and rows[0]["n_in_range"] == 0


def test_range_join_crosses_bin_boundary(spark):
    # point sits in the bin BEFORE the anchor's own bin; the exploded
    # bin list must still reach it
    anchors = _frame(
        spark, [(1, 10, ts("2024-01-01 00:02:05"))], ["aid", "k", "ts"]
    )
    points = _frame(
        spark, [(10, ts("2024-01-01 00:01:10"))], ["k", "ts"]
    )
    counted, _ = range_join_count(
        points, anchors, on=["k"], point_ts="ts", anchor_ts="ts",
        lower_seconds=-60, upper_seconds=0,
    )
    assert counted.collect()[0]["n_in_range"] == 1


def test_range_join_forward_window(spark):
    # positive look-ahead window [t, t+120)
    anchors = _frame(
        spark, [(1, 10, ts("2024-01-01 00:00:00"))], ["aid", "k", "ts"]
    )
    points = _frame(
        spark,
        [
            (10, ts("2024-01-01 00:00:00")),  # at anchor: in
            (10, ts("2024-01-01 00:01:59")),  # in
            (10, ts("2024-01-01 00:02:00")),  # upper edge: out
        ],
        ["k", "ts"],
    )
    counted, _ = range_join_count(
        points, anchors, on=["k"], point_ts="ts", anchor_ts="ts",
        lower_seconds=0, upper_seconds=120,
    )
    assert counted.collect()[0]["n_in_range"] == 2


# --- property check vs pandas merge_asof (the public reference
# implementation of backward as-of semantics) ------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=3, deadline=None)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3600)),
        min_size=1, max_size=40,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3600)),
        min_size=1, max_size=40,
    ),
    tol=st.one_of(st.none(), st.integers(1, 900)),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right, tol):
    """asof_join == pandas.merge_asof(by=key, direction='backward',
    tolerance) for arbitrary key/timestamp multisets, including ties
    (pandas keeps the last right row in sort order; ours keeps the
    greatest tiebreak — aligned by sorting right on (ts, rid))."""
    import datetime as dt

    import pandas as pd

    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)
    ]
    rrows = [
        (100 + i, k, base + dt.timedelta(seconds=s))
        for i, (k, s) in enumerate(right)
    ]
    ldf = spark.createDataFrame(lrows, ["lid", "k", "ts"])
    rdf = spark.createDataFrame(rrows, ["rid", "k", "ts"])
    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            ldf, rdf, on=["k"], right_cols=["rid"], tiebreak="rid",
            tolerance_seconds=tol,
        ).collect()
    }

    lpd = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(rrows, columns=["rid", "k", "ts"]).sort_values(
        ["ts", "rid"], kind="stable"
    )
    merged = pd.merge_asof(
        lpd, rpd, on="ts", by="k", direction="backward",
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == want


@settings(max_examples=3, deadline=None)
@given(
    points=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 600)),
        min_size=1, max_size=40,
    ),
    anchors=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 600)),
        min_size=1, max_size=20,
    ),
    lo=st.integers(-300, 0),
    span=st.integers(1, 400),
    bin_s=st.one_of(st.none(), st.integers(7, 500)),
)
def test_range_join_count_matches_bruteforce(spark, points, anchors, lo, span, bin_s):
    """Bin-bucketed range counts == the O(n*m) brute force for arbitrary
    windows (negative lower bounds, bins smaller/larger than the span,
    anchors with zero matches kept at count 0)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    hi = lo + span
    prows = [
        (k, base + dt.timedelta(seconds=s)) for k, s in points
    ]
    arows = [
        (i, k, base + dt.timedelta(seconds=s))
        for i, (k, s) in enumerate(anchors)
    ]
    pdf = spark.createDataFrame(prows, ["k", "ts"])
    adf = spark.createDataFrame(arows, ["aid", "k", "ts"])
    counted, _ = range_join_count(
        pdf, adf, on=["k"], point_ts="ts", anchor_ts="ts",
        lower_seconds=lo, upper_seconds=hi, bin_seconds=bin_s,
    )
    got = {r["aid"]: r["n_in_range"] for r in counted.collect()}
    want = {
        aid: sum(
            1 for pk, ps in points
            if pk == ak and (s + lo) <= ps < (s + hi)
        )
        for aid, (ak, s) in enumerate(anchors)
    }
    assert got == want


def test_asof_forward_matches_earliest_at_or_after(spark):
    left = _frame(
        spark,
        [(1, 10, ts("2024-01-01 00:01:00")), (2, 10, ts("2024-01-01 00:05:00"))],
        ["id", "k", "ts"],
    )
    right = _frame(
        spark,
        [
            (100, 10, ts("2024-01-01 00:01:00")),  # tie: inclusive
            (101, 10, ts("2024-01-01 00:06:00")),
        ],
        ["rid", "k", "ts"],
    )
    out = {
        r["id"]: r["asof_rid"]
        for r in asof_join(
            left, right, on=["k"], right_cols=["rid"], tiebreak="rid",
            direction="forward",
        ).collect()
    }
    assert out == {1: 100, 2: 101}


def test_asof_forward_tolerance_nulls_far_matches(spark):
    left = _frame(spark, [(1, 10, ts("2024-01-01 00:00:00"))], ["id", "k", "ts"])
    right = _frame(
        spark, [(100, 10, ts("2024-01-01 00:10:01"))], ["rid", "k", "ts"]
    )
    row = asof_join(
        left, right, on=["k"], right_cols=["rid"], tiebreak="rid",
        tolerance_seconds=600, direction="forward",
    ).collect()[0]
    assert row["asof_rid"] is None


def test_asof_direction_validated(spark):
    import pytest

    df = _frame(spark, [(1, 10, ts("2024-01-01 00:00:00"))], ["id", "k", "ts"])
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(df, df, on=["k"], direction="sideways")


@settings(max_examples=3, deadline=None)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3600)),
        min_size=1, max_size=40,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3600)),
        min_size=1, max_size=40,
    ),
    tol=st.one_of(st.none(), st.integers(1, 900)),
)
def test_asof_forward_matches_pandas_merge_asof(spark, left, right, tol):
    """direction='forward' == pandas.merge_asof(direction='forward'):
    pandas keeps the first right row in (ts, rid) sort order, ours the
    smallest tiebreak at the earliest qualifying timestamp."""
    import datetime as dt

    import pandas as pd

    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)
    ]
    rrows = [
        (100 + i, k, base + dt.timedelta(seconds=s))
        for i, (k, s) in enumerate(right)
    ]
    ldf = spark.createDataFrame(lrows, ["lid", "k", "ts"])
    rdf = spark.createDataFrame(rrows, ["rid", "k", "ts"])
    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            ldf, rdf, on=["k"], right_cols=["rid"], tiebreak="rid",
            tolerance_seconds=tol, direction="forward",
        ).collect()
    }

    lpd = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(rrows, columns=["rid", "k", "ts"]).sort_values(
        ["ts", "rid"], kind="stable"
    )
    merged = pd.merge_asof(
        lpd, rpd, on="ts", by="k", direction="forward",
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == want
