"""bench.py chunk planning: pure-Python invariants (no Spark).

The measured failure modes these pin: st10 missed by a bare 'st0'
prefix (round-4 advice), and the shared-LSH-base family split across
chunks rebuilding its materialized base per chunk (dd02 0.5 s
co-located vs 3.4 s split, round 5)."""

from __future__ import annotations

import bench


def test_streaming_predicate_covers_two_digit_ids():
    assert bench._is_streaming("st01_tumbling_rollup")
    assert bench._is_streaming("st10_session_window_stream")
    assert not bench._is_streaming("std02_title_adversarial")
    assert not bench._is_streaming("stats_whatever")


def test_plan_chunks_invariants():
    import __spark_entry__ as ep

    names = list(ep.queries())
    chunks = bench.plan_chunks(names, 3)
    # partition: every query exactly once
    flat = [n for c, _ in chunks for n in c]
    assert sorted(flat) == sorted(names)
    # only chunk 0 runs the ETL legs, and it holds all streaming+mm
    assert chunks[0][1] is True
    assert all(not do_etl for _, do_etl in chunks[1:])
    assert all(
        bench._is_streaming(n) or bench._is_arrow(n) for n in chunks[0][0]
    )
    # the shared-LSH-base family is co-located in ONE chunk
    fam = {
        n for n in names
        if n.split("_", 1)[0] in bench._SHARED_BASE_PREFIXES
    }
    holding = [i for i, (c, _) in enumerate(chunks) if fam & set(c)]
    assert len(holding) == 1, holding
    # query chunks stay bounded (aging onset ~100 jobs at best-of-2)
    assert all(len(c) <= 50 for c, _ in chunks[1:])
