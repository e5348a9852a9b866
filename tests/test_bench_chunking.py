"""bench.py chunk planning: pure-Python invariants (no Spark).

The measured failure modes these pin: st10 missed by a bare 'st0'
prefix (round-4 advice), the shared-LSH-base family split across
chunks rebuilding its materialized base per chunk (dd02 0.5 s
co-located vs 3.4 s split, round 5), streaming replays drifting
+40/+28% when co-located with the Arrow queries (round 6), and the
contract line overrunning the driver's 2000-char tail capture
(round 6 "parsed": null)."""

from __future__ import annotations

import json

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
    # chunk 0 = ETL alone; chunk 1 = streaming ALONE (r6 verdict task
    # 3: st09/st10 drifted under co-located Arrow load); chunk 2 = mm*
    assert chunks[0][1] is True and chunks[0][0] == []
    assert all(not do_etl for _, do_etl in chunks[1:])
    assert chunks[1][0] and all(bench._is_streaming(n) for n in chunks[1][0])
    assert all(bench._is_arrow(n) for n in chunks[2][0])
    assert all(
        not (bench._is_streaming(n) or bench._is_arrow(n))
        for c, _ in chunks[3:]
        for n in c
    )
    # the shared-LSH-base family is co-located in ONE chunk
    fam = {
        n for n in names
        if n.split("_", 1)[0] in bench._SHARED_BASE_PREFIXES
    }
    holding = [i for i, (c, _) in enumerate(chunks) if fam & set(c)]
    assert len(holding) == 1, holding
    # query chunks stay bounded (aging onset ~100 jobs at best-of-2);
    # the planner auto-scales the chunk count as the library grows
    assert all(len(c) <= 50 for c, _ in chunks[1:])


def test_shared_base_prefixes_cover_all_consumers():
    """Every public query that calls a shared-base helper must be in
    _SHARED_BASE_PREFIXES, or splitting it into another chunk silently
    rebuilds the materialized base there (the round-5 inflation)."""
    import re

    src = open(
        "local_etl_csv_to_postgresql_spark/functions/entrypoints.py"
    ).read()
    helpers = (
        "_lsh_base(", "_neardup_components(", "_neardup_good_edges(",
    )
    for block in re.split(r"\ndef ", src):
        name = block.split("(")[0].strip()
        if name.startswith("_") or not re.match(r"\w+$", name):
            continue
        if any(h in block for h in helpers):
            prefix = name.split("_", 1)[0]
            assert prefix in bench._SHARED_BASE_PREFIXES, name


def test_contract_line_fits_driver_tail_capture():
    """The r6 contract line overran the driver's 2000-char stdout tail
    capture and lost its head. Rebuild the exact line main() would
    emit for a library-sized timing map and assert it fits."""
    import __spark_entry__ as ep

    names = list(ep.queries())
    timings = {n: 123.456 for n in names}
    out = {
        "metric": "query_library_total_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "n_queries": len(timings),
        # full registry names — the r8 verdict's task 5 key scheme
        "queries": dict(timings),
        "detail": "BENCH_LOCAL.json",
        "etl": {"rows": 100000, "sec": 4.84, "loaded": 99990},
        "etl_extra": [{"rows": 1000000, "sec": 4.99, "loaded": 999896}],
        "runs": 2,
        "sf": "0.1",
        "loadavg": [3.01, 2.19],
    }
    while (
        len(json.dumps(out, separators=(",", ":"))) > 1900
        and out["queries"]
    ):
        droppable = [k for k in out["queries"] if not bench._is_streaming(k)]
        if not droppable:
            break
        out["queries"].pop(min(droppable, key=out["queries"].get))
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= 1900
    # the streaming set always survives the trim
    assert all(
        k in out["queries"] for k in timings if bench._is_streaming(k)
    )
    # the line parses standalone (what the driver does with the tail)
    assert json.loads(line)["metric"] == "query_library_total_wall_seconds"


def test_record_path_honors_bench_out_env(monkeypatch):
    """The quiet-headline convention (r10 verdict task 4): with
    SPARK_GRAFT_BENCH_OUT set the long-form record lands there; unset,
    it falls back to BENCH_LOCAL.json next to bench.py — so a driver
    run (which never sets the var) can no longer overwrite a committed
    quiet-run artifact."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", "/tmp/q.json")
    assert bench.record_path() == "/tmp/q.json"
    monkeypatch.delenv("SPARK_GRAFT_BENCH_OUT")
    assert bench.record_path().endswith("BENCH_LOCAL.json")
