"""Benchmark runner: executes the full query library and prints ONE
JSON line with per-query wall times.

Round-5 structure — CHUNKED FRESH-JVM PASSES. Round-4 measured that a
~260-job shared-session bench ages the JVM (whole-stage-codegen class
churn + GC pressure): whatever runs late inflates 20-30%, forced GC
does not recover it, and a fresh process returns to young numbers
(SCALE.md "shared-session aging"). Restarting the SparkSession is NOT
enough — the codegen class cache and loaded-class churn live in the
JVM, and PySpark reuses the gateway JVM across sessions. So the parent
process splits the library into bounded chunks (each well under the
~100-job aging onset, counting best-of-2), runs each chunk in its OWN
subprocess (own JVM, own untimed compile pass for exactly its
queries), and merges the per-chunk JSON. The library total is
order-independent (every query does identical work in any order), so
chunk boundaries are a legitimate measurement boundary — they change
which JVM runs a query, not what the query does.

Chunk layout: streaming + Arrow (mm*) queries share chunk 0 with the
ETL leg — these carry the largest fixed costs and are the most
aging-sensitive, so they always run in a young JVM (this is what the
round-4 "streaming-first" ordering wanted but could not get inside one
shared session). The remaining queries split evenly, in library order,
across the other chunks.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores),
     SPARK_GRAFT_BENCH_RUNS (best-of-N per query, default 2),
     SPARK_GRAFT_BENCH_COMPILE_BUDGET (sec per chunk, default 150),
     SPARK_GRAFT_BENCH_QUERY_CHUNKS (non-stream chunk count, default 3),
     SPARK_GRAFT_BENCH_ETL_ROWS (comma list of EXTRA ETL row counts,
       default "1000000" — the 1M-row leg that pins SCALE.md's linear-
       scaling claim with a driver-measured number; set "" to skip),
     SPARK_GRAFT_BENCH_OUT (long-form record path, default
       BENCH_LOCAL.json next to this file — the builder's quiet-window
       headline runs set e.g. BENCH_QUIET_r11.json so the per-round
       driver run, which always writes the default path, cannot
       overwrite the quiet evidence; r10 verdict task 4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrypoint  # noqa: E402

_CHUNK_ENV = "SPARK_GRAFT_BENCH_CHUNK"
_ETL_ENV = "SPARK_GRAFT_BENCH_DO_ETL"


def _is_streaming(name: str) -> bool:
    """st01..st99 replay queries (NOT a bare 'st0' prefix — that missed
    st10, leaving its memory-sink tables leaking and its replay timed
    in an aged JVM; round-4 advice)."""
    return name.startswith("st") and name[2:3].isdigit()


def _is_arrow(name: str) -> bool:
    return name.startswith("mm")


def run_chunk(names: list[str], do_etl: bool) -> int:
    """Worker mode: one fresh JVM, compile pass over exactly these
    queries, then best-of-N timed passes. Prints one JSON line."""
    from local_etl_csv_to_postgresql_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_start = os.getloadavg()[0]
    spark = get_spark("bench")

    # warm-up (untimed): JVM/codegen init + parquet footer reads, plus
    # one flagship run at sf0.001 to compile the common agg/decimal
    # codegen paths (different dataset than the timed queries — this
    # warms the JIT, not the data)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(1_000_000).agg({"id": "sum"}).collect()
    try:
        entrypoint.entry(spark).collect()
    except Exception:  # noqa: BLE001
        pass

    queries = {n: f for n, f in entrypoint.queries().items() if n in set(names)}

    # Untimed COMPILE PASS at sf0.001 (~100x smaller): pays each plan's
    # one-time costs — whole-stage codegen compilation, Arrow/pandas
    # worker spin-up, Structured Streaming machinery + state-worker
    # init — so the timed passes measure steady-state execution, the
    # same thing the reference's baseline measures against a warmed
    # PostgreSQL. Data-dependent work at sf0.1 is untouched.
    tiny = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(tiny):
        getattr(entrypoint, "reset_shared_intermediates", lambda: None)()
        compile_budget = float(
            os.environ.get("SPARK_GRAFT_BENCH_COMPILE_BUDGET", "150")
        )
        t_compile = time.time()
        # streaming then Arrow-path queries first: both carry the
        # largest one-time worker spin-up costs
        ordered = sorted(
            queries, key=lambda n: (not _is_streaming(n), not _is_arrow(n), n)
        )
        for name in ordered:
            if time.time() - t_compile > compile_budget:
                break
            try:
                queries[name](spark, tiny).collect()
            except Exception:  # noqa: BLE001
                pass
            spark.catalog.clearCache()
            _drop_stream_views(spark, name)

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}

    # ETL leg (BASELINE.md workload = query set + the pipeline run):
    # rows scale with sf — the reference's 10k-row baseline is sf0.01.
    # Runs BEFORE the query loop, in this chunk's young JVM, after its
    # own untimed 1/100-scale warm-up run (the reference baseline
    # likewise measures a warmed PostgreSQL). Extra legs from
    # SPARK_GRAFT_BENCH_ETL_ROWS (default: one 1M-row leg) share the
    # same warm-up and pin the linear-scaling claim.
    etl: dict = {}
    etl_extra: list[dict] = []
    if do_etl:
        try:
            import shutil
            import tempfile

            from local_etl_csv_to_postgresql_spark.config import (
                EngineConfig,
                WarehouseConfig,
            )
            from local_etl_csv_to_postgresql_spark.pipeline import (
                run_etl_pipeline,
            )
            from local_etl_csv_to_postgresql_spark.sources.generator import (
                generate_transactions,
                write_transactions_csv,
            )

            n_rows = max(1_000, int(float(sf) * 1_000_000))
            extra_rows = [
                int(r)
                for r in os.environ.get(
                    "SPARK_GRAFT_BENCH_ETL_ROWS", "1000000"
                ).split(",")
                if r.strip()
            ]
            work = tempfile.mkdtemp(prefix="bench_etl_")
            warm_rows = max(100, n_rows // 100)
            write_transactions_csv(
                f"{work}/warm.csv", generate_transactions(warm_rows, 100, 2)
            )
            run_etl_pipeline(
                spark,
                f"{work}/warm.csv",
                EngineConfig(
                    warehouse=WarehouseConfig(path=f"{work}/wh_warm")
                ),
            )
            # best-of-N, same convention as the query legs below: each
            # pass loads into a FRESH warehouse (identical work every
            # time — only JVM JIT state is warm, which is what the
            # 1/100 warm-up above is too small to trigger: a same-scale
            # r6 A/B measured 7.90 s first pass vs 4.94 s second, all
            # of it C2-compilation of the transform/load codegen). The
            # reference baseline likewise measures a warmed PostgreSQL.
            etl_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
            for i, rows in enumerate([n_rows] + extra_rows):
                write_transactions_csv(
                    f"{work}/tx{i}.csv", generate_transactions(rows, 100, 2)
                )
                rec = None
                for r in range(etl_runs):
                    cfg = EngineConfig(
                        warehouse=WarehouseConfig(path=f"{work}/wh{i}_{r}")
                    )
                    t0 = time.time()
                    res = run_etl_pipeline(spark, f"{work}/tx{i}.csv", cfg)
                    sec = round(time.time() - t0, 3)
                    if rec is None or sec < rec["sec"]:
                        rec = {
                            "rows": rows,
                            "sec": sec,
                            "loaded": res.loaded_rows,
                            "phases": {
                                k: round(v, 2)
                                for k, v in res.phase_times.items()
                            },
                        }
                if i == 0:
                    etl = rec
                else:
                    etl_extra.append(rec)
            shutil.rmtree(work, ignore_errors=True)
        except Exception as e:  # noqa: BLE001
            failures["__etl__"] = str(e).split("\n")[0][:200]

    # Timed order within the chunk: streaming replays first (youngest
    # JVM state), then Arrow-path, then the rest in library order.
    ordered = sorted(
        queries, key=lambda n: (not _is_streaming(n), not _is_arrow(n))
    )
    queries = {n: queries[n] for n in ordered}

    # best-of-N per query: single-shot wall times on a shared host can
    # inflate 2-3x from transient contention; the min of N runs is the
    # standard noise-robust estimate.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    prefixes = {n.split("_", 1)[0] for n in queries}
    for _ in range(runs):
        # each pass pays one-time materialized intermediates (near-dup
        # cluster labels) exactly once; in-pass reuse is the measured
        # architecture, cross-pass reuse would hide the build cost.
        getattr(entrypoint, "reset_shared_intermediates", lambda: None)()
        # Pre-build the shared bases as their OWN timed pseudo-entries
        # ("lshbase"/"ccbase") so family members report steady-state
        # walls instead of whichever runs first absorbing the build
        # (r6: dd06 looked 2.3x slower purely from window order —
        # "carrier-slot" accounting, SCALE.md). The family+base total
        # is unchanged; attribution is now per-component.
        try:
            from local_etl_csv_to_postgresql_spark.functions import (
                entrypoints as _ep,
            )

            if prefixes & _SHARED_BASE_PREFIXES:
                t0 = time.time()
                _ep._lsh_base(spark, sf_dir)
                dt = round(time.time() - t0, 3)
                timings["lshbase"] = min(timings.get("lshbase", dt), dt)
            if prefixes & _CC_PREFIXES:
                t0 = time.time()
                _ep._neardup_components(spark, sf_dir)
                dt = round(time.time() - t0, 3)
                timings["ccbase"] = min(timings.get("ccbase", dt), dt)
            if "bj01" in prefixes:
                # the bucketed-layout write (one-time shuffle) as its
                # own slot so bj01 times the steady-state exchange-free
                # join — the regression surface worth tracking (r7
                # verdict task 8)
                t0 = time.time()
                _ep._bj01_layout(spark, sf_dir)
                dt = round(time.time() - t0, 3)
                timings["bjbase"] = min(timings.get("bjbase", dt), dt)
        except Exception as e:  # noqa: BLE001
            failures["__shared_base__"] = str(e).split("\n")[0][:200]
        for name, fn in queries.items():
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.collect()
                dt = round(time.time() - t0, 3)
                timings[name] = min(timings.get(name, dt), dt)
            except Exception as e:  # noqa: BLE001
                failures[name] = str(e).split("\n")[0][:200]
            # drop state a query may leak (persisted frames, streaming
            # memory-sink tables) so later timings don't pay for it
            spark.catalog.clearCache()
            _drop_stream_views(spark, name)

    out = {
        "queries": timings,
        "etl": etl,
        "etl_extra": etl_extra,
        "failures": failures,
        "sf": sf,
        "runs": runs,
        # 1-min loadavg at chunk start/end: every timing attributes to
        # the load IT ran under, not the run-level envelope (r7 verdict
        # task 4 — the +18% uniform drift needed per-chunk attribution)
        "loadavg": [round(load_start, 2), round(os.getloadavg()[0], 2)],
    }
    spark.stop()
    # JSON is the FINAL stdout line, emitted after spark.stop() so no
    # late JVM chatter can displace it
    print(json.dumps(out, separators=(",", ":")), flush=True)
    return 0


def _drop_stream_views(spark, name: str) -> None:
    if not _is_streaming(name):
        return
    for t in spark.catalog.listTables():
        if t.isTemporary and (
            t.name.startswith("stateful_sessions_")
            or t.name.startswith("stream_dedup_")
            or t.name.startswith("stream_quota_")
            or t.name.startswith("stream_enrich_")
            or t.name.startswith("stream_late_")
            or t.name.startswith("stream_ssjoin_")
            or t.name.startswith("stream_sesswin_")
        ):
            spark.catalog.dropTempView(t.name)


# Consumers of the shared materialized LSH base / cluster labels
# (functions/entrypoints._lsh_base and _neardup_components): the base
# builds once per process per pass, so splitting this family across
# chunks rebuilds it in each (measured: dd02 0.5 s co-located vs 3.4 s
# paying its own build in a split chunk).
_SHARED_BASE_PREFIXES = {
    "dd02", "dd03", "dd06", "dd07", "dd08", "dd09", "dd10",
    "dd11", "dd18", "dd20", "dd21", "gr01", "gr02", "gr03", "ct03", "cur01", "cur03",
    "inc01", "tc01", "ln01",
}

# The subset that additionally consumes the materialized near-dup
# cluster labels (_neardup_components — the CC fixpoint on top of the
# LSH base).
_CC_PREFIXES = {"dd06", "dd07", "dd20", "cur01", "cur03"}


def plan_chunks(
    all_names: list[str], n_chunks: int
) -> list[tuple[list[str], bool]]:
    """Chunk layout for the parent process: chunk 0 = the ETL legs
    ALONE in their own fresh JVM; chunk 1 = streaming queries ALONE
    (largest fixed costs, most aging-sensitive — always a young JVM
    with NOTHING before them: the r6 best-of-2 ETL change doubled the
    pipeline runs, and when they shared the streaming chunk the extra
    codegen churn aged st03 4.8 → 8.3 s before its first micro-batch;
    r6 then measured st09/st10 drifting +40/+28% co-located with the
    Arrow queries, so those moved to their own chunk too — r6 verdict
    task 3); chunk 2 = Arrow-path (mm*) queries; the rest splits
    evenly in library order with the shared-LSH-base family pulled to
    the front of the first query chunk so its one-time build is paid
    once per pass, not per chunk. Chunk count auto-scales so no query
    chunk exceeds ~45 queries (the ~100-job aging onset at best-of-2,
    with headroom for the per-pass shared-base pre-builds)."""
    streaming = [n for n in all_names if _is_streaming(n)]
    arrow = [n for n in all_names if _is_arrow(n)]
    rest = [
        n for n in all_names if not (_is_streaming(n) or _is_arrow(n))
    ]
    shared = [
        n for n in rest if n.split("_", 1)[0] in _SHARED_BASE_PREFIXES
    ]
    rest = shared + [n for n in rest if n not in set(shared)]
    n_chunks = max(n_chunks, -(-len(rest) // 45)) if rest else n_chunks
    size = (len(rest) + n_chunks - 1) // n_chunks if rest else 1
    # never split the co-located family: a chunk count high enough to
    # make chunks smaller than the family would rebuild the LSH base
    # per chunk — the exact inflation this layout exists to prevent
    size = max(size, len(shared))
    chunks: list[tuple[list[str], bool]] = [
        ([], True),
        (streaming, False),
        (arrow, False),
    ]
    for i in range(0, len(rest), size):
        chunks.append((rest[i : i + size], False))
    return chunks


def record_path() -> str:
    """Where the long-form record lands: SPARK_GRAFT_BENCH_OUT if set
    (quiet-window headline runs commit under e.g. BENCH_QUIET_r11.json
    so the driver's default-path run cannot overwrite the evidence —
    r10 verdict task 4), else BENCH_LOCAL.json next to this file."""
    return os.environ.get("SPARK_GRAFT_BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )


def main() -> int:
    chunk_spec = os.environ.get(_CHUNK_ENV)
    if chunk_spec is not None:
        return run_chunk(
            [n for n in chunk_spec.split(",") if n],
            os.environ.get(_ETL_ENV) == "1",
        )

    # Parent mode: split the library into chunks, one fresh JVM each
    # (serialized — two local[32] JVMs fighting over the cores inflates
    # every timing), merge the chunk records into the contract line.
    all_names = list(entrypoint.queries())
    n_chunks = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_CHUNKS", "3")))
    chunks = plan_chunks(all_names, n_chunks)

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    etl: dict = {}
    etl_extra: list[dict] = []
    chunk_walls: list[float] = []
    chunk_loads: list = []
    sf = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ).rstrip("/").rsplit("sf", 1)[-1]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    compile_budget = float(
        os.environ.get("SPARK_GRAFT_BENCH_COMPILE_BUDGET", "150")
    )
    # Provenance: SCALE.md's load study measured a ±18% co-tenant
    # envelope on this host — a bench number without the loadavg it ran
    # under cannot be attributed (r5 verdict, ETL-drift finding).
    load_before = os.getloadavg()
    for names, do_etl in chunks:
        # an empty chunk still runs if it carries the ETL legs (the
        # fixed-cost chunk can be empty when no streaming/mm queries
        # are in the library — the ETL record must not silently vanish)
        if not names and not do_etl:
            continue
        env = dict(os.environ)
        env[_CHUNK_ENV] = ",".join(names)
        env[_ETL_ENV] = "1" if do_etl else "0"
        # Per-chunk timeout (r5 advice: one hung chunk JVM must not
        # stall the bench forever with no contract line): the chunk's
        # compile budget, plus best-of-N timed passes at a generous
        # per-query allowance, plus fixed JVM/ETL/streaming spin-up.
        chunk_timeout = compile_budget + 30.0 * runs * max(1, len(names)) + (
            600.0 if do_etl else 120.0
        )
        t_chunk = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=chunk_timeout,
            )
        except subprocess.TimeoutExpired:
            chunk_walls.append(round(time.time() - t_chunk, 1))
            chunk_loads.append(None)
            failures["__chunk__" + (names[0] if names else "etl")] = (
                f"timeout after {chunk_timeout:.0f}s "
                f"({len(names)} queries, etl={do_etl})"
            )
            continue
        chunk_walls.append(round(time.time() - t_chunk, 1))
        rec = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                parsed = json.loads(line)
                if isinstance(parsed, dict):  # stray scalar lines parse too
                    rec = parsed
                    break
            except json.JSONDecodeError:
                continue
        if rec is None:
            failures["__chunk__" + (names[0] if names else "etl")] = (
                f"rc={proc.returncode} no JSON; stderr tail: "
                + proc.stderr.strip()[-160:]
            )
            chunk_loads.append(None)
            continue
        timings.update(rec.get("queries", {}))
        failures.update(rec.get("failures", {}))
        etl = rec.get("etl") or etl
        etl_extra.extend(rec.get("etl_extra", []))
        chunk_loads.append(rec.get("loadavg"))
    load_after = os.getloadavg()

    total = round(sum(timings.values()), 3)

    # The driver captures the LAST 2000 chars of stdout; r6's contract
    # line overran that and lost its HEAD (metric/value/st* timings,
    # "parsed": null — r6 verdict task 4). So the line is SIZED to the
    # capture: compact separators, failures capped — and if the queries
    # map does not fit, the SMALLEST non-streaming timings are dropped
    # from the line (never the streaming set or the total). Keys are
    # FULL registry names (r8 verdict task 5: one key scheme across
    # BENCH_rNN.json and BENCH_LOCAL.json — the short-prefix scheme made
    # cross-referencing artifacts error-prone); what the budget drops is
    # recoverable from BENCH_LOCAL.json, which always carries the
    # complete long-form record (every timing, phases, chunk walls).
    out = {
        "metric": "query_library_total_wall_seconds",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "queries": dict(timings),
        "detail": "BENCH_LOCAL.json",
        "etl": {k: etl[k] for k in ("rows", "sec", "loaded") if k in etl},
        "runs": runs,
        "sf": sf,
        # 1-min loadavg before/after — the attribution key for any
        # round-over-round drift (±18% co-tenant envelope, SCALE.md);
        # per-chunk [start, end] pairs attribute drift to the chunk it
        # hit (r7 verdict task 4)
        "loadavg": [round(load_before[0], 2), round(load_after[0], 2)],
        "chunk_loadavg": chunk_loads,
    }
    if etl_extra:
        out["etl_extra"] = [
            {k: r[k] for k in ("rows", "sec", "loaded") if k in r}
            for r in etl_extra
        ]
    if failures:
        out["failures"] = {
            name: msg[:80] for name, msg in failures.items()
        }
    _LINE_BUDGET = 1900  # headroom under the 2000-char tail capture
    while (
        len(json.dumps(out, separators=(",", ":"))) > _LINE_BUDGET
        and out["queries"]
    ):
        droppable = [k for k in out["queries"] if not _is_streaming(k)]
        if not droppable:
            break
        out["queries"].pop(min(droppable, key=out["queries"].get))
    full = dict(
        out,
        queries=timings,
        etl=etl,
        etl_extra=etl_extra,
        failures=failures or None,
        chunks=[len(c[0]) for c in chunks],
        chunk_wall_sec=chunk_walls,
        chunk_loadavg=chunk_loads,
        loadavg_full=[list(load_before), list(load_after)],
    )
    try:
        with open(record_path(), "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass
    print(json.dumps(out, separators=(",", ":")), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
