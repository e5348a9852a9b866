"""In-bench A/B runner — the round-14 keep/revert gate (VERDICT r13
task 2: decisions must come from the BENCH CONTRACT, i.e. a chunked
fresh-JVM bench.py pass over the touched queries, not from isolated
profile_query.py floors, which systematically disagreed with bench
context in r13).

Runs bench.py in its chunk-worker mode (same compile pass, same
best-of-N timing loop, same fresh JVM the real bench uses) over a fixed
query list, N times, and reports the per-query MIN across chunk runs
plus every raw sample. Before/after pairs run the same list at matched
(quiet) load on the same day; the comparison is valid because chunk
composition — which fixes JVM aging per chunk — is identical on both
sides.

Usage:
  python scripts/ab_bench.py LABEL q1,q2,... [n_chunk_runs]

Appends one JSON line per invocation to plans/r14/ab_runs.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_chunk(names: list[str], runs: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_CHUNK"] = ",".join(names)
    env["SPARK_GRAFT_BENCH_DO_ETL"] = "0"
    env.setdefault("SPARK_GRAFT_BENCH_RUNS", str(runs))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
            if isinstance(rec, dict):
                return rec
        except json.JSONDecodeError:
            continue
    raise RuntimeError(
        f"chunk produced no JSON (rc={proc.returncode}): "
        + proc.stderr.strip()[-400:]
    )


def main() -> int:
    label = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    n_chunk_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    runs_per_chunk = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

    samples: dict[str, list[float]] = {}
    loads = []
    for i in range(n_chunk_runs):
        t0 = time.time()
        rec = run_chunk(names, runs_per_chunk)
        loads.append(rec.get("loadavg"))
        for q, s in rec.get("queries", {}).items():
            samples.setdefault(q, []).append(s)
        if rec.get("failures"):
            print(f"FAILURES in chunk run {i}: {rec['failures']}")
        print(
            f"  chunk run {i}: wall {time.time() - t0:.0f}s "
            f"load {rec.get('loadavg')}"
        )
    out = {
        "label": label,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "n_chunk_runs": n_chunk_runs,
        "runs_per_chunk": runs_per_chunk,
        "loadavg": loads,
        "min": {q: min(v) for q, v in sorted(samples.items())},
        "samples": {q: v for q, v in sorted(samples.items())},
    }
    path = os.path.join(REPO, "plans", "r14", "ab_runs.jsonl")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(out, separators=(",", ":")) + "\n")
    print(json.dumps(out["min"], indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
