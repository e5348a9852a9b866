"""sf0.1 pre-bench sweep over the STAGED query surface — the dd14
lesson (SCALE.md "interpreted-lambda wall") as a recorded, repeatable
gate instead of a one-time doc event.

Every staged query must have a recorded sf0.1 wall in
``scripts/staged_sf01_walls.json`` BEFORE it can be promoted into
``queries()``; ``tests/test_staged_round7.py`` pins that precondition
(a staged entry with no recorded wall fails the suite). Run:

    python scripts/staged_sweep.py            # sweep all staged
    python scripts/staged_sweep.py tx20 ev01  # sweep by prefix

One warmed session, untimed sf0.001 compile pass per query, then a
timed sf0.1 run (best-of-N via SPARK_GRAFT_SWEEP_RUNS, default 1 —
the gate cares about order-of-magnitude escapes like dd14's 396 s,
not ±10% jitter). Results merge into the JSON (name → {sec, loadavg,
swept_at_commit}); re-sweeping a name overwrites its row.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WALLS_PATH = os.path.join(REPO, "scripts", "staged_sf01_walls.json")
SF01 = "/root/testdata/sf0.1"
SF001 = "/root/testdata/sf0.001"


def main(prefixes: list[str]) -> None:
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        ROUND7_STAGED_QUERIES,
        reset_shared_intermediates,
    )
    from local_etl_csv_to_postgresql_spark.session import get_spark

    staged = dict(ROUND7_STAGED_QUERIES)
    if prefixes:
        staged = {
            n: f
            for n, f in staged.items()
            if any(n.startswith(p) for p in prefixes)
        }
    if not staged:
        print("nothing to sweep", file=sys.stderr)
        sys.exit(1)

    walls: dict = {}
    if os.path.exists(WALLS_PATH):
        with open(WALLS_PATH) as fh:
            walls = json.load(fh)

    commit = (
        subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout.strip()
        or "unknown"
    )
    runs = int(os.environ.get("SPARK_GRAFT_SWEEP_RUNS", "1"))

    spark = get_spark("staged_sweep")
    # generic warm-up: JVM + parquet footer paths
    spark.read.parquet(f"{SF01}/lineitem.parquet").count()
    spark.range(1_000_000).agg({"id": "sum"}).collect()

    for name, fn in staged.items():
        # untimed compile pass at sf0.001 (codegen + Arrow spin-up)
        try:
            fn(spark, SF001).collect()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: COMPILE-PASS FAILED: {exc}", file=sys.stderr)
            continue
        best = None
        for _ in range(runs):
            reset_shared_intermediates()
            t0 = time.monotonic()
            fn(spark, SF01).collect()
            wall = time.monotonic() - t0
            best = wall if best is None else min(best, wall)
        walls[name] = {
            "sec": round(best, 3),
            "loadavg": round(os.getloadavg()[0], 2),
            "swept_at_commit": commit,
            "sf": 0.1,
        }
        print(f"{name}: {best:.2f} s")

    with open(WALLS_PATH, "w") as fh:
        json.dump(dict(sorted(walls.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {WALLS_PATH} ({len(walls)} recorded walls)")


if __name__ == "__main__":
    main(sys.argv[1:])
