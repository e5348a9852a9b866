"""Isolated per-query profiler for the optimization rounds (guide §1).

Usage: python scripts/profile_query.py [--sf DIR] [--runs N]
           [--plan-dir plans/r13] [--suffix before] name [name ...]

For each named query: one untimed warm-up at sf0.001 (codegen/JIT), then
``--runs`` timed executions at the bench scale with BOTH actions —
``collect()`` (the bench's timed action) and the noop sink (computation
only, guide §1.4) — reporting the min. Also writes
``<plan-dir>/<name>_<suffix>.txt`` with the ``explain("formatted")``
physical plan so plan claims are checkable without running Spark.

Shared intermediates are reset first so every profiled query pays its
own build, mirroring one bench pass.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrypoint  # noqa: E402
from local_etl_csv_to_postgresql_spark.session import get_spark  # noqa: E402



def _prebuild(spark, sf):
    from local_etl_csv_to_postgresql_spark.functions import entrypoints as ep

    ep._lsh_base(spark, sf)
    ep._neardup_components(spark, sf)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument(
        "--prebuild",
        action="store_true",
        help="build the shared LSH/CC bases untimed before each timed "
        "run (bench attributes them to their own lshbase/ccbase slots)",
    )
    args = ap.parse_args()

    spark = get_spark("profile")
    qs = entrypoint.queries()
    tiny = os.path.join(os.path.dirname(args.sf.rstrip("/")), "sf0.001")

    # session warm-up (same as bench.py)
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    spark.range(1_000_000).agg({"id": "sum"}).collect()
    try:
        entrypoint.entry(spark).collect()
    except Exception:  # noqa: BLE001
        pass

    out = {}
    for name in args.names:
        fn = qs[name]
        entrypoint.reset_shared_intermediates()
        # per-query compile pass at sf0.001
        try:
            fn(spark, tiny).collect()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: warmup failed: {e}", file=sys.stderr)
        spark.catalog.clearCache()

        if args.plan_dir and not args.no_plan:
            os.makedirs(args.plan_dir, exist_ok=True)
            entrypoint.reset_shared_intermediates()
            if args.prebuild:
                _prebuild(spark, args.sf)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
            spark.catalog.clearCache()

        best_collect = None
        best_noop = None
        for _ in range(args.runs):
            entrypoint.reset_shared_intermediates()
            if args.prebuild:
                _prebuild(spark, args.sf)
            spark.sparkContext.setJobDescription(f"profile:{name}:collect")
            t0 = time.time()
            fn(spark, args.sf).collect()
            dt = time.time() - t0
            best_collect = min(best_collect or dt, dt)
            spark.catalog.clearCache()

            entrypoint.reset_shared_intermediates()
            if args.prebuild:
                _prebuild(spark, args.sf)
            spark.sparkContext.setJobDescription(f"profile:{name}:noop")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best_noop = min(best_noop or dt, dt)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
        out[name] = {
            "collect": round(best_collect, 3),
            "noop": round(best_noop, 3),
        }
        print(json.dumps({name: out[name]}), flush=True)

    print("RESULT " + json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
