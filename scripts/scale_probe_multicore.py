"""Multi-core scaling probe at compute-bound scale (r14, VERDICT item 7).

The driver's 8-vs-32-core block at sf0.1 shows ratio ~1 everywhere
because every query is fixed-cost bound at 11 MB of lineitem — core
count is invisible, so the 100 TB parallelism claims had no measured
datapoint. There is no sf1 test dir (TESTDATA.md: read-only, sf0.1
max), so this probe SYNTHESIZES a deterministic 10x-replicated input
("sfx1") in /tmp — big tables replicated with shifted keys (and a
per-replica suffix token for documents, so n-gram overlap stays
corpus-like instead of every doc gaining an exact duplicate) — and
runs one representative query per heavy plan-shape family at 8 and 32
cores in fresh JVMs (the bench's own chunk methodology). A
speedup32/8 well above 1 is the evidence that the shapes scale with
cores once data dominates; ~1 means still overhead-bound.

This is a MEASUREMENT artifact only: nothing in the engine or bench
reads the synthesized directory; /root/testdata stays untouched.

Run: python scripts/scale_probe_multicore.py
Writes scripts/scale_curve_multicore.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
REPLICAS = int(os.environ.get("SPARK_GRAFT_PROBE_REPLICAS", "10"))
DST = f"/tmp/sfx_{REPLICAS}"
PROBES = [
    ("q00_pricing_summary", "scan + partial-agg rollup"),
    ("tx14_bigram_cross_entropy", "corpus explode + gram-keyed model join"),
    ("qf06_gopher_repetition", "two n-gram explodes + doc rollups"),
    ("dd13_semantic_dedup", "lloyd training + vectorized in-cluster pairs"),
    ("es06_ivf_kmeans_ann", "lloyd training + cell probe (Arrow assignment)"),
    ("gr07_copurchase_communities", "edge build + CC fixpoint"),
    ("ct04_contamination_ngram_sensitivity", "3-order distinct+join sweep"),
]
_WORKER_ENV = "SPARK_GRAFT_PROBE_WORKER"


def build_dataset() -> None:
    from pyspark.sql import functions as F

    from local_etl_csv_to_postgresql_spark.session import get_spark

    if os.path.isdir(DST) and os.path.exists(f"{DST}/_SUCCESS_PROBE"):
        return
    spark = get_spark("probe-build")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(DST, exist_ok=True)
    small = [
        "region", "nation", "customer", "supplier", "part", "orders",
    ]
    for t in small:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")

    def replicate(name, mutate):
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        legs = [mutate(base, r) for r in range(REPLICAS)]
        out = legs[0]
        for leg in legs[1:]:
            out = out.unionByName(leg)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )

    replicate(
        "lineitem",
        lambda df, r: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(r * 100_000_000)
        ),
    )
    replicate(
        "documents",
        lambda df, r: df.withColumn(
            "doc_id", F.col("doc_id") + F.lit(r * 100_000_000)
        ).withColumn("text", F.concat(F.col("text"), F.lit(f" zrep{r}"))),
    )
    replicate(
        "embeddings",
        lambda df, r: df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(r * 100_000_000)
        ).withColumn(
            "embedding",
            F.transform(
                "embedding", lambda x: x + F.lit(float(r) * 1e-4)
            ),
        ),
    )
    replicate(
        "events",
        lambda df, r: df.withColumn(
            "event_id", F.col("event_id") + F.lit(r * 1_000_000_000)
        ).withColumn("user_id", F.col("user_id") + F.lit(r * 100_000_000)),
    )
    open(f"{DST}/_SUCCESS_PROBE", "w").write("ok")
    spark.stop()


def worker(name: str) -> int:
    import __spark_entry__ as entrypoint
    from local_etl_csv_to_postgresql_spark.session import get_spark

    spark = get_spark("probe")
    spark.sparkContext.setLogLevel("ERROR")
    fn = entrypoint.queries()[name]
    fn(spark, "/root/testdata/sf0.01").collect()  # warm codegen/JIT
    best = None
    for _ in range(2):
        t0 = time.time()
        fn(spark, DST).collect()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(json.dumps({"query": name, "sec": round(best, 3)}), flush=True)
    spark.stop()
    return 0


def main() -> int:
    if os.environ.get(_WORKER_ENV):
        return worker(os.environ[_WORKER_ENV])
    only = [
        n
        for n in os.environ.get("SPARK_GRAFT_PROBE_ONLY", "").split(",")
        if n
    ]
    global PROBES
    if only:
        PROBES = [(n, s) for n, s in PROBES if n in only]
    build_dataset()
    out = {
        "dataset": f"{SRC} x{REPLICAS} deterministic replicas (see module doc)",
        "replicas": REPLICAS,
        "loadavg_start": round(os.getloadavg()[0], 2),
        "probes": {},
    }
    for name, shape in PROBES:
        rec = {"shape": shape}
        for cores in (8, 32):
            env = dict(os.environ)
            env[_WORKER_ENV] = name
            env["SPARK_GRAFT_CPUS"] = str(cores)
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
            sec = None
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    sec = json.loads(line)["sec"]
                    break
                except (json.JSONDecodeError, KeyError):
                    continue
            rec[f"cores{cores}"] = sec
            rec[f"wall{cores}"] = round(time.time() - t0, 1)
            if sec is None:
                rec[f"err{cores}"] = proc.stderr.strip()[-200:]
        if rec.get("cores8") and rec.get("cores32"):
            rec["speedup_32_over_8"] = round(rec["cores8"] / rec["cores32"], 2)
        out["probes"][name] = rec
        print(name, rec, flush=True)
    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    suffix = "" if REPLICAS == 10 else f"_x{REPLICAS}"
    with open(
        os.path.join(
            REPO, "scripts", f"scale_curve_multicore{suffix}.json"
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
