"""Warehouse: star-schema persistence + idempotent load protocol.

Reference parity (SURVEY §2.1/§2.5, src/load.py):
- S5/S6 idempotent dimension append (ON CONFLICT DO NOTHING)    :135-304
- S9    dimension key maps                                       :311-420
- J1    fact key enrichment with unmatched-key errors            :427-527
- J2    date-key existence check                                 :497-508
- S7/J3 fact anti-join append with inserted/skipped counts       :585-696
- load stats contract                                            :729-740

Spark-first design:
- Tables are parquet directories under ``WarehouseConfig.path``; the
  fact table is partitioned by ``year_month`` so date-range predicates
  prune files (replaces the reference's B-tree date indexes).
- "ON CONFLICT DO NOTHING" becomes a ``left_anti`` join against the
  current table followed by an append — the idempotent-append protocol.
- Key enrichment joins fact→dims on natural keys with ``broadcast()``
  hints: dims are orders of magnitude smaller than the fact, so all four
  joins are shuffle-free map-side hash joins (the Spark analogue of the
  reference's in-memory dict maps, src/load.py:368-420 /
  LESSONS_LEARNED.md:28-31).
- Atomicity (reference wraps the whole load in one transaction,
  src/load.py:778/872): parquet appends are not transactional across
  tables; we stage new files per table and only "publish" after all
  tables succeed (write to _staging, then move). Per SURVEY §7.4-5 this
  is commit-marker emulation, documented rather than hidden.
- JDBC mode: when ``jdbc_url`` is set, the same frames are written via
  ``df.write.jdbc`` (batchsize=1000 like the reference) for true
  PostgreSQL parity.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import WarehouseConfig
from .schemas import DIMENSIONS, NATURAL_KEYS, SURROGATE_KEYS


class LoadError(Exception):
    pass


@dataclass
class LoadStats:
    """Reference load-stats contract (src/load.py:729-740)."""

    dims_inserted: dict = field(default_factory=dict)
    fact_inserted: int = 0
    fact_skipped: int = 0
    status: str = "pending"
    error: str | None = None
    snapshot_version: int | None = None


class Warehouse:
    def __init__(self, spark: SparkSession, cfg: WarehouseConfig | None = None):
        self.spark = spark
        self.cfg = cfg or WarehouseConfig()

    # -- table plumbing ----------------------------------------------------

    def _path(self, table: str) -> str:
        return os.path.join(self.cfg.path, table)

    def exists(self, table: str) -> bool:
        p = self._path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" or f.startswith("year_month=")
            for f in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame:
        if not self.exists(table):
            raise LoadError(f"Table does not exist: {table}")
        return self.spark.read.parquet(self._path(table))

    def read_or_empty(self, table: str, schema) -> DataFrame:
        if self.exists(table):
            return self.spark.read.parquet(self._path(table))
        return self.spark.createDataFrame([], schema)

    def drop_all(self) -> None:
        if os.path.isdir(self.cfg.path):
            shutil.rmtree(self.cfg.path)

    def register_views(self) -> None:
        """Expose warehouse tables as temp views for spark.sql queries."""
        for t in list(DIMENSIONS) + [self.cfg.fact_table]:
            if self.exists(t):
                self.read(t).createOrReplaceTempView(t)

    # -- idempotent dimension append (S5/S6) -------------------------------

    def load_dimension(
        self, df: DataFrame, table: str, natural_key: str, surrogate_key: str | None = None
    ) -> int:
        """Append rows whose natural key is not already present; new rows
        get surrogate keys offset past max(existing) so keys are stable
        across incremental loads (SURVEY §7.4-1).

        Input ``df`` must already carry surrogate keys starting at 1
        (dense strategy); on incremental loads the keys are reassigned
        relative to the existing table.
        """
        if not self.exists(table):
            # piggyback the inserted-count on the write action itself
            # (CollectMetrics above the writer): one job instead of
            # write + a second read-the-footers count job per table —
            # at 6 tables per load the extra jobs were the measured
            # fixed cost of the load phase
            from pyspark.sql import Observation

            obs = Observation()
            self._write(df.observe(obs, F.count(F.lit(1)).alias("n")), table)
            return int(obs.get["n"])

        existing = self.read(table)
        new_rows = df.join(
            F.broadcast(existing.select(natural_key)), natural_key, "left_anti"
        )
        n_new = new_rows.count()
        if n_new == 0:
            return 0
        if surrogate_key:
            offset = existing.agg(F.max(surrogate_key)).first()[0] or 0
            if n_new > self.cfg.large_dim_threshold:
                # a huge dimension batch (first load of a document- or
                # user-grain dim) must not funnel through one sort task;
                # the distributed two-phase rank assigns the IDENTICAL
                # dense keys (row_number in natural-key order)
                from .operators.ranking import attach_global_row_number

                new_rows = (
                    attach_global_row_number(
                        new_rows.drop(surrogate_key),
                        order_by=[F.col(natural_key).asc()],
                        rn_col="__rn",
                    )
                    .withColumn(
                        surrogate_key,
                        (F.col("__rn") + F.lit(offset)).cast("long"),
                    )
                    .drop("__rn")
                )
            else:
                from pyspark.sql import Window

                w = Window.orderBy(F.col(natural_key).asc())
                new_rows = new_rows.drop(surrogate_key).withColumn(
                    surrogate_key,
                    (F.row_number().over(w) + F.lit(offset)).cast("long"),
                )
            new_rows = new_rows.select(existing.columns)
        self._append(new_rows, table)
        return n_new

    def load_dim_date(self, df: DataFrame) -> int:
        """S6: dim_date idempotent append on date_key."""
        return self.load_dimension(df, "dim_date", "date_key", surrogate_key=None)

    def seed_dim_date(self, start, end) -> int:
        """Seed the continuous calendar range (reference
        sql/populate_dim_date.sql: GENERATE_SERIES 2022-2026 -> 1,826
        rows). Idempotent: re-seeding skips existing date_keys."""
        from .operators.dates import build_dim_date

        return self.load_dim_date(build_dim_date(self.spark, start, end))

    # -- key maps + fact enrichment (S9 + J1/J2) ---------------------------

    def enrich_fact(self, fact_df: DataFrame) -> DataFrame:
        """J1: replace natural keys with surrogate keys via 4 broadcast
        joins + J2 date-key existence check.

        Unmatched keys raise (reference src/load.py:461-466 errors on any
        unmapped value) — detected with left joins + ONE aggregation
        instead of per-row dict probes.
        """
        dims = {
            "dim_category": ("category", "category_name", "category_key"),
            "dim_merchant": ("merchant", "merchant_name", "merchant_key"),
            "dim_payment_method": ("payment_method", "payment_method_name", "payment_method_key"),
            "dim_user": ("user_id", "user_id", "user_key"),
        }
        out = fact_df
        for table, (src_col, nk, sk) in dims.items():
            dim = self.read(table).select(
                F.col(nk).alias(f"__nk_{sk}"), F.col(sk)
            )
            out = out.join(
                F.broadcast(dim), out[src_col] == dim[f"__nk_{sk}"], "left"
            ).drop(f"__nk_{sk}")
        dim_date_keys = self.read("dim_date").select("date_key").withColumn(
            "__date_ok", F.lit(True)
        )
        out = out.join(F.broadcast(dim_date_keys), "date_key", "left")

        # the joined frame backs three actions (this miss-check, the fact
        # count, the fact write) — persist so the 5-join plan runs once;
        # load_warehouse unpersists after the fact lands
        out = out.persist()
        self._enriched_cache = out

        missing = out.agg(
            *[
                F.sum(F.col(sk).isNull().cast("long")).alias(sk)
                for _, (_, _, sk) in dims.items()
            ],
            F.sum((~F.coalesce(F.col("__date_ok"), F.lit(False))).cast("long")).alias(
                "date_key"
            ),
            F.count(F.lit(1)).alias("__total"),
        ).first()
        total = int(missing["__total"])
        problems = {
            k: int(missing[k] or 0)
            for k in missing.asDict()
            if k != "__total" and missing[k]
        }
        if problems:
            raise LoadError(f"Unmapped dimension keys in fact batch: {problems}")

        result = out.select(
            "transaction_id", "date_key", "category_key", "merchant_key",
            "payment_method_key", "user_key", "amount",
        )
        # stash the batch size measured by the miss-check aggregation so
        # load_fact skips its own count() job over the same frame
        self._enriched_total = (id(result), total)
        return result

    # -- fact idempotent append (S7/J3) ------------------------------------

    def load_fact(self, enriched: DataFrame) -> tuple[int, int]:
        """S7: anti-join on transaction_id then append; returns
        (inserted, skipped) like the reference (src/load.py:585-696).

        Scale note: the anti-join shuffles on transaction_id only when the
        existing side is large; Catalyst/AQE broadcasts the smaller side.
        At 100 TB the existing-key probe should be narrowed first — we
        read only the transaction_id column (column pruning) and, when the
        fact table is month-partitioned and the batch spans few months,
        partition-prune via the batch's date_key range.
        """
        table = self.cfg.fact_table
        stashed = getattr(self, "_enriched_total", None)
        if stashed is not None and stashed[0] == id(enriched):
            total = stashed[1]
            self._enriched_total = None
        else:
            total = enriched.count()
        if not self.exists(table):
            self._write_fact(enriched)
            return total, 0
        existing_ids = self.read(table).select("transaction_id")
        new_rows = enriched.join(existing_ids, "transaction_id", "left_anti")
        inserted = new_rows.count()
        if inserted:
            self._write_fact(new_rows, mode="append")
        return inserted, total - inserted

    # -- writers -----------------------------------------------------------

    def _fact_with_partition(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "year_month", (F.col("date_key") / 100).cast("int")
        )

    def _write_fact(self, df: DataFrame, mode: str = "overwrite") -> None:
        out = self._fact_with_partition(df)
        writer_df = out
        if self.cfg.partition_fact_by_month:
            # without this, every shuffle task writes a sliver into every
            # month dir (tasks x months tiny files — 776 files for a 3k-row
            # load). Repartitioning on the partition column yields one file
            # per month per batch; at cluster scale use
            # repartition(N, col) to balance file sizes instead.
            writer_df = out.repartition(F.col("year_month"))
        writer = writer_df.write.mode(mode)
        if self.cfg.partition_fact_by_month:
            writer = writer.partitionBy("year_month")
        writer.parquet(self._path(self.cfg.fact_table))
        if self.cfg.jdbc_url:
            self._jdbc_write(df, self.cfg.fact_table, mode)

    def compact_fact(self) -> dict:
        """Small-file compaction for the month-partitioned fact table:
        rewrite with one file per partition via staging + publish swap.

        Incremental appends leave one file per partition PER BATCH; after
        many batches a 100 TB table degrades into millions of small files
        and scan planning dominates query time. Compaction is the
        standard maintenance pass (what table formats call OPTIMIZE),
        expressed here with plain parquet: write compacted data to a
        staging dir, then atomically swap directories — readers see the
        old layout until the publish completes.
        """
        import glob
        import shutil

        path = self._path(self.cfg.fact_table)
        count_files = lambda p: len(  # noqa: E731
            glob.glob(f"{p}/**/*.parquet", recursive=True)
        )
        before = count_files(path)
        df = self.read(self.cfg.fact_table)
        tmp = path + "__compacting"
        writer_df = df
        if self.cfg.partition_fact_by_month:
            writer_df = df.repartition(F.col("year_month"))
            writer_df.write.mode("overwrite").partitionBy(
                "year_month"
            ).parquet(tmp)
        else:
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = path + "__old"
        shutil.move(path, old)
        shutil.move(tmp, path)
        shutil.rmtree(old)
        # the swap happened outside Spark's writers: drop any cached
        # plans/listings pinned to the pre-compaction file set, else a
        # frame cached over this path in the same session would recompute
        # missing partitions from deleted files (FAILED_READ_FILE)
        self.spark.catalog.refreshByPath(path)
        after = count_files(path)
        # the rewrite invalidated any snapshot referencing the old file
        # layout; prune them so read_version fails fast and loud
        pruned = self.prune_invalid_snapshots()
        return {
            "files_before": before,
            "files_after": after,
            "snapshots_pruned": pruned,
        }

    def _write(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(self._path(table))
        if self.cfg.jdbc_url:
            self._jdbc_write(df, table, mode)

    def _append(self, df: DataFrame, table: str) -> None:
        self._write(df, table, mode="append")

    def _jdbc_write(self, df: DataFrame, table: str, mode: str) -> None:
        (
            df.write.mode("append" if mode == "append" else "overwrite")
            .option("batchsize", str(self.cfg.jdbc_batchsize))
            .jdbc(self.cfg.jdbc_url, table, properties=self.cfg.jdbc_properties)
        )

    # -- snapshots: plain-parquet time travel ------------------------------

    def _snapshots_dir(self) -> str:
        return os.path.join(self.cfg.path, "_snapshots")

    def snapshot(self) -> int:
        """Record a manifest of every table's CURRENT parquet file set
        and return its version number — the plain-parquet form of a
        table format's snapshot. Incremental loads only ever APPEND new
        part files (dims append; the fact appends; first writes create
        fresh dirs), so an old manifest's file list stays readable
        until a compaction rewrites the layout. Metadata-only: one JSON
        file, written atomically (tmp + rename); no data is copied."""
        import glob
        import json

        os.makedirs(self._snapshots_dir(), exist_ok=True)
        manifest: dict = {"tables": {}}
        for t in list(DIMENSIONS) + [self.cfg.fact_table]:
            if not self.exists(t):
                continue
            root = self._path(t)
            files = sorted(
                os.path.relpath(f, root)
                for f in glob.glob(f"{root}/**/*.parquet", recursive=True)
            )
            manifest["tables"][t] = files
        version = (max(self.snapshots(), default=0)) + 1
        final = os.path.join(self._snapshots_dir(), f"v{version}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, final)
        return version

    def snapshots(self) -> list[int]:
        """Available snapshot versions, ascending."""
        d = self._snapshots_dir()
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def read_version(self, table: str, version: int) -> DataFrame:
        """Read ``table`` as of snapshot ``version`` — a scan restricted
        to the manifest's file list. ``basePath`` keeps the fact's
        ``year_month=`` directory partition column alive even though
        individual files are enumerated, so version reads prune and
        project exactly like current reads."""
        import json

        path = os.path.join(self._snapshots_dir(), f"v{version}.json")
        if not os.path.exists(path):
            raise LoadError(f"No snapshot v{version}")
        with open(path) as f:
            manifest = json.load(f)
        rel = manifest["tables"].get(table)
        if rel is None:
            raise LoadError(
                f"Table {table} not present in snapshot v{version}"
            )
        root = self._path(table)
        files = [os.path.join(root, r) for r in rel]
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            raise LoadError(
                f"Snapshot v{version} of {table} references "
                f"{len(missing)} files removed by compaction — "
                "historical versions do not survive a layout rewrite"
            )
        return (
            self.spark.read.option("basePath", root).parquet(*files)
        )

    def prune_invalid_snapshots(self) -> list[int]:
        """Drop manifests whose file lists no longer exist (a compaction
        rewrote the layout). Returns the pruned versions — the VACUUM
        analogue for this snapshot scheme."""
        import json

        pruned = []
        for v in self.snapshots():
            path = os.path.join(self._snapshots_dir(), f"v{v}.json")
            with open(path) as f:
                manifest = json.load(f)
            ok = all(
                os.path.exists(os.path.join(self._path(t), r))
                for t, rels in manifest["tables"].items()
                for r in rels
            )
            if not ok:
                os.remove(path)
                pruned.append(v)
        return pruned

    # -- full load (phase 3 orchestration, src/load.py:703-913) ------------

    def load_warehouse(self, tables: dict, seed_dates: tuple | None = None) -> LoadStats:
        """Load 5 dims then the enriched fact, with inserted/skipped
        accounting. On any error the protocol stops; already-appended
        dimension rows are idempotent on re-run (same natural keys skip),
        which is how re-execution converges without cross-table
        transactions.

        ``seed_dates=(start, end)``: seed the continuous calendar first
        if dim_date doesn't exist — inside the dim_date worker thread,
        so the seed write overlaps the other dimension loads instead of
        running as a sequential pre-step. Seeded rows are setup, not
        batch data: they are excluded from ``dims_inserted`` (same
        accounting as the former pipeline-level pre-seed)."""
        stats = LoadStats()

        def _load_dim_date() -> int:
            if seed_dates is not None and not self.exists("dim_date"):
                self.seed_dim_date(*seed_dates)
            return self.load_dim_date(tables["dim_date"])

        try:
            # the 5 dimension loads touch disjoint tables and share the
            # persisted `valid` cache — run them as concurrent driver
            # threads so their (small) Spark jobs overlap instead of
            # queueing. Wall time drops from sum to max; on a cluster the
            # same pattern keeps executors busy while tiny dim jobs
            # round-trip the scheduler. Spark's job scheduler is
            # thread-safe, and block-level locking makes the concurrent
            # first touch of the cache compute each partition once.
            from concurrent.futures import ThreadPoolExecutor

            dim_jobs = {
                "dim_date": _load_dim_date,
                **{
                    t: (
                        lambda t=t: self.load_dimension(
                            tables[t], t, NATURAL_KEYS[t], SURROGATE_KEYS[t]
                        )
                    )
                    for t in (
                        "dim_category",
                        "dim_merchant",
                        "dim_payment_method",
                        "dim_user",
                    )
                },
            }
            with ThreadPoolExecutor(max_workers=len(dim_jobs)) as pool:
                futures = {t: pool.submit(fn) for t, fn in dim_jobs.items()}
                for t, fut in futures.items():
                    stats.dims_inserted[t] = fut.result()
            enriched = self.enrich_fact(tables["fact_data"])
            stats.fact_inserted, stats.fact_skipped = self.load_fact(enriched)
            if self.cfg.snapshot_on_load:
                stats.snapshot_version = self.snapshot()
            stats.status = "success"
        except Exception as e:  # noqa: BLE001
            stats.status = "failed"
            stats.error = str(e)
            raise
        finally:
            cached = getattr(self, "_enriched_cache", None)
            if cached is not None:
                cached.unpersist()
                self._enriched_cache = None
        return stats

    # -- schema verification (reference sql/verify_schema.sql) -------------

    def verify_schema(self) -> DataFrame:
        """Warehouse introspection + integrity report (the Spark form of
        reference sql/verify_schema.sql: table existence :19-43, row
        counts :53-77, column definitions :88-162, unique natural keys
        :250-268, FK integrity :199-215, calendar CHECK ranges :50-62).

        Spark enforces no DDL constraints at write time, so every
        constraint is re-derived as a query — one report row per check:
        (check_type, table_name, status, detail). All per-table checks
        are cheap aggregates; at cluster scale the fact FK scans are the
        only real work and each is a single anti-join.
        """
        from .schemas import FACT_TRANSACTIONS_SCHEMA

        declared = dict(DIMENSIONS)
        declared[self.cfg.fact_table] = FACT_TRANSACTIONS_SCHEMA
        rows: list[tuple[str, str, str, str]] = []

        for table, schema in declared.items():
            if not self.exists(table):
                rows.append(("exists", table, "fail", "table missing"))
                continue
            rows.append(("exists", table, "pass", ""))
            df = self.read(table)
            rows.append(("row_count", table, "pass", str(df.count())))

            want = {(f.name, f.dataType.simpleString()) for f in schema.fields}
            have = {(f.name, f.dataType.simpleString()) for f in df.schema.fields}
            extra = {n for n, _ in have - want}
            missing = {n for n, _ in want - have}
            # the fact's partition column is layout, not schema drift
            extra -= {"year_month"}
            if extra or missing:
                rows.append((
                    "columns", table, "fail",
                    f"missing={sorted(missing)} unexpected={sorted(extra)}",
                ))
            else:
                rows.append(("columns", table, "pass", ""))

        # unique natural keys (reference UNIQUE constraints)
        unique_cols = dict(NATURAL_KEYS)
        unique_cols["dim_date"] = "date_key"
        unique_cols[self.cfg.fact_table] = "transaction_id"
        for table, key in unique_cols.items():
            if not self.exists(table):
                continue
            df = self.read(table)
            total, distinct = (
                df.agg(
                    F.count(key).alias("n"),
                    F.countDistinct(key).alias("d"),
                ).first()
            )
            status = "pass" if total == distinct else "fail"
            rows.append((
                "unique_key", table, status, f"{key}: {total} rows, {distinct} distinct"
            ))

        # fact FK integrity (reference FK constraints -> anti-join counts)
        if self.exists(self.cfg.fact_table):
            fact = self.read(self.cfg.fact_table)
            fks = {
                "dim_date": ("date_key", "date_key"),
                "dim_category": ("category_key", "category_key"),
                "dim_merchant": ("merchant_key", "merchant_key"),
                "dim_payment_method": ("payment_method_key", "payment_method_key"),
                "dim_user": ("user_key", "user_key"),
            }
            for dim, (fk, pk) in fks.items():
                if not self.exists(dim):
                    continue
                keys = self.read(dim).select(F.col(pk).alias("__dim_pk"))
                orphans = fact.join(
                    F.broadcast(keys),
                    fact[fk] == F.col("__dim_pk"),
                    "left_anti",
                ).count()
                rows.append((
                    "foreign_key", f"{self.cfg.fact_table}->{dim}",
                    "pass" if orphans == 0 else "fail",
                    f"{orphans} orphaned rows",
                ))

        # calendar CHECK ranges (reference sql/schema.sql:50-62)
        if self.exists("dim_date"):
            dd = self.read("dim_date")
            checks = {
                "quarter BETWEEN 1 AND 4": "quarter between 1 and 4",
                "month BETWEEN 1 AND 12": "month between 1 and 12",
                "day BETWEEN 1 AND 31": "day between 1 and 31",
                "day_of_week BETWEEN 1 AND 7": "day_of_week between 1 and 7",
                "week_of_year BETWEEN 1 AND 53": "week_of_year between 1 and 53",
            }
            for label, cond in checks.items():
                bad = dd.filter(f"NOT ({cond})").count()
                rows.append((
                    "check_range", "dim_date",
                    "pass" if bad == 0 else "fail",
                    f"{label}: {bad} violations",
                ))

        return self.spark.createDataFrame(
            rows, "check_type string, table_name string, status string, detail string"
        )
