"""Compute the next certification window from the driver's
CORRECTNESS_r*.json history — the rotation policy as code instead of
hand-curation (round-9 follow-through on the r8 verdict's window rules).

Policy (documented on ``__spark_entry__._CERTIFICATION_PRIORITY`` since
round 6, now executable): the driver certifies the FIRST 50 entries of
``queries()``, so the window is filled in this order:

1. any live query whose most recent driver row FAILED;
2. queries that have NEVER been driver-certified (promotions — a stale
   green row beats no row at all), in the caller-chosen priority order;
3. the remaining slots by OLDEST last-green round, name-ascending
   within a round.

Run:  python scripts/refresh_queue.py            # print the computed queue
      python scripts/refresh_queue.py --refresh-only   # only bucket 3

The promotion order inside bucket 2 is a judgment call (the verdict
names it each round), so this script reports bucket membership and the
bucket-3 ordering; ``tests/test_entry.py::test_window_refresh_slots_are_oldest_first``
pins the committed window's refresh tail against bucket 3.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def history() -> tuple[dict[str, int], dict[str, int]]:
    """(last_green_round, last_failed_round) per query name, from every
    CORRECTNESS_r*.json the driver has produced."""
    last_green: dict[str, int] = {}
    last_failed: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
            )
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)
            else:
                last_failed[name] = max(last_failed.get(name, 0), rnd)
    return last_green, last_failed


def buckets() -> tuple[list[str], list[str], list[str]]:
    """(failed, never_certified, refresh_queue) over the LIVE registry.
    ``refresh_queue`` is fully ordered (oldest green round first, names
    ascending within a round); the first two are name-ordered — their
    in-window order is the caller's judgment."""
    import __spark_entry__ as ep

    # rows-only-by-design queries (no oracle twin — hll01) can never
    # hash-certify, so they are outside the rotation policy entirely
    oracles = set(ep.oracle_sql())
    live = [n for n in ep.queries() if n in oracles]
    last_green, last_failed = history()
    failed = sorted(
        n for n in live
        if n in last_failed and last_failed[n] >= last_green.get(n, -1)
    )
    never = sorted(
        n for n in live if n not in last_green and n not in failed
    )
    refresh = sorted(
        (n for n in live if n in last_green and n not in failed),
        key=lambda n: (last_green[n], n),
    )
    return failed, never, refresh


def main() -> int:
    failed, never, refresh = buckets()
    if "--refresh-only" not in sys.argv[1:]:
        print(f"# bucket 1 — last row FAILED ({len(failed)}):")
        for n in failed:
            print(f"  {n}")
        print(f"# bucket 2 — never driver-certified ({len(never)}):")
        for n in never:
            print(f"  {n}")
    slots = max(0, WINDOW - len(failed) - len(never))
    print(f"# bucket 3 — refresh queue, oldest first (next {slots} fit):")
    last_green, _ = history()
    for n in refresh[: slots if slots else len(refresh)]:
        print(f"  {n}  (last green r{last_green[n]})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
