"""Synthetic transactions generator (S4, reference
scripts/generate_fake_data.py:108-178).

Test infrastructure, not engine: produces the weighted-category fake
transactions CSV the reference ships (seed-deterministic). We generate
driver-side with the stdlib (no faker in this image) — merchant names are
synthesized with the same *shape* (hyphens, commas, apostrophes, mixed
case) so the title-case edge cases stay exercised.
"""

from __future__ import annotations

import csv
import random
import uuid
from datetime import date, timedelta

# Reference generator distributions (FIXTURES.md §1 /
# reference scripts/generate_fake_data.py:127-155).
CATEGORY_WEIGHTS = [
    ("Groceries", 0.25),
    ("Dining", 0.20),
    ("Transportation", 0.15),
    ("Shopping", 0.15),
    ("Utilities", 0.10),
    ("Entertainment", 0.08),
    ("Healthcare", 0.04),
    ("Travel", 0.03),
]
PAYMENT_METHODS = ["Credit Card", "Debit Card", "Cash", "Digital Wallet"]
PAYMENT_WEIGHTS = [0.70, 0.15, 0.10, 0.05]
# Per-category amount ranges (FIXTURES.md §1 names Groceries $10-200 and
# Travel $100-2000; the rest interpolate the same spirit and stay inside
# the validation bounds 0 < amount <= 10000).
AMOUNT_RANGES = {
    "Groceries": (10.0, 200.0),
    "Dining": (5.0, 150.0),
    "Transportation": (2.0, 100.0),
    "Shopping": (10.0, 500.0),
    "Utilities": (30.0, 400.0),
    "Entertainment": (5.0, 200.0),
    "Healthcare": (20.0, 1000.0),
    "Travel": (100.0, 2000.0),
}

_SURNAMES = [
    "Smith", "Johnson", "O'Brien", "Garcia", "Miller-Lopez", "Davis",
    "martinez", "HERNANDEZ", "D'Angelo", "Wilson", "Anderson", "taylor",
    "Thomas", "Moore-Jackson", "Martin", "lee", "Perez", "White",
]
_SUFFIXES = ["Inc", "LLC", "Group", "and Sons", "PLC", "Ltd"]


def _company_name(rng: random.Random) -> str:
    style = rng.random()
    a = rng.choice(_SURNAMES)
    b = rng.choice(_SURNAMES)
    c = rng.choice(_SURNAMES)
    if style < 0.3:
        return f"{a}-{b}"
    if style < 0.6:
        return f"{a}, {b} and {c}"
    return f"{a} {rng.choice(_SUFFIXES)}"


def generate_transactions(
    num_transactions: int = 10_000,
    num_users: int = 100,
    years_back: int = 2,
    seed: int = 42,
    end_date: date | None = None,
) -> list[dict]:
    """Rows as dicts with the 7 required CSV columns."""
    rng = random.Random(seed)
    end = end_date or date.today()
    start = end - timedelta(days=365 * years_back)
    span = (end - start).days
    cats = [c for c, _ in CATEGORY_WEIGHTS]
    weights = [w for _, w in CATEGORY_WEIGHTS]
    rows = []
    for _ in range(num_transactions):
        d = start + timedelta(days=rng.randint(0, span))
        category = rng.choices(cats, weights=weights, k=1)[0]
        lo, hi = AMOUNT_RANGES[category]
        rows.append(
            {
                "transaction_id": str(uuid.UUID(int=rng.getrandbits(128), version=4)),
                "date": d.isoformat(),
                "category": category,
                "amount": f"{round(rng.uniform(lo, hi), 2):.2f}",
                "merchant": _company_name(rng),
                "payment_method": rng.choices(
                    PAYMENT_METHODS, weights=PAYMENT_WEIGHTS, k=1
                )[0],
                "user_id": str(rng.randint(1, num_users)),
            }
        )
    rows.sort(key=lambda r: r["date"])
    return rows


def write_transactions_csv(path: str, rows: list[dict]) -> None:
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(
            f,
            fieldnames=[
                "transaction_id", "date", "category", "amount",
                "merchant", "payment_method", "user_id",
            ],
        )
        w.writeheader()
        w.writerows(rows)
