"""Fuzzy & exact deduplication operators for training-data pipelines.

- exact: hash-groupBy on a fingerprint (one shuffle on a 32-byte key)
- MinHash + LSH: shingle → minhash signature → banded bucket-join —
  the all-pairs near-dup path that scales: candidate generation is a
  groupBy on (band, band_key), never an O(n²) cross join
- SimHash: 32-bit sign-aggregated word-hash sketch per document
- n-gram Jaccard: the exact verification kernel (applied to candidate
  pairs, or to any explicit pair list)

All hashing is md5-derived (both Spark and DuckDB have md5, so every
operator has an oracle twin) and arithmetic stays in bigint ranges that
cannot overflow: base hash is 60 bits, minhash permutations are affine
mod 2^31-1 over a 31-bit reduction.

Scale notes: shingling explodes each doc into ~L shingles; the minhash
aggregation is a map-side-combinable min per (doc, permutation).
Banding emits B rows per doc; the bucket groupBy is the only shuffle
keyed on content. Verification touches only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINHASH_P = 2_147_483_647  # 2^31 - 1 (prime)
MINHASH_REDUCE = 2_147_483_648  # 2^31


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash from md5 — identical in DuckDB via
    CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def minhash_a(j: int) -> int:
    return 2 * j + 3


def minhash_b(j: int) -> int:
    return 5 * j + 7


def shingles(words_col: Column, n: int = 3) -> Column:
    """Distinct n-gram shingle strings from a word array.

    Guarded for short docs: sequence(1, 0) in Spark produces a
    DESCENDING [1, 0] (step inferred), so docs with < n words must
    short-circuit to an empty array."""
    return F.when(
        F.size(words_col) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words_col) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(words_col, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def jaccard(a: Column, b: Column, nd: int = 6) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.round(
        inter.cast("double") / F.nullif(union, F.lit(0)).cast("double"), nd
    )


def minhash_signatures(
    doc_shingles: DataFrame, id_col: str, shingle_col: str, k: int = 16
) -> DataFrame:
    """(id, shingle-array) → (id, j, mh): the k-permutation minhash.

    Explode → per-permutation affine hash → min per (id, j). The min is
    map-side combinable, so the shuffle carries k rows per document.
    """
    exploded = doc_shingles.select(
        F.col(id_col), F.explode(F.col(shingle_col)).alias("__sh")
    )
    h0 = (hash60(F.col("__sh")) % F.lit(MINHASH_REDUCE)).alias("__h0")
    exploded = exploded.select(id_col, h0)
    perms = None
    for j in range(k):
        hj = exploded.select(
            id_col,
            F.lit(j).alias("j"),
            ((F.lit(minhash_a(j)) * F.col("__h0") + F.lit(minhash_b(j))) % F.lit(MINHASH_P)).alias(
                "__hj"
            ),
        )
        perms = hj if perms is None else perms.unionAll(hj)
    return perms.groupBy(id_col, "j").agg(F.min("__hj").alias("mh"))


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, k: int = 16, bands: int = 4
) -> DataFrame:
    """(id, j, mh) → candidate (id_a, id_b) pairs whose signatures agree
    on at least one full band. Banded bucket-join: group signatures into
    ``bands`` bands of k/bands rows, key each band by the md5 of its
    values, and self-join within (band, key) buckets."""
    rows = k // bands
    banded = (
        # floor-then-cast: DuckDB CAST(double AS INT) rounds while Spark
        # truncates — FLOOR first keeps the band index identical in both.
        signatures.withColumn("band", F.floor(F.col("j") / rows).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("j"), F.col("mh")))
                        ),
                        lambda s: s["mh"].cast("string"),
                    ),
                )
            ).alias("band_key")
        )
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash32(words_col: Column) -> Column:
    """32-bit SimHash over the distinct word set: per bit, sum +1/-1
    according to each word-hash's bit, set the bit when the sum is
    positive. Pure higher-order-function expression — one pass over the
    word array per document, no shuffle at all."""
    hashes = F.transform(
        F.array_distinct(words_col), lambda w: hash60(w) % F.lit(MINHASH_REDUCE)
    )
    def bit(b: int) -> Column:
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << b)) > 0, F.lit(1)).otherwise(F.lit(-1)),
        )
        return F.when(votes > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("bigint")

    out = bit(0)
    for b in range(1, 32):
        out = out + bit(b)
    return out
