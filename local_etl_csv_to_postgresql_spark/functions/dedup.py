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


def span_grams(words_col: Column, n: int) -> Column:
    """POSITION-PRESERVING n-gram strings (no array_distinct — one
    entry per start position, so occurrence counts survive). The
    span-level twin of ``shingles``: repetition stats and span dedup
    need multiplicity; set-similarity (MinHash/Jaccard) needs the
    distinct form. Same short-doc guard."""
    return F.when(
        F.size(words_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words_col) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words_col, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def jaccard(a: Column, b: Column, nd: int = 6) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.round(
        inter.cast("double") / F.nullif(union, F.lit(0)).cast("double"), nd
    )


def containment(a: Column, b: Column, nd: int = 6) -> Column:
    """Exact containment |A∩B| / |A| — the ASYMMETRIC near-dup measure:
    a short document quoted wholesale inside a long one has high
    containment but low Jaccard (the union is dominated by the long
    side), so Jaccard-threshold dedup misses exactly the
    quote-inclusion duplicates containment catches."""
    inter = F.size(F.array_intersect(a, b))
    return F.round(
        inter.cast("double") / F.nullif(F.size(a), F.lit(0)).cast("double"),
        nd,
    )


def minhash_signature(shingle_col: Column, k: int = 16) -> Column:
    """Row-local k-permutation minhash signature (array<bigint>).

    The whole signature is computed inside the row — base-hash each
    shingle once, then take array_min of each affine permutation. ZERO
    shuffle and zero data movement: at 100 TB the signature pass is
    embarrassingly parallel over partitions, which is the entire point
    of minhash (the only shuffle in the pipeline is the LSH bucket
    groupBy that follows). Empty shingle sets yield null minhashes.
    """
    base = F.transform(shingle_col, lambda s: hash60(s) % F.lit(MINHASH_REDUCE))

    def perm(j: int) -> Column:
        # factory, NOT a default-arg lambda: F.transform treats a 2-param
        # lambda as its (element, index) form
        return F.array_min(
            F.transform(
                base,
                lambda h: (F.lit(minhash_a(j)) * h + F.lit(minhash_b(j)))
                % F.lit(MINHASH_P),
            )
        )

    return F.array(*[perm(j) for j in range(k)])


def minhash_signatures_agg(
    doc_shingles: DataFrame, id_col: str, shingle_col: str, k: int = 16
) -> DataFrame:
    """(id, shingle-array) → (id, signature array<bigint>) via the
    codegen fast path: explode shingles, base-hash as a plain column,
    ONE hash-aggregate with k MIN expressions (map-side combinable — the
    shuffle carries k ints per doc), then assemble the array.

    ~10x faster than the row-local higher-order version on CPU because
    every expression stays inside whole-stage codegen; the row-local
    ``minhash_signature`` remains for cases where avoiding any shuffle
    matters more than CPU. Docs with empty shingle sets keep a row
    (explode_outer) with an all-null signature, matching the HOF path.
    """
    ex = doc_shingles.select(
        F.col(id_col), F.explode_outer(F.col(shingle_col)).alias("__sh")
    )
    h = ex.withColumn(
        "__h0",
        F.when(
            F.col("__sh").isNotNull(), hash60(F.col("__sh")) % F.lit(MINHASH_REDUCE)
        ),
    )
    mins = [
        F.min(
            (F.lit(minhash_a(j)) * F.col("__h0") + F.lit(minhash_b(j)))
            % F.lit(MINHASH_P)
        ).alias(f"__m{j}")
        for j in range(k)
    ]
    agg = h.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col),
        F.array(*[F.col(f"__m{j}") for j in range(k)]).alias("signature"),
    )


def band_keys(sig_col: Column, k: int = 16, bands: int = 4) -> Column:
    """Row-local LSH band keys: md5 over each band's slice of the
    signature (array<string>, one key per band)."""
    rows = k // bands
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(sig_col, b * rows + 1, rows),
                        lambda m: m.cast("string"),
                    ),
                )
            )
            for b in range(bands)
        ]
    )


def lsh_candidate_pairs(
    doc_signatures: DataFrame, id_col: str, sig_col: str = "signature",
    k: int = 16, bands: int = 4,
) -> DataFrame:
    """(id, signature-array) → candidate (id_a, id_b) pairs whose
    signatures agree on at least one full band.

    Band keys are computed row-locally (band_keys), then posexploded to
    (band, band_key) — the self-join on that pair is the ONLY shuffle in
    the near-dup pipeline, and it is keyed on 32-byte digests, not
    content."""
    banded = doc_signatures.select(
        F.col(id_col), F.posexplode(band_keys(F.col(sig_col), k, bands))
    ).select(F.col(id_col), F.col("pos").alias("band"), F.col("col").alias("band_key"))
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


def simhash32_agg(df: DataFrame, id_col: str, words_col: Column) -> DataFrame:
    """SimHash as a codegen'd explode + hash-aggregate (the fast path:
    the higher-order ``simhash32`` is interpreted per element and ~10x
    slower). Explode distinct words, compute 32 ±1 bit-votes as plain
    arithmetic columns, partial-aggregate map-side, finish with the
    bit-assembly projection. The only shuffle carries 32 ints per doc."""
    ex = df.select(
        F.col(id_col), F.explode_outer(F.array_distinct(words_col)).alias("__w")
    )
    h = ex.withColumn(
        "__h",
        F.when(
            F.col("__w").isNotNull(), hash60(F.col("__w")) % F.lit(MINHASH_REDUCE)
        ),
    )
    votes = [
        F.sum(
            F.when(F.col("__h").isNull(), F.lit(0)).otherwise(
                F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) * 2 - 1
            )
        ).alias(f"__v{b}")
        for b in range(32)
    ]
    agg = h.groupBy(id_col).agg(*votes)
    sim = None
    for b in range(32):
        term = (
            F.when(F.col(f"__v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("bigint")
        )
        sim = term if sim is None else sim + term
    return agg.select(F.col(id_col), sim.alias("simhash"))
