"""Driver-contract wrappers for the training-data extension operators:
text analysis, exact/fuzzy dedup, similarity search, multimodal
plumbing — each a (spark, sf_dir) -> DataFrame callable plus a DuckDB
oracle twin.

The oracle SQL mirrors the Spark expressions operation-for-operation
(same hash construction, same double-precision fold order, same
rounding) so results are bit-identical — see functions/dedup.py and
functions/similarity.py for the determinism constraints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.analytics import dec, load
from . import dedup as dd
from . import similarity as sim
from . import text as tx
from .multimodal import (
    documents_as_media,
    extract_features,
    extract_metadata,
    resize_images,
    sample_frames,
)

# MinHash-LSH knobs (dd03/dd06/dd07). With k hashes in b bands of
# r = k/b rows, the banding s-curve crosses 50% candidate probability
# at s* ≈ (1/b)^(1/r): (k=16, b=4, r=4) → s* ≈ 0.71 — tuned for the
# 0.5 exact-Jaccard verification threshold (pairs at 0.5-0.7 have
# partial recall; raise b / lower r to push s* down at the cost of
# more candidate volume). Both knobs are env-overridable so a
# production corpus can pick its own point on the curve; every
# consumer (queries AND oracle twins) reads these constants, so the
# contract stays self-consistent at any setting.
import os as _os

MINHASH_K = int(_os.environ.get("SPARK_GRAFT_MINHASH_K", "16"))
MINHASH_BANDS = int(_os.environ.get("SPARK_GRAFT_MINHASH_BANDS", "4"))
# Banding only stays self-consistent between the Spark plan and the
# DuckDB oracle when bands divides k evenly: dedup.band_keys slices
# exactly `bands` groups of k//bands hashes, while the oracle buckets
# all k by FLOOR(j/(k//bands)) — a remainder would give the oracle
# extra bands and different candidate pairs.
if MINHASH_K % MINHASH_BANDS != 0:
    raise ValueError(
        f"SPARK_GRAFT_MINHASH_BANDS={MINHASH_BANDS} must divide "
        f"SPARK_GRAFT_MINHASH_K={MINHASH_K} evenly (banding contract)"
    )

# Sign-LSH knobs (dd05/es03): nbits sign bits per table, n_tables
# disjoint dim-slice tables (needs nbits*n_tables <= embedding dims;
# driver embeddings are 64-dim). Defaults are tuned TO THE OPERATING
# THRESHOLD (0.35 cosine, where this corpus's near-dups live): measured
# on sf0.01, (4 bits × 4 tables) recalls 50% of true >= 0.35 pairs at
# 23% of all-pairs work, vs 15% recall for the single 4-bit table.
# A high-threshold corpus (0.9+ dedup) flips the knobs the other way —
# p/bit ≈ 0.856 there, so (16 bits × 8 tables) holds ~50% recall at
# 65k-bucket granularity. See similarity.neardup_pairs for the formula.
LSH_NBITS = int(_os.environ.get("SPARK_GRAFT_LSH_NBITS", "4"))
LSH_TABLES = int(_os.environ.get("SPARK_GRAFT_LSH_TABLES", "4"))

# Contamination n-gram order (ct01). 7 (default) measures corpus-level
# phrase overlap without short stock phrases flooding the count; 13 is
# the common eval-set decontamination setting (a 13-gram shared with a
# benchmark is treated as contamination by most published pipelines).
# The oracle twin is built from the same constant, so the contract
# stays self-consistent at any setting.
CONTAM_NGRAM = int(_os.environ.get("SPARK_GRAFT_CONTAM_NGRAM", "7"))

# Domain-mixture temperature (dm01): weights ∝ tokens^(1/T). T = 1 is
# natural sampling; T → ∞ is uniform; 2.0 (default) is the common
# "flatten the head domains" operating point.
MIX_TEMPERATURE = float(_os.environ.get("SPARK_GRAFT_MIX_TEMP", "2.0"))


def _docs_words(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "documents").withColumn("__words", tx.words("text"))


# --- text analysis ---------------------------------------------------------

def tx01_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return (
        docs.select(
            "source",
            tx.token_count("text").alias("__tok"),
            tx.subword_count("text").alias("__sub"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").alias("total_tokens"),
            F.sum("__sub").alias("total_subwords"),
            F.round(F.sum("__tok").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_tokens"
            ),
        )
        .orderBy("source")
    )


def tx02_quality_by_lang(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    # staged projections: words/token arrays extracted ONCE per row, then
    # features derived from the shared columns (CollapseProject keeps
    # multiply-referenced non-trivial expressions un-inlined)
    base = docs.select("lang", "text", tx.words("text").alias("__w"))
    feats = base.select(
        "lang",
        tx.token_count("text").alias("__ntok"),
        tx.mean_word_length_from(F.col("__w")).alias("__mwl"),
        F.round(
            tx.marker_count("text", tx.STOPWORDS).cast("double")
            / F.nullif(F.size(F.col("__w")), F.lit(0)).cast("double"),
            6,
        ).alias("__swr"),
        tx.punct_ratio("text").alias("__pr"),
    )
    scored = feats.select(
        "lang",
        tx.quality_from_features(
            F.col("__ntok"), F.col("__mwl"), F.col("__swr"), F.col("__pr")
        ).alias("__q"),
        F.col("__mwl"),
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # per-doc scores are 4dp-rounded doubles; summing via
            # decimal keeps the aggregate order-independent
            F.round(
                F.sum(F.col("__q").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_quality"),
            F.round(
                F.sum(F.col("__mwl").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_word_len"),
        )
        .orderBy("lang")
    )


def tx03_langid_confusion(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return (
        docs.select("lang", tx.lang_id("text").alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted_lang")
    )


def tx05_token_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (source, lang): per-(source,lang),
    per-source subtotal, and grand total in ONE pass — Spark computes
    all grouping levels from a single shuffle (partial aggs are shared),
    where naive per-level queries would scan three times."""
    docs = load(spark, sf, "documents")
    return (
        docs.select("source", "lang", tx.token_count("text").alias("__tok"))
        .rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").alias("total_tokens"),
        )
        .orderBy(
            F.col("source").asc_nulls_first(), F.col("lang").asc_nulls_first()
        )
    )


def tx04_fingerprint_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return (
        docs.select("source", tx.fingerprint("text").alias("__fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("__fp").alias("n_unique_fingerprints"),
        )
        .orderBy("source")
    )


# --- deduplication ---------------------------------------------------------

def dd01_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup accounting: hash-groupBy on md5(text) per source."""
    docs = load(spark, sf, "documents")
    return (
        docs.select("source", F.md5("text").alias("__h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_docs"),
            F.countDistinct("__h").alias("kept_docs"),
            (F.count(F.lit(1)) - F.countDistinct("__h")).alias("removed_docs"),
        )
        .orderBy("source")
    )


def dd02_ngram_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """3-gram Jaccard over consecutive doc-id pairs — the exact
    similarity kernel on a linear pair list. Shingles come from the
    shared materialized LSH base (one tokenize pass per process)."""
    docs, _sigs, _pairs = _lsh_base(spark, sf)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("__sa"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("__sb"))
    return (
        a.join(b, a.id_a + 1 == b.id_b)
        .select("id_a", "id_b", dd.jaccard(F.col("__sa"), F.col("__sb")).alias("jaccard"))
        .orderBy(F.desc("jaccard"), "id_a")
        .limit(20)
    )


_LSH_BASE_CACHE: dict = {}


def _lsh_base(spark: SparkSession, sf: str):
    """Shingle table, MinHash signatures, and banded LSH candidate
    pairs, materialized to parquet ONCE per process per sf dir and
    shared by every consumer (dd03 verification, dd09 containment,
    dd10 calibration, gr01 graph QC, and the near-dup clustering
    build). In a production pipeline the candidate list IS the
    persisted dedup intermediate — generation runs once, then every
    downstream pass reads it — so the engine mirrors that instead of
    re-shingling the corpus per consumer. All three frames are
    deterministic (distinct pair set, row-local shingles/signatures),
    so materializing cannot change any result.

    Returns ``(shingles, signatures, pairs)`` DataFrames read back
    from the materialized parquet."""
    paths = _LSH_BASE_CACHE.get(sf)
    if paths is None:
        import tempfile

        root = tempfile.mkdtemp(prefix="sparkgraft_lshbase_")
        import atexit
        import shutil

        atexit.register(shutil.rmtree, root, ignore_errors=True)
        docs = _docs_words(spark, sf).select(
            "doc_id", dd.shingles(F.col("__words")).alias("__sh")
        ).persist()
        sigs = dd.minhash_signatures_agg(docs, "doc_id", "__sh", k=MINHASH_K)
        pairs = dd.lsh_candidate_pairs(
            sigs, "doc_id", "signature", k=MINHASH_K, bands=MINHASH_BANDS
        )
        paths = (f"{root}/shingles", f"{root}/signatures", f"{root}/pairs")
        docs.write.mode("overwrite").parquet(paths[0])
        sigs.write.mode("overwrite").parquet(paths[1])
        pairs.write.mode("overwrite").parquet(paths[2])
        docs.unpersist()
        _LSH_BASE_CACHE[sf] = paths
    return tuple(spark.read.parquet(p) for p in paths)


def dd03_minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash-LSH near-dup candidates, verified with exact Jaccard."""
    docs, _sigs, pairs = _lsh_base(spark, sf)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("__sa"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("__sb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", dd.jaccard(F.col("__sa"), F.col("__sb")).alias("jaccard"))
        .orderBy(F.desc("jaccard"), "id_a", "id_b")
        .limit(50)
    )


def dd11_prefix_filter_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT similarity join via prefix filtering (the PPJoin family)
    — the deterministic-complete alternative to MinHash-LSH (dd03):
    no recall loss, no probability arithmetic, same bucket-join cost
    shape. All pairs with 3-gram Jaccard ≥ 0.8, certified against a
    DuckDB oracle that computes the NAIVE all-pairs answer — the hash
    match proves the filter finds exactly the specified set, not a
    self-consistent subset.

    Algorithm: order every document's shingle set by a global
    (document-frequency asc, token asc) total order — rarest first —
    and keep only the PREFIX of size |s| − ceil(t·|s|) + 1; the
    prefix-filter theorem guarantees two sets with J ≥ t share a
    prefix token, so an equi-join on prefix tokens is a COMPLETE
    candidate generator. Prefix length uses integer arithmetic
    (ceil(4s/5) = (4s+4) div 5) — a float ceil(0.8·35) = ceil(28.0…4)
    would silently lengthen prefixes.

    Scale: candidate volume is bounded by the squared prefix-token
    inverted-list lengths — the rare-first order is what keeps those
    lists short; everything is keyed shuffles (token, then pair), and
    the exact verify runs only on candidates. The shingle table comes
    from the shared materialized LSH base (one tokenize per process).
    """
    TN, TD = 4, 5  # threshold t = TN/TD = 0.8
    docs, _sigs, _pairs = _lsh_base(spark, sf)
    tok = docs.select("doc_id", F.explode("__sh").alias("__t"))
    # Formulation note (r6 bench study): a two-window rewrite
    # (count-over-token partition for df + row_number-over-doc for the
    # prefix rank) saves one shuffle on paper but measured ~8% SLOWER
    # at sf0.1 under identical load — the vocabulary-sized groupBy +
    # per-doc hash aggregate with tiny array sorts beats sorting whole
    # doc partitions in WindowExec. Keeping the aggregate form.
    freq = tok.groupBy("__t").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    ordered = (
        tok.join(freq, "__t")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__df", "__t"))),
                lambda s: s["__t"],
            ).alias("__ord")
        )
    )
    plen = (
        f"greatest(0, size(__ord) - "
        f"(({TN} * size(__ord) + {TD} - 1) div {TD}) + 1)"
    )
    pref = ordered.select(
        "doc_id", F.explode(F.expr(f"slice(__ord, 1, {plen})")).alias("__t")
    )
    a = pref.select(F.col("doc_id").alias("id_a"), "__t")
    b = pref.select(F.col("doc_id").alias("id_b"), "__t")
    cand = (
        a.join(b, "__t")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = docs.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("__sa"))
    sb = docs.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("__sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            dd.jaccard(F.col("__sa"), F.col("__sb")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= TN / TD)
        .orderBy(F.desc("jaccard"), "id_a", "id_b")
    )


def dd04_simhash(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs_words(spark, sf)
    return dd.simhash32_agg(docs, "doc_id", F.col("__words")).orderBy("doc_id")


_NEARDUP_COMPONENTS_CACHE: dict = {}

#: se01's written schema-evolution directory, one per (process, sf) —
#: see se01_schema_evolution_read for why this is cached
_SE01_DIR_CACHE: dict = {}


def reset_shared_intermediates() -> None:
    """Drop per-process materialized intermediates (near-dup cluster
    labels) and their backing temp files. bench.py calls this at the
    start of every timed pass so each pass pays each one-time build
    exactly once — in-pass reuse (dd07 after dd06) is the measured
    architecture; cross-pass reuse would under-report the build."""
    import os
    import shutil

    for path in _NEARDUP_COMPONENTS_CACHE.values():
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    _NEARDUP_COMPONENTS_CACHE.clear()
    for paths in _LSH_BASE_CACHE.values():
        shutil.rmtree(os.path.dirname(paths[0]), ignore_errors=True)
    _LSH_BASE_CACHE.clear()
    for path in _SE01_DIR_CACHE.values():
        shutil.rmtree(path, ignore_errors=True)
    _SE01_DIR_CACHE.clear()
    # bucketed-join tables (bj01) rebuild (mode=overwrite) per pass
    # like the LSH base — clearing the cache is all it takes
    globals().get("_BJ01_TABLES", {}).clear()


def _neardup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup cluster labels (LSH candidates -> exact-Jaccard >= 0.5
    -> connected components), materialized to parquet ONCE per process
    per sf dir and shared by every consumer (dd06 labels, dd07
    representatives). In a production pipeline the cluster-label table
    is a persisted intermediate — dedup grouping runs once, then
    labelling, canonical-selection, and pruning all read it — so the
    engine mirrors that: the iterative CC fixpoint never re-runs for a
    second consumer. The output is deterministic (min reachable doc_id
    per component), so materializing cannot change any result."""
    from ..operators.graph import connected_components

    path = _NEARDUP_COMPONENTS_CACHE.get(sf)
    if path is None:
        docs, _sigs, pairs = _lsh_base(spark, sf)
        a = docs.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("__sa"))
        b = docs.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("__sb"))
        verified = (
            pairs.join(a, "id_a")
            .join(b, "id_b")
            .filter(dd.jaccard(F.col("__sa"), F.col("__sb")) >= 0.5)
            .select("id_a", "id_b")
        )
        verts = load(spark, sf, "documents").select("doc_id")
        comp = connected_components(
            verts, verified, id_col="doc_id", src="id_a", dst="id_b"
        ).select(F.col("id").alias("doc_id"), "component")
        import atexit
        import shutil
        import tempfile

        path = tempfile.mkdtemp(prefix="sparkgraft_neardup_") + "/components"
        atexit.register(
            shutil.rmtree, _os.path.dirname(path), ignore_errors=True
        )
        comp.write.mode("overwrite").parquet(path)
        _NEARDUP_COMPONENTS_CACHE[sf] = path
    return spark.read.parquet(path)


def dd06_neardup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Full dedup-grouping pipeline: LSH candidates -> exact-Jaccard
    verification (>= 0.5) -> connected components, labelling every doc
    with its cluster (min reachable doc_id; singletons label
    themselves). See operators/graph.connected_components for the
    iterative join formulation and its fixpoint determinism; the label
    table itself is a materialized shared intermediate
    (_neardup_components)."""
    return _neardup_components(spark, sf).orderBy("doc_id")


def tx06_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 terms per language by frequency: explode -> count ->
    per-group window top-k. The window runs on the already-aggregated
    (lang, word) counts, orders of magnitude smaller than the exploded
    token stream, so the rank is cheap next to the count shuffle."""
    from pyspark.sql import Window

    docs = _docs_words(spark, sf)
    counts = (
        docs.select("lang", F.explode("__words").alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "word")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "word", "n", "rk")
        .orderBy("lang", "rk")
    )


def tx11_bpe_pair_mining(spark: SparkSession, sf: str) -> DataFrame:
    """First BPE merge iteration — the corpus statistic a tokenizer
    trainer computes before every merge: over all word occurrences
    (tx06's certified tokenization), count every ADJACENT CHARACTER
    PAIR; the top pair is the next merge candidate. Per pair: total
    occurrences (token-weighted, as real BPE counts) and the number of
    distinct word types containing it.

    All JVM: one explode of per-word pair arrays
    (``transform(sequence(...))`` + ``substr`` — no UDF), then ONE
    aggregate. Scale: pair cardinality is bounded by the alphabet
    squared (≤1,296 for [a-z0-9]), so the count side map-side-combines
    to almost nothing; the distinct-word side shuffles (pair, word)
    pairs bounded by vocabulary × pairs-per-word, not corpus size.
    Top-k is TakeOrdered. Subsequent merge iterations at 100 TB repeat
    this exact plan over the re-paired corpus — the statistic, not the
    loop, is the expensive part.
    """
    w = (
        _docs_words(spark, sf)
        .select(F.explode("__words").alias("__w"))
        .filter(F.length("__w") >= 2)
    )
    pairs = w.select(
        "__w",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("__w") - 1),
                lambda i: F.col("__w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("__w").cast("bigint").alias("n_distinct_words"),
        )
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(20)
    )


# --- similarity search -----------------------------------------------------

def es01_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    return sim.cosine_topk(load(spark, sf, "embeddings"), query_vec_id=0, k=10)


def es02_consecutive_cosine(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__eb"))
    return (
        a.join(b, a.id_a + 1 == b.id_b)
        .select(
            "id_a", "id_b", sim.cosine(F.col("__ea"), F.col("__eb")).alias("cosine_sim")
        )
        .orderBy("id_a")
    )


def es03_bucketed_ann(spark: SparkSession, sf: str) -> DataFrame:
    """Sign-LSH ANN: LSH_NBITS-bit buckets (2^nbits cells — in-bucket
    candidate volume ~n²/2^nbits per table) with recall recovered by
    LSH_TABLES hash tables over disjoint dim slices (defaults 4 bits ×
    4 tables); see similarity.neardup_pairs for the recall
    arithmetic."""
    return sim.bucketed_ann_topk(
        load(spark, sf, "embeddings"), query_vec_id=0, k=10,
        nbits=LSH_NBITS, n_tables=LSH_TABLES,
    )


def es04_ivf_ann(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN (nprobe=1, deterministic centroids) — the coarse-
    quantization scale path next to the LSH one (es03)."""
    return sim.ivf_topk(
        load(spark, sf, "embeddings"), query_vec_id=0, k=10, n_centroids=16
    )


def es06_ivf_kmeans_ann(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN with REAL iterated k-means coarse quantization — a
    deterministic fixed-seed, fixed-iteration Lloyd's loop (lowest-id
    init, decimal-exact centroid means rounded to 6 dp, empty clusters
    keep their position; see similarity.lloyd_centroids) so the
    trained index is bit-reproducible cross-engine and carries a full
    hash-checked DuckDB oracle. Spark ML KMeans remains available as
    similarity.ivf_kmeans_topk (pytest-covered) for deployments that
    prefer the ML-lib trainer over oracle reproducibility; the search
    plumbing (broadcast centroids, map-only assign, nprobe=1 cell
    scan) is identical in both."""
    return sim.lloyd_ivf_topk(
        load(spark, sf, "embeddings"), query_vec_id=0, k=10,
        n_centroids=16, n_iter=2,
    )


RRF_DEPTH = 20  # per-leg candidate depth
RRF_K = 60      # the standard RRF dampening constant


def rrf01_hybrid_rank_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion — the two-signal
    search shape retrieval-augmented curation pipelines actually run:
    a dense leg (cosine against a query embedding) and a sparse leg
    (distinct-token overlap with the query document) each produce a
    bounded top-``RRF_DEPTH`` candidate list, fused by
    ``sum(1/(60+rank))`` over the union. ``doc_id == vec_id`` is the
    corpus contract (documents and embeddings are row-aligned); doc 0
    / vec 0 is the query and is excluded from both legs.

    100 TB design: each leg ends in ``orderBy().limit(RRF_DEPTH)`` —
    TakeOrdered, a per-partition heap + driver merge, never a global
    sort. Ranks are then row_number over the ALREADY-bounded 20-row
    frames (the single-partition WindowExec is safe only because its
    input is bounded by construction — the same two-phase discipline
    as operators/ranking.py), and the fusion join is 20×20. The dense
    leg broadcasts one query vector; the sparse leg broadcasts one
    document's distinct-token set (bounded by one document's length)
    and reduces corpus tokens through a semi-join BEFORE the per-doc
    count, so nothing unbounded ever shuffles. Ties at every boundary
    break on id; cosine rounds to 4 dp first (the es01 convention),
    so the certified hash is engine-neutral.
    """
    from pyspark.sql import Window

    emb = load(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__q")
    )
    dense = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("id"),
            sim.cosine(F.col("embedding"), F.col("__q")).alias("__cos"),
        )
        .orderBy(F.desc("__cos"), "id")
        .limit(RRF_DEPTH)
    )
    dense = dense.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.desc("__cos"), "id"))
        .cast("int")
        .alias("dense_rank"),
    )
    toks = (
        load(spark, sf, "documents")
        .select("doc_id", F.explode(tx.words("text")).alias("__tok"))
        .distinct()
    )
    qtok = toks.filter(F.col("doc_id") == 0).select("__tok")
    sparse = (
        toks.filter(F.col("doc_id") != 0)
        .join(F.broadcast(qtok), "__tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__ov"))
        .orderBy(F.desc("__ov"), "doc_id")
        .limit(RRF_DEPTH)
    )
    sparse = sparse.select(
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.desc("__ov"), "doc_id"))
        .cast("int")
        .alias("sparse_rank"),
    )
    one = F.lit(1.0)
    return (
        dense.join(sparse, "id", "full_outer")
        .select(
            "id",
            "dense_rank",
            "sparse_rank",
            F.round(
                F.coalesce(one / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0))
                + F.coalesce(one / (F.lit(RRF_K) + F.col("sparse_rank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "id")
        .limit(10)
    )


def sa01_salted_event_totals(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-resistant two-stage aggregation over the events table.

    event_type has ~5 values over millions of rows — exactly the shape
    that melts a single reducer at 100 TB. Results are exact (decimal
    partials) and equal the plain GROUP BY the oracle runs.
    """
    from ..operators.skew import salted_aggregate

    ev = load(spark, sf, "events").select(
        "event_type",
        "event_id",
        dec("value").alias("__sum_value"),
    )
    out = salted_aggregate(ev, ["event_type"], salt_on="event_id", n_salts=32)
    return (
        out.select(
            "event_type",
            "n",
            F.round(F.col("__sum_value").cast("double"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


def sa02_salted_skew_join(spark: SparkSession, sf: str) -> DataFrame:
    """Salted join on a pathologically skewed key: event_type has ~5
    values over the whole table, so a plain shuffle join funnels each
    type to one reducer. salted_join spreads each type over 16 salts;
    the result is identical to the plain join (which is what the oracle
    runs)."""
    from ..operators.skew import salted_join

    ev = load(spark, sf, "events")
    tiers = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "tier",
            F.when(F.length("event_type") > 5, "long").otherwise("short"),
        )
    )
    joined = salted_join(ev, tiers, "event_type", salt_source="event_id")
    return (
        joined.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 4
            ).alias("total_value"),
        )
        .orderBy("tier")
    )


def dd05_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, multi-table sign-LSH-blocked:
    LSH_NBITS-bit buckets bound in-bucket pair volume at ~n²/2^nbits
    per table, and LSH_TABLES tables over disjoint dim slices recover
    the recall finer buckets give up (defaults 4 bits × 4 tables —
    measured ~50% recall at the 0.35 operating threshold for ~23% of
    all-pairs work; similarity.neardup_pairs quantifies both)."""
    return (
        sim.neardup_pairs(
            load(spark, sf, "embeddings"), threshold=0.35,
            nbits=LSH_NBITS, n_tables=LSH_TABLES,
        )
        .orderBy(F.desc("cosine_sim"), "id_a", "id_b")
        .limit(100)
    )


# --- multimodal ------------------------------------------------------------

def mm01_media_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column metadata extraction via Arrow-batched mapInPandas
    (documents' utf-8 bytes standing in for media payloads)."""
    media = documents_as_media(load(spark, sf, "documents"))
    meta = extract_metadata(media)
    return (
        meta.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("header_byte").cast("bigint").alias("header_byte_sum"),
            F.sum(F.col("is_empty").cast("long")).alias("n_empty"),
        )
        .orderBy("source")
    )


def mm02_resize_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """Aspect-preserving resize into a 32x32 box (codec stubbed; the
    Arrow-batched mapInPandas plumbing and integer arithmetic are real)."""
    media = documents_as_media(load(spark, sf, "documents"))
    return (
        resize_images(media, max_dim=32)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("out_width").cast("bigint").alias("sum_out_width"),
            F.sum("out_height").cast("bigint").alias("sum_out_height"),
            F.max("width").alias("max_width"),
        )
        .orderBy("source")
    )


def mm03_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-stride frame sampling: one-to-many mapInPandas explode of
    each payload into frame rows, then a rollup proving the shape."""
    media = documents_as_media(load(spark, sf, "documents"))
    return (
        sample_frames(media, stride=256)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_frames"),
            F.sum("frame_n_bytes").alias("sum_frame_bytes"),
            F.max("frame_idx").alias("max_frame_idx"),
        )
        .orderBy("source")
    )


def mm04_feature_means(spark: SparkSession, sf: str) -> DataFrame:
    """Binary -> feature-vector extraction (stub model over Arrow
    batches), rolled up as the element-wise mean vector per source:
    posexplode -> per-(source, position) avg -> re-assemble ordered."""
    media = documents_as_media(load(spark, sf, "documents"))
    feats = extract_features(media)
    # flattened to scalar columns (mean_f0..f3) — array-typed result
    # columns are valid but scalar outputs hash-compare robustly across
    # harnesses
    return (
        feats.select(
            "source",
            *[F.element_at("features", i + 1).alias(f"__f{i}") for i in range(4)],
        )
        .groupBy("source")
        .agg(
            *[F.round(F.avg(f"__f{i}"), 4).alias(f"mean_f{i}") for i in range(4)]
        )
        .orderBy("source")
    )


# --- oracle twins ----------------------------------------------------------

_WORDS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_H60 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"

# THE 32-token chunk rule (tx08's certified convention, reused by sl01)
# — one definition so the chunk boundary cannot desynchronize between
# consumers. The zero-word guard is load-bearing: Spark's
# sequence(0, -1) yields [0, -1] (descending default step), which would
# emit two phantom md5('') chunks for a doc with no [a-z0-9] tokens,
# while the DuckDB twins' range(0, 0) emits none.
_CHUNKS32_EXPR = (
    "CASE WHEN size(__words) = 0 "
    "THEN CAST(array() AS ARRAY<ARRAY<STRING>>) "
    "ELSE transform(sequence(0, int(ceil(size(__words) / 32.0)) - 1), "
    "i -> slice(__words, i * 32 + 1, 32)) END"
)

# THE train/val/test hash-band rule (ss03's certified convention,
# reused by sl01): multiplicative hash of doc_id, 80/10/10 bands —
# Spark Column and SQL twin built from one definition each.
_SPLIT_HASH = 2654435761
_SPLIT_CASE_SQL = (
    f"CASE WHEN (doc_id * {_SPLIT_HASH}) % 4294967296 % 100 < 80 "
    "THEN 'train' "
    f"WHEN (doc_id * {_SPLIT_HASH}) % 4294967296 % 100 < 90 THEN 'val' "
    "ELSE 'test' END"
)


def _split_col() -> "F.Column":
    band = (F.col("doc_id") * F.lit(_SPLIT_HASH)) % F.lit(4294967296) % 100
    return (
        F.when(band < 80, F.lit("train"))
        .when(band < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def ss01_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic hash-based sampling (Knuth multiplicative hash on
    the key, mod-100 threshold): the scale-honest way to sample — no
    RNG state, reproducible across engines/runs, and each executor
    decides row-locally with zero shuffle. Per-language sampled counts
    verify the ~10% rate is unbiased across strata."""
    docs = load(spark, sf, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    sampled = F.when(h % 100 < 10, F.lit(1)).otherwise(F.lit(0))
    return (
        docs.select("lang", sampled.alias("__s"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__s").cast("bigint").alias("n_sampled"),
            F.round(
                F.sum("__s").cast("double") / F.count(F.lit(1)) * 100, 4
            ).alias("sample_pct"),
        )
        .orderBy("lang")
    )


def _quality_verdicts(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc first-failing-rule verdict frame (doc_id, source, lang,
    __v) — the shared kernel behind qf01 (rollup) and cur01 (funnel
    composition). All features are the shared JVM text expressions —
    one regex pass per feature per row, zero Python."""
    docs = load(spark, sf, "documents")
    base = docs.select(
        "doc_id", "source", "lang", "text", tx.words("text").alias("__w")
    )
    feats = base.select(
        "doc_id",
        "source",
        "lang",
        tx.token_count("text").alias("__tok"),
        tx.mean_word_length_from(F.col("__w")).alias("__mwl"),
        F.round(
            tx.marker_count("text", tx.STOPWORDS).cast("double")
            / F.nullif(F.size(F.col("__w")), F.lit(0)).cast("double"),
            6,
        ).alias("__swr"),
        tx.punct_ratio("text").alias("__pr"),
        tx.lang_id("text").alias("__pred"),
    )
    scored = feats.withColumn(
        "__q",
        tx.quality_from_features(
            F.col("__tok"), F.col("__mwl"), F.col("__swr"), F.col("__pr")
        ),
    )
    return scored.withColumn(
        "__v",
        F.when(F.col("__tok") < 5, F.lit("too_short"))
        .when(F.col("__q") < 0.5, F.lit("low_quality"))
        .when(F.col("__pred") != F.col("lang"), F.lit("langid_mismatch"))
        .otherwise(F.lit("pass")),
    )


def qf01_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Document quality-filter funnel with first-failing-rule
    attribution — the keep/drop gate every training-data pipeline runs
    before anything expensive touches a document. Rules evaluate in a
    fixed order (too_short → low_quality → langid_mismatch) and each
    doc counts against its FIRST failure only, so the per-rule columns
    are disjoint and sum with n_pass to n_docs (same accounting
    contract as the ETL validation, operators/validate.py). Kernel
    shared with cur01 (_quality_verdicts)."""
    verdict = _quality_verdicts(spark, sf)
    cnt = lambda v: F.sum((F.col("__v") == v).cast("long")).alias(  # noqa: E731
        f"n_{v}"
    )
    return (
        verdict.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt("pass"),
            cnt("too_short"),
            cnt("low_quality"),
            cnt("langid_mismatch"),
            F.round(
                F.sum((F.col("__v") == "pass").cast("long")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("pass_rate"),
        )
        .orderBy("lang")
    )


def sp01_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT-size stratified sampling: per (source, lang) stratum keep
    exactly ceil(n/10) docs — the first tenth in deterministic
    multiplicative-hash order — where plain Bernoulli sampling (ss01)
    only hits 10% in expectation. Per-stratum ranking runs through the
    distributed two-phase rank (operators/ranking.py), so a stratum
    with billions of rows never funnels through one sort task; the
    sampled-id sum pins exact membership, not just counts."""
    from ..operators.ranking import attach_global_row_number

    docs = load(spark, sf, "documents").select("source", "lang", "doc_id")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    ranked = attach_global_row_number(
        docs.withColumn("__h", h),
        order_by=[F.asc("__h"), F.asc("doc_id")],
        partition_by=["source", "lang"],
        rn_col="__rn",
        total_col="__n",
    )
    # ceil(n/10) in exact integer math (a 0.1 double multiply could
    # round differently across engines at boundary strata)
    take = F.expr("(__n + 9) div 10")
    picked = ranked.withColumn(
        "__in", (F.col("__rn") <= take).cast("long")
    )
    return (
        picked.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__in").cast("bigint").alias("n_sampled"),
            F.sum(
                F.when(F.col("__in") == 1, F.col("doc_id")).otherwise(F.lit(0))
            ).cast("bigint").alias("sampled_docid_sum"),
        )
        .orderBy("source", "lang")
    )


def ct01_cross_source_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source contamination check — the decontamination step that
    keeps benchmark/eval text out of a training corpus — at two
    granularities per source pair: whole-document fingerprint matches
    (functions/text.fingerprint — case/punctuation/whitespace-
    insensitive md5) and shared n-gram shingles (the n-gram-overlap
    method real decontamination pipelines run; CONTAM_NGRAM defaults to
    7 so short stock phrases don't flood the count, 13 is the common
    eval-decontamination setting). Both granularities flow through ONE
    tagged union: distinct-reduce to (source, kind, unit-hash) BEFORE
    the self-join, so join inputs are one row per source per unique
    text unit, the join keys on 60-bit hashes — never full documents —
    and both counts come from a single equi-join + conditional
    aggregate instead of two join pipelines stitched with a full outer
    join. At 100 TB: one distinct shuffle and one equi-join total,
    nothing quadratic.

    Tokenization is STAGED through its own projection (``__words``):
    inlining ``tx.words`` into the shingle lambda makes Spark re-evaluate
    the regexp per lambda reference (CollapseProject refuses to merge
    it, but a hand-inlined expression is already duplicated) — measured
    3.5x slower at sf0.1."""
    return _contamination(spark, sf, n=CONTAM_NGRAM)


def _contamination(spark: SparkSession, sf: str, n: int) -> DataFrame:
    docs = load(spark, sf, "documents")
    fp = docs.select(
        "source",
        F.lit("fp").alias("__k"),
        tx.fingerprint("text").alias("__u"),
    )
    # n-grams shuffle as 60-bit hex hashes (15 md5 chars), not ~50-char
    # gram strings — a ~3x narrower distinct+join payload; a collision
    # counts a false shared gram with probability ~n²/2^61, and the
    # oracle twin applies the identical hash so results match exactly.
    words = docs.select("source", tx.words("text").alias("__words"))
    grams = words.select(
        "source", F.explode(dd.shingles(F.col("__words"), n=n)).alias("__g")
    ).select(
        "source",
        F.lit("g").alias("__k"),
        F.substring(F.md5(F.col("__g")), 1, 15).alias("__u"),
    )
    units = fp.unionByName(grams)
    # r14 (the _gr05_copurchase_edges pattern, guide §2.4): the former
    # distinct + self-join-on-(kind, unit) + pair rollup paid three
    # shuffles and re-shuffled the unit stream twice for the join. ONE
    # groupBy(kind, unit).collect_set(source) dedups exactly like the
    # distinct did (set semantics per unit) and the sorted source set
    # emits each unordered (source_a < source_b) pair once MAP-SIDE —
    # per-unit fan-out bounded by |sources|² (sources are a handful by
    # schema), so the pair rollup sees the identical row multiset and
    # every certified count is unchanged (oracle keeps the textbook
    # self-join twin).
    per_unit = units.groupBy("__k", "__u").agg(
        F.array_sort(F.collect_set("source")).alias("__ss")
    )
    pairs = per_unit.select(
        "__k",
        F.explode(
            F.expr(
                "flatten(transform(__ss, (x, i) -> "
                "transform(slice(__ss, i + 2, size(__ss)), "
                "y -> struct(x AS source_a, y AS source_b))))"
            )
        ).alias("__p"),
    ).select("__k", F.col("__p.source_a"), F.col("__p.source_b"))
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.sum(F.when(F.col("__k") == "fp", 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared_fingerprints"),
            F.sum(F.when(F.col("__k") == "g", 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_shared_{n}grams"),
        )
        .orderBy("source_a", "source_b")
    )


def _contaminated_doc_ids(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct training doc_ids sharing at least one CONTAM_NGRAM-gram
    with the held-out eval set (source 'src0') — ct02's detection
    kernel, shared with cur01. The eval gram set distinct-reduces and
    broadcasts; the corpus side never shuffles."""
    n = CONTAM_NGRAM
    docs = load(spark, sf, "documents")
    words = docs.select("doc_id", "source", tx.words("text").alias("__words"))
    grams = words.select(
        "doc_id",
        "source",
        F.explode(dd.shingles(F.col("__words"), n=n)).alias("__g"),
    ).select(
        "doc_id", "source", F.substring(F.md5(F.col("__g")), 1, 15).alias("__u")
    )
    eval_grams = (
        grams.filter(F.col("source") == "src0").select("__u").distinct()
    )
    return (
        grams.filter(F.col("source") != "src0")
        .join(F.broadcast(eval_grams), "__u")
        .select("doc_id")
        .distinct()
    )


def _span_gram_doc_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Per-(doc_id, source, 60-bit span-gram hash) POSITION COUNTS at
    the CONTAM_NGRAM order — the shared reduced form of the span-gram
    position stream (r13; ct05's exposure rollup and cur03's
    decontamination stage both build on it). Aggregating occurrences
    to counts first (guide §2.3) means every downstream consumer
    shuffles doc-distinct grams instead of raw positions, and because
    each consumer's plan contains the IDENTICAL (doc_id, source, __u)
    Exchange subtree, Spark plans it once and reuses it
    (ReusedExchange) — the corpus-side explode runs exactly once per
    query instead of once per consumer."""
    docs = load(spark, sf, "documents")
    words = docs.select(
        "doc_id", "source", tx.words("text").alias("__words")
    )
    return (
        words.select(
            "doc_id",
            "source",
            F.explode(
                dd.span_grams(F.col("__words"), CONTAM_NGRAM)
            ).alias("__g"),
        )
        .select(
            "doc_id",
            "source",
            F.substring(F.md5("__g"), 1, 15).alias("__u"),
        )
        .groupBy("doc_id", "source", "__u")
        .agg(F.count(F.lit(1)).alias("__k"))
    )


def _cross_source_shared_grams(pu: DataFrame) -> DataFrame:
    """ct01's sharing rule over the reduced count frame: hashes whose
    distinct-per-source unit appears in >= 2 sources."""
    return (
        pu.select("source", "__u")
        .distinct()
        .groupBy("__u")
        .agg(F.count(F.lit(1)).alias("__ns"))
        .filter(F.col("__ns") >= 2)
        .select("__u")
    )


def ct02_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Eval-set decontamination REMOVAL (ct01 measures, this enforces):
    treating source 'src0' as the held-out eval set, a training doc from
    any other source is contaminated when it shares at least one
    CONTAM_NGRAM-gram with any eval doc. The eval gram set
    distinct-reduces first and is explicitly broadcast — at 100 TB the
    eval side is a benchmark suite (tiny), so the contaminated-doc scan
    is one broadcast semi-join over the training grams, no shuffle of
    the corpus. Reported per source: kept/dropped counts — the numbers
    a decontamination run logs before writing the clean corpus. Kernel
    shared with cur01 (_contaminated_doc_ids)."""
    docs = load(spark, sf, "documents")
    contaminated = _contaminated_doc_ids(spark, sf).withColumn(
        "__hit", F.lit(1)
    )
    train = docs.filter(F.col("source") != "src0").select("doc_id", "source")
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("__hit", F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated"),
            (F.count(F.lit(1)) - F.sum(F.coalesce("__hit", F.lit(0))))
            .cast("bigint")
            .alias("n_kept"),
            F.round(
                F.sum(F.coalesce("__hit", F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


def tx09_unigram_surprisal(spark: SparkSession, sf: str) -> DataFrame:
    """LM-perplexity proxy for quality scoring (the CCNet recipe with a
    unigram model): train per-language unigram frequencies over the
    corpus, score each doc by mean -log2 p(word), roll up per (lang,
    surprisal quartile bucket). Two aggregates and one token-level
    equi-join — the exploded token stream joins the (lang, word)
    frequency table on its key, so cost is one shuffle of tokens plus a
    frequency lookup that AQE broadcasts when the vocab is small.
    Probabilities are ratios of exact counts and log2 is applied once
    per (lang, word) pair — deterministic across partitionings. The
    doc-level MEAN is a partition-order-dependent double sum, so the
    surprisal is rounded to 6 dp before bucketing (both engines): a
    doc landing within 1e-6 of a bucket boundary can no longer flip
    buckets between runs or between Spark and the oracle."""
    from pyspark.sql import Window

    docs = _docs_words(spark, sf)
    toks = docs.select(
        "doc_id", "lang", F.explode(F.col("__words")).alias("__w")
    )
    vocab = (
        toks.groupBy("lang", "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn("__total", F.sum("__c").over(Window.partitionBy("lang")))
        .withColumn("__nll", -F.log2(F.col("__c") / F.col("__total")))
    )
    per_doc = (
        toks.join(vocab.select("lang", "__w", "__nll"), ["lang", "__w"])
        .groupBy("doc_id", "lang")
        .agg(F.avg("__nll").alias("__surprisal"))
    )
    bucket = F.least(
        F.floor(F.round(F.col("__surprisal"), 6) / 2).cast("int"), F.lit(7)
    )
    return (
        per_doc.withColumn("__b", bucket)
        .groupBy("lang", "__b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("__surprisal"), 4).alias("avg_surprisal"),
        )
        .select(
            "lang",
            F.col("__b").alias("surprisal_bucket"),
            "n_docs",
            "avg_surprisal",
        )
        .orderBy("lang", "surprisal_bucket")
    )


def dd08_repeated_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Span-level dedup signal (the exact-substring method of Lee et
    al.'s dedup work, at fixed span length): 16-token spans appearing
    in two or more distinct documents, with occurrence multiplicity —
    the spans a span-dedup pass would cut. Spans shuffle as 60-bit
    hashes; the aggregate is explode → groupBy(hash) with map-side
    partial aggregation — one shuffle, scales with the corpus. Top 20
    by spread with a full deterministic tie-break."""
    spans = _docs_words(spark, sf).select(
        "doc_id",
        F.explode(dd.span_grams(F.col("__words"), 16)).alias("__s"),
    ).select("doc_id", F.substring(F.md5(F.col("__s")), 1, 15).alias("__h"))
    return (
        spans.groupBy("__h")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(F.col("__h").alias("span_hash"), "n_docs", "n_occurrences")
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "span_hash")
        .limit(20)
    )


def es07_quantization_qc(spark: SparkSession, sf: str) -> DataFrame:
    """Int8 symmetric quantization QC for the embedding store — the
    compression step an ANN serving layer applies (scale = max|x|/127,
    q = round(x/scale), reconstruct q*scale) — reporting per label the
    reconstruction MSE and the scale spread. All row-local higher-order
    array expressions (aggregate/transform folds are sequential in both
    engines, so per-vector results are bit-deterministic); only the
    per-label averages shuffle. Squares use multiplication, not pow()
    — IEEE pow is not guaranteed exactly-rounded, x*x is."""
    emb = load(spark, sf, "embeddings")
    base = emb.select(
        "label",
        "embedding",
        F.expr(
            "aggregate(embedding, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
        ).alias("__amax"),
    ).withColumn("__scale", F.col("__amax") / F.lit(127.0))
    recon_err = (
        "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + "
        "(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / __scale) * __scale)"
        " * "
        "(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / __scale) * __scale)"
        ") / size(embedding)"
    )
    per_vec = base.withColumn(
        "__mse",
        F.when(F.col("__amax") == 0.0, F.lit(0.0)).otherwise(
            F.expr(recon_err)
        ),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(F.avg("__amax"), 6).alias("avg_amax"),
            F.round(F.avg("__mse"), 8).alias("avg_mse"),
            F.round(F.max("__mse"), 8).alias("max_mse"),
        )
        .orderBy("label")
    )


def inc01_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental-batch dedup — the admission step when a NEW crawl
    batch (here: source 'src19') lands against an accumulated corpus
    (every other source). Two checks, both on the whitespace-robust
    fingerprint: in-batch keep-first (row_number over the fingerprint,
    doc_id order — a key-partitioned window, never single-partition)
    and batch-vs-corpus membership (the corpus fingerprint set
    distinct-reduces, then joins the batch). No explicit broadcast
    hint on the corpus side — Spark honors explicit hints regardless
    of size, and the corpus is the BIG side (19/20 of the data), so a
    forced broadcast would OOM at scale; leaving the choice to
    AQE/autoBroadcastThreshold means a small corpus broadcasts and a
    100 TB corpus degrades to a shuffle join with identical semantics.
    Per lang: batch size, in-batch dups, corpus dups, net new docs."""
    from pyspark.sql import Window

    docs = load(spark, sf, "documents")
    batch = docs.filter(F.col("source") == "src19").select(
        "doc_id", "lang", tx.fingerprint("text").alias("__fp")
    )
    corpus_fps = (
        docs.filter(F.col("source") != "src19")
        .select(tx.fingerprint("text").alias("__fp"))
        .distinct()
        .withColumn("__in_corpus", F.lit(1))
    )
    w = Window.partitionBy("__fp").orderBy("doc_id")
    classified = (
        batch.withColumn("__rn", F.row_number().over(w))
        .join(corpus_fps, "__fp", "left")
        .withColumn(
            "__class",
            F.when(F.col("__rn") > 1, F.lit("batch_dup"))
            .when(F.col("__in_corpus").isNotNull(), F.lit("corpus_dup"))
            .otherwise(F.lit("new")),
        )
    )
    return (
        classified.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_batch_docs"),
            F.sum(F.when(F.col("__class") == "batch_dup", 1).otherwise(0))
            .cast("bigint")
            .alias("n_batch_dups"),
            F.sum(F.when(F.col("__class") == "corpus_dup", 1).otherwise(0))
            .cast("bigint")
            .alias("n_corpus_dups"),
            F.sum(F.when(F.col("__class") == "new", 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
        )
        .orderBy("lang")
    )


def inc02_corpus_growth_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-run dedup manifest — inc01's corpus-growth sibling: replay
    the ingest history (source srcN = arrival batch N, the batch
    identity the warehouse snapshot manifests record) and account, for
    EVERY batch, what admission-time dedup against the union of batches
    0..N−1 keeps: doc count, prior-corpus dups, in-batch dups, net-new
    docs, and the running corpus size after each run — the growth curve
    an ops dashboard plots from the load manifests.

    ONE shuffle on the fingerprint does all the classification: within
    a fingerprint, rows sort by (batch, doc_id); the global first row
    is the net-new admission, later rows in the SAME batch are in-batch
    dups, rows in LATER batches are prior-corpus dups (min(batch) over
    the fingerprint rides the same exchange as the row_number). The
    per-batch rollup has one row per ingest run — manifest metadata,
    same boundedness class as the date spine — so the closing running
    total over batch order is a bounded window, not a data-sized
    single-partition sort. The driver corpus is dup-free at this
    fingerprint (all dup columns 0 — still hash-checked end-to-end);
    the collision semantics are pinned on constructed batches in
    tests/test_round5_queries.py."""
    from pyspark.sql import Window

    d = load(spark, sf, "documents").select(
        "doc_id",
        F.regexp_extract("source", r"([0-9]+)$", 1).cast("int").alias("batch"),
        tx.fingerprint("text").alias("__fp"),
    )
    wp = Window.partitionBy("__fp")
    wo = Window.partitionBy("__fp").orderBy("batch", "doc_id")
    cls = d.withColumn("__minb", F.min("batch").over(wp)).withColumn(
        "__rn", F.row_number().over(wo)
    )
    per = cls.groupBy("batch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("batch") > F.col("__minb")).cast("long"))
        .cast("bigint")
        .alias("n_prior_dups"),
        F.sum(
            ((F.col("batch") == F.col("__minb")) & (F.col("__rn") > 1)).cast(
                "long"
            )
        )
        .cast("bigint")
        .alias("n_inbatch_dups"),
        F.sum((F.col("__rn") == 1).cast("long")).cast("bigint").alias("n_new"),
    )
    wrun = Window.orderBy("batch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.withColumn(
        "corpus_size", F.sum("n_new").over(wrun).cast("bigint")
    ).orderBy("batch")


def px01_pii_scan(spark: SparkSession, sf: str) -> DataFrame:
    """PII scan + redaction accounting (functions/text.PII_PATTERNS:
    email, SSN, phone, IPv4 — RE2-safe regexes). Per-class COUNTS run
    each pattern independently on the raw text, so classes may overlap
    (an SSN also matches the phone shape and lands in both counts);
    only REDACTION applies the classes in a fixed order, so a span is
    replaced exactly once. Per source: per-class match counts, docs
    carrying any PII, and the net character delta of
    replacing every match with '[PII]'. Pure regexp_count /
    regexp_replace — JVM codegen, zero Python, so the same expressions
    run unchanged over 100 TB. The driver corpus is synthetic-clean
    (all counts 0 — still hash-checked end-to-end); the match/redact
    semantics are pinned on adversarial strings in
    tests/test_functions.py."""
    docs = load(spark, sf, "documents")
    kinds = list(tx.PII_PATTERNS)
    per_doc = docs.select(
        "source",
        *[tx.pii_count("text", k).alias(f"__{k}") for k in kinds],
        (F.length("text") - F.length(tx.pii_redact("text"))).alias("__delta"),
    )
    any_hit = sum((F.col(f"__{k}") for k in kinds), F.lit(0))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.sum(f"__{k}").cast("bigint").alias(f"n_{k}")
                for k in kinds
            ],
            F.sum(F.when(any_hit > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_with_pii"),
            F.sum("__delta").cast("bigint").alias("redaction_char_delta"),
        )
        .orderBy("source")
    )


def rep01_repetition_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition quality signals, rolled up per source:
    duplicate-word fraction (1 - distinct/total) and top-bigram
    fraction (most frequent bigram's share of all bigram positions —
    NON-distinct shingles, occurrences matter here). A doc is flagged
    when either exceeds its threshold (0.6 / 0.1 on this corpus). The
    bigram frequency table is explode → groupBy(doc_id, gram) — a
    key-partitioned aggregate that scales with the shuffle, never a
    per-doc Python pass; word arrays are staged through a projection
    (the ct01 lesson — inlined tokenizers re-evaluate per lambda
    reference)."""
    docs = load(spark, sf, "documents")
    base = docs.select("doc_id", "source", tx.words("text").alias("__w"))
    bigrams = dd.span_grams(F.col("__w"), 2)
    feats = base.select(
        "doc_id",
        "source",
        F.when(F.size("__w") == 0, F.lit(0.0))
        .otherwise(
            F.lit(1.0)
            - F.size(F.array_distinct("__w")).cast("double") / F.size("__w")
        )
        .alias("__dupfrac"),
    )
    top = (
        base.select("doc_id", F.explode(bigrams).alias("__g"))
        .groupBy("doc_id", "__g")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("__top"), F.sum("count").alias("__tot"))
    )
    per_doc = feats.join(top, "doc_id", "left").withColumn(
        "__topfrac",
        F.when(F.col("__tot").isNull(), F.lit(0.0)).otherwise(
            F.col("__top").cast("double") / F.col("__tot")
        ),
    )
    flagged = (F.col("__dupfrac") > 0.6) | (F.col("__topfrac") > 0.1)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__dupfrac"), 4).alias("avg_dup_word_frac"),
            F.round(F.avg("__topfrac"), 4).alias("avg_top_bigram_frac"),
            F.sum(F.when(flagged, 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
            F.round(
                F.sum(F.when(flagged, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("flagged_rate"),
        )
        .orderBy("source")
    )


def dm01_domain_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-mixture sampling weights: per-source token mass, its
    natural share, and the temperature-flattened share
    (tokens^(1/T) / Σ tokens^(1/T), T = MIX_TEMPERATURE) — the
    source-weighting step a multi-corpus training run applies so no
    single domain dominates. One fact-sized aggregate; the two totals
    ride a broadcast scalar (the q09 percent-of-total pattern), so
    nothing funnels through a single partition."""
    docs = load(spark, sf, "documents")
    per = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tx.token_count("text")).cast("bigint").alias("total_tokens"),
        )
        .withColumn(
            "__pw",
            F.pow(
                F.col("total_tokens").cast("double"),
                F.lit(1.0 / MIX_TEMPERATURE),
            ),
        )
    )
    totals = per.agg(
        F.sum("total_tokens").cast("double").alias("__t"),
        F.sum("__pw").alias("__tp"),
    )
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.round(F.col("total_tokens") / F.col("__t"), 6).alias(
                "natural_share"
            ),
            F.round(F.col("__pw") / F.col("__tp"), 6).alias(
                "temperature_share"
            ),
        )
        .orderBy("source")
    )


def pk01_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy sequence packing: per language, documents in doc_id order
    fill fixed 512-token context windows; a doc belongs to the bin its
    running prefix starts in (the streaming sample-packing rule). The
    running token count is a DISTRIBUTED PREFIX SUM
    (operators/ranking.py running_sum_of) — `SUM() OVER (PARTITION BY
    lang ORDER BY doc_id)` semantics without one task per language
    sorting the whole corpus. Rolled up per language: bins used, docs
    packed, fill ratio vs the budget."""
    from ..operators.ranking import attach_global_row_number

    budget = 512
    docs = load(spark, sf, "documents").select(
        "lang", "doc_id", tx.token_count("text").alias("__tok")
    )
    packed = attach_global_row_number(
        docs,
        order_by=[F.asc("doc_id")],
        partition_by=["lang"],
        rn_col="__rn",
        running_sum_of="__tok",
        running_sum_col="__run",
    )
    binned = packed.withColumn(
        "__bin", F.expr(f"(__run - __tok) div {budget}")
    )
    return (
        binned.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("__bin").alias("n_bins"),
            F.sum("__tok").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum("__tok").cast("double")
                / (F.countDistinct("__bin") * budget),
                4,
            ).alias("fill_ratio"),
        )
        .orderBy("lang")
    )


def dd07_cluster_representatives(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical-document selection: the step after near-dup clustering
    where the pipeline keeps ONE representative per cluster (here:
    longest doc, doc_id tie-break) and drops the rest. Reads the
    materialized cluster-label intermediate (_neardup_components), so
    the LSH+CC pipeline is never re-executed for this second consumer;
    only the per-cluster window rank runs here."""
    from pyspark.sql import Window

    comp = _neardup_components(spark, sf)
    docs = load(spark, sf, "documents").select("doc_id", "n_chars")
    sized = (
        comp.join(docs, "doc_id")
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("component")),
        )
        .filter(F.col("cluster_size") >= 2)
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), "doc_id")
    return (
        sized.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "component",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").alias("rep_chars"),
            "cluster_size",
        )
        .orderBy("component")
    )


def es05_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label mean embedding, computed array-natively: posexplode to
    (label, dim, val) rows and aggregate per position. The explode is
    map-side (no shuffle until the groupBy on label×dim — 640 groups);
    sums run in DECIMAL so partition order can't change the result."""
    emb = load(spark, sf, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("dim", "val"))
    return (
        ex.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(
                    F.col("val").cast("double").cast("decimal(25,10)")
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("centroid"),
        )
        .orderBy("label", "dim")
    )


def tx07_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 terms per language by tf-idf (idf computed within the
    language's own document set): explode → (tf, df) in ONE aggregate
    pass → broadcast the per-language doc counts → window rank on the
    already-tiny (lang, word) frame."""
    from pyspark.sql import Window

    docs = _docs_words(spark, sf)
    ex = docs.select("lang", "doc_id", F.explode("__words").alias("word"))
    tf = ex.groupBy("lang", "word").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    nlang = docs.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    scored = tf.join(F.broadcast(nlang), "lang").select(
        "lang",
        "word",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("tfidf"), "word")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "word", "tf", "df", "tfidf", "rk")
        .orderBy("lang", "rk")
    )


def json01_props_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured column handling: extract a typed field from the
    JSON `props` payload (JVM-side `get_json_object`, no Python) and
    aggregate it per event type. At scale the extraction runs inside
    whole-stage codegen alongside the scan — no materialized
    intermediate column."""
    ev = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("__k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("__k").alias("min_k"),
            F.max("__k").alias("max_k"),
            F.sum("__k").alias("sum_k"),
            F.round(F.sum("__k").cast("double") / F.count("__k"), 6).alias(
                "avg_k"
            ),
        )
        .orderBy("event_type")
    )


def q34_priority_metrics_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot/melt: the wide per-priority aggregate row goes long as
    (priority, metric, value) via `stack` — the inverse of q10's pivot.
    The stack runs on the already-aggregated frame (5 rows), so the
    reshape is free at any fact scale."""
    from ..plans.analytics import davg, dsum

    o = load(spark, sf, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("__cnt"),
        dsum("o_totalprice").alias("__total"),
        davg("o_totalprice").alias("__avg"),
    )
    return (
        agg.select(
            "o_orderpriority",
            F.expr(
                "stack(3, 'avg_amount', __avg, 'total_amount', __total,"
                " 'transaction_count', cast(__cnt as double))"
                " as (metric, value)"
            ),
        )
        .orderBy("o_orderpriority", "metric")
    )


def tx08_chunk_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Document chunking — the pre-tokenization step that splits each
    doc into fixed-size token windows: array-slice into 32-token chunks
    (pure JVM `transform`/`slice`, no shuffle, no Python) and emit one
    row per chunk with its token count and content hash."""
    docs = _docs_words(spark, sf)
    chunks = docs.select(
        "doc_id",
        F.posexplode(F.expr(_CHUNKS32_EXPR)).alias("chunk_idx", "__chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("__chunk").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", "__chunk")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


def hll01_distinct_users_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counting — the sketch that
    replaces exact COUNT(DISTINCT) at 100 TB (mergeable partials, no
    giant shuffle of raw keys).

    ROWS-ONLY BY DESIGN (the registry's single deliberate rows-only
    row, r7 verdict task 5 resolution: KEEP, annotated): this query
    exercises Spark's ENGINE-INTERNAL HLL++ estimator
    (`approx_count_distinct`), whose register layout and bias
    correction are implementation-specific — no other engine can
    reproduce its estimates bit-for-bit, so a DuckDB value-hash twin
    is impossible by construction, not by omission. The sketch
    family's hash-certified siblings cover everything certifiable:
    hll02 (deterministic re-implementation of the HLL register
    pipeline, green r7), hll03 (merge-equivalence certification,
    promoted r8), and lc01 (linear counting). hll01 stays as the
    engine-internal comparison row — its output carries the exact
    COUNT(DISTINCT) twin column so the driver's rows-only check still
    pins cardinality and schema, and local pytest bounds the estimate
    error against the exact twin (tests/test_new_queries.py::
    test_hll_estimate_tracks_exact_count)."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias(
                "approx_users"
            ),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .orderBy("event_type")
    )


def _sql_span_grams(words: str, n: int) -> str:
    # dedup.span_grams twin: _sql_shingles without list_distinct
    return (
        f"CASE WHEN len({words}) >= {n} THEN list_transform("
        f"range(1, len({words}) - {n - 2}), i -> array_to_string({words}[i:i+{n - 1}], ' '))"
        f" ELSE [] END"
    )


def _sql_shingles(words: str, n: int = 3) -> str:
    # DuckDB list slice [i:j] is INCLUSIVE of j and range(a, b) excludes
    # b, so an n-gram starting at i is {words}[i:i+n-1] for
    # i in [1, len-n+1] — mirror of dedup.shingles
    return (
        f"CASE WHEN len({words}) >= {n} THEN list_distinct(list_transform("
        f"range(1, len({words}) - {n - 2}), i -> array_to_string({words}[i:i+{n - 1}], ' ')))"
        f" ELSE [] END"
    )


_QUALITY = """
  ROUND(
    (CASE WHEN len(regexp_extract_all(text, '\\S+')) >= 20 THEN 0.25
          ELSE CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) / 80.0 END)
    + (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN swr >= 0.05 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN pr <= 0.1 THEN 0.25 ELSE 0.0 END), 4)
"""

_MWL = (
    "ROUND(CAST(length(array_to_string({w}, '')) AS DOUBLE)"
    " / CAST(NULLIF(len({w}), 0) AS DOUBLE), 4)"
)
_SWR = (
    "ROUND(CAST(len(regexp_extract_all(lower(text), "
    "'\\b(the|a|an|and|of|to|in|is|it|for)\\b')) AS DOUBLE)"
    " / CAST(NULLIF(len({w}), 0) AS DOUBLE), 6)"
)
_PR = (
    "ROUND(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)"
    " / CAST(NULLIF(length(text), 0) AS DOUBLE), 6)"
)

EXTENSION_ORACLE: dict[str, str] = {}

EXTENSION_ORACLE["tx01_token_stats"] = """
WITH t AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok,
         CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS sub
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS total_tokens,
       CAST(SUM(sub) AS BIGINT) AS total_subwords,
       ROUND(CAST(SUM(tok) AS DOUBLE) / COUNT(*), 4) AS avg_tokens
FROM t GROUP BY source ORDER BY source
"""

EXTENSION_ORACLE["tx02_quality_by_lang"] = f"""
WITH base AS (
  SELECT lang, text, {_WORDS} AS w FROM documents
), feats AS (
  SELECT lang, text,
         {_MWL.format(w='w')} AS mwl,
         {_SWR.format(w='w')} AS swr,
         {_PR} AS pr
  FROM base
), scored AS (
  SELECT lang, {_QUALITY} AS q, mwl FROM feats
)
SELECT lang, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(q AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_quality,
       ROUND(CAST(SUM(CAST(mwl AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_word_len
FROM scored GROUP BY lang ORDER BY lang
"""

_LANG_SCORES = """
  len(regexp_extract_all(lower(text), '\\b(the|and|of|is|to)\\b')) AS s_en,
  len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b')) AS s_de,
  len(regexp_extract_all(lower(text), '\\b(le|les|et|est|une)\\b')) AS s_fr,
  len(regexp_extract_all(lower(text), '\\b(el|los|y|es|una)\\b')) AS s_es
"""

EXTENSION_ORACLE["tx03_langid_confusion"] = f"""
WITH scores AS (
  SELECT lang, {_LANG_SCORES} FROM documents
), pred AS (
  SELECT lang,
         CASE WHEN s_en > 0 AND s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
              WHEN s_de > 0 AND s_de = GREATEST(s_en, s_de, s_fr, s_es) THEN 'de'
              WHEN s_fr > 0 AND s_fr = GREATEST(s_en, s_de, s_fr, s_es) THEN 'fr'
              WHEN s_es > 0 AND s_es = GREATEST(s_en, s_de, s_fr, s_es) THEN 'es'
              ELSE 'unknown' END AS predicted_lang
  FROM scores
)
SELECT lang, predicted_lang, COUNT(*) AS n_docs
FROM pred GROUP BY lang, predicted_lang ORDER BY lang, predicted_lang
"""

EXTENSION_ORACLE["tx05_token_rollup"] = """
WITH t AS (
  SELECT source, lang,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok
  FROM documents
)
SELECT source, lang, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS total_tokens
FROM t GROUP BY ROLLUP (source, lang)
ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST
"""

EXTENSION_ORACLE["tx04_fingerprint_stats"] = """
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g'))) AS n_unique_fingerprints
FROM documents GROUP BY source ORDER BY source
"""

EXTENSION_ORACLE["dd01_exact_dedup"] = """
SELECT source, COUNT(*) AS total_docs,
       COUNT(DISTINCT md5(text)) AS kept_docs,
       COUNT(*) - COUNT(DISTINCT md5(text)) AS removed_docs
FROM documents GROUP BY source ORDER BY source
"""

_JACCARD = (
    "ROUND(CAST(len(list_intersect({a}, {b})) AS DOUBLE) / "
    "CAST(NULLIF(len({a}) + len({b}) - len(list_intersect({a}, {b})), 0) AS DOUBLE), 6)"
)

EXTENSION_ORACLE["dd02_ngram_jaccard_pairs"] = f"""
WITH sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       {_JACCARD.format(a='a.s', b='b.s')} AS jaccard
FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id
ORDER BY jaccard DESC, id_a LIMIT 20
"""

EXTENSION_ORACLE["dd03_minhash_lsh_pairs"] = f"""
WITH sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range({MINHASH_K})) AS j) GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ',')) AS band_key
  FROM pj GROUP BY doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, {_JACCARD.format(a='sa.s', b='sb.s')} AS jaccard
FROM pairs JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
ORDER BY jaccard DESC, id_a, id_b LIMIT 50
"""


def _simhash_sql() -> str:
    hashes = (
        f"list_transform(list_distinct({_WORDS}), w -> "
        f"{_H60.format(x='w')} % 2147483648)"
    )
    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {b}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(32)
    )
    return f"""
WITH hs_t AS (SELECT doc_id, {hashes} AS hs FROM documents)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash
FROM hs_t ORDER BY doc_id
"""


EXTENSION_ORACLE["dd04_simhash"] = _simhash_sql()

# double-precision sequential fold, identical to similarity.dot/norm
_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_NORM = (
    "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)
_COS = (
    f"ROUND({_DOT} / NULLIF({_NORM.format(a='{a}')} * {_NORM.format(a='{b}')}, 0.0), 4)"
)

EXTENSION_ORACLE["es01_cosine_topk"] = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id, {_COS.format(a='embedding', b='qe')} AS cosine_sim
FROM embeddings, q WHERE vec_id <> 0
ORDER BY cosine_sim DESC, vec_id LIMIT 10
"""

EXTENSION_ORACLE["es02_consecutive_cosine"] = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_COS.format(a='a.embedding', b='b.embedding')} AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
ORDER BY id_a
"""

def _bucket_sql(offset: int, nbits: int = LSH_NBITS) -> str:
    """Sign-bucket of dims [offset+1, offset+nbits] — mirror of
    similarity.sign_bucket."""
    return " + ".join(
        f"(CASE WHEN {{e}}[{offset + i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(nbits)
    )


# per-table banded layout (vec_id, table, bucket) — mirror of the
# posexplode in similarity.neardup_pairs / bucketed_ann_topk
_BANDED = " UNION ALL ".join(
    f"SELECT vec_id, embedding, {t} AS tbl, "
    f"CAST({_bucket_sql(t * LSH_NBITS).format(e='embedding')} AS INT) AS bucket "
    f"FROM embeddings"
    for t in range(LSH_TABLES)
)

# rrf01's oracle ranks BOTH full legs with window functions and cuts
# to the same depth — certifying that the TakeOrdered-then-rank plan
# equals the global-rank specification (row_number with the full
# tie-break order is unique, so top-20-then-rank == rank-then-top-20).
# 1/(60+rank) is CAST to DOUBLE explicitly: bare 1.0 is DECIMAL in
# DuckDB and decimal division would diverge from Spark's IEEE double.
EXTENSION_ORACLE["rrf01_hybrid_rank_fusion"] = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
dense AS (
  SELECT vec_id AS id, {_COS.format(a='embedding', b='qe')} AS cos
  FROM embeddings, q WHERE vec_id <> 0
  ORDER BY cos DESC, id LIMIT 20
),
dranked AS (
  SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, id) AS INT)
         AS dense_rank
  FROM dense
),
toks AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents)
),
qtok AS (SELECT tok FROM toks WHERE doc_id = 0),
sparse AS (
  SELECT t.doc_id AS id, COUNT(*) AS ov
  FROM toks t JOIN qtok USING (tok)
  WHERE t.doc_id <> 0
  GROUP BY t.doc_id
  ORDER BY ov DESC, id LIMIT 20
),
sranked AS (
  SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY ov DESC, id) AS INT)
         AS sparse_rank
  FROM sparse
)
SELECT id, d.dense_rank, s.sparse_rank,
       ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + d.dense_rank), 0.0)
             + COALESCE(CAST(1 AS DOUBLE) / (60 + s.sparse_rank), 0.0),
             6) AS rrf_score
FROM dranked d FULL JOIN sranked s USING (id)
ORDER BY rrf_score DESC, id LIMIT 10
"""

EXTENSION_ORACLE["es03_bucketed_ann"] = f"""
WITH banded AS ({_BANDED}),
q AS (SELECT embedding AS qe, tbl, bucket FROM banded WHERE vec_id = 0)
SELECT DISTINCT vec_id, {_COS.format(a='b.embedding', b='q.qe')} AS cosine_sim
FROM banded b JOIN q ON b.tbl = q.tbl AND b.bucket = q.bucket
WHERE vec_id <> 0
ORDER BY cosine_sim DESC, vec_id LIMIT 10
"""

EXTENSION_ORACLE["es04_ivf_ann"] = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
  ORDER BY vec_id LIMIT 16
), scored AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {_DOT.format(a='e.embedding', b='c.cvec')}
           / NULLIF({_NORM.format(a='e.embedding')} * {_NORM.format(a='c.cvec')}, 0.0) AS sim
  FROM embeddings e CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, embedding, cid AS centroid
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC NULLS LAST, cid) AS rn
        FROM scored)
  WHERE rn = 1
), q AS (
  SELECT embedding AS qe, centroid AS qc FROM assigned WHERE vec_id = 0
)
SELECT a.vec_id, {_COS.format(a='a.embedding', b='q.qe')} AS cosine_sim
FROM assigned a, q
WHERE a.centroid = q.qc AND a.vec_id <> 0
ORDER BY cosine_sim DESC, a.vec_id LIMIT 10
"""

EXTENSION_ORACLE["sa01_salted_event_totals"] = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""

EXTENSION_ORACLE["sa02_salted_skew_join"] = """
WITH tiers AS (
  SELECT DISTINCT event_type,
         CASE WHEN length(event_type) > 5 THEN 'long' ELSE 'short' END AS tier
  FROM events
)
SELECT t.tier,
       COUNT(*) AS event_count,
       ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_value
FROM events e JOIN tiers t ON e.event_type = t.event_type
GROUP BY t.tier
ORDER BY t.tier
"""

EXTENSION_ORACLE["dd05_embedding_neardup"] = f"""
WITH banded AS ({_BANDED}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b,
       {_COS.format(a='ea.embedding', b='eb.embedding')} AS cosine_sim
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.id_a
JOIN embeddings eb ON eb.vec_id = c.id_b
WHERE {_COS.format(a='ea.embedding', b='eb.embedding')} >= 0.35
ORDER BY cosine_sim DESC, id_a, id_b LIMIT 100
"""

EXTENSION_ORACLE["qf01_quality_filter"] = f"""
WITH base AS (
  SELECT lang, text, {_WORDS} AS w FROM documents
), feats AS (
  SELECT lang, text,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok,
         {_MWL.format(w='w')} AS mwl,
         {_SWR.format(w='w')} AS swr,
         {_PR} AS pr,
         {_LANG_SCORES}
  FROM base
), scored AS (
  SELECT lang, tok, {_QUALITY} AS q,
         CASE WHEN s_en > 0 AND s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
              WHEN s_de > 0 AND s_de = GREATEST(s_en, s_de, s_fr, s_es) THEN 'de'
              WHEN s_fr > 0 AND s_fr = GREATEST(s_en, s_de, s_fr, s_es) THEN 'fr'
              WHEN s_es > 0 AND s_es = GREATEST(s_en, s_de, s_fr, s_es) THEN 'es'
              ELSE 'unknown' END AS pred
  FROM feats
), verdict AS (
  SELECT lang,
         CASE WHEN tok < 5 THEN 'too_short'
              WHEN q < 0.5 THEN 'low_quality'
              WHEN pred <> lang THEN 'langid_mismatch'
              ELSE 'pass' END AS v
  FROM scored
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN v = 'pass' THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN v = 'too_short' THEN 1 ELSE 0 END) AS BIGINT) AS n_too_short,
       CAST(SUM(CASE WHEN v = 'low_quality' THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
       CAST(SUM(CASE WHEN v = 'langid_mismatch' THEN 1 ELSE 0 END) AS BIGINT) AS n_langid_mismatch,
       ROUND(CAST(SUM(CASE WHEN v = 'pass' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS pass_rate
FROM verdict GROUP BY lang ORDER BY lang
"""

def _contamination_oracle(n: int) -> str:
    """DuckDB twin of _contamination(n): identical tagged-union shape,
    identical unit hashes (md5 hex for fingerprints, 15-hex-char md5
    prefix for grams)."""
    return f"""
WITH units AS (
  SELECT DISTINCT source, 'fp' AS k,
         md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS u
  FROM documents
  UNION
  SELECT DISTINCT source, 'g' AS k, substr(md5(u), 1, 15) AS u
  FROM (SELECT source, unnest({_sql_shingles(_WORDS, n)}) AS u FROM documents)
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(SUM(CASE WHEN a.k = 'fp' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_fingerprints,
       CAST(SUM(CASE WHEN a.k = 'g' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_{n}grams
FROM units a JOIN units b
  ON a.k = b.k AND a.u = b.u AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
"""


EXTENSION_ORACLE["ct01_cross_source_contamination"] = _contamination_oracle(
    CONTAM_NGRAM
)

EXTENSION_ORACLE["ct02_decontaminate"] = f"""
WITH w AS (
  SELECT doc_id, source, {_WORDS} AS w FROM documents
), g AS (
  SELECT doc_id, source, substr(md5(u), 1, 15) AS u
  FROM (SELECT doc_id, source, unnest({_sql_shingles('w', CONTAM_NGRAM)}) AS u FROM w)
), ev AS (
  SELECT DISTINCT u FROM g WHERE source = 'src0'
), hit AS (
  SELECT DISTINCT g.doc_id FROM g JOIN ev USING (u) WHERE g.source <> 'src0'
)
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       CAST(SUM(CASE WHEN hit.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       ROUND(CAST(SUM(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 4) AS contamination_rate
FROM documents d LEFT JOIN hit ON d.doc_id = hit.doc_id
WHERE d.source <> 'src0'
GROUP BY d.source ORDER BY d.source
"""

_PII_E = tx.PII_PATTERNS

_PII_REDACTED = "text"
for _pat in _PII_E.values():
    _PII_REDACTED = f"regexp_replace({_PII_REDACTED}, '{_pat}', '[PII]', 'g')"

EXTENSION_ORACLE["tx09_unigram_surprisal"] = f"""
WITH w AS (
  SELECT doc_id, lang, {_WORDS} AS w FROM documents
), t AS (
  SELECT doc_id, lang, unnest(w) AS word FROM w
), v AS (
  SELECT lang, word, COUNT(*) AS c FROM t GROUP BY lang, word
), v2 AS (
  SELECT lang, word,
         -log2(CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY lang)) AS nll
  FROM v
), pd AS (
  SELECT t.doc_id, t.lang, AVG(nll) AS s
  FROM t JOIN v2 ON t.lang = v2.lang AND t.word = v2.word
  GROUP BY t.doc_id, t.lang
)
SELECT lang,
       CAST(LEAST(FLOOR(ROUND(s, 6) / 2), 7) AS INT) AS surprisal_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(s), 4) AS avg_surprisal
FROM pd GROUP BY lang, surprisal_bucket
ORDER BY lang, surprisal_bucket
"""

EXTENSION_ORACLE["dd08_repeated_spans"] = f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), g AS (
  SELECT doc_id, substr(md5(u), 1, 15) AS h
  FROM (SELECT doc_id, unnest({_sql_span_grams('w', 16)}) AS u FROM w)
)
SELECT h AS span_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occurrences DESC, span_hash LIMIT 20
"""

EXTENSION_ORACLE["es07_quantization_qc"] = """
WITH per AS (
  SELECT label,
         list_aggregate(list_transform(embedding,
           x -> abs(CAST(x AS DOUBLE))), 'max') AS amax,
         embedding
  FROM embeddings
), mse AS (
  SELECT label, amax,
         CASE WHEN amax = 0 THEN 0.0 ELSE
           list_sum(list_transform(embedding, x ->
             (CAST(x AS DOUBLE)
               - round(CAST(x AS DOUBLE) / (amax / 127.0)) * (amax / 127.0))
             *
             (CAST(x AS DOUBLE)
               - round(CAST(x AS DOUBLE) / (amax / 127.0)) * (amax / 127.0))
           )) / len(embedding) END AS m
  FROM per
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(AVG(amax), 6) AS avg_amax,
       ROUND(AVG(m), 8) AS avg_mse,
       ROUND(MAX(m), 8) AS max_mse
FROM mse GROUP BY label ORDER BY label
"""

EXTENSION_ORACLE["inc01_incremental_dedup"] = """
WITH b AS (
  SELECT doc_id, lang,
         md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
  FROM documents WHERE source = 'src19'
), c AS (
  SELECT DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
  FROM documents WHERE source <> 'src19'
), r AS (
  SELECT b.lang,
         ROW_NUMBER() OVER (PARTITION BY b.fp ORDER BY b.doc_id) AS rn,
         CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END AS inc
  FROM b LEFT JOIN c ON b.fp = c.fp
)
SELECT lang, COUNT(*) AS n_batch_docs,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_batch_dups,
       CAST(SUM(CASE WHEN rn = 1 AND inc = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corpus_dups,
       CAST(SUM(CASE WHEN rn = 1 AND inc = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new
FROM r GROUP BY lang ORDER BY lang
"""

EXTENSION_ORACLE["px01_pii_scan"] = f"""
WITH per AS (
  SELECT source,
         len(regexp_extract_all(text, '{_PII_E["email"]}')) AS e,
         len(regexp_extract_all(text, '{_PII_E["ssn"]}')) AS s,
         len(regexp_extract_all(text, '{_PII_E["phone"]}')) AS p,
         len(regexp_extract_all(text, '{_PII_E["ipv4"]}')) AS i,
         length(text) - length({_PII_REDACTED}) AS delta
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(e) AS BIGINT) AS n_email,
       CAST(SUM(s) AS BIGINT) AS n_ssn,
       CAST(SUM(p) AS BIGINT) AS n_phone,
       CAST(SUM(i) AS BIGINT) AS n_ipv4,
       CAST(SUM(CASE WHEN e + s + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_with_pii,
       CAST(SUM(delta) AS BIGINT) AS redaction_char_delta
FROM per GROUP BY source ORDER BY source
"""

EXTENSION_ORACLE["rep01_repetition_stats"] = f"""
WITH w AS (
  SELECT doc_id, source, {_WORDS} AS w FROM documents
), f AS (
  SELECT doc_id, source,
         CASE WHEN len(w) = 0 THEN 0.0
              ELSE 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END
           AS dupfrac,
         CASE WHEN len(w) >= 2 THEN list_transform(
                range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
              ELSE [] END AS bg
  FROM w
), bgc AS (
  SELECT doc_id, u, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(bg) AS u FROM f) GROUP BY doc_id, u
), top AS (
  SELECT doc_id, MAX(c) AS topc, SUM(c) AS totc FROM bgc GROUP BY doc_id
), per_doc AS (
  SELECT f.source, f.dupfrac,
         CASE WHEN top.totc IS NULL THEN 0.0
              ELSE CAST(top.topc AS DOUBLE) / top.totc END AS topfrac
  FROM f LEFT JOIN top ON f.doc_id = top.doc_id
)
SELECT source, COUNT(*) AS n_docs,
       ROUND(AVG(dupfrac), 4) AS avg_dup_word_frac,
       ROUND(AVG(topfrac), 4) AS avg_top_bigram_frac,
       CAST(SUM(CASE WHEN dupfrac > 0.6 OR topfrac > 0.1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged,
       ROUND(CAST(SUM(CASE WHEN dupfrac > 0.6 OR topfrac > 0.1
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
         AS flagged_rate
FROM per_doc GROUP BY source ORDER BY source
"""

EXTENSION_ORACLE["dm01_domain_mixture"] = f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
           AS total_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(total_tokens) AS DOUBLE) AS t,
         SUM(pow(CAST(total_tokens AS DOUBLE), {1.0 / MIX_TEMPERATURE})) AS tp
  FROM per
)
SELECT source, n_docs, total_tokens,
       ROUND(total_tokens / t, 6) AS natural_share,
       ROUND(pow(CAST(total_tokens AS DOUBLE), {1.0 / MIX_TEMPERATURE}) / tp, 6)
         AS temperature_share
FROM per, tot ORDER BY source
"""

EXTENSION_ORACLE["sp01_stratified_sample"] = """
WITH d AS (
  SELECT source, lang, doc_id,
         (doc_id * 2654435761) % 4294967296 AS h
  FROM documents
), r AS (
  SELECT source, lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source, lang ORDER BY h, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source, lang) AS n
  FROM d
)
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn <= (n + 9) // 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN rn <= (n + 9) // 10 THEN doc_id ELSE 0 END) AS BIGINT) AS sampled_docid_sum
FROM r GROUP BY source, lang ORDER BY source, lang
"""

EXTENSION_ORACLE["pk01_sequence_packing"] = """
WITH t AS (
  SELECT lang, doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok
  FROM documents
), r AS (
  SELECT lang, tok,
         SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM t
), b AS (
  SELECT lang, tok, (run - tok) // 512 AS bin FROM r
)
SELECT lang, COUNT(*) AS n_docs,
       COUNT(DISTINCT bin) AS n_bins,
       CAST(SUM(tok) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(tok) AS DOUBLE) / (COUNT(DISTINCT bin) * 512), 4) AS fill_ratio
FROM b GROUP BY lang ORDER BY lang
"""

EXTENSION_ORACLE["mm01_media_metadata"] = """
SELECT source, COUNT(*) AS n_items,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(SUM(ascii(substr(text, 1, 1))) AS BIGINT) AS header_byte_sum,
       CAST(SUM(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
FROM documents GROUP BY source ORDER BY source
"""


EXTENSION_ORACLE["mm02_resize_metadata"] = """
WITH dims AS (
  SELECT source,
         (octet_length(encode(text)) % 64) + 1 AS w,
         (octet_length(encode(text)) % 48) + 1 AS h
  FROM documents
), scaled AS (
  SELECT source, w, h, greatest(w, h, 32) AS m FROM dims
)
SELECT source,
       COUNT(*) AS n_items,
       CAST(SUM(greatest(1, (w * 32) // m)) AS BIGINT) AS sum_out_width,
       CAST(SUM(greatest(1, (h * 32) // m)) AS BIGINT) AS sum_out_height,
       CAST(MAX(w) AS INT) AS max_width
FROM scaled GROUP BY source ORDER BY source
"""

EXTENSION_ORACLE["mm03_frame_sample"] = """
WITH sizes AS (
  SELECT source, octet_length(encode(text)) AS n,
         (octet_length(encode(text)) + 255) // 256 AS nf
  FROM documents
)
SELECT source,
       CAST(SUM(nf) AS BIGINT) AS total_frames,
       CAST(SUM(n) AS BIGINT) AS sum_frame_bytes,
       CAST(MAX(CASE WHEN nf > 0 THEN nf - 1 END) AS INT) AS max_frame_idx
FROM sizes GROUP BY source ORDER BY source
"""

EXTENSION_ORACLE["mm04_feature_means"] = """
WITH f AS (
  SELECT source,
         CAST((octet_length(encode(text)) % 64) + 1 AS DOUBLE) AS f0,
         CAST((octet_length(encode(text)) % 48) + 1 AS DOUBLE) AS f1,
         CAST(octet_length(encode(text)) % 256 AS DOUBLE) AS f2,
         CAST(COALESCE(ascii(substr(text, 1, 1)), 0) AS DOUBLE) AS f3
  FROM documents
)
SELECT source,
       ROUND(AVG(f0), 4) AS mean_f0, ROUND(AVG(f1), 4) AS mean_f1,
       ROUND(AVG(f2), 4) AS mean_f2, ROUND(AVG(f3), 4) AS mean_f3
FROM f GROUP BY source ORDER BY source
"""

EXTENSION_QUERIES = {
    "tx01_token_stats": tx01_token_stats,
    "tx02_quality_by_lang": tx02_quality_by_lang,
    "tx03_langid_confusion": tx03_langid_confusion,
    "tx04_fingerprint_stats": tx04_fingerprint_stats,
    "tx05_token_rollup": tx05_token_rollup,
    "dd01_exact_dedup": dd01_exact_dedup,
    "dd02_ngram_jaccard_pairs": dd02_ngram_jaccard_pairs,
    "dd03_minhash_lsh_pairs": dd03_minhash_lsh_pairs,
    "dd04_simhash": dd04_simhash,
    "dd05_embedding_neardup": dd05_embedding_neardup,
    "es01_cosine_topk": es01_cosine_topk,
    "es02_consecutive_cosine": es02_consecutive_cosine,
    "es03_bucketed_ann": es03_bucketed_ann,
    "es04_ivf_ann": es04_ivf_ann,
    "sa01_salted_event_totals": sa01_salted_event_totals,
    "sa02_salted_skew_join": sa02_salted_skew_join,
    "mm01_media_metadata": mm01_media_metadata,
    "mm02_resize_metadata": mm02_resize_metadata,
    "mm03_frame_sample": mm03_frame_sample,
    "mm04_feature_means": mm04_feature_means,
}

EXTENSION_ORACLE["tx06_top_terms"] = f"""
WITH w AS (
  SELECT lang, unnest({_WORDS}) AS word FROM documents
), c AS (
  SELECT lang, word, COUNT(*) AS n FROM w GROUP BY lang, word
), rk AS (
  SELECT lang, word, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word) AS INT) AS rk
  FROM c
)
SELECT lang, word, n, rk FROM rk WHERE rk <= 5 ORDER BY lang, rk
"""

# transitive closure of the verified near-dup pairs; MIN(reachable id)
# per vertex equals the fixpoint label operators/graph.py converges to.
EXTENSION_ORACLE["dd06_neardup_clusters"] = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range({MINHASH_K})) AS j) GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ',')) AS band_key
  FROM pj GROUP BY doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
), good AS (
  SELECT id_a, id_b
  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
  WHERE {_JACCARD.format(a='sa.s', b='sb.s')} >= 0.5
), edges AS (
  SELECT id_a AS s, id_b AS d FROM good
  UNION ALL SELECT id_b AS s, id_a AS d FROM good
), reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
)
SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id ORDER BY doc_id
"""

EXTENSION_ORACLE["ss01_hash_sample"] = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 10
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       ROUND(CAST(SUM(CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 10
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 100, 4) AS sample_pct
FROM documents
GROUP BY lang
ORDER BY lang
"""

# dd06's transitive-closure CTE extended with representative selection
EXTENSION_ORACLE["dd07_cluster_representatives"] = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range({MINHASH_K})) AS j) GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ',')) AS band_key
  FROM pj GROUP BY doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
), good AS (
  SELECT id_a, id_b
  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
  WHERE {_JACCARD.format(a='sa.s', b='sb.s')} >= 0.5
), edges AS (
  SELECT id_a AS s, id_b AS d FROM good
  UNION ALL SELECT id_b AS s, id_a AS d FROM good
), reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
), comp AS (
  SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id
), sized AS (
  SELECT c.component, c.doc_id, d.n_chars,
         COUNT(*) OVER (PARTITION BY c.component) AS cluster_size
  FROM comp c JOIN documents d USING (doc_id)
), flt AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rk
  FROM sized WHERE cluster_size >= 2
)
SELECT component, doc_id AS rep_doc_id, n_chars AS rep_chars, cluster_size
FROM flt WHERE rk = 1 ORDER BY component
"""

EXTENSION_ORACLE["es05_label_centroids"] = """
SELECT label, CAST(d - 1 AS INT) AS dim,
       COUNT(*) AS n_vecs,
       ROUND(CAST(SUM(CAST(CAST(embedding[d] AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE)
             / COUNT(*), 6) AS centroid
FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d)
GROUP BY label, d
ORDER BY label, dim
"""

EXTENSION_ORACLE["tx07_tfidf_top_terms"] = f"""
WITH w AS (
  SELECT lang, doc_id, unnest({_WORDS}) AS word FROM documents
), tfdf AS (
  SELECT lang, word, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
  FROM w GROUP BY lang, word
), nl AS (
  SELECT lang, COUNT(DISTINCT doc_id) AS n_docs FROM documents GROUP BY lang
), scored AS (
  SELECT t.lang, t.word, t.tf, t.df,
         ROUND(t.tf * ln(CAST(nl.n_docs AS DOUBLE) / t.df), 6) AS tfidf
  FROM tfdf t JOIN nl ON t.lang = nl.lang
), rk AS (
  SELECT lang, word, tf, df, tfidf,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY tfidf DESC, word) AS INT) AS rk
  FROM scored
)
SELECT lang, word, tf, df, tfidf, rk FROM rk WHERE rk <= 5 ORDER BY lang, rk
"""

EXTENSION_ORACLE["json01_props_stats"] = """
SELECT event_type,
       COUNT(*) AS n_events,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       ROUND(CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE)
             / COUNT(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""

EXTENSION_ORACLE["q34_priority_metrics_unpivot"] = """
WITH agg AS (
  SELECT o_orderpriority,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(o_totalprice), 6) AS avg
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, metric, value FROM (
  SELECT o_orderpriority, 'avg_amount' AS metric, avg AS value FROM agg
  UNION ALL
  SELECT o_orderpriority, 'total_amount', total FROM agg
  UNION ALL
  SELECT o_orderpriority, 'transaction_count', CAST(cnt AS DOUBLE) FROM agg
)
ORDER BY o_orderpriority, metric
"""

EXTENSION_ORACLE["tx08_chunk_stats"] = f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS words FROM documents
), ch AS (
  SELECT doc_id, unnest(range(0, CAST(CEIL(len(words) / 32.0) AS INT))) AS chunk_idx,
         words
  FROM w
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       len(words[chunk_idx * 32 + 1 : chunk_idx * 32 + 32]) AS chunk_tokens,
       md5(array_to_string(words[chunk_idx * 32 + 1 : chunk_idx * 32 + 32], ' ')) AS chunk_hash
FROM ch
ORDER BY doc_id, chunk_idx
"""

EXTENSION_QUERIES["json01_props_stats"] = json01_props_stats
EXTENSION_QUERIES["q34_priority_metrics_unpivot"] = q34_priority_metrics_unpivot
EXTENSION_QUERIES["tx08_chunk_stats"] = tx08_chunk_stats
# hll01 intentionally has NO oracle entry: HLL estimates are
# engine-specific (driver records the weaker rows-only check)
EXTENSION_QUERIES["hll01_distinct_users_sketch"] = hll01_distinct_users_sketch

EXTENSION_QUERIES["ss01_hash_sample"] = ss01_hash_sample
# dd06 before dd07: the cluster pipeline builds the materialized label
# table; dd07 (canonical selection) is its downstream consumer
EXTENSION_QUERIES["dd06_neardup_clusters"] = dd06_neardup_clusters
EXTENSION_QUERIES["dd07_cluster_representatives"] = dd07_cluster_representatives
EXTENSION_QUERIES["es05_label_centroids"] = es05_label_centroids
EXTENSION_QUERIES["tx07_tfidf_top_terms"] = tx07_tfidf_top_terms

EXTENSION_QUERIES["tx06_top_terms"] = tx06_top_terms
EXTENSION_QUERIES["qf01_quality_filter"] = qf01_quality_filter
EXTENSION_QUERIES["es06_ivf_kmeans_ann"] = es06_ivf_kmeans_ann
EXTENSION_QUERIES["rrf01_hybrid_rank_fusion"] = rrf01_hybrid_rank_fusion


_LLOYD_SIM = (
    f"{_DOT.format(a='{e}', b='{c}')} / "
    f"NULLIF({_NORM.format(a='{e}')} * {_NORM.format(a='{c}')}, 0.0)"
)


def _lloyd_assign_cte(
    name: str,
    ed: str,
    cents: str,
    select: str = "vec_id, v, cid",
    extra_expr: str = "",
) -> str:
    """THE assignment rule as SQL — the DuckDB twin of
    similarity.assign_to_centroids (argmax cosine, DESC NULLS LAST,
    centroid-id tie-break), shared by every oracle that assigns vectors
    to centroids so the rule cannot desynchronize between queries."""
    s = _LLOYD_SIM.format(e="e.v", c="c.cvec")
    return (
        f"{name} AS (SELECT {select} FROM ("
        f"SELECT e.vec_id, e.v, c.cid{extra_expr}, ROW_NUMBER() OVER ("
        f"PARTITION BY e.vec_id ORDER BY {s} DESC NULLS LAST, c.cid"
        f") AS rn FROM {ed} e CROSS JOIN {cents} c) WHERE rn = 1)"
    )


def _lloyd_chain(
    prefix: str, vec_sql: str, dims: int, n_centroids: int, n_iter: int
) -> tuple[list[str], str, str]:
    """CTE chain for one deterministic Lloyd's run (the DuckDB twin of
    similarity.lloyd_centroids) over ``vec_sql`` (a list-valued
    expression on the embeddings table). Returns (ctes, ed_name,
    final_centroid_cte_name); the caller appends its own final
    assignment/consumer CTEs. ``prefix`` namespaces the CTEs so two
    runs (e.g. es12's per-subspace codebooks) can share one query."""
    ed, c = f"{prefix}ed", f"{prefix}c"
    ctes = [
        f"{ed} AS (SELECT vec_id, "
        f"list_transform({vec_sql}, x -> CAST(x AS DOUBLE)) AS v "
        f"FROM embeddings)",
        f"{c}0 AS (SELECT vec_id AS cid, v AS cvec FROM {ed} "
        f"ORDER BY vec_id LIMIT {n_centroids})",
    ]
    for it in range(1, n_iter + 1):
        prev, cur = f"{c}{it - 1}", f"{c}{it}"
        ctes.append(_lloyd_assign_cte(f"{prefix}a{it}", ed, prev))
        ctes.append(
            f"{prefix}m{it} AS (SELECT cid, list(m ORDER BY dim) AS newvec "
            f"FROM (SELECT cid, d - 1 AS dim, "
            f"ROUND(CAST(SUM(CAST(v[d] AS DECIMAL(25,12))) AS DOUBLE) "
            f"/ COUNT(*), 6) AS m "
            f"FROM {prefix}a{it} CROSS JOIN "
            f"(SELECT unnest(range(1, {dims + 1})) AS d) "
            f"GROUP BY cid, d) GROUP BY cid)"
        )
        ctes.append(
            f"{cur} AS (SELECT c.cid, COALESCE(m.newvec, c.cvec) AS cvec "
            f"FROM {prev} c LEFT JOIN {prefix}m{it} m ON c.cid = m.cid)"
        )
    return ctes, ed, f"{c}{n_iter}"


def _lloyd_oracle_sql(n_centroids: int = 16, n_iter: int = 2, k: int = 10) -> str:
    """DuckDB twin of similarity.lloyd_ivf_topk: the same Lloyd's loop
    unrolled as a chained-CTE pipeline (assignment argmax → decimal-
    exact per-dim means → COALESCE for empty clusters), then the
    nprobe=1 cell scan."""
    ctes, ed, cfinal = _lloyd_chain("", "embedding", 64, n_centroids, n_iter)
    ctes.append(
        _lloyd_assign_cte(
            "assigned", ed, cfinal, select="vec_id, v, cid AS centroid"
        )
    )
    ctes.append(
        "q AS (SELECT v AS qv, centroid AS qc FROM assigned WHERE vec_id = 0)"
    )
    cos = _COS.format(a="a.v", b="q.qv")
    return (
        "WITH " + ",\n".join(ctes) + f"\n"
        f"SELECT a.vec_id, {cos} AS cosine_sim\n"
        f"FROM assigned a, q WHERE a.centroid = q.qc AND a.vec_id <> 0\n"
        f"ORDER BY cosine_sim DESC, a.vec_id LIMIT {k}"
    )


EXTENSION_ORACLE["es06_ivf_kmeans_ann"] = _lloyd_oracle_sql()
EXTENSION_QUERIES["sp01_stratified_sample"] = sp01_stratified_sample
EXTENSION_QUERIES["pk01_sequence_packing"] = pk01_sequence_packing
EXTENSION_QUERIES["ct01_cross_source_contamination"] = (
    ct01_cross_source_contamination
)
EXTENSION_QUERIES["ct02_decontaminate"] = ct02_decontaminate
EXTENSION_QUERIES["inc01_incremental_dedup"] = inc01_incremental_dedup
EXTENSION_QUERIES["inc02_corpus_growth_manifest"] = inc02_corpus_growth_manifest
EXTENSION_QUERIES["tx11_bpe_pair_mining"] = tx11_bpe_pair_mining

EXTENSION_ORACLE["tx11_bpe_pair_mining"] = """
WITH w AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
), p AS (
  SELECT word, substr(word, CAST(i AS INT), 2) AS pair
  FROM (SELECT word, unnest(range(1, length(word))) AS i FROM w)
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words
FROM p GROUP BY pair ORDER BY n_occurrences DESC, pair LIMIT 20
"""

EXTENSION_ORACLE["inc02_corpus_growth_manifest"] = """
WITH d AS (
  SELECT doc_id,
         CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) AS batch,
         md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
  FROM documents
), cls AS (
  SELECT batch,
         MIN(batch) OVER (PARTITION BY fp) AS minb,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY batch, doc_id) AS rn
  FROM d
), per AS (
  SELECT batch,
         COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN batch > minb THEN 1 ELSE 0 END) AS BIGINT)
           AS n_prior_dups,
         CAST(SUM(CASE WHEN batch = minb AND rn > 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_inbatch_dups,
         CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
  FROM cls GROUP BY batch
)
SELECT batch, n_docs, n_prior_dups, n_inbatch_dups, n_new,
       CAST(SUM(n_new) OVER (ORDER BY batch
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS corpus_size
FROM per ORDER BY batch
"""
EXTENSION_QUERIES["es07_quantization_qc"] = es07_quantization_qc
EXTENSION_QUERIES["dd08_repeated_spans"] = dd08_repeated_spans
EXTENSION_QUERIES["tx09_unigram_surprisal"] = tx09_unigram_surprisal
EXTENSION_QUERIES["px01_pii_scan"] = px01_pii_scan
EXTENSION_QUERIES["rep01_repetition_stats"] = rep01_repetition_stats
EXTENSION_QUERIES["dm01_domain_mixture"] = dm01_domain_mixture


# --- round-4 additions ------------------------------------------------------

# std02: adversarial title-case corpus. The reference's str.title()
# (src/transform.py:66-87) is exercised by std01 only on `part`'s
# [a-z ] charset; these literals pin the hyphen/apostrophe/digit/
# unicode boundary behavior where Python title() and initcap diverge.
# One shared list generates BOTH the Spark VALUES and the DuckDB
# VALUES, so the engines see byte-identical inputs.
_TITLE_CASES: list[tuple[int, str | None]] = [
    (1, "Blankenship-Strickland"),
    (2, "Ellison, Fleming and Hatfield"),
    (3, "o'brien-smith"),
    (4, "MCDONALD'S #42"),
    (5, "été-ÉTÉ crème"),
    (6, "x9y zz-9a 3M"),
    (7, "  padded   name "),
    (8, ""),
    (9, "ALL CAPS INC."),
    (10, "d'angelo's 2nd ave"),
    (11, "ABC-DEF_GHI"),
    (12, "smith&jones;co"),
    (13, "ñandú ÑANDÚ"),
    (14, None),
]


def _title_values(null_literal: str) -> str:
    rows = []
    for i, s in _TITLE_CASES:
        lit = null_literal if s is None else "'" + s.replace("'", "''") + "'"
        rows.append(f"({i}, {lit})")
    return ", ".join(rows)


def std02_title_adversarial(spark: SparkSession, sf: str) -> DataFrame:
    """General ``str.title()`` certification (reference
    src/transform.py:66-87) on the charset merchant names actually
    carry: hyphens, apostrophes, commas, digits, unicode letters,
    padded/collapsed whitespace, empty, NULL. Runs the real
    ``standardize_merchant`` Column expression (trim + whitespace
    collapse + python_title — pure JVM codegen, no UDF); the DuckDB
    twin tokenizes letter/non-letter runs with regexp_extract_all
    (RE2 has no lookarounds, but \\p{L}+|\\P{L}+ alternation needs
    none). ``sf`` is unused — the input is the VALUES literal."""
    t = spark.sql(
        "SELECT col1 AS case_id, col2 AS raw FROM VALUES "
        + _title_values("CAST(NULL AS STRING)")
    )
    from ..operators.standardize import standardize_merchant

    return t.select(
        "case_id",
        "raw",
        standardize_merchant("raw").alias("standardized"),
    ).orderBy("case_id")


EXTENSION_ORACLE["std02_title_adversarial"] = (
    "WITH t(case_id, raw) AS (VALUES "
    + _title_values("CAST(NULL AS VARCHAR)")
    + r"""),
norm AS (
  SELECT case_id, raw, regexp_replace(trim(raw), '\s+', ' ', 'g') AS s
  FROM t
)
SELECT case_id, raw,
       CASE WHEN raw IS NULL THEN NULL
            WHEN s = '' THEN ''
            ELSE array_to_string(
              list_transform(regexp_extract_all(s, '\p{L}+|\P{L}+'),
                x -> CASE WHEN regexp_matches(x, '^\p{L}')
                     THEN upper(substr(x, 1, 1)) || lower(substr(x, 2))
                     ELSE x END),
              '')
       END AS standardized
FROM norm ORDER BY case_id
"""
)
EXTENSION_QUERIES["std02_title_adversarial"] = std02_title_adversarial


def uf01_url_filter(spark: SparkSession, sf: str) -> DataFrame:
    """URL/domain-rule filter — the source-level gate every crawl
    pipeline runs before content-level quality (qf01): TLD blocklist,
    subdomain blocklist, path-keyword blocklist, applied first-match-
    wins in that order. The corpus has no URL column, so a
    deterministic URL is derived per doc (doc_id arithmetic — both
    engines build byte-identical URLs); the operator under test is the
    RULE ENGINE: host/path come from Spark's `parse_url` (JVM
    expression) and the rules are pure string predicates, so the
    whole filter is one codegen'd map over the scan — no shuffle
    until the per-source rollup. At 100 TB the URL column comes off
    the crawl metadata instead and nothing else changes."""
    docs = load(spark, sf, "documents").select("doc_id", "source")
    tld = F.element_at(
        F.array(*[F.lit(t) for t in ("com", "org", "net", "io", "xyz")]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    sub = (
        F.when(F.col("doc_id") % 11 == 0, F.lit("ads."))
        .when(F.col("doc_id") % 11 == 1, F.lit("spam."))
        .otherwise(F.lit(""))
    )
    kw = F.when(F.col("doc_id") % 13 == 0, F.lit("casino")).otherwise(
        F.lit("page")
    )
    with_url = docs.withColumn(
        "__url",
        F.concat(
            F.lit("https://"), sub, F.col("source"), F.lit("."), tld,
            F.lit("/"), kw, F.lit("/"), F.col("doc_id").cast("string"),
        ),
    )
    host = F.parse_url(F.col("__url"), F.lit("HOST"))
    path = F.parse_url(F.col("__url"), F.lit("PATH"))
    verdict = (
        F.when(host.endswith(".xyz"), F.lit("blocked_tld"))
        .when(
            host.startswith("ads.") | host.startswith("spam."),
            F.lit("blocked_subdomain"),
        )
        .when(path.contains("casino"), F.lit("blocked_path"))
        .otherwise(F.lit("kept"))
    )
    return (
        with_url.withColumn("__v", verdict)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("__v") == "blocked_tld", 1).otherwise(0))
            .cast("bigint")
            .alias("n_blocked_tld"),
            F.sum(
                F.when(F.col("__v") == "blocked_subdomain", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_blocked_subdomain"),
            F.sum(F.when(F.col("__v") == "blocked_path", 1).otherwise(0))
            .cast("bigint")
            .alias("n_blocked_path"),
            F.sum(F.when(F.col("__v") == "kept", 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("source")
    )


EXTENSION_ORACLE["uf01_url_filter"] = """
WITH u AS (
  SELECT doc_id, source,
         'https://'
         || CASE WHEN doc_id % 11 = 0 THEN 'ads.'
                 WHEN doc_id % 11 = 1 THEN 'spam.' ELSE '' END
         || source || '.'
         || CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                 WHEN 2 THEN 'net' WHEN 3 THEN 'io' ELSE 'xyz' END
         || '/'
         || CASE WHEN doc_id % 13 = 0 THEN 'casino' ELSE 'page' END
         || '/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), parsed AS (
  SELECT source,
         regexp_extract(url, '^https://([^/]+)', 1) AS host,
         regexp_extract(url, '^https://[^/]+(/.*)$', 1) AS path
  FROM u
), v AS (
  SELECT source,
         CASE WHEN host LIKE '%.xyz' THEN 'blocked_tld'
              WHEN host LIKE 'ads.%' OR host LIKE 'spam.%'
                THEN 'blocked_subdomain'
              WHEN path LIKE '%casino%' THEN 'blocked_path'
              ELSE 'kept' END AS verdict
  FROM parsed
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN verdict = 'blocked_tld' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_blocked_tld,
       CAST(SUM(CASE WHEN verdict = 'blocked_subdomain' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_blocked_subdomain,
       CAST(SUM(CASE WHEN verdict = 'blocked_path' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_blocked_path,
       CAST(SUM(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM v GROUP BY source ORDER BY source
"""
EXTENSION_QUERIES["uf01_url_filter"] = uf01_url_filter


def len01_length_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence-length histogram + padding/truncation accounting at a
    512-token context — the policy view a packing strategy (pk01/pk02)
    is chosen from: per power-of-two length bucket, doc share, token
    mass, the fill ratio if every doc were padded to 512, and the
    tokens lost if docs over 512 were truncated. One map-side bucket
    expression over the scan + one small aggregate; the percent-of-
    total rides a broadcast 1-row frame (q09 pattern)."""
    docs = load(spark, sf, "documents").select(
        tx.token_count("text").alias("__tok")
    )
    tok = F.col("__tok")
    bucket_id = (
        F.when(tok < 32, 0)
        .when(tok < 64, 1)
        .when(tok < 128, 2)
        .when(tok < 256, 3)
        .when(tok < 512, 4)
        .otherwise(5)
    )
    labels = ["0-31", "32-63", "64-127", "128-255", "256-511", "512+"]
    label = F.element_at(
        F.array(*[F.lit(s) for s in labels]), bucket_id.cast("int") + 1
    )
    per = (
        docs.withColumn("__b", bucket_id.cast("int"))
        .withColumn("__lbl", label)
        .groupBy("__b", "__lbl")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tok).cast("bigint").alias("total_tokens"),
            F.round(F.sum(tok).cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_tokens"
            ),
            F.round(
                F.sum(F.least(tok, F.lit(512))).cast("double")
                / (F.count(F.lit(1)) * 512),
                4,
            ).alias("fill_at_512"),
            F.sum(F.greatest(tok - 512, F.lit(0)))
            .cast("bigint")
            .alias("truncated_tokens"),
        )
    )
    total = per.agg(F.sum("n_docs").cast("double").alias("__t"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            F.col("__b").alias("bucket_id"),
            F.col("__lbl").alias("bucket"),
            "n_docs",
            F.round(F.col("n_docs") / F.col("__t"), 6).alias("pct_docs"),
            "total_tokens",
            "avg_tokens",
            "fill_at_512",
            "truncated_tokens",
        )
        .orderBy("bucket_id")
    )


EXTENSION_ORACLE["len01_length_histogram"] = r"""
WITH t AS (
  SELECT CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok
  FROM documents
), b AS (
  SELECT tok,
         CASE WHEN tok < 32 THEN 0 WHEN tok < 64 THEN 1
              WHEN tok < 128 THEN 2 WHEN tok < 256 THEN 3
              WHEN tok < 512 THEN 4 ELSE 5 END AS bucket_id,
         CASE WHEN tok < 32 THEN '0-31' WHEN tok < 64 THEN '32-63'
              WHEN tok < 128 THEN '64-127' WHEN tok < 256 THEN '128-255'
              WHEN tok < 512 THEN '256-511' ELSE '512+' END AS bucket
  FROM t
), per AS (
  SELECT bucket_id, bucket, COUNT(*) AS n_docs,
         CAST(SUM(tok) AS BIGINT) AS total_tokens,
         ROUND(CAST(SUM(tok) AS DOUBLE) / COUNT(*), 4) AS avg_tokens,
         ROUND(CAST(SUM(LEAST(tok, 512)) AS DOUBLE) / (COUNT(*) * 512), 4)
           AS fill_at_512,
         CAST(SUM(GREATEST(tok - 512, 0)) AS BIGINT) AS truncated_tokens
  FROM b GROUP BY bucket_id, bucket
)
SELECT CAST(bucket_id AS INT) AS bucket_id, bucket, n_docs,
       ROUND(CAST(n_docs AS DOUBLE)
             / (SELECT CAST(SUM(n_docs) AS DOUBLE) FROM per), 6) AS pct_docs,
       total_tokens, avg_tokens, fill_at_512, truncated_tokens
FROM per ORDER BY bucket_id
"""
EXTENSION_QUERIES["len01_length_histogram"] = len01_length_histogram


def pk02_packing_export(spark: SparkSession, sf: str) -> DataFrame:
    """Sharded packed-corpus EXPORT — pk01's bin assignment driven
    through a real parquet sink, then read back for accounting, so the
    certification covers the written artifact, not just the plan: docs
    pack into 512-token bins (distributed prefix sum, pk01), bins
    group into 16-bin shards, and the frame is written
    ``partitionBy(lang, shard_id)`` with one repartition on the same
    keys — one shuffle, one file per shard directory, the layout a
    training loader partition-prunes by (lang, shard). The returned
    accounting aggregates the READ-BACK files; the DuckDB twin
    computes the same numbers from the source table, so any row lost
    or retyped by the sink round-trip fails the hash. Shard size (16
    bins = 8 Ki tokens here) is the knob that keeps file counts sane
    at 100 TB — files scale with corpus tokens / shard budget,
    independent of executor count."""
    import atexit
    import shutil
    import tempfile

    from ..operators.ranking import attach_global_row_number

    budget, bins_per_shard = 512, 16
    docs = load(spark, sf, "documents").select(
        "lang", "doc_id", tx.token_count("text").alias("tok")
    )
    packed = attach_global_row_number(
        docs,
        order_by=[F.asc("doc_id")],
        partition_by=["lang"],
        rn_col="__rn",
        running_sum_of="tok",
        running_sum_col="__run",
    )
    binned = packed.select(
        "lang",
        "doc_id",
        "tok",
        F.expr(f"(__run - tok) div {budget}").alias("bin"),
    ).withColumn(
        "shard_id", F.expr(f"bin div {bins_per_shard}").cast("int")
    )
    out_dir = tempfile.mkdtemp(prefix="pk02_export_")
    atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    (
        binned.repartition("lang", "shard_id")
        .write.mode("overwrite")
        .partitionBy("lang", "shard_id")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir)
    return (
        back.groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("bin").alias("n_bins"),
            F.sum("tok").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum("tok").cast("double")
                / (F.countDistinct("bin") * budget),
                4,
            ).alias("fill_ratio"),
        )
        .orderBy("lang", "shard_id")
    )


EXTENSION_ORACLE["pk02_packing_export"] = r"""
WITH t AS (
  SELECT lang, doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok
  FROM documents
), r AS (
  SELECT lang, tok,
         SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM t
), b AS (
  SELECT lang, tok, (run - tok) // 512 AS bin FROM r
)
SELECT lang, CAST(bin // 16 AS INT) AS shard_id, COUNT(*) AS n_docs,
       COUNT(DISTINCT bin) AS n_bins,
       CAST(SUM(tok) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(tok) AS DOUBLE) / (COUNT(DISTINCT bin) * 512), 4)
         AS fill_ratio
FROM b GROUP BY lang, shard_id ORDER BY lang, shard_id
"""
EXTENSION_QUERIES["pk02_packing_export"] = pk02_packing_export


# PPS systematic sampling target per language (ss02) and mixture
# resample total (sp02) — module constants consumed by query AND
# oracle, same self-consistency policy as the LSH knobs above.
PPS_K = 100
RESAMPLE_N = 10_000


def ss02_pps_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling (the survey-
    sampling / data-mixing workhorse): per language, a doc is selected
    when its token span crosses one of PPS_K equally-spaced boundaries
    of the language's total token mass — inclusion probability
    ∝ doc tokens, exactly K docs per language (a multi-boundary doc is
    selected once; zero-token docs never). ALL integer arithmetic
    ((run·K) div total on int64), so unlike exponential-keys A-ES there
    is no transcendental whose last ulp could diverge between engines.
    The running token count is the distributed prefix sum
    (operators/ranking.py) — no single-partition window; the per-lang
    totals ride a broadcast join. Membership is pinned by the selected
    doc_id sum, not just counts."""
    from ..operators.ranking import attach_global_row_number

    docs = load(spark, sf, "documents").select(
        "lang", "doc_id", tx.token_count("text").alias("__tok")
    )
    run = attach_global_row_number(
        docs,
        order_by=[F.asc("doc_id")],
        partition_by=["lang"],
        rn_col="__rn",
        running_sum_of="__tok",
        running_sum_col="__run",
    )
    totals = docs.groupBy("lang").agg(
        F.sum("__tok").cast("bigint").alias("__tot")
    )
    sel = F.expr(
        f"((__run - __tok) * {PPS_K}) div __tot < (__run * {PPS_K}) div __tot"
    ).cast("long")
    return (
        run.join(F.broadcast(totals), "lang")
        .withColumn("__sel", sel)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").cast("bigint").alias("total_tokens"),
            F.sum("__sel").cast("bigint").alias("n_sampled"),
            F.sum(F.when(F.col("__sel") == 1, F.col("doc_id")).otherwise(0))
            .cast("bigint")
            .alias("sampled_docid_sum"),
            F.sum(F.when(F.col("__sel") == 1, F.col("__tok")).otherwise(0))
            .cast("bigint")
            .alias("sampled_token_sum"),
        )
        .orderBy("lang")
    )


EXTENSION_ORACLE["ss02_pps_sample"] = rf"""
WITH t AS (
  SELECT lang, doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok
  FROM documents
), r AS (
  SELECT lang, doc_id, tok,
         SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run,
         SUM(tok) OVER (PARTITION BY lang) AS tot
  FROM t
), s AS (
  SELECT lang, doc_id, tok,
         CASE WHEN ((run - tok) * {PPS_K}) // tot < (run * {PPS_K}) // tot
              THEN 1 ELSE 0 END AS sel
  FROM r
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS total_tokens,
       CAST(SUM(sel) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN sel = 1 THEN doc_id ELSE 0 END) AS BIGINT)
         AS sampled_docid_sum,
       CAST(SUM(CASE WHEN sel = 1 THEN tok ELSE 0 END) AS BIGINT)
         AS sampled_token_sum
FROM s GROUP BY lang ORDER BY lang
"""
EXTENSION_QUERIES["ss02_pps_sample"] = ss02_pps_sample


def sp02_mixture_resample(spark: SparkSession, sf: str) -> DataFrame:
    """APPLY the temperature mixture dm01 only reports: per source,
    target_n = RESAMPLE_N · temperature share (tokens^(1/T), T =
    MIX_TEMPERATURE), then select exactly min(target_n, n_docs) docs in
    deterministic multiplicative-hash order — the resampling plan that
    turns mixture weights into an actual training subset. The share is
    rounded to 6 dp BEFORE the target multiply (tx09 policy: the
    double sum behind it is partition-order-dependent in its last ulp;
    rounding kills the boundary flip). Per-source ranking rides the
    distributed two-phase rank; the 20-row target table broadcast-joins
    back. Membership pinned by selected doc_id sum."""
    from ..operators.ranking import attach_global_row_number

    docs = load(spark, sf, "documents").select(
        "source", "doc_id", tx.token_count("text").alias("__tok")
    )
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__tok").cast("bigint").alias("__toks"),
    ).withColumn(
        "__pw",
        F.pow(F.col("__toks").cast("double"), F.lit(1.0 / MIX_TEMPERATURE)),
    )
    tot = per.agg(F.sum("__pw").alias("__tp"))
    targets = (
        per.crossJoin(F.broadcast(tot))
        .withColumn("__share", F.round(F.col("__pw") / F.col("__tp"), 6))
        .withColumn(
            "__target",
            F.round(F.col("__share") * RESAMPLE_N, 0).cast("long"),
        )
        .select("source", "__n", "__toks", "__target")
    )
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    ranked = attach_global_row_number(
        docs.withColumn("__h", h),
        order_by=[F.asc("__h"), F.asc("doc_id")],
        partition_by=["source"],
        rn_col="__rn",
    )
    sel = (F.col("__rn") <= F.least(F.col("__target"), F.col("__n"))).cast(
        "long"
    )
    return (
        ranked.join(F.broadcast(targets), "source")
        .withColumn("__sel", sel)
        .groupBy("source")
        .agg(
            F.max("__n").alias("n_docs"),
            F.max("__toks").alias("total_tokens"),
            F.max("__target").alias("target_n"),
            F.sum("__sel").cast("bigint").alias("n_selected"),
            F.sum(F.when(F.col("__sel") == 1, F.col("doc_id")).otherwise(0))
            .cast("bigint")
            .alias("selected_docid_sum"),
        )
        .orderBy("source")
    )


EXTENSION_ORACLE["sp02_mixture_resample"] = rf"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok
  FROM documents
), per AS (
  SELECT source, COUNT(*) AS n, CAST(SUM(tok) AS BIGINT) AS toks,
         pow(CAST(SUM(tok) AS DOUBLE), 1.0 / {MIX_TEMPERATURE}) AS pw
  FROM t GROUP BY source
), tg AS (
  SELECT source, n, toks,
         CAST(ROUND(ROUND(pw / (SELECT SUM(pw) FROM per), 6)
                    * {RESAMPLE_N}, 0) AS BIGINT) AS target
  FROM per
), rk AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM t
), s AS (
  SELECT rk.source, rk.doc_id,
         CASE WHEN rk.rn <= LEAST(tg.target, tg.n) THEN 1 ELSE 0 END AS sel
  FROM rk JOIN tg ON rk.source = tg.source
)
SELECT tg.source, tg.n AS n_docs, tg.toks AS total_tokens,
       tg.target AS target_n,
       CAST(SUM(s.sel) AS BIGINT) AS n_selected,
       CAST(SUM(CASE WHEN s.sel = 1 THEN s.doc_id ELSE 0 END) AS BIGINT)
         AS selected_docid_sum
FROM s JOIN tg ON s.source = tg.source
GROUP BY tg.source, tg.n, tg.toks, tg.target
ORDER BY tg.source
"""
EXTENSION_QUERIES["sp02_mixture_resample"] = sp02_mixture_resample


def win01_gapfill_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly rollup with GAP FILL — the hypertable/time-bucket pattern
    (time_bucket_gapfill): a dense hour spine from the corpus min to
    max hour (`sequence` + explode — same generator as the dim_date
    seed), cross-joined with the event-type roster (broadcast: the
    roster is tiny), left-joined to the hourly aggregate; missing
    (hour, type) cells surface as 0 rows instead of absent rows, which
    is what dashboards/forecasting (q30) need. The spine is bounded by
    wall-time span, not event volume, so at 100 TB the only thing that
    scales is the one aggregate shuffle."""
    ev = load(spark, sf, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("__h"),
        "event_type",
        "value",
    )
    agg = ev.groupBy("__h", "event_type").agg(
        F.count(F.lit(1)).alias("__n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
        ).alias("__tv"),
    )
    spine = (
        ev.agg(F.min("__h").alias("__mn"), F.max("__h").alias("__mx"))
        .select(
            F.explode(
                F.sequence(
                    F.col("__mn"), F.col("__mx"), F.expr("interval 1 hour")
                )
            ).alias("hour_ts")
        )
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    return (
        grid.join(
            agg,
            (grid["hour_ts"] == agg["__h"])
            & (grid["event_type"] == agg["event_type"]),
            "left",
        )
        .select(
            grid["hour_ts"],
            grid["event_type"],
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias(
                "n_events"
            ),
            F.coalesce(F.col("__tv"), F.lit(0.0)).alias("total_value"),
        )
        .orderBy("hour_ts", "event_type")
    )


EXTENSION_ORACLE["win01_gapfill_rollup"] = """
WITH agg AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         COUNT(*) AS n,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS tv
  FROM events GROUP BY 1, 2
), b AS (
  SELECT MIN(date_trunc('hour', ts)) AS mn,
         MAX(date_trunc('hour', ts)) AS mx
  FROM events
), spine AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts FROM b
), types AS (
  SELECT DISTINCT event_type FROM events
)
SELECT s.hour_ts, t.event_type,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
       COALESCE(a.tv, 0.0) AS total_value
FROM spine s CROSS JOIN types t
LEFT JOIN agg a ON a.h = s.hour_ts AND a.event_type = t.event_type
ORDER BY s.hour_ts, t.event_type
"""
EXTENSION_QUERIES["win01_gapfill_rollup"] = win01_gapfill_rollup


def scd01_scd2_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension TYPE-2 merge — the warehouse pattern
    the reference's overwrite-style dims lack: an update batch (here:
    every 7th supplier re-priced +10%, derived deterministically so
    both engines build the identical batch) lands against the current
    dimension; changed keys get their open row CLOSED (valid_to set)
    and a NEW current row; unchanged keys pass through. Expressed as
    one broadcast join (updates are the small side at scale) + a
    union of three projections — no window, no shuffle beyond the
    final rollup. Money stays in DECIMAL end-to-end, so the ±10%
    re-price is exact in both engines. Rolled up per nation: open/
    closed version counts and the current balance mass."""
    sup = load(spark, sf, "supplier").select(
        "s_suppkey", "s_nationkey", dec("s_acctbal").alias("__bal")
    )
    updates = (
        sup.filter(F.col("s_suppkey") % 7 == 0)
        .select(
            "s_suppkey",
            F.round(F.col("__bal") * F.lit(1.1).cast("decimal(3,1)"), 2)
            .cast("decimal(18,2)")
            .alias("__new_bal"),
        )
    )
    joined = sup.join(F.broadcast(updates), "s_suppkey", "left")
    changed = F.col("__new_bal").isNotNull() & (
        F.col("__new_bal") != F.col("__bal")
    )
    closed = joined.filter(changed).select(
        "s_suppkey",
        "s_nationkey",
        F.col("__bal").alias("acctbal"),
        F.lit(False).alias("is_current"),
    )
    new_rows = joined.filter(changed).select(
        "s_suppkey",
        "s_nationkey",
        F.col("__new_bal").alias("acctbal"),
        F.lit(True).alias("is_current"),
    )
    kept = joined.filter(~changed).select(
        "s_suppkey",
        "s_nationkey",
        F.col("__bal").alias("acctbal"),
        F.lit(True).alias("is_current"),
    )
    merged = closed.unionByName(new_rows).unionByName(kept)
    return (
        merged.groupBy("s_nationkey")
        .agg(
            F.sum(F.col("is_current").cast("long"))
            .cast("bigint")
            .alias("n_current"),
            F.sum((~F.col("is_current")).cast("long"))
            .cast("bigint")
            .alias("n_closed"),
            F.round(
                F.sum(
                    F.when(F.col("is_current"), F.col("acctbal")).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double"),
                2,
            ).alias("current_acctbal_sum"),
        )
        .orderBy("s_nationkey")
    )


EXTENSION_ORACLE["scd01_scd2_merge"] = """
WITH sup AS (
  SELECT s_suppkey, s_nationkey,
         CAST(s_acctbal AS DECIMAL(18,2)) AS bal
  FROM supplier
), upd AS (
  SELECT s_suppkey,
         ROUND(bal * CAST(1.1 AS DECIMAL(3,1)), 2) AS new_bal
  FROM sup WHERE s_suppkey % 7 = 0
), j AS (
  SELECT sup.s_suppkey, sup.s_nationkey, sup.bal, upd.new_bal,
         upd.new_bal IS NOT NULL AND upd.new_bal <> sup.bal AS changed
  FROM sup LEFT JOIN upd ON sup.s_suppkey = upd.s_suppkey
), merged AS (
  SELECT s_nationkey, bal AS acctbal, FALSE AS is_current
  FROM j WHERE changed
  UNION ALL
  SELECT s_nationkey, new_bal, TRUE FROM j WHERE changed
  UNION ALL
  SELECT s_nationkey, bal, TRUE FROM j WHERE NOT changed
)
SELECT s_nationkey,
       CAST(SUM(CASE WHEN is_current THEN 1 ELSE 0 END) AS BIGINT)
         AS n_current,
       CAST(SUM(CASE WHEN is_current THEN 0 ELSE 1 END) AS BIGINT)
         AS n_closed,
       ROUND(CAST(SUM(CASE WHEN is_current THEN acctbal
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2)
         AS current_acctbal_sum
FROM merged GROUP BY s_nationkey ORDER BY s_nationkey
"""
EXTENSION_QUERIES["scd01_scd2_merge"] = scd01_scd2_merge


def zipf01_rank_decades(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary Zipf profile by rank DECADE (ranks 1-9, 10-99, ...):
    per language, how much token mass each order of magnitude of the
    frequency-ranked vocabulary carries — the corpus-health fingerprint
    a Zipf-slope fit approximates, computed here with ZERO
    transcendentals (decade = digit count of the integer rank), so the
    cross-engine hash is exact by construction. Term ranking rides the
    distributed two-phase rank (a per-language window would put a full
    vocabulary in one task at web scale); the per-language totals
    broadcast back for the mass shares."""
    from ..operators.ranking import attach_global_row_number

    toks = _docs_words(spark, sf).select(
        "lang", F.explode("__words").alias("__w")
    )
    # r13: three consumers (ranker sampling + shuffle, per-lang totals);
    # checkpoint so the corpus explode + vocab count runs once
    vocab = toks.groupBy("lang", "__w").agg(
        F.count(F.lit(1)).alias("__c")
    ).localCheckpoint()
    ranked = attach_global_row_number(
        vocab,
        order_by=[F.desc("__c"), F.asc("__w")],
        partition_by=["lang"],
        rn_col="__rk",
    )
    totals = vocab.groupBy("lang").agg(
        F.sum("__c").cast("bigint").alias("__tot")
    )
    decade = (F.length(F.col("__rk").cast("string")) - 1).cast("int")
    return (
        ranked.withColumn("__d", decade)
        .groupBy("lang", "__d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("__c").cast("bigint").alias("total_freq"),
        )
        .join(F.broadcast(totals), "lang")
        .select(
            "lang",
            F.col("__d").alias("rank_decade"),
            "n_terms",
            "total_freq",
            F.round(
                F.col("total_freq").cast("double") / F.col("__tot"), 6
            ).alias("pct_mass"),
        )
        .orderBy("lang", "rank_decade")
    )


EXTENSION_ORACLE["zipf01_rank_decades"] = f"""
WITH w AS (
  SELECT lang, unnest({_WORDS}) AS word FROM documents
), v AS (
  SELECT lang, word, COUNT(*) AS c FROM w GROUP BY lang, word
), rk AS (
  SELECT lang, c,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, word) AS r
  FROM v
), d AS (
  SELECT lang, c, CAST(length(CAST(r AS VARCHAR)) - 1 AS INT) AS rank_decade
  FROM rk
), tot AS (
  SELECT lang, CAST(SUM(c) AS BIGINT) AS t FROM v GROUP BY lang
)
SELECT d.lang, d.rank_decade,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(d.c) AS BIGINT) AS total_freq,
       ROUND(CAST(SUM(d.c) AS DOUBLE) / MAX(tot.t), 6) AS pct_mass
FROM d JOIN tot ON d.lang = tot.lang
GROUP BY d.lang, d.rank_decade
ORDER BY d.lang, d.rank_decade
"""
EXTENSION_QUERIES["zipf01_rank_decades"] = zipf01_rank_decades


def hq01_histogram_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Single-pass HISTOGRAM quantiles — the streaming/scale-friendly
    alternative to exact rank selection (quantile.py): values bucket
    into fixed-width bins (width 1.0, capped at 512) in one map-side
    pass, and the p50/p95/p99 estimates are the lower edges of the
    bins where the cumulative count crosses ceil(p·n). Error is
    bounded by the bin width BY CONSTRUCTION, and — unlike t-digest /
    Greenwald-Khanna sketches — the result is deterministic and
    engine-independent (floor() is exact IEEE, counts are integers),
    so it hash-certifies. The per-type cumulative runs over ≤512 bin
    rows — driver-scale metadata, like AQE's shuffle stats; the data
    pass is one partial-agg shuffle of (type, bin) counts."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select(
        "event_type",
        F.least(F.floor(F.col("value")).cast("int"), F.lit(511)).alias(
            "__bin"
        ),
    )
    hist = ev.groupBy("event_type", "__bin").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.partitionBy("event_type").orderBy("__bin")
    cum = (
        hist.withColumn("__cum", F.sum("__c").over(w))
        .withColumn(
            "__n", F.sum("__c").over(Window.partitionBy("event_type"))
        )
    )
    pick = lambda p: F.min(  # noqa: E731 — lower edge of the crossing bin
        F.when(
            F.col("__cum") >= F.ceil(F.col("__n") * F.lit(p)), F.col("__bin")
        )
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("__n").cast("bigint").alias("n_events"),
            pick(0.50).cast("int").alias("p50_bin"),
            pick(0.95).cast("int").alias("p95_bin"),
            pick(0.99).cast("int").alias("p99_bin"),
        )
        .orderBy("event_type")
    )


EXTENSION_ORACLE["hq01_histogram_quantiles"] = """
WITH b AS (
  SELECT event_type,
         LEAST(CAST(FLOOR(value) AS INT), 511) AS bin
  FROM events
), h AS (
  SELECT event_type, bin, COUNT(*) AS c FROM b GROUP BY event_type, bin
), cum AS (
  SELECT event_type, bin, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cm,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM h
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(MIN(CASE WHEN cm >= CEIL(n * 0.50) THEN bin END) AS INT)
         AS p50_bin,
       CAST(MIN(CASE WHEN cm >= CEIL(n * 0.95) THEN bin END) AS INT)
         AS p95_bin,
       CAST(MIN(CASE WHEN cm >= CEIL(n * 0.99) THEN bin END) AS INT)
         AS p99_bin
FROM cum GROUP BY event_type ORDER BY event_type
"""
EXTENSION_QUERIES["hq01_histogram_quantiles"] = hq01_histogram_quantiles


def mm05_multimodal_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Interleaved MULTIMODAL sequence packing: a doc's context cost is
    its text tokens plus a fixed 576-token image patch budget when it
    carries an image (ViT-style patch count; image presence derived
    deterministically — doc_id % 4 — since the corpus has no media
    column, same policy as uf01's derived URL). Docs pack into
    2048-token windows per language via the distributed prefix sum —
    the mixed-modality generalization of pk01 every vision-language
    training pipeline needs (image patches dominate the budget, so
    text-only fill math under-provisions). Per language: doc/image
    counts, cost mass, bins used, fill ratio."""
    from ..operators.ranking import attach_global_row_number

    budget, img_cost = 2048, 576
    docs = load(spark, sf, "documents").select(
        "lang",
        "doc_id",
        (
            tx.token_count("text")
            + F.when(F.col("doc_id") % 4 == 0, img_cost).otherwise(0)
        ).alias("__cost"),
        (F.col("doc_id") % 4 == 0).cast("long").alias("__img"),
    )
    packed = attach_global_row_number(
        docs,
        order_by=[F.asc("doc_id")],
        partition_by=["lang"],
        rn_col="__rn",
        running_sum_of="__cost",
        running_sum_col="__run",
    )
    binned = packed.withColumn(
        "__bin", F.expr(f"(__run - __cost) div {budget}")
    )
    return (
        binned.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__img").cast("bigint").alias("n_with_image"),
            F.sum("__cost").cast("bigint").alias("total_cost"),
            F.countDistinct("__bin").alias("n_bins"),
            F.round(
                F.sum("__cost").cast("double")
                / (F.countDistinct("__bin") * budget),
                4,
            ).alias("fill_ratio"),
        )
        .orderBy("lang")
    )


EXTENSION_ORACLE["mm05_multimodal_packing"] = r"""
WITH t AS (
  SELECT lang, doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
           + CASE WHEN doc_id % 4 = 0 THEN 576 ELSE 0 END AS cost,
         CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS img
  FROM documents
), r AS (
  SELECT lang, cost, img,
         SUM(cost) OVER (PARTITION BY lang ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM t
), b AS (
  SELECT lang, cost, img, (run - cost) // 2048 AS bin FROM r
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(img) AS BIGINT) AS n_with_image,
       CAST(SUM(cost) AS BIGINT) AS total_cost,
       COUNT(DISTINCT bin) AS n_bins,
       ROUND(CAST(SUM(cost) AS DOUBLE) / (COUNT(DISTINCT bin) * 2048), 4)
         AS fill_ratio
FROM b GROUP BY lang ORDER BY lang
"""
EXTENSION_QUERIES["mm05_multimodal_packing"] = mm05_multimodal_packing


def rw01_rolling_user_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Event-time RANGE rolling window — the rate-limit / burst-
    detection primitive: for every event, how many events the same
    user fired in the preceding hour (inclusive), via a RANGE frame
    over epoch seconds (value-based, so sparse activity is handled
    correctly where a ROWS frame would be wrong — same distinction
    q32's calendar-day MA pins). The window partitions by user_id —
    high cardinality, so state spreads with the shuffle; no
    single-partition funnel. Rolled up per event_type: mean burst and
    the share of events in a >= 5-events/hour burst."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select(
        "user_id", "event_type", F.col("ts").cast("long").alias("__sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("__sec")
        .rangeBetween(-3600, 0)
    )
    per_event = ev.withColumn("__burst", F.count(F.lit(1)).over(w))
    return (
        per_event.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum("__burst").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_burst"),
            F.max("__burst").cast("bigint").alias("max_burst"),
            F.sum((F.col("__burst") >= 5).cast("long"))
            .cast("bigint")
            .alias("n_in_burst5"),
        )
        .orderBy("event_type")
    )


EXTENSION_ORACLE["rw01_rolling_user_rate"] = """
WITH e AS (
  SELECT user_id, event_type, CAST(epoch(ts) AS BIGINT) AS sec
  FROM events
), b AS (
  SELECT event_type,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
                        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
           AS burst
  FROM e
)
SELECT event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(burst) AS DOUBLE) / COUNT(*), 4) AS avg_burst,
       CAST(MAX(burst) AS BIGINT) AS max_burst,
       CAST(SUM(CASE WHEN burst >= 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_in_burst5
FROM b GROUP BY event_type ORDER BY event_type
"""
EXTENSION_QUERIES["rw01_rolling_user_rate"] = rw01_rolling_user_rate


def wm01_token_mass_median(spark: SparkSession, sf: str) -> DataFrame:
    """WEIGHTED median by token mass: per language, the document size
    (n_chars) at which the cumulative token count crosses half the
    corpus — 'half our training tokens come from docs this large or
    smaller', the curation statistic a length-filter threshold is set
    from. Exact integer arithmetic on the distributed prefix sum
    (2·run ≥ total at the crossing row — no doubles, no percentile
    interpolation ambiguity); the crossing row is the min qualifying
    row per group, an aggregate, not a sort."""
    from ..operators.ranking import attach_global_row_number

    docs = load(spark, sf, "documents").select(
        "lang",
        "n_chars",
        "doc_id",
        tx.token_count("text").alias("__tok"),
    )
    run = attach_global_row_number(
        docs,
        order_by=[F.asc("n_chars"), F.asc("doc_id")],
        partition_by=["lang"],
        rn_col="__rn",
        running_sum_of="__tok",
        running_sum_col="__run",
    )
    totals = docs.groupBy("lang").agg(
        F.sum("__tok").cast("bigint").alias("__tot"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    crossed = run.join(F.broadcast(totals), "lang").filter(
        F.col("__run") * 2 >= F.col("__tot")
    )
    return (
        crossed.groupBy("lang")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("__tot").alias("total_tokens"),
            F.min("n_chars").cast("bigint").alias("median_mass_chars"),
        )
        .orderBy("lang")
    )


EXTENSION_ORACLE["wm01_token_mass_median"] = r"""
WITH t AS (
  SELECT lang, n_chars, doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok
  FROM documents
), r AS (
  SELECT lang, n_chars, tok,
         SUM(tok) OVER (PARTITION BY lang ORDER BY n_chars, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run,
         SUM(tok) OVER (PARTITION BY lang) AS tot,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM t
)
SELECT lang,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(MAX(tot) AS BIGINT) AS total_tokens,
       CAST(MIN(n_chars) AS BIGINT) AS median_mass_chars
FROM r WHERE run * 2 >= tot
GROUP BY lang ORDER BY lang
"""
EXTENSION_QUERIES["wm01_token_mass_median"] = wm01_token_mass_median


def cur01_curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """END-TO-END curation funnel — the composed pipeline a training
    run actually executes, certified as ONE query: quality filter
    (qf01's first-failing-rule kernel) → near-dup removal (keep each
    ≥2-cluster's dd07 representative, using the materialized
    full-corpus cluster labels — the LSH+CC pipeline runs once and is
    shared) → eval-set decontamination (ct02's broadcast gram
    semi-join). Per language: the surviving-doc counts at each stage
    and the clean token mass. Every stage reuses the already-certified
    kernel (shared helpers, not copies), so this certifies the
    COMPOSITION — stage interactions, join plumbing, drop accounting —
    on top of the individually-certified pieces. One extra shuffle per
    stage boundary. Scale note on the drop-set joins: the contam set is
    bounded by construction (eval panels are small), so it carries an
    explicit broadcast hint; the dup-drop set is DATA-DEPENDENT — real
    crawl dup rates run 10-30% (SCALE.md), billions of doc_ids at
    100 TB — so it takes NO hint and AQE picks broadcast vs shuffle
    from the measured size at runtime (forcing a broadcast here is a
    guaranteed OOM at scale; this was round-4 verdict defect #1)."""
    from pyspark.sql import Window

    docs = load(spark, sf, "documents")
    v = _quality_verdicts(spark, sf).select("doc_id", "lang", "source", "__v")
    comp = _neardup_components(spark, sf)
    sized = (
        comp.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn(
            "__size", F.count(F.lit(1)).over(Window.partitionBy("component"))
        )
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("component").orderBy(
                    F.desc("n_chars"), "doc_id"
                )
            ),
        )
    )
    dup_drop = (
        sized.filter((F.col("__size") >= 2) & (F.col("__rk") > 1))
        .select("doc_id")
        .withColumn("__dup", F.lit(1))
    )
    contam = _contaminated_doc_ids(spark, sf).withColumn("__ct", F.lit(1))
    toks = docs.select("doc_id", tx.token_count("text").alias("__tok"))
    j = (
        v.filter(F.col("source") != "src0")
        .join(dup_drop, "doc_id", "left")
        .join(F.broadcast(contam), "doc_id", "left")
        .join(toks, "doc_id")
    )
    is_pass = F.col("__v") == "pass"
    after_dedup = is_pass & F.col("__dup").isNull()
    clean = after_dedup & F.col("__ct").isNull()
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_input"),
            F.sum(is_pass.cast("long")).cast("bigint").alias("n_quality"),
            F.sum(after_dedup.cast("long"))
            .cast("bigint")
            .alias("n_after_dedup"),
            F.sum(clean.cast("long")).cast("bigint").alias("n_clean"),
            F.sum(F.when(clean, F.col("__tok")).otherwise(0))
            .cast("bigint")
            .alias("clean_tokens"),
        )
        .orderBy("lang")
    )


# cur01's oracle composes the SAME certified fragments: qf01's verdict,
# dd06/dd07's transitive-closure clusters + representative rule, ct02's
# contamination hits — one recursive CTE chain, end-to-end.
EXTENSION_ORACLE["cur01_curation_funnel"] = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, source, lang, text, n_chars, {_WORDS} AS w FROM documents
), feats AS (
  SELECT doc_id, source, lang, text,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok,
         {_MWL.format(w='w')} AS mwl,
         {_SWR.format(w='w')} AS swr,
         {_PR} AS pr,
         {_LANG_SCORES}
  FROM base
), scored AS (
  SELECT doc_id, source, lang, tok, {_QUALITY} AS q,
         CASE WHEN s_en > 0 AND s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
              WHEN s_de > 0 AND s_de = GREATEST(s_en, s_de, s_fr, s_es) THEN 'de'
              WHEN s_fr > 0 AND s_fr = GREATEST(s_en, s_de, s_fr, s_es) THEN 'fr'
              WHEN s_es > 0 AND s_es = GREATEST(s_en, s_de, s_fr, s_es) THEN 'es'
              ELSE 'unknown' END AS pred
  FROM feats
), verdict AS (
  SELECT doc_id, source, lang, tok,
         CASE WHEN tok < 5 THEN 'too_short'
              WHEN q < 0.5 THEN 'low_quality'
              WHEN pred <> lang THEN 'langid_mismatch'
              ELSE 'pass' END AS v
  FROM scored
), sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range({MINHASH_K})) AS j) GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ',')) AS band_key
  FROM pj GROUP BY doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
), good AS (
  SELECT id_a, id_b
  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
  WHERE {_JACCARD.format(a='sa.s', b='sb.s')} >= 0.5
), edges AS (
  SELECT id_a AS s, id_b AS d FROM good
  UNION ALL SELECT id_b AS s, id_a AS d FROM good
), reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
), comp AS (
  SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id
), sized AS (
  SELECT c.doc_id, c.component,
         COUNT(*) OVER (PARTITION BY c.component) AS csize,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.doc_id) AS rk
  FROM comp c JOIN documents d USING (doc_id)
), dupdrop AS (
  SELECT doc_id FROM sized WHERE csize >= 2 AND rk > 1
), g AS (
  SELECT doc_id, source, substr(md5(u), 1, 15) AS u
  FROM (SELECT doc_id, source,
               unnest({_sql_shingles('w', CONTAM_NGRAM)}) AS u
        FROM base)
), ev AS (
  SELECT DISTINCT u FROM g WHERE source = 'src0'
), hit AS (
  SELECT DISTINCT g.doc_id FROM g JOIN ev USING (u) WHERE g.source <> 'src0'
), funnel AS (
  SELECT v.lang,
         v.v = 'pass' AS pass,
         v.v = 'pass' AND dd.doc_id IS NULL AS after_dedup,
         v.v = 'pass' AND dd.doc_id IS NULL AND ct.doc_id IS NULL AS clean,
         v.tok
  FROM verdict v
  LEFT JOIN dupdrop dd ON v.doc_id = dd.doc_id
  LEFT JOIN hit ct ON v.doc_id = ct.doc_id
  WHERE v.source <> 'src0'
)
SELECT lang,
       COUNT(*) AS n_input,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(SUM(CASE WHEN after_dedup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_after_dedup,
       CAST(SUM(CASE WHEN clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       CAST(SUM(CASE WHEN clean THEN tok ELSE 0 END) AS BIGINT)
         AS clean_tokens
FROM funnel GROUP BY lang ORDER BY lang
"""
EXTENSION_QUERIES["cur01_curation_funnel"] = cur01_curation_funnel

LC_BUCKETS = 1024  # linear-counting bitmap size (lc01)


def lc01_linear_counting(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic LINEAR-COUNTING distinct sketch — the certified
    member of the sketch family (hll01's HLL stays rows-only because
    its estimates are engine-specific): users hash into LC_BUCKETS
    buckets with the library's multiplicative hash, the sketch is the
    occupied-bucket count V (an integer — map-side partial DISTINCT on
    (type, bucket), shuffle bounded by m per group regardless of event
    volume), and the estimate is the standard -m·ln(1 - V/m). Unlike
    RNG-seeded sketches the whole construction is reproducible
    cross-engine, so estimate AND error certify by hash. m is the
    accuracy knob: m >> n gives near-exact counts; at 10^9 users per
    group, m = 2^20 holds ~1% error in 128 KiB per group."""
    ev = load(spark, sf, "events").select(
        "event_type",
        "user_id",
        (
            (F.col("user_id") * F.lit(2654435761))
            % F.lit(4294967296)
            % F.lit(LC_BUCKETS)
        ).alias("__b"),
    )
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_distinct"),
        F.countDistinct("__b").alias("occupied"),
    )
    m = float(LC_BUCKETS)
    est = F.round(-F.lit(m) * F.log(F.lit(1.0) - F.col("occupied") / m), 2)
    return (
        per.select(
            "event_type",
            "n_events",
            "exact_distinct",
            "occupied",
            est.alias("estimate"),
            F.round(
                (est - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


EXTENSION_ORACLE["lc01_linear_counting"] = f"""
WITH b AS (
  SELECT event_type, user_id,
         (user_id * 2654435761) % 4294967296 % {LC_BUCKETS} AS bk
  FROM events
), per AS (
  SELECT event_type, COUNT(*) AS n_events,
         COUNT(DISTINCT user_id) AS exact_distinct,
         COUNT(DISTINCT bk) AS occupied
  FROM b GROUP BY event_type
)
SELECT event_type, n_events, exact_distinct, occupied,
       ROUND(-{LC_BUCKETS}.0 * ln(1.0 - occupied / {LC_BUCKETS}.0), 2)
         AS estimate,
       ROUND((ROUND(-{LC_BUCKETS}.0 * ln(1.0 - occupied / {LC_BUCKETS}.0), 2)
              - exact_distinct) / exact_distinct, 4) AS rel_err
FROM per ORDER BY event_type
"""
EXTENSION_QUERIES["lc01_linear_counting"] = lc01_linear_counting


def dd09_containment_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: containment |A∩B|/|A| on the
    SAME LSH candidate pairs dd03 verifies — the measure that catches
    quote-inclusion duplicates (a short doc embedded in a long one has
    high containment but union-dominated low Jaccard, so a
    Jaccard-threshold pass keeps both copies). Candidates come from
    the banded bucket join (never all-pairs); the exact kernels run
    only on the candidate list. Top 50 by max directional containment
    with full deterministic tie-breaks."""
    docs, _sigs, pairs = _lsh_base(spark, sf)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("__sa"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("__sb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            dd.jaccard(F.col("__sa"), F.col("__sb")).alias("jaccard"),
            dd.containment(F.col("__sa"), F.col("__sb")).alias(
                "containment_a_in_b"
            ),
            dd.containment(F.col("__sb"), F.col("__sa")).alias(
                "containment_b_in_a"
            ),
        )
        .withColumn(
            "max_containment",
            F.greatest("containment_a_in_b", "containment_b_in_a"),
        )
        .orderBy(F.desc("max_containment"), "id_a", "id_b")
        .limit(50)
    )


_CONTAIN = (
    "ROUND(CAST(len(list_intersect({a}, {b})) AS DOUBLE) / "
    "CAST(NULLIF(len({a}), 0) AS DOUBLE), 6)"
)

EXTENSION_ORACLE["dd09_containment_pairs"] = f"""
WITH sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range({MINHASH_K})) AS j) GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ',')) AS band_key
  FROM pj GROUP BY doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
), scored AS (
  SELECT id_a, id_b,
         {_JACCARD.format(a='sa.s', b='sb.s')} AS jaccard,
         {_CONTAIN.format(a='sa.s', b='sb.s')} AS containment_a_in_b,
         {_CONTAIN.format(a='sb.s', b='sa.s')} AS containment_b_in_a
  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, jaccard, containment_a_in_b, containment_b_in_a,
       GREATEST(containment_a_in_b, containment_b_in_a) AS max_containment
FROM scored
ORDER BY max_containment DESC, id_a, id_b LIMIT 50
"""
EXTENSION_QUERIES["dd09_containment_pairs"] = dd09_containment_pairs
EXTENSION_QUERIES["dd11_prefix_filter_pairs"] = dd11_prefix_filter_pairs

# dd11's oracle is deliberately the NAIVE all-pairs specification (the
# quadratic scan the prefix filter must exactly reproduce): a hash
# match certifies the algorithm against the definition, not against a
# re-implementation of itself.
EXTENSION_ORACLE["dd11_prefix_filter_pairs"] = f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), d AS (
  SELECT doc_id, {_sql_shingles('w')} AS s FROM w
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.s, b.s)) AS o,
         len(a.s) AS la, len(b.s) AS lb
  FROM d a JOIN d b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       ROUND(CAST(o AS DOUBLE) / (la + lb - o), 6) AS jaccard
FROM p
WHERE o > 0 AND ROUND(CAST(o AS DOUBLE) / (la + lb - o), 6) >= 0.8
ORDER BY jaccard DESC, id_a, id_b
"""


def es08_centroid_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space OUTLIER detection — the mislabeled/corrupt-vector
    screen an embedding store runs before training: per label, the 3
    vectors farthest from the label centroid. Centroids reuse es05's
    decimal-exact mean; squared distances accumulate per-term doubles
    (deterministic) through DECIMAL sums (exact, partition-order-free),
    so the ranking key is bit-identical cross-engine; ranking rides the
    distributed two-phase rank because labels are LOW cardinality — at
    web scale each label's vectors are huge, exactly the shape where a
    per-label window funnels into one task."""
    from ..operators.ranking import attach_global_row_number

    dist = _label_centroid_sqdist(spark, sf)
    ranked = attach_global_row_number(
        dist,
        order_by=[F.desc("__d2"), F.asc("vec_id")],
        partition_by=["label"],
        rn_col="__rk",
        # the sqdist kernel is the expensive lineage; run it once (r13)
        materialize_input=True,
    )
    return (
        ranked.filter(F.col("__rk") <= 3)
        .select(
            "label",
            "vec_id",
            F.round(F.sqrt(F.col("__d2").cast("double")), 6).alias("dist"),
            F.col("__rk").cast("int").alias("rk"),
        )
        .orderBy("label", "rk")
    )


EXTENSION_ORACLE["es08_centroid_outliers"] = """
WITH ex AS (
  SELECT label, vec_id, CAST(d - 1 AS INT) AS dim,
         CAST(embedding[d] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d)
), cent AS (
  SELECT label, dim,
         CAST(SUM(CAST(val AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*) AS c
  FROM ex GROUP BY label, dim
), dist AS (
  SELECT e.label, e.vec_id,
         SUM(CAST((e.val - c.c) * (e.val - c.c) AS DECIMAL(30,15))) AS d2
  FROM ex e JOIN cent c ON e.label = c.label AND e.dim = c.dim
  GROUP BY e.label, e.vec_id
), rk AS (
  SELECT label, vec_id, d2,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY d2 DESC, vec_id) AS rk
  FROM dist
)
SELECT label, vec_id,
       ROUND(sqrt(CAST(d2 AS DOUBLE)), 6) AS dist,
       CAST(rk AS INT) AS rk
FROM rk WHERE rk <= 3 ORDER BY label, rk
"""
EXTENSION_QUERIES["es08_centroid_outliers"] = es08_centroid_outliers


def ss03_train_val_test_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic TRAIN/VAL/TEST split — the reproducible-split
    contract every training run needs: assignment is a pure function
    of doc_id (multiplicative hash mod 100 → 80/10/10 bands), so the
    split is stable across runs, engines, partitionings, and corpus
    growth (a doc's split never changes when other docs arrive — the
    property random shuffles lose). Zero shuffle for assignment; one
    rollup. Membership pinned per (lang, split) by doc_id sum."""
    docs = load(spark, sf, "documents")
    return (
        docs.select("lang", "doc_id", _split_col().alias("__s"))
        .groupBy("lang", "__s")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("docid_sum"),
        )
        .select(F.col("lang"), F.col("__s").alias("split"), "n_docs", "docid_sum")
        .orderBy("lang", "split")
    )


EXTENSION_ORACLE["ss03_train_val_test_split"] = f"""
WITH b AS (
  SELECT lang, doc_id, {_SPLIT_CASE_SQL} AS split
  FROM documents
)
SELECT lang, split, COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS docid_sum
FROM b GROUP BY lang, split ORDER BY lang, split
"""
EXTENSION_QUERIES["ss03_train_val_test_split"] = ss03_train_val_test_split


def prof02_events_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Event-stream data-quality profile (prof01's sibling for the
    events table): one conditional-aggregation pass — null user ids,
    duplicate event ids, unparseable JSON props (get_json_object null
    ⇔ DuckDB json field miss), out-of-range values, and the time-span
    bounds a watermark policy is set from. Single map-side-combinable
    aggregate; no second scan per metric."""
    ev = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("long"))
        .cast("bigint")
        .alias("n_null_user"),
        (F.count("event_id") - F.countDistinct("event_id"))
        .cast("bigint")
        .alias("n_dup_event_id"),
        F.sum(k.isNull().cast("long")).cast("bigint").alias("n_bad_json"),
        F.sum(
            ((F.col("value") < 0) | (F.col("value") > 1000)).cast("long")
        )
        .cast("bigint")
        .alias("n_value_out_of_range"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
    )


EXTENSION_ORACLE["prof02_events_profile"] = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_user,
       CAST(COUNT(event_id) - COUNT(DISTINCT event_id) AS BIGINT)
         AS n_dup_event_id,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_json,
       CAST(SUM(CASE WHEN value < 0 OR value > 1000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_value_out_of_range,
       MIN(ts) AS ts_min,
       MAX(ts) AS ts_max
FROM events
"""
EXTENSION_QUERIES["prof02_events_profile"] = prof02_events_profile


def dq01_expectations_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Declarative expectations gate over the event stream — the
    Deequ-shaped audit a pipeline runs before admitting a batch
    (operators/expectations.evaluate: N named rules + uniqueness, ONE
    conditional-aggregation scan, never a scan per rule). Rules here:
    id/user completeness, event_id uniqueness, value in [0, 500], type
    in the allowed domain, ts inside the ingest window, JSON props
    parseable (get_json_object null ⇔ DuckDB json field miss — the
    prof02 equivalence). The driver corpus is synthetic-clean (all
    rules pass — still hash-checked end-to-end); violation semantics
    are pinned on dirty constructed rows in
    tests/test_round5_queries.py."""
    from ..operators.expectations import Expectation, evaluate

    ev = load(spark, sf, "events")
    types = ["view", "click", "purchase", "error", "signup"]
    lo = F.lit("2024-01-01").cast("timestamp")
    hi = F.lit("2024-03-01").cast("timestamp")
    rules = [
        Expectation("event_id_not_null", F.col("event_id").isNull()),
        Expectation("user_id_not_null", F.col("user_id").isNull()),
        Expectation(
            "value_in_range", (F.col("value") < 0) | (F.col("value") > 500)
        ),
        Expectation("type_in_domain", ~F.col("event_type").isin(types)),
        Expectation(
            "ts_in_window", (F.col("ts") < lo) | (F.col("ts") >= hi)
        ),
        Expectation(
            "props_json_valid",
            F.get_json_object("props", "$.k").isNull(),
        ),
    ]
    return evaluate(ev, rules, unique_cols=("event_id",))


EXTENSION_ORACLE["dq01_expectations_audit"] = """
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS r_event_id_not_null,
         CAST(COUNT(event_id) - COUNT(DISTINCT event_id) AS BIGINT)
           AS r_event_id_unique,
         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS r_user_id_not_null,
         CAST(SUM(CASE WHEN value IS NULL OR value < 0 OR value > 500
                       THEN 1 ELSE 0 END) AS BIGINT) AS r_value_in_range,
         CAST(SUM(CASE WHEN event_type IS NULL OR event_type NOT IN
                       ('view','click','purchase','error','signup')
                       THEN 1 ELSE 0 END) AS BIGINT) AS r_type_in_domain,
         CAST(SUM(CASE WHEN ts IS NULL OR ts < TIMESTAMP '2024-01-01'
                       OR ts >= TIMESTAMP '2024-03-01'
                       THEN 1 ELSE 0 END) AS BIGINT) AS r_ts_in_window,
         CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS r_props_json_valid
  FROM events
)
SELECT substr(k, 3) AS rule, v AS violations, v = 0 AS passed,
       ROUND(1.0 - CAST(v AS DOUBLE) / n, 6) AS pass_rate
FROM base
UNPIVOT (v FOR k IN (r_event_id_not_null, r_event_id_unique,
                     r_user_id_not_null, r_value_in_range,
                     r_type_in_domain, r_ts_in_window,
                     r_props_json_valid))
ORDER BY rule
"""
EXTENSION_QUERIES["dq01_expectations_audit"] = dq01_expectations_audit


def ks01_value_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift monitor: per event type, the
    KS statistic between the `value` distribution of the first half of
    the window (ts < 2024-01-16) and the rest — the standard
    train-vs-serve / yesterday-vs-today data-drift check a production
    pipeline runs before retraining.

    Distributed-exact formulation (no single-partition window, no
    sampling): (1) one shuffle aggregates per (event_type, value) the
    early/late sample counts; (2) the distributed prefix sum
    (operators/ranking.attach_global_row_number, multi-column
    running_sum_of — both CDFs ride ONE range shuffle + in-partition
    window) turns the counts into the two cumulative sample counts at
    every distinct value; (3) the supremum is taken on exact int64
    cross-products |cum_a·n_b − cum_b·n_a| (ties and float CDF drift
    cannot flip the max), divided once at the end. Integer products
    stay exact while n_a·n_b < 2^63 — beyond ~3e9 rows per side,
    switch the comparator to normalized doubles (documented fallback).

    Not in the reference (no two-sample statistics anywhere in
    /root/reference/sql/queries.sql) — training-data extension. Kernel:
    operators/stats.two_sample_ks (property-swept against a sequential
    Python KS in tests/test_stats.py).
    """
    from ..operators.stats import two_sample_ks

    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    ev = load(spark, sf, "events").select("event_type", "value", "ts")
    return (
        two_sample_ks(
            ev, "event_type", "value", side_a=F.col("ts") < split
        )
        .withColumnRenamed("n_a", "n_early")
        .withColumnRenamed("n_b", "n_late")
    )


EXTENSION_ORACLE["ks01_value_drift"] = """
WITH s AS (
  SELECT event_type, value,
         CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS a
  FROM events
  -- mirror the kernel's na.drop on (group, value): a NULL-valued row
  -- must not inflate the marginal totals (round-4 advice)
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), g AS (
  SELECT event_type, value,
         CAST(SUM(a) AS BIGINT) AS ca,
         CAST(SUM(1 - a) AS BIGINT) AS cb
  FROM s GROUP BY event_type, value
), r AS (
  SELECT event_type,
         CAST(SUM(ca) OVER (PARTITION BY event_type ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_a,
         CAST(SUM(cb) OVER (PARTITION BY event_type ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_b,
         CAST(SUM(ca) OVER (PARTITION BY event_type) AS BIGINT) AS na,
         CAST(SUM(cb) OVER (PARTITION BY event_type) AS BIGINT) AS nb
  FROM g
)
SELECT event_type,
       CAST(MAX(na) AS BIGINT) AS n_early,
       CAST(MAX(nb) AS BIGINT) AS n_late,
       ROUND(CAST(MAX(ABS(cum_a * nb - cum_b * na)) AS DOUBLE)
             / (CAST(MAX(na) AS DOUBLE) * MAX(nb)), 6) AS ks_stat
FROM r GROUP BY event_type ORDER BY event_type
"""
EXTENSION_QUERIES["ks01_value_drift"] = ks01_value_drift


def es09_dimension_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension embedding QC — the screen run before indexing or
    PCA: for every dimension, the population mean, variance, and the
    Pearson correlation with the NEXT dimension (dead or collapsed
    dims show variance ~0; a strongly off-diagonal band betrays an
    un-rotated projection). One posexplode (n·d rows — linear, same
    cost class as any per-dimension statistic), then ONE
    map-side-combinable aggregate. r13: the next-dim value is read
    straight off the still-in-scope array (F.get(embedding, pos+1) —
    the element a per-vector lead() window returned, since posexplode
    emits exactly one row per position: NULL past the end, the
    element itself otherwise, NULL elements included), which deletes
    the window's Exchange hashpartitioning(vec_id) + per-partition
    Sort from the plan; the explode never shuffles.

    Determinism: every sum runs on DECIMAL(25,12) casts of the double
    values (float→double is exact, float·float products fit a double
    exactly, and decimal addition is order-independent — the es05
    centroid discipline), so the shuffle order cannot wiggle the
    result; moments combine in double only at the very end, in the
    same textual expression the DuckDB twin uses.
    """
    d12 = "CAST({} AS DECIMAL(25,12))"
    ex = (
        load(spark, sf, "embeddings")
        .select(
            "embedding", F.posexplode("embedding").alias("dim", "__xf")
        )
        .select(
            "dim",
            F.col("__xf").cast("double").alias("__x"),
            F.get("embedding", F.col("dim") + 1)
            .cast("double")
            .alias("__xn"),
        )
    )
    agg = ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(F.expr(d12.format("__x"))).alias("__sx"),
        F.sum(F.expr(d12.format("__x * __x"))).alias("__sxx"),
        F.sum(F.expr(d12.format("__xn"))).alias("__sy"),
        F.sum(F.expr(d12.format("__xn * __xn"))).alias("__syy"),
        F.sum(F.expr(d12.format("__x * __xn"))).alias("__sxy"),
        F.count("__xn").cast("bigint").alias("__np"),
    )
    n = F.col("n_vecs").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    sy = F.col("__sy").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    np_ = F.col("__np").cast("double")
    corr = (np_ * sxy - sx * sy) / F.sqrt(
        (np_ * sxx - sx * sx) * (np_ * syy - sy * sy)
    )
    return agg.select(
        "dim",
        "n_vecs",
        F.round(sx / n, 6).alias("mean_val"),
        F.round((n * sxx - sx * sx) / (n * n), 6).alias("variance"),
        F.round(F.when(F.col("__np") > 0, corr), 6).alias("corr_next"),
    ).orderBy("dim")


EXTENSION_ORACLE["es09_dimension_stats"] = """
WITH ex AS (
  SELECT vec_id, CAST(d - 1 AS INT) AS dim,
         CAST(embedding[d] AS DOUBLE) AS x,
         CAST(embedding[d + 1] AS DOUBLE) AS xn
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d)
), agg AS (
  SELECT dim,
         CAST(COUNT(*) AS BIGINT) AS n_vecs,
         SUM(CAST(x AS DECIMAL(25,12))) AS sx,
         SUM(CAST(x * x AS DECIMAL(25,12))) AS sxx,
         SUM(CAST(xn AS DECIMAL(25,12))) AS sy,
         SUM(CAST(xn * xn AS DECIMAL(25,12))) AS syy,
         SUM(CAST(x * xn AS DECIMAL(25,12))) AS sxy,
         CAST(COUNT(xn) AS BIGINT) AS np
  FROM ex GROUP BY dim
)
SELECT dim, n_vecs,
       ROUND(CAST(sx AS DOUBLE) / n_vecs, 6) AS mean_val,
       ROUND((n_vecs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n_vecs AS DOUBLE) * n_vecs), 6) AS variance,
       ROUND(CASE WHEN np > 0 THEN
         (np * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((np * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (np * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END, 6) AS corr_next
FROM agg ORDER BY dim
"""
EXTENSION_QUERIES["es09_dimension_stats"] = es09_dimension_stats


def cs01_chi_square_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-square independence check between event type and ISO
    weekday — the categorical drift monitor next to ks01's continuous
    one (did the traffic MIX shift across the week, e.g. a crawler
    that only runs on weekdays?). Observed counts come from ONE
    groupBy; the expected counts are outer products of the two
    marginal vectors (broadcast — they are |types| and 7 rows); the
    dense type×weekday grid is built by crossing the two marginals so
    zero cells still contribute their full expectation.

    Determinism: each cell's (o−e)²/e is computed in double from
    integer counts (identical expression both engines), rounded to
    6 dp, and summed as DECIMAL(25,6) — the sum is order-independent,
    so shuffle arrival order cannot wiggle the statistic. Kernel:
    operators/stats.chi_square_independence (property-swept against a
    sequential Python chi-square in tests/test_stats.py).
    """
    from ..operators.stats import chi_square_independence

    ev = load(spark, sf, "events").select(
        "event_type", (F.expr("weekday(ts)") + F.lit(1)).alias("dow")
    )
    return chi_square_independence(
        ev, "event_type", "dow"
    ).withColumnRenamed("n_rows", "n_events")


EXTENSION_ORACLE["cs01_chi_square_mix"] = """
WITH ev AS (
  SELECT event_type, CAST(isodow(ts) AS INT) AS dow FROM events
  -- mirror the kernel's na.drop on (a, b): NULL type/ts rows are out
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
), obs AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS o
  FROM ev GROUP BY event_type, dow
), rt AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS rt FROM ev GROUP BY event_type
), ct AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS ct FROM ev GROUP BY dow
), n AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM ev
), grid AS (
  SELECT rt.event_type, ct.dow, rt.rt, ct.ct,
         COALESCE(obs.o, 0) AS o
  FROM rt CROSS JOIN ct
  LEFT JOIN obs ON obs.event_type = rt.event_type AND obs.dow = ct.dow
), cells AS (
  SELECT event_type, rt,
         CAST(ROUND(
           (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n.n)
           * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n.n)
           / (CAST(rt AS DOUBLE) * ct / n.n), 6) AS DECIMAL(25,6)) AS c
  FROM grid, n
)
SELECT event_type,
       CAST(MAX(rt) AS BIGINT) AS n_events,
       CAST(SUM(c) AS DOUBLE) AS chi2_part
FROM cells GROUP BY event_type ORDER BY event_type
"""
EXTENSION_QUERIES["cs01_chi_square_mix"] = cs01_chi_square_mix


def win02_locf_fill(spark: SparkSession, sf: str) -> DataFrame:
    """LOCF gap fill — win01's sibling for ENTITY time series: each
    tracked user's daily mean value on a dense day spine, with missing
    days carried forward from the last observed day (the fill a
    feature store applies to slowly-moving per-entity signals; days
    before a user's first observation stay NULL, and is_filled marks
    carried rows).

    The spine is wall-time-bounded (days × tracked users, not event
    volume); the roster filter (user_id < 200 — keeps the certified
    output bounded; the plan is identical unfiltered) pushes down to
    the scan. The carry is last(ignorenulls) over a PER-USER window —
    user_id is high-cardinality, so partitions stay small and spread;
    never a single-partition window. Daily means round decimal sums,
    so the fill propagates deterministic values."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").filter(F.col("user_id") < 200).select(
        "user_id", F.to_date("ts").alias("__d"), "value"
    )
    daily = ev.groupBy("user_id", "__d").agg(
        F.count(F.lit(1)).alias("__n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("__avg"),
    )
    spine = ev.agg(
        F.min("__d").alias("__mn"), F.max("__d").alias("__mx")
    ).select(
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.expr("interval 1 day"))
        ).alias("day")
    )
    users = ev.select("user_id").distinct()
    grid = spine.crossJoin(F.broadcast(users))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(
            daily,
            (grid["day"] == daily["__d"]) & (grid["user_id"] == daily["user_id"]),
            "left",
        )
        .select(
            grid["user_id"],
            grid["day"].cast("timestamp").alias("day"),
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.col("__avg"),
        )
        .withColumn("locf_value", F.last("__avg", ignorenulls=True).over(w))
        .withColumn(
            "is_filled",
            F.col("__avg").isNull() & F.col("locf_value").isNotNull(),
        )
        .drop("__avg")
        .orderBy("user_id", "day")
    )


EXTENSION_ORACLE["win02_locf_fill"] = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d, value
  FROM events WHERE user_id < 200
), daily AS (
  SELECT user_id, d, CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*), 6) AS avg_v
  FROM ev GROUP BY user_id, d
), b AS (
  SELECT MIN(d) AS mn, MAX(d) AS mx FROM ev
), spine AS (
  SELECT unnest(generate_series(CAST(b.mn AS TIMESTAMP),
                                CAST(b.mx AS TIMESTAMP),
                                INTERVAL 1 DAY)) AS day
  FROM b
), users AS (
  SELECT DISTINCT user_id FROM ev
), grid AS (
  SELECT u.user_id, s.day FROM spine s CROSS JOIN users u
), joined AS (
  SELECT g.user_id, g.day,
         COALESCE(daily.n, 0) AS n_events,
         daily.avg_v
  FROM grid g LEFT JOIN daily
    ON daily.user_id = g.user_id AND daily.d = CAST(g.day AS DATE)
)
SELECT user_id, day, n_events,
       last_value(avg_v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value,
       (avg_v IS NULL AND last_value(avg_v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) IS NOT NULL)
         AS is_filled
FROM joined ORDER BY user_id, day
"""
EXTENSION_QUERIES["win02_locf_fill"] = win02_locf_fill


def win03_peak_hours(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type peak hour via ``max_by`` — certifying Spark's argmax
    aggregate against the textbook window specification (the oracle
    runs ROW_NUMBER ... ORDER BY n DESC, hour ASC). The tie rule rides
    the comparator: max of (n, −epoch(hour)) = highest count, then
    EARLIEST hour — struct comparison is lexicographic, so the rule is
    explicit in the expression, not an implementation accident.

    Scale: the hourly rollup map-side-combines; the argmax is ONE
    map-side-combinable aggregate over (type) — no per-type window
    sort, no second shuffle of the hourly frame. This is the shape to
    prefer over row_number()-filter whenever only the top-1 per group
    is needed."""
    ev = load(spark, sf, "events")
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    peak = F.max_by(
        F.struct("hour", "n"),
        F.struct(F.col("n"), (-F.unix_timestamp("hour")).alias("__negh")),
    )
    return (
        hourly.groupBy("event_type")
        .agg(peak.alias("__p"))
        .select(
            "event_type",
            F.col("__p.hour").alias("peak_hour"),
            F.col("__p.n").alias("peak_events"),
        )
        .orderBy("event_type")
    )


EXTENSION_QUERIES["win03_peak_hours"] = win03_peak_hours

EXTENSION_ORACLE["win03_peak_hours"] = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), ranked AS (
  SELECT event_type, hour, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY n DESC, hour ASC) AS rk
  FROM hourly
)
SELECT event_type, hour AS peak_hour, n AS peak_events
FROM ranked WHERE rk = 1 ORDER BY event_type
"""


def psi01_value_stability(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index per event type — the scorecard-world
    drift metric next to ks01 (KS weights the worst point; PSI weights
    the whole histogram shift): fixed-width bins over `value`, early
    half vs late half, PSI = Σ (p−q)·ln(p/q) with 0.5-count Laplace
    smoothing so empty bins contribute finite mass (the standard
    guard). Fixed bins — not sample quantiles — keep the metric
    reproducible across runs and engines.

    One conditional-count aggregate (map-side combinable) over
    (type, bin); the dense grid crosses the tiny type roster with a
    20-bin spine (broadcast both); per-bin contributions round to 6 dp
    and sum as DECIMAL(25,6) — shuffle-order independent. >0.25 is the
    conventional act threshold, reported as a flag. Kernel:
    operators/stats.population_stability_index (property-swept in
    tests/test_stats.py)."""
    from ..operators.stats import population_stability_index

    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    ev = load(spark, sf, "events").select(
        "event_type",
        F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(19)).alias(
            "__bin"
        ),
        "ts",
    )
    return (
        population_stability_index(
            ev, "event_type", "__bin", side_a=F.col("ts") < split, n_bins=20
        )
        .withColumnRenamed("n_a", "n_early")
        .withColumnRenamed("n_b", "n_late")
        .withColumn("drifted", F.col("psi") > 0.25)
    )


EXTENSION_ORACLE["psi01_value_stability"] = """
WITH ev AS (
  SELECT event_type,
         LEAST(CAST(FLOOR(value / 50) AS INT), 19) AS bin,
         CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS a
  FROM events
  -- mirror the kernel's na.drop on (group, bin): NULL value rows out
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), obs AS (
  SELECT event_type, bin,
         CAST(SUM(a) AS BIGINT) AS ca,
         CAST(SUM(1 - a) AS BIGINT) AS cb
  FROM ev GROUP BY event_type, bin
), totals AS (
  SELECT event_type,
         CAST(SUM(ca) AS BIGINT) AS na,
         CAST(SUM(cb) AS BIGINT) AS nb
  FROM obs GROUP BY event_type
), grid AS (
  SELECT t.event_type, b.bin, t.na, t.nb,
         COALESCE(obs.ca, 0) AS ca, COALESCE(obs.cb, 0) AS cb
  FROM totals t CROSS JOIN (SELECT unnest(range(0, 20)) AS bin) b
  LEFT JOIN obs ON obs.event_type = t.event_type AND obs.bin = b.bin
), cells AS (
  SELECT event_type, na, nb,
         CAST(ROUND(
           ((ca + 0.5) / (na + 10.0) - (cb + 0.5) / (nb + 10.0))
           * ln(((ca + 0.5) / (na + 10.0)) / ((cb + 0.5) / (nb + 10.0))),
           6) AS DECIMAL(25,6)) AS c
  FROM grid
)
SELECT event_type,
       CAST(MAX(na) AS BIGINT) AS n_early,
       CAST(MAX(nb) AS BIGINT) AS n_late,
       CAST(SUM(c) AS DOUBLE) AS psi,
       CAST(SUM(c) AS DOUBLE) > 0.25 AS drifted
FROM cells GROUP BY event_type ORDER BY event_type
"""
EXTENSION_QUERIES["psi01_value_stability"] = psi01_value_stability


def tx10_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer vocabulary coverage — the go/no-go check before
    committing a vocab: freeze the top-1000 corpus words (count desc,
    word asc — the tie at the boundary is deterministic) as the
    "vocabulary", then per language report token-level and type-level
    out-of-vocabulary rates (how much running text, and how much of
    the lexicon, a 1000-entry vocab fails to cover).

    Single tokenize pass: per-(lang, word) counts shuffle once and are
    pinned with a lazy localCheckpoint; both the global vocab ranking
    and the per-language coverage derive from that frame. The vocab is
    top-k via orderBy+limit (TakeOrdered — a distributed heap, no
    global sort) and broadcasts."""
    per = (
        _docs_words(spark, sf)
        .select("lang", F.explode("__words").alias("__w"))
        .groupBy("lang", "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)
    )
    vocab = (
        per.groupBy("__w")
        .agg(F.sum("__c").alias("__n"))
        .orderBy(F.desc("__n"), F.asc("__w"))
        .limit(1000)
        .select("__w", F.lit(1).alias("__v"))
    )
    j = per.join(F.broadcast(vocab), "__w", "left")
    covered = F.sum(F.when(F.col("__v").isNotNull(), F.col("__c")).otherwise(0))
    n_tokens = F.sum("__c")
    n_types = F.count(F.lit(1))
    oov_types = F.sum(F.col("__v").isNull().cast("long"))
    return (
        j.groupBy("lang")
        .agg(
            n_tokens.cast("bigint").alias("n_tokens"),
            n_types.cast("bigint").alias("n_types"),
            covered.cast("bigint").alias("covered_tokens"),
            F.round(
                F.lit(1.0) - covered.cast("double") / n_tokens.cast("double"), 6
            ).alias("oov_token_rate"),
            F.round(
                oov_types.cast("double") / n_types.cast("double"), 6
            ).alias("oov_type_rate"),
        )
        .orderBy("lang")
    )


EXTENSION_ORACLE["tx10_vocab_coverage"] = f"""
WITH w AS (
  SELECT lang, unnest({_WORDS}) AS w FROM documents
), per AS (
  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY lang, w
), wc AS (
  SELECT w, CAST(SUM(c) AS BIGINT) AS n FROM per GROUP BY w
), vocab AS (
  SELECT w FROM wc ORDER BY n DESC, w ASC LIMIT 1000
)
SELECT per.lang,
       CAST(SUM(per.c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN v.w IS NOT NULL THEN per.c ELSE 0 END) AS BIGINT)
         AS covered_tokens,
       ROUND(1.0 - CAST(SUM(CASE WHEN v.w IS NOT NULL THEN per.c ELSE 0 END)
                        AS DOUBLE) / SUM(per.c), 6) AS oov_token_rate,
       ROUND(CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_type_rate
FROM per LEFT JOIN vocab v USING (w)
GROUP BY per.lang ORDER BY per.lang
"""
EXTENSION_QUERIES["tx10_vocab_coverage"] = tx10_vocab_coverage


def ia01_interarrival_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Inter-arrival burstiness per event type — the traffic-shape
    fingerprint (a Poisson stream has CV² ≈ 1; retry storms and
    crawler bursts push it far above): per user-and-type consecutive
    gaps via ONE lag window keyed by (user_id, event_type) —
    high-cardinality, so partitions stay small — then a
    map-side-combinable aggregate of exact integer second-gaps.

    Gaps are floor-epoch differences (int64) and both moment sums stay
    integral (gap < ~10^6 s, squares < 10^12, sums < 2^63 far past
    100 TB), so mean and CV² come from exact integers in one double
    expression, rounded to 6 dp — no float accumulation anywhere."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").cast("long").alias("__es"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "__es", "user_id"
    )
    gaps = ev.withColumn("__gap", F.col("__es") - F.lag("__es").over(w)).filter(
        F.col("__gap").isNotNull()
    )
    n = F.count(F.lit(1))
    s1 = F.sum("__gap")
    s2 = F.sum(F.col("__gap") * F.col("__gap"))
    mean = s1.cast("double") / n.cast("double")
    # population variance / mean^2, all from exact integer sums
    cv2 = (
        (n.cast("double") * s2.cast("double") - s1.cast("double") * s1.cast("double"))
        / (s1.cast("double") * s1.cast("double"))
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            n.cast("bigint").alias("n_gaps"),
            F.round(mean, 6).alias("mean_gap_s"),
            F.round(cv2, 6).alias("cv2"),
        )
        .orderBy("event_type")
    )


EXTENSION_ORACLE["ia01_interarrival_stats"] = """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
  FROM events
), gaps AS (
  SELECT event_type,
         es - lag(es) OVER (PARTITION BY user_id, event_type
                            ORDER BY es, user_id) AS gap
  FROM ev
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(*), 6) AS mean_gap_s,
       ROUND((COUNT(*) * CAST(SUM(gap * gap) AS DOUBLE)
              - CAST(SUM(gap) AS DOUBLE) * CAST(SUM(gap) AS DOUBLE))
             / (CAST(SUM(gap) AS DOUBLE) * CAST(SUM(gap) AS DOUBLE)),
             6) AS cv2
FROM gaps WHERE gap IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""
EXTENSION_QUERIES["ia01_interarrival_stats"] = ia01_interarrival_stats


def dd10_minhash_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-quality audit: how well does the 16-permutation MinHash
    ESTIMATE (matching signature positions / k) track exact Jaccard on
    the LSH candidate pairs? Binned by exact similarity decade with
    the estimator's mean and mean absolute error per bin — the
    calibration table that justifies (or vetoes) trusting the sketch
    alone at 100 TB, where exact verification is the expensive step
    this audit lets you sample down.

    Same never-all-pairs discipline as dd03 (kernels shared, not
    copied): candidates come from the banded join only. Per-pair
    estimates are multiples of 1/16 and exact Jaccards are 6 dp
    decimals, so every per-bin mean accumulates DECIMAL(25,10) —
    shuffle-order independent."""
    docs, sigs, pairs = _lsh_base(spark, sf)
    ga = sigs.select(F.col("doc_id").alias("id_a"), F.col("signature").alias("__ga"))
    gb = sigs.select(F.col("doc_id").alias("id_b"), F.col("signature").alias("__gb"))
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("__sa"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("__sb"))
    n_eq = F.expr(
        "size(filter(zip_with(__ga, __gb, (x, y) -> x = y), v -> v))"
    )
    scored = (
        pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            (n_eq / F.lit(float(MINHASH_K))).alias("__est"),
            dd.jaccard(F.col("__sa"), F.col("__sb")).alias("__exact"),
        )
    )
    d10 = lambda c: c.cast("decimal(25,10)")  # noqa: E731
    n = F.count(F.lit(1))
    return (
        scored.withColumn(
            "bin",
            F.least(F.floor(F.col("__exact") * 10).cast("int"), F.lit(9)),
        )
        .groupBy("bin")
        .agg(
            n.cast("bigint").alias("n_pairs"),
            F.round(F.sum(d10(F.col("__exact"))).cast("double") / n, 6).alias(
                "mean_exact"
            ),
            F.round(F.sum(d10(F.col("__est"))).cast("double") / n, 6).alias(
                "mean_est"
            ),
            F.round(
                F.sum(
                    d10(F.round(F.abs(F.col("__est") - F.col("__exact")), 6))
                ).cast("double")
                / n,
                6,
            ).alias("mean_abs_err"),
        )
        .orderBy("bin")
    )


EXTENSION_ORACLE["dd10_minhash_calibration"] = f"""
WITH sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range({MINHASH_K})) AS j) GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ',')) AS band_key
  FROM pj GROUP BY doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
), eq AS (
  SELECT p.id_a, p.id_b,
         CAST(SUM(CASE WHEN pa.mh = pb.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_eq
  FROM pairs p
  JOIN pj pa ON pa.doc_id = p.id_a
  JOIN pj pb ON pb.doc_id = p.id_b AND pb.j = pa.j
  GROUP BY p.id_a, p.id_b
), scored AS (
  SELECT e.n_eq / {float(MINHASH_K)} AS est,
         {_JACCARD.format(a='sa.s', b='sb.s')} AS exact
  FROM eq e JOIN sh sa ON sa.doc_id = e.id_a JOIN sh sb ON sb.doc_id = e.id_b
)
SELECT LEAST(CAST(FLOOR(exact * 10) AS INT), 9) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(exact AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*), 6)
         AS mean_exact,
       ROUND(CAST(SUM(CAST(est AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*), 6)
         AS mean_est,
       ROUND(CAST(SUM(CAST(ROUND(ABS(est - exact), 6) AS DECIMAL(25,10)))
                  AS DOUBLE) / COUNT(*), 6) AS mean_abs_err
FROM scored GROUP BY 1 ORDER BY bin
"""
EXTENSION_QUERIES["dd10_minhash_calibration"] = dd10_minhash_calibration


def es10_label_silhouette(spark: SparkSession, sf: str) -> DataFrame:
    """Label-separation quality (silhouette-lite): per vector, the
    distance to its OWN label centroid (a) vs the nearest OTHER
    centroid (b), summarized per label as mean (b−a)/max(a,b) — the
    one-number answer to "are these labels actually separated in
    embedding space, or is the labeling noise?" run before trusting
    labels for supervised filtering.

    Exact-distance discipline (es08's): per-term squared diffs cast
    DECIMAL(30,15) and sum exactly, so a/b are bit-identical
    cross-engine. Centroid table broadcasts. Per-vector silhouettes
    round to 6 dp and average as decimals.

    Kept in this exploded own/oth shape after two r13 A/Bs: the
    broadcast-centroid-array + per-row decimal distance FOLD rewrite
    measured slower (interpreted HOF decimal arithmetic — see
    _label_centroid_sqdist), and fusing the own/oth legs into one
    (label, vec_id) aggregate swapped the own⋈oth join for a second
    Exchange with no measurable win (2.05 vs 1.86 s isolated, inside
    the ±15% session noise) — so the certified shape stays."""
    emb = load(spark, sf, "embeddings")
    ex = emb.select(
        "label", "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).withColumn("val", F.col("val").cast("double"))
    cent = ex.groupBy("label", "dim").agg(
        (
            F.sum(F.col("val").cast("decimal(25,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__c")
    )
    allc = cent.select(F.col("label").alias("__cl"), "dim", "__c")
    d2 = (
        ex.join(F.broadcast(allc), "dim")
        .withColumn(
            "__sq",
            ((F.col("val") - F.col("__c")) * (F.col("val") - F.col("__c")))
            .cast("decimal(30,15)"),
        )
        .groupBy("label", "vec_id", "__cl")
        .agg(F.sum("__sq").alias("__d2"))
    )
    own = d2.filter(F.col("label") == F.col("__cl")).select(
        "label", "vec_id", F.col("__d2").alias("__a2")
    )
    oth = d2.filter(F.col("label") != F.col("__cl")).groupBy(
        "label", "vec_id"
    ).agg(F.min("__d2").alias("__b2"))
    a = F.sqrt(F.col("__a2").cast("double"))
    b = F.sqrt(F.col("__b2").cast("double"))
    sil = F.round(
        F.when(F.greatest(a, b) == 0.0, F.lit(0.0)).otherwise(
            (b - a) / F.greatest(a, b)
        ),
        6,
    )
    per_vec = own.join(oth, ["label", "vec_id"]).select(
        "label",
        sil.alias("__s"),
        F.round(a, 6).alias("__a"),
    )
    n = F.count(F.lit(1))
    d10 = lambda c: F.col(c).cast("decimal(25,10)")  # noqa: E731
    return (
        per_vec.groupBy("label")
        .agg(
            n.cast("bigint").alias("n_vecs"),
            F.round(F.sum(d10("__s")).cast("double") / n, 6).alias(
                "mean_silhouette"
            ),
            F.round(F.sum(d10("__a")).cast("double") / n, 6).alias(
                "mean_own_dist"
            ),
        )
        .orderBy("label")
    )


EXTENSION_ORACLE["es10_label_silhouette"] = """
WITH ex AS (
  SELECT label, vec_id, CAST(d - 1 AS INT) AS dim,
         CAST(embedding[d] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d)
), cent AS (
  SELECT label AS cl, dim,
         CAST(SUM(CAST(val AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*) AS c
  FROM ex GROUP BY label, dim
), d2 AS (
  SELECT e.label, e.vec_id, c.cl,
         SUM(CAST((e.val - c.c) * (e.val - c.c) AS DECIMAL(30,15))) AS d2
  FROM ex e JOIN cent c ON e.dim = c.dim
  GROUP BY e.label, e.vec_id, c.cl
), own AS (
  SELECT label, vec_id, d2 AS a2 FROM d2 WHERE label = cl
), oth AS (
  SELECT label, vec_id, MIN(d2) AS b2 FROM d2 WHERE label <> cl
  GROUP BY label, vec_id
), per_vec AS (
  SELECT o.label,
         ROUND(CASE WHEN GREATEST(sqrt(CAST(o.a2 AS DOUBLE)),
                                  sqrt(CAST(t.b2 AS DOUBLE))) = 0.0 THEN 0.0
                    ELSE (sqrt(CAST(t.b2 AS DOUBLE)) - sqrt(CAST(o.a2 AS DOUBLE)))
                         / GREATEST(sqrt(CAST(o.a2 AS DOUBLE)),
                                    sqrt(CAST(t.b2 AS DOUBLE)))
               END, 6) AS s,
         ROUND(sqrt(CAST(o.a2 AS DOUBLE)), 6) AS a
  FROM own o JOIN oth t ON o.label = t.label AND o.vec_id = t.vec_id
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(CAST(SUM(CAST(s AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*), 6)
         AS mean_silhouette,
       ROUND(CAST(SUM(CAST(a AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*), 6)
         AS mean_own_dist
FROM per_vec GROUP BY label ORDER BY label
"""
EXTENSION_QUERIES["es10_label_silhouette"] = es10_label_silhouette


def src01_source_divergence(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus mixing map: Jensen-Shannon divergence between every pair
    of sources' unigram distributions — the distance matrix mixture
    design reads before weighting sources (near-duplicate feeds show
    up as JSD≈0; an off-distribution source stands out before it
    skews training).

    Decomposition that needs ONLY the shared-vocabulary join: for
    words present in one source but not the other, the JSD term is
    exactly P·ln2, so JSD = 0.5·[Σ_shared P·ln(2P/(P+Q)) +
    ln2·(1−Σ_shared P)] + (symmetric in Q). The self-join on word
    costs Σ_w k_w² rows (k_w = sources containing w) — bounded by
    vocabulary × S², independent of corpus size; per-source count
    tables shuffle once, totals broadcast. Per-word terms round to
    12 dp and sum as DECIMAL(25,12): shuffle-order independent."""
    counts = (
        _docs_words(spark, sf)
        .select("source", F.explode("__words").alias("__w"))
        .groupBy("source", "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)
    )
    totals = counts.groupBy("source").agg(F.sum("__c").alias("__n"))
    a = (
        counts.join(F.broadcast(totals), "source")
        .select(
            F.col("source").alias("source_a"),
            F.col("__w"),
            (F.col("__c").cast("double") / F.col("__n").cast("double")).alias("__p"),
        )
    )
    b = (
        counts.join(F.broadcast(totals), "source")
        .select(
            F.col("source").alias("source_b"),
            F.col("__w"),
            (F.col("__c").cast("double") / F.col("__n").cast("double")).alias("__q"),
        )
    )
    d12 = lambda c: F.round(c, 12).cast("decimal(25,12)")  # noqa: E731
    # dense pair roster: a pair sharing NO vocabulary never reaches the
    # shared-word join, but its JSD is exactly ln2 — left-join the
    # roster so disjoint pairs surface instead of silently vanishing
    srcs = totals.select("source")
    roster = (
        F.broadcast(srcs.select(F.col("source").alias("source_a")))
        .crossJoin(F.broadcast(srcs.select(F.col("source").alias("source_b"))))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    shared = (
        a.join(b, "__w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(
                d12(
                    F.col("__p")
                    * F.log(F.lit(2.0) * F.col("__p") / (F.col("__p") + F.col("__q")))
                )
            ).alias("__ta"),
            F.sum(
                d12(
                    F.col("__q")
                    * F.log(F.lit(2.0) * F.col("__q") / (F.col("__p") + F.col("__q")))
                )
            ).alias("__tb"),
            F.sum(d12(F.col("__p"))).alias("__pa"),
            F.sum(d12(F.col("__q"))).alias("__qb"),
        )
    )
    shared = roster.join(shared, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        *[
            F.coalesce(F.col(c), F.lit(0).cast("decimal(25,12)")).alias(c)
            for c in ("__ta", "__tb", "__pa", "__qb")
        ],
    )
    ln2 = 0.6931471805599453
    jsd = F.round(
        F.lit(0.5)
        * (
            F.col("__ta").cast("double")
            + F.lit(ln2) * (F.lit(1.0) - F.col("__pa").cast("double"))
        )
        + F.lit(0.5)
        * (
            F.col("__tb").cast("double")
            + F.lit(ln2) * (F.lit(1.0) - F.col("__qb").cast("double"))
        ),
        6,
    )
    return shared.select("source_a", "source_b", jsd.alias("jsd")).orderBy(
        "source_a", "source_b"
    )


EXTENSION_ORACLE["src01_source_divergence"] = f"""
WITH w AS (
  SELECT source, unnest({_WORDS}) AS w FROM documents
), counts AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY source, w
), totals AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY source
), p AS (
  SELECT c.source, c.w, CAST(c.c AS DOUBLE) / t.n AS p
  FROM counts c JOIN totals t USING (source)
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         SUM(CAST(ROUND(a.p * ln(2.0 * a.p / (a.p + b.p)), 12)
                  AS DECIMAL(25,12))) AS ta,
         SUM(CAST(ROUND(b.p * ln(2.0 * b.p / (a.p + b.p)), 12)
                  AS DECIMAL(25,12))) AS tb,
         SUM(CAST(ROUND(a.p, 12) AS DECIMAL(25,12))) AS pa,
         SUM(CAST(ROUND(b.p, 12) AS DECIMAL(25,12))) AS qb
  FROM p a JOIN p b ON a.w = b.w AND a.source < b.source
  GROUP BY a.source, b.source
), roster AS (
  SELECT x.source AS source_a, y.source AS source_b
  FROM totals x CROSS JOIN totals y WHERE x.source < y.source
), dense AS (
  SELECT r.source_a, r.source_b,
         COALESCE(s.ta, 0) AS ta, COALESCE(s.tb, 0) AS tb,
         COALESCE(s.pa, 0) AS pa, COALESCE(s.qb, 0) AS qb
  FROM roster r LEFT JOIN shared s
    ON s.source_a = r.source_a AND s.source_b = r.source_b
)
SELECT source_a, source_b,
       ROUND(0.5 * (CAST(ta AS DOUBLE)
                    + 0.6931471805599453 * (1.0 - CAST(pa AS DOUBLE)))
             + 0.5 * (CAST(tb AS DOUBLE)
                      + 0.6931471805599453 * (1.0 - CAST(qb AS DOUBLE))),
             6) AS jsd
FROM dense ORDER BY source_a, source_b
"""
EXTENSION_QUERIES["src01_source_divergence"] = src01_source_divergence


def gr01_candidate_degree_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Degree profile of the LSH candidate graph — the health check
    run before connected components: a power-law tail or a single
    high-degree hub (a boilerplate/template document matching
    everything) blows up both the verify stage (candidate count) and
    the cluster diameter (CC rounds). Reports the degree histogram in
    powers of two with each bucket's share of all candidate-pair
    endpoints.

    Reuses dd03's banded candidate kernel (never all-pairs); degrees
    are one symmetric union + count (single shuffle on doc_id); the
    histogram is a second tiny aggregate. Bucketing by bit length is
    exact integer math — no log() doubles."""
    _docs, _sigs, pairs = _lsh_base(spark, sf)
    ends = pairs.select(F.col("id_a").alias("doc_id")).unionAll(
        pairs.select(F.col("id_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__deg"))
    # bucket = bit length of the degree (1 -> 1, 2-3 -> 2, 4-7 -> 3,
    # ...): exact integer math via base conversion, no float log2
    bucket = (
        F.length(F.conv(F.col("__deg").cast("string"), 10, 2))
    ).cast("int")
    total = deg.agg(F.sum("__deg").alias("__tot"))
    return (
        deg.withColumn("bucket", bucket)
        .crossJoin(F.broadcast(total))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("__deg").cast("bigint").alias("min_degree"),
            F.max("__deg").cast("bigint").alias("max_degree"),
            F.round(
                F.sum("__deg").cast("double") / F.max("__tot").cast("double"),
                6,
            ).alias("endpoint_share"),
        )
        .orderBy("bucket")
    )


EXTENSION_ORACLE["gr01_candidate_degree_profile"] = f"""
WITH sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range({MINHASH_K})) AS j) GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ',')) AS band_key
  FROM pj GROUP BY doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
), ends AS (
  SELECT id_a AS doc_id FROM pairs UNION ALL SELECT id_b FROM pairs
), deg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM ends GROUP BY doc_id
), tot AS (
  SELECT CAST(SUM(deg) AS BIGINT) AS tot FROM deg
)
SELECT CAST(length(bin(deg)) AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(deg) AS BIGINT) AS min_degree,
       CAST(MAX(deg) AS BIGINT) AS max_degree,
       ROUND(CAST(SUM(deg) AS DOUBLE) / MAX(tot.tot), 6) AS endpoint_share
FROM deg, tot GROUP BY 1 ORDER BY bucket
"""
EXTENSION_QUERIES["gr01_candidate_degree_profile"] = gr01_candidate_degree_profile


def sk01_key_skew_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Join-key skew audit — the detector that tells you BEFORE a
    shuffle join whether sa02's salted join (or AQE skew handling) is
    needed: for each shuffle key the engine actually joins on, the key
    cardinality, the heaviest key's row count, and the max/avg skew
    ratio. A ratio near 1 means hash partitioning balances; 100+ means
    one task gets the hot key's entire partition.

    One count-aggregate per audited key (map-side combinable) plus a
    5-number summary — the same O(distinct keys) cost AQE's runtime
    statistics pay, available at plan time."""
    def audit(df, table, key):
        per = df.groupBy(F.col(key).alias("__k")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        return per.agg(
            F.lit(f"{table}.{key}").alias("join_key"),
            F.sum("__c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("__c").cast("bigint").alias("max_key_rows"),
            F.round(
                F.max("__c").cast("double")
                * F.count(F.lit(1)).cast("double")
                / F.sum("__c").cast("double"),
                6,
            ).alias("skew_ratio"),
            F.round(
                F.max("__c").cast("double") / F.sum("__c").cast("double"), 6
            ).alias("top1_share"),
        )
    ev = load(spark, sf, "events")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    return (
        audit(ev, "events", "user_id")
        .unionByName(audit(orders, "orders", "o_custkey"))
        .unionByName(audit(li, "lineitem", "l_orderkey"))
        .orderBy("join_key")
    )


EXTENSION_ORACLE["sk01_key_skew_audit"] = """
WITH a AS (
  SELECT 'events.user_id' AS join_key, COUNT(*) AS c
  FROM events GROUP BY user_id
), b AS (
  SELECT 'orders.o_custkey' AS join_key, COUNT(*) AS c
  FROM orders GROUP BY o_custkey
), c AS (
  SELECT 'lineitem.l_orderkey' AS join_key, COUNT(*) AS c
  FROM lineitem GROUP BY l_orderkey
), u AS (
  SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c
)
SELECT join_key,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(c) AS BIGINT) AS max_key_rows,
       ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 6) AS skew_ratio,
       ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top1_share
FROM u GROUP BY join_key ORDER BY join_key
"""
EXTENSION_QUERIES["sk01_key_skew_audit"] = sk01_key_skew_audit


def es11_ann_recall(spark: SparkSession, sf: str) -> DataFrame:
    """MEASURED recall of the sign-LSH ANN path: for ten query vectors,
    the overlap between the bucketed candidate ranking and the exact
    top-10 — the number that turns es03's "approximate" from a leap of
    faith into a dial (raise tables/bits until measured recall meets
    the SLA, cf. dd05's analytic recall arithmetic; this is its
    empirical twin).

    Both rankings use the distributed TWO-PHASE top-k-per-group:
    per-partition row_number keeps k rows per (partition, query) —
    bounded memory, no collect_list — then the global rank runs over
    only P·Q·k survivors. Partition layout cannot change the answer
    (the full (cosine, vec_id) ordering is total), and no window ever
    sees more than one partition's rows in phase one. The exact side
    scans n·Q pairs (Q=10 broadcast queries); the ANN side only the
    bucket-joined candidates."""
    from pyspark.sql import Window

    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("__qe")
    )

    def topk(scored, k=10):
        w1 = Window.partitionBy("__pid", "qid").orderBy(
            F.desc("__cos"), F.asc("vec_id")
        )
        w2 = Window.partitionBy("qid").orderBy(F.desc("__cos"), F.asc("vec_id"))
        return (
            scored.withColumn("__pid", F.spark_partition_id())
            .withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= k)
            .withColumn("__r2", F.row_number().over(w2))
            .filter(F.col("__r2") <= k)
            .select("qid", "vec_id")
        )

    exact_scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            sim.cosine(F.col("embedding"), F.col("__qe")).alias("__cos"),
        )
    )
    exact = topk(exact_scored)

    tables = []
    for t in range(LSH_TABLES):
        tables.append(
            emb.select(
                "vec_id",
                "embedding",
                sim.sign_bucket(
                    F.col("embedding"), nbits=LSH_NBITS, offset=t * LSH_NBITS
                ).alias("__bucket"),
                F.lit(t).alias("__tbl"),
            )
        )
    banded = tables[0]
    for tdf in tables[1:]:
        banded = banded.unionByName(tdf)
    qb = banded.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("__qe"),
        "__tbl",
        "__bucket",
    )
    cand = (
        banded.join(F.broadcast(qb), ["__tbl", "__bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            sim.cosine(F.col("embedding"), F.col("__qe")).alias("__cos"),
        )
        .distinct()
    )
    ann = topk(cand)
    n_cand = cand.groupBy("qid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ann_candidates")
    )
    hits = (
        exact.join(ann, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("__h"))
    )
    return (
        q.select("qid")
        .join(F.broadcast(n_cand), "qid", "left")
        .join(F.broadcast(hits), "qid", "left")
        .select(
            F.col("qid").alias("query_id"),
            F.coalesce(F.col("n_ann_candidates"), F.lit(0)).alias(
                "n_ann_candidates"
            ),
            (F.coalesce(F.col("__h"), F.lit(0)).cast("double") / 10.0).alias(
                "recall_at_10"
            ),
        )
        .orderBy("query_id")
    )


EXTENSION_ORACLE["es11_ann_recall"] = f"""
WITH banded AS ({_BANDED}),
qs AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10
), exact_scored AS (
  SELECT q.qid, e.vec_id, {_COS.format(a='e.embedding', b='q.qe')} AS c
  FROM embeddings e CROSS JOIN qs q WHERE e.vec_id <> q.qid
), exact_top AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS r
    FROM exact_scored) WHERE r <= 10
), qb AS (
  SELECT vec_id AS qid, embedding AS qe, tbl, bucket
  FROM banded WHERE vec_id < 10
), cand AS (
  SELECT DISTINCT q.qid, b.vec_id,
         {_COS.format(a='b.embedding', b='q.qe')} AS c
  FROM banded b JOIN qb q ON b.tbl = q.tbl AND b.bucket = q.bucket
  WHERE b.vec_id <> q.qid
), ann_top AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS r
    FROM cand) WHERE r <= 10
), nc AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_ann_candidates
  FROM cand GROUP BY qid
), hits AS (
  SELECT e.qid, COUNT(*) AS h
  FROM exact_top e JOIN ann_top a ON a.qid = e.qid AND a.vec_id = e.vec_id
  GROUP BY e.qid
)
SELECT q.qid AS query_id,
       COALESCE(nc.n_ann_candidates, 0) AS n_ann_candidates,
       CAST(COALESCE(hits.h, 0) AS DOUBLE) / 10.0 AS recall_at_10
FROM qs q
LEFT JOIN nc ON nc.qid = q.qid
LEFT JOIN hits ON hits.qid = q.qid
ORDER BY query_id
"""
EXTENSION_QUERIES["es11_ann_recall"] = es11_ann_recall


# Product-quantization geometry shared by es12 (codebook QC) and es13
# (ADC search): M contiguous subspaces over D dims, K codewords each.
PQ_M, PQ_D, PQ_K = 2, 64, 16


def _pq_assigned(
    spark: SparkSession, sf: str, extra_err: bool
) -> tuple[DataFrame, DataFrame]:
    """Train the deterministic per-subspace PQ codebooks (fused
    namespaced Lloyd chain — see es12's docstring for the full
    arithmetic discipline) and return ``(assigned, cents)``:
    ``assigned`` = every (vec_id, label, __m, __sv, __cid[, __err])
    subvector-to-codeword assignment under the trained codebooks,
    ``cents`` = the trained (__m, __cid, __cvec) codebook itself
    (M·K rows — bounded driver metadata). Extracted from es12 as pure
    code motion so es13 searches the IDENTICAL codebooks es12
    certifies (both queries' hashes pin the same training)."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    M, K = PQ_M, PQ_K
    sub_w = PQ_D // M
    emb = load(spark, sf, "embeddings")
    base = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("__v"),
    )
    sliced = base.select(
        "vec_id",
        "label",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("__m"),
                        F.slice("__v", m * sub_w + 1, sub_w).alias("__sv"),
                    )
                    for m in range(M)
                ]
            )
        ).alias("__s"),
    ).select(
        "vec_id",
        "label",
        F.col("__s.__m").alias("__m"),
        F.col("__s.__sv").alias("__sv"),
    )

    schema = StructType(
        [
            StructField("__m", IntegerType()),
            StructField("__cid", LongType()),
            StructField("__cvec", ArrayType(DoubleType())),
        ]
    )
    # init = the K lowest-id vectors, per subspace (lloyd_centroids'
    # init rule applied per namespace; same id set for both m)
    state = {
        (int(r["__m"]), int(r["vec_id"])): list(r["__sv"])
        for r in sliced.join(
            F.broadcast(
                emb.select("vec_id").orderBy("vec_id").limit(K)
            ),
            "vec_id",
            "left_semi",
        ).collect()
    }

    def assign(codebooks, extra_err: bool):
        # r14: same certified argmax rule (argmax cosine, strict > over
        # cid-ascending candidates, NULL sims lose, ties keep the low
        # cid) as the r13 broadcast-array fold, executed as a mapInArrow
        # kernel — the similarity._assign_via_arrow strategy applied
        # per subspace. The codebooks are ALREADY driver-side (`state`,
        # the bounded M·K·d metadata this trainer round-trips every
        # refinement), so no collect is added; dot, norm², and the
        # reconstruction error all accumulate PER DIMENSION from 0.0,
        # reproducing the folds' ((0.0 + p0) + p1) + ... IEEE sequence
        # bit-for-bit (the raw error is emitted and rounded JVM-side,
        # so the 6-dp certified value is byte-identical). Subvectors
        # are rectangular finite slices by construction; irregular
        # rows would make every candidate sim NULL in the fold, so
        # they take the lowest cid with a NULL-poisoned error — the
        # kernel reproduces that exactly.
        import numpy as np

        per_m: dict[int, list] = {}
        for (m, cid), vec in sorted(codebooks.items()):
            per_m.setdefault(int(m), []).append(
                (int(cid), [float(x) for x in vec])
            )
        mats = {}
        for m, lst in per_m.items():
            cids_m = np.array([c for c, _ in lst], dtype=np.int64)
            cmat = np.array([v for _, v in lst], dtype=np.float64)
            if not np.isfinite(cmat).all():
                raise ValueError("PQ codebook contains non-finite values")
            cn = np.zeros(len(lst), dtype=np.float64)
            for i in range(cmat.shape[1]):
                x = cmat[:, i]
                cn += x * x
            mats[m] = (cids_m, cmat, np.sqrt(cn))

        out_type = (
            "vec_id long, label int, __m int, __sv array<double>, "
            "__cid long"
        ) + (", __err double" if extra_err else "")

        def _kernel(batches):
            import pyarrow as pa
            import pyarrow.compute as pc

            for batch in batches:
                n = batch.num_rows
                if n == 0:
                    continue
                ms = batch.column(2).to_numpy(zero_copy_only=False)
                sv = batch.column(3)
                lengths = pc.list_value_length(sv)
                flat = sv.flatten()
                vmat = None
                uniq_lens = set(lengths.to_pylist())
                if (
                    sv.null_count == 0
                    and flat.null_count == 0
                    and len(uniq_lens) == 1
                    and next(iter(uniq_lens)) > 0
                ):
                    vmat = (
                        flat.to_numpy(zero_copy_only=False)
                        .astype(np.float64, copy=False)
                        .reshape(n, -1)
                    )
                    if not np.isfinite(vmat).all():
                        raise ValueError(
                            "PQ subvector contains non-finite values"
                        )
                sv_rows = None if vmat is not None else sv.to_pylist()
                out_cid = np.zeros(n, dtype=np.int64)
                keep = np.zeros(n, dtype=bool)
                out_err = np.full(n, np.nan) if extra_err else None
                for m, (cids_m, cmat, cn) in mats.items():
                    rows = np.nonzero(ms == m)[0]
                    if len(rows) == 0:
                        continue
                    keep[rows] = True
                    k, d = cmat.shape
                    if vmat is not None and vmat.shape[1] == d:
                        vsub = vmat[rows]
                        vn = np.zeros(len(rows), dtype=np.float64)
                        for i in range(d):
                            x = vsub[:, i]
                            vn += x * x
                        vn = np.sqrt(vn)
                        dots = np.zeros((len(rows), k), dtype=np.float64)
                        for i in range(d):
                            dots += np.multiply.outer(
                                vsub[:, i], cmat[:, i]
                            )
                        den = np.multiply.outer(vn, cn)
                        valid = den != 0.0
                        with np.errstate(
                            divide="ignore", invalid="ignore", over="ignore"
                        ):
                            sims = np.where(
                                valid, dots / np.where(valid, den, 1.0), 0.0
                            )
                        if not np.isfinite(sims[valid]).all():
                            raise ValueError(
                                "PQ sims overflowed to non-finite"
                            )
                        best_j = np.zeros(len(rows), dtype=np.int64)
                        best_s = np.full(len(rows), -np.inf)
                        has = np.zeros(len(rows), dtype=bool)
                        for j in range(k):
                            s = sims[:, j]
                            v = valid[:, j]
                            take = v & (~has | (s > best_s))
                            best_j[take] = j
                            best_s[take] = s[take]
                            has |= v
                        out_cid[rows] = cids_m[best_j]
                        if extra_err:
                            errs = np.zeros(
                                (len(rows), k), dtype=np.float64
                            )
                            for i in range(d):
                                dlt = np.subtract.outer(
                                    vsub[:, i], cmat[:, i]
                                )
                                errs += dlt * dlt
                            out_err[rows] = errs[
                                np.arange(len(rows)), best_j
                            ]
                    else:
                        # irregular batch (NULL/ragged/empty slices):
                        # exact per-row replica of the fold — a row
                        # whose slice length != d (zip_with null
                        # padding) or with NULL elements has every
                        # candidate sim NULL, so the lowest cid wins
                        # with a NULL-poisoned error; a regular row
                        # scores normally.
                        import math

                        for r in rows:
                            v = sv_rows[r]
                            if (
                                v is None
                                or len(v) != d
                                or any(e is None for e in v)
                            ):
                                out_cid[r] = cids_m[0]
                                continue
                            vn = 0.0
                            for e in v:
                                e = float(e)
                                vn += e * e
                            vn = math.sqrt(vn)
                            bj, bs = None, None
                            for j in range(k):
                                dt = 0.0
                                for i in range(d):
                                    dt += float(v[i]) * cmat[j, i]
                                dn = vn * cn[j]
                                if dn == 0.0:
                                    continue
                                s = dt / dn
                                if bs is None:
                                    bj, bs = j, s
                                elif math.isnan(s):
                                    if not math.isnan(bs):
                                        bj, bs = j, s
                                elif (not math.isnan(bs)) and s > bs:
                                    bj, bs = j, s
                            bj = 0 if bj is None else bj
                            out_cid[r] = cids_m[bj]
                            if extra_err:
                                er = 0.0
                                for i in range(d):
                                    dlt = float(v[i]) - cmat[bj, i]
                                    er += dlt * dlt
                                out_err[r] = er
                arrays = [
                    batch.column(0),
                    batch.column(1),
                    batch.column(2),
                    sv,
                    pa.array(
                        [
                            int(c) if k_ else None
                            for c, k_ in zip(out_cid, keep)
                        ],
                        type=pa.int64(),
                    ),
                ]
                names = ["vec_id", "label", "__m", "__sv", "__cid"]
                if extra_err:
                    arrays.append(
                        pa.array(
                            [
                                float(e) if (k_ and not np.isnan(e)) else None
                                for e, k_ in zip(out_err, keep)
                            ],
                            type=pa.float64(),
                        )
                    )
                    names.append("__err")
                keep_idx = np.nonzero(keep)[0]
                rb = pa.record_batch(arrays, names=names)
                if len(keep_idx) != n:
                    rb = rb.take(pa.array(keep_idx))
                yield rb

        out = sliced.mapInArrow(_kernel, out_type)
        if extra_err:
            out = out.withColumn("__err", F.round("__err", 6))
        return out

    # one Lloyd refinement, both subspaces in one pass
    cents = spark.createDataFrame(
        [(m, cid, v) for (m, cid), v in sorted(state.items())], schema
    )
    # means stay the posexplode -> (m, cid, dim) keyed aggregate: an
    # r13 A/B of the per-dimension COLUMN aggregate (sub_w decimal sum
    # buffers in one hash aggregate) measured 1.6-3.7x SLOWER — Spark's
    # high-precision decimal aggregation buffers are variable-length,
    # so wide many-buffer rows pay per-update copying the one-buffer
    # exploded shape never does
    means = (
        assign(state, extra_err=False)
        .select("__m", "__cid", F.posexplode("__sv").alias("__dim", "__x"))
        .groupBy("__m", "__cid", "__dim")
        .agg(
            F.sum(F.col("__x").cast("decimal(25,12)")).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(
            "__m",
            "__cid",
            "__dim",
            F.round(F.col("__s").cast("double") / F.col("__n"), 6).alias(
                "__mean"
            ),
        )
        .groupBy("__m", "__cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__dim", "__mean"))),
                lambda s: s["__mean"],
            ).alias("__newvec")
        )
    )
    # O(M·k·d) driver metadata; empty clusters keep their position
    new = {
        (int(r["__m"]), int(r["__cid"])): list(r["__newvec"])
        for r in means.collect()
    }
    state = {key: new.get(key, vec) for key, vec in state.items()}
    cents = spark.createDataFrame(
        [(m, cid, v) for (m, cid), v in sorted(state.items())], schema
    )
    return assign(state, extra_err=extra_err), cents


def es12_pq_reconstruction_qc(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization codebook QC — the go/no-go check before
    committing a PQ index: split every embedding into M=2 contiguous
    32-dim subvectors, train a deterministic per-subspace codebook
    (k=16, one Lloyd refinement — the es06 trainer\'s exact arithmetic:
    lowest-id init, argmax-cosine assignment with centroid-id
    tie-break, DECIMAL(25,12) order-independent centroid sums rounded
    to 6 dp, empty clusters keep their position), assign each
    subvector to its codeword, and report per label: vector count,
    distinct (code0, code1) product codes in use (collapsed code space
    = a dead codebook), and the mean / max squared reconstruction
    error ‖x − concat(c0, c1)‖².

    FUSED training (r5 bench trim): both subspaces train in ONE
    namespaced Lloyd chain — subvectors carry a subspace tag ``__m``,
    the broadcast codebook joins on it, assignment windows on
    (vec_id, __m), and centroid means aggregate per (__m, cid, dim) —
    so each Lloyd stage is one corpus pass covering BOTH codebooks
    instead of two sequential per-subspace chains (subspaces never
    interact, so the per-(m, cid) arithmetic — and therefore every
    hash-certified value — is identical to training them separately;
    the DuckDB oracle still runs the two textbook per-subspace
    chains). The final per-vector code pivot is one conditional
    aggregate on vec_id — high-cardinality, never a single-partition
    window; driver round-trip stays O(M·k·d) bounded metadata.

    Scale shape: (1 init collect) + (1 fused assign + 1 fused means
    pass) + (1 fused assign-with-error pass) + ONE rollup. Per-vector
    errors round to 6 dp and aggregate as DECIMAL(18,6) sums
    (shuffle-order independent). Training lives in ``_pq_assigned``
    (shared with es13's ADC search — pure code motion, identical
    arithmetic; r13: window argmax → broadcast-array fold, see
    similarity.assign_to_centroids)."""
    M = PQ_M
    assigned, _ = _pq_assigned(spark, sf, extra_err=True)
    per = assigned.groupBy("vec_id").agg(
        F.max("label").alias("label"),
        *[
            F.max(F.when(F.col("__m") == m, F.col("__cid"))).alias(f"__c{m}")
            for m in range(M)
        ],
        *[
            F.max(F.when(F.col("__m") == m, F.col("__err"))).alias(f"__e{m}")
            for m in range(M)
        ],
    ).select(
        "label",
        F.concat_ws("_", "__c0", "__c1").alias("__code"),
        F.round(F.col("__e0") + F.col("__e1"), 6).alias("__err"),
    )
    n = F.col("n_vecs").cast("double")
    return (
        per.groupBy(F.col("label").cast("int").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.countDistinct("__code").cast("bigint").alias("n_codes"),
            F.sum(F.col("__err").cast("decimal(18,6)")).alias("__s"),
            F.max("__err").alias("__mx"),
        )
        .select(
            "label",
            "n_vecs",
            "n_codes",
            F.round(F.col("__s").cast("double") / n, 6).alias("mse"),
            F.round(F.col("__mx"), 6).alias("max_err"),
        )
        .orderBy("label")
    )


def _es12_oracle_sql() -> str:
    """DuckDB twin of es12: two namespaced Lloyd chains (one per
    subspace slice), codeword assignment with the same tie-break, and
    the identical decimal error rollup."""
    M, D, K = 2, 64, 16
    sub_w = D // M
    ctes: list[str] = []
    for m in range(M):
        lo, hi = m * sub_w + 1, (m + 1) * sub_w
        chain, ed, cfinal = _lloyd_chain(
            f"s{m}", f"embedding[{lo}:{hi}]", sub_w, K, 1
        )
        ctes.extend(chain)
        err = (
            "ROUND(list_sum(list_transform("
            f"range(1, {sub_w + 1}), "
            "i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i]))), 6)"
        )
        ctes.append(
            _lloyd_assign_cte(
                f"s{m}asg",
                ed,
                cfinal,
                select="vec_id, cid, err",
                extra_expr=f", {err} AS err",
            )
        )
    ctes.append(
        "per AS (SELECT e.label, "
        "CONCAT(CAST(a0.cid AS VARCHAR), '_', CAST(a1.cid AS VARCHAR)) "
        "AS code, ROUND(a0.err + a1.err, 6) AS err "
        "FROM embeddings e "
        "JOIN s0asg a0 ON a0.vec_id = e.vec_id "
        "JOIN s1asg a1 ON a1.vec_id = e.vec_id)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT CAST(label AS INT) AS label,\n"
        "       CAST(COUNT(*) AS BIGINT) AS n_vecs,\n"
        "       CAST(COUNT(DISTINCT code) AS BIGINT) AS n_codes,\n"
        "       ROUND(CAST(SUM(CAST(err AS DECIMAL(18,6))) AS DOUBLE)\n"
        "             / COUNT(*), 6) AS mse,\n"
        "       ROUND(MAX(err), 6) AS max_err\n"
        "FROM per GROUP BY label ORDER BY label"
    )


EXTENSION_ORACLE["es12_pq_reconstruction_qc"] = _es12_oracle_sql()
EXTENSION_QUERIES["es12_pq_reconstruction_qc"] = es12_pq_reconstruction_qc


PQ_ADC_TOPK = 10


def es13_pq_adc_search(spark: SparkSession, sf: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search — the SEARCH side of
    the es12 codebooks, completing the product-quantization story:
    es12 certifies training + reconstruction QC, es13 certifies the
    query path an ANN service actually serves. Every corpus vector is
    represented ONLY by its (code0, code1) codeword pair; the query
    (vec_id 0) stays uncompressed ("asymmetric"), so per-vector
    distance is a 2-term table lookup:
    ``adc = ‖q₀−c(code0)‖² + ‖q₁−c(code1)‖²``.

    100 TB design — the reason PQ exists: the scan side touches only
    M small integer codes per vector (the M·K×sub_w codebook and the
    M·K-entry lookup table broadcast as bounded metadata — the LUT is
    ~32 rows regardless of corpus size), so the search is one
    map-shaped broadcast join + TakeOrdered(k); no embedding array is
    read after encoding. Training is byte-identical to es12's
    (``_pq_assigned`` is shared), so both queries' certified hashes
    pin the same codebooks. LUT partials round to 6 dp (index-ordered
    fold, the es12 error convention); ties break on vec_id.

    Staged for the round-7 certification window (the r6 window's
    ten new-entry slots are spent); locally certified now by
    tests/test_staged_round7.py against the DuckDB twin."""
    assigned, cents = _pq_assigned(spark, sf, extra_err=False)
    M = PQ_M
    sub_w = PQ_D // M
    # query subvectors, sliced directly (same slicing as training)
    qsub = (
        load(spark, sf, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("__m"),
                            F.slice(
                                F.transform(
                                    "embedding", lambda x: x.cast("double")
                                ),
                                m * sub_w + 1,
                                sub_w,
                            ).alias("__qv"),
                        )
                        for m in range(M)
                    ]
                )
            ).alias("__s")
        )
        .select(F.col("__s.__m").alias("__m"), F.col("__s.__qv").alias("__qv"))
    )
    # ADC lookup table: squared L2 from each query subvector to each
    # codeword — M·K rows, bounded by construction
    lut = cents.join(F.broadcast(qsub), "__m").select(
        "__m",
        "__cid",
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("__qv"),
                    F.col("__cvec"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        ).alias("__part"),
    )
    # r14: pivot codes per vector FIRST, join the LUT after. The r13
    # shape localCheckpointed the (vec_id, m, code) frame so the LUT
    # join's inferred isnotnull(__cid) could not inline the whole
    # assignment fold for a second per-row evaluation; the aggregate is
    # the same barrier for free — join conditions reference the
    # aggregate's OUTPUT attributes (code0/code1), which Catalyst
    # cannot inline past the Aggregate, so the fold still evaluates
    # once per row and the checkpoint job + block write disappear
    # (the r13 quiet bench charged it +34% vs the r12 window shape).
    # Per-vector both subspace rows always exist (static 2-element
    # explode) and every (m, cid) has a LUT row, so the inner joins
    # keep exactly the same row set; part0 + part1 is the same 2-term
    # sum the old SUM computed (2-double addition is order-exact).
    codes = assigned.filter(F.col("vec_id") != 0).select(
        "vec_id", "__m", "__cid"
    )
    pivot = codes.groupBy("vec_id").agg(
        F.max(F.when(F.col("__m") == 0, F.col("__cid"))).alias("__k0"),
        F.max(F.when(F.col("__m") == 1, F.col("__cid"))).alias("__k1"),
    )
    lut0 = lut.filter(F.col("__m") == 0).select(
        F.col("__cid").alias("__k0"), F.col("__part").alias("__p0")
    )
    lut1 = lut.filter(F.col("__m") == 1).select(
        F.col("__cid").alias("__k1"), F.col("__part").alias("__p1")
    )
    return (
        pivot.join(F.broadcast(lut0), "__k0")
        .join(F.broadcast(lut1), "__k1")
        .select(
            "vec_id",
            F.col("__k0").cast("int").alias("code0"),
            F.col("__k1").cast("int").alias("code1"),
            F.round(F.col("__p0") + F.col("__p1"), 6).alias("adc_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(PQ_ADC_TOPK)
    )


def _es13_oracle_sql() -> str:
    """DuckDB twin of es13: the same two namespaced Lloyd chains as
    es12's oracle, a per-subspace ADC lookup table from the raw query
    row, and the 2-term lookup sum ranked ascending."""
    M, K = PQ_M, PQ_K
    sub_w = PQ_D // M
    ctes: list[str] = []
    for m in range(M):
        lo, hi = m * sub_w + 1, (m + 1) * sub_w
        chain, ed, cfinal = _lloyd_chain(
            f"s{m}", f"embedding[{lo}:{hi}]", sub_w, K, 1
        )
        ctes.extend(chain)
        ctes.append(
            _lloyd_assign_cte(f"s{m}asg", ed, cfinal, select="vec_id, cid")
        )
        ctes.append(
            f"s{m}lut AS (SELECT c.cid, ROUND(list_sum(list_transform("
            f"range(1, {sub_w + 1}), "
            f"i -> (q.v[i] - c.cvec[i]) * (q.v[i] - c.cvec[i]))), 6) AS part "
            f"FROM {cfinal} c CROSS JOIN "
            f"(SELECT v FROM {ed} WHERE vec_id = 0) q)"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT e.vec_id, CAST(a0.cid AS INT) AS code0,\n"
        "       CAST(a1.cid AS INT) AS code1,\n"
        "       ROUND(l0.part + l1.part, 6) AS adc_dist\n"
        "FROM embeddings e\n"
        "JOIN s0asg a0 ON a0.vec_id = e.vec_id\n"
        "JOIN s1asg a1 ON a1.vec_id = e.vec_id\n"
        "JOIN s0lut l0 ON l0.cid = a0.cid\n"
        "JOIN s1lut l1 ON l1.cid = a1.cid\n"
        f"WHERE e.vec_id <> 0\n"
        f"ORDER BY adc_dist, e.vec_id LIMIT {PQ_ADC_TOPK}"
    )


# Round-7 staged surface: implemented + locally certified NOW
# (tests/test_staged_round7.py runs the pair through the same compare
# harness as the driver gate), registered into queries()/oracle_sql()
# next round when certification slots free up. NOT merged into
# EXTENSION_* yet — the never-certified-in-window invariant
# (tests/test_entry.py) requires every queries() entry without a
# driver row to sit inside the 50-slot window, and round 6's ten
# new-entry slots are spent.
ROUND7_STAGED_QUERIES = {"es13_pq_adc_search": es13_pq_adc_search}
ROUND7_STAGED_ORACLE = {"es13_pq_adc_search": _es13_oracle_sql()}


# --- round-6 additions -----------------------------------------------------

# Bloom pre-filter geometry (bf01): m bits in m/64 64-bit words, k
# seeded xxhash64 probes. m/n ≈ 10 bits per corpus item at sf0.1 →
# ~8% false-positive rate with k=3; the word table is m/64 rows BY
# CONSTRUCTION (16k rows ≈ 256 KB at m=2^20) regardless of corpus
# size, which is what makes its broadcast hint legitimate.
BLOOM_M_BITS = 1 << 20
BLOOM_K = 3


def bf01_bloom_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter pre-filtered corpus-membership check — the standard
    100 TB incremental-dedup admission shape: build a Bloom filter over
    the accumulated corpus fingerprints, probe every batch row, and
    run the EXACT membership join only on rows the filter could not
    rule out. Bloom filters have no false negatives, so the pruned
    exact join decides the final answer and the certified result is
    engine-neutral — the DuckDB oracle runs the plain exact join; the
    Bloom stage only prunes.

    Spark 4 keeps ``bloom_filter_agg``/``might_contain`` internal (the
    optimizer injects them for runtime join pruning; they are not in
    the public function registry), so the filter is built as the
    DISTRIBUTED bit matrix those internals also materialize: k seeded
    ``xxhash64`` positions per corpus fingerprint → (word index, bit)
    contributions → ONE ``bit_or`` aggregate into an m/64-row word
    table, bounded by construction (never by data). The probe side is
    k broadcast equi-joins on word index + a bitwise-AND test — the
    batch never shuffles — and only surviving rows reach the exact
    semi join (no hint there: the corpus side is SF-proportional, AQE
    decides). At 100 TB the probe eliminates the overwhelmingly-new
    majority of a crawl batch before anything shuffles
    (tests/test_plans.py pins the probe-before-join plan). Batch =
    source 'src19' (inc01's framing), corpus = every other source."""
    m, k = BLOOM_M_BITS, BLOOM_K
    d = load(spark, sf, "documents").select(
        "doc_id", "lang", "source", tx.fingerprint("text").alias("__fp")
    )
    corpus = d.filter(F.col("source") != "src19").select("__fp").distinct()
    batch = d.filter(F.col("source") == "src19").select(
        "doc_id", "lang", "__fp"
    )

    def widx(i: int) -> str:
        return f"pmod(xxhash64(__fp, {i}), {m}) div 64"

    def bit(i: int) -> str:
        return f"CAST(pmod(pmod(xxhash64(__fp, {i}), {m}), 64) AS INT)"

    contribs = None
    for i in range(k):
        c = corpus.select(
            F.expr(widx(i)).alias("__widx"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {bit(i)})").alias("__b"),
        )
        contribs = c if contribs is None else contribs.unionAll(c)
    words = contribs.groupBy("__widx").agg(
        F.expr("bit_or(__b)").alias("__word")
    )
    flagged = batch
    for i in range(k):
        flagged = flagged.withColumn(f"__w{i}", F.expr(widx(i))).join(
            F.broadcast(
                words.select(
                    F.col("__widx").alias(f"__w{i}"),
                    F.col("__word").alias(f"__word{i}"),
                )
            ),
            f"__w{i}",
            "left",
        )
    maybe = F.lit(True)
    for i in range(k):
        maybe = maybe & F.expr(
            f"(coalesce(__word{i}, CAST(0 AS BIGINT)) "
            f"& shiftleft(CAST(1 AS BIGINT), {bit(i)})) != 0"
        )
    cand = flagged.filter(maybe).select("doc_id", "lang", "__fp")
    hits = cand.join(corpus, "__fp", "left_semi")
    per = batch.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batch_docs")
    )
    hp = hits.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("__dups")
    )
    return (
        per.join(hp, "lang", "left")
        .select(
            "lang",
            "n_batch_docs",
            F.coalesce("__dups", F.lit(0)).cast("bigint").alias(
                "n_corpus_dups"
            ),
            (F.col("n_batch_docs") - F.coalesce("__dups", F.lit(0)))
            .cast("bigint")
            .alias("n_new"),
        )
        .orderBy("lang")
    )


EXTENSION_QUERIES["bf01_bloom_prefilter"] = bf01_bloom_prefilter

# The oracle is the EXACT membership join with no Bloom stage — the
# Bloom filter only prunes, so the certified answer is engine-neutral.
EXTENSION_ORACLE["bf01_bloom_prefilter"] = """
WITH d AS (
  SELECT doc_id, lang, source,
         md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
  FROM documents
),
corpus AS (SELECT DISTINCT fp FROM d WHERE source <> 'src19'),
batch AS (SELECT doc_id, lang, fp FROM d WHERE source = 'src19')
SELECT b.lang, CAST(COUNT(*) AS BIGINT) AS n_batch_docs,
       CAST(SUM(CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corpus_dups,
       CAST(SUM(CASE WHEN c.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new
FROM batch b LEFT JOIN corpus c ON b.fp = c.fp
GROUP BY b.lang ORDER BY b.lang
"""


def _adjacent_symbol_pairs(symdf: DataFrame, it: int) -> DataFrame:
    """Adjacent-pair statistics over per-word symbol arrays
    (token-weighted like tx11): pair label is left||'|'||right so a
    merged multi-char symbol stays unambiguous."""
    pairs = symdf.select(
        "__w",
        "__wn",
        F.explode(
            F.expr(
                "CASE WHEN size(__sym) >= 2 THEN "
                "transform(sequence(1, size(__sym) - 1), "
                "i -> concat(element_at(__sym, i), '|', "
                "element_at(__sym, i + 1))) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("__wn").cast("bigint").alias("n_occurrences"),
            F.countDistinct("__w").cast("bigint").alias("n_distinct_words"),
        )
        .withColumn("merge_iter", F.lit(it))
    )


def tx12_bpe_iterated_merges(spark: SparkSession, sf: str) -> DataFrame:
    """ITERATED BPE merge mining — tx11 certifies the pair statistic;
    this certifies the MERGE-APPLY step tokenizer training actually
    loops on: mine iteration-1 pairs over character symbols, apply the
    top merge (greedy left-to-right non-overlapping — the BPE rule)
    to every word, and re-mine iteration-2 pairs over the new symbol
    sequences. Top-10 pairs per iteration.

    The merge-apply is a sequential per-word fold (``aggregate`` over
    the char array: merge when the last emitted symbol + next char
    equals the chosen pair — a merged symbol can never re-merge, which
    IS the left-to-right non-overlap rule); the DuckDB twin replays
    the same scan as a recursive CTE over word TYPES, so both engines
    produce identical symbol sequences by construction. Scale shape:
    the fold runs over the distinct VOCABULARY (word types ×
    occurrence weights), not the corpus stream; pair cardinality stays
    alphabet²-bounded (+ merged-symbol contexts), so each iteration is
    one bounded aggregate and the 1-row top-pair broadcast — at 100 TB
    a full tokenizer train repeats exactly this plan per merge."""
    from pyspark.sql import Window

    vocab = (
        _docs_words(spark, sf)
        .select(F.explode("__words").alias("__w"))
        .filter(F.length("__w") >= 2)
        .groupBy("__w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__wn"))
    )
    sym0 = vocab.select(
        "__w", "__wn", F.expr("regexp_extract_all(__w, '.', 0)").alias("__sym")
    )
    it1 = _adjacent_symbol_pairs(sym0, 1)
    top1 = (
        it1.orderBy(F.desc("n_occurrences"), "pair")
        .limit(1)
        .select(F.col("pair").alias("__top"))
    )
    fold = (
        "aggregate(__sym, CAST(array() AS ARRAY<STRING>), "
        "(acc, ch) -> CASE WHEN size(acc) > 0 "
        "AND concat(element_at(acc, -1), '|', ch) = __top "
        "THEN concat(slice(acc, 1, size(acc) - 1), "
        "array(concat(element_at(acc, -1), ch))) "
        "ELSE concat(acc, array(ch)) END)"
    )
    sym1 = sym0.crossJoin(F.broadcast(top1)).select(
        "__w", "__wn", F.expr(fold).alias("__sym")
    )
    it2 = _adjacent_symbol_pairs(sym1, 2)
    w = Window.partitionBy("merge_iter").orderBy(
        F.desc("n_occurrences"), "pair"
    )
    return (
        it1.unionByName(it2)
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 10)
        .select(
            F.col("merge_iter").cast("int").alias("merge_iter"),
            "pair",
            "n_occurrences",
            "n_distinct_words",
            "rk",
        )
        .orderBy("merge_iter", "rk")
    )


EXTENSION_QUERIES["tx12_bpe_iterated_merges"] = tx12_bpe_iterated_merges

# The oracle replays the SAME greedy left-to-right scan as a recursive
# CTE over word types: at each position, consume 2 chars when they
# equal the merged pair, else 1 — the textbook BPE merge definition.
EXTENSION_ORACLE["tx12_bpe_iterated_merges"] = """
WITH RECURSIVE w AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS wn
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        FROM documents)
  WHERE length(word) >= 2 GROUP BY word
), p1 AS (
  SELECT substr(word, CAST(i AS INT), 1) || '|' ||
         substr(word, CAST(i AS INT) + 1, 1) AS pair, word, wn
  FROM (SELECT word, wn, unnest(range(1, length(word))) AS i FROM w)
), it1 AS (
  SELECT 1 AS merge_iter, pair,
         CAST(SUM(wn) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words
  FROM p1 GROUP BY pair
), top1 AS (
  SELECT replace(pair, '|', '') AS ms FROM it1
  ORDER BY n_occurrences DESC, pair LIMIT 1
), scan AS (
  SELECT word, wn, 1 AS pos, CAST('' AS VARCHAR) AS acc,
         (SELECT ms FROM top1) AS ms
  FROM w
  UNION ALL
  SELECT word, wn,
         CASE WHEN pos + 1 <= length(word) AND substr(word, pos, 2) = ms
              THEN pos + 2 ELSE pos + 1 END,
         acc || CASE WHEN acc = '' THEN '' ELSE '|' END ||
           CASE WHEN pos + 1 <= length(word) AND substr(word, pos, 2) = ms
                THEN ms ELSE substr(word, pos, 1) END,
         ms
  FROM scan WHERE pos <= length(word)
), done AS (
  SELECT word, wn, string_split(acc, '|') AS sym
  FROM scan WHERE pos > length(word)
), p2 AS (
  SELECT sym[CAST(i AS INT)] || '|' || sym[CAST(i AS INT) + 1] AS pair,
         word, wn
  FROM (SELECT word, wn, sym, unnest(range(1, len(sym))) AS i FROM done)
), it2 AS (
  SELECT 2 AS merge_iter, pair,
         CAST(SUM(wn) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words
  FROM p2 GROUP BY pair
), u AS (
  SELECT * FROM it1 UNION ALL SELECT * FROM it2
), r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY merge_iter ORDER BY n_occurrences DESC, pair) AS rk
  FROM u
)
SELECT CAST(merge_iter AS INT) AS merge_iter, pair, n_occurrences,
       n_distinct_words, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 10 ORDER BY merge_iter, rk
"""


def qf02_gopher_quality_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style INDEPENDENT quality rules (the Rae et al. 2021
    repetition/format rule family, thresholds tuned to this corpus) —
    qf01 attributes each doc to its FIRST failing rule; production
    rule audits also need the marginal per-rule failure counts this
    reports (a doc can fail several rules; the columns overlap and
    only ``n_pass_all`` is the conjunction). One conditional-aggregate
    scan: every feature is a shared JVM text expression evaluated once
    per row (the dq01 discipline — never a scan per rule)."""
    docs = load(spark, sf, "documents")
    base = docs.select("source", "text", tx.words("text").alias("__w"))
    feats = base.select(
        "source",
        F.size("__w").alias("__nw"),
        tx.mean_word_length_from(F.col("__w")).alias("__mwl"),
        tx.marker_count("text", tx.STOPWORDS).alias("__sw"),
        tx.punct_ratio("text").alias("__pr"),
    )
    f_wc = (F.col("__nw") < 5) | (F.col("__nw") > 1000)
    f_mwl = (F.col("__mwl") < 2.0) | (F.col("__mwl") > 10.0)
    f_sw = F.col("__sw") < 1
    f_pr = F.col("__pr") > 0.2
    flag = lambda c, name: F.sum(c.cast("long")).cast("bigint").alias(name)  # noqa: E731
    return (
        feats.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            flag(f_wc, "n_fail_wordcount"),
            flag(f_mwl, "n_fail_wordlen"),
            flag(f_sw, "n_fail_stopword"),
            flag(f_pr, "n_fail_punct"),
            flag(~(f_wc | f_mwl | f_sw | f_pr), "n_pass_all"),
        )
        .orderBy("source")
    )


EXTENSION_QUERIES["qf02_gopher_quality_rules"] = qf02_gopher_quality_rules

EXTENSION_ORACLE["qf02_gopher_quality_rules"] = f"""
WITH base AS (
  SELECT source, text, {_WORDS} AS w FROM documents
), feats AS (
  SELECT source,
         len(w) AS nw,
         {_MWL.format(w='w')} AS mwl,
         len(regexp_extract_all(lower(text),
             '\\b(the|a|an|and|of|to|in|is|it|for)\\b')) AS sw,
         {_PR} AS pr
  FROM base
), flags AS (
  SELECT source,
         CASE WHEN nw < 5 OR nw > 1000 THEN 1 ELSE 0 END AS f_wc,
         CASE WHEN mwl < 2.0 OR mwl > 10.0 THEN 1 ELSE 0 END AS f_mwl,
         CASE WHEN sw < 1 THEN 1 ELSE 0 END AS f_sw,
         CASE WHEN pr > 0.2 THEN 1 ELSE 0 END AS f_pr
  FROM feats
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(f_wc) AS BIGINT) AS n_fail_wordcount,
       CAST(SUM(f_mwl) AS BIGINT) AS n_fail_wordlen,
       CAST(SUM(f_sw) AS BIGINT) AS n_fail_stopword,
       CAST(SUM(f_pr) AS BIGINT) AS n_fail_punct,
       CAST(SUM(CASE WHEN f_wc = 0 AND f_mwl = 0 AND f_sw = 0 AND f_pr = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
FROM flags GROUP BY source ORDER BY source
"""


def tx13_bigram_surprisal(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram-LM quality scoring — tx09's unigram surprisal upgraded
    to the conditional model real perplexity filters use: per language,
    p(w_i | w_{i-1}) = c(w_{i-1}, w_i) / c(w_{i-1}·) over the corpus;
    each doc scores mean −log2 p over its bigrams, rolled up per
    (lang, surprisal bucket). Same determinism discipline as tx09:
    probabilities are ratios of exact counts, log2 applied once per
    (lang, prev, cur) key, per-doc means rounded to 6 dp before
    bucketing. Scale: bigrams come straight from the word array
    (transform over sequence — no self-join, no window over raw
    tokens); the context total rides a window over the aggregated
    bigram table (vocab², not corpus, sized); the scoring join is one
    shuffle of bigram keys that AQE broadcasts when the model table is
    small. Docs with <2 words have no bigrams and drop out — the same
    rule on both engines."""
    from pyspark.sql import Window

    docs = _docs_words(spark, sf)
    bi = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(__words) >= 2 THEN "
                "transform(sequence(1, size(__words) - 1), "
                "i -> struct(element_at(__words, i) AS p, "
                "element_at(__words, i + 1) AS c)) "
                "ELSE CAST(array() AS "
                "ARRAY<STRUCT<p: STRING, c: STRING>>) END"
            )
        ).alias("__b"),
    ).select("doc_id", "lang", F.col("__b.p").alias("__p"), F.col("__b.c").alias("__c"))
    model = (
        bi.groupBy("lang", "__p", "__c")
        .agg(F.count(F.lit(1)).alias("__n2"))
        .withColumn(
            "__n1", F.sum("__n2").over(Window.partitionBy("lang", "__p"))
        )
        .withColumn("__nll", -F.log2(F.col("__n2") / F.col("__n1")))
    )
    per_doc = (
        bi.join(model.select("lang", "__p", "__c", "__nll"), ["lang", "__p", "__c"])
        .groupBy("doc_id", "lang")
        .agg(F.avg("__nll").alias("__s"))
    )
    bucket = F.least(
        F.floor(F.round(F.col("__s"), 6) / 2).cast("int"), F.lit(7)
    )
    return (
        per_doc.withColumn("__bk", bucket)
        .groupBy("lang", "__bk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("__s"), 4).alias("avg_surprisal"),
        )
        .select(
            "lang",
            F.col("__bk").alias("surprisal_bucket"),
            "n_docs",
            "avg_surprisal",
        )
        .orderBy("lang", "surprisal_bucket")
    )


EXTENSION_QUERIES["tx13_bigram_surprisal"] = tx13_bigram_surprisal

EXTENSION_ORACLE["tx13_bigram_surprisal"] = f"""
WITH d AS (
  SELECT doc_id, lang, {_WORDS} AS w FROM documents
), bi AS (
  SELECT doc_id, lang,
         w[CAST(i AS INT)] AS p, w[CAST(i AS INT) + 1] AS c
  FROM (SELECT doc_id, lang, w, unnest(range(1, len(w))) AS i FROM d)
), c2 AS (
  SELECT lang, p, c, COUNT(*) AS n2 FROM bi GROUP BY lang, p, c
), v AS (
  SELECT lang, p, c,
         -log2(CAST(n2 AS DOUBLE)
               / SUM(n2) OVER (PARTITION BY lang, p)) AS nll
  FROM c2
), pd AS (
  SELECT doc_id, b.lang AS lang, AVG(nll) AS s
  FROM bi b JOIN v ON b.lang = v.lang AND b.p = v.p AND b.c = v.c
  GROUP BY doc_id, b.lang
)
SELECT lang,
       CAST(LEAST(FLOOR(ROUND(s, 6) / 2), 7) AS INT) AS surprisal_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(s), 4) AS avg_surprisal
FROM pd GROUP BY lang, CAST(LEAST(FLOOR(ROUND(s, 6) / 2), 7) AS INT)
ORDER BY lang, surprisal_bucket
"""


def dd12_url_canonical_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """URL canonicalization dedup — the crawl-frontier dedup step that
    runs BEFORE any content is fetched: normalize scheme / case /
    ``www.`` prefix / trailing slash / tracking query params away and
    count how many raw URLs collapse onto each canonical form. The
    corpus has no URL column (uf01's framing), so a deterministic
    noisy URL is derived per doc — scheme, www-prefix, host case,
    trailing slash, and utm query string all vary by doc_id arithmetic
    — and the operator under test is the CANONICALIZER: Spark's
    ``parse_url`` (HOST/PATH split drops the query) + two
    regexp_replaces, one codegen'd map over the scan, no shuffle until
    the per-source rollup. At 100 TB the URL column comes off crawl
    metadata and nothing else changes."""
    docs = load(spark, sf, "documents").select("doc_id", "source")
    scheme = F.when(F.col("doc_id") % 2 == 0, F.lit("http")).otherwise(
        F.lit("https")
    )
    www = F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit(""))
    host = F.when(
        F.col("doc_id") % 7 == 0, F.upper(F.col("source"))
    ).otherwise(F.col("source"))
    trail = F.when(F.col("doc_id") % 2 == 1, F.lit("/")).otherwise(F.lit(""))
    query = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(F.lit("?utm_source=feed&ref="), F.col("doc_id").cast("string")),
    ).otherwise(F.lit(""))
    with_url = docs.withColumn(
        "__url",
        F.concat(
            scheme, F.lit("://"), www, host, F.lit(".com/item/"),
            (F.col("doc_id") % 10).cast("string"), trail, query,
        ),
    )
    canon = F.concat(
        F.regexp_replace(
            F.lower(F.parse_url(F.col("__url"), F.lit("HOST"))),
            r"^www\.", "",
        ),
        F.regexp_replace(
            F.parse_url(F.col("__url"), F.lit("PATH")), r"/$", ""
        ),
    )
    return (
        with_url.withColumn("__canon", canon)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("__canon").cast("bigint").alias("n_canonical"),
            (F.count(F.lit(1)) - F.countDistinct("__canon"))
            .cast("bigint")
            .alias("n_url_dups"),
        )
        .orderBy("source")
    )


EXTENSION_QUERIES["dd12_url_canonical_dedup"] = dd12_url_canonical_dedup

EXTENSION_ORACLE["dd12_url_canonical_dedup"] = """
WITH u AS (
  SELECT doc_id, source,
         (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
         || '://'
         || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0 THEN upper(source) ELSE source END)
         || '.com/item/' || CAST(doc_id % 10 AS VARCHAR)
         || (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END)
         || (CASE WHEN doc_id % 4 = 0
             THEN '?utm_source=feed&ref=' || CAST(doc_id AS VARCHAR)
             ELSE '' END) AS url
  FROM documents
), c AS (
  SELECT source,
         regexp_replace(lower(regexp_extract(url, '^https?://([^/]+)', 1)),
                        '^www\\.', '')
         || regexp_replace(regexp_extract(url, '^https?://[^/]+([^?]*)', 1),
                           '/$', '') AS canon
  FROM u
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_canonical,
       CAST(COUNT(*) - COUNT(DISTINCT canon) AS BIGINT) AS n_url_dups
FROM c GROUP BY source ORDER BY source
"""


# --- round-7 staged surface, wave 2 -----------------------------------------
# (dd13 SemDeDup, ir01 DSIR importance weights, q49 TPC-H Q7 shape)

# SemDeDup knobs (dd13): cluster count and the within-cluster cosine
# threshold (on the 4-dp-rounded cosine, the es01 convention). 8
# clusters keep the sf-scale in-cluster pair volume tiny while still
# exercising the real two-stage shape; a production corpus raises
# SEMDEDUP_K with corpus size so the per-cluster member count — and
# with it the quadratic in-cluster pair work — stays bounded.
SEMDEDUP_K = int(_os.environ.get("SPARK_GRAFT_SEMDEDUP_K", "8"))

#: The embeddings table's fixed vector width (generator contract; PQ_D
#: slices the same 64 dims).
EMB_DIM = 64


def _dd13_cluster_pair_dots(pdf):
    """Vectorized in-cluster pair scoring for dd13 (guide §4.2): one
    pandas group per cluster in, the (idb, raw dot, raw norm-product)
    of every ida < idb pair out. BIT-IDENTICAL float discipline — the
    certified fold computes dot = ((0.0 + p_0) + p_1) + ... and
    norm² = ((0.0 + a_0²) + a_1²) + ...; this kernel accumulates the
    Gram matrix per DIMENSION (G += outer(V[:,i], V[:,i]) from a 0.0
    start), so G[a,b] adds the exact same products in the exact same
    order, norms are sqrt(G[i,i]) (the identical sequence), and the
    denominator is the same na*nb IEEE multiply. The NULLIF division,
    rounding, and threshold happen JVM-side on these raw doubles.
    NaN inputs would not survive the Arrow return path bit-for-bit
    (pandas->Arrow maps NaN to null), so they fail loudly instead —
    the embedding generator contract is finite floats."""
    import numpy as np
    import pandas as pd

    if len(pdf) < 2:
        return pd.DataFrame(
            {
                "__cid": pd.Series(dtype="int64"),
                "__idb": pd.Series(dtype="int64"),
                "__dot": pd.Series(dtype="float64"),
                "__den": pd.Series(dtype="float64"),
            }
        )
    pdf = pdf.sort_values("vec_id", ignore_index=True)
    v = np.stack(pdf["__v"].to_numpy()).astype(np.float64, copy=False)
    if np.isnan(v).any():
        raise ValueError(
            "dd13 pair kernel: NaN embedding component — the Arrow "
            "return path cannot preserve NaN vs NULL bit semantics"
        )
    n, d = v.shape
    g = np.zeros((n, n), dtype=np.float64)
    for i in range(d):
        col = v[:, i]
        # dim-i product added to every pair's partial sum: the same
        # left-to-right per-dimension order as the certified fold
        g += np.multiply.outer(col, col)
    norms = np.sqrt(np.diagonal(g))
    den = np.multiply.outer(norms, norms)
    ia, ib = np.triu_indices(n, k=1)
    ids = pdf["vec_id"].to_numpy()
    return pd.DataFrame(
        {
            "__cid": np.repeat(np.int64(pdf["__cid"].iloc[0]), len(ia)),
            "__idb": ids[ib],
            "__dot": g[ia, ib],
            "__den": den[ia, ib],
        }
    )
SEMDEDUP_THRESHOLD = float(_os.environ.get("SPARK_GRAFT_SEMDEDUP_T", "0.30"))


def dd13_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic dedup, SemDeDup-shaped (Abbas et al. 2023,
    arXiv:2303.09540): k-means the embedding space, then search for
    near-duplicate pairs ONLY within each cluster — the clustering is
    what turns an O(n²) all-pairs cosine scan into k independent
    O((n/k)²) cells, and at 100 TB k grows with the corpus so the
    per-cell pair volume stays bounded (the paper runs k=50k over
    LAION). Keep rule: within every above-threshold pair the lower
    vec_id survives, so ``n_removed`` counts the distinct higher ids —
    deterministic and engine-neutral (the paper keeps the item farthest
    from the centroid; the tie-broken id rule certifies the same
    two-stage plan without coupling the report to float centroid
    distances).

    Training reuses the deterministic fixed-iteration Lloyd kernel
    (similarity.lloyd_centroids — lowest-id init, decimal-exact means,
    6-dp rounding) so the full pipeline carries a hash-checked DuckDB
    twin. Plan: 3 corpus passes for training (broadcast k·d state), one
    map-side assignment, then ONE keyed self-join on cluster id whose
    fan-out is bounded by the cluster sizes k-means itself equalizes;
    cosine is rounded to 4 dp BEFORE thresholding on both engines.
    """
    emb = load(spark, sf, "embeddings")
    ed = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "__v"
        ),
    )
    cents = sim.lloyd_centroids(
        emb, n_centroids=SEMDEDUP_K, n_iter=2
    )
    # two consumers (the pair-scoring kernel + the member rollup): the
    # zero-shuffle assignment fold has no Exchange to reuse, so
    # materialize the pass once (EAGER checkpoint, per the r13 batch-3
    # lazy-vs-eager A/B)
    assigned = sim.assign_to_centroids(
        ed, cents, "vec_id", "__v"
    ).localCheckpoint()
    # r14: the in-cluster pair scoring is the wall (~250k pairs × one
    # 64-dim dot each; the r12 self-join ran every dot through the
    # interpreted higher-order fold, ~2.6 s of dd13's 6.5 s — and the
    # unrolled 64-term codegen expression measured 2.4x SLOWER than
    # the fold in a kernel A/B, so JVM expressions are out of road).
    # Guide §4.2: hand whole clusters to a vectorized numpy kernel
    # (_dd13_cluster_pair_dots) that accumulates the Gram matrix
    # PER DIMENSION — G starts at 0.0 and adds the dim-i product
    # outer-product-wise, so every pair's dot is the identical
    # ((0.0 + p0) + p1) + ... left-to-right double sequence the
    # certified fold computes, and norm = sqrt(G[i,i]) is the same
    # sequence the norm fold computes (verified bit-equal in
    # tests/test_round14_opts.py). The kernel emits RAW dot/denom
    # doubles; the NULLIF division, 4-dp rounding, and threshold stay
    # in the JVM, so null semantics and round ties are byte-identical.
    # Scale: ships each cluster's vectors once (n rows, not n²/k pair
    # rows) into Arrow and returns only the scored pairs; cluster
    # sizes are the quantity k-means itself equalizes, the same bound
    # the self-join fan-out relied on.
    dups = (
        assigned.select("__cid", "vec_id", "__v")
        .groupBy("__cid")
        .applyInPandas(
            _dd13_cluster_pair_dots,
            "__cid long, __idb long, __dot double, __den double",
        )
        .select(
            "__cid",
            "__idb",
            F.round(
                F.col("__dot") / F.nullif(F.col("__den"), F.lit(0.0)), 4
            ).alias("__c"),
        )
        .filter(F.col("__c") >= F.lit(SEMDEDUP_THRESHOLD))
    )
    dup_stats = dups.groupBy("__cid").agg(
        F.count(F.lit(1)).alias("n_dup_pairs"),
        F.countDistinct("__idb").alias("n_removed"),
    )
    members = assigned.groupBy("__cid").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        members.join(dup_stats, "__cid", "left")
        .select(
            F.col("__cid").alias("cluster_id"),
            "n_members",
            F.coalesce(F.col("n_dup_pairs"), F.lit(0)).cast("bigint").alias(
                "n_dup_pairs"
            ),
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("bigint").alias(
                "n_removed"
            ),
        )
        .orderBy("cluster_id")
    )


def _dd13_oracle_sql() -> str:
    """DuckDB twin of dd13: the shared Lloyd CTE chain (the es06/es12
    kernel twin), the shared assignment rule, then the same in-cluster
    pair join with the 4-dp cosine threshold and keep-lowest-id rule."""
    ctes, ed, cfinal = _lloyd_chain("sd", "embedding", 64, SEMDEDUP_K, 2)
    ctes.append(
        _lloyd_assign_cte("sdasg", ed, cfinal, select="vec_id, v, cid")
    )
    cos = _COS.format(a="a.v", b="b.v")
    return (
        "WITH " + ",\n".join(ctes) + f""",
sddup AS (
  SELECT a.cid, b.vec_id AS idb, {cos} AS c
  FROM sdasg a JOIN sdasg b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {cos} >= {SEMDEDUP_THRESHOLD}
), sdstats AS (
  SELECT cid, COUNT(*) AS n_dup_pairs, COUNT(DISTINCT idb) AS n_removed
  FROM sddup GROUP BY cid
), sdmembers AS (
  SELECT cid, COUNT(*) AS n_members FROM sdasg GROUP BY cid
)
SELECT m.cid AS cluster_id, CAST(m.n_members AS BIGINT) AS n_members,
       CAST(COALESCE(s.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
       CAST(COALESCE(s.n_removed, 0) AS BIGINT) AS n_removed
FROM sdmembers m LEFT JOIN sdstats s ON m.cid = s.cid
ORDER BY cluster_id"""
    )


# DSIR knobs (ir01): hashed-n-gram feature buckets. 4096 buckets is
# the bounded-model size — the target/raw bucket distributions and the
# per-bucket log-ratio table are <= DSIR_BUCKETS rows BY CONSTRUCTION
# regardless of corpus size, which is what makes their broadcast
# legitimate (the paper uses 10k buckets over unigram+bigram features).
DSIR_BUCKETS = int(_os.environ.get("SPARK_GRAFT_DSIR_BUCKETS", "4096"))


def ir01_dsir_importance(spark: SparkSession, sf: str) -> DataFrame:
    """Data selection via importance resampling, DSIR-shaped (Xie et
    al. 2023, arXiv:2302.03169): score every raw-corpus document by how
    target-like its hashed n-gram features are, ``log p_target(doc) -
    log p_raw(doc)`` under bag-of-hashed-grams models. Features are
    word unigrams + bigrams hashed into ``DSIR_BUCKETS`` buckets (the
    60-bit md5 construction every dedup oracle shares); the target
    distribution is fit on the ``lang = 'en'`` slice, the raw
    distribution on everything else, both with add-one smoothing; each
    raw doc scores the MEAN per-gram log-ratio (so weight is
    length-invariant) and the top 20 selections are certified.

    Determinism: the log-ratio is computed ONCE per bucket and rounded
    to 8 dp, and the per-doc mean sums those values as DECIMAL(25,12)
    (order-independent under shuffle) before a 6-dp rounded divide —
    the tx09/tx13 discipline. Scale: both bucket histograms and the
    fused log-ratio table are bounded by DSIR_BUCKETS rows BY
    CONSTRUCTION (broadcast legitimately); the gram stream itself
    never shuffles except into those bounded aggregates and the final
    per-doc mean, so the whole scorer is two map-shaped passes over
    the corpus + one doc-keyed aggregate at any scale.
    """
    docs = load(spark, sf, "documents").select(
        "doc_id", "lang", tx.words("text").alias("__w")
    )
    grams = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "concat(__w, CASE WHEN size(__w) >= 2 THEN "
                "transform(sequence(1, size(__w) - 1), "
                "i -> concat(element_at(__w, i), ' ', "
                "element_at(__w, i + 1))) "
                "ELSE CAST(array() AS ARRAY<STRING>) END)"
            )
        ).alias("__g"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("__g")), 1, 15), 16, 10).cast(
                "bigint"
            )
            % DSIR_BUCKETS
        ).alias("__b"),
    )
    tgt = (
        grams.filter(F.col("lang") == "en")
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__tn"))
    )
    rawc = (
        grams.filter(F.col("lang") != "en")
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__qn"))
    )
    # 1-row totals: bounded by construction -> broadcast crossJoin
    # (the A10 percent-of-total pattern)
    tot = tgt.agg(F.sum("__tn").alias("__tt")).crossJoin(
        rawc.agg(F.sum("__qn").alias("__qt"))
    )
    nb = F.lit(float(DSIR_BUCKETS))
    lr = (
        tgt.join(rawc, "__b", "full_outer")
        .crossJoin(F.broadcast(tot))
        .select(
            "__b",
            F.round(
                F.log(
                    (F.coalesce(F.col("__tn"), F.lit(0)) + F.lit(1.0))
                    / (F.col("__tt") + nb)
                )
                - F.log(
                    (F.coalesce(F.col("__qn"), F.lit(0)) + F.lit(1.0))
                    / (F.col("__qt") + nb)
                ),
                8,
            ).alias("__lr"),
        )
    )
    return (
        grams.filter(F.col("lang") != "en")
        .join(F.broadcast(lr), "__b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.round(
                F.sum(F.col("__lr").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dsir_weight"),
        )
        .orderBy(F.desc("dsir_weight"), "doc_id")
        .limit(20)
    )


_IR01_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, {_WORDS} AS w FROM documents
), uni AS (
  SELECT doc_id, lang, unnest(w) AS g FROM d
), bi AS (
  SELECT doc_id, lang, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] AS g
  FROM (SELECT doc_id, lang, w, unnest(range(1, len(w))) AS i FROM d)
), grams AS (
  SELECT doc_id, lang, {_H60.format(x='g')} % {DSIR_BUCKETS} AS b
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
), tgt AS (
  SELECT b, COUNT(*) AS tn FROM grams WHERE lang = 'en' GROUP BY b
), rawc AS (
  SELECT b, COUNT(*) AS qn FROM grams WHERE lang <> 'en' GROUP BY b
), tot AS (
  SELECT (SELECT SUM(tn) FROM tgt) AS tt, (SELECT SUM(qn) FROM rawc) AS qt
), lr AS (
  SELECT COALESCE(tgt.b, rawc.b) AS b,
         ROUND(LN((COALESCE(tn, 0) + 1.0) / (tt + {DSIR_BUCKETS}.0))
             - LN((COALESCE(qn, 0) + 1.0) / (qt + {DSIR_BUCKETS}.0)), 8) AS lr
  FROM tgt FULL OUTER JOIN rawc ON tgt.b = rawc.b CROSS JOIN tot
)
SELECT g.doc_id, g.lang, CAST(COUNT(*) AS BIGINT) AS n_grams,
       ROUND(CAST(SUM(CAST(lr AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*), 6)
         AS dsir_weight
FROM grams g JOIN lr ON g.b = lr.b
WHERE g.lang <> 'en'
GROUP BY g.doc_id, g.lang
ORDER BY dsir_weight DESC, g.doc_id LIMIT 20
"""


# TPC-H Q7 volume-shipping nation set: any two distinct members pair.
_Q49_NATIONS = ("NATION_1", "NATION_2", "NATION_3", "NATION_4")


def q49_nation_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): the one celebrated star
    pattern still missing from the relational library — the SAME
    bounded dimension joined in TWO ROLES with a cross-role PAIR
    predicate (supplier nation x customer nation, distinct members of
    a fixed market set, both directions), revenue per (supp_nation,
    cust_nation, ship year). Reference parity: exercises the J4 star
    join + F9 calendar extraction + A1 decimal aggregate contract
    (src/run_queries.py:130-177's query-bank shape) over a pairing
    its query bank never reaches.

    Scale: both nation roles broadcast (25 rows each, bounded by
    construction — the q48 convention); supplier/customer/orders are
    SF-proportional and carry NO hint (AQE decides). The pair
    predicate prunes at the two broadcast joins, so only in-market
    rows reach the single aggregate shuffle.
    """
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    supp = load(spark, sf, "supplier")
    nations = load(spark, sf, "nation").filter(
        F.col("n_name").isin(*_Q49_NATIONS)
    )
    n1 = nations.select(
        F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nations.select(
        F.col("n_nationkey").alias("__ck"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("__sk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("__ck"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_IN_Q49 = ", ".join(f"'{n}'" for n in _Q49_NATIONS)

_Q49_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ({_IN_Q49}) AND n2.n_name IN ({_IN_Q49})
  AND n1.n_name <> n2.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


ROUND7_STAGED_QUERIES.update(
    {
        "dd13_semantic_dedup": dd13_semantic_dedup,
        "ir01_dsir_importance": ir01_dsir_importance,
        "q49_nation_volume_shipping": q49_nation_volume_shipping,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "dd13_semantic_dedup": _dd13_oracle_sql(),
        "ir01_dsir_importance": _IR01_ORACLE,
        "q49_nation_volume_shipping": _Q49_ORACLE,
    }
)


# --- round-7 staged surface, wave 3 (sl01 split leakage, q50 TPC-H Q5) ------

def sl01_split_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Train/val/test split-leakage audit — the hygiene check every
    training pipeline runs after splitting: does any CONTENT straddle
    a split boundary? Doc-level exact dups are the trivial case (this
    corpus has none); the audit that actually bites measures shared
    SPANS, so the unit here is the 32-token chunk (tx08's certified
    chunking convention, reused expression-for-expression) and the
    split is ss03's certified hash-band rule (multiplicative hash of
    doc_id, 80/10/10) — composing two certified contracts into the
    cross-split join neither runs alone. Output: per ordered split
    pair, the distinct chunk hashes seen on both sides and the
    distinct docs touched on each side.

    Scale: split assignment is a zero-shuffle map; the audit is ONE
    equi-join on chunk hash over the DISTINCT (hash, split, doc) frame
    — fan-out bounded by real duplication multiplicity, never
    all-pairs — then a 3x3-bounded rollup. At 100 TB this is the same
    single fingerprint shuffle inc01 pays.
    """
    docs = _docs_words(spark, sf)
    ch = (
        docs.select(
            "doc_id",
            _split_col().alias("__s"),
            F.explode(F.expr(_CHUNKS32_EXPR)).alias("__chunk"),
        )
        .select(
            "doc_id", "__s", F.md5(F.concat_ws(" ", "__chunk")).alias("__h")
        )
        .distinct()
    )
    a = ch.select(
        F.col("__h"), F.col("__s").alias("split_a"), F.col("doc_id").alias("__ida")
    )
    b = ch.select(
        F.col("__h"), F.col("__s").alias("split_b"), F.col("doc_id").alias("__idb")
    )
    return (
        a.join(b, "__h")
        .filter(F.col("split_a") < F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(
            F.countDistinct("__h").alias("n_shared_chunks"),
            F.countDistinct("__ida").alias("n_docs_a"),
            F.countDistinct("__idb").alias("n_docs_b"),
        )
        .orderBy("split_a", "split_b")
    )


_SL01_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_SPLIT_CASE_SQL} AS s, {_WORDS} AS w
  FROM documents
), ch AS (
  SELECT DISTINCT doc_id, s,
         md5(array_to_string(w[CAST(ci AS INT) * 32 + 1
                               : CAST(ci AS INT) * 32 + 32], ' ')) AS h
  FROM (SELECT doc_id, s, w,
               unnest(range(0, CAST(ceil(len(w) / 32.0) AS BIGINT))) AS ci
        FROM d)
)
SELECT a.s AS split_a, b.s AS split_b,
       CAST(COUNT(DISTINCT a.h) AS BIGINT) AS n_shared_chunks,
       CAST(COUNT(DISTINCT a.doc_id) AS BIGINT) AS n_docs_a,
       CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_docs_b
FROM ch a JOIN ch b ON a.h = b.h AND a.s < b.s
GROUP BY a.s, b.s ORDER BY split_a, split_b
"""


def q50_local_supplier_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the star pattern whose
    signature is an EQUALITY CONSTRAINT BETWEEN TWO DIMENSION ROLES —
    revenue counts only where the customer's nation equals the
    supplier's nation, so the join graph is cyclic (lineitem→supplier,
    lineitem→orders→customer, customer.nation = supplier.nation),
    unlike every acyclic star in the library. Region-scoped to ASIA,
    one order-date year, revenue per nation descending.

    Scale: nation/region broadcast (bounded by construction);
    supplier/customer/orders are SF-proportional, NO hints (AQE
    decides). The nation-equality edge rides the customer join as a
    post-join filter-free equi-condition — Catalyst folds it into the
    join keys, so no extra shuffle appears.
    """
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    cust = load(spark, sf, "customer")
    supp = load(spark, sf, "supplier")
    nat = load(spark, sf, "nation")
    reg = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


_Q50_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


ROUND7_STAGED_QUERIES.update(
    {
        "sl01_split_leakage": sl01_split_leakage,
        "q50_local_supplier_revenue": q50_local_supplier_revenue,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "sl01_split_leakage": _SL01_ORACLE,
        "q50_local_supplier_revenue": _Q50_ORACLE,
    }
)


# --- round-7 staged surface, wave 4 (xl01 cross-lingual near-dup) -----------

def xl01_crosslingual_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-lingual near-duplicate audit — the translated-duplicate
    detector a multilingual corpus needs: the same content present in
    two languages shares no tokens (invisible to every text-hash
    dedup: dd01-dd04, dd11) but sits close in a multilingual embedding
    space, silently inflating effective epochs. Candidates come from
    the SAME multi-table sign-LSH kernel dd05 certifies
    (similarity.neardup_pairs — banded buckets, never all-pairs); the
    lang join (documents.doc_id == embeddings.vec_id, the rrf01 corpus
    contract) keeps only pairs whose languages DIFFER, rolled up per
    unordered language pair with the decimal-exact mean cosine.

    Scale: candidate volume is the LSH-bounded dd05 set; the two lang
    joins attach one small column by id (AQE decides the strategy —
    documents is SF-proportional, no hint); the rollup is bounded by
    the language-pair vocabulary (|langs|²/2 rows). The lang-pair
    matrix IS the curation signal: which language pairs share
    translated content, and how tight.
    """
    pairs = sim.neardup_pairs(
        load(spark, sf, "embeddings"), threshold=0.35,
        nbits=LSH_NBITS, n_tables=LSH_TABLES,
    )
    docs = load(spark, sf, "documents").select("doc_id", "lang")
    la = docs.select(
        F.col("doc_id").alias("id_a"), F.col("lang").alias("__lang_a")
    )
    lb = docs.select(
        F.col("doc_id").alias("id_b"), F.col("lang").alias("__lang_b")
    )
    return (
        pairs.join(la, "id_a")
        .join(lb, "id_b")
        .filter(F.col("__lang_a") != F.col("__lang_b"))
        .select(
            F.least("__lang_a", "__lang_b").alias("lang_lo"),
            F.greatest("__lang_a", "__lang_b").alias("lang_hi"),
            "cosine_sim",
        )
        .groupBy("lang_lo", "lang_hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(F.col("cosine_sim").cast("decimal(25,12)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_cosine"),
        )
        .orderBy("lang_lo", "lang_hi")
    )


_XL01_ORACLE = f"""
WITH banded AS ({_BANDED}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
), pairs AS (
  SELECT da.lang AS lang_a, db.lang AS lang_b,
         {_COS.format(a='ea.embedding', b='eb.embedding')} AS cs
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
  JOIN documents da ON da.doc_id = c.id_a
  JOIN documents db ON db.doc_id = c.id_b
  WHERE {_COS.format(a='ea.embedding', b='eb.embedding')} >= 0.35
    AND da.lang <> db.lang
)
SELECT LEAST(lang_a, lang_b) AS lang_lo,
       GREATEST(lang_a, lang_b) AS lang_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(cs AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*), 6)
         AS avg_cosine
FROM pairs GROUP BY lang_lo, lang_hi ORDER BY lang_lo, lang_hi
"""


ROUND7_STAGED_QUERIES["xl01_crosslingual_neardup"] = xl01_crosslingual_neardup
ROUND7_STAGED_ORACLE["xl01_crosslingual_neardup"] = _XL01_ORACLE


# --- round-7 staged surface, wave 5 (st11 watermarked stream dedup) ---------

def _register_staged_streaming() -> None:
    """st11 lives with the streaming family (streaming/queries.py);
    registered here so the staged harness certifies it with the rest
    of the round-7 queue."""
    from ..streaming.queries import ST11_STAGED_ORACLE, st11_watermarked_dedup

    ROUND7_STAGED_QUERIES["st11_watermarked_dedup"] = st11_watermarked_dedup
    ROUND7_STAGED_ORACLE["st11_watermarked_dedup"] = ST11_STAGED_ORACLE


_register_staged_streaming()


# --- round-7 staged surface, wave 6 (q51, ss04, gr02, st12) -----------------

def q51_returned_item_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item revenue): which customers sent
    the most revenue back in a quarter — the classic fact→fact→dim
    chain (lineitem filtered on return flag, orders filtered to one
    quarter, customer attributes carried through the aggregate) with a
    wide GROUP BY (key + 3 carried attributes) and top-20 output.

    Scale: both fact filters push to the parquet scan (returnflag is a
    low-cardinality dictionary column, orderdate a range — both
    PushedFilters); the two SF-proportional joins carry NO hints (AQE
    decides — the quarter-filtered orders side is usually small enough
    to broadcast at runtime, which is exactly the call AQE should
    make, not the code); nation is bounded by construction (25 rows,
    broadcast). The wide GROUP BY keys on c_custkey — the carried
    attributes are functionally dependent so they add no cardinality,
    and top-20 is a TakeOrdered, never a global sort."""
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    cust = load(spark, sf, "customer")
    nat = load(spark, sf, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q51_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


SS04_CUTOFF = "2024-01-22"  # ~70/30 against the corpus's Jan 1-30 span


def ss04_temporal_split_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal train/test split + leakage audit — the OTHER split
    discipline next to ss03's hash bands: time-series corpora split on
    a time cutoff (train strictly before, test at/after), and the
    question a pipeline must answer before training is how many
    ENTITIES straddle the boundary — a user appearing on both sides
    leaks test-time behaviour into training features. Per event type:
    row counts per side, distinct users per side, and the straddling
    (leaked) user count.

    Scale: split assignment is a pushed-down predicate (zero shuffle);
    the audit is TWO aggregates — one row rollup, one (type, user)
    distinct-reduce whose membership flags then roll up to the type
    vocabulary. Nothing is user×user; the leaked count is
    sum(in_train AND in_test) over the distinct-reduced frame, the
    same one-pass flag pattern as ct01's contamination counts."""
    ev = load(spark, sf, "events").select(
        "event_type",
        "user_id",
        (F.col("ts") < F.lit(SS04_CUTOFF).cast("timestamp")).alias("__tr"),
    )
    counts = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("__tr"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_train"),
        F.sum(F.when(F.col("__tr"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_test"),
    )
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.max(F.when(F.col("__tr"), 1).otherwise(0)).alias("__in_tr"),
        F.max(F.when(F.col("__tr"), 0).otherwise(1)).alias("__in_te"),
    )
    users = per_user.groupBy("event_type").agg(
        F.sum("__in_tr").cast("bigint").alias("n_users_train"),
        F.sum("__in_te").cast("bigint").alias("n_users_test"),
        F.sum(F.col("__in_tr") * F.col("__in_te"))
        .cast("bigint")
        .alias("n_leaked_users"),
    )
    return counts.join(users, "event_type").orderBy("event_type")


_SS04_ORACLE = f"""
WITH lab AS (
  SELECT event_type, user_id,
         CASE WHEN ts < TIMESTAMP '{SS04_CUTOFF}' THEN 1 ELSE 0 END AS tr
  FROM events
), cnt AS (
  SELECT event_type,
         CAST(SUM(tr) AS BIGINT) AS n_train,
         CAST(SUM(1 - tr) AS BIGINT) AS n_test
  FROM lab GROUP BY event_type
), pu AS (
  SELECT event_type, user_id, MAX(tr) AS in_tr, MAX(1 - tr) AS in_te
  FROM lab GROUP BY event_type, user_id
), us AS (
  SELECT event_type,
         CAST(SUM(in_tr) AS BIGINT) AS n_users_train,
         CAST(SUM(in_te) AS BIGINT) AS n_users_test,
         CAST(SUM(in_tr * in_te) AS BIGINT) AS n_leaked_users
  FROM pu GROUP BY event_type
)
SELECT c.event_type, n_train, n_test,
       n_users_train, n_users_test, n_leaked_users
FROM cnt c JOIN us u ON c.event_type = u.event_type
ORDER BY c.event_type
"""


PR_UNITS = 10**12  # fixed-point rank scale (micro-micro-units)
PR_ITERS = 3
PR_TOPK = 20


def gr02_candidate_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Integer-exact PageRank over the verified near-dup graph — the
    centrality pass a dedup pipeline runs AFTER clustering (dd06) to
    pick which documents anchor the most duplication: a doc near-dup
    to many well-connected docs is template/boilerplate material even
    when its own degree is modest, which is what plain degree (gr01)
    misses. Standard damping 0.85, PR_ITERS unrolled iterations over
    the undirected (both-direction) edge list of exact-Jaccard ≥ 0.5
    pairs on dd06's certified LSH candidates.

    Determinism is the design: ranks live in BIGINT fixed-point units
    (PR_UNITS = 1e12 per unit mass) and every step is integer —
    contribution = rank div degree, damping = (85 * sum) div 100 — so
    the result is exact, order-independent, and engine-portable (the
    float formulation would hash-mismatch on associativity). Each
    iteration is one join + one aggregate, both keyed on the vertex id
    (the dd06/connected-components discipline); the edge list is
    localCheckpointed once so Catalyst doesn't re-analyze the LSH
    lineage per iteration, and the corpus-count scalar rides a 1-row
    broadcast (A10 pattern) — driver state is zero. At 100 TB the
    frame in the loop is the near-dup SUBGRAPH (orders of magnitude
    smaller than the corpus), same bound as dd06's fixpoint."""
    good = _neardup_good_edges(spark, sf)
    edges = (
        good.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(
            good.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("__deg")
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    nodes = (
        deg.select(F.col("src").alias("doc_id"), "__deg")
        .crossJoin(F.broadcast(nn))
        .localCheckpoint()
    )
    ranks = nodes.select(
        "doc_id",
        "__deg",
        "__n",
        F.expr(f"CAST({PR_UNITS} AS BIGINT) div __n").alias("__r"),
    )
    for _ in range(PR_ITERS):
        contrib = ranks.join(edges, ranks.doc_id == edges.src).select(
            F.col("dst"), F.expr("__r div __deg").alias("__c")
        )
        inc = contrib.groupBy("dst").agg(F.sum("__c").alias("__inc"))
        ranks = nodes.join(inc, nodes.doc_id == inc.dst).select(
            "doc_id",
            "__deg",
            "__n",
            F.expr(
                f"(15 * (CAST({PR_UNITS} AS BIGINT) div __n)) div 100"
                " + (85 * __inc) div 100"
            ).alias("__r"),
        )
    return (
        ranks.select(
            "doc_id",
            F.col("__deg").alias("n_neighbors"),
            F.col("__r").alias("rank_units"),
        )
        .orderBy(F.desc("rank_units"), "doc_id")
        .limit(PR_TOPK)
    )


def _neardup_good_edges(spark: SparkSession, sf: str) -> DataFrame:
    """The verified near-dup edge set (id_a < id_b): exact Jaccard
    >= 0.5 evaluated ONLY on the LSH band candidates from the shared
    `_lsh_base`. One implementation, every graph analysis consumes it
    (gr02 PageRank, tc01 triangles) — the Spark twin of
    `_neardup_good_cte`."""
    docs, _sigs, pairs = _lsh_base(spark, sf)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("__sa"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("__sb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(dd.jaccard(F.col("__sa"), F.col("__sb")) >= 0.5)
        .select("id_a", "id_b")
    )


def _neardup_good_cte() -> str:
    """dd06's minhash-LSH candidate CTE chain up to the VERIFIED
    edge set `good` (exact Jaccard >= 0.5 on LSH candidates, id_a <
    id_b) — the one certified spec of the near-dup graph, shared by
    every oracle that analyzes it (gr02 PageRank, tc01 triangles)."""
    return f"""sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range({MINHASH_K})) AS j) GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ',')) AS band_key
  FROM pj GROUP BY doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
), good AS (
  SELECT id_a, id_b
  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
  WHERE {_JACCARD.format(a='sa.s', b='sb.s')} >= 0.5
)"""


def _gr02_oracle_sql() -> str:
    """dd06's minhash-LSH candidate CTE chain (the certified candidate
    spec) + unrolled integer-PageRank iterations; `//` is DuckDB's
    integer floor division = Spark's `div` on the all-positive ranks."""
    pr_cte = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        pr_cte.append(
            f"it{i} AS (\n"
            f"  SELECT e.d AS id,\n"
            f"         (15 * ({PR_UNITS} // (SELECT n FROM nn))) // 100\n"
            f"         + (85 * SUM({prev}.r // deg.dg)) // 100 AS r\n"
            f"  FROM edges e\n"
            f"  JOIN {prev} ON {prev}.id = e.s\n"
            f"  JOIN deg ON deg.s = e.s\n"
            f"  GROUP BY e.d\n)"
        )
        prev = f"it{i}"
    return f"""
WITH {_neardup_good_cte()}, edges AS (
  SELECT id_a AS s, id_b AS d FROM good
  UNION ALL SELECT id_b AS s, id_a AS d FROM good
), deg AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS dg FROM edges GROUP BY s
), nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg
), r0 AS (
  SELECT s AS id, {PR_UNITS} // (SELECT n FROM nn) AS r FROM deg
), {','.join(pr_cte)}
SELECT d.s AS doc_id, d.dg AS n_neighbors,
       CAST({prev}.r AS BIGINT) AS rank_units
FROM {prev} JOIN deg d ON d.s = {prev}.id
ORDER BY rank_units DESC, doc_id LIMIT {PR_TOPK}
"""


ROUND7_STAGED_QUERIES.update(
    {
        "q51_returned_item_revenue": q51_returned_item_revenue,
        "ss04_temporal_split_audit": ss04_temporal_split_audit,
        "gr02_candidate_pagerank": gr02_candidate_pagerank,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "q51_returned_item_revenue": _Q51_ORACLE,
        "ss04_temporal_split_audit": _SS04_ORACLE,
        "gr02_candidate_pagerank": _gr02_oracle_sql(),
    }
)


def _register_staged_streaming_wave6() -> None:
    """st12 lives with the streaming family (streaming/queries.py),
    same discipline as st11's registration above."""
    from ..streaming.queries import ST12_STAGED_ORACLE, st12_foreachbatch_upsert

    ROUND7_STAGED_QUERIES["st12_foreachbatch_upsert"] = st12_foreachbatch_upsert
    ROUND7_STAGED_ORACLE["st12_foreachbatch_upsert"] = ST12_STAGED_ORACLE


_register_staged_streaming_wave6()


# --- round-7 staged surface, wave 7 (ct03, win04) ---------------------------

CT03_EVAL_SOURCE = "src0"  # the source standing in for a benchmark suite
CT03_THRESHOLD = 0.5  # dd06's verified-near-dup operating point


def ct03_fuzzy_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """NEAR-DUP contamination — the fuzzy complement to ct01/ct02's
    exact fingerprint/n-gram overlap: a benchmark item that was
    paraphrased, truncated, or lightly edited before landing in the
    training corpus shares no exact n-gram fingerprint but still
    verifies as a near-duplicate, and real decontamination passes
    check BOTH signals. One source stands in for the eval suite
    (CT03_EVAL_SOURCE); candidates are the SAME minhash-LSH set dd06
    certifies (shared materialized base, never all-pairs), verified at
    exact Jaccard ≥ CT03_THRESHOLD, kept only where exactly one side
    is the eval source, and rolled up per contaminated corpus source:
    distinct corpus docs to drop, distinct eval items hit, pair count,
    and the tightest match.

    Scale: identical cost shape to dd06 (LSH bands bound candidates;
    the exact kernel runs on candidates only); the source join
    attaches one dictionary column by id; the rollup is bounded by the
    source vocabulary. The eval suite itself needs no broadcast or
    special casing — it is just a predicate on an already-shared
    intermediate."""
    docs, _sigs, pairs = _lsh_base(spark, sf)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("__sa"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("__sb"))
    good = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            dd.jaccard(F.col("__sa"), F.col("__sb")).alias("__j"),
        )
        .filter(F.col("__j") >= CT03_THRESHOLD)
    )
    src = load(spark, sf, "documents").select("doc_id", "source")
    sa_ = src.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("__src_a")
    )
    sb_ = src.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("__src_b")
    )
    ev = F.lit(CT03_EVAL_SOURCE)
    tagged = (
        good.join(sa_, "id_a")
        .join(sb_, "id_b")
        .filter((F.col("__src_a") == ev) != (F.col("__src_b") == ev))
        .select(
            F.when(F.col("__src_a") == ev, F.col("__src_b"))
            .otherwise(F.col("__src_a"))
            .alias("source"),
            F.when(F.col("__src_a") == ev, F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("__corpus_doc"),
            F.when(F.col("__src_a") == ev, F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("__eval_doc"),
            "__j",
        )
    )
    return (
        tagged.groupBy("source")
        .agg(
            F.countDistinct("__corpus_doc")
            .cast("bigint")
            .alias("n_contaminated_docs"),
            F.countDistinct("__eval_doc")
            .cast("bigint")
            .alias("n_eval_docs_hit"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.max("__j"), 6).alias("max_jaccard"),
        )
        .orderBy("source")
    )


_CT03_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range({MINHASH_K})) AS j) GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ',')) AS band_key
  FROM pj GROUP BY doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
), good AS (
  SELECT id_a, id_b, {_JACCARD.format(a='sa.s', b='sb.s')} AS j
  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
  WHERE {_JACCARD.format(a='sa.s', b='sb.s')} >= {CT03_THRESHOLD}
), tagged AS (
  SELECT CASE WHEN da.source = '{CT03_EVAL_SOURCE}' THEN db.source
              ELSE da.source END AS source,
         CASE WHEN da.source = '{CT03_EVAL_SOURCE}' THEN g.id_b
              ELSE g.id_a END AS corpus_doc,
         CASE WHEN da.source = '{CT03_EVAL_SOURCE}' THEN g.id_a
              ELSE g.id_b END AS eval_doc,
         g.j
  FROM good g
  JOIN documents da ON da.doc_id = g.id_a
  JOIN documents db ON db.doc_id = g.id_b
  WHERE (da.source = '{CT03_EVAL_SOURCE}') <> (db.source = '{CT03_EVAL_SOURCE}')
)
SELECT source,
       CAST(COUNT(DISTINCT corpus_doc) AS BIGINT) AS n_contaminated_docs,
       CAST(COUNT(DISTINCT eval_doc) AS BIGINT) AS n_eval_docs_hit,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(MAX(j), 6) AS max_jaccard
FROM tagged GROUP BY source ORDER BY source
"""


def win04_linear_interpolation(spark: SparkSession, sf: str) -> DataFrame:
    """Linear-interpolation gap fill — win02's LOCF sibling for
    signals where carrying a stale value biases downstream features:
    each missing day on the per-user day spine gets the straight line
    between its bracketing observations, ends stay NULL (marked
    'edge' — no extrapolation). The fill a feature store applies to
    continuously-moving per-entity signals.

    Determinism is fixed-point, the gr02 lesson taken to floats: a
    float formulation (v0 + (v1-v0)·Δ/span, ROUND 6) hash-mismatched
    on a literal .5 boundary — the midpoint of two 6-dp values lands
    on x.xxxxxx5, where Spark rounds the BINARY double (…49999…, down)
    and DuckDB the decimal representation (up). So values live in
    BIGINT micro-units end to end: daily mean = decimal-sum micros
    div count (floor at 1e-6), interpolation = the POSITIVE weighted
    sum (v0·(span-Δ) + v1·Δ) div span — all-positive operands keep
    floor division identical across engines — and the emitted double
    is units/1e6, an exact-integer division both engines round
    identically. Scale: the spine is wall-time × roster bounded
    (never event volume); the bracketing observations come from two
    last/first IGNORE NULLS windows PER USER — high-cardinality
    partitions, never a single-partition window; the only
    volume-proportional shuffle is the daily aggregate."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").filter(F.col("user_id") < 200).select(
        "user_id", F.to_date("ts").alias("__d"), "value"
    )
    daily = ev.groupBy("user_id", "__d").agg(
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)"
            " div COUNT(*)"
        ).alias("__avg")
    )
    spine = ev.agg(
        F.min("__d").alias("__mn"), F.max("__d").alias("__mx")
    ).select(
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.expr("interval 1 day"))
        ).alias("day")
    )
    users = ev.select("user_id").distinct()
    grid = spine.crossJoin(F.broadcast(users))
    g = grid.join(
        daily,
        (grid.user_id == daily.user_id) & (grid.day == daily.__d),
        "left",
    ).select(grid.user_id, grid.day, daily.__avg)
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("__avg").isNotNull(), F.col("day"))
    v0 = F.last("__avg", ignorenulls=True).over(wp)
    d0 = F.last(obs_day, ignorenulls=True).over(wp)
    v1 = F.first("__avg", ignorenulls=True).over(wn)
    d1 = F.first(obs_day, ignorenulls=True).over(wn)
    dd_ = F.datediff(F.col("day"), d0).cast("long")
    span = F.datediff(d1, d0).cast("long")
    staged = g.select(
        "user_id",
        F.col("day"),
        "__avg",
        v0.alias("__v0"),
        v1.alias("__v1"),
        dd_.alias("__dd"),
        span.alias("__span"),
        d0.alias("__d0"),
        d1.alias("__d1"),
    )
    units = F.when(F.col("__avg").isNotNull(), F.col("__avg")).otherwise(
        F.when(
            F.col("__d0").isNotNull() & F.col("__d1").isNotNull(),
            F.expr("(__v0 * (__span - __dd) + __v1 * __dd) div __span"),
        )
    )
    return (
        staged.select(
            "user_id",
            # emit midnight TIMESTAMP, the certified convention for
            # spine columns (win02): pandas keeps date objects as
            # dtype=object, which the driver hasher serializes
            # differently from DuckDB's datetime64
            F.col("day").cast("timestamp").alias("day"),
            (units.cast("double") / 1000000).alias("value_filled"),
            F.when(F.col("__avg").isNotNull(), F.lit("obs"))
            .when(
                F.col("__d0").isNotNull() & F.col("__d1").isNotNull(),
                F.lit("interp"),
            )
            .otherwise(F.lit("edge"))
            .alias("fill_kind"),
        )
        .orderBy("user_id", "day")
    )


_WIN04_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d, value FROM events
  WHERE user_id < 200
), daily AS (
  SELECT user_id, d,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
           // COUNT(*) AS avgv
  FROM ev GROUP BY user_id, d
), bounds AS (
  SELECT MIN(d) AS mn, MAX(d) AS mx FROM ev
), spine AS (
  SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE)
           AS day
  FROM bounds
), users AS (
  SELECT DISTINCT user_id FROM ev
), grid AS (
  SELECT u.user_id, s.day FROM spine s CROSS JOIN users u
), g AS (
  SELECT grid.user_id, grid.day, daily.avgv
  FROM grid LEFT JOIN daily
    ON daily.user_id = grid.user_id AND daily.d = grid.day
), w AS (
  SELECT user_id, day, avgv,
         last_value(avgv IGNORE NULLS) OVER wp AS v0,
         last_value(CASE WHEN avgv IS NOT NULL THEN day END IGNORE NULLS)
           OVER wp AS d0,
         first_value(avgv IGNORE NULLS) OVER wn AS v1,
         first_value(CASE WHEN avgv IS NOT NULL THEN day END IGNORE NULLS)
           OVER wn AS d1
  FROM g
  WINDOW wp AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, CAST(day AS TIMESTAMP) AS day,
       CAST(CASE WHEN avgv IS NOT NULL THEN avgv
                 WHEN d0 IS NOT NULL AND d1 IS NOT NULL
                 THEN (v0 * ((d1 - d0) - (day - d0))
                       + v1 * (day - d0)) // (d1 - d0)
            END AS DOUBLE) / 1000000 AS value_filled,
       CASE WHEN avgv IS NOT NULL THEN 'obs'
            WHEN d0 IS NOT NULL AND d1 IS NOT NULL THEN 'interp'
            ELSE 'edge' END AS fill_kind
FROM w ORDER BY user_id, day
"""


ROUND7_STAGED_QUERIES.update(
    {
        "ct03_fuzzy_contamination": ct03_fuzzy_contamination,
        "win04_linear_interpolation": win04_linear_interpolation,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "ct03_fuzzy_contamination": _CT03_ORACLE,
        "win04_linear_interpolation": _WIN04_ORACLE,
    }
)


# --- round-7 staged surface, wave 8 (hll02 deterministic HLL) ---------------

HLL_P = 8  # 2^8 = 256 registers; std err ~ 1.04/sqrt(256) = 6.5%
HLL_M = 1 << HLL_P
HLL_REST_BITS = 60 - HLL_P  # _H60 yields 60 hash bits


def hll02_deterministic_hll(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic HyperLogLog — closes the sketch family's one
    rows-only asterisk: hll01 rides Spark's engine-internal
    ``approx_count_distinct`` (no cross-engine oracle by nature), but
    HLL itself is a pure function of the hash — register j = max
    leading-zero rank of the hashed values landing in bucket j — so
    built explicitly on the library's md5-based 60-bit hash the WHOLE
    sketch certifies by hash, registers and estimate both, exactly
    like lc01 did for linear counting.

    Determinism discipline (the gr02/win04 rule): the harmonic
    denominator sum(2^-rho_j) is NOT summed in floats — each term is
    an exact BIGINT 2^(53-rho) and the register digest is their
    integer sum (order-independent), with empty buckets folded in as
    (m - occupied)·2^53; the only float ops are one literal-constant
    alpha expression and one division/ln on that exact integer,
    rounded at 2 dp (lc01's certified precedent). Rank needs
    bit-length, computed as ``length(bin(rest))`` — identical
    semantics in Spark and DuckDB, verified ('101', '0'-for-zero).

    Scale: THE 100 TB distinct-count shape — per (type, bucket) MAX
    partials map-side-combine, the shuffle carries at most m rows per
    group regardless of event volume, and registers merge across
    batches/days by pairwise MAX (mergeability is the whole point of
    the sketch; the register digest column is exactly the state a
    rollup store would persist). Standard small-range correction
    (raw ≤ 2.5m with empty buckets → linear counting); the 32-bit
    large-range correction does not apply at a 60-bit hash."""
    rest_zero_rho = HLL_REST_BITS + 1
    ev = load(spark, sf, "events").select(
        "event_type",
        "user_id",
        dd.hash60(F.col("user_id").cast("string")).alias("__h"),
    )
    hashed = ev.select(
        "event_type",
        "user_id",
        (F.col("__h") % HLL_M).alias("__b"),
        F.expr(f"__h div {HLL_M}").alias("__rest"),
    ).select(
        "event_type",
        "user_id",
        "__b",
        F.expr(
            f"CASE WHEN __rest = 0 THEN {rest_zero_rho} "
            f"ELSE {HLL_REST_BITS} - length(bin(__rest)) + 1 END"
        ).alias("__rho"),
    )
    regs = hashed.groupBy("event_type", "__b").agg(
        F.max("__rho").alias("__mx")
    )
    per = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("occupied"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), {rest_zero_rho} - __mx)"
            )
        ).cast("bigint").alias("__occ_sum"),
    )
    exact = load(spark, sf, "events").groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    two53 = float(1 << rest_zero_rho)
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M)))
    digest = F.col("__occ_sum") + (
        F.lit(HLL_M) - F.col("occupied")
    ) * F.lit(1 << rest_zero_rho)
    raw = (
        alpha
        * F.lit(float(HLL_M) * float(HLL_M))
        * F.lit(two53)
        / F.col("register_digest").cast("double")
    )
    lc = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / (F.lit(HLL_M) - F.col("occupied")).cast("double")
    )
    est = F.round(
        F.when(
            (raw <= F.lit(2.5 * HLL_M)) & (F.col("occupied") < HLL_M), lc
        ).otherwise(raw),
        2,
    )
    return (
        per.join(exact, "event_type")
        .withColumn("register_digest", digest.cast("bigint"))
        .select(
            "event_type",
            "exact_distinct",
            "occupied",
            "register_digest",
            est.alias("estimate"),
            F.round(
                (est - F.col("exact_distinct")) / F.col("exact_distinct"), 4
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


def _hll02_oracle_sql() -> str:
    rest_zero_rho = HLL_REST_BITS + 1
    h = _H60.format(x="CAST(user_id AS VARCHAR)")
    two53 = 1 << rest_zero_rho
    return f"""
WITH hashed AS (
  SELECT event_type, user_id,
         ({h}) % {HLL_M} AS b,
         ({h}) // {HLL_M} AS rest
  FROM events
), ranked AS (
  SELECT event_type, b,
         MAX(CASE WHEN rest = 0 THEN {rest_zero_rho}
                  ELSE {HLL_REST_BITS} - length(bin(rest)) + 1 END) AS mx
  FROM hashed GROUP BY event_type, b
), per AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS occupied,
         CAST(SUM(CAST(1 AS BIGINT) << ({rest_zero_rho} - mx)) AS BIGINT)
           AS occ_sum
  FROM ranked GROUP BY event_type
), exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
           AS exact_distinct
  FROM events GROUP BY event_type
), fused AS (
  SELECT p.event_type, exact_distinct, occupied,
         CAST(occ_sum + ({HLL_M} - occupied) * CAST({two53} AS BIGINT)
              AS BIGINT) AS register_digest
  FROM per p JOIN exact e ON p.event_type = e.event_type
), scored AS (
  SELECT *,
         (0.7213 / (1.0 + 1.079 / {float(HLL_M)}))
           * {float(HLL_M) * float(HLL_M)} * {float(two53)}
           / CAST(register_digest AS DOUBLE) AS raw
  FROM fused
)
SELECT event_type, exact_distinct, occupied, register_digest,
       ROUND(CASE WHEN raw <= {2.5 * HLL_M} AND occupied < {HLL_M}
                  THEN {float(HLL_M)}
                       * ln({float(HLL_M)}
                            / CAST({HLL_M} - occupied AS DOUBLE))
                  ELSE raw END, 2) AS estimate,
       ROUND((CASE WHEN raw <= {2.5 * HLL_M} AND occupied < {HLL_M}
                   THEN ROUND({float(HLL_M)}
                        * ln({float(HLL_M)}
                             / CAST({HLL_M} - occupied AS DOUBLE)), 2)
                   ELSE ROUND(raw, 2) END - exact_distinct)
             / exact_distinct, 4) AS rel_err
FROM scored ORDER BY event_type
"""


ROUND7_STAGED_QUERIES["hll02_deterministic_hll"] = hll02_deterministic_hll
ROUND7_STAGED_ORACLE["hll02_deterministic_hll"] = _hll02_oracle_sql()


# --- round-7 staged surface, wave 11 (TPC-H Q3/Q4/Q12/Q14/Q18 shapes) -------
# The five remaining celebrated TPC-H patterns expressible on this
# schema (no l_commitdate/l_receiptdate/l_shipmode/partsupp columns
# exist in the driver tables, so Q4 and Q12 substitute the available
# date/status columns for the missing ones — the SHAPE under test is
# identical: the EXISTS semi-join count and the two-level conditional
# pivot). With these, the relational hard-shape library covers Q1-Q22
# except the partsupp-only Q11/Q16 variants already adapted as q46/q57.


def q52_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): top unshipped-revenue
    orders for one market segment — segment-filtered customer joined
    through orders to lineitems shipped AFTER the cutoff while the
    order was placed BEFORE it, revenue per (order, date, priority),
    top 10.

    Scale: all three filters push to their parquet scans
    (c_mktsegment is a dictionary column, the two dates are ranges);
    customer and orders are SF-proportional so neither join carries a
    hint (AQE decides — the segment-filtered customer side is ~1/5 of
    the table and usually broadcastable at runtime, which is exactly
    the call AQE should make from measured size). The GROUP BY keys on
    l_orderkey — o_orderdate/o_orderpriority are functionally
    dependent carried attributes adding no cardinality — and the
    top-10 is a TakeOrdered, never a global sort."""
    cust = load(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01")
    )
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q52_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
"""


def q53_order_priority_check(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): how many orders per
    priority class had at least one problem line — the canonical
    correlated-EXISTS count. The reference predicate (l_commitdate <
    l_receiptdate) needs columns this schema lacks; the stand-in —
    a line shipped more than 90 days after the order date — is the
    same cross-table date comparison, so the decorrelation under test
    is identical: EXISTS(correlated, cross-row predicate) becomes ONE
    left_semi join whose condition carries both the key equality and
    the inequality.

    Scale: the order-date range pushes to the orders scan; the semi
    join shuffles on orderkey only (the inequality rides the same
    exchange as a post-join filter — no extra pass), emits each order
    at most once by semi-join semantics (no DISTINCT needed, unlike
    an inner-join rewrite), and the final rollup is a 5-row
    aggregate."""
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    flagged = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (
            li.l_shipdate
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ),
        "left_semi",
    )
    return (
        flagged.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q53_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q55_priority_pivot_by_status(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority pivot): per line class,
    how many lines belong to critical vs non-critical orders — the
    two-level conditional pivot (an IN-list CASE inside two SUMs) over
    a fact-fact join. l_shipmode does not exist in this schema;
    l_linestatus plays the low-cardinality line-class role, which
    preserves the shape under test exactly (group on a lineitem
    attribute, pivot on an orders attribute).

    Scale: the ship-date year range pushes to the lineitem scan; ONE
    join shuffle on orderkey (orders is SF-proportional — no hint, AQE
    decides) and the pivot is a 2-row map-side-combinable aggregate.
    The priority IN-list evaluates inside the same projection, so
    nothing scans twice."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q55_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q56_promo_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the share of one month's
    revenue attributable to promotional parts — a conditional sum
    divided by an unconditional sum in the SAME single aggregate (the
    100 * SUM(CASE)/SUM(...) scalar shape).

    Scale: the one-month range pushes to the lineitem scan; part is
    SF-proportional so the join carries no hint (AQE decides); both
    sums are decimal-exact and map-side-combinable, the division
    happens once on the 1-row result, and the answer leaves the
    cluster as a single row. The ratio casts to double only at output
    (two exact decimal sums divide deterministically)."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    part = load(spark, sf, "part").select("p_partkey", "p_type")
    disc = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(disc).cast("double").alias("total_revenue"),
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc).cast("double"),
                6,
            ).alias("promo_revenue_pct"),
        )
    )


_Q56_ORACLE = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))
                ELSE 0 END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS total_revenue,
       ROUND(100.0
             * CAST(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(18,2)))
                        ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q58_large_volume_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    quantity clears a threshold, with customer attributes carried
    through — the textbook IN-(GROUP BY ... HAVING) subquery. The
    Spark plan is the decorrelated form: aggregate lineitem ONCE,
    filter on the aggregate, then enrich — the oracle states the
    IN-subquery specification, so the rewrite itself is what gets
    certified.

    Scale: the quantity rollup shuffles lineitem on orderkey once and
    the HAVING filter reduces it to a tiny frame BEFORE any join —
    aggregate-before-join is the entire point of the Q18 rewrite (the
    naive plan joins the full fact first). The two enrichment joins
    carry no hints (the filtered aggregate is small at runtime — AQE's
    call); top-20 is a TakeOrdered."""
    qty = (
        load(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("__q"))
        .filter(F.col("__q") > F.lit(250))
    )
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        qty.join(orders, qty.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("__q").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


_Q58_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST((SELECT SUM(CAST(l_quantity AS DECIMAL(18,2)))
             FROM lineitem WHERE l_orderkey = o_orderkey) AS DOUBLE)
         AS total_qty
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


ROUND7_STAGED_QUERIES.update(
    {
        "q52_shipping_priority": q52_shipping_priority,
        "q53_order_priority_check": q53_order_priority_check,
        "q55_priority_pivot_by_status": q55_priority_pivot_by_status,
        "q56_promo_revenue_share": q56_promo_revenue_share,
        "q58_large_volume_orders": q58_large_volume_orders,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "q52_shipping_priority": _Q52_ORACLE,
        "q53_order_priority_check": _Q53_ORACLE,
        "q55_priority_pivot_by_status": _Q55_ORACLE,
        "q56_promo_revenue_share": _Q56_ORACLE,
        "q58_large_volume_orders": _Q58_ORACLE,
    }
)


# --- round-7 staged surface, wave 12 (q54 TPC-H Q9, q57 TPC-H Q16) ----------


def q54_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per (supplying
    nation, order year) over the parts matching a name pattern — the
    widest celebrated star (5 joins: lineitem → part / supplier /
    orders, supplier → nation) with a LIKE predicate and a derived
    profit measure. This schema has no partsupp, so the cost leg uses
    p_retailprice · quantity (same dimensional source, same
    per-line-derived-measure shape as ps_supplycost · quantity).

    Scale: the LIKE filter pushes to the part scan (StringContains is
    a pushable parquet predicate) and prunes lineitem THROUGH the
    join — AQE sizes the filtered part side at runtime (no hint;
    part is SF-proportional). Nation is bounded by construction
    (broadcast). Profit is decimal-exact per line — the difference of
    two DECIMAL products — summed exactly, cast to double only at
    output; the year comes off o_orderdate in the same projection, so
    the whole measure is one map-side expression feeding one keyed
    aggregate."""
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    supp = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf, "nation")
    orders = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    profit = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q54_ORACLE = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


def q57_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many
    distinct suppliers can deliver each surviving (brand, type, size)
    combination, excluding blocklisted suppliers — the NOT-IN
    anti-join + COUNT(DISTINCT) rollup. The part-supplier association
    comes from DISTINCT (l_partkey, l_suppkey) pairs (this schema has
    no partsupp; lineitem IS the observed association), and the
    supplier blocklist predicate stands in for Q16's comment LIKE.

    Scale: the association distinct-reduce is the first shuffle and
    collapses the fact to pair cardinality BEFORE any join (the
    distinct-reduce-first discipline ct01 uses); the NOT IN becomes a
    left_anti against the filtered supplier keys (no hint — AQE sizes
    the blocklist at runtime; NULL-key semantics don't arise because
    s_suppkey is a join key by construction); part's attribute
    predicates all push to its scan. COUNT(DISTINCT suppkey) keys on
    (brand, type, size) — Spark's internal two-phase distinct expand
    handles skew, and the output is bounded by the attribute
    cross-space, not the corpus."""
    assoc = (
        load(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#19")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    bad = load(spark, sf, "supplier").filter(
        F.col("s_acctbal") < F.lit(1000)
    ).select("s_suppkey")
    return (
        assoc.join(bad, assoc.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, assoc.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


_Q57_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#19'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


ROUND7_STAGED_QUERIES.update(
    {
        "q54_product_profit": q54_product_profit,
        "q57_supplier_part_counts": q57_supplier_part_counts,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "q54_product_profit": _Q54_ORACLE,
        "q57_supplier_part_counts": _Q57_ORACLE,
    }
)


# --- round-7 staged surface, wave 13 (cm01 Count-Min, es14 truncation) ------

# Count-Min knobs (cm01): D hash rows × W buckets. The cell matrix is
# D·W rows BY CONSTRUCTION regardless of corpus size — with the
# standard guarantees err <= e·N/W at confidence 1 - e^-D (Cormode &
# Muthukrishnan 2005). 4×512 keeps the certified fixture readable;
# a production corpus sizes W to its tolerated absolute error.
CM_DEPTH = int(_os.environ.get("SPARK_GRAFT_CM_DEPTH", "4"))
CM_WIDTH = int(_os.environ.get("SPARK_GRAFT_CM_WIDTH", "512"))


def cm01_countmin_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min sketch + heavy hitters (Cormode & Muthukrishnan
    2005): the streaming-agg workhorse for token frequencies at corpus
    scale — a D×W integer cell matrix (bounded BY CONSTRUCTION, not by
    data) whose cells are sums, so sketches merge across
    batches/shards by cell-wise addition, exactly the rollup state a
    100 TB token-frequency monitor persists. Point estimate for a key
    = MIN over its D row cells; it can only OVERestimate (collisions
    add, never subtract), which the output certifies per token
    (``overestimate >= 0`` is the sketch's defining inequality, and
    the oracle recomputes both sides exactly).

    Every hash row uses the library's 60-bit md5 hash with a
    row-seeded key ('cm{d}:{token}') so the whole sketch is a pure
    function of the data — registers AND estimates hash-certify, the
    hll02/lc01 discipline. Plan: ONE token-count shuffle (the same
    aggregate tx06 runs), then the cell matrix is a second bounded
    aggregate over the count frame (D rows per distinct token in,
    <= D·W out, map-side-combinable); the top-10 probe side is
    TakeOrdered-bounded and joins the bounded cell matrix — nothing
    driver-side, nothing all-pairs."""
    toks = (
        _docs_words(spark, sf)
        .select(F.explode("__words").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_count"))
    )
    rows = F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))
    keyed = toks.select(
        "token",
        "true_count",
        F.explode(rows).alias("__d"),
    ).withColumn(
        "__b",
        dd.hash60(
            F.concat(
                F.lit("cm"),
                F.col("__d").cast("string"),
                F.lit(":"),
                F.col("token"),
            )
        )
        % CM_WIDTH,
    )
    cells = keyed.groupBy("__d", "__b").agg(
        F.sum("true_count").alias("__cell")
    )
    top = (
        toks.orderBy(F.desc("true_count"), "token")
        .limit(10)
        .select(
            "token",
            "true_count",
            F.explode(rows).alias("__d"),
        )
        .withColumn(
            "__b",
            dd.hash60(
                F.concat(
                    F.lit("cm"),
                    F.col("__d").cast("string"),
                    F.lit(":"),
                    F.col("token"),
                )
            )
            % CM_WIDTH,
        )
    )
    return (
        top.join(cells, ["__d", "__b"])
        .groupBy("token", "true_count")
        .agg(F.min("__cell").cast("bigint").alias("cm_estimate"))
        .select(
            "token",
            "true_count",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("true_count"))
            .cast("bigint")
            .alias("overestimate"),
        )
        .orderBy(F.desc("true_count"), "token")
    )


def _cm01_oracle_sql() -> str:
    h = _H60.format(x="'cm' || CAST(d AS VARCHAR) || ':' || token")
    return f"""
WITH toks AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM (SELECT unnest({_WORDS}) AS token FROM documents)
  GROUP BY token
), keyed AS (
  SELECT token, true_count, d, ({h}) % {CM_WIDTH} AS b
  FROM toks CROSS JOIN (SELECT unnest(range({CM_DEPTH})) AS d)
), cells AS (
  SELECT d, b, SUM(true_count) AS cell FROM keyed GROUP BY d, b
), top AS (
  SELECT token, true_count FROM toks
  ORDER BY true_count DESC, token LIMIT 10
), probes AS (
  SELECT t.token, t.true_count, k.d, k.b
  FROM top t JOIN keyed k ON t.token = k.token
)
SELECT p.token, p.true_count,
       CAST(MIN(c.cell) AS BIGINT) AS cm_estimate,
       CAST(MIN(c.cell) - p.true_count AS BIGINT) AS overestimate
FROM probes p JOIN cells c ON p.d = c.d AND p.b = c.b
GROUP BY p.token, p.true_count
ORDER BY p.true_count DESC, p.token
"""


# Matryoshka truncation depths (es14): recall of prefix-dim retrieval
# vs the full 64-dim exact ranking.
MRL_DIMS = (16, 32)


def es14_truncated_dim_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Measured recall of PREFIX-TRUNCATED retrieval (the
    Matryoshka-representation trick, Kusupati et al. 2022,
    arXiv:2205.13147): rank the corpus by cosine over only the first
    16 / 32 of 64 dims and measure top-10 overlap with the full-dim
    exact ranking, per query. Truncation is the cheapest ANN there
    is — same scan shape, 4x / 2x less arithmetic and memory
    bandwidth, no index to build — IF the embedding model front-loads
    information; this query measures that 'if' per corpus, the same
    way es11 measures the sign-LSH dial.

    All three rankings (full, d16, d32) use the distributed two-phase
    top-k-per-group (bounded per-partition state, no collect_list) on
    4-dp-rounded cosines with vec_id tie-breaks — total order, so
    partition layout cannot change the answer. One corpus×10-query
    broadcast scan per depth; everything downstream of the scans is
    top-k bounded."""
    from pyspark.sql import Window

    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("__qe")
    )

    def topk(scored, k=10):
        w1 = Window.partitionBy("__pid", "qid").orderBy(
            F.desc("__cos"), F.asc("vec_id")
        )
        w2 = Window.partitionBy("qid").orderBy(
            F.desc("__cos"), F.asc("vec_id")
        )
        return (
            scored.withColumn("__pid", F.spark_partition_id())
            .withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= k)
            .withColumn("__r2", F.row_number().over(w2))
            .filter(F.col("__r2") <= k)
            .select("qid", "vec_id")
        )

    pairs = emb.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("qid")
    )
    exact = topk(
        pairs.select(
            "qid",
            "vec_id",
            sim.cosine(F.col("embedding"), F.col("__qe")).alias("__cos"),
        )
    )
    out = q.select("qid")
    for nd in MRL_DIMS:
        trunc = topk(
            pairs.select(
                "qid",
                "vec_id",
                sim.cosine(
                    F.slice(F.col("embedding"), 1, nd),
                    F.slice(F.col("__qe"), 1, nd),
                ).alias("__cos"),
            )
        )
        hits = (
            exact.join(trunc, ["qid", "vec_id"])
            .groupBy("qid")
            .agg(F.count(F.lit(1)).alias("__h"))
        )
        out = out.join(F.broadcast(hits), "qid", "left").withColumn(
            f"recall_d{nd}",
            F.coalesce(F.col("__h"), F.lit(0)).cast("double") / 10.0,
        ).drop("__h")
    return out.select(
        F.col("qid").alias("query_id"),
        *[F.col(f"recall_d{nd}") for nd in MRL_DIMS],
    ).orderBy("query_id")


def _es14_oracle_sql() -> str:
    def leg(nd: int) -> str:
        a, b = f"e.embedding[1:{nd}]", f"q.qe[1:{nd}]"
        return f"""
sc{nd} AS (
  SELECT q.qid, e.vec_id, {_COS.format(a=a, b=b)} AS c
  FROM embeddings e CROSS JOIN qs q WHERE e.vec_id <> q.qid
), top{nd} AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS r
    FROM sc{nd}) WHERE r <= 10
), hit{nd} AS (
  SELECT x.qid, COUNT(*) AS h
  FROM exact_top x JOIN top{nd} t ON x.qid = t.qid AND x.vec_id = t.vec_id
  GROUP BY x.qid
)"""

    legs = ",".join(leg(nd) for nd in MRL_DIMS)
    sel = ", ".join(
        f"COALESCE(h{nd}.h, 0) / 10.0 AS recall_d{nd}" for nd in MRL_DIMS
    )
    joins = " ".join(
        f"LEFT JOIN hit{nd} h{nd} ON q.qid = h{nd}.qid" for nd in MRL_DIMS
    )
    return f"""
WITH qs AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10
), exact_scored AS (
  SELECT q.qid, e.vec_id,
         {_COS.format(a='e.embedding', b='q.qe')} AS c
  FROM embeddings e CROSS JOIN qs q WHERE e.vec_id <> q.qid
), exact_top AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS r
    FROM exact_scored) WHERE r <= 10
), {legs}
SELECT q.qid AS query_id, {sel}
FROM qs q {joins}
ORDER BY query_id
"""


ROUND7_STAGED_QUERIES.update(
    {
        "cm01_countmin_heavy_hitters": cm01_countmin_heavy_hitters,
        "es14_truncated_dim_recall": es14_truncated_dim_recall,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "cm01_countmin_heavy_hitters": _cm01_oracle_sql(),
        "es14_truncated_dim_recall": _es14_oracle_sql(),
    }
)


# --- round-7 staged surface, wave 14 (tx14, win05, ss05) --------------------


def _bigram_xent_per_doc(spark: SparkSession, sf: str) -> DataFrame:
    """Shared CCNet-style bigram-LM scorer: per-document cross-entropy
    under a corpus-trained add-one-smoothed word-bigram model — ONE
    kernel, two consumers (tx14's worst-20 table, qf05's CCNet
    head/middle/tail buckets), so the model spec cannot fork.

    Returns one row per document with >= 1 bigram:
    (doc_id, lang, source, n_bigrams BIGINT, cross_entropy 6-dp DOUBLE).

    Determinism discipline (ir01/tx09): the per-bigram-TYPE cost
    -log2(p) is computed ONCE in the bounded stats table and rounded
    to 8 dp; per-doc aggregation sums those values as DECIMAL(25,12)
    (order-independent under shuffle) before a 6-dp rounded divide.
    NO transcendental runs on a per-doc aggregate (the win04 lesson:
    cross-engine float determinism is constructed, not hoped for) —
    which is also why cross-entropy, not 2^H perplexity, is the
    certified column.

    Scale: bigram stats are ONE keyed aggregate over the gram stream;
    the vocab size is a 1-row broadcast; scoring joins doc bigrams to
    the stats table on the bigram key — SF-proportional on BOTH sides,
    so no hint (AQE decides; at 100 TB this is a plain shuffle join on
    a well-distributed text key) — then one doc-keyed mean. Nothing
    driver-side, nothing quadratic."""
    from pyspark.sql import Window

    docs = load(spark, sf, "documents").select(
        "doc_id", "lang", "source", tx.words("text").alias("__w")
    )
    big = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(
            F.expr(
                "CASE WHEN size(__w) >= 2 THEN "
                "transform(sequence(1, size(__w) - 1), "
                "i -> struct(element_at(__w, i) AS w1, "
                "element_at(__w, i + 1) AS w2)) "
                "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) "
                "END"
            )
        ).alias("__g"),
    ).select("doc_id", "lang", "source", "__g.w1", "__g.w2")
    vocab = (
        docs.select(F.explode("__w").alias("__t"))
        .agg(F.countDistinct("__t").alias("__v"))
    )
    # r14 REVERT of the r13 per-(doc, bigram) count-frame reduction
    # (counts k + seen-mass k·cost arithmetic): the in-bench A/B
    # (chunked bench contract, plans/r14/ab_runs.jsonl) measures the
    # plain occurrence-stream shape faster on both small consumers
    # (r13 quiet bench had tx14 +56%, qf05 +27% on the count frame).
    # Mechanism — the tx16 batch-4 finding again: bigrams rarely
    # repeat within a doc, so the (doc, bigram)-keyed count frame is
    # nearly occurrence-sized and its extra wide Exchange (doc_id,
    # lang, source, w1, w2) costs more than the map-side re-explode it
    # saves; the stats aggregate reads the occurrence stream through a
    # narrow (w1, w2) shuffle with map-side partial aggregation.
    stats = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("__c12"))
        .withColumn("__ctx", F.sum("__c12").over(Window.partitionBy("w1")))
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log2(
                    (F.col("__c12") + F.lit(1.0))
                    / (F.col("__ctx") + F.col("__v")).cast("double")
                ),
                8,
            ).alias("__cost"),
        )
    )
    return (
        big.join(stats, ["w1", "w2"])
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(F.col("__cost").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("cross_entropy"),
        )
    )


def tx14_bigram_cross_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained word-bigram
    language model — the CCNet-style perplexity quality signal (Wenzek
    et al. 2020, arXiv:1911.00359: documents scoring worst under an LM
    are boilerplate/gibberish and get filtered or bucketed). The model
    is add-one-smoothed p(w2|w1) = (c(w1 w2)+1) / (ctx(w1)+V), with
    ctx(w1) = bigram occurrences starting at w1 and V the distinct
    corpus vocabulary; each doc scores the MEAN -log2 p over its
    bigram instances (length-invariant, the ir01 rule) and the 20
    worst docs surface. Kernel shared with qf05 (the CCNet bucket
    assignment) via _bigram_xent_per_doc — see its docstring for the
    determinism and scale story."""
    return (
        _bigram_xent_per_doc(spark, sf)
        .select("doc_id", "lang", "n_bigrams", "cross_entropy")
        .orderBy(F.desc("cross_entropy"), "doc_id")
        .limit(20)
    )


# The shared bigram-LM per-doc CTE chain (DuckDB side of
# _bigram_xent_per_doc): ends at `xent` = one row per scored doc with
# (doc_id, lang, source, n_bigrams, cross_entropy).
_BIGRAM_XENT_CTE = f"""d AS (
  SELECT doc_id, lang, source, {_WORDS} AS w FROM documents
), big AS (
  SELECT doc_id, lang, source,
         w[CAST(i AS INT)] AS w1, w[CAST(i AS INT)+1] AS w2
  FROM (SELECT doc_id, lang, source, w, unnest(range(1, len(w))) AS i FROM d)
), vocab AS (
  SELECT COUNT(DISTINCT t) AS v
  FROM (SELECT unnest(w) AS t FROM d)
), stats AS (
  SELECT w1, w2,
         ROUND(-log2((COUNT(*) + 1.0)
                     / (SUM(COUNT(*)) OVER (PARTITION BY w1)
                        + (SELECT v FROM vocab))), 8) AS cost
  FROM big GROUP BY w1, w2
), xent AS (
  SELECT b.doc_id, b.lang, b.source,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         ROUND(CAST(SUM(CAST(s.cost AS DECIMAL(25,12))) AS DOUBLE)
               / COUNT(*), 6) AS cross_entropy
  FROM big b JOIN stats s ON b.w1 = s.w1 AND b.w2 = s.w2
  GROUP BY b.doc_id, b.lang, b.source
)"""

_TX14_ORACLE = f"""
WITH {_BIGRAM_XENT_CTE}
SELECT doc_id, lang, n_bigrams, cross_entropy
FROM xent
ORDER BY cross_entropy DESC, doc_id LIMIT 20
"""


def win05_activity_streaks(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-active-day streaks via
    the classic day − row_number() island key — the canonical hard
    SQL shape for session/streak analytics that no single window
    function expresses directly. Output per user: active days, number
    of distinct streaks, and the longest streak.

    Scale: the distinct (user, day) reduce collapses the event stream
    FIRST (bounded by users × days, orders of magnitude below event
    volume); the row_number window partitions BY USER — its frame is
    one user's distinct days, bounded by the calendar, never by event
    volume — and the island rollup is two keyed aggregates. All
    arithmetic is integer/date; nothing floats."""
    days = (
        load(spark, sf, "events")
        .select("user_id", F.to_date("ts").alias("__day"))
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("__day")
    islands = (
        days.withColumn("__rn", F.row_number().over(w))
        .withColumn("__grp", F.date_sub(F.col("__day"), F.col("__rn")))
        .groupBy("user_id", "__grp")
        .agg(F.count(F.lit(1)).alias("__len"))
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.sum("__len").cast("bigint").alias("n_active_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.max("__len").cast("bigint").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


_WIN05_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), r AS (
  SELECT user_id, day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM days
), isl AS (
  SELECT user_id, day - CAST(rn AS INT) AS grp, COUNT(*) AS len
  FROM r GROUP BY user_id, grp
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak
FROM isl GROUP BY user_id ORDER BY user_id
"""


SS05_SHARDS = int(_os.environ.get("SPARK_GRAFT_SS05_SHARDS", "16"))


def ss05_shard_balance_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic output-shard assignment + balance audit — the
    write-side layout op training-data prep ends with: every doc maps
    to shard = hash(doc_id) mod S (reproducible, growth-stable, no
    global sort, no RNG), and the audit reports per-shard doc count,
    token mass, and byte mass plus each shard's load relative to the
    uniform share — the number that tells you whether the hash is
    balanced BEFORE 1000 writers start.

    Scale: assignment is a row-local expression (zero shuffle); the
    audit is ONE S-row aggregate; rel_load divides by a 1-row
    broadcast total (the A10 pattern). Exact-integer masses; the only
    division is 6-dp rounded on two exact integers."""
    docs = load(spark, sf, "documents").select(
        (dd.hash60(F.col("doc_id").cast("string")) % SS05_SHARDS).alias(
            "shard"
        ),
        F.size(tx.words("text")).cast("bigint").alias("__toks"),
        F.col("n_chars").cast("bigint").alias("__chars"),
    )
    per = docs.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__toks").cast("bigint").alias("token_mass"),
        F.sum("__chars").cast("bigint").alias("char_mass"),
    )
    tot = per.agg(F.sum("n_docs").alias("__t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "token_mass",
            "char_mass",
            F.round(
                F.col("n_docs").cast("double")
                * F.lit(float(SS05_SHARDS))
                / F.col("__t"),
                6,
            ).alias("rel_load"),
        )
        .orderBy("shard")
    )


_SS05_ORACLE = f"""
WITH assigned AS (
  SELECT ({_H60.format(x="CAST(doc_id AS VARCHAR)")}) % {SS05_SHARDS}
           AS shard,
         len({_WORDS}) AS toks, n_chars
  FROM documents
), per AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(toks) AS BIGINT) AS token_mass,
         CAST(SUM(n_chars) AS BIGINT) AS char_mass
  FROM assigned GROUP BY shard
)
SELECT shard, n_docs, token_mass, char_mass,
       ROUND(CAST(n_docs AS DOUBLE) * {float(SS05_SHARDS)}
             / (SELECT SUM(n_docs) FROM per), 6) AS rel_load
FROM per ORDER BY shard
"""


ROUND7_STAGED_QUERIES.update(
    {
        "tx14_bigram_cross_entropy": tx14_bigram_cross_entropy,
        "win05_activity_streaks": win05_activity_streaks,
        "ss05_shard_balance_audit": ss05_shard_balance_audit,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "tx14_bigram_cross_entropy": _TX14_ORACLE,
        "win05_activity_streaks": _WIN05_ORACLE,
        "ss05_shard_balance_audit": _SS05_ORACLE,
    }
)


# --- round-7 staged surface, wave 15 (es15 JL random projection) ------------

JL_OUT_DIMS = 16
JL_IN_DIMS = 64


def _jl_sign(j: int, i: int) -> float:
    """Deterministic ±1 from the library's md5 hash family — the
    projection matrix is a pure function of (row, col), so Spark and
    the oracle inline IDENTICAL literals and nothing is 'random' at
    certification time (a production run would seed differently per
    corpus version; determinism-by-construction is the contract)."""
    import hashlib

    h = hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()
    return 1.0 if int(h[0], 16) % 2 == 0 else -1.0


_JL_MATRIX = [
    [_jl_sign(j, i) for i in range(JL_IN_DIMS)] for j in range(JL_OUT_DIMS)
]


def es15_jl_projection_qc(spark: SparkSession, sf: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection + distortion QC: project
    64-dim embeddings to 16 dims through a deterministic ±1/sqrt(k)
    sign matrix (Achlioptas 2003 — database-friendly random
    projections; the JL lemma bounds pairwise-distance distortion, and
    THIS query measures it on 20 consecutive-id pairs: projected
    distance over original distance, per pair). Next to es14's prefix
    truncation this is the model-free reduction — it needs no
    assumption that the embedding front-loads information, at the cost
    of a dense matrix multiply per row.

    Scale: projection is ROW-LOCAL map work (d·k multiply-adds per
    vector, zero shuffle — the entire point; at 100 TB the 16-dim
    output is what you persist and index, cutting ANN scan cost 4x),
    and the matrix itself is inline literal metadata. Distances use
    the library's certified sequential-fold construction (same index
    order in both engines, 4-dp rounds at output only); the pair join
    is an equi-join on vec_id+1."""
    emb = load(spark, sf, "embeddings")
    scale = 1.0 / (JL_OUT_DIMS ** 0.5)
    proj = F.array(
        *[
            (
                F.aggregate(
                    F.zip_with(
                        F.col("embedding"),
                        F.array(*[F.lit(v) for v in _JL_MATRIX[j]]),
                        lambda x, m: x.cast("double") * m,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                * F.lit(scale)
            ).alias(f"y{j}")
            for j in range(JL_OUT_DIMS)
        ]
    )
    p = emb.filter(F.col("vec_id") < 41).select(
        "vec_id", F.col("embedding").alias("__x"), proj.alias("__y")
    )
    a = p.select(
        F.col("vec_id").alias("id_a"),
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
    )
    b = p.select(
        (F.col("vec_id") - 1).alias("id_a"),
        F.col("vec_id").alias("id_b"),
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
    )

    def edist(u, v):
        return F.sqrt(
            F.aggregate(
                F.zip_with(
                    u, v, lambda s, t: (s.cast("double") - t.cast("double"))
                    * (s.cast("double") - t.cast("double"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    return (
        a.join(b, "id_a")
        .filter(F.col("id_a") % 2 == 0)
        .select(
            "id_a",
            "id_b",
            F.round(edist(F.col("__xa"), F.col("__xb")), 4).alias("d_full"),
            F.round(edist(F.col("__ya"), F.col("__yb")), 4).alias("d_proj"),
            F.round(
                edist(F.col("__ya"), F.col("__yb"))
                / F.nullif(edist(F.col("__xa"), F.col("__xb")), F.lit(0.0)),
                4,
            ).alias("distortion"),
        )
        .orderBy("id_a")
    )


def _es15_oracle_sql() -> str:
    scale = 1.0 / (JL_OUT_DIMS ** 0.5)
    rows = []
    for j in range(JL_OUT_DIMS):
        lits = ", ".join(str(v) for v in _JL_MATRIX[j])
        rows.append(
            f"list_sum(list_transform(range(1, {JL_IN_DIMS} + 1), "
            f"i -> CAST(embedding[i] AS DOUBLE) "
            f"* ([{lits}]::DOUBLE[])[i])) * {scale}"
        )
    ycols = ", ".join(f"({r}) AS y{j}" for j, r in enumerate(rows))
    ylist = "[" + ", ".join(f"y{j}" for j in range(JL_OUT_DIMS)) + "]"
    dfull = (
        "sqrt(list_sum(list_transform(range(1, 65), "
        "i -> (CAST(a.x[i] AS DOUBLE) - CAST(b.x[i] AS DOUBLE)) "
        "* (CAST(a.x[i] AS DOUBLE) - CAST(b.x[i] AS DOUBLE)))))"
    )
    dproj = (
        f"sqrt(list_sum(list_transform(range(1, {JL_OUT_DIMS} + 1), "
        "i -> (a.y[i] - b.y[i]) * (a.y[i] - b.y[i]))))"
    )
    return f"""
WITH proj AS (
  SELECT vec_id, embedding AS x, {ycols}
  FROM embeddings WHERE vec_id < 41
), p AS (
  SELECT vec_id, x, {ylist} AS y FROM proj
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({dfull}, 4) AS d_full,
       ROUND({dproj}, 4) AS d_proj,
       ROUND({dproj} / NULLIF({dfull}, 0.0), 4) AS distortion
FROM p a JOIN p b ON b.vec_id = a.vec_id + 1
WHERE a.vec_id % 2 = 0
ORDER BY id_a
"""


ROUND7_STAGED_QUERIES["es15_jl_projection_qc"] = es15_jl_projection_qc
ROUND7_STAGED_ORACLE["es15_jl_projection_qc"] = _es15_oracle_sql()


# --- round-7 staged surface, wave 16 (mm06 media payload dedup) -------------


def mm06_payload_dedup_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Byte-level media payload dedup audit — the FIRST pass of any
    multimodal dedup pipeline: before perceptual hashing or embedding
    similarity, byte-identical payloads (same image fetched twice,
    mirrored CDN copies) collapse on a content hash. The corpus is
    replayed under a deterministic re-crawl (every media_id % 17 == 0
    payload delivered twice — the multi-snapshot ingest shape), and
    the audit reports, per source: delivered payloads, distinct
    payloads by md5(content), duplicate deliveries, and byte mass —
    the exact numbers an ingest monitor alarms on.

    The hash runs on the BINARY content column (the real multimodal
    schema — utf-8 bytes here, JPEG bytes in production; the
    Spark-side plumbing is identical), row-locally: zero shuffle until
    the two bounded keyed aggregates (source×hash distinct-reduce,
    then source rollup). At 100 TB this is the cheapest dedup there
    is — one hash per payload, one shuffle on the hash."""
    media = documents_as_media(load(spark, sf, "documents"))
    delivered = media.unionByName(
        media.filter(F.col("media_id") % 17 == 0)
    )
    hashed = delivered.select(
        "source",
        F.md5(F.col("content")).alias("__h"),
        F.length(F.col("content")).cast("bigint").alias("__bytes"),
    )
    return (
        hashed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_delivered"),
            F.countDistinct("__h").cast("bigint").alias("n_distinct_payloads"),
            (F.count(F.lit(1)) - F.countDistinct("__h"))
            .cast("bigint")
            .alias("n_dup_deliveries"),
            F.sum("__bytes").cast("bigint").alias("byte_mass"),
        )
        .orderBy("source")
    )


# DuckDB md5 is VARCHAR-only; md5(text) over utf-8 VARCHAR hashes the
# SAME bytes Spark's md5(encode(text, 'utf-8')) does, so the twin is
# exact by construction.
_MM06_ORACLE = """
WITH delivered AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT source, text FROM documents WHERE doc_id % 17 = 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_delivered,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_payloads,
       CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
         AS n_dup_deliveries,
       CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS byte_mass
FROM delivered
GROUP BY source ORDER BY source
"""


ROUND7_STAGED_QUERIES["mm06_payload_dedup_audit"] = mm06_payload_dedup_audit
ROUND7_STAGED_ORACLE["mm06_payload_dedup_audit"] = _MM06_ORACLE


def _register_staged_streaming_wave17() -> None:
    """st13 lives with the streaming family (streaming/queries.py),
    same discipline as st11/st12's registrations above."""
    from ..streaming.queries import (
        ST13_STAGED_ORACLE,
        st13_left_outer_attribution,
    )

    ROUND7_STAGED_QUERIES["st13_left_outer_attribution"] = (
        st13_left_outer_attribution
    )
    ROUND7_STAGED_ORACLE["st13_left_outer_attribution"] = ST13_STAGED_ORACLE


_register_staged_streaming_wave17()


# --- round-7 staged surface, wave 18 (fz01, pa01, ii01, rs01, cr01, win06) --


def fz01_fuzzy_name_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Entity-resolution candidate pairs over the part-name vocabulary:
    blocked fuzzy self-join with exact Levenshtein edit distance — the
    record-linkage primitive (Fellegi-Sunter blocking + string-metric
    compare) every catalog/entity-dedup pipeline runs before training
    on product or entity data.

    Scale design (the dd11/ct01 discipline, in order):
    1. DISTINCT-REDUCE first: the quadratic runs over the NAME
       VOCABULARY (64 names at sf0.01), never the row stream (2,000
       parts) — a 100 TB catalog has millions of rows but a far
       smaller name dictionary, and the reduce is one keyed aggregate
       that also carries each name's support count.
    2. BLOCK, never all-pairs: candidates come from an equi-join on a
       cheap blocking key (the head noun — last token), so comparisons
       are bounded by the squared block sizes, not vocabulary². A
       skewed block at scale is refined by compounding the key
       (first-char + length band), exactly like dd11 refines its
       prefix lists; the blocking key choice is the recall/cost dial.
    3. Exact integer metric ONLY on candidates: levenshtein() is
       JVM-side codegen, integer-exact in both engines, so the
       certified output has no float anywhere.
    Emits the 25 closest pairs (distance, then lexicographic) with
    each side's support count — the review queue an ER pipeline hands
    to its merge stage."""
    names = (
        load(spark, sf, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("__noun", F.element_at(F.split("p_name", " "), -1))
        .filter(F.col("__noun").isNotNull() & (F.col("__noun") != ""))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        F.col("__noun").alias("__blk"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
        F.col("__noun").alias("__blk"),
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("lev_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("lev_dist") <= 4)
        .select("name_a", "name_b", "lev_dist", "n_parts_a", "n_parts_b")
        .orderBy("lev_dist", "name_a", "name_b")
        .limit(25)
    )


_FZ01_ORACLE = """
WITH names AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
         split_part(p_name, ' ', -1) AS blk
  FROM part GROUP BY p_name
  HAVING split_part(p_name, ' ', -1) IS NOT NULL
     AND split_part(p_name, ' ', -1) <> ''
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev_dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 4
ORDER BY lev_dist, name_a, name_b
LIMIT 25
"""


def pa01_k_anonymity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit over the customer table's quasi-identifiers
    (market segment × nation × account-balance band) — the standard
    privacy pre-release check (Sweeney 2002): how many rows sit in
    equivalence classes smaller than the k threshold, i.e. are
    re-identifiable by the QID combination alone.

    ONE groupBy over the QID tuple gives every class's size k; a
    second TINY aggregate (input = one row per class, bounded by the
    QID value space, not the corpus) bands the classes into the audit
    report. The balance band uses FLOOR(bal/1000) — both engines run
    the identical IEEE divide on identical doubles, so the band edges
    are bit-stable. Nothing here is corpus-quadratic and the report is
    O(4) rows regardless of scale; at 100 TB the only cost is the one
    QID shuffle, which map-side combines."""
    classes = (
        load(spark, sf, "customer")
        .groupBy(
            "c_mktsegment",
            "c_nationkey",
            F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("__band"),
        )
        .agg(F.count(F.lit(1)).alias("__k"))
    )
    band = (
        F.when(F.col("__k") == 1, F.lit("1 unique"))
        .when(F.col("__k") <= 4, F.lit("2 k in 2-4"))
        .when(F.col("__k") <= 9, F.lit("3 k in 5-9"))
        .otherwise(F.lit("4 k >= 10"))
    )
    return (
        classes.select(band.alias("k_band"), "__k")
        .groupBy("k_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("__k").cast("bigint").alias("n_rows"),
            F.min("__k").cast("bigint").alias("min_k"),
            F.max("__k").cast("bigint").alias("max_k"),
        )
        .orderBy("k_band")
    )


_PA01_ORACLE = """
WITH classes AS (
  SELECT c_mktsegment, c_nationkey,
         FLOOR(c_acctbal / 1000.0) AS band,
         COUNT(*) AS k
  FROM customer GROUP BY 1, 2, 3
), banded AS (
  SELECT CASE WHEN k = 1 THEN '1 unique'
              WHEN k <= 4 THEN '2 k in 2-4'
              WHEN k <= 9 THEN '3 k in 5-9'
              ELSE '4 k >= 10' END AS k_band,
         k
  FROM classes
)
SELECT k_band,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM banded GROUP BY k_band ORDER BY k_band
"""


def ii01_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted-index head: the 20 highest-document-frequency terms
    with their df, total tf, and the first 10 postings (doc_ids,
    ascending) — the build step of every retrieval/contamination index
    over a training corpus.

    ONE explode feeds ONE (term, doc_id) aggregate that yields BOTH
    statistics (df = COUNT(*), tf = SUM(per-doc count)) — never two
    passes over the token stream. Posting lists are materialized ONLY
    for the 20 selected terms (a bounded-by-construction broadcast —
    the LIMIT is the bound, so the hint is legitimate under the
    AQE-decides convention) and each is cut to its first 10 postings
    by a per-term rank BEFORE collect_list, so no task ever holds an
    unbounded hot-term posting list: at 100 TB a stopword's full list
    is millions of ids, but this plan never builds it."""
    from pyspark.sql import Window

    per_doc = (
        _docs_words(spark, sf)
        .select("doc_id", F.explode("__words").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    top = (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("__c").cast("bigint").alias("tf"),
        )
        .orderBy(F.desc("df"), "term")
        .limit(20)
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    return (
        per_doc.join(F.broadcast(top), "term")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= 10)
        .groupBy("term", "df", "tf")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("top_docs")
        )
        .orderBy(F.desc("df"), "term")
    )


_II01_ORACLE = f"""
WITH w AS (
  SELECT doc_id, unnest({_WORDS}) AS term FROM documents
), c AS (
  SELECT term, doc_id, COUNT(*) AS c FROM w GROUP BY 1, 2
), t AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(c) AS BIGINT) AS tf
  FROM c GROUP BY term
), top AS (
  SELECT * FROM t ORDER BY df DESC, term LIMIT 20
), p AS (
  SELECT c.term, c.doc_id,
         ROW_NUMBER() OVER (PARTITION BY c.term ORDER BY c.doc_id) AS rk
  FROM c JOIN top USING (term)
)
SELECT term, df, tf,
       array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ',')
         AS top_docs
FROM p JOIN top USING (term)
WHERE rk <= 10
GROUP BY term, df, tf
ORDER BY df DESC, term
"""


def rs01_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust per-group outlier screen: exact median, exact MAD
    (median absolute deviation), and the count of |x − med| > 3·MAD
    rows per event type — the robust-statistics quality gate (median ±
    k·MAD resists the very outliers a mean ± k·σ gate is dragged by).

    Determinism is constructed, not hoped for (the win04 rule): both
    medians come from the SAME rank algebra in both engines —
    row_number over the value order, the (n+1) DIV 2 / n DIV 2 + 1
    middle ranks, AVG over the one or two selected rows — so the
    engines pick the same values and fold them identically ((a+b)/2 is
    an exact power-of-two scale). Ties in value are harmless: the
    r-th smallest VALUE is tie-permutation-invariant. The 3·MAD
    compare runs on the unrounded double; rounding happens once, at
    output.

    Scale: an exact per-group median requires ordering each group —
    the same work ANY engine's percentile_cont does. Here it is two
    window sorts over range-partitioned groups (Spark's WindowExec
    spills, so a hot group degrades to disk, not OOM). This operator
    is the exact SPECIFICATION; the 100 TB operating path swaps in the
    two-phase rank kernel (operators/quantile.py, q38) per group or a
    mergeable sketch (hq01) once groups stop fitting a sort — the gate
    certifies the spec those approximations are measured against."""
    from pyspark.sql import Window

    ev = (
        load(spark, sf, "events")
        .select("event_type", F.col("value").cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
    )

    def _group_median(df: DataFrame, col: str) -> DataFrame:
        wo = Window.partitionBy("event_type").orderBy(col)
        wp = Window.partitionBy("event_type")
        ranked = df.withColumn("__rk", F.row_number().over(wo)).withColumn(
            "__n", F.count(F.lit(1)).over(wp)
        )
        return (
            ranked.filter(
                (F.col("__rk") == F.expr("(__n + 1) div 2"))
                | (F.col("__rk") == F.expr("__n div 2 + 1"))
            )
            .groupBy("event_type")
            .agg(F.avg(col).alias("__med"))
        )

    med = _group_median(ev, "__v")
    dev = ev.join(med, "event_type").withColumn(
        "__d", F.abs(F.col("__v") - F.col("__med"))
    )
    mad = _group_median(dev.select("event_type", F.col("__d").alias("__v")), "__v")
    mad = mad.select("event_type", F.col("__med").alias("__mad"))
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.first("__med"), 6).alias("median"),
            F.round(F.first("__mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("__d") > F.lit(3.0) * F.col("__mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_RS01_ORACLE = """
WITH e AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL
), r1 AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e
), m AS (
  SELECT event_type, AVG(v) AS med
  FROM r1 WHERE rk = (n + 1) // 2 OR rk = n // 2 + 1
  GROUP BY event_type
), d AS (
  SELECT e.event_type, e.v, ABS(e.v - m.med) AS dev, m.med
  FROM e JOIN m USING (event_type)
), r2 AS (
  SELECT event_type, dev,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
), md AS (
  SELECT event_type, AVG(dev) AS mad
  FROM r2 WHERE rk = (n + 1) // 2 OR rk = n // 2 + 1
  GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(ANY_VALUE(d.med), 6) AS median,
       ROUND(ANY_VALUE(md.mad), 6) AS mad,
       CAST(SUM(CASE WHEN d.dev > 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM d JOIN md USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


def cr01_value_time_correlation(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type Pearson correlation between the event value and
    its second-of-day — the drift/QA companion to ks01/cs01/psi01: a
    nonzero value↔time-of-day correlation is the classic symptom of a
    time-sliced corpus whose labels leak collection time.

    Determinism by construction (the ir01/tx09 rule): the five
    sufficient statistics (Σx, Σy, Σx², Σy², Σxy) are EXACT decimal
    sums — x is an integer second-of-day, y the established
    DECIMAL(18,2) cast of value, every product a bounded decimal — so
    the shuffle order cannot move a bit. Each sum converts to double
    ONCE, and both engines then evaluate the IDENTICAL closed-form
    expression (IEEE sqrt is correctly rounded, unlike log/exp, so it
    is cross-engine safe); one ROUND at output. NULL-variance groups
    yield NULL via NULLIF, not a crash.

    Scale: ONE map-side-combinable aggregate over the fact stream —
    the textbook streaming-moments shape; the report is O(#types)."""
    ev = load(spark, sf, "events").filter(F.col("value").isNotNull())
    x = (
        F.hour("ts") * F.lit(3600) + F.minute("ts") * F.lit(60) + F.second("ts")
    ).cast("decimal(12,0)")
    y = F.col("value").cast("decimal(12,2)")
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy")),
        F.lit(0.0),
    )
    return (
        sums.select(
            "event_type",
            "n",
            F.round(corr, 6).alias("value_time_corr"),
        )
        .orderBy("event_type")
    )


_CR01_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST(date_part('hour', ts) * 3600 + date_part('minute', ts) * 60
              + date_part('second', ts) AS DECIMAL(12,0)) AS x,
         CAST(value AS DECIMAL(12,2)) AS y
  FROM events WHERE value IS NOT NULL
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy
  FROM e GROUP BY event_type
)
SELECT event_type, n,
       ROUND(
         (CAST(n AS DOUBLE) * sxy - sx * sy)
         / NULLIF(SQRT(CAST(n AS DOUBLE) * sxx - sx * sx)
                  * SQRT(CAST(n AS DOUBLE) * syy - sy * sy), 0.0),
         6
       ) AS value_time_corr
FROM s ORDER BY event_type
"""


def win06_daily_ohlc(spark: SparkSession, sf: str) -> DataFrame:
    """Daily OHLC (open/high/low/close) rollup per event type — the
    hypertable/time-bucket downsampling shape every time-series store
    ships (TimescaleDB time_bucket + first/last, InfluxDB aggregate
    windows), expressed as ONE Spark aggregate.

    Open/close are argmin/argmax over the (ts, event_id) struct
    comparator — the win03 pattern: min_by/max_by with the tie rule
    INSIDE the comparator, one map-side-combinable aggregate, no
    per-group window sort, certified against the textbook ROW_NUMBER
    oracle. event_id breaks equal-timestamp ties deterministically in
    both engines.

    Scale: time-bucketed keys are naturally high-cardinality and
    unskewed (every day × type is its own group), partial aggregation
    collapses each task's contribution to one row per open bucket, and
    the plan is a single shuffle — the same rollup at 100 TB is the
    canonical downsample job, and min_by carries O(1) state per group
    where the window form sorts whole partitions."""
    ev = load(spark, sf, "events").filter(F.col("value").isNotNull())
    return (
        ev.groupBy(
            # midnight TIMESTAMP, the certified spine-column convention
            # (win02/win04): pandas keeps date objects as dtype=object,
            # which the driver hasher serializes differently from
            # DuckDB's datetime64
            F.to_date("ts").cast("timestamp").alias("day"),
            "event_type",
        )
        .agg(
            F.expr("min_by(value, struct(ts, event_id))").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr("max_by(value, struct(ts, event_id))").alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .orderBy("event_type", "day")
    )


_WIN06_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, ts, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rk_open,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rk_close
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, day,
       MAX(CASE WHEN rk_open = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rk_close = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM e GROUP BY event_type, day
ORDER BY event_type, day
"""


ROUND7_STAGED_QUERIES.update(
    {
        "fz01_fuzzy_name_pairs": fz01_fuzzy_name_pairs,
        "pa01_k_anonymity_audit": pa01_k_anonymity_audit,
        "ii01_inverted_index": ii01_inverted_index,
        "rs01_mad_outliers": rs01_mad_outliers,
        "cr01_value_time_correlation": cr01_value_time_correlation,
        "win06_daily_ohlc": win06_daily_ohlc,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "fz01_fuzzy_name_pairs": _FZ01_ORACLE,
        "pa01_k_anonymity_audit": _PA01_ORACLE,
        "ii01_inverted_index": _II01_ORACLE,
        "rs01_mad_outliers": _RS01_ORACLE,
        "cr01_value_time_correlation": _CR01_ORACLE,
        "win06_daily_ohlc": _WIN06_ORACLE,
    }
)


# --- round-7 staged surface, wave 19 (q59, tx15, pa02) ----------------------


def q59_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change) — the LAST of the 22
    classic TPC-H query shapes, closing the set: a pure scan-filter-
    aggregate with a date range, a numeric band, and a quantity cap,
    returning ONE row of SUM(extendedprice * discount).

    Deliberately join-free: Q6 exists to measure predicate pushdown and
    scan throughput. All three predicates reach the parquet scan
    (PushedFilters), the sum is decimal-exact and map-side-combinable,
    and the answer leaves the cluster as a single row — at 100 TB this
    is the I/O-bound probe query whose plan must stay a bare
    scan→partial-agg→final-agg chain."""
    li = load(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        )
    )


_Q59_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def tx15_heaps_vocab_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Heap's-law vocabulary growth curve: distinct vocabulary size as
    a function of corpus prefix (doc_id order), in corpus deciles — the
    saturation diagnostic a tokenizer/dedup planner reads before
    deciding whether more data still buys new vocabulary.

    The curve needs NO sequential scan: a term's contribution to the
    prefix-vocabulary is fully determined by its FIRST occurrence, so
    ONE (term → MIN(doc_id)) aggregate over the exploded stream,
    bucketed into deciles and cumulative-summed over the 10-row
    rollup, reconstructs the whole growth curve. The corpus size is a
    1-row broadcast (bounded by construction). At 100 TB this is one
    keyed shuffle over the token stream — same cost class as tx06 —
    and the window runs on 10 rows."""
    from pyspark.sql import Window

    tot = load(spark, sf, "documents").agg(
        F.count(F.lit(1)).alias("__n")
    )
    first_seen = (
        _docs_words(spark, sf)
        .select("doc_id", F.explode("__words").alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("__first"))
    )
    per_decile = (
        first_seen.crossJoin(F.broadcast(tot))
        .select(
            # FLOOR, not a bigint cast: DuckDB CAST(double AS BIGINT)
            # ROUNDS while Spark truncates — FLOOR is the one spelling
            # with identical semantics in both engines
            F.least(
                F.lit(9).cast("bigint"),
                F.floor(F.col("__first") * 10 / F.col("__n")),
            ).alias("decile")
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_terms"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_decile.withColumn(
            "cum_vocab", F.sum("new_terms").over(w).cast("bigint")
        )
        .orderBy("decile")
    )


_TX15_ORACLE = f"""
WITH tot AS (
  SELECT COUNT(*) AS n FROM documents
), w AS (
  SELECT doc_id, unnest({_WORDS}) AS term FROM documents
), first_seen AS (
  SELECT term, MIN(doc_id) AS first FROM w GROUP BY term
), per_decile AS (
  SELECT LEAST(9, CAST(FLOOR(first * 10 / n) AS BIGINT)) AS decile,
         CAST(COUNT(*) AS BIGINT) AS new_terms
  FROM first_seen CROSS JOIN tot
  GROUP BY 1
)
SELECT decile, new_terms,
       CAST(SUM(new_terms) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_vocab
FROM per_decile ORDER BY decile
"""


def pa02_l_diversity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — pa01's
    companion: k-anonymity bounds class SIZE, but a class whose
    sensitive attribute is uniform still leaks it; l-diversity counts
    DISTINCT sensitive values per quasi-identifier class. QIDs here
    are (nation, balance band), the sensitive attribute is the market
    segment; the report histograms classes by their l.

    Two map-side-combinable aggregates — (QID, sensitive) distinct-
    reduce, then COUNT(*) per QID class — and an O(#distinct-l)-row
    rollup; class sizes ride along from a sibling aggregate on the
    same shuffle key. Nothing scales with corpus rows except the two
    keyed shuffles."""
    cust = load(spark, sf, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("__band"),
        "c_mktsegment",
    )
    l_per_class = (
        cust.groupBy("c_nationkey", "__band")
        .agg(
            F.countDistinct("c_mktsegment").alias("__l"),
            F.count(F.lit(1)).alias("__k"),
        )
    )
    return (
        l_per_class.groupBy(F.col("__l").cast("bigint").alias("l_distinct"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("__k").cast("bigint").alias("n_rows"),
            F.min("__k").cast("bigint").alias("min_k"),
            F.max("__k").cast("bigint").alias("max_k"),
        )
        .orderBy("l_distinct")
    )


_PA02_ORACLE = """
WITH classes AS (
  SELECT c_nationkey, FLOOR(c_acctbal / 1000.0) AS band,
         COUNT(DISTINCT c_mktsegment) AS l, COUNT(*) AS k
  FROM customer GROUP BY 1, 2
)
SELECT CAST(l AS BIGINT) AS l_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM classes GROUP BY l ORDER BY l_distinct
"""


ROUND7_STAGED_QUERIES.update(
    {
        "q59_forecast_revenue": q59_forecast_revenue,
        "tx15_heaps_vocab_growth": tx15_heaps_vocab_growth,
        "pa02_l_diversity_audit": pa02_l_diversity_audit,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "q59_forecast_revenue": _Q59_ORACLE,
        "tx15_heaps_vocab_growth": _TX15_ORACLE,
        "pa02_l_diversity_audit": _PA02_ORACLE,
    }
)


# --- round-7 staged surface, wave 20 (st14) ---------------------------------


def _register_staged_streaming_wave20() -> None:
    """st14 lives with the streaming family (streaming/queries.py),
    same discipline as st11-st13's registrations above."""
    from ..streaming.queries import ST14_STAGED_ORACLE, st14_content_dedup

    ROUND7_STAGED_QUERIES["st14_content_dedup"] = st14_content_dedup
    ROUND7_STAGED_ORACLE["st14_content_dedup"] = ST14_STAGED_ORACLE


_register_staged_streaming_wave20()


# --- round-7 staged surface, wave 21 (hq02, inc03) --------------------------


def hq02_mergeable_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Histogram-sketch MERGEABILITY certification — the property that
    makes hq01 a 100 TB operator: two disjoint batch histograms merged
    CELL-WISE must answer quantiles identically to the full-corpus
    histogram (what cm01 certifies for Count-Min, certified here for
    quantiles). The corpus splits on event_id parity (growth-stable,
    like ss03's bands); each half builds hq01's fixed-width (type, bin)
    histogram; the merge is one full-outer coalesce-sum on the bin key;
    the quantile read-off is hq01's cumulative crossing rule, run on
    the MERGED cells AND on the direct full-corpus cells, both emitted
    side by side with an equality flag.

    The flag is mathematically always true (integer cell addition is
    associative) — which is the point: the certified output PROVES the
    merge path, the invariant test pins all-true, and a future edit
    that breaks mergeability (a non-additive cell statistic, a
    float bin edge) flips a hash-certified column. Scale: histograms
    are bounded metadata (≤512 bins × #types); per-batch builds
    map-side combine; the merge shuffles cells, not events."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select(
        "event_type",
        "event_id",
        F.least(F.floor(F.col("value")).cast("int"), F.lit(511)).alias(
            "__bin"
        ),
    )

    def _hist(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy("event_type", "__bin").agg(
            F.count(F.lit(1)).alias(out)
        )

    ha = _hist(ev.filter(F.col("event_id") % 2 == 0), "__ca")
    hb = _hist(ev.filter(F.col("event_id") % 2 == 1), "__cb")
    merged = (
        ha.join(hb, ["event_type", "__bin"], "full_outer")
        .select(
            "event_type",
            "__bin",
            (
                F.coalesce(F.col("__ca"), F.lit(0))
                + F.coalesce(F.col("__cb"), F.lit(0))
            ).alias("__c"),
        )
    )
    full = _hist(ev, "__c")

    def _quantiles(hist: DataFrame, prefix: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy("__bin")
        cum = hist.withColumn("__cum", F.sum("__c").over(w)).withColumn(
            "__n", F.sum("__c").over(Window.partitionBy("event_type"))
        )
        pick = lambda p: F.min(  # noqa: E731 — hq01's crossing rule
            F.when(
                F.col("__cum") >= F.ceil(F.col("__n") * F.lit(p)),
                F.col("__bin"),
            )
        )
        return cum.groupBy("event_type").agg(
            F.max("__n").cast("bigint").alias(f"{prefix}_n"),
            pick(0.50).cast("int").alias(f"{prefix}_p50"),
            pick(0.95).cast("int").alias(f"{prefix}_p95"),
            pick(0.99).cast("int").alias(f"{prefix}_p99"),
        )

    m = _quantiles(merged, "merged")
    f = _quantiles(full, "full")
    return (
        m.join(f, "event_type")
        .select(
            "event_type",
            "merged_n",
            "merged_p50",
            "merged_p95",
            "merged_p99",
            "full_p50",
            "full_p95",
            "full_p99",
            (
                (F.col("merged_n") == F.col("full_n"))
                & (F.col("merged_p50") == F.col("full_p50"))
                & (F.col("merged_p95") == F.col("full_p95"))
                & (F.col("merged_p99") == F.col("full_p99"))
            ).alias("merge_exact"),
        )
        .orderBy("event_type")
    )


_HQ02_ORACLE = """
WITH b AS (
  SELECT event_type, event_id,
         LEAST(CAST(FLOOR(value) AS INT), 511) AS bin
  FROM events
), ha AS (
  SELECT event_type, bin, COUNT(*) AS c FROM b
  WHERE event_id % 2 = 0 GROUP BY 1, 2
), hb AS (
  SELECT event_type, bin, COUNT(*) AS c FROM b
  WHERE event_id % 2 = 1 GROUP BY 1, 2
), merged AS (
  SELECT COALESCE(ha.event_type, hb.event_type) AS event_type,
         COALESCE(ha.bin, hb.bin) AS bin,
         COALESCE(ha.c, 0) + COALESCE(hb.c, 0) AS c
  FROM ha FULL OUTER JOIN hb
    ON ha.event_type = hb.event_type AND ha.bin = hb.bin
), full_h AS (
  SELECT event_type, bin, COUNT(*) AS c FROM b GROUP BY 1, 2
), mq AS (
  SELECT event_type,
         CAST(MAX(n) AS BIGINT) AS merged_n,
         CAST(MIN(CASE WHEN cm >= CEIL(n * 0.50) THEN bin END) AS INT) AS merged_p50,
         CAST(MIN(CASE WHEN cm >= CEIL(n * 0.95) THEN bin END) AS INT) AS merged_p95,
         CAST(MIN(CASE WHEN cm >= CEIL(n * 0.99) THEN bin END) AS INT) AS merged_p99
  FROM (
    SELECT event_type, bin, c,
           SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cm,
           SUM(c) OVER (PARTITION BY event_type) AS n
    FROM merged
  ) GROUP BY event_type
), fq AS (
  SELECT event_type,
         CAST(MAX(n) AS BIGINT) AS full_n,
         CAST(MIN(CASE WHEN cm >= CEIL(n * 0.50) THEN bin END) AS INT) AS full_p50,
         CAST(MIN(CASE WHEN cm >= CEIL(n * 0.95) THEN bin END) AS INT) AS full_p95,
         CAST(MIN(CASE WHEN cm >= CEIL(n * 0.99) THEN bin END) AS INT) AS full_p99
  FROM (
    SELECT event_type, bin, c,
           SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cm,
           SUM(c) OVER (PARTITION BY event_type) AS n
    FROM full_h
  ) GROUP BY event_type
)
SELECT mq.event_type, merged_n,
       merged_p50, merged_p95, merged_p99,
       full_p50, full_p95, full_p99,
       (merged_n = full_n AND merged_p50 = full_p50
        AND merged_p95 = full_p95 AND merged_p99 = full_p99) AS merge_exact
FROM mq JOIN fq ON mq.event_type = fq.event_type
ORDER BY mq.event_type
"""


def inc03_incremental_rollup_maintenance(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental aggregate maintenance — the materialized-view
    refresh shape: a per-type rollup (count / decimal sum / min / max)
    maintained as merge(agg(corpus), agg(batch)) WITHOUT rescanning the
    corpus, certified equal to the direct full recompute. The corpus /
    batch split is a time cutoff (the nightly-load reality); the merge
    combiners are the algebra that makes an aggregate maintainable at
    100 TB — count and sum ADD, min/max take least/greatest — i.e.
    exactly the partial-aggregation contract Spark's own map-side
    combine relies on, lifted to the batch level.

    All statistics are decimal-exact integers/decimals, so merged ==
    recomputed is bit-certain, and the hash-certified equality flag
    turns any future non-mergeable statistic (an avg kept as a float,
    a distinct count kept exact) into a red driver row. Scale: the
    corpus is touched ONCE at snapshot time; each refresh scans only
    the batch and merges O(#types) rows."""
    ev = load(spark, sf, "events").select(
        "event_type", "ts", dec("value").alias("__v")
    )
    cutoff = F.lit("2024-01-16")

    def _agg(df: DataFrame, p: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias(f"{p}_n"),
            F.sum("__v").alias(f"{p}_sum"),
            F.min("__v").alias(f"{p}_min"),
            F.max("__v").alias(f"{p}_max"),
        )

    snap = _agg(ev.filter(F.col("ts") < cutoff), "s")
    batch = _agg(ev.filter(F.col("ts") >= cutoff), "b")
    merged = (
        snap.join(batch, "event_type", "full_outer")
        .select(
            "event_type",
            (
                F.coalesce(F.col("s_n"), F.lit(0))
                + F.coalesce(F.col("b_n"), F.lit(0))
            ).cast("bigint").alias("n_events"),
            (
                F.coalesce(F.col("s_sum"), F.lit(0).cast("decimal(18,2)"))
                + F.coalesce(F.col("b_sum"), F.lit(0).cast("decimal(18,2)"))
            ).cast("double").alias("total_value"),
            F.least(
                F.coalesce(F.col("s_min"), F.col("b_min")),
                F.coalesce(F.col("b_min"), F.col("s_min")),
            ).cast("double").alias("min_value"),
            F.greatest(
                F.coalesce(F.col("s_max"), F.col("b_max")),
                F.coalesce(F.col("b_max"), F.col("s_max")),
            ).cast("double").alias("max_value"),
        )
    )
    full = _agg(ev, "f").select(
        "event_type",
        F.col("f_n").cast("bigint").alias("__fn"),
        F.col("f_sum").cast("double").alias("__fs"),
        F.col("f_min").cast("double").alias("__fmin"),
        F.col("f_max").cast("double").alias("__fmax"),
    )
    return (
        merged.join(full, "event_type")
        .select(
            "event_type",
            "n_events",
            "total_value",
            "min_value",
            "max_value",
            (
                (F.col("n_events") == F.col("__fn"))
                & (F.col("total_value") == F.col("__fs"))
                & (F.col("min_value") == F.col("__fmin"))
                & (F.col("max_value") == F.col("__fmax"))
            ).alias("merge_exact"),
        )
        .orderBy("event_type")
    )


_INC03_ORACLE = """
WITH e AS (
  SELECT event_type, ts, CAST(value AS DECIMAL(18,2)) AS v FROM events
), s AS (
  SELECT event_type, COUNT(*) AS n, SUM(v) AS sm, MIN(v) AS mn, MAX(v) AS mx
  FROM e WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1
), b AS (
  SELECT event_type, COUNT(*) AS n, SUM(v) AS sm, MIN(v) AS mn, MAX(v) AS mx
  FROM e WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1
), merged AS (
  SELECT COALESCE(s.event_type, b.event_type) AS event_type,
         CAST(COALESCE(s.n, 0) + COALESCE(b.n, 0) AS BIGINT) AS n_events,
         CAST(COALESCE(s.sm, 0) + COALESCE(b.sm, 0) AS DOUBLE) AS total_value,
         CAST(LEAST(COALESCE(s.mn, b.mn), COALESCE(b.mn, s.mn)) AS DOUBLE)
           AS min_value,
         CAST(GREATEST(COALESCE(s.mx, b.mx), COALESCE(b.mx, s.mx)) AS DOUBLE)
           AS max_value
  FROM s FULL OUTER JOIN b ON s.event_type = b.event_type
), f AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS fn,
         CAST(SUM(v) AS DOUBLE) AS fs,
         CAST(MIN(v) AS DOUBLE) AS fmn, CAST(MAX(v) AS DOUBLE) AS fmx
  FROM e GROUP BY 1
)
SELECT m.event_type, n_events, total_value, min_value, max_value,
       (n_events = fn AND total_value = fs
        AND min_value = fmn AND max_value = fmx) AS merge_exact
FROM merged m JOIN f ON m.event_type = f.event_type
ORDER BY m.event_type
"""


ROUND7_STAGED_QUERIES.update(
    {
        "hq02_mergeable_histogram": hq02_mergeable_histogram,
        "inc03_incremental_rollup_maintenance": (
            inc03_incremental_rollup_maintenance
        ),
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "hq02_mergeable_histogram": _HQ02_ORACLE,
        "inc03_incremental_rollup_maintenance": _INC03_ORACLE,
    }
)


# --- round-7 staged surface, wave 22 (tx16) ---------------------------------


def tx16_trigram_nb_langid(spark: SparkSession, sf: str) -> DataFrame:
    """TRAINED language identification — a char-trigram naive-Bayes
    classifier (the fastText/langdetect family's statistical core)
    trained on the corpus's own labels and evaluated as a confusion
    matrix against them. tx03 scores a fixed marker-word heuristic;
    this is the upgrade every production pipeline makes: per-language
    trigram statistics learned FROM data, add-one smoothed, argmin
    total cost over candidate languages.

    Determinism is the tx14 recipe end to end: the per-(lang, trigram)
    cost −log2((c+1)/(ctx_lang+V)) is computed ONCE in the bounded
    model table and rounded to 8 dp; each language's unseen-trigram
    default cost is computed ONCE per language (a |L|-row table) and
    rounded the same way; per-doc scoring sums DECIMAL(25,12) casts of
    those frozen costs, so shuffle order cannot move a bit; the argmin
    is min_by over the (cost, lang) struct — the tie rule INSIDE the
    comparator (win03). No transcendental ever runs on a per-doc
    aggregate.

    Scale: trigrams explode per word (transform over sequence, the
    tx11 pattern — no self-join); the model is vocabulary-of-trigrams
    × |L| sized, NOT corpus sized; scoring joins doc trigrams to the
    model on the trigram key — both sides SF-proportional at worst, so
    no hint (AQE decides; a bounded language inventory typically makes
    the model broadcastable and AQE does exactly that from measured
    size). The candidate-language fan-out is the |L|-row broadcast
    roster — the L× cost every NB scorer pays. One doc-keyed aggregate
    and an O(|L|²) confusion rollup finish it."""
    docs = _docs_words(spark, sf)
    tri = docs.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        F.explode(
            F.expr(
                "flatten(transform(filter(__words, w -> length(w) >= 3), "
                "w -> transform(sequence(1, length(w) - 2), "
                "i -> substr(w, i, 3))))"
            )
        ).alias("__t"),
    )
    langs = docs.select(F.col("lang").alias("cand")).distinct()
    # vocab/stats/dtc each re-aggregate the trigram stream directly —
    # deliberately: an r13 A/B that derived stats and V from dtc's
    # reduced counts (one explode pass instead of three) measured
    # SLOWER (3.90 -> 4.08 s isolated), because trigrams rarely repeat
    # within a doc, so dtc is nearly occurrence-sized and the extra
    # Exchange above it costs more than the two map-side explode
    # passes it saves.
    # corpus-wide distinct trigram vocabulary (the shared V in the
    # add-one denominator) — 1 row, bounded by construction
    vocab = tri.agg(F.countDistinct("__t").alias("__v"))
    stats = (
        tri.groupBy(F.col("lang_true").alias("cand"), "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    ctx = stats.groupBy("cand").agg(F.sum("__c").alias("__ctx"))
    model = (
        stats.join(ctx, "cand")
        .crossJoin(F.broadcast(vocab))
        .select(
            "cand",
            "__t",
            F.round(
                -F.log2(
                    (F.col("__c") + F.lit(1.0))
                    / (F.col("__ctx") + F.col("__v")).cast("double")
                ),
                8,
            ).alias("__cost"),
        )
    )
    default = (
        ctx.crossJoin(F.broadcast(vocab))
        .select(
            "cand",
            F.round(
                -F.log2(
                    F.lit(1.0)
                    / (F.col("__ctx") + F.col("__v")).cast("double")
                ),
                8,
            ).alias("__def"),
        )
    )
    # Seen-mass rewrite (r13, guide §2.3 — aggregate before you
    # shuffle): the naive scorer fans every trigram OCCURRENCE out |L|
    # ways through the model join. Instead, reduce to per-(doc,
    # trigram) counts k once, inner-join the model (only (cand, t)
    # pairs seen in training exist there), and recover the unseen mass
    # arithmetically: Σ_t k_t·cost-or-default
    #   = Σ_seen k_t·cost + (n_doc − seen_k)·default.
    # Decimal arithmetic is exact, so k·cost as DECIMAL equals k
    # repeated additions of the DECIMAL(25,12) cast bit-for-bit and
    # the argmin (and therefore the confusion matrix) cannot move.
    # Types: every cost/default is an 8-dp value < 100 (−log2 of a
    # probability ≥ 1/(ctx+V), ctx+V < 2^63 → < 63.0), so
    # DECIMAL(14,12) holds it exactly and k·cost fits DECIMAL(28,12)
    # with NO precision-loss adjustment anywhere on the path.
    dtc = tri.groupBy("doc_id", "lang_true", "__t").agg(
        F.count(F.lit(1)).alias("__k")
    )
    ndoc = dtc.groupBy("doc_id", "lang_true").agg(
        F.sum("__k").alias("__n")
    )
    seen = (
        dtc.join(model, "__t")
        .groupBy("doc_id", "lang_true", "cand")
        .agg(
            F.sum(
                F.col("__k").cast("decimal(13,0)")
                * F.col("__cost").cast("decimal(14,12)")
            )
            # re-narrow the sum (≤ Σk·63 < 10^16) so the final
            # seen+unseen addition stays under precision 38 with no
            # precision-loss adjustment
            .cast("decimal(28,12)")
            .alias("__seen_cost"),
            F.sum("__k").alias("__seen_k"),
        )
    )
    scored = (
        ndoc.crossJoin(F.broadcast(langs))
        .join(seen, ["doc_id", "lang_true", "cand"], "left")
        .join(F.broadcast(default), "cand")
        .select(
            "doc_id",
            "lang_true",
            "cand",
            (
                F.coalesce(
                    F.col("__seen_cost"),
                    F.lit(0).cast("decimal(28,12)"),
                )
                + (F.col("__n") - F.coalesce(F.col("__seen_k"), F.lit(0)))
                .cast("decimal(13,0)")
                * F.col("__def").cast("decimal(14,12)")
            ).alias("__total"),
        )
    )
    pred = scored.groupBy("doc_id", "lang_true").agg(
        F.expr("min_by(cand, struct(__total, cand))").alias("lang_pred")
    )
    return (
        pred.groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("lang_true", "lang_pred")
    )


_TX16_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang AS lang_true, unnest({_WORDS}) AS word FROM documents
), tri AS (
  SELECT doc_id, lang_true,
         substr(word, i, 3) AS t
  FROM w CROSS JOIN (SELECT unnest(range(1, 200)) AS i)
  WHERE length(word) >= 3 AND i <= length(word) - 2
), langs AS (
  SELECT DISTINCT lang AS cand FROM documents
), vocab AS (
  SELECT COUNT(DISTINCT t) AS v FROM tri
), stats AS (
  SELECT lang_true AS cand, t, COUNT(*) AS c FROM tri GROUP BY 1, 2
), ctx AS (
  SELECT cand, SUM(c) AS ctx FROM stats GROUP BY cand
), model AS (
  SELECT s.cand, s.t,
         ROUND(-log2((s.c + 1.0) / CAST(x.ctx + vocab.v AS DOUBLE)), 8)
           AS cost
  FROM stats s JOIN ctx x ON s.cand = x.cand CROSS JOIN vocab
), dflt AS (
  SELECT cand,
         ROUND(-log2(1.0 / CAST(ctx.ctx + vocab.v AS DOUBLE)), 8) AS def
  FROM ctx CROSS JOIN vocab
), scored AS (
  SELECT tri.doc_id, tri.lang_true, langs.cand,
         SUM(CAST(COALESCE(model.cost, dflt.def) AS DECIMAL(25,12)))
           AS total
  FROM tri CROSS JOIN langs
  LEFT JOIN model ON model.cand = langs.cand AND model.t = tri.t
  JOIN dflt ON dflt.cand = langs.cand
  GROUP BY 1, 2, 3
), pred AS (
  SELECT doc_id, lang_true, cand AS lang_pred,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY total, cand) AS rk
  FROM scored
)
SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred WHERE rk = 1 GROUP BY 1, 2 ORDER BY lang_true, lang_pred
"""


ROUND7_STAGED_QUERIES["tx16_trigram_nb_langid"] = tx16_trigram_nb_langid
ROUND7_STAGED_ORACLE["tx16_trigram_nb_langid"] = _TX16_ORACLE


# --- round-7 staged surface, wave 23 (ts01) ---------------------------------


def ts01_seasonal_naive_error(spark: SparkSession, sf: str) -> DataFrame:
    """Forecast-baseline QA over the hourly event series — the check a
    metrics/feature pipeline runs before trusting any model: the
    seasonal-naive forecast (value 24 h ago) and the 1-step naive
    forecast (value 1 h ago) scored per event type as MAE, plus their
    ratio (the MASE shape, Hyndman & Koehler 2006 — a seasonal MASE
    < 1 means yesterday's-hour beats last-hour, i.e. the series has
    real daily seasonality worth modeling).

    Determinism: hourly values are exact DECIMAL(18,2) sums; lag
    alignment is an equi-join on the (type, hour − INTERVAL) key —
    no window ordering anywhere; absolute errors stay decimal; each
    MAE is one decimal-sum / count divide cast to double and rounded
    at output; the ratio divides the two unrounded double means once
    (NULLIF-guarded). Gap hours simply drop out of the inner join —
    the same rule in both engines.

    Scale: the error joins run on the AGGREGATED hourly table (types ×
    hours — metadata next to the event stream), so the only
    corpus-sized work is the one hourly rollup every monitoring
    pipeline already pays; both joins are keyed shuffles of that small
    frame, AQE-sized."""
    hourly = (
        load(spark, sf, "events")
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("__h")
        )
        .agg(F.sum(dec("value")).alias("__v"))
    )
    lag24 = hourly.select(
        "event_type",
        F.expr("__h + INTERVAL 24 HOURS").alias("__h"),
        F.col("__v").alias("__v24"),
    )
    lag1 = hourly.select(
        "event_type",
        F.expr("__h + INTERVAL 1 HOUR").alias("__h"),
        F.col("__v").alias("__v1"),
    )
    e24 = (
        hourly.join(lag24, ["event_type", "__h"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_seasonal"),
            (
                F.sum(F.abs(F.col("__v") - F.col("__v24"))).cast("double")
                / F.count(F.lit(1))
            ).alias("__mae24"),
        )
    )
    e1 = (
        hourly.join(lag1, ["event_type", "__h"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_naive"),
            (
                F.sum(F.abs(F.col("__v") - F.col("__v1"))).cast("double")
                / F.count(F.lit(1))
            ).alias("__mae1"),
        )
    )
    return (
        e24.join(e1, "event_type")
        .select(
            "event_type",
            "n_seasonal",
            "n_naive",
            F.round("__mae24", 6).alias("mae_seasonal24"),
            F.round("__mae1", 6).alias("mae_naive1"),
            F.round(
                F.col("__mae24") / F.nullif(F.col("__mae1"), F.lit(0.0)), 6
            ).alias("mase24"),
        )
        .orderBy("event_type")
    )


_TS01_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         SUM(CAST(value AS DECIMAL(18,2))) AS v
  FROM events GROUP BY 1, 2
), e24 AS (
  SELECT a.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_seasonal,
         CAST(SUM(ABS(a.v - b.v)) AS DOUBLE) / COUNT(*) AS mae24
  FROM hourly a
  JOIN hourly b ON a.event_type = b.event_type
               AND a.h = b.h + INTERVAL 24 HOURS
  GROUP BY 1
), e1 AS (
  SELECT a.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_naive,
         CAST(SUM(ABS(a.v - b.v)) AS DOUBLE) / COUNT(*) AS mae1
  FROM hourly a
  JOIN hourly b ON a.event_type = b.event_type
               AND a.h = b.h + INTERVAL 1 HOUR
  GROUP BY 1
)
SELECT e24.event_type, n_seasonal, n_naive,
       ROUND(mae24, 6) AS mae_seasonal24,
       ROUND(mae1, 6) AS mae_naive1,
       ROUND(mae24 / NULLIF(mae1, 0.0), 6) AS mase24
FROM e24 JOIN e1 ON e24.event_type = e1.event_type
ORDER BY e24.event_type
"""


ROUND7_STAGED_QUERIES["ts01_seasonal_naive_error"] = ts01_seasonal_naive_error
ROUND7_STAGED_ORACLE["ts01_seasonal_naive_error"] = _TS01_ORACLE


# --- round-7 staged surface, wave 24 (cur02) --------------------------------


def _label_centroid_sqdist(spark: SparkSession, sf: str) -> DataFrame:
    """(label, vec_id, __d2) — each vector's decimal-exact squared
    distance to its label centroid: es05's decimal-exact mean, per-term
    double products accumulated through DECIMAL(30,15) sums (exact,
    partition-order-free), so the key is bit-identical cross-engine.
    SHARED kernel: es08 ranks it for the outlier screen; cur02's
    funnel consumes it as stage 1 — one implementation, two certified
    consumers (the cur01 composition rule).

    Kept in the exploded (label, dim)-keyed shape after an r13 A/B:
    the broadcast-centroid-array + per-row decimal distance FOLD
    rewrite (zero n·d shuffles on paper) measured ~18% slower at
    sf0.1 — higher-order-function decimal arithmetic runs interpreted
    per element, while this exploded stream's decimal sums ride
    codegen'd hash aggregates; and the per-dimension COLUMN aggregate
    variant was 1.6-3.7x slower still (variable-length decimal
    aggregation buffers pay per-update row copying when a group
    carries d of them)."""
    emb = load(spark, sf, "embeddings")
    ex = emb.select(
        "label", "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).withColumn("val", F.col("val").cast("double"))
    cent = ex.groupBy("label", "dim").agg(
        (
            F.sum(F.col("val").cast("decimal(25,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__c")
    )
    return (
        ex.join(cent, ["label", "dim"])
        .withColumn(
            "__sq",
            ((F.col("val") - F.col("__c")) * (F.col("val") - F.col("__c")))
            .cast("decimal(30,15)"),
        )
        .groupBy("label", "vec_id")
        .agg(F.sum("__sq").alias("__d2"))
    )


def cur02_embedding_curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """END-TO-END embedding curation funnel — cur01's sibling on the
    vector side, certified as ONE query over SHARED kernels: centroid
    outlier screen (es08's _label_centroid_sqdist + the distributed
    two-phase rank — drop each label's 3 farthest vectors) → near-dup
    removal over the FULL corpus's sign-LSH verified pairs
    (similarity.neardup_pairs, dd05's kernel — drop the higher id of
    any ≥0.35-cosine pair whose BOTH endpoints survived the screen; a
    single non-iterative rule, so the certified result is closed-form)
    → per-label survivor accounting at each stage.

    Composition discipline (the cur01 lessons): every stage reuses the
    already-certified kernel, so this certifies stage INTERACTIONS —
    anti-join plumbing, drop accounting — not re-implementations; and
    the drop sets are DATA-DEPENDENT (outlier count scales with
    labels, dup pairs with corpus dup rate), so neither anti-join
    carries a broadcast hint — AQE sizes them at runtime (forcing a
    broadcast on a 10-30% dup-drop set is the round-4 OOM-at-scale
    defect, fixed once, not to be reintroduced)."""
    from ..operators.ranking import attach_global_row_number

    emb = load(spark, sf, "embeddings").select("label", "vec_id")
    ranked = attach_global_row_number(
        _label_centroid_sqdist(spark, sf),
        order_by=[F.desc("__d2"), F.asc("vec_id")],
        partition_by=["label"],
        rn_col="__rk",
        # the sqdist kernel (64-way posexplode + centroid join) is the
        # expensive lineage here; run it once (r13)
        materialize_input=True,
    )
    out3 = ranked.filter(F.col("__rk") <= 3).select("vec_id")
    # four consumers (both legs of the pair-endpoint join, r1, s2) —
    # a tiny (label, vec_id) frame; checkpoint so the outlier screen
    # is not re-run per consumer (r13)
    s1 = emb.join(out3, "vec_id", "left_anti").localCheckpoint()
    pairs = sim.neardup_pairs(
        load(spark, sf, "embeddings"),
        threshold=0.35,
        nbits=LSH_NBITS,
        n_tables=LSH_TABLES,
    ).select("id_a", "id_b")
    drop2 = (
        pairs.join(
            s1.select(F.col("vec_id").alias("id_a")), "id_a"
        )
        .join(s1.select(F.col("vec_id").alias("id_b")), "id_b")
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    s2 = s1.join(drop2, "vec_id", "left_anti")
    base = emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
    r1 = s1.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after_outlier")
    )
    r2 = s2.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after_dedup")
    )
    return (
        base.join(r1, "label", "left")
        .join(r2, "label", "left")
        .select(
            "label",
            "n_vectors",
            F.coalesce(F.col("n_after_outlier"), F.lit(0))
            .cast("bigint")
            .alias("n_after_outlier"),
            F.coalesce(F.col("n_after_dedup"), F.lit(0))
            .cast("bigint")
            .alias("n_after_dedup"),
        )
        .orderBy("label")
    )


_CUR02_ORACLE = f"""
WITH ex AS (
  SELECT label, vec_id, CAST(d - 1 AS INT) AS dim,
         CAST(embedding[d] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d)
), cent AS (
  SELECT label, dim,
         CAST(SUM(CAST(val AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*) AS c
  FROM ex GROUP BY label, dim
), dist AS (
  SELECT e.label, e.vec_id,
         SUM(CAST((e.val - c.c) * (e.val - c.c) AS DECIMAL(30,15))) AS d2
  FROM ex e JOIN cent c ON e.label = c.label AND e.dim = c.dim
  GROUP BY e.label, e.vec_id
), rk AS (
  SELECT label, vec_id,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY d2 DESC, vec_id) AS rk
  FROM dist
), out3 AS (
  SELECT vec_id FROM rk WHERE rk <= 3
), s1 AS (
  SELECT vec_id, label FROM embeddings
  WHERE vec_id NOT IN (SELECT vec_id FROM out3)
), banded AS ({_BANDED}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
), pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
  WHERE {_COS.format(a='ea.embedding', b='eb.embedding')} >= 0.35
), drop2 AS (
  SELECT DISTINCT p.id_b AS vec_id
  FROM pairs p
  JOIN s1 a ON p.id_a = a.vec_id
  JOIN s1 b ON p.id_b = b.vec_id
), s2 AS (
  SELECT * FROM s1 WHERE vec_id NOT IN (SELECT vec_id FROM drop2)
)
SELECT e.label,
       CAST(e.n_vectors AS BIGINT) AS n_vectors,
       CAST(COALESCE(a.n1, 0) AS BIGINT) AS n_after_outlier,
       CAST(COALESCE(b.n2, 0) AS BIGINT) AS n_after_dedup
FROM (SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY 1) e
LEFT JOIN (SELECT label, COUNT(*) AS n1 FROM s1 GROUP BY 1) a
       ON e.label = a.label
LEFT JOIN (SELECT label, COUNT(*) AS n2 FROM s2 GROUP BY 1) b
       ON e.label = b.label
ORDER BY e.label
"""


ROUND7_STAGED_QUERIES["cur02_embedding_curation_funnel"] = (
    cur02_embedding_curation_funnel
)
ROUND7_STAGED_ORACLE["cur02_embedding_curation_funnel"] = _CUR02_ORACLE


# --- round-7 staged surface, wave 25 (dd14) ---------------------------------


def dd14_rolling_hash_signature(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLING-HASH document fingerprinting (the Rabin-Karp /
    winnowing family, Schleimer et al. 2003 — MOSS): every 32-char
    window of the normalized text gets the polynomial hash
    h = fold((acc·131 + char) mod (2³¹−1)); the document signature is
    the MINIMUM window hash (the winnowing selection collapsed to its
    global-min special case, i.e. a 1-hash MinHash over character
    windows — tx04/dd01 fingerprint whole documents, this fingerprints
    documents BY their substrings, so two docs sharing ANY 32-char run
    can collide). Per source: docs fingerprinted, distinct signatures,
    collisions (the candidate pool a plagiarism/quote detector feeds
    to dd08/dd09's span verification).

    The classic rolling O(1) window update is the SEQUENTIAL
    optimization; the distributed form evaluates every window
    independently — windows of one doc never cross rows, so the scan
    parallelizes embarrassingly and the only exchange carries
    (source, signature). The per-window evaluation is a vectorized
    numpy mapInPandas kernel (the dd16 rule, learned the hard way:
    this operator's original transform+aggregate expression form
    measured 397 s at sf0.1 — Spark's interpreted lambda interpreter
    does ~2k window-hash evals/sec; the stride-trick kernel does the
    identical integer arithmetic in microseconds per document).
    Integer-exact everywhere: c·131^j mod p products < 2^38, window
    sums < 2^42 — no BIGINT overflow; the DuckDB twin folds the
    identical recurrence in SQL (list_reduce seeded with the same 0),
    which certifies the numpy arithmetic bit-for-bit."""
    import pandas as _pd

    K, P = 32, 2147483647
    pows = [pow(131, K - 1 - j, P) for j in range(K)]
    docs = load(spark, sf, "documents").select("doc_id", "source", "text")

    def op(batches):
        import numpy as np
        from numpy.lib.stride_tricks import sliding_window_view

        pw = np.array(pows, dtype=np.int64)
        for pdf in batches:
            out_src: list = []
            out_sig: list = []
            norm = (
                pdf["text"]
                .astype("string")
                .str.lower()
                .str.replace("[^a-z0-9]+", "", regex=True)
            )
            for src_, s in zip(pdf["source"], norm):
                if s is None or len(s) < K:
                    continue
                codes = np.frombuffer(
                    s.encode("ascii"), dtype=np.uint8
                ).astype(np.int64)
                wins = sliding_window_view(codes, K)
                h = ((wins * pw) % P).sum(axis=1) % P
                out_src.append(src_)
                out_sig.append(int(h.min()))
            yield _pd.DataFrame(
                {
                    "source": _pd.Series(out_src, dtype="string"),
                    "__sig": _pd.Series(out_sig, dtype="int64"),
                }
            )

    sig = docs.mapInPandas(op, schema="source string, __sig long")
    return (
        sig.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_fingerprinted"),
            F.countDistinct("__sig").cast("bigint").alias("n_signatures"),
            (F.count(F.lit(1)) - F.countDistinct("__sig"))
            .cast("bigint")
            .alias("n_collisions"),
            F.min("__sig").cast("bigint").alias("min_signature"),
        )
        .orderBy("source")
    )


_DD14_ORACLE = """
WITH d AS (
  SELECT doc_id, source,
         regexp_replace(lower(text), '[^a-z0-9]+', '', 'g') AS s
  FROM documents
), sig AS (
  SELECT doc_id, source,
         CASE WHEN length(s) >= 32 THEN
           list_min(list_transform(range(1, length(s) - 30),
             i -> list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                      list_transform(range(0, 32),
                        j -> CAST(ascii(substr(s, CAST(i + j AS INT), 1))
                                  AS BIGINT))),
                    (acc, x) -> (acc * 131 + x) % 2147483647)))
         ELSE NULL END AS sg
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_fingerprinted,
       CAST(COUNT(DISTINCT sg) AS BIGINT) AS n_signatures,
       CAST(COUNT(*) - COUNT(DISTINCT sg) AS BIGINT) AS n_collisions,
       CAST(MIN(sg) AS BIGINT) AS min_signature
FROM sig WHERE sg IS NOT NULL
GROUP BY source ORDER BY source
"""


ROUND7_STAGED_QUERIES["dd14_rolling_hash_signature"] = (
    dd14_rolling_hash_signature
)
ROUND7_STAGED_ORACLE["dd14_rolling_hash_signature"] = _DD14_ORACLE


# --- round-7 staged surface, wave 26 (bm01, dd15) ----------------------------


_BM01_TERMS = ("spark", "query", "window", "merge")


def _bm25_doc_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document BM25 scoring kernel (Robertson & Zaragoza 2009,
    k1=1.2, b=0.75) for the fixed 4-term probe query — shared: bm01
    certifies its top-k head, rk01 compares its ranking against the
    raw-TF leg. Columns: doc_id, source, n_terms_matched, bm25_score,
    tf_sum (integer total probe-term frequency).

    Determinism discipline (tx14/ir01): the transcendental idf =
    ln((N-df+0.5)/(df+0.5)+1) is computed once per TERM in the
    bounded (<=4-row) stats table and rounded to 8 dp; avgdl is
    exact-bigint-sum / N rounded to 6 dp in a 1-row broadcast; each
    (doc, term) partial score is one identically-parenthesized chain
    of IEEE double ops rounded once to 6 dp, then DECIMAL(25,12)-
    summed per doc — no transcendental and no float sum ever runs on
    an unbounded aggregate.

    Scale: one explode -> one (doc, term)-keyed aggregate restricted
    to query terms (the filter pushes to the explode side, so the
    shuffle carries only matching postings); the idf table and corpus
    stats are bounded-by-construction broadcasts (legitimate under
    the AQE-decides convention); doc lengths join on doc_id —
    SF-proportional both sides, no hint."""
    docs = _docs_words(spark, sf).select(
        "doc_id", "source", F.size("__words").alias("__dl")
    )
    toks = _docs_words(spark, sf).select(
        "doc_id", F.explode("__words").alias("term")
    ).filter(F.col("term").isin(*_BM01_TERMS))
    stats = docs.agg(
        F.count(F.lit(1)).alias("__n"),
        F.round(
            F.sum("__dl").cast("double") / F.count(F.lit(1)), 6
        ).alias("__avgdl"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(stats.select("__n")))
        .select(
            "term",
            F.round(
                F.log(
                    (F.col("__n") - F.col("__df") + F.lit(0.5))
                    / (F.col("__df") + F.lit(0.5))
                    + F.lit(1.0)
                ),
                8,
            ).alias("__idf"),
        )
    )
    part = (
        tf.join(F.broadcast(idf), "term")
        .join(docs, "doc_id")
        .crossJoin(F.broadcast(stats.select("__avgdl")))
        .select(
            "doc_id",
            "source",
            "__tf",
            F.round(
                F.col("__idf")
                * (
                    (F.col("__tf").cast("double") * F.lit(2.2))
                    / (
                        F.col("__tf").cast("double")
                        + F.lit(1.2)
                        * (
                            F.lit(0.25)
                            + (
                                F.lit(0.75)
                                * F.col("__dl").cast("double")
                            )
                            / F.col("__avgdl")
                        )
                    )
                ),
                6,
            ).alias("__part"),
        )
    )
    return part.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
        F.round(
            F.sum(F.col("__part").cast("decimal(25,12)")).cast("double"),
            6,
        ).alias("bm25_score"),
        F.sum("__tf").cast("bigint").alias("tf_sum"),
    )


def bm01_bm25_retrieval(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 ranked retrieval head — see `_bm25_doc_scores` for the
    scoring kernel and determinism discipline; this certifies the
    top-15 ranking an index serves."""
    return (
        _bm25_doc_scores(spark, sf)
        .select("doc_id", "source", "n_terms_matched", "bm25_score")
        .orderBy(F.desc("bm25_score"), "doc_id")
        .limit(15)
    )


_BM01_ORACLE = f"""
WITH dw AS (
  SELECT doc_id, source, {_WORDS} AS w FROM documents
), dl AS (
  SELECT doc_id, source, len(w) AS dl FROM dw
), stats AS (
  SELECT COUNT(*) AS n,
         ROUND(CAST(SUM(dl) AS DOUBLE) / COUNT(*), 6) AS avgdl
  FROM dl
), tok AS (
  SELECT doc_id, unnest(w) AS term FROM dw
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ('spark', 'query', 'window', 'merge')
  GROUP BY 1, 2
), idf AS (
  SELECT term,
         ROUND(ln((n - df + 0.5) / (df + 0.5) + 1.0), 8) AS idf
  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1), stats
), part AS (
  SELECT tf.doc_id, dl.source,
         ROUND(idf.idf *
               ((CAST(tf.tf AS DOUBLE) * 2.2)
                / (CAST(tf.tf AS DOUBLE)
                   + 1.2 * (0.25
                            + (0.75 * CAST(dl.dl AS DOUBLE))
                              / stats.avgdl))), 6) AS part
  FROM tf
  JOIN idf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
)
SELECT doc_id, source,
       CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
       ROUND(CAST(SUM(CAST(part AS DECIMAL(25,12))) AS DOUBLE), 6)
         AS bm25_score
FROM part
GROUP BY doc_id, source
ORDER BY bm25_score DESC, doc_id
LIMIT 15
"""


ROUND7_STAGED_QUERIES["bm01_bm25_retrieval"] = bm01_bm25_retrieval
ROUND7_STAGED_ORACLE["bm01_bm25_retrieval"] = _BM01_ORACLE


def dd15_duplicated_gram_fraction(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicated-substring exposure audit — the fixed-length-gram
    approximation of ExactSubstr dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": substrings repeated
    across a corpus are memorization fuel even when no document pair
    is a near-dup). Every 40-char gram of the normalized text sampled
    at stride 10 is counted corpus-wide; a gram seen in >=2 DISTINCT
    documents is cross-doc duplicated, and each source reports its
    gram instances, duplicated instances, and the duplicated fraction
    — the signal that decides whether a source needs substring-level
    (not just document-level) dedup.

    The true suffix-array formulation is sequential; fixed-length
    strided grams are the distributed trade (same one Lee et al.'s
    MinHash baseline makes): explode is row-local, the corpus-wide
    gram count is ONE keyed aggregate, the dup flag joins back on the
    gram key (SF-proportional both sides, no hint — AQE decides), and
    the per-source rollup is map-side combinable. Stride 10 caps the
    blowup at len/10 rows per doc; integer counts end-to-end, so both
    engines agree bit-for-bit (fractions are one IEEE divide rounded
    to 6 dp)."""
    docs = load(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.regexp_replace(F.lower("text"), "[^a-z0-9]+", "").alias("__s"),
    )
    grams = docs.filter(F.length("__s") >= 40).select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, length(__s) - 39, 10), "
                "i -> substr(__s, i, 40))"
            )
        ).alias("__g"),
    )
    dup = (
        grams.groupBy("__g")
        .agg(F.countDistinct("doc_id").alias("__dd"))
        .select("__g", (F.col("__dd") >= 2).alias("__dup"))
    )
    return (
        grams.join(dup, "__g")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("__dup"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_duplicated"),
            F.round(
                F.sum(
                    F.when(F.col("__dup"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dup_fraction"),
        )
        .orderBy("source")
    )


_DD15_ORACLE = """
WITH d AS (
  SELECT doc_id, source,
         regexp_replace(lower(text), '[^a-z0-9]+', '', 'g') AS s
  FROM documents
), g AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, length(s) - 38, 10),
                i -> substr(s, CAST(i AS INT), 40))) AS gram
  FROM d WHERE length(s) >= 40
), dup AS (
  SELECT gram, COUNT(DISTINCT doc_id) >= 2 AS is_dup FROM g GROUP BY 1
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_duplicated,
       ROUND(CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_fraction
FROM g JOIN dup USING (gram)
GROUP BY source ORDER BY source
"""


ROUND7_STAGED_QUERIES["dd15_duplicated_gram_fraction"] = (
    dd15_duplicated_gram_fraction
)
ROUND7_STAGED_ORACLE["dd15_duplicated_gram_fraction"] = _DD15_ORACLE


# --- round-7 staged surface, wave 27 (tc01, pa03) ----------------------------


def tc01_neardup_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle census of the verified near-dup graph — the
    transitivity QA a dedup pipeline runs NEXT to dd06's clustering:
    connected components say which docs group together; the triangle
    count says how CLIQUISH those groups are. High transitivity means
    the clusters are genuine duplicate families (every pair verifies);
    low transitivity flags chain-shaped components where A~B~C but
    A!~C — exactly the shape that over-merges under transitive
    clustering and the reason SemDeDup-style pipelines audit it.

    Edges come from the shared `_neardup_good_edges` (exact Jaccard
    >= 0.5 on LSH candidates, stored once as id_a < id_b). With every
    edge id-oriented, each triangle {x<y<z} is counted exactly once
    by the two-hop join e1=(x,y), e2=(y,z) closed by e3=(x,z) — both
    joins are equi-joins on vertex keys. Wedge count comes from the
    degree table alone (sum dg*(dg-1)/2, integer). On a skewed graph
    the classic refinement orients edges low-degree -> high-degree to
    bound the wedge fan-out by the arboricity instead of the max
    degree; the count is orientation-invariant, so that swap would
    not move this certified result — here the frame is already the
    near-dup SUBGRAPH (dd06's bound), orders of magnitude smaller
    than the corpus. Integer counts end-to-end; transitivity = 3T/W
    is the single IEEE divide, rounded at output, NULL when W = 0."""
    good = _neardup_good_edges(spark, sf).localCheckpoint()
    deg = (
        good.select(F.col("id_a").alias("x"))
        .unionAll(good.select(F.col("id_b").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__dg"))
    )
    summary = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.expr("__dg * (__dg - 1) div 2")).cast("bigint").alias(
            "n_wedges"
        ),
    )
    e1 = good.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    e2 = good.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    e3 = good.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    n_edges = good.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    )
    return (
        summary.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.round(
                    F.lit(3.0)
                    * F.col("n_triangles").cast("double")
                    / F.col("n_wedges").cast("double"),
                    6,
                ),
            ).alias("transitivity"),
        )
    )


def _tc01_oracle_sql() -> str:
    return f"""
WITH {_neardup_good_cte()}, deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS dg FROM (
    SELECT id_a AS x FROM good UNION ALL SELECT id_b FROM good
  ) GROUP BY x
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM good e1
  JOIN good e2 ON e2.id_a = e1.id_b
  JOIN good e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
), e AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM good
)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0 THEN
         ROUND(3.0 * CAST(n_triangles AS DOUBLE)
               / CAST(n_wedges AS DOUBLE), 6)
       END AS transitivity
FROM s, e, t
"""


ROUND7_STAGED_QUERIES["tc01_neardup_triangles"] = tc01_neardup_triangles
ROUND7_STAGED_ORACLE["tc01_neardup_triangles"] = _tc01_oracle_sql()


def pa03_t_closeness_audit(spark: SparkSession, sf: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    third rung of the privacy ladder staged with pa01/pa02:
    k-anonymity bounds class size, l-diversity counts distinct
    sensitive values, but a class can be large AND diverse while its
    sensitive DISTRIBUTION still diverges from the population (a
    90/10 segment split inside a 50/50 corpus leaks). t is the total
    variation distance between the class's market-segment
    distribution and the global one, over the same (nation, balance
    band) quasi-identifier classes as pa01/pa02; the 20 worst classes
    surface.

    Integer-exact by construction: with c_s the class count of
    segment s, g_s the global count, n the class size and N the
    corpus size, t = sum_s |c_s*N - g_s*n| / (2*n*N) — the numerator
    is a BIGINT sum over the bounded segment roster (classes that
    MISS a segment still contribute |0 - g_s*n|, which is why the
    class list crosses the <=5-row roster before the left join), and
    the only float op is the final divide, rounded at output. Two
    keyed aggregates + a roster-bounded fan-out; nothing scales past
    the (QID, segment) table."""
    cust = load(spark, sf, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("__band"),
        "c_mktsegment",
    )
    cls_seg = cust.groupBy("c_nationkey", "__band", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    cls = cls_seg.groupBy("c_nationkey", "__band").agg(
        F.sum("__c").cast("bigint").alias("__n")
    )
    seg = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("__g")
    )
    tot = seg.agg(F.sum("__g").cast("bigint").alias("__tot"))
    full = (
        cls.crossJoin(F.broadcast(seg))
        .join(cls_seg, ["c_nationkey", "__band", "c_mktsegment"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "__band",
            "__n",
            "__tot",
            F.abs(
                F.coalesce(F.col("__c"), F.lit(0)) * F.col("__tot")
                - F.col("__g") * F.col("__n")
            ).alias("__num"),
        )
    )
    return (
        full.groupBy("c_nationkey", "__band", "__n", "__tot")
        .agg(F.sum("__num").cast("bigint").alias("__tnum"))
        .select(
            F.col("c_nationkey").cast("bigint").alias("nation_key"),
            F.col("__band").cast("bigint").alias("balance_band"),
            F.col("__n").alias("class_size"),
            F.round(
                F.col("__tnum").cast("double")
                / (F.lit(2.0) * F.col("__n").cast("double")
                   * F.col("__tot").cast("double")),
                6,
            ).alias("t_closeness"),
        )
        .orderBy(F.desc("t_closeness"), "nation_key", "balance_band")
        .limit(20)
    )


_PA03_ORACLE = """
WITH cust AS (
  SELECT c_nationkey, FLOOR(c_acctbal / 1000.0) AS band, c_mktsegment
  FROM customer
), cls_seg AS (
  SELECT c_nationkey, band, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS c
  FROM cust GROUP BY 1, 2, 3
), cls AS (
  SELECT c_nationkey, band, CAST(SUM(c) AS BIGINT) AS n
  FROM cls_seg GROUP BY 1, 2
), seg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS g FROM cust GROUP BY 1
), tot AS (
  SELECT CAST(SUM(g) AS BIGINT) AS nn FROM seg
), terms AS (
  SELECT cls.c_nationkey, cls.band, cls.n, tot.nn,
         ABS(COALESCE(cs.c, 0) * tot.nn - seg.g * cls.n) AS num
  FROM cls CROSS JOIN seg
  LEFT JOIN cls_seg cs
    ON cs.c_nationkey = cls.c_nationkey AND cs.band = cls.band
   AND cs.c_mktsegment = seg.c_mktsegment
  CROSS JOIN tot
)
SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
       CAST(band AS BIGINT) AS balance_band,
       n AS class_size,
       ROUND(CAST(SUM(num) AS DOUBLE)
             / (2.0 * CAST(n AS DOUBLE) * CAST(nn AS DOUBLE)), 6)
         AS t_closeness
FROM terms
GROUP BY c_nationkey, band, n, nn
ORDER BY t_closeness DESC, nation_key, balance_band
LIMIT 20
"""


ROUND7_STAGED_QUERIES["pa03_t_closeness_audit"] = pa03_t_closeness_audit
ROUND7_STAGED_ORACLE["pa03_t_closeness_audit"] = _PA03_ORACLE


# --- round-7 staged surface, wave 28 (ts02, sync01) --------------------------


def ts02_cusum_level_shift(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM level-shift detection (Page 1954) per event type over the
    exact-cents hourly rollup — ts01's companion: seasonal-naive error
    scores FORECAST quality, CUSUM flags the hour a series' LEVEL
    drifted from its long-run mean (ingest-volume regressions, schema
    rollouts, upstream outages). One-sided CUSUM with target = series
    mean and 5% slack; alarm threshold 8 slack units.

    The textbook recurrence S_i = max(0, S_{i-1} + x_i - t - s) is
    sequential; distributed, it collapses to the prefix-sum closed
    form S_i = P_i - min(0, min_{j<=i} P_j) with P the running sum of
    deviations — two ordinary window functions over the (type, hour)
    rollup, which is bounded metadata (types x hours), NOT the event
    stream. Everything is BIGINT cents: target and slack use integer
    division on all-positive sums (Spark `div` = DuckDB `//` there),
    deviations/prefix sums/minima are exact, so both engines agree
    bit-for-bit with no rounding discipline needed at all. The only
    corpus-sized work is the hourly aggregate every monitoring
    pipeline already pays."""
    from pyspark.sql import Window

    hourly = (
        load(spark, sf, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("__h"))
        .agg(
            F.sum((dec("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("__v")
        )
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__v").cast("bigint").alias("__total"),
    ).select(
        "event_type",
        "__n",
        F.expr("__total div __n").alias("__target"),
        F.expr("(__total div __n) div 20").alias("__slack"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = hourly.join(stats, "event_type").select(
        "event_type",
        "__h",
        "__n",
        "__target",
        "__slack",
        (F.col("__v") - F.col("__target") - F.col("__slack")).alias("__d"),
    )
    pre = dev.select(
        "event_type",
        "__h",
        "__n",
        "__target",
        "__slack",
        F.sum("__d").over(w).alias("__p"),
    )
    cus = pre.select(
        "event_type",
        "__h",
        "__n",
        "__target",
        "__slack",
        (
            F.col("__p")
            - F.least(F.lit(0).cast("bigint"), F.min("__p").over(w))
        ).alias("__s"),
    )
    return (
        cus.groupBy("event_type", "__n", "__target", "__slack")
        .agg(
            F.max("__s").cast("bigint").alias("max_cusum_cents"),
            F.sum(
                F.when(F.col("__s") > 8 * F.col("__slack"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_alarm_hours"),
            F.min(
                F.when(F.col("__s") > 8 * F.col("__slack"), F.col("__h"))
            ).alias("first_alarm_hour"),
        )
        .select(
            "event_type",
            F.col("__n").alias("n_hours"),
            F.col("__target").alias("target_cents"),
            F.col("__slack").alias("slack_cents"),
            "max_cusum_cents",
            "n_alarm_hours",
            "first_alarm_hour",
        )
        .orderBy("event_type")
    )


_TS02_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         (SUM(v) // COUNT(*)) AS target,
         (SUM(v) // COUNT(*)) // 20 AS slack
  FROM hourly GROUP BY 1
), pre AS (
  SELECT h.event_type, h.h, s.n, s.target, s.slack,
         SUM(h.v - s.target - s.slack) OVER (
           PARTITION BY h.event_type ORDER BY h.h
           ROWS UNBOUNDED PRECEDING) AS p
  FROM hourly h JOIN stats s USING (event_type)
), cus AS (
  SELECT event_type, h, n, target, slack,
         p - LEAST(CAST(0 AS BIGINT), MIN(p) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS UNBOUNDED PRECEDING)) AS s
  FROM pre
)
SELECT event_type,
       n AS n_hours,
       CAST(target AS BIGINT) AS target_cents,
       CAST(slack AS BIGINT) AS slack_cents,
       CAST(MAX(s) AS BIGINT) AS max_cusum_cents,
       CAST(SUM(CASE WHEN s > 8 * slack THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarm_hours,
       MIN(CASE WHEN s > 8 * slack THEN h END) AS first_alarm_hour
FROM cus
GROUP BY event_type, n, target, slack
ORDER BY event_type
"""


ROUND7_STAGED_QUERIES["ts02_cusum_level_shift"] = ts02_cusum_level_shift
ROUND7_STAGED_ORACLE["ts02_cusum_level_shift"] = _TS02_ORACLE


def sync01_bucket_checksum_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Merkle-style replica reconciliation — the cross-cluster audit
    that answers "do these two copies of a 100 TB table agree, and if
    not WHERE" without ever shuffling full rows between sides: each
    side reduces to (bucket, row count, XOR of row fingerprints), a
    64-row digest, and only mismatched buckets would be re-read
    row-level (the anti-entropy pattern behind Dynamo/Cassandra repair
    and warehouse replication checks). The replica here is the orders
    table with a deterministic fault injection — rows deleted where
    o_orderkey % 997 = 0, status corrupted where % 1009 = 0 — so the
    certified output proves both detection (damaged buckets flagged,
    with row-count deltas attributing deletions) and the negative
    (undamaged buckets match exactly).

    Fingerprint = the repo-wide _H60 md5 hash over key|status|price;
    bucket = fingerprint-hash of the KEY (balanced under any key
    distribution, unlike key ranges). XOR is the combiner because it
    is order-independent, overflow-free at any row count, and
    map-side combinable — the whole audit is two scans + two 64-row
    aggregates + one 64-row join. Caveat inherent to XOR digests
    (documented, standard): a pair of identical corruptions in one
    bucket cancels; the row COUNT column catches deletions
    independently."""
    base = load(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        dec("o_totalprice").cast("string").alias("__price"),
    )

    def digest(df: DataFrame, n_col: str, x_col: str) -> DataFrame:
        fp = df.select(
            (
                dd.hash60(F.col("o_orderkey").cast("string")) % 64
            ).alias("bucket"),
            dd.hash60(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    "o_orderstatus",
                    "__price",
                )
            ).alias("__fp"),
        )
        return fp.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias(n_col),
            F.expr("bit_xor(__fp)").cast("bigint").alias(x_col),
        )
    replica = base.filter(F.col("o_orderkey") % 997 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 1009 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "__price",
    )
    a = digest(base, "rows_primary", "__xa")
    b = digest(replica, "rows_replica", "__xb")
    return (
        a.join(b, "bucket", "full_outer")
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            F.coalesce("rows_primary", F.lit(0)).cast("bigint").alias(
                "rows_primary"
            ),
            F.coalesce("rows_replica", F.lit(0)).cast("bigint").alias(
                "rows_replica"
            ),
            (
                F.coalesce("__xa", F.lit(-1))
                == F.coalesce("__xb", F.lit(-1))
            ).alias("checksum_match"),
        )
        .orderBy("bucket")
    )


_SYNC01_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price
  FROM orders
), replica AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 1009 = 0 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus,
         price
  FROM base WHERE o_orderkey % 997 <> 0
), da AS (
  SELECT {_H60.format(x="CAST(o_orderkey AS VARCHAR)")} % 64 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS rows_primary,
         bit_xor({_H60.format(
             x="CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus"
               " || '|' || price")}) AS xa
  FROM base GROUP BY 1
), db AS (
  SELECT {_H60.format(x="CAST(o_orderkey AS VARCHAR)")} % 64 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS rows_replica,
         bit_xor({_H60.format(
             x="CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus"
               " || '|' || price")}) AS xb
  FROM replica GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       COALESCE(rows_primary, 0) AS rows_primary,
       COALESCE(rows_replica, 0) AS rows_replica,
       COALESCE(xa, -1) = COALESCE(xb, -1) AS checksum_match
FROM da FULL OUTER JOIN db USING (bucket)
ORDER BY bucket
"""


ROUND7_STAGED_QUERIES["sync01_bucket_checksum_diff"] = (
    sync01_bucket_checksum_diff
)
ROUND7_STAGED_ORACLE["sync01_bucket_checksum_diff"] = _SYNC01_ORACLE


# --- round-7 staged surface, wave 29 (fs01) ----------------------------------


def fs01_fellegi_sunter_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Fellegi-Sunter probabilistic match scoring (Fellegi & Sunter
    1969) — the decision layer fz01's candidate generation feeds: each
    blocked candidate pair gets a log-likelihood-ratio score summed
    over field comparators, agreement on a RARE field counting for
    more than agreement on a common one. The 25 best-scoring part
    pairs surface as the merge-review queue.

    The u-probabilities (chance agreement among non-matches) are
    estimated from the data the standard way — u_f = sum_v c_v(c_v-1)
    / N(N-1) over field f's value-frequency table — as INTEGER
    numerator/denominator pairs with ONE double divide each; the
    m-probabilities are the conventional pinned constants. Each
    field's agreement/disagreement weight log2(m/u), log2((1-m)/(1-u))
    is computed once in the 1-row bounded stats frame and rounded to
    8 dp (the tx14 transcendental rule); a pair's score is a FIXED
    3-term sum of those rounded weights — identical expression tree
    in both engines, no unbounded float aggregation anywhere.

    Scale (the fz01/dd11 discipline): pairs come from an equi-join on
    the p_size blocking key, so comparisons are bounded by squared
    block sizes, never all-pairs; a skewed block refines by
    compounding the key (size + brand would move brand out of the
    comparator set) — the recall/cost dial every linkage pipeline
    tunes. Frequency tables are one keyed aggregate each; the weight
    frame is a 1-row broadcast."""
    parts = load(spark, sf, "part").select(
        "p_partkey",
        "p_size",
        "p_brand",
        "p_type",
        F.element_at(F.split("p_name", " "), 1).alias("__head"),
    )

    def u_stat(col: str, alias: str) -> DataFrame:
        return (
            parts.groupBy(col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
            .agg(
                F.sum(F.expr("__c * (__c - 1)"))
                .cast("bigint")
                .alias(alias)
            )
        )

    nrows = parts.agg(F.count(F.lit(1)).cast("bigint").alias("__nr"))
    m_b, m_t, m_h = 0.9, 0.85, 0.8
    weights = (
        u_stat("p_brand", "__ub")
        .crossJoin(u_stat("p_type", "__ut"))
        .crossJoin(u_stat("__head", "__uh"))
        .crossJoin(F.broadcast(nrows))
        .select(
            *[
                expr
                for name, m, u in [
                    ("b", m_b, "__ub"),
                    ("t", m_t, "__ut"),
                    ("h", m_h, "__uh"),
                ]
                for expr in (
                    F.round(
                        F.log2(
                            F.lit(m)
                            / (
                                F.col(u).cast("double")
                                / F.expr("CAST(__nr * (__nr - 1) AS DOUBLE)")
                            )
                        ),
                        8,
                    ).alias(f"__wa_{name}"),
                    F.round(
                        F.log2(
                            F.lit(1.0 - m)
                            / (
                                F.lit(1.0)
                                - F.col(u).cast("double")
                                / F.expr("CAST(__nr * (__nr - 1) AS DOUBLE)")
                            )
                        ),
                        8,
                    ).alias(f"__wd_{name}"),
                )
            ]
        )
    )
    a = parts.select(
        F.col("p_partkey").alias("key_a"),
        "p_size",
        F.col("p_brand").alias("__ba"),
        F.col("p_type").alias("__ta"),
        F.col("__head").alias("__ha"),
    )
    b = parts.select(
        F.col("p_partkey").alias("key_b"),
        "p_size",
        F.col("p_brand").alias("__bb"),
        F.col("p_type").alias("__tb"),
        F.col("__head").alias("__hb"),
    )
    pairs = (
        a.join(b, "p_size")
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            (F.col("__ba") == F.col("__bb")).alias("agree_brand"),
            (F.col("__ta") == F.col("__tb")).alias("agree_type"),
            (F.col("__ha") == F.col("__hb")).alias("agree_head"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(weights))
        .select(
            "key_a",
            "key_b",
            "agree_brand",
            "agree_type",
            "agree_head",
            F.round(
                F.when(F.col("agree_brand"), F.col("__wa_b")).otherwise(
                    F.col("__wd_b")
                )
                + F.when(F.col("agree_type"), F.col("__wa_t")).otherwise(
                    F.col("__wd_t")
                )
                + F.when(F.col("agree_head"), F.col("__wa_h")).otherwise(
                    F.col("__wd_h")
                ),
                6,
            ).alias("fs_score"),
        )
        .orderBy(F.desc("fs_score"), "key_a", "key_b")
        .limit(25)
    )


_FS01_ORACLE = """
WITH parts AS (
  SELECT p_partkey, p_size, p_brand, p_type,
         str_split(p_name, ' ')[1] AS head
  FROM part
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM parts
), ub AS (
  SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS u FROM (
    SELECT COUNT(*) AS c FROM parts GROUP BY p_brand)
), ut AS (
  SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS u FROM (
    SELECT COUNT(*) AS c FROM parts GROUP BY p_type)
), uh AS (
  SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS u FROM (
    SELECT COUNT(*) AS c FROM parts GROUP BY head)
), w AS (
  SELECT
    ROUND(log2(0.9 / (CAST(ub.u AS DOUBLE)
          / CAST(nr * (nr - 1) AS DOUBLE))), 8) AS wa_b,
    ROUND(log2(0.09999999999999998 / (1.0 - CAST(ub.u AS DOUBLE)
          / CAST(nr * (nr - 1) AS DOUBLE))), 8) AS wd_b,
    ROUND(log2(0.85 / (CAST(ut.u AS DOUBLE)
          / CAST(nr * (nr - 1) AS DOUBLE))), 8) AS wa_t,
    ROUND(log2(0.15000000000000002 / (1.0 - CAST(ut.u AS DOUBLE)
          / CAST(nr * (nr - 1) AS DOUBLE))), 8) AS wd_t,
    ROUND(log2(0.8 / (CAST(uh.u AS DOUBLE)
          / CAST(nr * (nr - 1) AS DOUBLE))), 8) AS wa_h,
    ROUND(log2(0.19999999999999996 / (1.0 - CAST(uh.u AS DOUBLE)
          / CAST(nr * (nr - 1) AS DOUBLE))), 8) AS wd_h
  FROM ub, ut, uh, n
), pairs AS (
  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
         a.p_brand = b.p_brand AS agree_brand,
         a.p_type = b.p_type AS agree_type,
         a.head = b.head AS agree_head
  FROM parts a JOIN parts b USING (p_size)
  WHERE a.p_partkey < b.p_partkey
)
SELECT key_a, key_b, agree_brand, agree_type, agree_head,
       ROUND(
         (CASE WHEN agree_brand THEN wa_b ELSE wd_b END)
         + (CASE WHEN agree_type THEN wa_t ELSE wd_t END)
         + (CASE WHEN agree_head THEN wa_h ELSE wd_h END), 6)
         AS fs_score
FROM pairs CROSS JOIN w
ORDER BY fs_score DESC, key_a, key_b
LIMIT 25
"""


ROUND7_STAGED_QUERIES["fs01_fellegi_sunter_scores"] = (
    fs01_fellegi_sunter_scores
)
ROUND7_STAGED_ORACLE["fs01_fellegi_sunter_scores"] = _FS01_ORACLE


# --- round-7 staged surface, wave 30 (dp01, fd01) ----------------------------


def dp01_contribution_bounding(spark: SparkSession, sf: str) -> DataFrame:
    """User-contribution bounding audit — the calibration step before
    any differentially-private release or DP training run (Abadi et
    al. 2016 clip-then-noise; Wilson et al. 2020 per-user bounding):
    DP noise scales with the SENSITIVITY, i.e. the largest single
    user's contribution, so the pipeline first measures contribution
    skew and the mass a candidate clipping bound would remove. Per
    event type: user count, max and mean per-user contribution, the
    conventional 2x-mean candidate bound, how many users it clips,
    and the exact fraction of value mass that survives clipping —
    the utility/privacy dial read directly off the corpus.

    The noise draw itself is deliberately out of scope (random =
    uncertifiable); the DETERMINISTIC part every DP pipeline runs —
    the bounding audit — is what's certified. Integer cents
    end-to-end: per-(type, user) sums are one keyed aggregate (the
    corpus-sized work), per-type stats are a second over the user
    table, the bound is integer division on all-positive totals
    (Spark `div` = DuckDB `//`), and the survival fraction is the
    single rounded divide at output."""
    per_user = (
        load(spark, sf, "events")
        .groupBy("event_type", "user_id")
        .agg(
            F.sum((dec("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("__contrib")
        )
    )
    stats = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.max("__contrib").cast("bigint").alias("max_contrib_cents"),
        F.expr("SUM(__contrib) div COUNT(*)")
        .cast("bigint")
        .alias("mean_contrib_cents"),
        F.sum("__contrib").cast("bigint").alias("__total"),
    ).select(
        "event_type",
        "n_users",
        "max_contrib_cents",
        "mean_contrib_cents",
        "__total",
        (F.lit(2) * F.col("mean_contrib_cents")).alias("clip_bound_cents"),
    )
    return (
        per_user.join(stats, "event_type")
        .groupBy(
            "event_type",
            "n_users",
            "max_contrib_cents",
            "mean_contrib_cents",
            "clip_bound_cents",
            "__total",
        )
        .agg(
            F.sum(
                F.when(F.col("__contrib") > F.col("clip_bound_cents"), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_users_clipped"),
            F.sum(F.least("__contrib", "clip_bound_cents"))
            .cast("bigint")
            .alias("__kept"),
        )
        .select(
            "event_type",
            "n_users",
            "max_contrib_cents",
            "mean_contrib_cents",
            "clip_bound_cents",
            "n_users_clipped",
            F.round(
                F.col("__kept").cast("double")
                / F.col("__total").cast("double"),
                6,
            ).alias("kept_mass_fraction"),
        )
        .orderBy("event_type")
    )


_DP01_ORACLE = """
WITH per_user AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS contrib
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(MAX(contrib) AS BIGINT) AS max_contrib_cents,
         CAST(SUM(contrib) // COUNT(*) AS BIGINT) AS mean_contrib_cents,
         CAST(SUM(contrib) AS BIGINT) AS total,
         CAST(2 * (SUM(contrib) // COUNT(*)) AS BIGINT) AS clip_bound_cents
  FROM per_user GROUP BY 1
)
SELECT s.event_type, s.n_users, s.max_contrib_cents,
       s.mean_contrib_cents, s.clip_bound_cents,
       CAST(SUM(CASE WHEN p.contrib > s.clip_bound_cents THEN 1
                     ELSE 0 END) AS BIGINT) AS n_users_clipped,
       ROUND(CAST(SUM(LEAST(p.contrib, s.clip_bound_cents)) AS DOUBLE)
             / CAST(s.total AS DOUBLE), 6) AS kept_mass_fraction
FROM per_user p JOIN stats s USING (event_type)
GROUP BY s.event_type, s.n_users, s.max_contrib_cents,
         s.mean_contrib_cents, s.clip_bound_cents, s.total
ORDER BY s.event_type
"""


ROUND7_STAGED_QUERIES["dp01_contribution_bounding"] = (
    dp01_contribution_bounding
)
ROUND7_STAGED_ORACLE["dp01_contribution_bounding"] = _DP01_ORACLE


_FD01_CANDIDATES = (
    ("orders", "o_orderkey", "o_orderstatus"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderdate", "o_orderstatus"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_returnflag"),
)


def fd01_functional_dependencies(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate functional-dependency audit — the data-profiling
    primitive behind Deequ/Metanome-style constraint suggestion: for
    each candidate FD X -> Y, the g3 error (Kivinen & Mannila 1995) =
    the minimum number of rows whose removal makes the FD hold =
    n_rows - sum over X-groups of the largest Y-count. A zero g3 is a
    discovered constraint the quality gate (dq01) can then enforce;
    a small g3 is a near-FD flagging dirty rows.

    Per candidate: ONE (X, Y) keyed aggregate, one X-keyed reduce
    carrying max/sum per group, one bounded rollup — the same shape
    repeated per candidate and unioned, so cost is #candidates keyed
    shuffles over projected two-column scans (column pruning reaches
    the parquet reader; nothing reads full rows). All counts BIGINT;
    `holds` is g3 = 0. The candidate list is pinned: FD DISCOVERY
    over the full column lattice is a search-strategy layer on this
    same per-candidate kernel."""
    out = None
    for tbl, lhs, rhs in _FD01_CANDIDATES:
        pairs = (
            load(spark, sf, tbl)
            .groupBy(
                F.col(lhs).cast("string").alias("__l"),
                F.col(rhs).cast("string").alias("__r"),
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
        )
        per_lhs = pairs.groupBy("__l").agg(
            F.max("__c").alias("__mx"),
            F.sum("__c").alias("__tot"),
            F.count(F.lit(1)).alias("__nr"),
        )
        row = per_lhs.agg(
            F.sum("__tot").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_lhs_groups"),
            F.sum("__nr").cast("bigint").alias("n_lhs_rhs_pairs"),
            (F.sum("__tot") - F.sum("__mx"))
            .cast("bigint")
            .alias("g3_violations"),
        ).select(
            F.lit(f"{tbl}.{lhs} -> {rhs}").alias("fd"),
            "n_rows",
            "n_lhs_groups",
            "n_lhs_rhs_pairs",
            "g3_violations",
            (F.col("g3_violations") == 0).alias("holds"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("fd")


def _fd01_oracle_sql() -> str:
    legs = []
    for tbl, lhs, rhs in _FD01_CANDIDATES:
        legs.append(f"""
SELECT '{tbl}.{lhs} -> {rhs}' AS fd,
       CAST(SUM(tot) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
       CAST(SUM(nr) AS BIGINT) AS n_lhs_rhs_pairs,
       CAST(SUM(tot) - SUM(mx) AS BIGINT) AS g3_violations,
       SUM(tot) - SUM(mx) = 0 AS holds
FROM (
  SELECT l, MAX(c) AS mx, SUM(c) AS tot, COUNT(*) AS nr
  FROM (
    SELECT CAST({lhs} AS VARCHAR) AS l, CAST({rhs} AS VARCHAR) AS r,
           COUNT(*) AS c
    FROM {tbl} GROUP BY 1, 2
  ) GROUP BY l
)""")
    return " UNION ALL ".join(legs) + " ORDER BY fd"


ROUND7_STAGED_QUERIES["fd01_functional_dependencies"] = (
    fd01_functional_dependencies
)
ROUND7_STAGED_ORACLE["fd01_functional_dependencies"] = _fd01_oracle_sql()


# --- round-7 staged surface, wave 31 (rk01, tx17) ----------------------------


def rk01_rank_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Kendall rank agreement between two retrieval rankings — the
    metric layer a retrieval stack runs when it swaps scorers (does
    BM25's length normalization actually reorder results vs raw term
    frequency?) and the same kernel es11-style recall audits feed.
    Both rankings come from the shared `_bm25_doc_scores` kernel: the
    BM25 leg and the raw tf_sum leg, over BM25's top-20 documents.

    Exactness: ranks are ROW_NUMBERs with doc_id tie-breaks (total
    orders by construction — tau-a over a tie-free ranking), so
    concordant/discordant counts are INTEGERS from a bounded 20x20
    pair comparison and tau is one rounded divide. The pair join is a
    k²-bounded self-join on the 20-row head — the quadratic runs on
    the RESULT head, never the corpus (the fz01/dd11 bounding rule);
    corpus-sized work is exactly the shared scoring kernel's."""
    from pyspark.sql import Window

    head = (
        _bm25_doc_scores(spark, sf)
        .orderBy(F.desc("bm25_score"), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25_score"), "doc_id"))
            .alias("__rb"),
            F.row_number()
            .over(Window.orderBy(F.desc("tf_sum"), "doc_id"))
            .alias("__rt"),
        )
        .localCheckpoint()
    )
    lhs = head.select(
        F.col("__rb").alias("__rb_a"), F.col("__rt").alias("__rt_a")
    )
    rhs = head.select(
        F.col("__rb").alias("__rb_b"), F.col("__rt").alias("__rt_b")
    )
    pairs = lhs.crossJoin(F.broadcast(rhs)).filter(
        F.col("__rb_a") < F.col("__rb_b")
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("__rt_a") < F.col("__rt_b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_concordant"),
        F.sum(F.when(F.col("__rt_a") > F.col("__rt_b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_discordant"),
    ).select(
        F.lit(20).cast("bigint").alias("k"),
        "n_pairs",
        "n_concordant",
        "n_discordant",
        F.round(
            (F.col("n_concordant") - F.col("n_discordant")).cast("double")
            / F.col("n_pairs").cast("double"),
            6,
        ).alias("kendall_tau"),
    )


_RK01_ORACLE = f"""
WITH dw AS (
  SELECT doc_id, source, {_WORDS} AS w FROM documents
), dl AS (
  SELECT doc_id, source, len(w) AS dl FROM dw
), stats AS (
  SELECT COUNT(*) AS n,
         ROUND(CAST(SUM(dl) AS DOUBLE) / COUNT(*), 6) AS avgdl
  FROM dl
), tok AS (
  SELECT doc_id, unnest(w) AS term FROM dw
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ('spark', 'query', 'window', 'merge')
  GROUP BY 1, 2
), idf AS (
  SELECT term,
         ROUND(ln((n - df + 0.5) / (df + 0.5) + 1.0), 8) AS idf
  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1), stats
), part AS (
  SELECT tf.doc_id, tf.tf,
         ROUND(idf.idf *
               ((CAST(tf.tf AS DOUBLE) * 2.2)
                / (CAST(tf.tf AS DOUBLE)
                   + 1.2 * (0.25
                            + (0.75 * CAST(dl.dl AS DOUBLE))
                              / stats.avgdl))), 6) AS part
  FROM tf
  JOIN idf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
), scored AS (
  SELECT doc_id,
         ROUND(CAST(SUM(CAST(part AS DECIMAL(25,12))) AS DOUBLE), 6)
           AS bm25_score,
         CAST(SUM(tf) AS BIGINT) AS tf_sum
  FROM part GROUP BY doc_id
), head AS (
  SELECT doc_id, bm25_score, tf_sum
  FROM scored ORDER BY bm25_score DESC, doc_id LIMIT 20
), ranked AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25_score DESC, doc_id) AS rb,
         ROW_NUMBER() OVER (ORDER BY tf_sum DESC, doc_id) AS rt
  FROM head
), pairs AS (
  SELECT a.rt AS rt_a, b.rt AS rt_b
  FROM ranked a JOIN ranked b ON a.rb < b.rb
)
SELECT CAST(20 AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN rt_a < rt_b THEN 1 ELSE 0 END) AS BIGINT)
         AS n_concordant,
       CAST(SUM(CASE WHEN rt_a > rt_b THEN 1 ELSE 0 END) AS BIGINT)
         AS n_discordant,
       ROUND(CAST(SUM(CASE WHEN rt_a < rt_b THEN 1 ELSE 0 END)
                  - SUM(CASE WHEN rt_a > rt_b THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS kendall_tau
FROM pairs
"""


ROUND7_STAGED_QUERIES["rk01_rank_agreement"] = rk01_rank_agreement
ROUND7_STAGED_ORACLE["rk01_rank_agreement"] = _RK01_ORACLE


def tx17_bigram_continuations(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram continuation table — the language-model HEAD read off
    tx14's statistics: for the 20 highest-traffic context words, the
    argmax next word, its count, the context's continuation diversity
    (distinct next words — the Kneser-Ney continuation statistic),
    and the conditional probability of the top continuation. The
    table a next-token suggester or a KN smoother reads directly.

    Argmax with a PINNED tie rule: min_by over the (-count, w2)
    struct — highest count, then lexicographically smallest
    continuation (the win03 lesson: DuckDB's arg_min takes no struct
    comparator, so the twin replays the ROW_NUMBER spec; Spark's
    min_by is one map-side-combinable aggregate, no per-group window
    sort). One gram-keyed aggregate + one context-keyed reduce;
    top_prob is count/ctx_count, ONE rounded divide."""
    docs = load(spark, sf, "documents").select(
        "doc_id", tx.words("text").alias("__w")
    )
    big = docs.select(
        F.explode(
            F.expr(
                "CASE WHEN size(__w) >= 2 THEN "
                "transform(sequence(1, size(__w) - 1), "
                "i -> struct(element_at(__w, i) AS w1, "
                "element_at(__w, i + 1) AS w2)) "
                "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) "
                "END"
            )
        ).alias("__g")
    ).select("__g.w1", "__g.w2")
    counts = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    return (
        counts.groupBy("w1")
        .agg(
            F.sum("__c").cast("bigint").alias("ctx_count"),
            F.count(F.lit(1)).cast("bigint").alias("n_continuations"),
            F.expr("min_by(w2, struct(-__c, w2))").alias("top_next"),
            F.max("__c").cast("bigint").alias("top_count"),
        )
        .select(
            F.col("w1").alias("context_word"),
            "ctx_count",
            "n_continuations",
            "top_next",
            "top_count",
            F.round(
                F.col("top_count").cast("double")
                / F.col("ctx_count").cast("double"),
                6,
            ).alias("top_prob"),
        )
        .orderBy(F.desc("ctx_count"), "context_word")
        .limit(20)
    )


_TX17_ORACLE = f"""
WITH dw AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), big AS (
  SELECT w[CAST(i AS INT)] AS w1, w[CAST(i + 1 AS INT)] AS w2
  FROM dw, unnest(range(1, len(w))) AS t(i)
  WHERE len(w) >= 2
), counts AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM big GROUP BY 1, 2
), ranked AS (
  SELECT w1, w2, c,
         ROW_NUMBER() OVER (PARTITION BY w1 ORDER BY c DESC, w2) AS rk
  FROM counts
), ctx AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS ctx_count,
         CAST(COUNT(*) AS BIGINT) AS n_continuations
  FROM counts GROUP BY 1
)
SELECT ctx.w1 AS context_word, ctx.ctx_count, ctx.n_continuations,
       r.w2 AS top_next, r.c AS top_count,
       ROUND(CAST(r.c AS DOUBLE) / CAST(ctx.ctx_count AS DOUBLE), 6)
         AS top_prob
FROM ctx JOIN ranked r ON r.w1 = ctx.w1 AND r.rk = 1
ORDER BY ctx.ctx_count DESC, context_word
LIMIT 20
"""


ROUND7_STAGED_QUERIES["tx17_bigram_continuations"] = (
    tx17_bigram_continuations
)
ROUND7_STAGED_ORACLE["tx17_bigram_continuations"] = _TX17_ORACLE


# --- round-7 staged surface, wave 32 (imb01) ---------------------------------


def imb01_label_imbalance(spark: SparkSession, sf: str) -> DataFrame:
    """Label-imbalance audit per source — the mixture-QA read a
    curation pipeline takes before sampling (dm01/wm01's diagnostic
    sibling): per source, the language-label distribution's effective
    sample size ESS = (Σc)²/Σc² (Kish 1965 — the equal-weight
    equivalent count; ESS ≈ n_langs means balanced, ESS ≈ 1 means one
    label owns the source), the dominant label with a PINNED tie rule
    (min_by over the (-count, lang) struct, the tx17/win03
    convention), and its share. Skewed sources feed wm01's reweighting
    or get capped in the mixture.

    Integer-exact core: ESS's numerator (Σc)² and denominator Σc² are
    BIGINT from one (source, lang) aggregate + one source-keyed
    reduce; the two output ratios are single rounded divides. Nothing
    scales past the (source, lang) table — bounded by the label
    vocabulary times sources."""
    counts = (
        load(spark, sf, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    return (
        counts.groupBy("source")
        .agg(
            F.sum("__c").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_langs"),
            F.expr("min_by(lang, struct(-__c, lang))").alias(
                "dominant_lang"
            ),
            F.max("__c").cast("bigint").alias("__top"),
            F.sum(F.expr("__c * __c")).cast("bigint").alias("__sq"),
        )
        .select(
            "source",
            "n_docs",
            "n_langs",
            "dominant_lang",
            F.round(
                F.col("__top").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dominant_share"),
            F.round(
                F.expr("CAST(n_docs * n_docs AS DOUBLE)")
                / F.col("__sq").cast("double"),
                6,
            ).alias("effective_labels"),
        )
        .orderBy("source")
    )


_IMB01_ORACLE = """
WITH counts AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), ranked AS (
  SELECT source, lang, c,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY c DESC, lang) AS rk
  FROM counts
), agg AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_langs,
         CAST(MAX(c) AS BIGINT) AS top,
         CAST(SUM(c * c) AS BIGINT) AS sq
  FROM counts GROUP BY 1
)
SELECT a.source, a.n_docs, a.n_langs,
       r.lang AS dominant_lang,
       ROUND(CAST(a.top AS DOUBLE) / CAST(a.n_docs AS DOUBLE), 6)
         AS dominant_share,
       ROUND(CAST(a.n_docs * a.n_docs AS DOUBLE)
             / CAST(a.sq AS DOUBLE), 6) AS effective_labels
FROM agg a JOIN ranked r ON r.source = a.source AND r.rk = 1
ORDER BY a.source
"""


ROUND7_STAGED_QUERIES["imb01_label_imbalance"] = imb01_label_imbalance
ROUND7_STAGED_ORACLE["imb01_label_imbalance"] = _IMB01_ORACLE


# ---------------------------------------------------------------------------
# Round-7 promotion (VERDICT r6 task 1): graduate 50 staged queries into the
# live EXTENSION registries, in the verdict's priority order — hll02 first
# (retires hll01's rows-only asterisk), then the TPC-H shape closeout
# q49–q59, dd13/dd14/dd15, pa01–pa03, bm01/ii01, st11–st14, then the rest.
# The remaining 8 (win05/win06/rs01/cr01/ts01/hq02/sync01/tx17) stay staged
# for the round-8 window — all are locally certified at sf0.001+sf0.01 in
# tests/test_staged_round7.py, so their graduation is again a dict move.
ROUND7_PROMOTED: list[str] = [
    "hll02_deterministic_hll",
    "q49_nation_volume_shipping",
    "q50_local_supplier_revenue",
    "q51_returned_item_revenue",
    "q52_shipping_priority",
    "q53_order_priority_check",
    "q54_product_profit",
    "q55_priority_pivot_by_status",
    "q56_promo_revenue_share",
    "q57_supplier_part_counts",
    "q58_large_volume_orders",
    "q59_forecast_revenue",
    "dd13_semantic_dedup",
    "dd14_rolling_hash_signature",
    "dd15_duplicated_gram_fraction",
    "pa01_k_anonymity_audit",
    "pa02_l_diversity_audit",
    "pa03_t_closeness_audit",
    "bm01_bm25_retrieval",
    "ii01_inverted_index",
    "st11_watermarked_dedup",
    "st12_foreachbatch_upsert",
    "st13_left_outer_attribution",
    "st14_content_dedup",
    # the rest, near-dup/graph family kept adjacent so the shared
    # edge/cluster intermediates build once and attribute cleanly
    "gr02_candidate_pagerank",
    "tc01_neardup_triangles",
    "ct03_fuzzy_contamination",
    "xl01_crosslingual_neardup",
    "es13_pq_adc_search",
    "es14_truncated_dim_recall",
    "es15_jl_projection_qc",
    "ir01_dsir_importance",
    "sl01_split_leakage",
    "ss04_temporal_split_audit",
    "ss05_shard_balance_audit",
    "win04_linear_interpolation",
    "cm01_countmin_heavy_hitters",
    "tx14_bigram_cross_entropy",
    "tx15_heaps_vocab_growth",
    "tx16_trigram_nb_langid",
    "mm06_payload_dedup_audit",
    "fz01_fuzzy_name_pairs",
    "inc03_incremental_rollup_maintenance",
    "ts02_cusum_level_shift",
    "cur02_embedding_curation_funnel",
    "fs01_fellegi_sunter_scores",
    "dp01_contribution_bounding",
    "fd01_functional_dependencies",
    "rk01_rank_agreement",
    "imb01_label_imbalance",
]

for _name in ROUND7_PROMOTED:
    EXTENSION_QUERIES[_name] = ROUND7_STAGED_QUERIES.pop(_name)
    EXTENSION_ORACLE[_name] = ROUND7_STAGED_ORACLE.pop(_name)
del _name


# ---------------------------------------------------------------------------
# Round-8 staging, wave 33: mw01 Mann-Whitney U drift, tx18 Flesch
# readability, tx19 lexical richness.


def mw01_mann_whitney_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) drift test between every
    source pair on the document-length distribution — the
    nonparametric two-sample location test (Mann & Whitney 1947) that
    complements ks01's KS statistic: U/(n_a*n_b) is the probability a
    random doc from one source is longer than one from the other
    (the AUC identity), robust to outliers and exact under ties.

    Integer-exact by construction: instead of per-doc ranks (whose
    tie-averaging introduces .5 fractions), U is computed from the
    per-source VALUE HISTOGRAM via the identity
    ``2U(a,b) = sum_v c_a(v) * (2 * cum_b(<v) + c_b(v))`` — the
    doubled statistic stays BIGINT until one rounded divide at output.

    Scale: the histogram is bounded by the value domain (distinct doc
    lengths), NOT the corpus; the grid x source fill is a bounded
    crossJoin (BNLJ-allowlisted); the pair stage is a value-keyed
    equi-join over that bounded table. No corpus-sized shuffle beyond
    the one groupBy building the histogram."""
    docs = load(spark, sf, "documents")
    hist = (
        docs.groupBy("source", F.col("n_chars").alias("__v"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    grid = docs.select(F.col("n_chars").alias("__v")).distinct()
    srcs = docs.select("source").distinct()
    filled = (
        grid.crossJoin(F.broadcast(srcs))
        .join(hist, ["source", "__v"], "left")
        .select(
            "source", "__v", F.coalesce(F.col("__c"), F.lit(0)).alias("__c")
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = filled.select(
        "source",
        "__v",
        "__c",
        F.coalesce(F.sum("__c").over(w), F.lit(0)).alias("__cum"),
    )
    a = cum.select(
        F.col("source").alias("source_a"),
        "__v",
        F.col("__c").alias("__ca"),
    )
    b = cum.select(
        F.col("source").alias("source_b"),
        "__v",
        F.col("__c").alias("__cb"),
        F.col("__cum").alias("__cumb"),
    )
    return (
        a.join(b, "__v")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum("__ca").alias("n_a"),
            F.sum("__cb").alias("n_b"),
            F.sum(
                F.col("__ca") * (F.lit(2) * F.col("__cumb") + F.col("__cb"))
            ).alias("u2"),
        )
        .select(
            "source_a",
            "source_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("u2").cast("bigint").alias("u2"),
            F.round(
                F.col("u2").cast("double")
                / (F.lit(2.0) * (F.col("n_a") * F.col("n_b")).cast("double")),
                6,
            ).alias("auc"),
        )
        .orderBy("source_a", "source_b")
    )


_MW01_ORACLE = """
WITH hist AS (
  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), grid AS (
  SELECT DISTINCT n_chars AS v FROM documents
), srcs AS (
  SELECT DISTINCT source FROM documents
), filled AS (
  SELECT s.source, g.v, COALESCE(h.c, 0) AS c
  FROM grid g CROSS JOIN srcs s
  LEFT JOIN hist h ON h.source = s.source AND h.v = g.v
), cum AS (
  SELECT source, v, c,
         COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cm
  FROM filled
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(SUM(a.c) AS BIGINT) AS n_a,
       CAST(SUM(b.c) AS BIGINT) AS n_b,
       CAST(SUM(a.c * (2 * b.cm + b.c)) AS BIGINT) AS u2,
       ROUND(CAST(SUM(a.c * (2 * b.cm + b.c)) AS DOUBLE)
             / (2.0 * CAST(SUM(a.c) * SUM(b.c) AS DOUBLE)), 6) AS auc
FROM cum a JOIN cum b ON a.v = b.v AND a.source < b.source
GROUP BY 1, 2
ORDER BY source_a, source_b
"""


def tx18_flesch_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Flesch reading-ease scoring (Flesch 1948) per language — the
    classic readability heuristic every text-quality pipeline carries
    next to the Gopher/C4 rules: ``206.835 - 1.015*(words/sentences) -
    84.6*(syllables/words)``, with syllables approximated as vowel
    groups ([aeiouy]+ runs) — the standard dictionary-free proxy.

    Determinism: all three per-doc counts are INTEGERS from shared
    regexp extractions (the _WORDS twin discipline); the score is one
    fixed-order double expression over them, rounded to 6 dp per doc,
    cast to DECIMAL(18,6), and decimal-summed per language — the
    tx09/ir01 rule, so shuffle order cannot move a bit.

    Scale: one corpus pass, row-local feature extraction, one bounded
    per-lang aggregate. Nothing joins, nothing reshuffles."""
    docs = _docs_words(spark, sf)
    feats = docs.select(
        "lang",
        F.size("__words").alias("__w"),
        F.greatest(
            F.lit(1),
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")),
        ).alias("__s"),
        F.expr(
            "aggregate(transform(__words, "
            "w -> size(regexp_extract_all(w, '[aeiouy]+', 0))), "
            "0L, (a, x) -> a + x)"
        ).alias("__syl"),
    ).filter(F.col("__w") >= 1)
    scored = feats.select(
        "lang",
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (F.col("__w").cast("double") / F.col("__s").cast("double"))
            - F.lit(84.6)
            * (F.col("__syl").cast("double") / F.col("__w").cast("double")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("__fl"),
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum("__fl").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_flesch"),
            F.round(
                F.count_if(F.col("__fl") >= 60).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("share_easy"),
        )
        .orderBy("lang")
    )


_TX18_ORACLE = f"""
WITH feats AS (
  SELECT lang,
         len({_WORDS}) AS w,
         GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         list_sum(list_transform({_WORDS},
           w -> len(regexp_extract_all(w, '[aeiouy]+')))) AS syl
  FROM documents
), scored AS (
  SELECT lang,
         CAST(ROUND(206.835
           - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
           - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)), 6)
           AS DECIMAL(18,6)) AS fl
  FROM feats WHERE w >= 1
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(fl) AS DOUBLE) / COUNT(*), 6) AS avg_flesch,
       ROUND(CAST(COUNT(*) FILTER (WHERE fl >= 60) AS DOUBLE)
             / COUNT(*), 6) AS share_easy
FROM scored GROUP BY lang ORDER BY lang
"""


def tx19_lexical_richness(spark: SparkSession, sf: str) -> DataFrame:
    """Lexical-richness profile per language: type-token ratio and
    hapax-legomenon share — the vocabulary-health diagnostics next to
    tx15's Heap's-law growth curve (a corpus whose TTR or hapax share
    collapses is template/boilerplate-heavy; one whose hapax share
    explodes is OCR-noise-heavy).

    One (lang, word)-keyed aggregate (map-side combinable) feeding a
    bounded per-lang rollup; integers until two rounded divides."""
    docs = _docs_words(spark, sf)
    wc = (
        docs.select("lang", F.explode("__words").alias("__w"))
        .groupBy("lang", "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return (
        wc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum("__c").cast("bigint").alias("n_tokens"),
            F.count_if(F.col("__c") == 1).cast("bigint").alias("n_hapax"),
        )
        .select(
            "lang",
            "n_types",
            "n_tokens",
            "n_hapax",
            F.round(
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("ttr"),
            F.round(
                F.col("n_hapax").cast("double")
                / F.col("n_types").cast("double"),
                6,
            ).alias("hapax_share"),
        )
        .orderBy("lang")
    )


_TX19_ORACLE = f"""
WITH w AS (
  SELECT lang, unnest({_WORDS}) AS word FROM documents
), wc AS (
  SELECT lang, word, COUNT(*) AS c FROM w GROUP BY 1, 2
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS ttr,
       ROUND(CAST(COUNT(*) FILTER (WHERE c = 1) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_share
FROM wc GROUP BY lang ORDER BY lang
"""


ROUND7_STAGED_QUERIES.update(
    {
        "mw01_mann_whitney_drift": mw01_mann_whitney_drift,
        "tx18_flesch_readability": tx18_flesch_readability,
        "tx19_lexical_richness": tx19_lexical_richness,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "mw01_mann_whitney_drift": _MW01_ORACLE,
        "tx18_flesch_readability": _TX18_ORACLE,
        "tx19_lexical_richness": _TX19_ORACLE,
    }
)


# ---------------------------------------------------------------------------
# Round-8 staging, wave 34: qf03 C4 heuristic filters, ret01 weekly
# cohort retention, zo01 z-order locality audit.


def qf03_c4_heuristic_filters(spark: SparkSession, sf: str) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020, the T5 corpus
    recipe) as a per-source audit — the third quality battery next to
    qf01 (generic) and qf02 (Gopher): terminal punctuation, >= 3
    sentences, >= 50 words, no curly brace (code/JSON leak), no
    'lorem ipsum' (placeholder leak), mean word length in [3, 10].

    The mean-word-length band is evaluated INTEGER-EXACTLY as
    ``3*W <= total_chars <= 10*W`` — no division, so no float
    boundary case can disagree between engines. One conditional-agg
    corpus pass for all six rules plus the conjunction."""
    docs = _docs_words(spark, sf)
    feats = docs.select(
        "source",
        F.expr("rtrim(text) rlike '[.!?]$'").alias("__r1"),
        (
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)"))
            >= F.lit(3)
        ).alias("__r2"),
        (F.size("__words") >= F.lit(50)).alias("__r3"),
        (~F.col("text").contains("{")).alias("__r4"),
        (~F.lower(F.col("text")).contains("lorem ipsum")).alias("__r5"),
        F.expr(
            "3 * size(__words) <= aggregate(transform(__words, "
            "w -> length(w)), 0L, (a, x) -> a + x) AND "
            "aggregate(transform(__words, w -> length(w)), 0L, "
            "(a, x) -> a + x) <= 10 * size(__words)"
        ).alias("__r6"),
    )
    conj = (
        F.col("__r1")
        & F.col("__r2")
        & F.col("__r3")
        & F.col("__r4")
        & F.col("__r5")
        & F.col("__r6")
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        *[
            F.count_if(F.col(f"__r{i}")).cast("bigint").alias(name)
            for i, name in enumerate(
                [
                    "pass_terminal_punct",
                    "pass_min_sentences",
                    "pass_min_words",
                    "pass_no_brace",
                    "pass_no_lorem",
                    "pass_word_length",
                ],
                start=1,
            )
        ],
        F.count_if(conj).cast("bigint").alias("n_pass_all"),
    ]
    return (
        feats.groupBy("source")
        .agg(*aggs)
        .withColumn(
            "retention",
            F.round(
                F.col("n_pass_all").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ),
        )
        .orderBy("source")
    )


_QF03_ORACLE = f"""
WITH feats AS (
  SELECT source,
         regexp_matches(rtrim(text), '[.!?]$') AS r1,
         len(regexp_extract_all(text, '[.!?]+')) >= 3 AS r2,
         len({_WORDS}) >= 50 AS r3,
         NOT contains(text, '{{') AS r4,
         NOT contains(lower(text), 'lorem ipsum') AS r5,
         3 * len({_WORDS}) <= list_sum(list_transform({_WORDS},
             w -> len(w)))
           AND list_sum(list_transform({_WORDS}, w -> len(w)))
             <= 10 * len({_WORDS}) AS r6
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE r1) AS BIGINT) AS pass_terminal_punct,
       CAST(COUNT(*) FILTER (WHERE r2) AS BIGINT) AS pass_min_sentences,
       CAST(COUNT(*) FILTER (WHERE r3) AS BIGINT) AS pass_min_words,
       CAST(COUNT(*) FILTER (WHERE r4) AS BIGINT) AS pass_no_brace,
       CAST(COUNT(*) FILTER (WHERE r5) AS BIGINT) AS pass_no_lorem,
       CAST(COUNT(*) FILTER (WHERE r6) AS BIGINT) AS pass_word_length,
       CAST(COUNT(*) FILTER (WHERE r1 AND r2 AND r3 AND r4 AND r5 AND r6)
         AS BIGINT) AS n_pass_all,
       ROUND(CAST(COUNT(*) FILTER (WHERE r1 AND r2 AND r3 AND r4 AND r5
         AND r6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS retention
FROM feats GROUP BY source ORDER BY source
"""


def ret01_weekly_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort-retention matrix — the standard product-analytics
    triangle (cohort = the ISO week of a user's first event; retention
    at offset k = share of the cohort active k weeks later). q33 does
    day-over-day retention; this is the cohortized form every
    warehouse reports.

    Plan: one user-keyed aggregate for first-seen week, one distinct
    (user, week) activity projection, one equi-join back, one bounded
    (cohort x offset) rollup — integers until one rounded divide.
    date_trunc('week') is Monday-start in BOTH engines, and the
    day-difference of two week-starts is divisible by 7 exactly."""
    ev = load(spark, sf, "events")
    wk = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("__w")
    ).distinct()
    first = wk.groupBy("user_id").agg(F.min("__w").alias("__w0"))
    joined = wk.join(first, "user_id").select(
        "user_id",
        "__w0",
        (F.datediff(F.col("__w"), F.col("__w0")) / F.lit(7))
        .cast("bigint")
        .alias("week_offset"),
    )
    size = first.groupBy("__w0").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        joined.groupBy("__w0", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .join(size, "__w0")
        .select(
            F.col("__w0").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.lit(100.0)
                * F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double"),
                4,
            ).alias("retention_pct"),
        )
        .orderBy("cohort_week", "week_offset")
    )


_RET01_ORACLE = """
WITH wk AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
), first AS (
  SELECT user_id, MIN(w) AS w0 FROM wk GROUP BY user_id
), joined AS (
  SELECT wk.user_id, f.w0,
         CAST(date_diff('day', f.w0, wk.w) / 7 AS BIGINT) AS week_offset
  FROM wk JOIN first f ON wk.user_id = f.user_id
), size_t AS (
  SELECT w0, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM first GROUP BY w0
)
SELECT j.w0 AS cohort_week, j.week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       s.cohort_size,
       ROUND(100.0 * CAST(COUNT(*) AS DOUBLE)
             / CAST(s.cohort_size AS DOUBLE), 4) AS retention_pct
FROM joined j JOIN size_t s ON j.w0 = s.w0
GROUP BY j.w0, j.week_offset, s.cohort_size
ORDER BY cohort_week, week_offset
"""


def _z_interleave_sql(x: str, y: str, nbits: int = 8, idiv: str = "div") -> str:
    """Bit-interleaved Morton code as pure div/mod integer arithmetic —
    identical VALUES in Spark SQL and DuckDB; only the integer-division
    spelling differs (Spark ``div``, DuckDB ``//``), so it's a
    parameter. Operands are non-negative, where the two engines'
    division semantics agree exactly."""
    terms = []
    for i in range(nbits):
        p = 1 << i
        q = 1 << (2 * i)
        terms.append(
            f"{q} * ((({x}) {idiv} {p}) % 2 + 2 * ((({y}) {idiv} {p}) % 2))"
        )
    return " + ".join(terms)


def zo01_zorder_locality(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order (Morton-curve) data-layout audit — the multi-dimensional
    clustering diagnostic behind Delta/Iceberg Z-ORDER BY: interleave
    the bits of (user_id mod 16, time-of-day in 90-min cells) into one
    Morton key, bucket rows into 16 'files' by its high bits (two top
    bits per dimension), and compare each file's
    per-dimension min/max span against the naive time-partitioned
    layout. Narrow spans = effective min/max file skipping for point
    filters on EITHER dimension; the time layout's user span is the
    full domain (every user appears in every window), which is
    exactly why single-dimension layouts can't prune the other column.

    All-integer: the Morton code is div/mod arithmetic, buckets are
    integer division, spans are max-min; two rounded divides at
    output. One corpus pass per layout, bounded 16-row rollups."""
    ev = load(spark, sf, "events")
    base = ev.select(
        (F.col("user_id") % 16).alias("__x"),
        (
            (F.hour("ts").cast("long") * 60 + F.minute("ts").cast("long"))
            / F.lit(90)
        ).cast("long").alias("__y"),
        F.dayofmonth("ts").alias("__day"),
    )
    z = F.expr(_z_interleave_sql("__x", "__y", nbits=4))
    zed = base.select(
        "__x", "__y", (z / F.lit(16)).cast("long").alias("__bucket")
    ).withColumn("layout", F.lit("zorder"))
    ted = base.select(
        "__x",
        "__y",
        ((F.col("__day") - 1) / F.lit(2)).cast("long").alias("__bucket"),
    ).withColumn("layout", F.lit("time"))
    both = zed.unionByName(ted)
    spans = both.groupBy("layout", "__bucket").agg(
        (F.max("__x") - F.min("__x")).alias("__ux"),
        (F.max("__y") - F.min("__y")).alias("__uy"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        spans.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum("__n").cast("bigint").alias("n_rows"),
            F.round(
                F.sum("__ux").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_user_span"),
            F.round(
                F.sum("__uy").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_cell_span"),
        )
        .orderBy("layout")
    )


def _zo01_oracle_sql() -> str:
    zexpr = _z_interleave_sql("x", "y", nbits=4, idiv="//")
    return f"""
WITH base AS (
  SELECT user_id % 16 AS x,
         CAST((EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts))
              // 90 AS BIGINT) AS y,
         EXTRACT(day FROM ts) AS day
  FROM events
), both_t AS (
  SELECT 'zorder' AS layout, x, y,
         CAST(({zexpr}) // 16 AS BIGINT) AS bucket
  FROM base
  UNION ALL
  SELECT 'time' AS layout, x, y,
         CAST((day - 1) // 2 AS BIGINT) AS bucket
  FROM base
), spans AS (
  SELECT layout, bucket,
         MAX(x) - MIN(x) AS ux, MAX(y) - MIN(y) AS uy,
         COUNT(*) AS n
  FROM both_t GROUP BY 1, 2
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       ROUND(CAST(SUM(ux) AS DOUBLE) / COUNT(*), 4) AS avg_user_span,
       ROUND(CAST(SUM(uy) AS DOUBLE) / COUNT(*), 4) AS avg_cell_span
FROM spans GROUP BY layout ORDER BY layout
"""


ROUND7_STAGED_QUERIES.update(
    {
        "qf03_c4_heuristic_filters": qf03_c4_heuristic_filters,
        "ret01_weekly_cohort_retention": ret01_weekly_cohort_retention,
        "zo01_zorder_locality": zo01_zorder_locality,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "qf03_c4_heuristic_filters": _QF03_ORACLE,
        "ret01_weekly_cohort_retention": _RET01_ORACLE,
        "zo01_zorder_locality": _zo01_oracle_sql(),
    }
)


# ---------------------------------------------------------------------------
# Round-8 staging, wave 35: ln01 near-dup source-conflict audit, ts03
# revenue autocorrelation table.


def ln01_neardup_source_conflict(spark: SparkSession, sf: str) -> DataFrame:
    """Source-conflict audit over the verified near-dup graph: how
    many near-duplicate pairs CROSS source boundaries (the same text
    syndicated/mirrored into two feeds) versus stay within one. A
    high cross-source share means per-source dedup alone under-
    deduplicates the union corpus and a global pass is mandatory —
    the go/no-go number for sharding dedup BY source at scale.

    Rides the shared `_neardup_good_edges` kernel (exact Jaccard
    >= 0.5 on the LSH band candidates — one tokenize/sign per
    process, the dd06/gr02/tc01 contract), so the only new work is
    two doc-keyed label joins and a bounded source-pair rollup."""
    good = _neardup_good_edges(spark, sf)
    docs = load(spark, sf, "documents").select("doc_id", "source")
    labeled = (
        good.join(
            docs.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("__sa")
            ),
            "id_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("__sb")
            ),
            "id_b",
        )
        .select(
            F.least("__sa", "__sb").alias("source_lo"),
            F.greatest("__sa", "__sb").alias("source_hi"),
        )
    )
    return (
        labeled.groupBy("source_lo", "source_hi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            "source_lo",
            "source_hi",
            "n_pairs",
            (F.col("source_lo") != F.col("source_hi")).alias("is_cross"),
        )
        .orderBy("source_lo", "source_hi")
    )


def _ln01_oracle_sql() -> str:
    return f"""
WITH {_neardup_good_cte()}, labeled AS (
  SELECT LEAST(da.source, db.source) AS source_lo,
         GREATEST(da.source, db.source) AS source_hi
  FROM good g
  JOIN documents da ON da.doc_id = g.id_a
  JOIN documents db ON db.doc_id = g.id_b
)
SELECT source_lo, source_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       source_lo <> source_hi AS is_cross
FROM labeled GROUP BY 1, 2 ORDER BY source_lo, source_hi
"""


def ts03_revenue_autocorrelation(spark: SparkSession, sf: str) -> DataFrame:
    """Autocorrelation table (lags 1–7) of the daily order-revenue
    series — the seasonality detector that tells a pipeline WHICH
    seasonal-naive baseline ts01 should use and whether ts02's CUSUM
    needs de-seasonalizing first (a weekly cycle shows up as a lag-7
    peak).

    Determinism: the daily series is an exact DECIMAL(18,2) sum; all
    five Pearson moments accumulate as DECIMAL/BIGINT (products as
    DECIMAL(38,4) — exact), and the correlation is ONE fixed-order
    double expression over those exact sums, rounded at output. The
    lag join is an equi-join on (day_index + lag) after exploding the
    bounded 7-lag roster; the series itself is bounded by the
    calendar, not the corpus."""
    orders = load(spark, sf, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").alias("__d"))
        .agg(F.sum(dec("o_totalprice")).alias("__rev"))
        .select(
            F.datediff(F.col("__d"), F.lit("1992-01-01")).cast("long").alias(
                "__i"
            ),
            "__rev",
        )
    )
    lags = daily.select(
        "__i", "__rev", F.explode(F.expr("sequence(1, 7)")).alias("lag")
    )
    x = lags.select(
        (F.col("__i") + F.col("lag")).alias("__j"),
        "lag",
        F.col("__rev").alias("__x"),
    )
    y = daily.select(F.col("__i").alias("__j"), F.col("__rev").alias("__y"))
    m = x.join(y, "__j")
    moments = m.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(
            (F.col("__x") * F.col("__y")).cast("decimal(38,4)")
        ).alias("__sxy"),
        F.sum(
            (F.col("__x") * F.col("__x")).cast("decimal(38,4)")
        ).alias("__sxx"),
        F.sum(
            (F.col("__y") * F.col("__y")).cast("decimal(38,4)")
        ).alias("__syy"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    return (
        moments.select(
            "lag",
            F.col("__n").cast("bigint").alias("n_pairs"),
            F.round(
                (n * sxy - sx * sy)
                / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                6,
            ).alias("acf"),
        )
        .orderBy("lag")
    )


_TS03_ORACLE = """
WITH daily AS (
  SELECT CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
              AS BIGINT) AS i,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
), lags AS (
  SELECT i, rev, lag FROM daily
  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag)
), m AS (
  SELECT l.lag, l.rev AS x, d.rev AS y
  FROM lags l JOIN daily d ON d.i = l.i + l.lag
), mom AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x * y AS DECIMAL(38,4))) AS sxy,
         SUM(CAST(x * x AS DECIMAL(38,4))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(38,4))) AS syy
  FROM m GROUP BY lag
)
SELECT lag, n AS n_pairs,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS acf
FROM mom ORDER BY lag
"""


ROUND7_STAGED_QUERIES.update(
    {
        "ln01_neardup_source_conflict": ln01_neardup_source_conflict,
        "ts03_revenue_autocorrelation": ts03_revenue_autocorrelation,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "ln01_neardup_source_conflict": _ln01_oracle_sql(),
        "ts03_revenue_autocorrelation": _TS03_ORACLE,
    }
)


# ---------------------------------------------------------------------------
# Round-8 staging, wave 36: dd16 winnowing fingerprints, mm07 magic-byte
# container sniffing.


def dd16_winnowing_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """WINNOWING document fingerprints (Schleimer et al. 2003, the
    MOSS algorithm, §4): hash every 16-char window of the normalized
    text with the polynomial h = sum c_j * 131^(15-j) mod (2^31-1),
    then keep the MINIMUM hash of every 8 consecutive window hashes —
    the guarantee winnowing buys over "sample every j-th hash" is that
    any shared substring of length >= 16 + 8 - 1 = 23 chars produces
    at least one IDENTICAL selected fingerprint in both documents, so
    the fingerprint join below is a COMPLETE detector for >= 23-char
    overlap (dd14's global-min is the w -> infinity special case).

    Per source: docs fingerprinted, mean selected fingerprints per doc,
    docs sharing >= 1 fingerprint with ANOTHER doc, and the shared-
    fingerprint incidences — the MOSS candidate pool dd08/dd09 verify.

    This is the engine's one deliberate Pandas-UDF hot path among the
    dedup kernels: per-window hashing is O(L) DIGESTS per document,
    and both the md5 route and the per-char aggregate fold measured
    ~0.4-2k windows/sec through Spark's interpreted lambda
    interpreter — 100x too slow. The mapInPandas kernel vectorizes
    the whole document with numpy stride tricks (windows x powers
    mod-dot, sliding min, unique) at microseconds per document, stays
    integer-exact (products < 2^38, sums < 2^42 — no overflow), and
    keeps the distributed shape identical: Arrow batches per
    partition, ZERO shuffle before the fingerprint-keyed dedup and
    the bounded source rollup. The DuckDB twin folds the identical
    polynomial in SQL, which certifies the numpy arithmetic."""
    import pandas as _pd

    K, W, P = 16, 8, 2147483647
    pows = [pow(131, K - 1 - j, P) for j in range(K)]
    docs = load(spark, sf, "documents").select("doc_id", "source", "text")

    def op(batches):
        import numpy as np
        from numpy.lib.stride_tricks import sliding_window_view

        pw = np.array(pows, dtype=np.int64)
        for pdf in batches:
            out_doc: list = []
            out_src: list = []
            out_fp: list = []
            norm = (
                pdf["text"]
                .astype("string")
                .str.lower()
                .str.replace("[^a-z0-9]+", "", regex=True)
            )
            for doc_id, src, s in zip(pdf["doc_id"], pdf["source"], norm):
                if s is None or len(s) < K + W - 1:
                    continue
                codes = np.frombuffer(
                    s.encode("ascii"), dtype=np.uint8
                ).astype(np.int64)
                wins = sliding_window_view(codes, K)
                h = ((wins * pw) % P).sum(axis=1) % P
                fps = np.unique(sliding_window_view(h, W).min(axis=1))
                out_doc.extend([doc_id] * len(fps))
                out_src.extend([src] * len(fps))
                out_fp.extend(int(v) for v in fps)
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(out_doc, dtype="int64"),
                    "source": _pd.Series(out_src, dtype="string"),
                    "__fp": _pd.Series(out_fp, dtype="int64"),
                }
            )

    fpd = docs.mapInPandas(
        op, schema="doc_id long, source string, __fp long"
    ).localCheckpoint()
    shared = (
        fpd.groupBy("__fp")
        .agg(F.countDistinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= 2)
    )
    per_doc = (
        fpd.join(shared, "__fp", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("__nfp"),
            F.count_if(F.col("__nd").isNotNull()).alias("__nshared"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum("__nfp").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_fingerprints"),
            F.count_if(F.col("__nshared") >= 1)
            .cast("bigint")
            .alias("n_docs_with_shared"),
            F.sum("__nshared").cast("bigint").alias("shared_incidences"),
        )
        .orderBy("source")
    )


_DD16_ORACLE = """
WITH d AS (
  SELECT doc_id, source,
         regexp_replace(lower(text), '[^a-z0-9]+', '', 'g') AS s
  FROM documents
), hashed AS (
  SELECT doc_id, source,
         CASE WHEN length(s) >= 23 THEN
           list_transform(range(1, length(s) - 14),
             i -> list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                      list_transform(range(0, 16),
                        x -> CAST(ascii(substr(s,
                               CAST(i + x AS INT), 1)) AS BIGINT))),
                    (acc, x) -> (acc * 131 + x) % 2147483647))
         ELSE NULL END AS hs
  FROM d
), fps0 AS (
  SELECT doc_id, source,
         list_distinct(list_transform(range(1, len(hs) - 6),
           j -> list_min(array_slice(hs, j, j + 7)))) AS fps
  FROM hashed WHERE hs IS NOT NULL
), fpd AS (
  SELECT doc_id, source, unnest(fps) AS fp
  FROM fps0
), shared AS (
  SELECT fp FROM fpd GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
), per_doc AS (
  SELECT f.doc_id, f.source,
         COUNT(*) AS nfp,
         COUNT(*) FILTER (WHERE s.fp IS NOT NULL) AS nshared
  FROM fpd f LEFT JOIN shared s ON s.fp = f.fp
  GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(nfp) AS DOUBLE) / COUNT(*), 4) AS avg_fingerprints,
       CAST(COUNT(*) FILTER (WHERE nshared >= 1) AS BIGINT)
         AS n_docs_with_shared,
       CAST(SUM(nshared) AS BIGINT) AS shared_incidences
FROM per_doc GROUP BY source ORDER BY source
"""


def mm07_magic_byte_sniffing(spark: SparkSession, sf: str) -> DataFrame:
    """Container-format sniffing on the binary payload column — the
    first branch of every multimodal ingest DAG: route each payload by
    its MAGIC BYTES (FFD8FF JPEG, 89504E47 PNG, 52494646 RIFF) to the
    right decoder, never by the self-reported mime/extension. Payloads
    are synthesized deterministically (media_id-keyed magic prefixes
    over the utf-8 document bytes — the mm01/mm06 adapter convention,
    since no codec libraries ship in this container); the sniff logic,
    schema, and rollup are the production shape unchanged.

    Row-local byte ops only (concat, hex-prefix compare — both engines
    print identical uppercase hex), one bounded (source x format)
    rollup. At 100 TB: sniffing costs one 4-byte read per payload and
    the demux is a partition-local filter — zero shuffle before the
    per-format accounting."""
    media = documents_as_media(load(spark, sf, "documents"))
    payload = media.select(
        "media_id",
        "source",
        F.concat(
            F.expr(
                "CASE CAST(media_id % 4 AS INT) "
                "WHEN 0 THEN X'FFD8FFE0' "
                "WHEN 1 THEN X'89504E47' "
                "WHEN 2 THEN X'52494646' "
                "ELSE X'' END"
            ),
            F.col("content"),
        ).alias("__p"),
    )
    sniffed = payload.select(
        "source",
        F.length("__p").cast("bigint").alias("__bytes"),
        F.when(
            F.expr("left(hex(__p), 8)") == "FFD8FFE0", F.lit("image/jpeg")
        )
        .when(F.expr("left(hex(__p), 8)") == "89504E47", F.lit("image/png"))
        .when(F.expr("left(hex(__p), 8)") == "52494646", F.lit("audio/riff"))
        .otherwise(F.lit("application/octet-stream"))
        .alias("sniffed_mime"),
    )
    return (
        sniffed.groupBy("source", "sniffed_mime")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_payloads"),
            F.sum("__bytes").cast("bigint").alias("total_bytes"),
            F.round(
                F.sum("__bytes").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_bytes"),
        )
        .orderBy("source", "sniffed_mime")
    )


_MM07_ORACLE = """
WITH payload AS (
  SELECT doc_id AS media_id, source,
         (CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN unhex('FFD8FFE0')
            WHEN 1 THEN unhex('89504E47')
            WHEN 2 THEN unhex('52494646')
            ELSE unhex('') END) || encode(text) AS p
  FROM documents
), sniffed AS (
  SELECT source, CAST(octet_length(p) AS BIGINT) AS bytes,
         CASE left(hex(p), 8)
           WHEN 'FFD8FFE0' THEN 'image/jpeg'
           WHEN '89504E47' THEN 'image/png'
           WHEN '52494646' THEN 'audio/riff'
           ELSE 'application/octet-stream' END AS sniffed_mime
  FROM payload
)
SELECT source, sniffed_mime,
       CAST(COUNT(*) AS BIGINT) AS n_payloads,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       ROUND(CAST(SUM(bytes) AS DOUBLE) / COUNT(*), 4) AS avg_bytes
FROM sniffed GROUP BY 1, 2 ORDER BY source, sniffed_mime
"""


ROUND7_STAGED_QUERIES.update(
    {
        "dd16_winnowing_fingerprints": dd16_winnowing_fingerprints,
        "mm07_magic_byte_sniffing": mm07_magic_byte_sniffing,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "dd16_winnowing_fingerprints": _DD16_ORACLE,
        "mm07_magic_byte_sniffing": _MM07_ORACLE,
    }
)


def _register_staged_streaming_wave37() -> None:
    from ..streaming.queries import ST15_STAGED_ORACLE, st15_scd_asof_enrich

    ROUND7_STAGED_QUERIES["st15_scd_asof_enrich"] = st15_scd_asof_enrich
    ROUND7_STAGED_ORACLE["st15_scd_asof_enrich"] = ST15_STAGED_ORACLE


_register_staged_streaming_wave37()


# ---------------------------------------------------------------------------
# Round-8 staging, wave 38: hll03 HLL merge certification, mi01
# lang-source mutual information, ab01 two-proportion drift z-test.


def hll03_hll_mergeability(spark: SparkSession, sf: str) -> DataFrame:
    """HLL MERGE certification — the property that makes hll02 a
    100 TB operator at all: registers built independently on DISJOINT
    shards (user_id % 3 — three simulated ingest batches) and merged
    by bucket-wise MAX must equal the full-corpus registers digest-
    for-digest. hq02 certifies this additivity for the histogram
    sketch and cm01 for Count-Min; this closes the triple for HLL.
    A red ``merge_exact`` turns any future non-max-mergeable register
    statistic (the classic bug: merging ESTIMATES instead of
    registers) into a failing driver row.

    Same shuffle shape as hll02 twice over: per-(type, shard, bucket)
    MAX partials map-side combine, and both digests are exact BIGINT
    sums — no float enters the comparison."""
    rest_zero_rho = HLL_REST_BITS + 1
    hashed = (
        load(spark, sf, "events")
        .select(
            "event_type",
            "user_id",
            dd.hash60(F.col("user_id").cast("string")).alias("__h"),
        )
        .select(
            "event_type",
            (F.col("user_id") % 3).alias("__shard"),
            (F.col("__h") % HLL_M).alias("__b"),
            F.expr(
                f"CASE WHEN __h div {HLL_M} = 0 THEN {rest_zero_rho} "
                f"ELSE {HLL_REST_BITS} - length(bin(__h div {HLL_M})) + 1 "
                f"END"
            ).alias("__rho"),
        )
    )

    def digest(regs):
        return regs.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("occupied"),
            (
                F.sum(
                    F.expr(
                        f"shiftleft(CAST(1 AS BIGINT), "
                        f"{rest_zero_rho} - __mx)"
                    )
                )
                + (F.count(F.lit(1)) - F.lit(HLL_M)).cast("bigint")
                * F.lit(-(1 << rest_zero_rho))
            ).cast("bigint").alias("register_digest"),
        )

    full = digest(
        hashed.groupBy("event_type", "__b").agg(F.max("__rho").alias("__mx"))
    )
    shard_regs = hashed.groupBy("event_type", "__shard", "__b").agg(
        F.max("__rho").alias("__mx")
    )
    merged = digest(
        shard_regs.groupBy("event_type", "__b").agg(
            F.max("__mx").alias("__mx")
        )
    )
    f = full.select(
        "event_type",
        F.col("occupied").alias("occupied_full"),
        F.col("register_digest").alias("digest_full"),
    )
    m = merged.select(
        "event_type",
        F.col("occupied").alias("occupied_merged"),
        F.col("register_digest").alias("digest_merged"),
    )
    return (
        f.join(m, "event_type")
        .select(
            "event_type",
            "occupied_full",
            "digest_full",
            "digest_merged",
            (
                (F.col("digest_full") == F.col("digest_merged"))
                & (F.col("occupied_full") == F.col("occupied_merged"))
            ).alias("merge_exact"),
        )
        .orderBy("event_type")
    )


def _hll03_oracle_sql() -> str:
    rest_zero_rho = HLL_REST_BITS + 1
    h = _H60.format(x="CAST(user_id AS VARCHAR)")
    two53 = 1 << rest_zero_rho
    return f"""
WITH hashed AS (
  SELECT event_type, user_id % 3 AS shard,
         ({h}) % {HLL_M} AS b,
         CASE WHEN ({h}) // {HLL_M} = 0 THEN {rest_zero_rho}
              ELSE {HLL_REST_BITS}
                   - length(bin(({h}) // {HLL_M})) + 1 END AS rho
  FROM events
), fullr AS (
  SELECT event_type, b, MAX(rho) AS mx FROM hashed GROUP BY 1, 2
), shardr AS (
  SELECT event_type, shard, b, MAX(rho) AS mx FROM hashed GROUP BY 1, 2, 3
), mergedr AS (
  SELECT event_type, b, MAX(mx) AS mx FROM shardr GROUP BY 1, 2
), df AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS occupied,
         CAST(SUM(CAST(1 AS BIGINT) << ({rest_zero_rho} - mx))
              + ({HLL_M} - COUNT(*)) * CAST({two53} AS BIGINT) AS BIGINT)
           AS digest
  FROM fullr GROUP BY 1
), dm AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS occupied,
         CAST(SUM(CAST(1 AS BIGINT) << ({rest_zero_rho} - mx))
              + ({HLL_M} - COUNT(*)) * CAST({two53} AS BIGINT) AS BIGINT)
           AS digest
  FROM mergedr GROUP BY 1
)
SELECT f.event_type,
       f.occupied AS occupied_full,
       f.digest AS digest_full,
       m.digest AS digest_merged,
       f.digest = m.digest AND f.occupied = m.occupied AS merge_exact
FROM df f JOIN dm m ON f.event_type = m.event_type
ORDER BY f.event_type
"""


def mi01_label_source_mutual_information(
    spark: SparkSession, sf: str
) -> DataFrame:
    """Mutual information between the language label and the source
    feed — the feature-label LEAKAGE detector for mixture design: high
    MI means source identity predicts language (training on source-
    stratified splits then leaks label information; near-zero MI means
    the mixture is language-balanced per feed).

    The tx09 determinism rule end to end: joint and marginal counts
    are exact BIGINTs on a bounded |L|x|S| table; each cell's
    pointwise log2 term is computed ONCE on that bounded table and
    rounded to 8 dp; contributions weight the rounded value by the
    exact probability ratio and round at output. Nothing corpus-sized
    ever meets a transcendental."""
    docs = load(spark, sf, "documents")
    joint = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    from pyspark.sql import Window

    wl = Window.partitionBy("lang")
    ws = Window.partitionBy("source")
    wall = Window.partitionBy()
    cells = joint.select(
        "lang",
        "source",
        "__c",
        F.sum("__c").over(wl).alias("__rl"),
        F.sum("__c").over(ws).alias("__cs"),
        F.sum("__c").over(wall).alias("__n"),
    )
    pmi = F.round(
        F.log2(
            F.col("__c").cast("double")
            * F.col("__n").cast("double")
            / (F.col("__rl").cast("double") * F.col("__cs").cast("double"))
        ),
        8,
    )
    return (
        cells.select(
            "lang",
            "source",
            F.col("__c").cast("bigint").alias("n_docs"),
            pmi.alias("pmi"),
            F.round(
                (F.col("__c").cast("double") / F.col("__n").cast("double"))
                * pmi,
                8,
            ).alias("mi_contribution"),
        )
        .orderBy("lang", "source")
    )


_MI01_ORACLE = """
WITH joint AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), cells AS (
  SELECT lang, source, c,
         SUM(c) OVER (PARTITION BY lang) AS rl,
         SUM(c) OVER (PARTITION BY source) AS cs,
         SUM(c) OVER () AS n
  FROM joint
)
SELECT lang, source, c AS n_docs,
       ROUND(log2(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
             / (CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE))), 8) AS pmi,
       ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             * ROUND(log2(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
               / (CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE))), 8), 8)
         AS mi_contribution
FROM cells ORDER BY lang, source
"""


def ab01_proportion_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Two-proportion z-test between every source pair on a quality
    pass rate (terminal punctuation, qf03's rule 1) — the A/B-shaped
    drift alarm for binary quality metrics, next to ks01 (continuous)
    and mw01 (ordinal): z = (p_a - p_b) / sqrt(p(1-p)(1/n_a + 1/n_b))
    with the pooled p under H0.

    The per-source (n, k) table is bounded (|S| rows) from ONE
    conditional-agg corpus pass; the pair stage is an S² self-join on
    that bounded frame (BNLJ-allowlisted); the statistic is one
    fixed-order double expression over exact integers, rounded at
    output — both engines evaluate the identical literal tree."""
    docs = load(spark, sf, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.count_if(F.expr("rtrim(text) rlike '[.!?]$'"))
        .cast("long")
        .alias("__k"),
    )
    a = per.select(
        F.col("source").alias("source_a"),
        F.col("__n").alias("__na"),
        F.col("__k").alias("__ka"),
    )
    b = per.select(
        F.col("source").alias("source_b"),
        F.col("__n").alias("__nb"),
        F.col("__k").alias("__kb"),
    )
    na = F.col("__na").cast("double")
    nb = F.col("__nb").cast("double")
    ka = F.col("__ka").cast("double")
    kb = F.col("__kb").cast("double")
    pool = (ka + kb) / (na + nb)
    # pooled rate exactly 0 or 1 => zero variance: the test is
    # undefined, emit NULL (both engines via NULLIF)
    z = (ka / na - kb / nb) / F.nullif(
        F.sqrt(
            pool
            * (F.lit(1.0) - pool)
            * (F.lit(1.0) / na + F.lit(1.0) / nb)
        ),
        F.lit(0.0),
    )
    return (
        a.join(b, F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.col("__na").cast("bigint").alias("n_a"),
            F.col("__nb").cast("bigint").alias("n_b"),
            F.round(ka / na, 6).alias("rate_a"),
            F.round(kb / nb, 6).alias("rate_b"),
            F.round(z, 6).alias("z_stat"),
        )
        .orderBy("source_a", "source_b")
    )


_AB01_ORACLE = """
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (
           WHERE regexp_matches(rtrim(text), '[.!?]$')) AS BIGINT) AS k
  FROM documents GROUP BY source
)
SELECT a.source AS source_a, b.source AS source_b,
       a.n AS n_a, b.n AS n_b,
       ROUND(CAST(a.k AS DOUBLE) / CAST(a.n AS DOUBLE), 6) AS rate_a,
       ROUND(CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE), 6) AS rate_b,
       ROUND((CAST(a.k AS DOUBLE) / CAST(a.n AS DOUBLE)
              - CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE))
             / NULLIF(sqrt(((CAST(a.k AS DOUBLE) + CAST(b.k AS DOUBLE))
                     / (CAST(a.n AS DOUBLE) + CAST(b.n AS DOUBLE)))
                    * (1.0 - (CAST(a.k AS DOUBLE) + CAST(b.k AS DOUBLE))
                       / (CAST(a.n AS DOUBLE) + CAST(b.n AS DOUBLE)))
                    * (1.0 / CAST(a.n AS DOUBLE)
                       + 1.0 / CAST(b.n AS DOUBLE))), 0.0), 6) AS z_stat
FROM per a JOIN per b ON a.source < b.source
ORDER BY source_a, source_b
"""


ROUND7_STAGED_QUERIES.update(
    {
        "hll03_hll_mergeability": hll03_hll_mergeability,
        "mi01_label_source_mutual_information": (
            mi01_label_source_mutual_information
        ),
        "ab01_proportion_drift": ab01_proportion_drift,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "hll03_hll_mergeability": _hll03_oracle_sql(),
        "mi01_label_source_mutual_information": _MI01_ORACLE,
        "ab01_proportion_drift": _AB01_ORACLE,
    }
)


# ---------------------------------------------------------------------------
# Round-8 staging, wave 39: gr03 star-contraction connected components,
# en01 per-source character entropy.


def gr03_cc_star_contraction(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup clustering recomputed with the ALTERNATING-STAR
    connected-components algorithm (Kiveris et al. SOCC'14 — see
    operators/graph.connected_components_star) over the SAME verified
    edge set dd06 clusters with min-label propagation. Same fixpoint
    by construction (labels = min reachable doc_id), so it certifies
    against dd06's recursive-CTE oracle UNCHANGED — one spec, two
    distributed algorithms, which is exactly the guarantee that makes
    the O(log n)-round variant safe to swap in for long-diameter
    graphs at scale."""
    from ..operators.graph import connected_components_star

    good = _neardup_good_edges(spark, sf)
    verts = load(spark, sf, "documents").select("doc_id")
    return (
        connected_components_star(
            verts, good, id_col="doc_id", src="id_a", dst="id_b"
        )
        .select(F.col("id").alias("doc_id"), "component")
        .orderBy("doc_id")
    )


def en01_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source character-level Shannon entropy over the normalized
    alphabet — the cheapest gibberish/encoding-noise detector there
    is: natural-language feeds sit in a narrow entropy band, OCR
    noise and base64 blobs spike it, template spam collapses it. The
    information-theory sibling of mi01 (which measures BETWEEN-column
    information; this measures within-column spread).

    tx09/mi01 determinism rule: char counts are exact BIGINTs on a
    bounded |alphabet|x|S| table; each cell's log2 term is computed
    once there, rounded to 8 dp, weighted by the exact probability,
    rounded to 10 dp, cast DECIMAL(20,10), and the entropy is the
    ORDER-INDEPENDENT decimal sum of those cells. The only corpus-
    sized operation is one explode + keyed count (map-side
    combinable)."""
    docs = load(spark, sf, "documents").select(
        "source",
        F.regexp_replace(F.lower("text"), "[^a-z0-9]+", "").alias("__s"),
    )
    chars = docs.select(
        "source", F.explode(F.expr("split(__s, '')")).alias("__ch")
    ).filter(F.col("__ch") != "")
    counts = chars.groupBy("source", "__ch").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    from pyspark.sql import Window

    ws = Window.partitionBy("source")
    cells = counts.select(
        "source",
        "__ch",
        "__c",
        F.sum("__c").over(ws).alias("__n"),
    )
    contrib = F.round(
        -(F.col("__c").cast("double") / F.col("__n").cast("double"))
        * F.round(
            F.log2(
                F.col("__c").cast("double") / F.col("__n").cast("double")
            ),
            8,
        ),
        10,
    ).cast("decimal(20,10)")
    return (
        cells.select("source", "__c", "__n", contrib.alias("__e"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
            F.max("__n").cast("bigint").alias("n_chars_total"),
            F.round(F.sum("__e").cast("double"), 6).alias("entropy_bits"),
        )
        .orderBy("source")
    )


_EN01_ORACLE = """
WITH d AS (
  SELECT source,
         regexp_replace(lower(text), '[^a-z0-9]+', '', 'g') AS s
  FROM documents
), chars AS (
  SELECT source, unnest(string_split(s, '')) AS ch FROM d
), counts AS (
  SELECT source, ch, CAST(COUNT(*) AS BIGINT) AS c
  FROM chars WHERE ch <> '' GROUP BY 1, 2
), cells AS (
  SELECT source, ch, c, SUM(c) OVER (PARTITION BY source) AS n
  FROM counts
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
       CAST(MAX(n) AS BIGINT) AS n_chars_total,
       ROUND(CAST(SUM(CAST(ROUND(
           -(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
           * ROUND(log2(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 8), 10)
         AS DECIMAL(20,10))) AS DOUBLE), 6) AS entropy_bits
FROM cells GROUP BY source ORDER BY source
"""


ROUND7_STAGED_QUERIES.update(
    {
        "gr03_cc_star_contraction": gr03_cc_star_contraction,
        "en01_char_entropy": en01_char_entropy,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "gr03_cc_star_contraction": EXTENSION_ORACLE[
            "dd06_neardup_clusters"
        ],
        "en01_char_entropy": _EN01_ORACLE,
    }
)


# ---------------------------------------------------------------------------
# Round-8 staging, wave 40: tx20 stupid-backoff LM scoring, ev01 ANN
# ranking-quality metrics (MRR / nDCG@10).


def tx20_stupid_backoff_scoring(spark: SparkSession, sf: str) -> DataFrame:
    """HELD-OUT language-model scoring with STUPID BACKOFF (Brants et
    al. 2007, "Large Language Models in Machine Translation" — the
    smoothing web-scale LMs actually shipped): the bigram model trains
    on EVEN doc_ids and scores the ODD held-out docs, so unseen
    bigrams genuinely exercise the backoff path (score = 0.4 ·
    unigram relative frequency; a self-trained model would never back
    off, which is tx13's in-corpus regime). Per language: held-out
    docs scored, mean per-doc log2-score, and the backoff rate — the
    coverage number that says whether the bigram table is big enough.

    Determinism: each distinct (lang, prev, cur) score is computed
    ONCE on the bounded model join and rounded to 8 dp; per-doc means
    sum those as DECIMAL(18,8) (order-independent) with one 6-dp
    rounded divide; the per-lang rollup decimal-sums the rounded
    per-doc means. Unseen-unigram fallback counts COALESCE to 1 in
    both engines. Scale: model tables are vocab-sized; the scoring
    join is one bigram-keyed shuffle AQE broadcasts when the model is
    small; train/eval split is a pushed row-local predicate."""
    from pyspark.sql import Window

    docs = _docs_words(spark, sf)
    bi = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(__words) >= 2 THEN "
                "transform(sequence(1, size(__words) - 1), "
                "i -> struct(element_at(__words, i) AS p, "
                "element_at(__words, i + 1) AS c)) "
                "ELSE CAST(array() AS "
                "ARRAY<STRUCT<p: STRING, c: STRING>>) END"
            )
        ).alias("__b"),
    ).select(
        "doc_id",
        "lang",
        F.col("__b.p").alias("__p"),
        F.col("__b.c").alias("__c"),
    )
    train = bi.filter(F.col("doc_id") % 2 == 0)
    model = (
        train.groupBy("lang", "__p", "__c")
        .agg(F.count(F.lit(1)).cast("long").alias("__c12"))
        .withColumn(
            "__c1",
            F.sum("__c12").over(Window.partitionBy("lang", "__p")),
        )
    )
    uni = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("lang", F.explode("__words").alias("__w"))
        .groupBy("lang", "__w")
        .agg(F.count(F.lit(1)).cast("long").alias("__c2"))
        .withColumn("__nl", F.sum("__c2").over(Window.partitionBy("lang")))
    )
    nl = uni.groupBy("lang").agg(F.max("__nl").alias("__n"))
    ev = bi.filter(F.col("doc_id") % 2 == 1)
    scored = (
        ev.join(model, ["lang", "__p", "__c"], "left")
        .join(
            uni.select("lang", F.col("__w").alias("__c"), "__c2"),
            ["lang", "__c"],
            "left",
        )
        .join(nl, "lang")
        .select(
            "doc_id",
            "lang",
            F.col("__c12").isNull().alias("__bo"),
            F.when(
                F.col("__c12").isNotNull(),
                F.round(
                    F.log2(
                        F.col("__c12").cast("double")
                        / F.col("__c1").cast("double")
                    ),
                    8,
                ),
            )
            .otherwise(
                F.round(
                    F.log2(
                        F.lit(0.4)
                        * F.coalesce(F.col("__c2"), F.lit(1)).cast("double")
                        / F.col("__n").cast("double")
                    ),
                    8,
                )
            )
            .cast("decimal(18,8)")
            .alias("__s"),
        )
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.round(
            F.sum("__s").cast("double") / F.count(F.lit(1)), 6
        )
        .cast("decimal(18,6)")
        .alias("__m"),
        F.count(F.lit(1)).alias("__nb"),
        F.count_if(F.col("__bo")).alias("__nbo"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_heldout_docs"),
            F.round(
                F.sum("__m").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_log2_score"),
            F.round(
                F.sum("__nbo").cast("double")
                / F.sum("__nb").cast("double"),
                6,
            ).alias("backoff_rate"),
        )
        .orderBy("lang")
    )


_TX20_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang, {_WORDS} AS ws FROM documents
), bi AS (
  SELECT doc_id, lang, ws[i] AS p, ws[i + 1] AS c
  FROM w CROSS JOIN (SELECT unnest(range(1, 2000)) AS i)
  WHERE len(ws) >= 2 AND i <= len(ws) - 1
), model AS (
  SELECT lang, p, c, CAST(COUNT(*) AS BIGINT) AS c12,
         SUM(COUNT(*)) OVER (PARTITION BY lang, p) AS c1
  FROM bi WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3
), uni AS (
  SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c2,
         SUM(COUNT(*)) OVER (PARTITION BY lang) AS nl
  FROM (SELECT lang, unnest(ws) AS word FROM w WHERE doc_id % 2 = 0)
  GROUP BY 1, 2
), nlang AS (
  SELECT lang, MAX(nl) AS n FROM uni GROUP BY lang
), scored AS (
  SELECT e.doc_id, e.lang,
         m.c12 IS NULL AS bo,
         CAST(CASE WHEN m.c12 IS NOT NULL THEN
             ROUND(log2(CAST(m.c12 AS DOUBLE) / CAST(m.c1 AS DOUBLE)), 8)
           ELSE
             ROUND(log2(0.4 * CAST(COALESCE(u.c2, 1) AS DOUBLE)
                        / CAST(nl2.n AS DOUBLE)), 8)
           END AS DECIMAL(18,8)) AS s
  FROM bi e
  LEFT JOIN model m ON m.lang = e.lang AND m.p = e.p AND m.c = e.c
  LEFT JOIN uni u ON u.lang = e.lang AND u.word = e.c
  JOIN nlang nl2 ON nl2.lang = e.lang
  WHERE e.doc_id % 2 = 1
), per_doc AS (
  SELECT doc_id, lang,
         CAST(ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6)
              AS DECIMAL(18,6)) AS m,
         COUNT(*) AS nb,
         COUNT(*) FILTER (WHERE bo) AS nbo
  FROM scored GROUP BY 1, 2
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_heldout_docs,
       ROUND(CAST(SUM(m) AS DOUBLE) / COUNT(*), 6) AS mean_log2_score,
       ROUND(CAST(SUM(nbo) AS DOUBLE) / CAST(SUM(nb) AS DOUBLE), 6)
         AS backoff_rate
FROM per_doc GROUP BY lang ORDER BY lang
"""


def ev01_ann_ranking_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-aware retrieval evaluation of the sign-LSH ANN path: MRR
    and binary-relevance nDCG@10 per query — the standard IR metrics
    next to es11's set-overlap recall (recall says WHETHER the true
    neighbors surface; MRR/nDCG say WHERE, which is what a retrieval-
    augmented pipeline actually pays for). Relevance = the exact
    cosine top-10 (es01's certified ranking), system = the bucketed
    candidate ranking (es03's certified path).

    Determinism: positions are integers from the two-phase ranked
    top-k; every DCG gain 1/log2(pos+1) is rounded to 8 dp and summed
    as DECIMAL(18,8) (order-independent); IDCG is the SAME gain
    expression over the exact leg's own positions, so the ratio never
    mixes engine-printed float literals. The exact leg is the bounded
    10-query eval baseline (broadcast panel), the ANN leg only scans
    bucket-joined candidates."""
    from pyspark.sql import Window

    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("__qe")
    )

    def ranked(scored, k=10):
        w1 = Window.partitionBy("__pid", "qid").orderBy(
            F.desc("__cos"), F.asc("vec_id")
        )
        w2 = Window.partitionBy("qid").orderBy(
            F.desc("__cos"), F.asc("vec_id")
        )
        return (
            scored.withColumn("__pid", F.spark_partition_id())
            .withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= k)
            .withColumn("pos", F.row_number().over(w2))
            .filter(F.col("pos") <= k)
            .select("qid", "vec_id", "pos")
        )

    exact = ranked(
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            sim.cosine(F.col("embedding"), F.col("__qe")).alias("__cos"),
        )
    )
    tables = []
    for t in range(LSH_TABLES):
        tables.append(
            emb.select(
                "vec_id",
                "embedding",
                sim.sign_bucket(
                    F.col("embedding"), nbits=LSH_NBITS, offset=t * LSH_NBITS
                ).alias("__bucket"),
                F.lit(t).alias("__tbl"),
            )
        )
    banded = tables[0]
    for tdf in tables[1:]:
        banded = banded.unionByName(tdf)
    qb = banded.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("__qe"),
        "__tbl",
        "__bucket",
    )
    ann = ranked(
        banded.join(F.broadcast(qb), ["__tbl", "__bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            sim.cosine(F.col("embedding"), F.col("__qe")).alias("__cos"),
        )
        .distinct()
    )
    gain = lambda pos: F.round(  # noqa: E731
        F.lit(1.0) / F.log2(pos.cast("double") + F.lit(1.0)), 8
    ).cast("decimal(18,8)")
    idcg = exact.groupBy("qid").agg(
        F.sum(gain(F.col("pos"))).alias("__idcg"),
        F.count(F.lit(1)).cast("bigint").alias("n_relevant"),
    )
    hits = ann.join(exact.select("qid", "vec_id"), ["qid", "vec_id"])
    dcg = hits.groupBy("qid").agg(
        F.sum(gain(F.col("pos"))).alias("__dcg"),
        F.min("pos").alias("__first"),
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
    )
    return (
        q.select("qid")
        .join(F.broadcast(idcg), "qid")
        .join(F.broadcast(dcg), "qid", "left")
        .select(
            F.col("qid").alias("query_id"),
            "n_relevant",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("__first").cast("double"), F.lit(0.0)
                ),
                6,
            ).alias("mrr"),
            F.round(
                F.coalesce(
                    F.col("__dcg").cast("double")
                    / F.col("__idcg").cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("ndcg_at_10"),
        )
        .orderBy("query_id")
    )


_EV01_ORACLE = f"""
WITH banded AS ({{banded}}),
qs AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10
), exact_pos AS (
  SELECT qid, vec_id, r AS pos FROM (
    SELECT q.qid, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.qid
             ORDER BY {{cos_eq}} DESC, e.vec_id) AS r
    FROM embeddings e CROSS JOIN qs q WHERE e.vec_id <> q.qid
  ) WHERE r <= 10
), qb AS (
  SELECT vec_id AS qid, embedding AS qe, tbl, bucket
  FROM banded WHERE vec_id < 10
), cand AS (
  SELECT DISTINCT q.qid, b.vec_id,
         {{cos_bq}} AS c
  FROM banded b JOIN qb q ON b.tbl = q.tbl AND b.bucket = q.bucket
  WHERE b.vec_id <> q.qid
), ann_pos AS (
  SELECT qid, vec_id, r AS pos FROM (
    SELECT qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS r
    FROM cand
  ) WHERE r <= 10
), idcg AS (
  SELECT qid,
         SUM(CAST(ROUND(1.0 / log2(CAST(pos AS DOUBLE) + 1.0), 8)
             AS DECIMAL(18,8))) AS i,
         CAST(COUNT(*) AS BIGINT) AS n_relevant
  FROM exact_pos GROUP BY qid
), dcg AS (
  SELECT a.qid,
         SUM(CAST(ROUND(1.0 / log2(CAST(a.pos AS DOUBLE) + 1.0), 8)
             AS DECIMAL(18,8))) AS d,
         MIN(a.pos) AS first_pos,
         CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM ann_pos a JOIN exact_pos e
    ON e.qid = a.qid AND e.vec_id = a.vec_id
  GROUP BY a.qid
)
SELECT q.qid AS query_id, i.n_relevant,
       COALESCE(d.n_hits, 0) AS n_hits,
       ROUND(COALESCE(1.0 / CAST(d.first_pos AS DOUBLE), 0.0), 6) AS mrr,
       ROUND(COALESCE(CAST(d.d AS DOUBLE) / CAST(i.i AS DOUBLE), 0.0), 6)
         AS ndcg_at_10
FROM qs q
JOIN idcg i ON i.qid = q.qid
LEFT JOIN dcg d ON d.qid = q.qid
ORDER BY query_id
"""


ROUND7_STAGED_QUERIES.update(
    {
        "tx20_stupid_backoff_scoring": tx20_stupid_backoff_scoring,
        "ev01_ann_ranking_quality": ev01_ann_ranking_quality,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "tx20_stupid_backoff_scoring": _TX20_ORACLE,
        "ev01_ann_ranking_quality": _EV01_ORACLE.format(
            banded=_BANDED,
            cos_eq=_COS.format(a="e.embedding", b="q.qe"),
            cos_bq=_COS.format(a="b.embedding", b="q.qe"),
        ),
    }
)


# ---------------------------------------------------------------------------
# Round-8 staging, wave 41: bj01 bucketed co-located star join.

_BJ01_TABLES: dict = {}


def bj01_bucketed_colocated_join(spark: SparkSession, sf: str) -> DataFrame:
    """The write-once-shuffle-never join, driver-certified: orders and
    lineitem are persisted as BUCKETED tables on the order key (the
    one-time shuffle, paid at write), and the revenue-per-priority
    star join then runs as an exchange-free SortMergeJoin over
    co-located bucket files — the layout a 100 TB fact↔fact join
    lives on (operators/bucketing.py documents the sizing; the pytest
    suite pins the no-Exchange plan property, tests/test_bucketing.py,
    and the staged invariant re-asserts it on THIS query's plan). The
    oracle is the plain join — identical results from a bucketed scan
    is exactly the claim worth a driver row.

    The bucketed tables build once per (process, sf) and reset with
    the shared intermediates, so benchmarks pay the write-path shuffle
    once per pass like every other materialized intermediate — as the
    timed "bjbase" carrier slot (bench.py), so bj01's own wall is the
    steady-state exchange-free join, the number the layout exists to
    buy (r7 verdict task 8)."""
    names = _bj01_layout(spark, sf)
    ord_t = spark.table(names[0]).hint("merge")
    li_t = spark.table(names[1])
    return (
        ord_t.join(li_t, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("__price") * (F.lit(1) - F.col("__disc")))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def _bj01_layout(spark: SparkSession, sf: str) -> tuple:
    """Build (once per process per sf) the bucketed orders/lineitem
    layout bj01 joins over; the write-path shuffle is the one-time cost
    the steady-state join amortizes. Benchmarks call this directly as
    the "bjbase" carrier slot."""
    from ..operators.bucketing import write_bucketed

    import hashlib

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    names = (f"bj01_orders_{tag}", f"bj01_lineitem_{tag}")
    if _BJ01_TABLES.get(sf) != names:
        # a previous PROCESS may have left the managed-table location
        # behind without a catalog entry (saveAsTable then refuses even
        # under overwrite) — drop both and clear stale locations first
        import shutil as _shutil

        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        for n in names:
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            _shutil.rmtree(f"{warehouse}/{n}", ignore_errors=True)
        write_bucketed(
            load(spark, sf, "orders").select(
                "o_orderkey", "o_orderpriority"
            ),
            names[0],
            "o_orderkey",
            buckets=8,
        )
        write_bucketed(
            load(spark, sf, "lineitem").select(
                F.col("l_orderkey").alias("o_orderkey"),
                dec("l_extendedprice").alias("__price"),
                dec("l_discount").alias("__disc"),
            ),
            names[1],
            "o_orderkey",
            buckets=8,
        )
        _BJ01_TABLES[sf] = names
    return names


_BJ01_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY o_orderpriority
"""


ROUND7_STAGED_QUERIES["bj01_bucketed_colocated_join"] = (
    bj01_bucketed_colocated_join
)
ROUND7_STAGED_ORACLE["bj01_bucketed_colocated_join"] = _BJ01_ORACLE


# ---------------------------------------------------------------------------
# Round-8 staging, wave 42: ss06 k-fold cross-validation assignment audit.


def ss06_kfold_assignment_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic K-fold cross-validation assignment + balance
    audit: fold = hash60(doc_id) mod 5 (the ss03 split-hash family —
    membership is a pure function of the id, so folds are stable
    under corpus growth and reproducible across engines), audited for
    the two properties CV depends on: size balance (each fold ≈ N/5)
    and label balance (each fold's language mix ≈ the corpus mix,
    summarized by the chi-square statistic of the fold's |L|-cell
    contingency row against corpus expectations).

    Determinism: fold sizes and (fold, lang) cells are exact BIGINTs;
    expected counts keep an exact integer numerator (n_fold *
    n_lang_total) and the chi-square cell terms — the ONE place a
    divide is unavoidable — are rounded to 8 dp on the bounded
    |folds|x|L| table and decimal-summed per fold (the mi01/tx09
    rule). One corpus pass, everything after is fold-vocabulary
    sized."""
    K = 5
    docs = load(spark, sf, "documents").select(
        (dd.hash60(F.col("doc_id").cast("string")) % K).alias("fold"),
        "lang",
    )
    cells = docs.groupBy("fold", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    from pyspark.sql import Window

    wf = Window.partitionBy("fold")
    wl = Window.partitionBy("lang")
    wall = Window.partitionBy()
    x = cells.select(
        "fold",
        "lang",
        "__c",
        F.sum("__c").over(wf).alias("__nf"),
        F.sum("__c").over(wl).alias("__nl"),
        F.sum("__c").over(wall).alias("__n"),
    )
    # chi-square cell: (c - e)^2 / e with e = nf*nl/n, computed as
    # one fixed-order double expression over exact integers
    diff = F.col("__c").cast("double") - (
        F.col("__nf") * F.col("__nl")
    ).cast("double") / F.col("__n").cast("double")
    term = F.round(
        diff
        * diff
        / (
            (F.col("__nf") * F.col("__nl")).cast("double")
            / F.col("__n").cast("double")
        ),
        8,
    ).cast("decimal(20,8)")
    return (
        x.select("fold", "__c", "__nf", "__n", term.alias("__t"))
        .groupBy("fold")
        .agg(
            F.max("__nf").cast("bigint").alias("n_docs"),
            F.round(
                F.lit(100.0)
                * F.max("__nf").cast("double")
                / F.max("__n").cast("double"),
                4,
            ).alias("share_pct"),
            F.round(F.sum("__t").cast("double"), 6).alias(
                "lang_chi_square"
            ),
        )
        .orderBy("fold")
    )


def _ss06_oracle_sql() -> str:
    h = _H60.format(x="CAST(doc_id AS VARCHAR)")
    return f"""
WITH d AS (
  SELECT ({h}) % 5 AS fold, lang FROM documents
), cells AS (
  SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM d GROUP BY 1, 2
), x AS (
  SELECT fold, lang, c,
         SUM(c) OVER (PARTITION BY fold) AS nf,
         SUM(c) OVER (PARTITION BY lang) AS nl,
         SUM(c) OVER () AS n
  FROM cells
)
SELECT fold,
       CAST(MAX(nf) AS BIGINT) AS n_docs,
       ROUND(100.0 * CAST(MAX(nf) AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 4)
         AS share_pct,
       ROUND(CAST(SUM(CAST(ROUND(
           (CAST(c AS DOUBLE)
            - CAST(nf * nl AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(c AS DOUBLE)
              - CAST(nf * nl AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(nf * nl AS DOUBLE) / CAST(n AS DOUBLE)), 8)
         AS DECIMAL(20,8))) AS DOUBLE), 6) AS lang_chi_square
FROM x GROUP BY fold ORDER BY fold
"""


ROUND7_STAGED_QUERIES["ss06_kfold_assignment_audit"] = (
    ss06_kfold_assignment_audit
)
ROUND7_STAGED_ORACLE["ss06_kfold_assignment_audit"] = _ss06_oracle_sql()


# ---------------------------------------------------------------------------
# Round-8 promotion (VERDICT r7 task 1): graduate all 28 staged queries into
# the live EXTENSION registries, in the verdict's priority order — the r6
# holdovers first (staged two rounds is too long), then gr03/hll03 (the
# algorithm- and merge-equivalence certifications), bj01 (the fact↔fact
# bucketed-join strategy), then waves 33–42. Every name below has a recorded
# sf0.1 wall in scripts/staged_sf01_walls.json (the dd14-lesson promotion
# precondition, swept 2026-08-15 at loadavg <0.3 — worst case gr03 6.95 s,
# which pays the shared CC-base rebuild per isolated run; it rides the
# ccbase carrier slot in the bench) — pinned by
# tests/test_staged_round7.py::test_promoted_queries_were_sf01_swept.
ROUND8_PROMOTED: list[str] = [
    # r6 holdovers
    "win05_activity_streaks",
    "win06_daily_ohlc",
    "rs01_mad_outliers",
    "cr01_value_time_correlation",
    "ts01_seasonal_naive_error",
    "hq02_mergeable_histogram",
    "sync01_bucket_checksum_diff",
    "tx17_bigram_continuations",
    # algorithm-equivalence certifications
    "gr03_cc_star_contraction",
    "hll03_hll_mergeability",
    # the fact↔fact bucketed co-located join strategy
    "bj01_bucketed_colocated_join",
    # waves 33–42
    "mw01_mann_whitney_drift",
    "tx18_flesch_readability",
    "tx19_lexical_richness",
    "qf03_c4_heuristic_filters",
    "ret01_weekly_cohort_retention",
    "zo01_zorder_locality",
    "ln01_neardup_source_conflict",
    "ts03_revenue_autocorrelation",
    "dd16_winnowing_fingerprints",
    "mm07_magic_byte_sniffing",
    "st15_scd_asof_enrich",
    "mi01_label_source_mutual_information",
    "ab01_proportion_drift",
    "en01_char_entropy",
    "tx20_stupid_backoff_scoring",
    "ev01_ann_ranking_quality",
    "ss06_kfold_assignment_audit",
]

for _name in ROUND8_PROMOTED:
    EXTENSION_QUERIES[_name] = ROUND7_STAGED_QUERIES.pop(_name)
    EXTENSION_ORACLE[_name] = ROUND7_STAGED_ORACLE.pop(_name)
del _name


# ---------------------------------------------------------------------------
# Round-9 staging, wave 43: mk01 Markov transitions, kl01 per-source
# unigram KL divergence, nv01 n-gram novelty (memorization audit).


def mk01_event_markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the behavioral-drift fingerprint next to ia01's
    inter-arrival stats: a bot cohort shows near-deterministic rows
    (one transition probability ≈ 1), organic traffic spreads mass.
    Reference parity: the reference's session analytics stop at counts
    per type; the transition structure is the sequence-aware upgrade a
    training-data pipeline uses to spot templated event logs.

    Scale: ONE shuffle by user_id for the lead() window (sequences are
    per-user, so the window never crosses keys and skew is bounded by
    the busiest user), then a keyed count onto the |types|² transition
    table — bounded by construction (5 types → ≤25 rows), on which the
    per-from-type probability window is driver-trivial. Determinism:
    sequence order is (ts, event_id) — event_id breaks timestamp ties
    exactly as rw01/win05 do; prob is an exact integer ratio rounded
    once to 6 dp."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
    )
    wf = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n_trans",
        F.round(
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(wf).cast("double"),
            6,
        ).alias("prob"),
    ).orderBy("from_type", "to_type")


_MK01_ORACLE = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_type
  FROM events
), t AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_trans,
       ROUND(CAST(n_trans AS DOUBLE)
             / CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS DOUBLE),
             6) AS prob
FROM t ORDER BY from_type, to_type
"""


def kl01_source_unigram_kl(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source unigram KL divergence vs the corpus distribution —
    THE distribution-shift number a data-mixing pipeline reads before
    reweighting (DoReMi-style domain reweighting starts from exactly
    these divergences; dm01 computes the weights, this measures how
    far each source actually sits from the mixture).

    Scale: token counts are exact BIGINTs built by ONE map-side-
    combinable keyed count over the exploded corpus; the cell table is
    |vocab|×|sources| (the tx09/tx10 regime — sublinear in corpus
    size), per-token corpus totals ride a window keyed by token (a
    shuffle of the CELL table, not the corpus), and the single 1-row
    grand total broadcasts (BNLJ allowlisted). Determinism (en01
    rule): each cell's log2 term is computed once on exact integer
    ratios, rounded to 8 dp, weighted by the exact probability,
    rounded to 10 dp, DECIMAL-summed order-independently, output
    rounded to 6 dp. KL(P_s ‖ Q) is finite by construction: every
    source token is in the corpus vocabulary (q > 0 wherever p > 0)."""
    from pyspark.sql import Window

    toks = _docs_words(spark, sf).select(
        "source", F.explode("__words").alias("__t")
    )
    st = toks.groupBy("source", "__t").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    ws = Window.partitionBy("source")
    wt = Window.partitionBy("__t")
    cells = st.select(
        "source",
        "__t",
        "__c",
        F.sum("__c").over(ws).alias("__ns"),
        F.sum("__c").over(wt).alias("__ct"),
    )
    total = st.agg(F.sum("__c").cast("long").alias("__N"))
    contrib = F.round(
        (F.col("__c").cast("double") / F.col("__ns").cast("double"))
        * F.round(
            F.log2(
                (F.col("__c").cast("double") * F.col("__N").cast("double"))
                / (F.col("__ns").cast("double") * F.col("__ct").cast("double"))
            ),
            8,
        ),
        10,
    ).cast("decimal(20,10)")
    return (
        cells.crossJoin(F.broadcast(total))
        .select("source", "__ns", contrib.alias("__kl"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
            F.max("__ns").cast("bigint").alias("n_tokens"),
            F.round(F.sum("__kl").cast("double"), 6).alias("kl_bits"),
        )
        .orderBy("source")
    )


_KL01_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest({_WORDS}) AS t FROM documents
), st AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY 1, 2
), cells AS (
  SELECT source, t, c,
         SUM(c) OVER (PARTITION BY source) AS ns,
         SUM(c) OVER (PARTITION BY t) AS ct,
         SUM(c) OVER () AS N
  FROM st
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(MAX(ns) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(CAST(ROUND(
           (CAST(c AS DOUBLE) / CAST(ns AS DOUBLE))
           * ROUND(log2(
               (CAST(c AS DOUBLE) * CAST(N AS DOUBLE))
               / (CAST(ns AS DOUBLE) * CAST(ct AS DOUBLE))
             ), 8), 10)
         AS DECIMAL(20,10))) AS DOUBLE), 6) AS kl_bits
FROM cells GROUP BY source ORDER BY source
"""


def nv01_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """N-gram novelty between a deterministic train/val parity split
    (even/odd doc_id, tx20's held-out convention): the fraction of the
    val split's distinct word 5-grams never seen in train — the
    memorization/leakage audit run before quoting held-out loss, and
    the distributional twin of sl01's exact-document leakage check
    (sl01 catches copied DOCUMENTS; this catches copied PHRASING).

    Scale: both gram sets are map-side-distinct exploded projections;
    the novelty test is ONE gram-keyed LEFT ANTI join per lang —
    hash-partitioned by (lang, gram), no broadcast of anything
    SF-proportional, no all-pairs anywhere. Counts are exact; the
    percentage is one integer ratio rounded to 4 dp."""
    docs = _docs_words(spark, sf).select(
        "lang", (F.col("doc_id") % 2 == 0).alias("__train"), "__words"
    )
    grams = docs.select(
        "lang",
        "__train",
        F.explode(dd.shingles(F.col("__words"), n=5)).alias("__g"),
    )
    train_g = (
        grams.filter("__train").select("lang", "__g").distinct()
    )
    val_g = (
        grams.filter(~F.col("__train")).select("lang", "__g").distinct()
    )
    novel = val_g.join(train_g, ["lang", "__g"], "left_anti")
    v = val_g.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_val_grams")
    )
    n = novel.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_novel")
    )
    return (
        v.join(n, "lang", "left")
        .select(
            "lang",
            "n_val_grams",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            F.round(
                F.lit(100.0)
                * F.coalesce("n_novel", F.lit(0)).cast("double")
                / F.col("n_val_grams").cast("double"),
                4,
            ).alias("novelty_pct"),
        )
        .orderBy("lang")
    )


_NV01_ORACLE = f"""
WITH d AS (
  SELECT lang, (doc_id % 2 = 0) AS train,
         {_sql_shingles(_WORDS, 5)} AS g
  FROM documents
), grams AS (
  SELECT lang, train, unnest(g) AS g FROM d
), train_g AS (
  SELECT DISTINCT lang, g FROM grams WHERE train
), val_g AS (
  SELECT DISTINCT lang, g FROM grams WHERE NOT train
), novel AS (
  SELECT v.lang, v.g FROM val_g v
  WHERE NOT EXISTS (
    SELECT 1 FROM train_g t WHERE t.lang = v.lang AND t.g = v.g
  )
)
SELECT v.lang,
       CAST(COUNT(*) AS BIGINT) AS n_val_grams,
       CAST(COALESCE(MAX(n.c), 0) AS BIGINT) AS n_novel,
       ROUND(100.0 * CAST(COALESCE(MAX(n.c), 0) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 4) AS novelty_pct
FROM val_g v
LEFT JOIN (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c
           FROM novel GROUP BY lang) n ON n.lang = v.lang
GROUP BY v.lang ORDER BY v.lang
"""


ROUND7_STAGED_QUERIES.update(
    {
        "mk01_event_markov_transitions": mk01_event_markov_transitions,
        "kl01_source_unigram_kl": kl01_source_unigram_kl,
        "nv01_ngram_novelty": nv01_ngram_novelty,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "mk01_event_markov_transitions": _MK01_ORACLE,
        "kl01_source_unigram_kl": _KL01_ORACLE,
        "nv01_ngram_novelty": _NV01_ORACLE,
    }
)


# ---------------------------------------------------------------------------
# Round-9 staging, wave 44: wz01 winsorized value stats, qf04 Gopher
# quality rules, gr04 event-type co-presence projection.


def wz01_winsorized_value_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorization audit — the outlier-clipping step a feature/label
    pipeline runs before any mean-based statistic, quantified: per
    event_type, the empirical p01/p99 thresholds, how many values each
    tail clips, and the mean before vs after. The robust-stats sibling
    of rs01 (MAD flags outliers; this measures what clipping them
    does to the first moment).

    Scale + determinism (the hq01 grid construction, made exact):
    values carry 2 decimal places at the source, so rounding to a
    DECIMAL(12,2) grid is LOSSLESS here — the (type, value) cell table
    the percentile runs on is bounded by the value grid, not the row
    count, and the cumulative window orders ≤ |grid| rows per type.
    Thresholds are type-1 empirical quantiles (smallest grid value
    with cum ≥ ceil(p·n)) — pure integer/decimal selection, no float
    interpolation anywhere. Means are DECIMAL sums of exact 2-dp
    values divided once, rounded to 6 dp. The 5-row threshold table
    joins back via AQE broadcast (no hint needed — bounded side)."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select(
        "event_type",
        F.round(F.col("value"), 2).cast("decimal(12,2)").alias("__v"),
    )
    cells = ev.groupBy("event_type", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    w = Window.partitionBy("event_type").orderBy("__v")
    cum = cells.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(Window.partitionBy("event_type"))
    )
    pick = lambda p: F.min(  # noqa: E731 — smallest grid value at rank
        F.when(
            F.col("__cum") >= F.ceil(F.col("__n") * F.lit(p)), F.col("__v")
        )
    )
    thr = cum.groupBy("event_type").agg(
        pick(0.01).alias("__p01"), pick(0.99).alias("__p99")
    )
    clip = F.least(F.greatest(F.col("__v"), F.col("__p01")), F.col("__p99"))
    return (
        ev.join(thr, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("__p01").cast("double").alias("p01_value"),
            F.max("__p99").cast("double").alias("p99_value"),
            F.sum(F.when(F.col("__v") < F.col("__p01"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("__v") > F.col("__p99"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_high"),
            F.round(
                F.sum("__v").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_raw"),
            F.round(
                F.sum(clip).cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_winsorized"),
        )
        .orderBy("event_type")
    )


_WZ01_ORACLE = """
WITH ev AS (
  SELECT event_type, CAST(ROUND(value, 2) AS DECIMAL(12,2)) AS v
  FROM events
), cells AS (
  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
), cum AS (
  SELECT event_type, v, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cm,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM cells
), thr AS (
  SELECT event_type,
         MIN(CASE WHEN cm >= CEIL(n * 0.01) THEN v END) AS p01,
         MIN(CASE WHEN cm >= CEIL(n * 0.99) THEN v END) AS p99
  FROM cum GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(t.p01) AS DOUBLE) AS p01_value,
       CAST(MAX(t.p99) AS DOUBLE) AS p99_value,
       CAST(SUM(CASE WHEN e.v < t.p01 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(SUM(CASE WHEN e.v > t.p99 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high,
       ROUND(CAST(SUM(e.v) AS DOUBLE) / COUNT(*), 6) AS mean_raw,
       ROUND(CAST(SUM(LEAST(GREATEST(e.v, t.p01), t.p99)) AS DOUBLE)
             / COUNT(*), 6) AS mean_winsorized
FROM ev e JOIN thr t ON t.event_type = e.event_type
GROUP BY e.event_type ORDER BY e.event_type
"""


# Gopher quality-filter stop-word set (Rae et al. 2021, public): a doc
# must contain at least 2 distinct members to pass the stop-word rule.
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def qf04_gopher_quality_rules(spark: SparkSession, sf: str) -> DataFrame:
    """The Gopher quality heuristics (Rae et al. 2021) as a per-source
    audit — the OTHER canonical web-cleaning rule set next to qf03's
    C4 filters: word-count bounds [50, 100000], mean word length in
    [3, 10], symbol-to-word ratio (# or ...) ≤ 0.1, ≥80% of words
    containing an alphabetic character, and ≥2 distinct stop words.

    Determinism: every rule is an EXACT INTEGER comparison — mean
    word length in [3,10] is tested as 3·n ≤ total_len ≤ 10·n, the
    0.8 alpha fraction as 5·n_alpha ≥ 4·n, the 0.1 symbol ratio as
    10·n_sym ≤ n — no ratio is ever materialized, so no float
    crosses the oracle boundary at all. One conditional-agg scan per
    the qf01 pattern; per-doc work is array arithmetic inside
    whole-stage codegen."""
    docs = _docs_words(spark, sf)
    n = F.size("__words")
    total_len = F.expr(
        "aggregate(__words, 0L, (a, x) -> a + length(x))"
    )
    n_alpha = F.expr(
        "size(filter(__words, x -> x rlike '[a-z]'))"
    )
    n_sym = F.size(
        F.expr("regexp_extract_all(text, '#|\\\\.\\\\.\\\\.', 0)")
    )
    n_stops = F.size(
        F.array_intersect(
            "__words",
            F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
        )
    )
    flagged = docs.select(
        "source",
        ((n < 50) | (n > 100000)).alias("__f_wc"),
        ((total_len < 3 * n) | (total_len > 10 * n)).alias("__f_mwl"),
        (10 * n_sym > n).alias("__f_sym"),
        (5 * n_alpha < 4 * n).alias("__f_alpha"),
        (n_stops < 2).alias("__f_stop"),
    )
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            cnt("__f_wc").alias("n_fail_wordcount"),
            cnt("__f_mwl").alias("n_fail_meanwordlen"),
            cnt("__f_sym").alias("n_fail_symbolratio"),
            cnt("__f_alpha").alias("n_fail_alphafrac"),
            cnt("__f_stop").alias("n_fail_stopwords"),
            F.sum(
                F.when(
                    ~F.col("__f_wc")
                    & ~F.col("__f_mwl")
                    & ~F.col("__f_sym")
                    & ~F.col("__f_alpha")
                    & ~F.col("__f_stop"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_pass"),
        )
        .orderBy("source")
    )


_QF04_ORACLE = f"""
WITH d AS (
  SELECT source,
         {_WORDS} AS w,
         len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_sym
  FROM documents
), f AS (
  SELECT source,
         (len(w) < 50 OR len(w) > 100000) AS f_wc,
         (list_sum(list_transform(w, x -> len(x))) < 3 * len(w)
          OR list_sum(list_transform(w, x -> len(x))) > 10 * len(w))
           AS f_mwl,
         (10 * n_sym > len(w)) AS f_sym,
         (5 * len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
          < 4 * len(w)) AS f_alpha,
         (len(list_intersect(w,
            ['the','be','to','of','and','that','have','with'])) < 2)
           AS f_stop
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN f_wc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fail_wordcount,
       CAST(SUM(CASE WHEN f_mwl THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fail_meanwordlen,
       CAST(SUM(CASE WHEN f_sym THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fail_symbolratio,
       CAST(SUM(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fail_alphafrac,
       CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fail_stopwords,
       CAST(SUM(CASE WHEN NOT f_wc AND NOT f_mwl AND NOT f_sym
                      AND NOT f_alpha AND NOT f_stop
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM f GROUP BY source ORDER BY source
"""


def gr04_event_type_copresence(spark: SparkSession, sf: str) -> DataFrame:
    """Bipartite projection of the user↔event_type graph onto
    event-type pairs: for every unordered pair, how many users touch
    BOTH, with the Jaccard overlap of their user sets — the
    co-occurrence structure a feature store reads before crossing
    behavioral features (near-duplicate event types show Jaccard → 1
    and should be merged, disjoint ones cross cleanly).

    Scale: ONE distinct projection of (user, type) — map-side
    combinable — then a self-equi-join keyed by user whose per-user
    fan-out is bounded by |types|² (≤25), NEVER all-pairs of users;
    the |types|-row marginals join back via AQE broadcast. Jaccard is
    an exact integer ratio |A∩B| / (|A|+|B|-|A∩B|) rounded once to
    6 dp."""
    ut = (
        load(spark, sf, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    na = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    pairs = (
        ut.alias("a")
        .join(ut.alias("b"), "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    return (
        pairs.join(
            na.select(F.col("event_type").alias("type_a"), F.col("__n").alias("n_a")),
            "type_a",
        )
        .join(
            na.select(F.col("event_type").alias("type_b"), F.col("__n").alias("n_b")),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


_GR04_ORACLE = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), na AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY 1
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM ut a JOIN ut b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_common,
       x.n AS n_a, y.n AS n_b,
       ROUND(CAST(p.n_common AS DOUBLE)
             / CAST(x.n + y.n - p.n_common AS DOUBLE), 6) AS jaccard
FROM pairs p
JOIN na x ON x.event_type = p.type_a
JOIN na y ON y.event_type = p.type_b
ORDER BY p.type_a, p.type_b
"""


ROUND7_STAGED_QUERIES.update(
    {
        "wz01_winsorized_value_stats": wz01_winsorized_value_stats,
        "qf04_gopher_quality_rules": qf04_gopher_quality_rules,
        "gr04_event_type_copresence": gr04_event_type_copresence,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "wz01_winsorized_value_stats": _WZ01_ORACLE,
        "qf04_gopher_quality_rules": _QF04_ORACLE,
        "gr04_event_type_copresence": _GR04_ORACLE,
    }
)


# ---------------------------------------------------------------------------
# Round-9 staging, wave 45: es16 bound-certified pruned exact search,
# st16 streaming binned-quantile rollup (registered below via the
# streaming shim).


def es16_bound_pruned_search(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT maximum-inner-product top-k that prunes with a provable
    bound — the Threshold-Algorithm (Fagin) shape every two-stage
    retrieval system wants: score a cheap candidate set, take its kth
    score as the threshold tau, then rescore exactly ONLY the vectors
    whose upper bound can beat tau. Because ub(x) >= dot(q,x) for every
    x (Cauchy-Schwarz on the dimension split: dot = prefix_dot(16) +
    tail_dot(48) <= prefix_dot + ||q_tail||*||x_tail||), any vector
    outside the refine set has dot <= ub < tau and provably cannot
    enter the top-k — so the result ALWAYS equals the brute-force
    answer, and `scanned_pct` reports how much exact work the bound
    actually saved (on isotropic random embeddings it saves little —
    an honest number; on clustered production embeddings the prefix
    carries most of the signal and the refine set collapses).

    Scale: the bound pass reads 16 of 64 dims plus one tail norm per
    vector (at production dims, 1536+, the prefix fraction is the
    point); candidates are a TakeOrdered-50, tau is a 1-row broadcast,
    and the refine set is a pushed filter on the bound column — never
    a second full-corpus exact pass unless the data genuinely needs
    it. Determinism: es01's conventions — dot and ub rounded once to
    4 dp, ties broken by vec_id; rounding both to the same grid
    preserves ub >= dot, so exactness survives the rounding."""
    emb = load(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select(
        F.slice("embedding", 1, 16).alias("__qp"),
        F.col("embedding").alias("__q"),
        sim.norm(F.slice("embedding", 17, 48)).alias("__qtn"),
    )
    base = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qrow))
        .select(
            "vec_id",
            "embedding",
            "__q",
            F.round(
                sim.dot(F.slice("embedding", 1, 16), F.col("__qp"))
                + F.col("__qtn") * sim.norm(F.slice("embedding", 17, 48)),
                4,
            ).alias("__ub"),
        )
    )
    cand = base.orderBy(F.desc("__ub"), "vec_id").limit(50)
    tau = (
        cand.select(
            F.round(sim.dot(F.col("embedding"), F.col("__q")), 4).alias(
                "__dot"
            )
        )
        .orderBy(F.desc("__dot"))
        .limit(10)
        .agg(F.min("__dot").alias("__tau"))
    )
    refine = base.crossJoin(F.broadcast(tau)).filter(
        F.col("__ub") >= F.col("__tau")
    )
    n_refine = refine.agg(
        F.count(F.lit(1)).cast("long").alias("__nr")
    )
    n_all = base.agg(F.count(F.lit(1)).cast("long").alias("__na"))
    topk = (
        refine.select(
            "vec_id",
            F.round(sim.dot(F.col("embedding"), F.col("__q")), 4).alias(
                "dot_score"
            ),
        )
        .orderBy(F.desc("dot_score"), "vec_id")
        .limit(10)
    )
    return (
        topk.crossJoin(F.broadcast(n_refine))
        .crossJoin(F.broadcast(n_all))
        .select(
            "vec_id",
            "dot_score",
            F.round(
                F.lit(100.0) * F.col("__nr").cast("double")
                / F.col("__na").cast("double"),
                4,
            ).alias("scanned_pct"),
        )
        .orderBy(F.desc("dot_score"), "vec_id")
    )


_ES16_DOT16 = (
    "list_sum(list_transform(range(1, 17), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)

_ES16_ORACLE = f"""
WITH q AS (
  SELECT embedding AS qe,
         {_NORM.format(a='embedding[17:64]')} AS qtn
  FROM embeddings WHERE vec_id = 0
), base AS (
  SELECT vec_id, embedding, qe,
         ROUND({_ES16_DOT16.format(a='embedding', b='qe')}
               + qtn * {_NORM.format(a='embedding[17:64]')}, 4) AS ub
  FROM embeddings, q WHERE vec_id <> 0
), cand AS (
  SELECT * FROM base ORDER BY ub DESC, vec_id LIMIT 50
), tau AS (
  SELECT MIN(d) AS tau FROM (
    SELECT ROUND({_DOT.format(a='embedding', b='qe')}, 4) AS d
    FROM cand ORDER BY d DESC LIMIT 10
  )
), refine AS (
  SELECT b.vec_id, b.embedding, b.qe
  FROM base b, tau t WHERE b.ub >= t.tau
), counts AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM refine) AS nr,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS na
)
SELECT vec_id, dot_score,
       ROUND(100.0 * CAST(c.nr AS DOUBLE) / CAST(c.na AS DOUBLE), 4)
         AS scanned_pct
FROM (
  SELECT vec_id, ROUND({_DOT.format(a='embedding', b='qe')}, 4) AS dot_score
  FROM refine ORDER BY dot_score DESC, vec_id LIMIT 10
), counts c
ORDER BY dot_score DESC, vec_id
"""


ROUND7_STAGED_QUERIES["es16_bound_pruned_search"] = es16_bound_pruned_search
ROUND7_STAGED_ORACLE["es16_bound_pruned_search"] = _ES16_ORACLE


def _register_staged_streaming_wave45() -> None:
    from ..streaming.queries import (
        ST16_STAGED_ORACLE,
        st16_streaming_binned_quantiles,
    )

    ROUND7_STAGED_QUERIES["st16_streaming_binned_quantiles"] = (
        st16_streaming_binned_quantiles
    )
    ROUND7_STAGED_ORACLE["st16_streaming_binned_quantiles"] = (
        ST16_STAGED_ORACLE
    )


_register_staged_streaming_wave45()


# ---------------------------------------------------------------------------
# Round-9 staging, wave 46: tx21 Kneser-Ney smoothing, lb01 centroid
# label-confusion audit, mmd01 moment-closure MMD.


def tx21_kneser_ney_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995,
    Chen & Goodman 1999) with the canonical fixed discount D = 0.75 —
    the smoother tx17's continuation table exists to feed: P_KN(w2|w1)
    = (c12 − D)/c1 + (D·N1+(w1,·)/c1) · (N1+(·,w2)/T), where the
    continuation distribution counts DISTINCT left contexts, not raw
    frequency (the insight that made KN the standard n-gram smoother).
    Reported for the 20 highest-count bigrams with every component
    exposed, so the smoothing arithmetic is auditable.

    Scale: one corpus bigram count (map-side combinable), two keyed
    reduces over the BIGRAM TYPE table (sublinear in corpus size), one
    1-row type-total broadcast (BNLJ allowlisted). Determinism: all
    five components are exact BIGINTs; p_kn is ONE fixed-order double
    expression over them, rounded once to 8 dp — identical in both
    engines because the inputs are integers."""
    docs = load(spark, sf, "documents").select(
        "doc_id", tx.words("text").alias("__w")
    )
    big = docs.select(
        F.explode(
            F.expr(
                "CASE WHEN size(__w) >= 2 THEN "
                "transform(sequence(1, size(__w) - 1), "
                "i -> struct(element_at(__w, i) AS w1, "
                "element_at(__w, i + 1) AS w2)) "
                "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) "
                "END"
            )
        ).alias("__g")
    ).select("__g.w1", "__g.w2")
    counts = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    ctx = counts.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1p_fwd"),
    )
    cont = counts.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1p_back")
    )
    total = counts.agg(F.count(F.lit(1)).cast("bigint").alias("__T"))
    p_kn = F.round(
        (F.col("c12").cast("double") - F.lit(0.75))
        / F.col("c1").cast("double")
        + (F.lit(0.75) * F.col("n1p_fwd").cast("double") / F.col("c1").cast("double"))
        * (F.col("n1p_back").cast("double") / F.col("__T").cast("double")),
        8,
    )
    return (
        counts.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1", "w2", "c12", "c1", "n1p_fwd", "n1p_back",
            p_kn.alias("p_kn"),
        )
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(20)
    )


_TX21_ORACLE = f"""
WITH d AS (
  SELECT {_WORDS} AS w FROM documents
), big AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM d, LATERAL (SELECT unnest(range(1, len(w))) AS i)
  WHERE len(w) >= 2
), counts AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM big GROUP BY 1, 2
), ctx AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n1p_fwd
  FROM counts GROUP BY w1
), cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_back FROM counts GROUP BY w2
), total AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS T FROM counts
)
SELECT c.w1, c.w2, c.c12, x.c1, x.n1p_fwd, n.n1p_back,
       ROUND(
         (CAST(c.c12 AS DOUBLE) - 0.75) / CAST(x.c1 AS DOUBLE)
         + (0.75 * CAST(x.n1p_fwd AS DOUBLE) / CAST(x.c1 AS DOUBLE))
         * (CAST(n.n1p_back AS DOUBLE) / CAST(t.T AS DOUBLE)), 8) AS p_kn
FROM counts c
JOIN ctx x ON x.w1 = c.w1
JOIN cont n ON n.w2 = c.w2
CROSS JOIN total t
ORDER BY c.c12 DESC, c.w1, c.w2 LIMIT 20
"""


def lb01_label_confusion_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Label-noise screen via the nearest-centroid classifier: assign
    every embedding to its closest LABEL CENTROID and cross-tabulate
    true vs predicted — off-diagonal mass is exactly where mislabeled
    or boundary vectors live (the confident-learning intuition with a
    deterministic classifier). es08 flags each label's farthest
    vectors; this says WHICH OTHER label they actually resemble.

    Scale: centroids are |labels|×d decimal-exact means (es05's rule);
    the assignment join inflates the exploded corpus by |labels| —
    bounded by construction (10 here), the honest cost of any centroid
    classifier — and distances accumulate per-term doubles through
    DECIMAL(30,15) sums (exact, partition-order-free, the es08
    kernel's discipline). Argmin ties break toward the smaller label
    id via min(struct(d2, label)) — map-side combinable, no per-vector
    window."""
    emb = load(spark, sf, "embeddings")
    ex = emb.select(
        "label", "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).withColumn("val", F.col("val").cast("double"))
    cent = ex.groupBy(F.col("label").alias("__cl"), "dim").agg(
        (
            F.sum(F.col("val").cast("decimal(25,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__c")
    )
    d2 = (
        ex.join(cent, "dim")
        .withColumn(
            "__sq",
            ((F.col("val") - F.col("__c")) * (F.col("val") - F.col("__c")))
            .cast("decimal(30,15)"),
        )
        .groupBy("vec_id", "label", "__cl")
        .agg(F.sum("__sq").alias("__d2"))
    )
    assigned = d2.groupBy("vec_id", "label").agg(
        F.min(F.struct("__d2", "__cl")).alias("__best")
    )
    return (
        assigned.select(
            F.col("label").alias("true_label"),
            F.col("__best.__cl").alias("pred_label"),
        )
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .orderBy("true_label", "pred_label")
    )


_LB01_ORACLE = """
WITH ex AS (
  SELECT label, vec_id, CAST(d - 1 AS INT) AS dim,
         CAST(embedding[d] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d)
), cent AS (
  SELECT label AS cl, dim,
         CAST(SUM(CAST(val AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*) AS c
  FROM ex GROUP BY label, dim
), d2 AS (
  SELECT e.vec_id, e.label, c.cl,
         SUM(CAST((e.val - c.c) * (e.val - c.c) AS DECIMAL(30,15))) AS d2
  FROM ex e JOIN cent c ON e.dim = c.dim
  GROUP BY e.vec_id, e.label, c.cl
), assigned AS (
  SELECT vec_id, label, cl,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rk
  FROM d2
)
SELECT label AS true_label,
       CAST(cl AS INT) AS pred_label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM assigned WHERE rk = 1
GROUP BY 1, 2 ORDER BY 1, 2
"""


def mmd01_label_mmd_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Linear-kernel Maximum Mean Discrepancy between each label's
    embedding distribution and the rest of the corpus — the
    distribution-shift number for VECTOR columns (ks01/psi01 cover
    scalars), computed by MOMENT CLOSURE: for the linear kernel,
    MMD² = ‖mean_A − mean_B‖², so the two-sample kernel statistic
    needs only per-dimension means — ZERO pairwise work, the whole
    point at 100 TB (a quadratic-kernel variant closes over second
    moments, a d×d bounded matrix; pairs are never needed).

    Determinism: per-(label, dim) sums are DECIMAL(25,10) over doubles
    (es05's centroid rule); rest-means derive from (total − label)
    sums in decimal; each dimension's squared diff is one double
    product rounded to 12 dp, decimal-summed over the 64 bounded dims,
    output rounded to 8 dp."""
    emb = load(spark, sf, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    ).withColumn("val", F.col("val").cast("double"))
    per = ex.groupBy("label", "dim").agg(
        F.sum(F.col("val").cast("decimal(25,10)")).alias("__s"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    tot = ex.groupBy("dim").agg(
        F.sum(F.col("val").cast("decimal(25,10)")).alias("__st"),
        F.count(F.lit(1)).cast("long").alias("__nt"),
    )
    diff = (
        per.join(tot, "dim")
        .select(
            "label",
            F.round(
                (
                    F.col("__s").cast("double") / F.col("__n")
                    - (F.col("__st") - F.col("__s")).cast("double")
                    / (F.col("__nt") - F.col("__n"))
                )
                * (
                    F.col("__s").cast("double") / F.col("__n")
                    - (F.col("__st") - F.col("__s")).cast("double")
                    / (F.col("__nt") - F.col("__n"))
                ),
                12,
            )
            .cast("decimal(20,12)")
            .alias("__dd"),
            F.col("__n"),
        )
    )
    return (
        diff.groupBy("label")
        .agg(
            F.max("__n").cast("bigint").alias("n_vectors"),
            F.round(F.sum("__dd").cast("double"), 8).alias("mmd2_linear"),
        )
        .orderBy("label")
    )


_MMD01_ORACLE = """
WITH ex AS (
  SELECT label, CAST(d - 1 AS INT) AS dim,
         CAST(embedding[d] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d)
), per AS (
  SELECT label, dim, SUM(CAST(val AS DECIMAL(25,10))) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ex GROUP BY 1, 2
), tot AS (
  SELECT dim, SUM(CAST(val AS DECIMAL(25,10))) AS st,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM ex GROUP BY 1
), diff AS (
  SELECT p.label, p.n,
         CAST(ROUND(
           (CAST(p.s AS DOUBLE) / p.n
            - CAST(t.st - p.s AS DOUBLE) / (t.nt - p.n))
           * (CAST(p.s AS DOUBLE) / p.n
              - CAST(t.st - p.s AS DOUBLE) / (t.nt - p.n)), 12)
         AS DECIMAL(20,12)) AS dd
  FROM per p JOIN tot t ON t.dim = p.dim
)
SELECT label,
       CAST(MAX(n) AS BIGINT) AS n_vectors,
       ROUND(CAST(SUM(dd) AS DOUBLE), 8) AS mmd2_linear
FROM diff GROUP BY label ORDER BY label
"""


ROUND7_STAGED_QUERIES.update(
    {
        "tx21_kneser_ney_bigrams": tx21_kneser_ney_bigrams,
        "lb01_label_confusion_audit": lb01_label_confusion_audit,
        "mmd01_label_mmd_audit": mmd01_label_mmd_audit,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "tx21_kneser_ney_bigrams": _TX21_ORACLE,
        "lb01_label_confusion_audit": _LB01_ORACLE,
        "mmd01_label_mmd_audit": _MMD01_ORACLE,
    }
)


# ---------------------------------------------------------------------------
# Round-9 staging, wave 47: gr05 Adamic-Adar missed-pair suggestions,
# tk01 tokenizer fertility, tx22 word burstiness.


#: Hub guard for gr05's wedge enumeration (r8 verdict task 3): a shared
#: neighbor of degree d contributes d(d-1)/2 wedges, so ONE hub node
#: can dominate the self-join at 100× scale. Capping shared-neighbor
#: degree at D bounds the stage at Σ_{deg(w)≤D} deg(w)² ≤ D·|E| —
#: linear in edges — while the dropped AA contributions are
#: ≤ 1/ln(D) ≈ 0.145 per wedge at D=1000 (the hubs AA itself
#: down-weights to noise). Overridable per-session via the
#: ``spark.graft.gr05.maxHubDegree`` conf; the oracle SQL is generated
#: from the same constant so both engines apply the identical cap.
#: Measured headroom: the sf0.1 co-purchase graph's max degree is 6
#: (see SCALE.md "wedge hub skew"), so at test scales the guard is
#: semantics-free and certification pins the uncapped answer.
GR05_MAX_HUB_DEGREE = 1000

#: Support floor for a co-purchase edge: two parts are linked only if
#: they co-occur in at least this many DISTINCT orders. One shared
#: basket is coincidence; repeated co-occurrence is structure — and the
#: floor keeps |E| sparse (sub-linear in the all-pairs space) at every
#: scale, which is what makes the wedge stage affordable.
GR05_MIN_CO_ORDERS = 2


def _gr05_copurchase_edges(spark: SparkSession, sf: str) -> DataFrame:
    """The part co-purchase edge set (pa < pb): parts that appear
    together in >= GR05_MIN_CO_ORDERS distinct orders. The per-order
    pair fan-out is bounded by construction (TPC-H orders carry <= 7
    lines, so <= 21 pairs per order), keeping the build linear in
    lineitem at any scale.

    r14 (guide §2.4 — remove shuffles outright): the former
    distinct(ok, pk) + self-join-on-ok shape paid THREE shuffles
    (distinct, join, pair rollup). One groupBy(ok).collect_set(pk)
    replaces both the distinct AND the join — the set dedups pks
    within the order exactly like distinct did, the sorted array
    emits each unordered pair once map-side (id_a < id_b by the
    sort), and the <= 7-lines-per-order bound that made the join
    linear bounds the collected set the same way. In-bench A/B across
    all six gr* consumers in plans/r14/ab_runs.jsonl; pair counts are
    unchanged, so every certified value is identical."""
    per_order = (
        load(spark, sf, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .groupBy("ok")
        .agg(F.array_sort(F.collect_set("pk")).alias("__pks"))
    )
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(__pks, (x, i) -> "
                "transform(slice(__pks, i + 2, size(__pks)), "
                "y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("__p")
    ).select(F.col("__p.id_a"), F.col("__p.id_b"))
    # each order contributes a pair at most once (set semantics), so
    # the plain count IS the distinct-order count
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__n_orders"))
        .filter(F.col("__n_orders") >= GR05_MIN_CO_ORDERS)
        .select("id_a", "id_b")
    )


def gr05_adamic_adar_links(spark: SparkSession, sf: str) -> DataFrame:
    """Adamic-Adar link prediction on the part co-purchase graph — the
    MISSED-PAIR suggester: two parts that repeatedly share co-purchase
    neighbors but are never bought together themselves are the classic
    recommendation/linkage candidates, and AA (Σ 1/ln(deg w) over
    shared neighbors w) is the standard score that weights rare shared
    neighbors above promiscuous hubs. Top-20 suggestions, ranked.
    (The near-dup graph is NOT a usable substrate for AA: LSH band
    buckets produce candidate cliques, so every wedge closes by
    construction and the suggestion set is structurally empty — see
    SCALE.md "wedge hub skew". The co-purchase graph has genuine open
    wedges at every test scale.)

    Scale: one self-join keyed by l_orderkey with per-key fan-out
    bounded by lines-per-order (builds the edge set), then one
    self-join keyed by the shared neighbor (wedge enumeration, the
    tc01 shape — never all-pairs of nodes), one anti join against
    existing edges, one keyed sum. The wedge join's fan-out is
    quadratic in hub degree, so wedge centers are capped at
    GR05_MAX_HUB_DEGREE before the join (degree-ordered guard,
    Σdeg² ≤ D·|E|); a capped hub's AA weight 1/ln(deg) would be
    ≤1/ln(D) anyway, so the guard drops only what AA already calls
    noise. Determinism: deg is an exact BIGINT; each wedge's 1/ln(deg)
    contribution is rounded once to 10 dp on the bounded degree table
    and DECIMAL-summed (the en01 transcendental rule); final score
    rounded to 6 dp, ties by (id_u, id_v)."""
    cap = int(
        spark.conf.get("spark.graft.gr05.maxHubDegree", None)
        or GR05_MAX_HUB_DEGREE
    )
    good = _gr05_copurchase_edges(spark, sf).localCheckpoint()
    und = good.select(
        F.col("id_a").alias("w"), F.col("id_b").alias("x")
    ).union(good.select(F.col("id_b").alias("w"), F.col("id_a").alias("x")))
    deg = und.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("__dg"))
    # only deg >= 2 nodes can be a shared neighbor (ln(1) = 0 would
    # divide by zero under ANSI mode — and such nodes never join a
    # wedge anyway, so the filter is semantics-free); the upper cap is
    # the hub guard documented on GR05_MAX_HUB_DEGREE
    contrib = deg.filter(
        (F.col("__dg") >= 2) & (F.col("__dg") <= F.lit(cap))
    ).select(
        "w",
        F.round(F.lit(1.0) / F.log(F.col("__dg").cast("double")), 10)
        .cast("decimal(20,10)")
        .alias("__aa"),
    )
    # restrict the wedge enumeration to eligible centers BEFORE the
    # self-join — the guard must bound the join's fan-out, not just the
    # scored output (same shuffle key "w", so this adds no new exchange
    # beyond the one the self-join already pays)
    und_elig = und.join(contrib.select("w"), "w")
    wedges = (
        und_elig.select("w", F.col("x").alias("id_u"))
        .join(und_elig.select("w", F.col("x").alias("id_v")), "w")
        .filter(F.col("id_u") < F.col("id_v"))
    )
    missed = wedges.join(
        good,
        (wedges.id_u == good.id_a) & (wedges.id_v == good.id_b),
        "left_anti",
    )
    return (
        missed.join(contrib, "w")
        .groupBy("id_u", "id_v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.round(F.sum("__aa").cast("double"), 6).alias("aa_score"),
        )
        .orderBy(F.desc("aa_score"), "id_u", "id_v")
        .limit(20)
    )


def _gr05_oracle_sql() -> str:
    # the hub cap and the support floor mirror GR05_MAX_HUB_DEGREE /
    # GR05_MIN_CO_ORDERS exactly (same constants, both engines) — see
    # the knobs' docstrings for the scale rationale
    return f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), good AS (
  SELECT a.pk AS id_a, b.pk AS id_b
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2
  HAVING COUNT(*) >= {GR05_MIN_CO_ORDERS}
), und AS (
  SELECT id_a AS w, id_b AS x FROM good
  UNION ALL
  SELECT id_b AS w, id_a AS x FROM good
), deg AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS dg FROM und GROUP BY w
), contrib AS (
  SELECT w,
         CAST(ROUND(1.0 / ln(CAST(dg AS DOUBLE)), 10) AS DECIMAL(20,10))
           AS aa
  FROM deg WHERE dg >= 2 AND dg <= {GR05_MAX_HUB_DEGREE}
), und_elig AS (
  SELECT u.w, u.x FROM und u JOIN contrib c ON c.w = u.w
), wedges AS (
  SELECT a.w, a.x AS id_u, b.x AS id_v
  FROM und_elig a JOIN und_elig b ON a.w = b.w
  WHERE a.x < b.x
), missed AS (
  SELECT wg.w, wg.id_u, wg.id_v
  FROM wedges wg
  WHERE NOT EXISTS (
    SELECT 1 FROM good g
    WHERE g.id_a = wg.id_u AND g.id_b = wg.id_v
  )
)
SELECT m.id_u, m.id_v,
       CAST(COUNT(*) AS BIGINT) AS n_common,
       ROUND(CAST(SUM(c.aa) AS DOUBLE), 6) AS aa_score
FROM missed m JOIN contrib c ON c.w = m.w
GROUP BY m.id_u, m.id_v
ORDER BY aa_score DESC, m.id_u, m.id_v LIMIT 20
"""


def tk01_token_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer fertility per language — chars-per-token and
    tokens-per-doc, THE per-language efficiency numbers a multilingual
    training run reports (a language whose fertility is 2× pays 2× the
    sequence length for the same text; budget planning reads this
    table first). Char mass counts alphanumeric token characters, so
    numerator and denominator describe the same token stream.

    One conditional-agg scan; per-doc work is two array reductions
    inside codegen; ratios are exact integer divisions rounded once."""
    docs = _docs_words(spark, sf)
    return (
        docs.select(
            "lang",
            F.size("__words").alias("__nt"),
            F.expr("aggregate(__words, 0L, (a, x) -> a + length(x))").alias(
                "__nc"
            ),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__nt").cast("bigint").alias("total_tokens"),
            F.sum("__nc").cast("bigint").alias("total_token_chars"),
            F.round(
                F.sum("__nc").cast("double") / F.sum("__nt").cast("double"),
                4,
            ).alias("chars_per_token"),
            F.round(
                F.sum("__nt").cast("double") / F.count(F.lit(1)), 4
            ).alias("tokens_per_doc"),
        )
        .orderBy("lang")
    )


_TK01_ORACLE = f"""
WITH d AS (
  SELECT lang, {_WORDS} AS w FROM documents
), per AS (
  SELECT lang, len(w) AS nt,
         COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS nc
  FROM d
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS total_tokens,
       CAST(SUM(nc) AS BIGINT) AS total_token_chars,
       ROUND(CAST(SUM(nc) AS DOUBLE) / CAST(SUM(nt) AS DOUBLE), 4)
         AS chars_per_token,
       ROUND(CAST(SUM(nt) AS DOUBLE) / COUNT(*), 4) AS tokens_per_doc
FROM per GROUP BY lang ORDER BY lang
"""


def tx22_word_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Word burstiness (Church & Gale 1995): the variance-to-mean
    ratio of per-document counts for the 20 highest-mass words — the
    corpus-linguistics QA that separates topical content words (bursty,
    VMR > 1: absent from most docs, repeated where present) from
    function words and TEMPLATE BOILERPLATE (VMR ≈ 1 Poisson, or < 1
    suspiciously uniform — the machine-generated-spam tell).

    Determinism: per-word S1 = Σc and S2 = Σc² over docs are exact
    BIGINTs (zeros contribute nothing to either sum, so the implicit
    zero-filled distribution needs only the corpus doc total N — a
    1-row broadcast, BNLJ allowlisted); VMR = (N·S2 − S1²)/(N·S1) is
    ONE exact-integer-ratio division rounded to 6 dp."""
    docs = _docs_words(spark, sf)
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    per = (
        docs.select(
            "doc_id", F.explode("__words").alias("__t")
        )
        .groupBy("doc_id", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    stats = per.groupBy("__t").agg(
        F.sum("__c").cast("bigint").alias("total_count"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs_with"),
        F.sum(F.col("__c") * F.col("__c")).cast("bigint").alias("__s2"),
    )
    return (
        stats.crossJoin(F.broadcast(n_docs))
        .select(
            F.col("__t").alias("word"),
            "total_count",
            "n_docs_with",
            F.round(
                (
                    F.col("__N").cast("double") * F.col("__s2").cast("double")
                    - F.col("total_count").cast("double")
                    * F.col("total_count").cast("double")
                )
                / (
                    F.col("__N").cast("double")
                    * F.col("total_count").cast("double")
                ),
                6,
            ).alias("vmr"),
        )
        .orderBy(F.desc("total_count"), "word")
        .limit(20)
    )


_TX22_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS N FROM d
), per AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(w) AS t FROM d)
  GROUP BY 1, 2
), stats AS (
  SELECT t AS word,
         CAST(SUM(c) AS BIGINT) AS total_count,
         CAST(COUNT(*) AS BIGINT) AS n_docs_with,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM per GROUP BY t
)
SELECT word, total_count, n_docs_with,
       ROUND(
         (CAST(n.N AS DOUBLE) * CAST(s2 AS DOUBLE)
          - CAST(total_count AS DOUBLE) * CAST(total_count AS DOUBLE))
         / (CAST(n.N AS DOUBLE) * CAST(total_count AS DOUBLE)), 6) AS vmr
FROM stats, n
ORDER BY total_count DESC, word LIMIT 20
"""


ROUND7_STAGED_QUERIES.update(
    {
        "gr05_adamic_adar_links": gr05_adamic_adar_links,
        "tk01_token_fertility": tk01_token_fertility,
        "tx22_word_burstiness": tx22_word_burstiness,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "gr05_adamic_adar_links": _gr05_oracle_sql(),
        "tk01_token_fertility": _TK01_ORACLE,
        "tx22_word_burstiness": _TX22_ORACLE,
    }
)


# ---------------------------------------------------------------------------
# Round-9 staging, wave 48: imb02 effective-number class reweighting,
# mm08 aspect-ratio bucket packing.


def imb02_effective_number_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Class-balanced loss weights by the effective number of samples
    (Cui et al., CVPR 2019): w_c ∝ (1−β)/(1−β^{n_c}) with β = 0.999 —
    the reweighting between inverse-frequency (β→1) and uniform (β=0)
    that a long-tailed training run actually ships. imb01 (Kish ESS)
    measures how imbalanced the labels ARE; this computes what to DO
    about it.

    Determinism: n_c are exact BIGINTs on the bounded |labels| table;
    β^{n_c} is the one transcendental, computed ONCE per label row and
    rounded to 12 dp (the tx16 bounded-model-table rule), raw weights
    rounded to 10 dp as DECIMAL, and the normalization divides by the
    decimal SUM of those rounded weights — so the weights sum to 1 by
    construction in both engines."""
    from pyspark.sql import Window

    emb = load(spark, sf, "embeddings")
    beta = 0.999
    per = emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
    raw = per.select(
        "label",
        "n_vectors",
        F.round(
            F.lit(1.0 - beta)
            / (
                F.lit(1.0)
                - F.round(
                    F.pow(F.lit(beta), F.col("n_vectors").cast("double")), 12
                )
            ),
            10,
        )
        .cast("decimal(20,10)")
        .alias("__w"),
    )
    tot = Window.partitionBy()
    return (
        raw.select(
            "label",
            "n_vectors",
            F.round(
                F.col("__w").cast("double")
                / F.sum("__w").over(tot).cast("double"),
                8,
            ).alias("weight"),
        )
        .orderBy("label")
    )


_IMB02_ORACLE = """
WITH per AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors
  FROM embeddings GROUP BY label
), raw AS (
  SELECT label, n_vectors,
         CAST(ROUND(
           (1.0 - 0.999)
           / (1.0 - ROUND(pow(0.999, CAST(n_vectors AS DOUBLE)), 12)),
           10) AS DECIMAL(20,10)) AS w
  FROM per
)
SELECT label, n_vectors,
       ROUND(CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE), 8)
         AS weight
FROM raw ORDER BY label
"""


def mm08_aspect_bucket_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Aspect-ratio bucket packing — the multimodal batching op: group
    images into integer aspect buckets (4·w div h, capped), pad each
    batch to its bucket's max dims, and report the pixel utilization
    that bucketing buys (padding everything to one global canvas is
    the naive alternative; per-bucket padding is why every image
    trainer aspect-buckets). Dims ride the SAME Arrow mapInPandas
    resize kernel as mm02 (stubbed decode, real batching plumbing).

    Determinism: the bucket key is pure integer arithmetic (Spark
    `div` = DuckDB `//`); utilization is Σ(w·h) over n·max_w·max_h —
    exact integers, ONE rounded division per bucket."""
    docs = load(spark, sf, "documents")
    dims = resize_images(documents_as_media(docs))
    bucket = F.least(
        F.expr("(4 * width) div height"), F.lit(12)
    ).cast("int")
    return (
        dims.select("width", "height", bucket.alias("aspect_bucket"))
        .groupBy("aspect_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.max("width").cast("int").alias("max_width"),
            F.max("height").cast("int").alias("max_height"),
            F.round(
                F.lit(100.0)
                * F.sum(F.col("width").cast("long") * F.col("height"))
                .cast("double")
                / (
                    F.count(F.lit(1))
                    * F.max("width").cast("long")
                    * F.max("height")
                ).cast("double"),
                4,
            ).alias("pixel_util_pct"),
        )
        .orderBy("aspect_bucket")
    )


_MM08_ORACLE = """
WITH dims AS (
  SELECT (octet_length(encode(text)) % 64) + 1 AS w,
         (octet_length(encode(text)) % 48) + 1 AS h
  FROM documents
), b AS (
  SELECT w, h, LEAST((4 * w) // h, 12) AS aspect_bucket FROM dims
)
SELECT CAST(aspect_bucket AS INT) AS aspect_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(MAX(w) AS INT) AS max_width,
       CAST(MAX(h) AS INT) AS max_height,
       ROUND(100.0 * CAST(SUM(w * h) AS DOUBLE)
             / CAST(COUNT(*) * MAX(w) * MAX(h) AS DOUBLE), 4)
         AS pixel_util_pct
FROM b GROUP BY aspect_bucket ORDER BY aspect_bucket
"""


ROUND7_STAGED_QUERIES.update(
    {
        "imb02_effective_number_weights": imb02_effective_number_weights,
        "mm08_aspect_bucket_packing": mm08_aspect_bucket_packing,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "imb02_effective_number_weights": _IMB02_ORACLE,
        "mm08_aspect_bucket_packing": _MM08_ORACLE,
    }
)


# ---------------------------------------------------------------------------
# Round-9 staging, wave 49: sv01 Kaplan-Meier conversion curve, tx23
# PMI collocations.


def sv01_conversion_survival_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier estimate of time-to-first-purchase — the survival
    curve a funnel/retention team reads where fn01's funnel gives only
    the endpoint: per whole-day lag t since a user's first event,
    S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) with right-censoring at each
    user's last observed event (users who never purchase are censored,
    NOT failures — dropping them is the classic conversion-rate bias
    this estimator exists to fix).

    Scale: one shuffle keyed by user builds the (lag_to_purchase,
    censor_lag) table; everything after lives on the bounded
    distinct-day-lag table — risk sets via cumulative sums over ≤
    |days| rows. Determinism: d_i/n_i are exact integer ratios; each
    factor's ln is computed once on the bounded lag table, rounded to
    10 dp, DECIMAL-summed cumulatively, and S(t) = exp(Σln) is rounded
    to 6 dp (the en01 transcendental rule, twice — both engines fold
    identical rounded inputs)."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select("user_id", "ts", "event_type")
    per = ev.groupBy("user_id").agg(
        F.min("ts").alias("__first"),
        F.max("ts").alias("__last"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("__purch"),
    )
    lag = per.select(
        F.when(
            F.col("__purch").isNotNull(),
            F.datediff(F.col("__purch"), F.col("__first")),
        ).alias("__event_lag"),
        F.datediff(F.col("__last"), F.col("__first")).alias("__censor_lag"),
    )
    # at each distinct event lag t: d = conversions AT t, c = censored
    # AT t (censor counts leave the risk set after t)
    d = (
        lag.filter(F.col("__event_lag").isNotNull())
        .groupBy(F.col("__event_lag").alias("t"))
        .agg(F.count(F.lit(1)).cast("long").alias("__d"))
    )
    c = (
        lag.filter(F.col("__event_lag").isNull())
        .groupBy(F.col("__censor_lag").alias("t"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    n_total = lag.agg(F.count(F.lit(1)).cast("long").alias("__n0"))
    grid = (
        d.join(c, "t", "full_outer")
        .select(
            "t",
            F.coalesce("__d", F.lit(0)).alias("__d"),
            F.coalesce("__c", F.lit(0)).alias("__c"),
        )
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("t")
    risk = (
        grid.crossJoin(F.broadcast(n_total))
        .withColumn(
            "__at_risk",
            F.col("__n0")
            - F.coalesce(F.sum(F.col("__d") + F.col("__c")).over(w), F.lit(0)),
        )
    )
    # a day where EVERYONE at risk converts has factor 0 — survival is
    # exactly 0 from that day on. ln(0) must never be evaluated: DuckDB
    # raises, Spark's -inf silently NULLs through the decimal cast (the
    # bug this CASE exists to close) — so zero-days contribute ln = 0
    # and an absorbed flag instead.
    zero_day = (F.col("__at_risk") == F.col("__d")).cast("int")
    factor_ln = F.when(
        F.col("__at_risk") > F.col("__d"),
        F.round(
            F.log(
                (F.col("__at_risk") - F.col("__d")).cast("double")
                / F.col("__at_risk").cast("double")
            ),
            10,
        ).cast("decimal(20,10)"),
    ).otherwise(F.lit(0).cast("decimal(20,10)"))
    return (
        risk.filter(F.col("__d") > 0)
        .withColumn("__ln", factor_ln)
        .withColumn("__z", zero_day)
        .withColumn("__cum", F.sum("__ln").over(wc))
        .withColumn("__absorbed", F.max("__z").over(wc))
        .select(
            F.col("t").cast("int").alias("day_lag"),
            F.col("__at_risk").cast("bigint").alias("n_at_risk"),
            F.col("__d").cast("bigint").alias("n_converted"),
            F.when(F.col("__absorbed") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("__cum").cast("double")), 6))
            .alias("survival"),
        )
        .orderBy("day_lag")
    )


_SV01_ORACLE = """
WITH per AS (
  SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS purch_ts
  FROM events GROUP BY user_id
), lag AS (
  SELECT CASE WHEN purch_ts IS NOT NULL
              THEN date_diff('day', CAST(first_ts AS DATE),
                             CAST(purch_ts AS DATE)) END AS event_lag,
         date_diff('day', CAST(first_ts AS DATE),
                   CAST(last_ts AS DATE)) AS censor_lag
  FROM per
), d AS (
  SELECT event_lag AS t, CAST(COUNT(*) AS BIGINT) AS d
  FROM lag WHERE event_lag IS NOT NULL GROUP BY 1
), c AS (
  SELECT censor_lag AS t, CAST(COUNT(*) AS BIGINT) AS c
  FROM lag WHERE event_lag IS NULL GROUP BY 1
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM lag
), grid AS (
  SELECT COALESCE(d.t, c.t) AS t,
         COALESCE(d.d, 0) AS d, COALESCE(c.c, 0) AS c
  FROM d FULL OUTER JOIN c ON d.t = c.t
), risk AS (
  SELECT t, d, c,
         n.n0 - COALESCE(SUM(d + c) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS at_risk
  FROM grid, n
), f AS (
  SELECT t, d, at_risk,
         CASE WHEN at_risk > d THEN
           CAST(ROUND(ln(CAST(at_risk - d AS DOUBLE)
                         / CAST(at_risk AS DOUBLE)), 10)
                AS DECIMAL(20,10))
         ELSE CAST(0 AS DECIMAL(20,10)) END AS lnf,
         CASE WHEN at_risk = d THEN 1 ELSE 0 END AS z
  FROM risk WHERE d > 0
)
SELECT CAST(t AS INT) AS day_lag,
       CAST(at_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_converted,
       CASE WHEN MAX(z) OVER (ORDER BY t) = 1 THEN 0.0
            ELSE ROUND(exp(CAST(SUM(lnf) OVER (ORDER BY t) AS DOUBLE)), 6)
       END AS survival
FROM f ORDER BY day_lag
"""


def tx23_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """PMI collocation mining (Church & Hanks 1990) — the phrase
    detector a vocabulary/tokenizer build runs to decide which word
    pairs deserve a merged token: PMI = log2(N·c12 / (c1·c2)) over
    adjacent-pair counts, reported for the 20 highest-PMI bigrams with
    a minimum-support floor (c12 ≥ 5 — raw PMI is dominated by
    hapax noise otherwise, the standard caveat).

    Scale: the same bigram-TYPE tables tx21 rides (map-side-combinable
    counts, sublinear cell tables), one 1-row total broadcast.
    Determinism: the log2 argument is an exact integer ratio; ONE
    rounded expression (8 dp), ties by (w1, w2)."""
    docs = load(spark, sf, "documents").select(
        "doc_id", tx.words("text").alias("__w")
    )
    toks = docs.select(F.explode("__w").alias("__t"))
    uni = toks.groupBy("__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cu")
    )
    n_total = toks.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    big = docs.select(
        F.explode(
            F.expr(
                "CASE WHEN size(__w) >= 2 THEN "
                "transform(sequence(1, size(__w) - 1), "
                "i -> struct(element_at(__w, i) AS w1, "
                "element_at(__w, i + 1) AS w2)) "
                "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) "
                "END"
            )
        ).alias("__g")
    ).select("__g.w1", "__g.w2")
    pairs = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
        .filter(F.col("c12") >= 5)
    )
    return (
        pairs.join(uni.select(F.col("__t").alias("w1"), F.col("__cu").alias("c1")), "w1")
        .join(uni.select(F.col("__t").alias("w2"), F.col("__cu").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_total))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.round(
                F.log2(
                    F.col("__N").cast("double") * F.col("c12").cast("double")
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                ),
                8,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


_TX23_ORACLE = f"""
WITH d AS (
  SELECT {_WORDS} AS w FROM documents
), toks AS (
  SELECT unnest(w) AS t FROM d
), uni AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS cu FROM toks GROUP BY t
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS N FROM toks
), big AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM d, LATERAL (SELECT unnest(range(1, len(w))) AS i)
  WHERE len(w) >= 2
), pairs AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM big GROUP BY 1, 2 HAVING COUNT(*) >= 5
)
SELECT p.w1, p.w2, p.c12, a.cu AS c1, b.cu AS c2,
       ROUND(log2(CAST(n.N AS DOUBLE) * CAST(p.c12 AS DOUBLE)
                  / (CAST(a.cu AS DOUBLE) * CAST(b.cu AS DOUBLE))), 8)
         AS pmi
FROM pairs p
JOIN uni a ON a.t = p.w1
JOIN uni b ON b.t = p.w2
CROSS JOIN n
ORDER BY pmi DESC, p.w1, p.w2 LIMIT 20
"""


ROUND7_STAGED_QUERIES.update(
    {
        "sv01_conversion_survival_curve": sv01_conversion_survival_curve,
        "tx23_pmi_collocations": tx23_pmi_collocations,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "sv01_conversion_survival_curve": _SV01_ORACLE,
        "tx23_pmi_collocations": _TX23_ORACLE,
    }
)


# ---------------------------------------------------------------------------
# Round-9 staging, wave 50: dd18 MinHash sketch-size sweep, es17 IVF
# nprobe recall/cost sweep.


def dd18_minhash_k_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash estimator error vs SKETCH SIZE on the same verified
    candidate pairs — dd10 calibrates the configured k per similarity
    decade; this answers the sizing question directly: k ∈ {8, 16, 32}
    permutations, one row each with mean estimate and mean absolute
    error vs exact Jaccard. The trick that makes it one pass: the
    permutation family is indexed by j, so the k=8 and k=16 sketches
    are PREFIXES of the k=32 signature — one signature build serves
    all three estimators (exactly how a production store would A/B
    sketch sizes without re-sketching).

    Scale: one k=32 signature aggregate (map-side combinable, shuffle
    carries 32 ints per doc), pair estimates on the LSH candidate set
    only (never all-pairs). Determinism: dd10's discipline — estimates
    are multiples of 1/k, exact Jaccards 6-dp decimals, per-k means
    accumulate DECIMAL(25,10)."""
    docs, _sigs, pairs = _lsh_base(spark, sf)
    sig32 = dd.minhash_signatures_agg(
        docs.select("doc_id", "__sh"), "doc_id", "__sh", k=32
    )
    a = sig32.select(F.col("doc_id").alias("id_a"), F.col("signature").alias("__ga"))
    b = sig32.select(F.col("doc_id").alias("id_b"), F.col("signature").alias("__gb"))
    sa = docs.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("__sa"))
    sb = docs.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("__sb"))
    scored = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.expr(
                "zip_with(__ga, __gb, (x, y) -> "
                "CASE WHEN x = y THEN 1 ELSE 0 END)"
            ).alias("__eq"),
            dd.jaccard(F.col("__sa"), F.col("__sb")).alias("__exact"),
        )
    )
    # r13: the three sweep legs used to be a unionAll that re-derived
    # the 4-way pair join per k; one exploded (k, est) array computes
    # all three estimators in a single pass over `scored` (same
    # per-k expressions over the same rows — identical values).
    un = scored.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("sketch_k"),
                        (
                            F.expr(
                                f"aggregate(slice(__eq, 1, {k}), 0, "
                                "(a, x) -> a + x)"
                            )
                            / F.lit(float(k))
                        ).alias("__est"),
                    )
                    for k in (8, 16, 32)
                ]
            )
        ).alias("__leg"),
        "__exact",
    ).select(
        F.col("__leg.sketch_k").alias("sketch_k"),
        F.col("__leg.__est").alias("__est"),
        "__exact",
    )
    return (
        un.groupBy("sketch_k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(F.col("__est").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_est"),
            F.round(
                F.sum(F.col("__exact").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_exact"),
            F.round(
                F.sum(
                    F.round(F.abs(F.col("__est") - F.col("__exact")), 6).cast(
                        "decimal(25,10)"
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_abs_err"),
        )
        .orderBy("sketch_k")
    )


_DD18_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range(32)) AS j) GROUP BY doc_id, j
), pj16 AS (
  SELECT doc_id, j, mh FROM pj WHERE j < {MINHASH_K}
), bands AS (
  SELECT doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ',')) AS band_key
  FROM pj16 GROUP BY doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
), eq AS (
  SELECT p.id_a, p.id_b,
         CAST(SUM(CASE WHEN pa.mh = pb.mh AND pa.j < 8 THEN 1 ELSE 0 END) AS BIGINT) AS n8,
         CAST(SUM(CASE WHEN pa.mh = pb.mh AND pa.j < 16 THEN 1 ELSE 0 END) AS BIGINT) AS n16,
         CAST(SUM(CASE WHEN pa.mh = pb.mh THEN 1 ELSE 0 END) AS BIGINT) AS n32
  FROM pairs p
  JOIN pj pa ON pa.doc_id = p.id_a
  JOIN pj pb ON pb.doc_id = p.id_b AND pb.j = pa.j
  GROUP BY p.id_a, p.id_b
), scored AS (
  SELECT id_a, id_b,
         {_JACCARD.format(a='sa.s', b='sb.s')} AS exact,
         n8, n16, n32
  FROM eq JOIN sh sa ON sa.doc_id = eq.id_a
          JOIN sh sb ON sb.doc_id = eq.id_b
), un AS (
  SELECT 8 AS sketch_k, n8 / 8.0 AS est, exact FROM scored
  UNION ALL
  SELECT 16 AS sketch_k, n16 / 16.0 AS est, exact FROM scored
  UNION ALL
  SELECT 32 AS sketch_k, n32 / 32.0 AS est, exact FROM scored
)
SELECT CAST(sketch_k AS INT) AS sketch_k,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(est AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*), 6)
         AS mean_est,
       ROUND(CAST(SUM(CAST(exact AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*), 6)
         AS mean_exact,
       ROUND(CAST(SUM(CAST(ROUND(ABS(est - exact), 6) AS DECIMAL(25,10)))
                  AS DOUBLE) / COUNT(*), 6) AS mean_abs_err
FROM un GROUP BY sketch_k ORDER BY sketch_k
"""


def es17_ivf_nprobe_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """IVF recall/cost curve over nprobe ∈ {1, 2, 4} — the tuning
    table an ANN deployment reads before picking its operating point:
    probing p centroid cells scans n_candidates vectors and recovers
    recall@10 against the exact top-10 (es04 is the nprobe=1 point;
    es11 measures the LSH path — this completes the IVF side).

    Scale: the centroid ranking is a 16-row bounded frame; each probe
    leg is an equi-join of the assigned corpus against a ≤4-row
    broadcast cell list (partition-pruned input when the index is
    written partitioned by centroid); candidate ranking is
    TakeOrdered. Determinism: es04's assignment spec (unrounded argmax
    sim, ties by centroid id), candidate cosines rounded to 4 dp, ties
    by vec_id; recall is an exact integer count over 10."""
    emb = load(spark, sf, "embeddings")
    assigned, cents = sim.ivf_assign(emb, 16)
    # six consumers (3 probe legs × candidate-count + top-k): the
    # zero-shuffle assignment fold has no Exchange to reuse, so
    # materialize the pass once (EAGER checkpoint, per the r13 batch-3
    # lazy-vs-eager A/B)
    assigned = assigned.localCheckpoint()
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__q")
    )
    from pyspark.sql import Window

    crank = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "__cid",
            (
                sim.dot(F.col("__cvec"), F.col("__q"))
                / F.nullif(
                    sim.norm(F.col("__cvec")) * sim.norm(F.col("__q")),
                    F.lit(0.0),
                )
            ).alias("__cs"),
        )
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.orderBy(F.desc_nulls_last("__cs"), F.asc("__cid"))
            ),
        )
    )
    exact10 = sim.cosine_topk(emb, 0, k=10).select("vec_id")
    legs = []
    for p in (1, 2, 4):
        probes = crank.filter(F.col("__rk") <= p).select(
            F.col("__cid").alias("__centroid")
        )
        cand = assigned.join(F.broadcast(probes), "__centroid").filter(
            F.col("vec_id") != 0
        )
        n_cand = cand.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates")
        )
        topk = (
            cand.crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                sim.cosine(F.col("embedding"), F.col("__q")).alias("__cos"),
            )
            .orderBy(F.desc("__cos"), "vec_id")
            .limit(10)
        )
        hits = topk.join(exact10, "vec_id", "left_semi").agg(
            F.count(F.lit(1)).alias("__hits")
        )
        legs.append(
            n_cand.crossJoin(F.broadcast(hits)).select(
                F.lit(p).alias("nprobe"),
                "n_candidates",
                F.round(F.col("__hits") / F.lit(10.0), 4).alias(
                    "recall_at_10"
                ),
            )
        )
    return legs[0].unionAll(legs[1]).unionAll(legs[2]).orderBy("nprobe")


def _es17_leg_sql(p: int) -> str:
    return f"""
  SELECT {p} AS nprobe,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM assigned a
          WHERE a.centroid IN (SELECT cid FROM crank WHERE rk <= {p})
            AND a.vec_id <> 0) AS n_candidates,
         ROUND((SELECT COUNT(*) FROM (
             SELECT a.vec_id,
                    {_COS.format(a='a.embedding', b='q.qe')} AS cs
             FROM assigned a, q
             WHERE a.centroid IN (SELECT cid FROM crank WHERE rk <= {p})
               AND a.vec_id <> 0
             ORDER BY cs DESC, a.vec_id LIMIT 10
           ) t WHERE t.vec_id IN (SELECT vec_id FROM exact10)) / 10.0, 4)
           AS recall_at_10"""


_ES17_ORACLE = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
  ORDER BY vec_id LIMIT 16
), scored AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {_DOT.format(a='e.embedding', b='c.cvec')}
           / NULLIF({_NORM.format(a='e.embedding')} * {_NORM.format(a='c.cvec')}, 0.0) AS sim
  FROM embeddings e CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, embedding, cid AS centroid
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC NULLS LAST, cid) AS rn
        FROM scored)
  WHERE rn = 1
), q AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
), crank AS (
  SELECT cid, ROW_NUMBER() OVER (ORDER BY cs DESC NULLS LAST, cid) AS rk
  FROM (
    SELECT c.cid,
           {_DOT.format(a='c.cvec', b='q.qe')}
             / NULLIF({_NORM.format(a='c.cvec')} * {_NORM.format(a='q.qe')}, 0.0) AS cs
    FROM cents c, q
  )
), exact10 AS (
  SELECT vec_id FROM (
    SELECT e.vec_id, {_COS.format(a='e.embedding', b='q.qe')} AS cs
    FROM embeddings e, q WHERE e.vec_id <> 0
    ORDER BY cs DESC, e.vec_id LIMIT 10
  )
)
{_es17_leg_sql(1)}
UNION ALL
{_es17_leg_sql(2)}
UNION ALL
{_es17_leg_sql(4)}
ORDER BY nprobe
"""


ROUND7_STAGED_QUERIES.update(
    {
        "dd18_minhash_k_sweep": dd18_minhash_k_sweep,
        "es17_ivf_nprobe_sweep": es17_ivf_nprobe_sweep,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "dd18_minhash_k_sweep": _DD18_ORACLE,
        "es17_ivf_nprobe_sweep": _ES17_ORACLE,
    }
)


# ---------------------------------------------------------------------------
# Round-9 staging, wave 51: ct04 contamination n-gram-order sensitivity.


def ct04_contamination_ngram_sensitivity(
    spark: SparkSession, sf: str
) -> DataFrame:
    """How sensitive is the contamination estimate to the n-gram
    order? The decontamination tuning table next to dd18's sketch-size
    and es17's nprobe sweeps: ct01's pair-level audit re-run at
    n ∈ {5, 7, 13} (5 = aggressive stock-phrase-prone, 7 = this
    engine's default, 13 = the common eval-decontamination setting),
    reduced to one corpus row per order — affected source pairs,
    total shared distinct grams, and the worst pair. Because every
    shared 13-gram contains shared 7-grams, affected-pair counts are
    NON-INCREASING in n — the invariant test pins it, and the gap
    between the rows is exactly the stock-phrase noise a too-small n
    lets in.

    Scale: three runs of ct01's certified one-distinct-shuffle +
    one-equi-join kernel (cost ∝ number of orders swept, never
    quadratic); each leg reduces to one row before the union.

    r14 REVERT of the r13 single order-tagged pass (units carrying
    their order in the join key + one conditional pair rollup): the
    in-bench A/B (chunked bench contract, plans/r14/ab_runs.jsonl)
    measures the three-leg shape faster in bench context (r13 quiet
    bench had the tagged pass at +23%) — the tagged union triples the
    rows through ONE distinct shuffle + self-join whose wide
    conditional rollup defeats map-side partial aggregation, while
    the three independent legs each distinct+join a third of the
    volume and overlap their stages."""
    legs = []
    for n in (5, 7, 13):
        col = f"n_shared_{n}grams"
        legs.append(
            _contamination(spark, sf, n=n)
            .agg(
                F.sum(F.when(F.col(col) > 0, 1).otherwise(0))
                .cast("bigint")
                .alias("n_pairs_affected"),
                F.sum(col).cast("bigint").alias("total_shared_grams"),
                F.max(col).cast("bigint").alias("max_pair_shared"),
            )
            .select(
                F.lit(n).alias("ngram_order"),
                "n_pairs_affected",
                "total_shared_grams",
                "max_pair_shared",
            )
        )
    return legs[0].unionAll(legs[1]).unionAll(legs[2]).orderBy("ngram_order")


def _ct04_leg_sql(n: int) -> str:
    return f"""
  SELECT {n} AS ngram_order,
         CAST(SUM(CASE WHEN n_shared_{n}grams > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pairs_affected,
         CAST(SUM(n_shared_{n}grams) AS BIGINT) AS total_shared_grams,
         CAST(MAX(n_shared_{n}grams) AS BIGINT) AS max_pair_shared
  FROM ({_contamination_oracle(n)})"""


_CT04_ORACLE = f"""
{_ct04_leg_sql(5)}
UNION ALL
{_ct04_leg_sql(7)}
UNION ALL
{_ct04_leg_sql(13)}
ORDER BY ngram_order
"""


ROUND7_STAGED_QUERIES["ct04_contamination_ngram_sensitivity"] = (
    ct04_contamination_ngram_sensitivity
)
ROUND7_STAGED_ORACLE["ct04_contamination_ngram_sensitivity"] = _CT04_ORACLE


# ---------------------------------------------------------------------------
# Round-9 promotion: the r8 verdict's task 1, verbatim — graduate all 21
# round-9 staged queries (waves 43-51) into the live EXTENSION registries,
# in the verdict's priority order: es16 first (the exactness-under-pruning
# certification), then st16/dd18/es17 (the tuning + merge certifications),
# then the waves in order. Every name below has BOTH gate-scale
# certifications in tests/test_staged_round9.py AND a recorded sf0.1 wall
# in scripts/staged_sf01_walls.json (worst case gr05 6.75 s isolated,
# re-swept after the hub-degree guard landed) — pinned by
# tests/test_staged_round7.py::test_promoted_queries_were_sf01_swept.
ROUND9_PROMOTED: list[str] = [
    # the strongest new claims first
    "es16_bound_pruned_search",
    "st16_streaming_binned_quantiles",
    "dd18_minhash_k_sweep",
    "es17_ivf_nprobe_sweep",
    # wave 43: sequence, divergence, and memorization audits
    "mk01_event_markov_transitions",
    "kl01_source_unigram_kl",
    "nv01_ngram_novelty",
    # wave 44: robust stats, Gopher rules, bipartite projection
    "wz01_winsorized_value_stats",
    "qf04_gopher_quality_rules",
    "gr04_event_type_copresence",
    # wave 46: smoothing, label noise, the pairs-free kernel statistic
    "tx21_kneser_ney_bigrams",
    "lb01_label_confusion_audit",
    "mmd01_label_mmd_audit",
    # wave 47: link prediction (hub-guarded), fertility, burstiness
    "gr05_adamic_adar_links",
    "tk01_token_fertility",
    "tx22_word_burstiness",
    # wave 48: long-tail reweighting and multimodal batch packing
    "imb02_effective_number_weights",
    "mm08_aspect_bucket_packing",
    # wave 49: survival analysis and collocation mining
    "sv01_conversion_survival_curve",
    "tx23_pmi_collocations",
    # wave 51: contamination order sensitivity
    "ct04_contamination_ngram_sensitivity",
]

for _name in ROUND9_PROMOTED:
    EXTENSION_QUERIES[_name] = ROUND7_STAGED_QUERIES.pop(_name)
    EXTENSION_ORACLE[_name] = ROUND7_STAGED_ORACLE.pop(_name)
del _name


# ---------------------------------------------------------------------------
# Round-10 staging, wave 52: qf05 CCNet perplexity buckets, tx24 vocabulary
# mass-coverage curve, dq02 FK orphan matrix.


def qf05_ccnet_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet's head/middle/tail corpus partition (Wenzek et al. 2020):
    every document scored under the corpus bigram LM (tx14's kernel,
    shared via _bigram_xent_per_doc), split into exact NTILE(3)
    terciles by cross-entropy (head = best-scoring third), rolled up
    per (source, bucket) — the table a pretraining data pipeline reads
    to decide which slice of each source to keep, and the direct
    upgrade of tx09's fixed-width unigram buckets to the actual CCNet
    recipe (model-relative terciles, bigram LM).

    Scale: the per-doc score is one gram-keyed join + one doc-keyed
    aggregate (see the kernel's docstring); the global tercile uses
    the distributed two-phase ranking operator (range partition +
    in-partition row_number + O(P) broadcast offsets — NEVER a
    single-partition NTILE window), and the rollup output is bounded
    by |sources| × 3. Determinism: ranks order by the 6-dp-rounded
    score with doc_id tie-break; exact_ntile reproduces engine NTILE
    semantics bit-for-bit (property-swept vs F.ntile); the bucket mean
    decimal-sums the rounded per-doc scores."""
    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
        exact_ntile,
    )

    scored = _bigram_xent_per_doc(spark, sf)
    ranked = attach_global_row_number(
        scored,
        order_by=[F.asc("cross_entropy"), F.asc("doc_id")],
        rn_col="__rn",
        total_col="__n",
        # the LM-scorer lineage is expensive; run it once (r13)
        materialize_input=True,
    )
    return (
        ranked.withColumn(
            "bucket", exact_ntile(F.col("__rn"), F.col("__n"), 3)
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum(
                    F.col("cross_entropy").cast("decimal(25,12)")
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_cross_entropy"),
            F.min("cross_entropy").alias("min_cross_entropy"),
            F.max("cross_entropy").alias("max_cross_entropy"),
        )
        .orderBy("source", "bucket")
    )


_QF05_ORACLE = f"""
WITH {_BIGRAM_XENT_CTE}, ranked AS (
  SELECT source, cross_entropy,
         NTILE(3) OVER (ORDER BY cross_entropy, doc_id) AS bucket
  FROM xent
)
SELECT source, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(cross_entropy AS DECIMAL(25,12))) AS DOUBLE)
             / COUNT(*), 6) AS avg_cross_entropy,
       MIN(cross_entropy) AS min_cross_entropy,
       MAX(cross_entropy) AS max_cross_entropy
FROM ranked
GROUP BY source, bucket
ORDER BY source, bucket
"""

ROUND7_STAGED_QUERIES["qf05_ccnet_perplexity_buckets"] = (
    qf05_ccnet_perplexity_buckets
)
ROUND7_STAGED_ORACLE["qf05_ccnet_perplexity_buckets"] = _QF05_ORACLE


def tx24_vocab_mass_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary mass-coverage curve: the number of distinct word
    types (ranked by frequency) needed to cover 50 / 90 / 99 % of all
    token occurrences — THE tokenizer-budget planning table (a
    vocabulary sized at the 99 % knee captures the mass; everything
    past it is tail handled by subword fallback), and the cumulative
    twin of zipf01's rank-decade profile.

    Scale: one token-keyed count aggregate, then the distributed
    two-phase ranking operator attaches BOTH the global frequency rank
    AND the running token mass in the SAME shuffle (running_sum_of —
    a distributed prefix sum, never a single-partition window); the
    thresholds reduce via three conditional MINs in one pass over the
    ranked vocab. Determinism: coverage tests are exact integer
    cross-multiplications (100·cum >= p·mass) — no float division
    decides a rank; ties order by (count DESC, token ASC)."""
    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
    )

    counts = (
        _docs_words(spark, sf)
        .select(F.explode("__words").alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__c"))
        # r13: three consumers (ranker sampling + shuffle, mass agg);
        # checkpoint so the corpus explode + vocab count runs once
        .localCheckpoint()
    )
    ranked = attach_global_row_number(
        counts,
        order_by=[F.desc("__c"), F.asc("__t")],
        rn_col="__rn",
        total_col="__vocab",
        running_sum_of="__c",
        running_sum_col="__cum",
    )
    mass = counts.agg(F.sum("__c").cast("bigint").alias("__mass"))
    hit = ranked.crossJoin(F.broadcast(mass))
    agg = hit.agg(
        *[
            F.min(
                F.when(
                    F.lit(100) * F.col("__cum") >= F.lit(p) * F.col("__mass"),
                    F.col("__rn"),
                )
            ).alias(f"__v{p}")
            for p in (50, 90, 99)
        ],
        F.max("__vocab").cast("bigint").alias("__voc"),
        F.max("__mass").alias("__m"),
    )
    return (
        agg.select(
            F.expr(
                "stack(3, 50, __v50, 90, __v90, 99, __v99) "
                "AS (coverage_pct, vocab_needed)"
            ),
            F.col("__voc").alias("vocab_total"),
            F.col("__m").alias("token_mass"),
        )
        .select(
            F.col("coverage_pct").cast("int").alias("coverage_pct"),
            F.col("vocab_needed").cast("bigint").alias("vocab_needed"),
            "vocab_total",
            "token_mass",
            F.round(
                F.col("vocab_needed").cast("double")
                / F.col("vocab_total").cast("double"),
                6,
            ).alias("vocab_share"),
        )
        .orderBy("coverage_pct")
    )


_TX24_ORACLE = f"""
WITH d AS (
  SELECT {_WORDS} AS w FROM documents
), c AS (
  SELECT t, COUNT(*) AS c
  FROM (SELECT unnest(w) AS t FROM d) GROUP BY t
), r AS (
  SELECT ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rn,
         SUM(c) OVER (ORDER BY c DESC, t) AS cum
  FROM c
), m AS (
  SELECT CAST(SUM(c) AS BIGINT) AS mass, CAST(COUNT(*) AS BIGINT) AS vocab
  FROM c
)
SELECT CAST(p AS INT) AS coverage_pct,
       CAST(MIN(rn) AS BIGINT) AS vocab_needed,
       MAX(vocab) AS vocab_total,
       MAX(mass) AS token_mass,
       ROUND(CAST(MIN(rn) AS DOUBLE) / MAX(vocab), 6) AS vocab_share
FROM r CROSS JOIN m JOIN (VALUES (50), (90), (99)) v(p)
  ON 100 * cum >= p * mass
GROUP BY p
ORDER BY coverage_pct
"""

ROUND7_STAGED_QUERIES["tx24_vocab_mass_coverage"] = tx24_vocab_mass_coverage
ROUND7_STAGED_ORACLE["tx24_vocab_mass_coverage"] = _TX24_ORACLE


#: The warehouse's declared FK edges: (child table, fk column, parent
#: table, pk column). dq02 audits every edge in one pass; the tuple is
#: module-level so the Spark plan and the generated oracle SQL derive
#: from the SAME list (the gr05 constant-mirroring rule).
DQ02_FK_EDGES: list[tuple[str, str, str, str]] = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def dq02_fk_orphan_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity audit of EVERY declared FK edge in one
    result: per edge, child rows, distinct child keys, orphaned rows
    (child key absent from the parent), and the orphan rate — the
    generalization of q02's single-relationship orphan check to the
    whole schema, i.e. the integrity dashboard a warehouse load gates
    on (reference parity: src/run_queries.py's validation queries
    check one edge; this is the matrix form).

    Scale: each edge pre-aggregates the child side to (key, row_count)
    FIRST — the join then carries distinct KEYS, not rows (at 100 TB
    lineitem→orders would otherwise shuffle 6 B rows to find 0
    orphans) — and joins the parent's distinct key set. NULL child
    keys count as orphans (a NULL FK fails the integrity contract).
    The per-edge results are 1-row aggregates unioned into the
    bounded output. Determinism: all counts exact integers; the rate
    is one rounded division."""
    out = None
    for child, fk, parent, pk in DQ02_FK_EDGES:
        ch = load(spark, sf, child).select(F.col(fk).alias("__k"))
        agg = ch.groupBy("__k").agg(F.count(F.lit(1)).alias("__cnt"))
        par = load(spark, sf, parent).select(F.col(pk).alias("__k")).distinct()
        joined = agg.join(par.withColumn("__hit", F.lit(1)), "__k", "left")
        row = joined.agg(
            F.lit(f"{child}.{fk}").alias("fk_edge"),
            F.lit(f"{parent}.{pk}").alias("references"),
            F.sum("__cnt").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_keys"),
            F.sum(F.when(F.col("__hit").isNull(), F.col("__cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_orphan_rows"),
        ).select(
            "fk_edge",
            "references",
            "n_rows",
            "n_distinct_keys",
            "n_orphan_rows",
            F.round(
                F.col("n_orphan_rows").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("orphan_rate"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("fk_edge", "references")


def _dq02_oracle_sql() -> str:
    legs = []
    for child, fk, parent, pk in DQ02_FK_EDGES:
        legs.append(f"""
SELECT '{child}.{fk}' AS fk_edge, '{parent}.{pk}' AS "references",
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
       CAST(SUM(CASE WHEN hit IS NULL THEN cnt ELSE 0 END) AS BIGINT)
         AS n_orphan_rows,
       ROUND(CAST(SUM(CASE WHEN hit IS NULL THEN cnt ELSE 0 END) AS DOUBLE)
             / SUM(cnt), 6) AS orphan_rate
FROM (SELECT {fk} AS k, COUNT(*) AS cnt FROM {child} GROUP BY {fk}) c
LEFT JOIN (SELECT DISTINCT {pk} AS k, 1 AS hit FROM {parent}) p
  ON c.k = p.k""")
    return (
        "SELECT * FROM (" + "\nUNION ALL\n".join(legs)
        + ') ORDER BY fk_edge, "references"'
    )


ROUND7_STAGED_QUERIES["dq02_fk_orphan_matrix"] = dq02_fk_orphan_matrix
ROUND7_STAGED_ORACLE["dq02_fk_orphan_matrix"] = _dq02_oracle_sql()


# ---------------------------------------------------------------------------
# Round-10 staging, wave 53: cal01 calibration/Brier audit, sk02 hash
# partition-balance audit, dm02 DoReMi-style domain reweighting step.


def cal01_brier_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Probability-calibration audit (reliability diagram + per-bin
    Brier score) of the simplest deployable model: per-cell base rates.
    Train/val split orders by exact parity (o_orderkey % 5 < 4 trains —
    the ss03 determinism contract: assignment is a pure function of the
    key, and splitting at the ORDER level keeps an order's lines from
    straddling the split); the model predicts P(line ships > 90 days
    after the order) per (o_orderpriority, l_linestatus) cell; val
    lines are scored and the cells are ranked into 5 equal-frequency
    bins by predicted probability. Per bin: lines, mean predicted vs
    observed rate (the reliability gap), and the Brier term — the
    tables an eval harness prints before trusting ANY probabilistic
    filter (next to ev01's ranking metrics and lb01's label noise).

    Scale: one orders⋈lineitem equi-join (SF-proportional both sides,
    AQE decides), two conditional aggregates onto the bounded cell
    table (|priorities| × |linestatus| = 15 rows), and a val-side join
    back to the bounded cells. Determinism: p_hat is an exact integer
    ratio rounded once to DECIMAL(7,6) on the bounded cell table;
    (p−y)² stays DECIMAL end-to-end (no float sum anywhere); bin
    assignment is exact_ntile over (p_hat, cell) — fully tied-broken;
    the in-bin window runs on a 15-row bounded frame."""
    from pyspark.sql import Window

    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        exact_ntile,
    )

    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        "l_linestatus",
        (F.col("o_orderkey") % 5 < 4).alias("__train"),
        F.when(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90, 1
        )
        .otherwise(0)
        .alias("__y"),
    )
    cells = (
        j.filter("__train")
        .groupBy("o_orderpriority", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__y").alias("__late"),
        )
        .select(
            "o_orderpriority",
            "l_linestatus",
            F.round(
                F.col("__late").cast("double") / F.col("__n").cast("double"),
                6,
            )
            .cast("decimal(7,6)")
            .alias("__p"),
        )
    )
    # 15-row bounded table: the global window is driver-trivial here
    w = Window.orderBy("__p", "o_orderpriority", "l_linestatus")
    binned = cells.select(
        "o_orderpriority",
        "l_linestatus",
        "__p",
        exact_ntile(
            F.row_number().over(w),
            F.count(F.lit(1)).over(
                Window.partitionBy()
            ),
            5,
        ).alias("bin"),
    )
    val = j.filter(~F.col("__train")).join(
        binned, ["o_orderpriority", "l_linestatus"]
    )
    return (
        val.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_val"),
            F.round(
                F.sum(F.col("__p")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_predicted"),
            F.round(
                F.sum("__y").cast("double") / F.count(F.lit(1)), 6
            ).alias("observed_rate"),
            F.round(
                F.sum(
                    (F.col("__p") - F.col("__y"))
                    * (F.col("__p") - F.col("__y"))
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("bin_brier"),
        )
        .orderBy("bin")
    )


_CAL01_ORACLE = """
WITH j AS (
  SELECT o_orderpriority, l_linestatus,
         (o_orderkey % 5 < 4) AS train,
         CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
              THEN 1 ELSE 0 END AS y
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), cells AS (
  SELECT o_orderpriority, l_linestatus,
         CAST(ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6)
              AS DECIMAL(7,6)) AS p
  FROM j WHERE train GROUP BY 1, 2
), binned AS (
  SELECT o_orderpriority, l_linestatus, p,
         NTILE(5) OVER (
           ORDER BY p, o_orderpriority, l_linestatus
         ) AS bin
  FROM cells
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_val,
       ROUND(CAST(SUM(p) AS DOUBLE) / COUNT(*), 6) AS avg_predicted,
       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS observed_rate,
       ROUND(CAST(SUM((p - y) * (p - y)) AS DOUBLE) / COUNT(*), 6)
         AS bin_brier
FROM j JOIN binned USING (o_orderpriority, l_linestatus)
WHERE NOT train
GROUP BY bin
ORDER BY bin
"""

ROUND7_STAGED_QUERIES["cal01_brier_calibration"] = cal01_brier_calibration
ROUND7_STAGED_ORACLE["cal01_brier_calibration"] = _CAL01_ORACLE


#: Modulus for sk02's shuffle-partition simulation — matches the test
#: sessions' spark.sql.shuffle.partitions so the simulated balance is
#: the balance the real exchange would see.
SK02_N_PARTITIONS = 32


def sk02_hash_partition_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle partition-balance forecast for the fact table's three
    join keys: hash every key into SK02_N_PARTITIONS buckets (the
    engine-neutral md5-based _H60 hash — NOT Spark's internal
    murmur, so the oracle reproduces it bit-for-bit) and report the
    per-key partition-size spread. max/avg >> 1 on a key column means
    the exchange that shuffles on it will straddle stragglers at 100×
    scale — this is sk01's skew detector turned into the exchange-level
    capacity-planning table (keys can be individually unskewed yet
    hash-collide into a hot partition; this measures the partitions
    themselves).

    Scale: one scan per key column aggregating straight onto the
    bounded (key_col × partitions) matrix — map-side combine does the
    heavy lifting; no join, no window. Determinism: the hash is an
    exact integer function of the key string; all stats are integer
    min/max/avg with one rounded ratio."""
    legs = []
    for key in ("l_orderkey", "l_partkey", "l_suppkey"):
        h = (
            F.conv(
                F.substring(F.md5(F.col(key).cast("string")), 1, 15), 16, 10
            ).cast("bigint")
            % SK02_N_PARTITIONS
        )
        per_part = (
            load(spark, sf, "lineitem")
            .select(h.alias("__pid"))
            .groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("__rows"))
        )
        legs.append(
            per_part.agg(
                F.lit(key).alias("key_col"),
                F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
                F.min("__rows").cast("bigint").alias("min_rows"),
                F.max("__rows").cast("bigint").alias("max_rows"),
                F.round(
                    F.sum("__rows").cast("double") / F.count(F.lit(1)), 2
                ).alias("avg_rows"),
            ).select(
                "key_col",
                "n_partitions",
                "min_rows",
                "max_rows",
                "avg_rows",
                # ratio of the two already-deterministic outputs (max is
                # exact, avg rounded once above) — nothing new to round
                F.round(
                    F.col("max_rows").cast("double") / F.col("avg_rows"), 6
                ).alias("skew_ratio"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out.orderBy("key_col")


def _sk02_oracle_sql() -> str:
    legs = []
    for key in ("l_orderkey", "l_partkey", "l_suppkey"):
        h60 = _H60.format(x=f"CAST({key} AS VARCHAR)")
        legs.append(f"""
SELECT '{key}' AS key_col,
       CAST(COUNT(*) AS BIGINT) AS n_partitions,
       CAST(MIN(rows) AS BIGINT) AS min_rows,
       CAST(MAX(rows) AS BIGINT) AS max_rows,
       ROUND(CAST(SUM(rows) AS DOUBLE) / COUNT(*), 2) AS avg_rows,
       ROUND(CAST(MAX(rows) AS DOUBLE)
             / ROUND(CAST(SUM(rows) AS DOUBLE) / COUNT(*), 2),
             6) AS skew_ratio
FROM (
  SELECT {h60} % {SK02_N_PARTITIONS} AS pid, COUNT(*) AS rows
  FROM lineitem GROUP BY 1
)""")
    return (
        "SELECT * FROM (" + "\nUNION ALL\n".join(legs)
        + ") ORDER BY key_col"
    )


ROUND7_STAGED_QUERIES["sk02_hash_partition_balance"] = (
    sk02_hash_partition_balance
)
ROUND7_STAGED_ORACLE["sk02_hash_partition_balance"] = _sk02_oracle_sql()


#: dm02's exponentiated-gradient step size (DoReMi's η) — module-level
#: so the Spark plan and oracle SQL share it (the gr05 mirroring rule).
DM02_ETA = 1.0


def dm02_domain_reweight_step(spark: SparkSession, sf: str) -> DataFrame:
    """One DoReMi-style domain-reweighting step (Xie et al. 2023,
    arXiv:2305.10429, the exponentiated-gradient update): per-source
    mean document surprisal under the corpus unigram LM stands in for
    the proxy-model excess loss, and sources with above-average loss
    get upweighted — w'_s ∝ w_s · exp(η · excess_s) from the uniform
    start. The output is the (bounded) next-epoch sampling-weight
    table a mixture-aware trainer consumes — dm01 reports the current
    mixture, ir01 reweights documents; this reweights DOMAINS from a
    loss signal.

    Scale: the unigram LM is one token-keyed aggregate (tx09's kernel
    shape); per-doc scoring is the gram join + doc-keyed mean; from
    there everything lives on the |sources|-bounded table. Determinism:
    per-type -log2 p rounded once (8 dp) in the frequency table;
    per-doc and per-source means DECIMAL-summed and rounded once
    (6 dp); exp(η·excess) — the only new transcendental — runs on the
    bounded source table, rounded once to 10 dp, then the normalization
    is a decimal ratio (the en01/tx16 rule end-to-end)."""
    from pyspark.sql import Window

    docs = _docs_words(spark, sf)
    toks = docs.select("doc_id", "source", F.explode("__words").alias("__t"))
    total = toks.agg(F.count(F.lit(1)).alias("__total"))
    vocab = (
        toks.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__c"))
        .crossJoin(F.broadcast(total))
        .select(
            "__t",
            F.round(
                -F.log2(F.col("__c").cast("double") / F.col("__total")), 8
            ).alias("__nll"),
        )
    )
    per_doc = (
        toks.join(vocab, "__t")
        .groupBy("doc_id", "source")
        .agg(
            F.round(
                F.sum(F.col("__nll").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("__sd")
        )
    )
    per_source = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.sum(F.col("__sd").cast("decimal(25,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_surprisal"),
    )
    w = Window.partitionBy()
    stepped = per_source.select(
        "source",
        "n_docs",
        "mean_surprisal",
        F.round(F.lit(1.0) / F.count(F.lit(1)).over(w), 6).alias(
            "baseline_weight"
        ),
        F.round(
            F.col("mean_surprisal")
            - F.sum(F.col("mean_surprisal").cast("decimal(18,6)"))
            .over(w)
            .cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("excess_loss"),
    ).select(
        "*",
        F.round(F.exp(F.lit(DM02_ETA) * F.col("excess_loss")), 10)
        .cast("decimal(20,10)")
        .alias("__term"),
    )
    return stepped.select(
        "source",
        "n_docs",
        "mean_surprisal",
        "baseline_weight",
        "excess_loss",
        F.round(
            F.col("__term").cast("double")
            / F.sum("__term").over(w).cast("double"),
            6,
        ).alias("new_weight"),
    ).orderBy("source")


_DM02_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, {_WORDS} AS w FROM documents
), toks AS (
  SELECT doc_id, source, unnest(w) AS t FROM d
), total AS (
  SELECT COUNT(*) AS total FROM toks
), vocab AS (
  SELECT t,
         ROUND(-log2(CAST(COUNT(*) AS DOUBLE) / (SELECT total FROM total)),
               8) AS nll
  FROM toks GROUP BY t
), per_doc AS (
  SELECT doc_id, source,
         ROUND(CAST(SUM(CAST(v.nll AS DECIMAL(25,12))) AS DOUBLE)
               / COUNT(*), 6) AS sd
  FROM toks JOIN vocab v USING (t)
  GROUP BY doc_id, source
), per_source AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         ROUND(CAST(SUM(CAST(sd AS DECIMAL(25,12))) AS DOUBLE)
               / COUNT(*), 6) AS mean_surprisal
  FROM per_doc GROUP BY source
), stepped AS (
  SELECT source, n_docs, mean_surprisal,
         ROUND(1.0 / COUNT(*) OVER (), 6) AS baseline_weight,
         ROUND(mean_surprisal
               - CAST(SUM(CAST(mean_surprisal AS DECIMAL(18,6))) OVER ()
                      AS DOUBLE) / COUNT(*) OVER (), 6) AS excess_loss
  FROM per_source
), terms AS (
  SELECT *,
         CAST(ROUND(exp({DM02_ETA} * excess_loss), 10) AS DECIMAL(20,10))
           AS term
  FROM stepped
)
SELECT source, n_docs, mean_surprisal, baseline_weight, excess_loss,
       ROUND(CAST(term AS DOUBLE)
             / CAST(SUM(term) OVER () AS DOUBLE), 6) AS new_weight
FROM terms
ORDER BY source
"""

ROUND7_STAGED_QUERIES["dm02_domain_reweight_step"] = dm02_domain_reweight_step
ROUND7_STAGED_ORACLE["dm02_domain_reweight_step"] = _DM02_ORACLE


# ---------------------------------------------------------------------------
# Round-10 staging, wave 54: ts04 classical seasonal decomposition, zo02
# min/max file-skipping audit, rk02 Spearman rank agreement.


def ts04_seasonal_decomposition(spark: SparkSession, sf: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue —
    trend via the centered 7-day moving average (full windows only),
    day-of-week seasonal as the mean of the detrended series, and the
    mean absolute remainder per weekday as the noise floor. This is
    the decomposition behind ts01's seasonal-naive error and ts03's
    autocorrelation: those MEASURE weekly structure, this one
    EXTRACTS it (the table a forecasting pipeline inspects before
    choosing a model).

    Scale: daily revenue is one keyed aggregate onto the
    calendar-bounded day table (<= 2,557 rows at any SF — every window
    below runs on that bounded frame, the ts01/win06 convention);
    output is 7 rows. Determinism: daily revenue is an exact
    DECIMAL(18,2) sum; the trend is a decimal-sum/7 rounded once
    (6 dp); detrended and remainder values are differences of
    already-rounded terms rounded once more; weekday means
    decimal-sum the rounded values. ISO weekday is integer arithmetic
    in both engines."""
    from pyspark.sql import Window

    orders = load(spark, sf, "orders")
    daily = (
        orders.select(
            F.to_date("o_orderdate").alias("__day"),
            dec("o_totalprice").alias("__rev"),
        )
        .groupBy("__day")
        .agg(F.sum("__rev").alias("__rev"))
    )
    w7 = Window.orderBy("__day").rowsBetween(-3, 3)
    trended = (
        daily.select(
            "__day",
            F.col("__rev").cast("double").alias("__revd"),
            F.when(
                F.count(F.lit(1)).over(w7) == 7,
                F.round(
                    F.sum("__rev").over(w7).cast("double") / F.lit(7.0), 6
                ),
            ).alias("__trend"),
        )
        .filter(F.col("__trend").isNotNull())
        .select(
            "__day",
            "__revd",
            "__trend",
            F.round(F.col("__revd") - F.col("__trend"), 6).alias("__detr"),
        )
    )
    dow = ((F.dayofweek("__day") + 5) % 7 + 1).alias("iso_dow")
    seasonal = (
        trended.select(dow, "__detr")
        .groupBy("iso_dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(
                F.sum(F.col("__detr").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("seasonal_component"),
        )
    )
    rem = (
        trended.select(dow, "__detr")
        .join(seasonal, "iso_dow")
        .select(
            "iso_dow",
            F.abs(
                F.round(F.col("__detr") - F.col("seasonal_component"), 6)
            ).alias("__absrem"),
        )
        .groupBy("iso_dow")
        .agg(
            F.round(
                F.sum(F.col("__absrem").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_abs_remainder")
        )
    )
    return (
        seasonal.join(rem, "iso_dow")
        .select(
            "iso_dow", "n_days", "seasonal_component", "mean_abs_remainder"
        )
        .orderBy("iso_dow")
    )


_TS04_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
), trended AS (
  SELECT day,
         CAST(rev AS DOUBLE) AS revd,
         CASE WHEN COUNT(*) OVER w = 7 THEN
           ROUND(CAST(SUM(rev) OVER w AS DOUBLE) / 7.0, 6)
         END AS trend
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), detr AS (
  SELECT isodow(day) AS iso_dow,
         ROUND(revd - trend, 6) AS d
  FROM trended WHERE trend IS NOT NULL
), seasonal AS (
  SELECT iso_dow, CAST(COUNT(*) AS BIGINT) AS n_days,
         ROUND(CAST(SUM(CAST(d AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6)
           AS seasonal_component
  FROM detr GROUP BY iso_dow
), rem AS (
  SELECT d.iso_dow,
         ROUND(CAST(SUM(CAST(ABS(ROUND(d.d - s.seasonal_component, 6))
                             AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(*), 6) AS mean_abs_remainder
  FROM detr d JOIN seasonal s ON d.iso_dow = s.iso_dow
  GROUP BY d.iso_dow
)
SELECT s.iso_dow, s.n_days, s.seasonal_component, r.mean_abs_remainder
FROM seasonal s JOIN rem r ON s.iso_dow = r.iso_dow
ORDER BY s.iso_dow
"""

ROUND7_STAGED_QUERIES["ts04_seasonal_decomposition"] = (
    ts04_seasonal_decomposition
)
ROUND7_STAGED_ORACLE["ts04_seasonal_decomposition"] = _TS04_ORACLE


#: zo02's simulated row-group size and audit predicate (month window) —
#: module-level so both engines derive from the same constants.
ZO02_FILE_ROWS = 4096
ZO02_PRED_LO = "1995-03-01"
ZO02_PRED_HI = "1995-04-01"


def zo02_minmax_pruning_audit(spark: SparkSession, sf: str) -> DataFrame:
    """File-skipping effectiveness audit: simulate writing orders into
    ZO02_FILE_ROWS-row files under (a) the natural arrival layout
    (orderkey order) and (b) a date-sorted layout, record each file's
    min/max order date (exactly the parquet row-group statistics a
    scan consults), and count the files a one-month predicate could
    skip. This quantifies the zo01 story on the axis that pays the
    bills: the SAME data and predicate go from scanning ~every file
    (uncorrelated natural layout) to scanning the predicate's share of
    files (sorted layout) — the before/after table that justifies a
    sort-on-write policy at 100 TB.

    Scale: both row numbers come from the distributed two-phase ranking
    operator (range partition + broadcast offsets — never a
    single-partition window); per-file min/max is one keyed aggregate
    each; output is 2 rows. Determinism: file assignment is exact
    integer division of a fully tie-broken rank; dates compare as
    dates."""
    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
    )

    orders = load(spark, sf, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("__day")
    )
    lo, hi = F.lit(ZO02_PRED_LO).cast("date"), F.lit(ZO02_PRED_HI).cast(
        "date"
    )
    out = None
    for layout, order_by in (
        ("natural_orderkey", [F.asc("o_orderkey")]),
        ("sorted_orderdate", [F.asc("__day"), F.asc("o_orderkey")]),
    ):
        ranked = attach_global_row_number(
            orders, order_by=order_by, rn_col="__rn"
        )
        files = (
            ranked.select(
                ((F.col("__rn") - 1) / ZO02_FILE_ROWS)
                .cast("bigint")
                .alias("__f"),
                "__day",
            )
            .groupBy("__f")
            .agg(
                F.count(F.lit(1)).alias("__rows"),
                F.min("__day").alias("__lo"),
                F.max("__day").alias("__hi"),
            )
        )
        scanned = (F.col("__hi") >= lo) & (F.col("__lo") < hi)
        row = files.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(F.when(scanned, 1).otherwise(0))
            .cast("bigint")
            .alias("n_files_scanned"),
            F.sum(F.when(scanned, F.col("__rows")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_scanned"),
        ).select(
            "*",
            F.round(
                F.lit(1.0)
                - F.col("n_files_scanned").cast("double")
                / F.col("n_files").cast("double"),
                6,
            ).alias("prune_pct"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("layout")


def _zo02_oracle_sql() -> str:
    legs = []
    for layout, order_by in (
        ("natural_orderkey", "o_orderkey"),
        ("sorted_orderdate", "day, o_orderkey"),
    ):
        legs.append(f"""
SELECT '{layout}' AS layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT)
         AS n_files_scanned,
       CAST(SUM(CASE WHEN scanned THEN rows ELSE 0 END) AS BIGINT)
         AS n_rows_scanned,
       ROUND(1.0 - CAST(SUM(CASE WHEN scanned THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS prune_pct
FROM (
  SELECT f, COUNT(*) AS rows,
         (MAX(day) >= DATE '{ZO02_PRED_LO}'
          AND MIN(day) < DATE '{ZO02_PRED_HI}') AS scanned
  FROM (
    SELECT (ROW_NUMBER() OVER (ORDER BY {order_by}) - 1)
             // {ZO02_FILE_ROWS} AS f,
           day
    FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS day FROM orders)
  ) GROUP BY f
)""")
    return (
        "SELECT * FROM (" + "\nUNION ALL\n".join(legs)
        + ") ORDER BY layout"
    )


ROUND7_STAGED_QUERIES["zo02_minmax_pruning_audit"] = zo02_minmax_pruning_audit
ROUND7_STAGED_ORACLE["zo02_minmax_pruning_audit"] = _zo02_oracle_sql()


#: rk02's head size: the agreement statistic runs on the top-K revenue
#: suppliers — a bounded-by-construction table (TakeOrdered, rank-cut
#: before any window).
RK02_TOP_K = 100


def rk02_spearman_rank_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Spearman rank agreement between two supplier orderings — revenue
    rank vs shipped-quantity rank on the top-RK02_TOP_K revenue
    suppliers: rho = 1 − 6·Σd²/(n(n²−1)). rk01 answers the same
    question with Kendall's tau (pairwise concordance); Spearman is
    the displacement-weighted twin an eval harness usually reports
    alongside it (big rank jumps hurt more than adjacent swaps).

    Scale: supplier totals are one keyed aggregate; the head is
    TakeOrdered-bounded (rank-cut BEFORE any window — the rk01 rule),
    so both rank windows run on a 100-row bounded frame. Determinism:
    revenue/quantity are exact decimal sums; ranks are fully
    tie-broken by suppkey; Σd² and the rho denominator are exact
    integers with one rounded division."""
    from pyspark.sql import Window

    li = load(spark, sf, "lineitem")
    totals = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
            ).alias("__rev"),
            F.sum(dec("l_quantity")).alias("__qty"),
        )
    )
    head = totals.orderBy(
        F.desc("__rev"), F.asc("l_suppkey")
    ).limit(RK02_TOP_K)
    wr = Window.orderBy(F.desc("__rev"), F.asc("l_suppkey"))
    wq = Window.orderBy(F.desc("__qty"), F.asc("l_suppkey"))
    ranked = head.select(
        "l_suppkey",
        F.row_number().over(wr).alias("__rr"),
        F.row_number().over(wq).alias("__rq"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum(
            (F.col("__rr") - F.col("__rq")) * (F.col("__rr") - F.col("__rq"))
        )
        .cast("bigint")
        .alias("sum_d2"),
    ).select(
        "n_suppliers",
        "sum_d2",
        F.round(
            F.lit(1.0)
            - F.lit(6.0)
            * F.col("sum_d2").cast("double")
            / (
                F.col("n_suppliers").cast("double")
                * (
                    F.col("n_suppliers").cast("double")
                    * F.col("n_suppliers").cast("double")
                    - F.lit(1.0)
                )
            ),
            6,
        ).alias("spearman_rho"),
    )


_RK02_ORACLE = f"""
WITH totals AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem GROUP BY l_suppkey
), head AS (
  SELECT * FROM totals ORDER BY rev DESC, l_suppkey LIMIT {RK02_TOP_K}
), ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY rev DESC, l_suppkey) AS rr,
         ROW_NUMBER() OVER (ORDER BY qty DESC, l_suppkey) AS rq
  FROM head
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM((rr - rq) * (rr - rq)) AS BIGINT) AS sum_d2,
       ROUND(1.0 - 6.0 * CAST(SUM((rr - rq) * (rr - rq)) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE)
                * (CAST(COUNT(*) AS DOUBLE) * COUNT(*) - 1.0)),
             6) AS spearman_rho
FROM ranked
"""

ROUND7_STAGED_QUERIES["rk02_spearman_rank_agreement"] = (
    rk02_spearman_rank_agreement
)
ROUND7_STAGED_ORACLE["rk02_spearman_rank_agreement"] = _RK02_ORACLE


# ---------------------------------------------------------------------------
# Round-10 staging, wave 55: st17 streaming Count-Min cells, st18 streaming
# HLL registers — the streamed-sketch additivity triple completed (st16
# merged histogram sums; these merge CM sums and HLL maxes). Registered via
# the staged-streaming shim so environments without a streaming-capable
# session still import this module.


def _register_staged_streaming_wave55() -> None:
    from local_etl_csv_to_postgresql_spark.streaming.queries import (
        ST17_STAGED_ORACLE,
        ST18_STAGED_ORACLE,
        st17_streaming_countmin,
        st18_streaming_hll_registers,
    )

    ROUND7_STAGED_QUERIES["st17_streaming_countmin"] = st17_streaming_countmin
    ROUND7_STAGED_ORACLE["st17_streaming_countmin"] = ST17_STAGED_ORACLE
    ROUND7_STAGED_QUERIES["st18_streaming_hll_registers"] = (
        st18_streaming_hll_registers
    )
    ROUND7_STAGED_ORACLE["st18_streaming_hll_registers"] = ST18_STAGED_ORACLE


_register_staged_streaming_wave55()


# ---------------------------------------------------------------------------
# Round-10 staging, wave 56: ss07 stratified hash reservoir, en02 bigram
# conditional entropy, scd02 point-in-time dimension join.


#: ss07's per-stratum reservoir size — bounded by construction.
SS07_RESERVOIR_K = 20


def ss07_stratified_reservoir(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified reservoir: the K lowest-hash documents
    per language — the eval-set carve-out that (a) is reproducible
    across runs/engines (hash order, not RNG), (b) stays FIXED as the
    corpus grows (a doc's hash never changes; a new doc enters the
    reservoir only by displacing the current max — standard
    bottom-k/KMV semantics), and (c) is stratified so no language
    starves. ss01 samples by hash threshold (variable size), ss03
    splits by band (proportional size); this pins EXACT size K per
    stratum. Output per language: population, reservoir size, and the
    membership digests (doc_id sum + max hash = the KMV threshold).

    Scale: the per-stratum rank comes from the distributed two-phase
    ranking operator with partition_by=lang — range partitioning keeps
    every task at N/P rows even when one language dominates the corpus
    (the single-task-per-stratum window this operator exists to
    avoid); the rank-cut keeps K rows per stratum before the bounded
    rollup. Determinism: the 60-bit md5 hash of doc_id is a pure
    function of the key; ties (impossible at 60 bits, but pinned
    anyway) break by doc_id."""
    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
    )

    docs = load(spark, sf, "documents").select(
        "lang",
        "doc_id",
        dd.hash60(F.col("doc_id").cast("string")).alias("__h"),
    )
    ranked = attach_global_row_number(
        docs,
        order_by=[F.asc("__h"), F.asc("doc_id")],
        partition_by=["lang"],
        rn_col="__rn",
        total_col="__n",
    )
    return (
        ranked.filter(F.col("__rn") <= SS07_RESERVOIR_K)
        .groupBy("lang")
        .agg(
            F.max("__n").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("reservoir_size"),
            F.sum("doc_id").cast("bigint").alias("reservoir_docid_sum"),
            F.max("__h").cast("bigint").alias("kmv_threshold"),
        )
        .orderBy("lang")
    )


_SS07_ORACLE = f"""
WITH hashed AS (
  SELECT lang, doc_id,
         {_H60.format(x="CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
), ranked AS (
  SELECT lang, doc_id, h,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM hashed
)
SELECT lang,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS reservoir_size,
       CAST(SUM(doc_id) AS BIGINT) AS reservoir_docid_sum,
       CAST(MAX(h) AS BIGINT) AS kmv_threshold
FROM ranked WHERE rn <= {SS07_RESERVOIR_K}
GROUP BY lang ORDER BY lang
"""

ROUND7_STAGED_QUERIES["ss07_stratified_reservoir"] = (
    ss07_stratified_reservoir
)
ROUND7_STAGED_ORACLE["ss07_stratified_reservoir"] = _SS07_ORACLE


def en02_bigram_conditional_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language word-level entropy pair: unigram entropy H(W) and
    bigram conditional entropy H(W₂|W₁) — the entropy-RATE estimate
    whose gap (the information the previous word carries) is the
    language-structure signal: near-zero gap means shuffled/templated
    word soup, a large gap means real sequential structure. en01
    measures the character alphabet; this measures the word process —
    together they bracket the compressibility a tokenizer can exploit.

    Scale: both terms reduce keyed count tables (unigram types, bigram
    types — the tx13/tx14 shuffle shapes); H sums c·(-log2 ratio) per
    TYPE, so log2 runs once per type row and the per-lang totals are
    exact-integer-weighted DECIMAL sums (the en01 discipline
    verbatim). Output bounded by |langs|. info_gain >= 0 is Gibbs'
    inequality, pinned in the invariant test."""
    from pyspark.sql import Window

    docs = load(spark, sf, "documents").select(
        "lang", tx.words("text").alias("__w")
    )
    toks = docs.select("lang", F.explode("__w").alias("__t"))
    wl = Window.partitionBy("lang")
    uni = (
        toks.groupBy("lang", "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn("__n", F.sum("__c").over(wl))
        .select(
            "lang",
            "__n",
            (
                F.col("__c").cast("decimal(20,0)")
                * F.round(
                    -F.log2(
                        F.col("__c").cast("double") / F.col("__n")
                    ),
                    8,
                ).cast("decimal(12,8)")
            ).alias("__term"),
        )
        .groupBy("lang")
        .agg(
            F.max("__n").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("__term").cast("double") / F.max("__n"), 6
            ).alias("h_unigram"),
        )
    )
    big = docs.select(
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(__w) >= 2 THEN "
                "transform(sequence(1, size(__w) - 1), "
                "i -> struct(element_at(__w, i) AS w1, "
                "element_at(__w, i + 1) AS w2)) "
                "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) "
                "END"
            )
        ).alias("__g"),
    ).select("lang", "__g.w1", "__g.w2")
    w1ctx = Window.partitionBy("lang", "w1")
    cond = (
        big.groupBy("lang", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("__c12"))
        .withColumn("__ctx", F.sum("__c12").over(w1ctx))
        .withColumn("__n", F.sum("__c12").over(Window.partitionBy("lang")))
        .select(
            "lang",
            "__n",
            (
                F.col("__c12").cast("decimal(20,0)")
                * F.round(
                    -F.log2(
                        F.col("__c12").cast("double") / F.col("__ctx")
                    ),
                    8,
                ).cast("decimal(12,8)")
            ).alias("__term"),
        )
        .groupBy("lang")
        .agg(
            F.max("__n").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum("__term").cast("double") / F.max("__n"), 6
            ).alias("h_conditional"),
        )
    )
    return (
        uni.join(cond, "lang")
        .select(
            "lang",
            "n_tokens",
            "n_bigrams",
            "h_unigram",
            "h_conditional",
            F.round(
                F.col("h_unigram") - F.col("h_conditional"), 6
            ).alias("info_gain"),
        )
        .orderBy("lang")
    )


_EN02_ORACLE = f"""
WITH d AS (
  SELECT lang, {_WORDS} AS w FROM documents
), toks AS (
  SELECT lang, unnest(w) AS t FROM d
), uni AS (
  SELECT lang, CAST(MAX(n) AS BIGINT) AS n_tokens,
         ROUND(CAST(SUM(term) AS DOUBLE) / MAX(n), 6) AS h_unigram
  FROM (
    SELECT lang,
           SUM(c) OVER (PARTITION BY lang) AS n,
           CAST(c AS DECIMAL(20,0))
             * CAST(ROUND(-log2(CAST(c AS DOUBLE)
                    / SUM(c) OVER (PARTITION BY lang)), 8)
                    AS DECIMAL(12,8)) AS term
    FROM (SELECT lang, t, COUNT(*) AS c FROM toks GROUP BY lang, t)
  ) GROUP BY lang
), big AS (
  SELECT lang, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT)+1] AS w2
  FROM (SELECT lang, w, unnest(range(1, len(w))) AS i FROM d)
), cond AS (
  SELECT lang, CAST(MAX(n) AS BIGINT) AS n_bigrams,
         ROUND(CAST(SUM(term) AS DOUBLE) / MAX(n), 6) AS h_conditional
  FROM (
    SELECT lang,
           SUM(c12) OVER (PARTITION BY lang) AS n,
           CAST(c12 AS DECIMAL(20,0))
             * CAST(ROUND(-log2(CAST(c12 AS DOUBLE)
                    / SUM(c12) OVER (PARTITION BY lang, w1)), 8)
                    AS DECIMAL(12,8)) AS term
    FROM (SELECT lang, w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2, 3)
  ) GROUP BY lang
)
SELECT u.lang, u.n_tokens, c.n_bigrams, u.h_unigram, c.h_conditional,
       ROUND(u.h_unigram - c.h_conditional, 6) AS info_gain
FROM uni u JOIN cond c ON u.lang = c.lang
ORDER BY u.lang
"""

ROUND7_STAGED_QUERIES["en02_bigram_conditional_entropy"] = (
    en02_bigram_conditional_entropy
)
ROUND7_STAGED_ORACLE["en02_bigram_conditional_entropy"] = _EN02_ORACLE


#: scd02's version-2 effective date and the re-price factor — shared by
#: the Spark plan and the oracle (the constant-mirroring rule). Every
#: 7th supplier gets a second version effective at the cutover.
SCD02_CUTOVER = "1995-01-01"
SCD02_OPEN_END = "9999-12-31"


def scd02_point_in_time_join(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time (AS-OF) fact↔dimension join against a dated SCD2
    dimension — the query pattern scd01's merge EXISTS to serve: facts
    must join the dimension version that was valid WHEN THE FACT
    HAPPENED, not the current one. A deterministic two-version
    supplier dimension (every 7th supplier re-priced +10% effective
    SCD02_CUTOVER — scd01's update batch, now with validity dates)
    enriches lineitem on (supplier, shipdate ∈ [valid_from,
    valid_to)); the rollup proves the version routing: pre-cutover
    lines land on version 1, post-cutover lines on version 2, and
    version 2 exists only for the re-priced seventh.

    Scale: the join is EQUI on suppkey with the date range as a
    residual filter — ≤ 2 dimension rows per key, so this is a plain
    broadcast-able dimension join, NEVER a range-join explosion; the
    rollup output is bounded (2 versions × 2 cohorts). Money stays
    DECIMAL end-to-end."""
    sup = load(spark, sf, "supplier").select(
        "s_suppkey", dec("s_acctbal").alias("__bal")
    )
    seventh = F.col("s_suppkey") % 7 == 0
    cut = F.lit(SCD02_CUTOVER).cast("date")
    lo = F.lit("1992-01-01").cast("date")
    hi = F.lit(SCD02_OPEN_END).cast("date")
    v1 = sup.select(
        "s_suppkey",
        F.col("__bal").alias("acctbal"),
        F.lit(1).alias("version"),
        lo.alias("__from"),
        F.when(seventh, cut).otherwise(hi).alias("__to"),
    )
    v2 = sup.filter(seventh).select(
        "s_suppkey",
        F.round(F.col("__bal") * F.lit(1.1).cast("decimal(3,1)"), 2)
        .cast("decimal(18,2)")
        .alias("acctbal"),
        F.lit(2).alias("version"),
        cut.alias("__from"),
        hi.alias("__to"),
    )
    dim = v1.unionByName(v2)
    li = load(spark, sf, "lineitem").select(
        "l_suppkey",
        F.to_date("l_shipdate").alias("__ship"),
        dec("l_extendedprice").alias("__price"),
    )
    joined = li.join(
        dim,
        (li.l_suppkey == dim.s_suppkey)
        & (F.col("__ship") >= F.col("__from"))
        & (F.col("__ship") < F.col("__to")),
    )
    return (
        joined.groupBy(
            "version", (F.col("s_suppkey") % 7 == 0).alias("repriced_cohort")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.countDistinct("s_suppkey").cast("bigint").alias("n_suppliers"),
            F.round(F.sum("__price").cast("double"), 2).alias("revenue"),
            F.round(
                F.sum(F.col("acctbal").cast("decimal(25,2)")).cast("double"),
                2,
            ).alias("acctbal_mass"),
        )
        .orderBy("version", "repriced_cohort")
    )


_SCD02_ORACLE = f"""
WITH sup AS (
  SELECT s_suppkey, CAST(s_acctbal AS DECIMAL(18,2)) AS bal FROM supplier
), dim AS (
  SELECT s_suppkey, bal AS acctbal, 1 AS version,
         DATE '1992-01-01' AS vfrom,
         CASE WHEN s_suppkey % 7 = 0 THEN DATE '{SCD02_CUTOVER}'
              ELSE DATE '{SCD02_OPEN_END}' END AS vto
  FROM sup
  UNION ALL
  SELECT s_suppkey,
         CAST(ROUND(bal * CAST(1.1 AS DECIMAL(3,1)), 2) AS DECIMAL(18,2)),
         2, DATE '{SCD02_CUTOVER}', DATE '{SCD02_OPEN_END}'
  FROM sup WHERE s_suppkey % 7 = 0
), li AS (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS price
  FROM lineitem
)
SELECT version, (s_suppkey % 7 = 0) AS repriced_cohort,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
       ROUND(CAST(SUM(price) AS DOUBLE), 2) AS revenue,
       ROUND(CAST(SUM(CAST(acctbal AS DECIMAL(25,2))) AS DOUBLE), 2)
         AS acctbal_mass
FROM li JOIN dim
  ON l_suppkey = s_suppkey AND ship >= vfrom AND ship < vto
GROUP BY version, (s_suppkey % 7 = 0)
ORDER BY version, repriced_cohort
"""

ROUND7_STAGED_QUERIES["scd02_point_in_time_join"] = scd02_point_in_time_join
ROUND7_STAGED_ORACLE["scd02_point_in_time_join"] = _SCD02_ORACLE


# ---------------------------------------------------------------------------
# Round-10 staging, wave 57: es18 IVF cell-balance audit, dd20 near-dup
# cluster-size histogram, ct05 span-level decontamination exposure.


def es18_ivf_cell_balance(spark: SparkSession, sf: str) -> DataFrame:
    """IVF index cell-balance audit: vectors per coarse cell plus each
    cell's mean/min cosine coherence to its own centroid — the
    index-quality table an ANN deployment reads before trusting
    nprobe settings (es17's recall/cost sweep assumes cells are
    usable; a fat cell slows every probe that touches it, an
    incoherent cell leaks recall). Uses THE shared assignment rule
    (similarity.assign_to_centroids — the same certified kernel es04/
    es06/es12 ride), so this audits exactly the index the searches
    search.

    Scale: one broadcast of the 16-centroid panel, map-only
    assignment, one keyed aggregate onto the 16-row output. Cosines
    round to 4 dp per vector (the es01 convention) then DECIMAL-sum."""
    from local_etl_csv_to_postgresql_spark.functions.similarity import (
        assign_to_centroids,
        dot,
        norm,
    )

    emb = load(spark, sf, "embeddings")
    cents = (
        emb.orderBy("vec_id")
        .limit(16)
        .select(
            F.col("vec_id").alias("__cid"), F.col("embedding").alias("__cvec")
        )
    )
    # the shared rule drops its raw __sim; carry the 4-dp cosine of the
    # WINNING pair via the extra hook (the es12 pattern)
    assigned = assign_to_centroids(
        emb,
        cents,
        "vec_id",
        "embedding",
        extra={
            "__s": lambda v, c: F.round(
                dot(v, c) / F.nullif(norm(v) * norm(c), F.lit(0.0)), 4
            )
        },
    ).select("vec_id", F.col("__cid").alias("cell"), "__s")
    total = emb.agg(F.count(F.lit(1)).alias("__n"))
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.round(
                F.sum(F.col("__s").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_coherence"),
            F.min("__s").alias("min_coherence"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "cell",
            "n_vectors",
            F.round(
                F.col("n_vectors").cast("double") / F.col("__n"), 6
            ).alias("cell_share"),
            "mean_coherence",
            "min_coherence",
        )
        .orderBy("cell")
    )


_ES18_ORACLE = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
  ORDER BY vec_id LIMIT 16
), scored AS (
  SELECT e.vec_id, c.cid,
         {_DOT.format(a='e.embedding', b='c.cvec')}
           / NULLIF({_NORM.format(a='e.embedding')}
                    * {_NORM.format(a='c.cvec')}, 0.0) AS sim
  FROM embeddings e CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, cid AS cell, ROUND(sim, 4) AS s
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC NULLS LAST, cid) AS rn
        FROM scored)
  WHERE rn = 1
), total AS (SELECT COUNT(*) AS n FROM embeddings)
SELECT cell,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM total), 6)
         AS cell_share,
       ROUND(CAST(SUM(CAST(s AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)
         AS mean_coherence,
       MIN(s) AS min_coherence
FROM assigned
GROUP BY cell ORDER BY cell
"""

ROUND7_STAGED_QUERIES["es18_ivf_cell_balance"] = es18_ivf_cell_balance
ROUND7_STAGED_ORACLE["es18_ivf_cell_balance"] = _ES18_ORACLE


def dd20_cluster_size_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup cluster-size histogram + dedup savings — the report a
    dedup run actually ships: how many clusters of each size exist,
    how many documents they hold, and how many rows keep-one-per-
    cluster deletes (Σ size−1). dd06 labels documents, dd07 picks
    representatives; this is the corpus-level accounting of the same
    certified component table (_neardup_components — the shared
    materialized intermediate, so no CC re-run).

    Scale: two keyed aggregates above the shared label table (labels →
    component sizes → size histogram); output bounded by the largest
    cluster size. Exact integers end-to-end."""
    comp = _neardup_components(spark, sf)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("__size")
    )
    return (
        sizes.groupBy(F.col("__size").cast("bigint").alias("cluster_size"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("bigint")
            .alias("dedup_savings"),
        )
        .orderBy("cluster_size")
    )


_DD20_ORACLE = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range({MINHASH_K})) AS j) GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ',')) AS band_key
  FROM pj GROUP BY doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
), good AS (
  SELECT id_a, id_b
  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
  WHERE {_JACCARD.format(a='sa.s', b='sb.s')} >= 0.5
), edges AS (
  SELECT id_a AS s, id_b AS d FROM good
  UNION ALL SELECT id_b AS s, id_a AS d FROM good
), reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
), comp AS (
  SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id
), sizes AS (
  SELECT component, COUNT(*) AS sz FROM comp GROUP BY component
)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(sz * COUNT(*) AS BIGINT) AS n_docs,
       CAST((sz - 1) * COUNT(*) AS BIGINT) AS dedup_savings
FROM sizes
GROUP BY sz ORDER BY cluster_size
"""

ROUND7_STAGED_QUERIES["dd20_cluster_size_histogram"] = (
    dd20_cluster_size_histogram
)
ROUND7_STAGED_ORACLE["dd20_cluster_size_histogram"] = _DD20_ORACLE


def ct05_span_decontamination_exposure(
    spark: SparkSession, sf: str
) -> DataFrame:
    """Span-level decontamination cost: per source, the fraction of
    n-gram POSITIONS sitting on a cross-source-shared gram — the
    token-mass a span-REDACTION decontamination pass would cut, vs
    ct02's whole-document drops (dropping a doc for one stock phrase
    wastes the rest of it; this table says how much). A gram is
    contaminated when its distinct-per-source unit appears in >= 2
    sources (ct01's sharing rule at the same CONTAM_NGRAM order).

    Scale: the contaminated-gram set reduces the distinct (source,
    gram-hash) table by one keyed count (HAVING >= 2); positions flow
    through a LEFT SEMI join on the 60-bit hash — never full text —
    then one source-keyed rollup. Same shuffle discipline as ct01:
    one distinct reduce, one equi-join, nothing quadratic. r13: the
    position stream pre-reduces to per-(doc, gram) counts shared via
    _span_gram_doc_counts (one explode + one reused Exchange instead
    of three evaluations of the exploded stream); per-doc position
    counts are recovered as SUM(k) — identical values."""
    pu = _span_gram_doc_counts(spark, sf)
    shared = _cross_source_shared_grams(pu)
    per_doc = (
        pu.join(shared, "__u", "left_semi")
        .groupBy("doc_id", "source")
        .agg(F.sum("__k").alias("__bad"))
    )
    base = pu.groupBy("doc_id", "source").agg(
        F.sum("__k").alias("__tot")
    )
    joined = base.join(per_doc.select("doc_id", "__bad"), "doc_id", "left")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("__bad").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("docs_affected"),
            F.sum("__tot").cast("bigint").alias("total_gram_positions"),
            F.sum(F.coalesce(F.col("__bad"), F.lit(0)))
            .cast("bigint")
            .alias("contaminated_positions"),
            F.round(
                F.sum(F.coalesce(F.col("__bad"), F.lit(0))).cast("double")
                / F.sum("__tot").cast("double"),
                6,
            ).alias("redaction_fraction"),
        )
        .orderBy("source")
    )


_CT05_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, {_WORDS} AS words FROM documents
), pos AS (
  SELECT doc_id, source, substr(md5(g), 1, 15) AS u
  FROM (SELECT doc_id, source,
               unnest({_sql_span_grams('words', CONTAM_NGRAM)}) AS g
        FROM w)
), shared AS (
  SELECT u FROM (SELECT DISTINCT source, u FROM pos)
  GROUP BY u HAVING COUNT(*) >= 2
), base AS (
  SELECT doc_id, source, COUNT(*) AS tot FROM pos GROUP BY 1, 2
), bad AS (
  SELECT doc_id, COUNT(*) AS bad
  FROM pos WHERE u IN (SELECT u FROM shared)
  GROUP BY doc_id
)
SELECT b.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.bad IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_affected,
       CAST(SUM(b.tot) AS BIGINT) AS total_gram_positions,
       CAST(SUM(COALESCE(d.bad, 0)) AS BIGINT) AS contaminated_positions,
       ROUND(CAST(SUM(COALESCE(d.bad, 0)) AS DOUBLE) / SUM(b.tot), 6)
         AS redaction_fraction
FROM base b LEFT JOIN bad d ON b.doc_id = d.doc_id
GROUP BY b.source ORDER BY b.source
"""

ROUND7_STAGED_QUERIES["ct05_span_decontamination_exposure"] = (
    ct05_span_decontamination_exposure
)
ROUND7_STAGED_ORACLE["ct05_span_decontamination_exposure"] = _CT05_ORACLE


# ---------------------------------------------------------------------------
# Round-10 staging, wave 58: st19 streaming Bloom filter, cm02 Count-Min
# width sweep, pk03 packing context-length curve.


def _register_staged_streaming_wave58() -> None:
    from local_etl_csv_to_postgresql_spark.streaming.queries import (
        ST19_STAGED_ORACLE,
        st19_streaming_bloom_filter,
    )

    ROUND7_STAGED_QUERIES["st19_streaming_bloom_filter"] = (
        st19_streaming_bloom_filter
    )
    ROUND7_STAGED_ORACLE["st19_streaming_bloom_filter"] = ST19_STAGED_ORACLE


_register_staged_streaming_wave58()


#: cm02's width sweep grid (depth fixed at cm01's 4 rows). The widths
#: bracket cm01's 512 so the tuning table prices both directions.
CM02_WIDTHS = (128, 512, 2048)
CM02_DEPTH = 4


def cm02_countmin_width_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min width tuning table: the SAME token stream sketched at
    W ∈ {128, 512, 2048} (depth 4, cm01's seeded hash family), scored
    on the top-10 heavy hitters — occupied cells, mean and max
    overestimate per width. This is dd18's sketch-size economics for
    the counting sketch: error ≈ N/W, so each 4× width step should cut
    the overestimate ~4× — the measured curve is what a capacity
    planner reads to pick W for a token-frequency monitor.

    Scale: ONE token-count aggregate feeds everything; the (token,
    depth-row) hash computes ONCE and re-buckets per width by modulus
    (three bounded cell aggregates — sweep cost linear in widths).
    Probes are TakeOrdered-bounded. Exact integers end-to-end; the
    MAE is one rounded division."""
    toks = (
        _docs_words(spark, sf)
        .select(F.explode("__words").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_count"))
    )
    rows = F.sequence(F.lit(0), F.lit(CM02_DEPTH - 1))
    keyed = toks.select(
        "token", "true_count", F.explode(rows).alias("__d")
    ).withColumn(
        "__h",
        dd.hash60(
            F.concat(
                F.lit("cm"),
                F.col("__d").cast("string"),
                F.lit(":"),
                F.col("token"),
            )
        ),
    )
    probes = (
        toks.orderBy(F.desc("true_count"), "token")
        .limit(10)
        .select(F.col("token").alias("__pt"))
    )
    top = keyed.join(
        F.broadcast(probes), keyed.token == F.col("__pt"), "inner"
    )
    out = None
    for w in CM02_WIDTHS:
        cells = keyed.groupBy(
            "__d", (F.col("__h") % w).alias("__b")
        ).agg(F.sum("true_count").alias("__cell"))
        est = (
            top.select("token", "true_count", "__d", (F.col("__h") % w).alias("__b"))
            .join(cells, ["__d", "__b"])
            .groupBy("token", "true_count")
            .agg(F.min("__cell").cast("bigint").alias("__est"))
        )
        row = est.agg(
            F.lit(w).cast("int").alias("width"),
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.round(
                F.sum(F.col("__est") - F.col("true_count")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("mean_overestimate"),
            F.max(F.col("__est") - F.col("true_count"))
            .cast("bigint")
            .alias("max_overestimate"),
        )
        occ = cells.agg(
            F.count(F.lit(1)).cast("bigint").alias("occupied_cells")
        )
        out_row = row.crossJoin(F.broadcast(occ)).select(
            "width",
            "occupied_cells",
            "n_probes",
            "mean_overestimate",
            "max_overestimate",
        )
        out = out_row if out is None else out.unionAll(out_row)
    return out.orderBy("width")


def _cm02_oracle_sql() -> str:
    h = _H60.format(x="'cm' || CAST(d AS VARCHAR) || ':' || token")
    legs = []
    for w in CM02_WIDTHS:
        legs.append(f"""
SELECT {w} AS width,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (
          SELECT d, ({h}) % {w} AS b, SUM(true_count) AS cell
          FROM keyed GROUP BY 1, 2)) AS occupied_cells,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       ROUND(CAST(SUM(est - true_count) AS DOUBLE) / COUNT(*), 2)
         AS mean_overestimate,
       CAST(MAX(est - true_count) AS BIGINT) AS max_overestimate
FROM (
  SELECT k.token, k.true_count, MIN(c.cell) AS est
  FROM (SELECT *, ({h}) % {w} AS b FROM keyed
        WHERE token IN (SELECT token FROM probes)) k
  JOIN (SELECT d, ({h}) % {w} AS b, SUM(true_count) AS cell
        FROM keyed GROUP BY 1, 2) c
    ON k.d = c.d AND k.b = c.b
  GROUP BY k.token, k.true_count
)""")
    return f"""
WITH toks AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM (SELECT unnest({_WORDS}) AS token FROM documents)
  GROUP BY token
), keyed AS (
  SELECT token, true_count, d
  FROM toks CROSS JOIN (SELECT unnest(range({CM02_DEPTH})) AS d)
), probes AS (
  SELECT token FROM toks ORDER BY true_count DESC, token LIMIT 10
)
SELECT * FROM ({" UNION ALL ".join(legs)}) ORDER BY width
"""


ROUND7_STAGED_QUERIES["cm02_countmin_width_sweep"] = cm02_countmin_width_sweep
ROUND7_STAGED_ORACLE["cm02_countmin_width_sweep"] = _cm02_oracle_sql()


#: pk03's context-length grid — the budgets a training run actually
#: chooses between.
PK03_BUDGETS = (512, 1024, 2048)


def pk03_context_length_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Packing-efficiency curve across context lengths: pk01's greedy
    per-language packing evaluated at 512/1024/2048-token windows from
    ONE distributed prefix sum — the running token count computes once
    (same doc order), and each budget just re-buckets it (a doc's bin
    is its prefix start div budget). The output is the fill-ratio
    table a training run reads to pick its sequence length: longer
    contexts amortize fixed tokens better only until document
    granularity wastes the tail of each window.

    Scale: one ranking-operator pass (range partition + broadcast
    offsets, the pk01 kernel); per-budget bin counts are
    countDistinct((lang, bin)) in one aggregate — sweep cost is three
    expressions, not three shuffles. Exact integers; fill ratios are
    one rounded division each."""
    from ..operators.ranking import attach_global_row_number

    docs = load(spark, sf, "documents").select(
        "lang", "doc_id", tx.token_count("text").alias("__tok")
    )
    packed = attach_global_row_number(
        docs,
        order_by=[F.asc("doc_id")],
        partition_by=["lang"],
        rn_col="__rn",
        running_sum_of="__tok",
        running_sum_col="__run",
    ).withColumn("__start", F.col("__run") - F.col("__tok"))
    agg = packed.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_docs"),
        F.sum("__tok").cast("bigint").alias("__total"),
        *[
            F.countDistinct(
                F.struct("lang", F.expr(f"__start div {b}"))
            )
            .cast("bigint")
            .alias(f"__bins{b}")
            for b in PK03_BUDGETS
        ],
    )
    stacked = agg.select(
        F.expr(
            "stack(3, "
            + ", ".join(f"{b}, __bins{b}" for b in PK03_BUDGETS)
            + ") AS (context_len, n_bins)"
        ),
        F.col("__n_docs").alias("n_docs"),
        F.col("__total").alias("total_tokens"),
    )
    return stacked.select(
        F.col("context_len").cast("int").alias("context_len"),
        "n_docs",
        "total_tokens",
        F.col("n_bins").cast("bigint").alias("n_bins"),
        F.round(
            F.col("total_tokens").cast("double")
            / (F.col("n_bins") * F.col("context_len")).cast("double"),
            6,
        ).alias("fill_ratio"),
    ).orderBy("context_len")


def _pk03_oracle_sql() -> str:
    legs = []
    for b in PK03_BUDGETS:
        legs.append(f"""
SELECT {b} AS context_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT (lang, start // {b})) AS BIGINT) AS n_bins,
       ROUND(CAST(SUM(tok) AS DOUBLE)
             / (COUNT(DISTINCT (lang, start // {b})) * {b}), 6)
         AS fill_ratio
FROM packed""")
    return f"""
WITH docs AS (
  SELECT lang, doc_id, len(regexp_extract_all(text, '\\S+')) AS tok
  FROM documents
), packed AS (
  SELECT lang, tok,
         SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - tok AS start
  FROM docs
)
SELECT * FROM ({" UNION ALL ".join(legs)}) ORDER BY context_len
"""


ROUND7_STAGED_QUERIES["pk03_context_length_curve"] = pk03_context_length_curve
ROUND7_STAGED_ORACLE["pk03_context_length_curve"] = _pk03_oracle_sql()


# ---------------------------------------------------------------------------
# Round-10 staging, wave 59: dd21 LSH band-geometry sweep, px02 PII
# injection roundtrip, dp02 DP clip-bound sweep.


#: dd21's band grid at the library's fixed k=16 signature — nested
#: geometries (each divides the next), so candidate sets are provably
#: contained: a full-band match at 2 bands (r=8) implies matches at 4
#: and 8 bands.
DD21_BAND_GRID = (2, 4, 8)


def dd21_lsh_band_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """LSH band-geometry tuning table: the SAME k=16 MinHash signatures
    banded at b ∈ {2, 4, 8} (r = 8/4/2 rows per band), reporting
    candidate volume, verified near-dups (exact Jaccard >= 0.5 on the
    candidates), and precision per geometry. This is the measured
    s-curve the b×r theory promises (P(candidate) = 1-(1-s^r)^b):
    dd18 priced sketch SIZE, this prices sketch SHAPE — together they
    are the full MinHash-LSH capacity-planning table. The grid nests,
    so candidates(b=2) ⊆ candidates(b=4) ⊆ candidates(b=8) — pinned as
    the invariant.

    Scale: ONE signature build (the shared materialized _lsh_base
    signatures — no re-shingle, no re-hash); per geometry one
    band-keyed equi self-join (the dd03 shape, never all-pairs) and
    one bounded verify join. Sweep cost linear in geometries. Exact
    integers; precision is one rounded division."""
    docs, sigs, _pairs = _lsh_base(spark, sf)
    a_sh = docs.select(
        F.col("doc_id").alias("id_a"), F.col("__sh").alias("__sa")
    )
    b_sh = docs.select(
        F.col("doc_id").alias("id_b"), F.col("__sh").alias("__sb")
    )
    out = None
    for b in DD21_BAND_GRID:
        cand = dd.lsh_candidate_pairs(
            sigs, "doc_id", "signature", k=MINHASH_K, bands=b
        )
        verified = (
            cand.join(a_sh, "id_a")
            .join(b_sh, "id_b")
            .filter(dd.jaccard(F.col("__sa"), F.col("__sb")) >= 0.5)
        )
        row = (
            cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
            .crossJoin(
                F.broadcast(
                    verified.agg(
                        F.count(F.lit(1)).cast("bigint").alias("n_verified")
                    )
                )
            )
            .select(
                F.lit(b).cast("int").alias("n_bands"),
                F.lit(MINHASH_K // b).cast("int").alias("rows_per_band"),
                "n_candidates",
                "n_verified",
                F.when(
                    F.col("n_candidates") > 0,
                    F.round(
                        F.col("n_verified").cast("double")
                        / F.col("n_candidates").cast("double"),
                        6,
                    ),
                ).alias("precision"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("n_bands")


def _dd21_oracle_sql() -> str:
    legs = []
    for b in DD21_BAND_GRID:
        r = MINHASH_K // b
        legs.append(f"""
SELECT {b} AS n_bands, {r} AS rows_per_band,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_{b}) AS n_candidates,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM good_{b}) AS n_verified,
       CASE WHEN (SELECT COUNT(*) FROM cand_{b}) > 0 THEN
         ROUND((SELECT CAST(COUNT(*) AS DOUBLE) FROM good_{b})
               / (SELECT COUNT(*) FROM cand_{b}), 6)
       END AS precision""")
    band_ctes = []
    for b in DD21_BAND_GRID:
        r = MINHASH_K // b
        band_ctes.append(f"""bands_{b} AS (
  SELECT doc_id, CAST(FLOOR(j / {r}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ','))
           AS band_key
  FROM pj GROUP BY doc_id, CAST(FLOOR(j / {r}) AS INT)
), cand_{b} AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands_{b} a JOIN bands_{b} b
    ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
), good_{b} AS (
  SELECT id_a, id_b
  FROM cand_{b} JOIN sh sa ON sa.doc_id = id_a
                JOIN sh sb ON sb.doc_id = id_b
  WHERE {_JACCARD.format(a='sa.s', b='sb.s')} >= 0.5
)""")
    return f"""
WITH sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range({MINHASH_K})) AS j)
  GROUP BY doc_id, j
), {', '.join(band_ctes)}
SELECT * FROM ({' UNION ALL '.join(legs)}) ORDER BY n_bands
"""


ROUND7_STAGED_QUERIES["dd21_lsh_band_sweep"] = dd21_lsh_band_sweep
ROUND7_STAGED_ORACLE["dd21_lsh_band_sweep"] = _dd21_oracle_sql()


#: px02 injects one synthetic email into every PX02_EVERY-th document —
#: module-level so the Spark plan and oracle inject identically.
PX02_EVERY = 50


def px02_pii_injection_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """PII scan/redact ROUNDTRIP certification on injected data: the
    corpus is synthetic-clean (px01's counts are all zero — a scanner
    that found nothing was never proven to find anything), so this
    query deterministically injects one email into every 50th document,
    scans (found == injected, exactly), redacts, and re-scans (residue
    == 0). This turns the PII path's cross-engine regex semantics —
    Java regex on Spark, RE2 on DuckDB — into a hash-certified fact on
    MATCHING data, not just empty data.

    Scale: pure row-local regexp work inside codegen (the px01 plan
    plus one concat), one source-keyed rollup. No joins, no windows."""
    email = tx.PII_PATTERNS["email"]
    docs = load(spark, sf, "documents").select(
        "source",
        "doc_id",
        F.when(
            F.col("doc_id") % PX02_EVERY == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com asap"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("__t"),
    )
    scanned = docs.select(
        "source",
        "doc_id",
        F.regexp_count(F.col("__t"), F.lit(email)).alias("__found"),
        F.regexp_count(
            F.regexp_replace(F.col("__t"), email, tx.PII_TOKEN),
            F.lit(email),
        ).alias("__residue"),
        (
            F.length("__t")
            - F.length(F.regexp_replace(F.col("__t"), email, tx.PII_TOKEN))
        ).alias("__delta"),
    )
    return (
        scanned.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") % PX02_EVERY == 0, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_injected"),
            F.sum("__found").cast("bigint").alias("emails_found"),
            F.sum("__residue").cast("bigint").alias("residue_after_redact"),
            F.sum("__delta").cast("bigint").alias("redaction_char_delta"),
        )
        .orderBy("source")
    )


_PX02_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

_PX02_ORACLE = f"""
WITH injected AS (
  SELECT source, doc_id,
         CASE WHEN doc_id % {PX02_EVERY} = 0 THEN
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com asap'
         ELSE text END AS t
  FROM documents
), scanned AS (
  SELECT source, doc_id,
         len(regexp_extract_all(t, '{_PX02_EMAIL_SQL}')) AS found,
         len(regexp_extract_all(
           regexp_replace(t, '{_PX02_EMAIL_SQL}', '[PII]', 'g'),
           '{_PX02_EMAIL_SQL}')) AS residue,
         length(t) - length(
           regexp_replace(t, '{_PX02_EMAIL_SQL}', '[PII]', 'g')) AS delta
  FROM injected
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % {PX02_EVERY} = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_injected,
       CAST(SUM(found) AS BIGINT) AS emails_found,
       CAST(SUM(residue) AS BIGINT) AS residue_after_redact,
       CAST(SUM(delta) AS BIGINT) AS redaction_char_delta
FROM scanned
GROUP BY source ORDER BY source
"""

ROUND7_STAGED_QUERIES["px02_pii_injection_roundtrip"] = (
    px02_pii_injection_roundtrip
)
ROUND7_STAGED_ORACLE["px02_pii_injection_roundtrip"] = _PX02_ORACLE


#: dp02's clip-bound multipliers (bound = m × per-type mean user
#: contribution, dp01's convention at m=2).
DP02_MULTIPLIERS = (1, 2, 4)


def dp02_clip_bound_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """DP clip-bound tuning table: dp01's contribution-bounding audit
    evaluated at bounds of 1×/2×/4× the per-type mean user
    contribution — per (type, multiplier): users clipped and the exact
    fraction of value mass a DP release at that bound retains. The
    clipping bound is THE utility/privacy dial of DP-SGD and DP
    aggregate releases (noise scales with the bound, utility with the
    retained mass); this is the measured curve a privacy review reads
    to pick it. Completes the tuning-table family: dd18 (sketch size),
    es17 (nprobe), cm02 (width), dd21 (bands), now the DP bound.

    Scale: ONE per-(type, user) aggregate (the corpus-sized work),
    one bounded stats join back, one conditional aggregate onto the
    |types| × |multipliers| output. Integer cents end-to-end (Spark
    `div` = DuckDB `//`); the retained fraction is the single rounded
    divide at output."""
    per_user = (
        load(spark, sf, "events")
        .groupBy("event_type", "user_id")
        .agg(
            F.sum((dec("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("__contrib")
        )
    )
    means = per_user.groupBy("event_type").agg(
        F.expr("SUM(__contrib) div COUNT(*)")
        .cast("bigint")
        .alias("__mean")
    )
    joined = per_user.join(means, "event_type")
    out = None
    for m in DP02_MULTIPLIERS:
        bound = (F.col("__mean") * m).cast("bigint")
        row = (
            joined.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_users"),
                F.max(bound).cast("bigint").alias("bound_cents"),
                F.sum(F.when(F.col("__contrib") > bound, 1).otherwise(0))
                .cast("bigint")
                .alias("n_clipped_users"),
                F.sum(F.least(F.col("__contrib"), bound))
                .cast("bigint")
                .alias("__retained"),
                F.sum("__contrib").cast("bigint").alias("__total"),
            )
            .select(
                "event_type",
                F.lit(m).cast("int").alias("bound_multiplier"),
                "n_users",
                "bound_cents",
                "n_clipped_users",
                F.round(
                    F.col("__retained").cast("double")
                    / F.col("__total").cast("double"),
                    6,
                ).alias("retained_mass_fraction"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("event_type", "bound_multiplier")


def _dp02_oracle_sql() -> str:
    legs = []
    for m in DP02_MULTIPLIERS:
        legs.append(f"""
SELECT event_type, {m} AS bound_multiplier,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MAX(mean_c * {m}) AS BIGINT) AS bound_cents,
       CAST(SUM(CASE WHEN contrib > mean_c * {m} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped_users,
       ROUND(CAST(SUM(LEAST(contrib, mean_c * {m})) AS DOUBLE)
             / SUM(contrib), 6) AS retained_mass_fraction
FROM joined GROUP BY event_type""")
    return f"""
WITH per_user AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS contrib
  FROM events GROUP BY event_type, user_id
), means AS (
  SELECT event_type, CAST(SUM(contrib) // COUNT(*) AS BIGINT) AS mean_c
  FROM per_user GROUP BY event_type
), joined AS (
  SELECT p.event_type, p.contrib, m.mean_c
  FROM per_user p JOIN means m ON p.event_type = m.event_type
)
SELECT * FROM ({' UNION ALL '.join(legs)})
ORDER BY event_type, bound_multiplier
"""


ROUND7_STAGED_QUERIES["dp02_clip_bound_sweep"] = dp02_clip_bound_sweep
ROUND7_STAGED_ORACLE["dp02_clip_bound_sweep"] = _dp02_oracle_sql()


# ---------------------------------------------------------------------------
# Round-10 staging, wave 60: ret02 fixed-horizon retention, es19
# quantization bit-width sweep, aj03 nearest as-of join.


#: ret02's horizons — the product-analytics D1/D7/D30 convention.
RET02_HORIZONS = (1, 7, 30)


def ret02_fixed_horizon_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-horizon (D1/D7/D30) retention per daily signup cohort —
    the OTHER standard retention report next to ret01's weekly
    triangle: cohort = a user's first active day, retained at D = the
    user has an event exactly D days later (the strict classic-day
    definition, integer date math in both engines).

    Scale: one distinct (user, day) reduce, one user-keyed first-day
    aggregate, one join back, then ONE conditional aggregate onto the
    calendar-bounded cohort table — the horizons are three CASE
    expressions, not three passes. Exact integers until the rounded
    percentages."""
    ev = load(spark, sf, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("__d")
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("__d").alias("__d0"))
    joined = days.join(first, "user_id").select(
        "user_id", "__d0", F.datediff(F.col("__d"), F.col("__d0")).alias("__k")
    )
    flags = joined.groupBy("user_id", "__d0").agg(
        *[
            F.max(F.when(F.col("__k") == h, 1).otherwise(0)).alias(f"__r{h}")
            for h in RET02_HORIZONS
        ]
    )
    return (
        flags.groupBy(
            # midnight TIMESTAMP, not DATE — pandas date objects hash
            # differently than datetime64 (the win06 output convention)
            F.col("__d0").cast("timestamp").alias("cohort_day")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cohort_size"),
            *[
                F.sum(f"__r{h}").cast("bigint").alias(f"d{h}_retained")
                for h in RET02_HORIZONS
            ],
        )
        .select(
            "cohort_day",
            "cohort_size",
            *[f"d{h}_retained" for h in RET02_HORIZONS],
            *[
                F.round(
                    F.lit(100.0)
                    * F.col(f"d{h}_retained").cast("double")
                    / F.col("cohort_size").cast("double"),
                    4,
                ).alias(f"d{h}_pct")
                for h in RET02_HORIZONS
            ],
        )
        .orderBy("cohort_day")
    )


_RET02_ORACLE = f"""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), first AS (
  SELECT user_id, MIN(d) AS d0 FROM days GROUP BY user_id
), joined AS (
  SELECT days.user_id, f.d0, date_diff('day', f.d0, days.d) AS k
  FROM days JOIN first f ON days.user_id = f.user_id
), flags AS (
  SELECT user_id, d0,
         {', '.join(f"MAX(CASE WHEN k = {h} THEN 1 ELSE 0 END) AS r{h}"
                    for h in RET02_HORIZONS)}
  FROM joined GROUP BY user_id, d0
)
SELECT CAST(d0 AS TIMESTAMP) AS cohort_day,
       CAST(COUNT(*) AS BIGINT) AS cohort_size,
       {', '.join(f"CAST(SUM(r{h}) AS BIGINT) AS d{h}_retained"
                  for h in RET02_HORIZONS)},
       {', '.join(
           f"ROUND(100.0 * CAST(SUM(r{h}) AS DOUBLE) / COUNT(*), 4)"
           f" AS d{h}_pct" for h in RET02_HORIZONS)}
FROM flags
GROUP BY d0 ORDER BY cohort_day
"""

ROUND7_STAGED_QUERIES["ret02_fixed_horizon_retention"] = (
    ret02_fixed_horizon_retention
)
ROUND7_STAGED_ORACLE["ret02_fixed_horizon_retention"] = _RET02_ORACLE


#: es19's bit-width grid: symmetric levels 2^(b-1)-1 per width.
ES19_BITS = (2, 4, 8)


def es19_quantization_bit_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Quantization bit-width tuning table: es07's symmetric scale
    quantization (scale = max|x|/levels, q = round(x/scale),
    reconstruct q·scale) swept at 2/4/8 bits — the storage/recall dial
    of an embedding store, measured: reconstruction MSE per width.
    Extends the tuning-table family (dd18 sketch size, dd21 bands,
    cm02 width, es17 nprobe, dp02 clip bound) to the vector store.

    Scale: one scan; per-(vector, width) work is a row-local
    higher-order fold inside codegen (squares by multiplication — IEEE
    pow is not exactly rounded, x·x is); per-vector MSEs round to
    10 dp then DECIMAL-sum (stricter than es07's avg — shuffle-order-
    free by construction). Output is |widths| rows."""
    emb = load(spark, sf, "embeddings")
    base = emb.select(
        "embedding",
        F.expr(
            "aggregate(embedding, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
        ).alias("__amax"),
    )
    out = None
    for b in ES19_BITS:
        levels = (1 << (b - 1)) - 1
        recon = (
            "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + "
            "(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / __s) * __s)"
            " * "
            "(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / __s) * __s)"
            ") / size(embedding)"
        )
        per_vec = base.withColumn(
            "__s", F.col("__amax") / F.lit(float(levels))
        ).select(
            F.when(F.col("__amax") == 0.0, F.lit(0.0))
            .otherwise(F.round(F.expr(recon), 10))
            .cast("decimal(20,10)")
            .alias("__mse")
        )
        row = per_vec.agg(
            F.lit(b).cast("int").alias("bits"),
            F.lit(levels).cast("int").alias("levels"),
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(
                F.sum("__mse").cast("double") / F.count(F.lit(1)), 8
            ).alias("avg_mse"),
            F.round(F.max("__mse").cast("double"), 8).alias("max_mse"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("bits")


def _es19_oracle_sql() -> str:
    legs = []
    for b in ES19_BITS:
        levels = (1 << (b - 1)) - 1
        q = (
            f"(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / (amax / {levels}.0))"
            f" * (amax / {levels}.0))"
        )
        legs.append(f"""
SELECT {b} AS bits, {levels} AS levels,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(CAST(SUM(m) AS DOUBLE) / COUNT(*), 8) AS avg_mse,
       ROUND(CAST(MAX(m) AS DOUBLE), 8) AS max_mse
FROM (
  SELECT CAST(CASE WHEN amax = 0 THEN 0.0 ELSE
           ROUND(list_sum(list_transform(embedding, x ->
             {q} * {q})) / len(embedding), 10)
         END AS DECIMAL(20,10)) AS m
  FROM per
)""")
    return f"""
WITH per AS (
  SELECT embedding,
         list_aggregate(list_transform(embedding,
           x -> abs(CAST(x AS DOUBLE))), 'max') AS amax
  FROM embeddings
)
SELECT * FROM ({' UNION ALL '.join(legs)}) ORDER BY bits
"""


ROUND7_STAGED_QUERIES["es19_quantization_bit_sweep"] = (
    es19_quantization_bit_sweep
)
ROUND7_STAGED_ORACLE["es19_quantization_bit_sweep"] = _es19_oracle_sql()


#: aj03's symmetric tolerance (seconds) — nearest click within ±300 s.
AJ03_TOLERANCE_S = 300


def aj03_asof_nearest_join(spark: SparkSession, sf: str) -> DataFrame:
    """NEAREST-neighbor as-of join with symmetric tolerance: each
    purchase picks the user's click with the smallest |Δt| within
    ±300 s, equal-|Δt| ties preferring the PRIOR click, and same-
    timestamp ties resolved by the kernel's deterministic tiebreak
    (greatest click id backward, smallest forward) —
    the sensor-fusion/attribution shape that completes the as-of
    family (aj01 backward, aj02 forward-with-tolerance, this
    bidirectional-nearest).

    Scale: composes the SAME single-shuffle union+window kernel twice
    (operators/temporal.asof_join backward + forward, both
    tolerance-bounded) and resolves the winner with row-local CASE
    logic — never a time-range join, never per-user windows beyond the
    two the kernel already pays. Determinism: gaps are exact integer
    seconds; the preference order (smaller |gap|, prior-before-next,
    kernel tiebreak) is total."""
    from ..operators.temporal import asof_join

    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    back = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        right_cols=["click_id"],
        tiebreak="click_id",
        tolerance_seconds=AJ03_TOLERANCE_S,
    ).select(
        "purchase_id",
        "user_id",
        "ts",
        F.col("asof_click_id").alias("__prior_id"),
        (F.col("ts").cast("long") - F.col("asof_ts").cast("long")).alias(
            "__prior_gap"
        ),
    )
    fwd = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        right_cols=["click_id"],
        tiebreak="click_id",
        tolerance_seconds=AJ03_TOLERANCE_S,
        direction="forward",
    ).select(
        F.col("purchase_id").alias("__pid2"),
        F.col("asof_click_id").alias("__next_id"),
        (F.col("asof_ts").cast("long") - F.col("ts").cast("long")).alias(
            "__next_gap"
        ),
    )
    both = back.join(fwd, back.purchase_id == F.col("__pid2"), "left")
    prior_wins = F.col("__prior_id").isNotNull() & (
        F.col("__next_id").isNull()
        | (F.col("__prior_gap") <= F.col("__next_gap"))
    )
    return both.select(
        "purchase_id",
        "user_id",
        F.when(prior_wins, F.col("__prior_id"))
        .otherwise(F.col("__next_id"))
        .alias("nearest_click_id"),
        F.when(prior_wins, -F.col("__prior_gap"))
        .otherwise(F.col("__next_gap"))
        .cast("bigint")
        .alias("signed_gap_seconds"),
        F.when(F.col("__prior_id").isNull() & F.col("__next_id").isNull(),
               F.lit(None).cast("string"))
        .when(prior_wins, F.lit("prior"))
        .otherwise(F.lit("next"))
        .alias("direction"),
    ).orderBy("purchase_id")


_AJ03_ORACLE = f"""
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, ts FROM events
  WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts AS cts, event_id AS click_id FROM events
  WHERE event_type = 'click'
), cand AS (
  SELECT p.purchase_id, p.user_id, c.click_id,
         date_diff('second', c.cts, p.ts) AS gap,
         ROW_NUMBER() OVER (
           PARTITION BY p.purchase_id
           ORDER BY ABS(date_diff('second', c.cts, p.ts)),
                    CASE WHEN date_diff('second', c.cts, p.ts) >= 0
                         THEN 0 ELSE 1 END,
                    CASE WHEN date_diff('second', c.cts, p.ts) >= 0
                         THEN -c.click_id ELSE c.click_id END
         ) AS rn
  FROM purchases p JOIN clicks c
    ON p.user_id = c.user_id
   AND ABS(date_diff('second', c.cts, p.ts)) <= {AJ03_TOLERANCE_S}
)
SELECT p.purchase_id, p.user_id,
       c.click_id AS nearest_click_id,
       CAST(-c.gap AS BIGINT) AS signed_gap_seconds,
       CASE WHEN c.click_id IS NULL THEN NULL
            WHEN c.gap >= 0 THEN 'prior' ELSE 'next' END AS direction
FROM purchases p
LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
  ON p.purchase_id = c.purchase_id
ORDER BY p.purchase_id
"""

ROUND7_STAGED_QUERIES["aj03_asof_nearest_join"] = aj03_asof_nearest_join
ROUND7_STAGED_ORACLE["aj03_asof_nearest_join"] = _AJ03_ORACLE


# ---------------------------------------------------------------------------
# Round-10 staging, wave 61: cur03 perplexity-led curation funnel, gr07
# co-purchase communities.


def cur03_perplexity_curation_funnel(
    spark: SparkSession, sf: str
) -> DataFrame:
    """The ROUND-10 curation funnel, composed from this round's
    certified kernels and certified as ONE query (the cur01/cur02
    discipline): CCNet perplexity gate (keep the head+middle terciles
    of _bigram_xent_per_doc — qf05's bucketing) → span-contamination
    gate (drop docs carrying any cross-source-shared 7-gram — ct05's
    sharing rule) → near-dup keep-one (keep each doc that IS its
    cluster's min-id label — the _neardup_components convention).
    Per source: survivors at each stage. Certifying the composition is
    the point — stage plumbing, drop accounting, and kernel interaction
    on top of the individually-certified pieces.

    Scale: each stage is a semi/anti join keyed on doc_id or a 60-bit
    hash against an already-reduced drop set; the perplexity tercile
    rides the two-phase ranking operator; the CC labels are the shared
    materialized intermediate (no fixpoint re-run)."""
    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
        exact_ntile,
    )

    docs = load(spark, sf, "documents").select("doc_id", "source")
    # r13: the funnel's stage frames each feed TWO+ consumers (the
    # next stage and its own stage() count), and without a
    # materialization barrier every consumer re-runs the whole
    # upstream lineage. localCheckpoint the expensive per-doc frames
    # (LM scores; decontaminated survivors) — tiny vs the corpus, and
    # a pure execution barrier that cannot change any value.
    scored = _bigram_xent_per_doc(spark, sf).localCheckpoint()
    ranked = attach_global_row_number(
        scored,
        order_by=[F.asc("cross_entropy"), F.asc("doc_id")],
        rn_col="__rn",
        total_col="__n",
    ).select(
        "doc_id",
        "source",
        exact_ntile(F.col("__rn"), F.col("__n"), 3).alias("__bucket"),
    )
    good_ppl = ranked.filter(F.col("__bucket") <= 2).select(
        "doc_id", "source"
    )
    # ct05's sharing rule: docs with >= 1 cross-source-shared 7-gram
    # (via the shared reduced count frame — one explode, reused
    # Exchange; see _span_gram_doc_counts)
    pu = _span_gram_doc_counts(spark, sf)
    shared = _cross_source_shared_grams(pu)
    contaminated = (
        pu.join(shared, "__u", "left_semi").select("doc_id").distinct()
    )
    decontam = good_ppl.join(
        contaminated, "doc_id", "left_anti"
    ).localCheckpoint()
    # near-dup keep-one: the component label IS the min reachable
    # doc_id, so the representative is the doc whose id equals it
    comp = _neardup_components(spark, sf)
    final = decontam.join(comp, "doc_id").filter(
        F.col("doc_id") == F.col("component")
    )

    def stage(df, name):
        return df.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias(name)
        )

    return (
        stage(docs, "n_docs")
        .join(stage(scored, "n_scored"), "source", "left")
        .join(stage(good_ppl, "n_good_ppl"), "source", "left")
        .join(stage(decontam, "n_decontaminated"), "source", "left")
        .join(stage(final, "n_final"), "source", "left")
        .select(
            "source",
            "n_docs",
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
                for c in (
                    "n_scored",
                    "n_good_ppl",
                    "n_decontaminated",
                    "n_final",
                )
            ],
            F.round(
                F.coalesce(F.col("n_final"), F.lit(0)).cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("retention"),
        )
        .orderBy("source")
    )


_CUR03_ORACLE = f"""
WITH RECURSIVE {_BIGRAM_XENT_CTE.replace('d AS (', 'xd AS (', 1)
                 .replace('FROM (SELECT doc_id, lang, source, w, unnest(range(1, len(w))) AS i FROM d)',
                          'FROM (SELECT doc_id, lang, source, w, unnest(range(1, len(w))) AS i FROM xd)')
                 .replace('FROM (SELECT unnest(w) AS t FROM d)',
                          'FROM (SELECT unnest(w) AS t FROM xd)')},
ranked AS (
  SELECT doc_id, source,
         NTILE(3) OVER (ORDER BY cross_entropy, doc_id) AS bucket
  FROM xent
), good_ppl AS (
  SELECT doc_id, source FROM ranked WHERE bucket <= 2
), w AS (
  SELECT doc_id, source, {_WORDS} AS words FROM documents
), pos AS (
  SELECT doc_id, source, substr(md5(g), 1, 15) AS u
  FROM (SELECT doc_id, source,
               unnest({_sql_span_grams('words', CONTAM_NGRAM)}) AS g
        FROM w)
), shared AS (
  SELECT u FROM (SELECT DISTINCT source, u FROM pos)
  GROUP BY u HAVING COUNT(*) >= 2
), contaminated AS (
  SELECT DISTINCT doc_id FROM pos WHERE u IN (SELECT u FROM shared)
), decontam AS (
  SELECT doc_id, source FROM good_ppl
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
), sh AS (
  SELECT doc_id, {_sql_shingles(_WORDS)} AS s FROM documents
), ex AS (
  SELECT doc_id, unnest(s) AS sg FROM sh
), h AS (
  SELECT doc_id, {_H60.format(x='sg')} % 2147483648 AS h0 FROM ex
), pj AS (
  SELECT doc_id, j, MIN(((2*j + 3) * h0 + (5*j + 7)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range({MINHASH_K})) AS j)
  GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT) AS band,
         md5(array_to_string(list(CAST(mh AS VARCHAR) ORDER BY j), ','))
           AS band_key
  FROM pj GROUP BY doc_id, CAST(FLOOR(j / {MINHASH_K // MINHASH_BANDS}) AS INT)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
), good AS (
  SELECT id_a, id_b
  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
  WHERE {_JACCARD.format(a='sa.s', b='sb.s')} >= 0.5
), edges AS (
  SELECT id_a AS s, id_b AS d FROM good
  UNION ALL SELECT id_b AS s, id_a AS d FROM good
), reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
), comp AS (
  SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id
), final AS (
  SELECT dc.doc_id, dc.source
  FROM decontam dc JOIN comp ON dc.doc_id = comp.doc_id
  WHERE dc.doc_id = comp.component
), base AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
)
SELECT b.source, b.n_docs,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_scored,
       CAST(COALESCE(g.n, 0) AS BIGINT) AS n_good_ppl,
       CAST(COALESCE(d.n, 0) AS BIGINT) AS n_decontaminated,
       CAST(COALESCE(f.n, 0) AS BIGINT) AS n_final,
       ROUND(CAST(COALESCE(f.n, 0) AS DOUBLE) / b.n_docs, 6) AS retention
FROM base b
LEFT JOIN (SELECT source, COUNT(*) AS n FROM xent GROUP BY source) s
  ON b.source = s.source
LEFT JOIN (SELECT source, COUNT(*) AS n FROM good_ppl GROUP BY source) g
  ON b.source = g.source
LEFT JOIN (SELECT source, COUNT(*) AS n FROM decontam GROUP BY source) d
  ON b.source = d.source
LEFT JOIN (SELECT source, COUNT(*) AS n FROM final GROUP BY source) f
  ON b.source = f.source
ORDER BY b.source
"""

ROUND7_STAGED_QUERIES["cur03_perplexity_curation_funnel"] = (
    cur03_perplexity_curation_funnel
)
ROUND7_STAGED_ORACLE["cur03_perplexity_curation_funnel"] = _CUR03_ORACLE


def gr07_copurchase_communities(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components over the part co-purchase graph (gr05's
    hub-guarded substrate) rolled up as a community-size histogram —
    the category-discovery readout of basket structure: parts that
    repeatedly sell together form components, and the size histogram
    is the assortment-planning table. Third CC consumer, third GRAPH:
    dd06 runs the iterative-join CC on the near-dup graph, gr03 runs
    star-contraction on the same spec, this runs the shared operator
    on a graph with genuinely different topology (co-purchase edges
    are sparse and open, not clique-closed) — certified against the
    SAME recursive-CTE oracle spec.

    Scale: the edge build is gr05's bounded per-order self-join; CC is
    the shared operators/graph.connected_components (O(diameter)
    keyed-join rounds, checkpoint knob); the rollup is two keyed
    aggregates onto the bounded size histogram."""
    from ..operators.graph import connected_components

    parts = load(spark, sf, "part").select(F.col("p_partkey").alias("pid"))
    edges = _gr05_copurchase_edges(spark, sf)
    comp = connected_components(
        parts, edges, id_col="pid", src="id_a", dst="id_b"
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("__size"))
    return (
        sizes.groupBy(F.col("__size").cast("bigint").alias("community_size"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_communities"))
        .select(
            "community_size",
            "n_communities",
            (F.col("community_size") * F.col("n_communities"))
            .cast("bigint")
            .alias("n_parts"),
        )
        .orderBy("community_size")
    )


_GR07_ORACLE = f"""
WITH RECURSIVE li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), good AS (
  SELECT a.pk AS id_a, b.pk AS id_b
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2
  HAVING COUNT(*) >= {GR05_MIN_CO_ORDERS}
), edges AS (
  SELECT id_a AS s, id_b AS d FROM good
  UNION ALL SELECT id_b AS s, id_a AS d FROM good
), reach(id, r) AS (
  SELECT p_partkey, p_partkey FROM part
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
), comp AS (
  SELECT id, MIN(r) AS component FROM reach GROUP BY id
), sizes AS (
  SELECT component, COUNT(*) AS sz FROM comp GROUP BY component
)
SELECT CAST(sz AS BIGINT) AS community_size,
       CAST(COUNT(*) AS BIGINT) AS n_communities,
       CAST(sz * COUNT(*) AS BIGINT) AS n_parts
FROM sizes
GROUP BY sz ORDER BY community_size
"""

ROUND7_STAGED_QUERIES["gr07_copurchase_communities"] = (
    gr07_copurchase_communities
)
ROUND7_STAGED_ORACLE["gr07_copurchase_communities"] = _GR07_ORACLE


# ---------------------------------------------------------------------------
# Round-10 staging, wave 62: mm09 modality byte-budget manifest, inc04
# small-file compaction audit.


#: mm09's shard byte budget — the fixed packing target the manifest
#: plans against.
MM09_SHARD_BYTES = 65536


def mm09_modality_budget_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """Modality byte-budget manifest — the dataset-card + storage-plan
    table a multimodal corpus ships with: per sniffed container format
    (mm07's magic-byte kernel, the certified routing rule), payload
    count, byte mass, byte share, cumulative share in byte-mass order,
    and the shard count a MM09_SHARD_BYTES packing target implies.
    mm05/mm08 pack samples into batches; this plans the STORAGE layer
    above them.

    Scale: one payload scan with row-local sniffing (4-byte hex
    compare), one keyed rollup onto the |formats|-bounded table —
    every window below runs on that bounded frame. Exact integer
    bytes; shares are rounded divisions; shard counts are exact
    ceiling division in integers ((b + B - 1) div B)."""
    from pyspark.sql import Window

    media = documents_as_media(load(spark, sf, "documents"))
    payload = media.select(
        "media_id",
        F.concat(
            F.expr(
                "CASE CAST(media_id % 4 AS INT) "
                "WHEN 0 THEN X'FFD8FFE0' "
                "WHEN 1 THEN X'89504E47' "
                "WHEN 2 THEN X'52494646' "
                "ELSE X'' END"
            ),
            F.col("content"),
        ).alias("__p"),
    )
    sniffed = payload.select(
        F.length("__p").cast("bigint").alias("__bytes"),
        F.when(
            F.expr("left(hex(__p), 8)") == "FFD8FFE0", F.lit("image/jpeg")
        )
        .when(F.expr("left(hex(__p), 8)") == "89504E47", F.lit("image/png"))
        .when(F.expr("left(hex(__p), 8)") == "52494646", F.lit("audio/riff"))
        .otherwise(F.lit("application/octet-stream"))
        .alias("sniffed_mime"),
    )
    per_mime = sniffed.groupBy("sniffed_mime").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_payloads"),
        F.sum("__bytes").cast("bigint").alias("total_bytes"),
    )
    w = Window.partitionBy()
    wcum = (
        Window.orderBy(F.desc("total_bytes"), "sniffed_mime")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_mime.select(
            "sniffed_mime",
            "n_payloads",
            "total_bytes",
            F.round(
                F.col("total_bytes").cast("double")
                / F.sum("total_bytes").over(w).cast("double"),
                6,
            ).alias("byte_share"),
            F.round(
                F.sum("total_bytes").over(wcum).cast("double")
                / F.sum("total_bytes").over(w).cast("double"),
                6,
            ).alias("cum_byte_share"),
            F.expr(
                f"(total_bytes + {MM09_SHARD_BYTES} - 1) "
                f"div {MM09_SHARD_BYTES}"
            )
            .cast("bigint")
            .alias("n_shards"),
        )
        .orderBy(F.desc("total_bytes"), "sniffed_mime")
    )


_MM09_ORACLE = f"""
WITH payload AS (
  SELECT doc_id AS media_id,
         (CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN unhex('FFD8FFE0')
            WHEN 1 THEN unhex('89504E47')
            WHEN 2 THEN unhex('52494646')
            ELSE unhex('') END) || encode(text) AS p
  FROM documents
), sniffed AS (
  SELECT CAST(octet_length(p) AS BIGINT) AS bytes,
         CASE left(hex(p), 8)
           WHEN 'FFD8FFE0' THEN 'image/jpeg'
           WHEN '89504E47' THEN 'image/png'
           WHEN '52494646' THEN 'audio/riff'
           ELSE 'application/octet-stream' END AS sniffed_mime
  FROM payload
), per_mime AS (
  SELECT sniffed_mime,
         CAST(COUNT(*) AS BIGINT) AS n_payloads,
         CAST(SUM(bytes) AS BIGINT) AS total_bytes
  FROM sniffed GROUP BY sniffed_mime
)
SELECT sniffed_mime, n_payloads, total_bytes,
       ROUND(CAST(total_bytes AS DOUBLE) / SUM(total_bytes) OVER (), 6)
         AS byte_share,
       ROUND(CAST(SUM(total_bytes) OVER (
               ORDER BY total_bytes DESC, sniffed_mime
               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / SUM(total_bytes) OVER (), 6) AS cum_byte_share,
       CAST((total_bytes + {MM09_SHARD_BYTES} - 1) // {MM09_SHARD_BYTES}
            AS BIGINT) AS n_shards
FROM per_mime
ORDER BY total_bytes DESC, sniffed_mime
"""

ROUND7_STAGED_QUERIES["mm09_modality_budget_manifest"] = (
    mm09_modality_budget_manifest
)
ROUND7_STAGED_ORACLE["mm09_modality_budget_manifest"] = _MM09_ORACLE


#: inc04's layout constants: arrival batches of INC04_BATCH_ROWS order
#: keys per append, compaction target of INC04_TARGET_ROWS rows per
#: file, and the "small file" threshold as a fraction of the target.
INC04_BATCH_ROWS = 500
INC04_TARGET_ROWS = 4096
INC04_AUDIT_MONTH = "1995-03"


def inc04_compaction_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Small-file compaction audit — the warehouse-maintenance
    before/after that justifies Warehouse.compact_fact: orders land in
    arrival batches (INC04_BATCH_ROWS keys per append) into
    month-partitioned files, so the APPEND layout holds one file per
    (month × batch) — the classic small-file problem; the COMPACTED
    layout re-packs each month into INC04_TARGET_ROWS-row files. Per
    layout: file count, mean rows per file, the small-file fraction
    (< 25 % of target), and the files a one-month query must open —
    the read-amplification number that pays for compaction at 100 TB
    (NameNode/manifest pressure scales with file count, scan startup
    with files-per-partition).

    Scale: the append layout is a pure keyed aggregate; the compacted
    layout ranks within month via the two-phase ranking operator
    (partition_by = the ~84-month calendar — low-cardinality by
    construction). Exact integers; two rounded divisions."""
    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
    )

    orders = load(spark, sf, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("__month"),
    )
    small = INC04_TARGET_ROWS // 4
    out = None
    for layout, files in (
        (
            "append_per_batch",
            orders.select(
                "__month",
                F.expr(f"o_orderkey div {INC04_BATCH_ROWS}").alias("__f"),
            ),
        ),
        (
            "compacted",
            attach_global_row_number(
                orders,
                order_by=[F.asc("o_orderkey")],
                partition_by=["__month"],
                rn_col="__rn",
            ).select(
                "__month",
                F.expr(f"(__rn - 1) div {INC04_TARGET_ROWS}").alias("__f"),
            ),
        ),
    ):
        per_file = files.groupBy("__month", "__f").agg(
            F.count(F.lit(1)).alias("__rows")
        )
        row = per_file.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.round(
                F.sum("__rows").cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_rows_per_file"),
            F.round(
                F.sum(
                    F.when(F.col("__rows") < small, 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("small_file_fraction"),
            F.sum(
                F.when(F.col("__month") == INC04_AUDIT_MONTH, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("files_for_audit_month"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("layout")


def _inc04_oracle_sql() -> str:
    small = INC04_TARGET_ROWS // 4
    return f"""
WITH orders_m AS (
  SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS month FROM orders
), append_files AS (
  SELECT month, o_orderkey // {INC04_BATCH_ROWS} AS f, COUNT(*) AS rows
  FROM orders_m GROUP BY 1, 2
), compact_files AS (
  SELECT month,
         (ROW_NUMBER() OVER (PARTITION BY month ORDER BY o_orderkey) - 1)
           // {INC04_TARGET_ROWS} AS f
  FROM orders_m
), compact_agg AS (
  SELECT month, f, COUNT(*) AS rows FROM compact_files GROUP BY 1, 2
)
SELECT * FROM (
SELECT 'append_per_batch' AS layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       ROUND(CAST(SUM(rows) AS DOUBLE) / COUNT(*), 2) AS avg_rows_per_file,
       ROUND(CAST(SUM(CASE WHEN rows < {small} THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS small_file_fraction,
       CAST(SUM(CASE WHEN month = '{INC04_AUDIT_MONTH}' THEN 1 ELSE 0 END)
            AS BIGINT) AS files_for_audit_month
FROM append_files
UNION ALL
SELECT 'compacted',
       CAST(COUNT(*) AS BIGINT),
       ROUND(CAST(SUM(rows) AS DOUBLE) / COUNT(*), 2),
       ROUND(CAST(SUM(CASE WHEN rows < {small} THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6),
       CAST(SUM(CASE WHEN month = '{INC04_AUDIT_MONTH}' THEN 1 ELSE 0 END)
            AS BIGINT)
FROM compact_agg
) ORDER BY layout
"""


ROUND7_STAGED_QUERIES["inc04_compaction_audit"] = inc04_compaction_audit
ROUND7_STAGED_ORACLE["inc04_compaction_audit"] = _inc04_oracle_sql()


# ---------------------------------------------------------------------------
# Wave 63 — CDC snapshot reconciliation, closed-form OLS, Gini concentration
# ---------------------------------------------------------------------------

#: cdc01's deterministic two-snapshot construction: the OLD snapshot is
#: the warehouse as of CDC01_OLD_CUTOFF, the NEW one as of
#: CDC01_NEW_CUTOFF with keys divisible by CDC01_DELETE_MOD purged
#: (GDPR-style hard deletes) and rows divisible by CDC01_RESTATE_MOD
#: restated (priority escalated, +1.00 correction on the total).
CDC01_OLD_CUTOFF = "1997-07-01"
CDC01_NEW_CUTOFF = "1998-07-01"
CDC01_DELETE_MOD = 89
CDC01_RESTATE_MOD = 23


def cdc01_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Change-data-capture reconciliation between two warehouse
    snapshots — the row-level complement of sync01's Merkle bucket
    checksums: sync01 tells you WHICH buckets diverged, this classifies
    every key into inserted / deleted / updated / unchanged and
    quantifies the financial restatement. The reference's incremental
    protocol (load_fact_sales' anti-join append) only ever sees
    inserts; a real warehouse also takes deletes and restatements, and
    this is the audit table that proves a sync applied them.

    Scale: ONE full-outer shuffle join on the snapshot key, then a
    4-row keyed rollup. Both sides are fact-sized, so the join
    legitimately shuffles (no broadcast); on the bucketed layout
    (operators/bucketing.py, bj01) the same plan is Exchange-free
    because both snapshots inherit the key bucketing. Deltas are exact
    DECIMAL(18,2) sums cast to double once."""
    orders = load(spark, sf, "orders")
    old = orders.filter(
        F.col("o_orderdate") < F.lit(CDC01_OLD_CUTOFF)
    ).select(
        F.col("o_orderkey").alias("__k_old"),
        F.col("o_custkey").alias("__cust_old"),
        F.col("o_orderpriority").alias("__prio_old"),
        dec("o_totalprice").alias("__price_old"),
    )
    restated = F.col("o_orderkey") % CDC01_RESTATE_MOD == 0
    new = (
        orders.filter(F.col("o_orderdate") < F.lit(CDC01_NEW_CUTOFF))
        .filter(F.col("o_orderkey") % CDC01_DELETE_MOD != 0)
        .select(
            F.col("o_orderkey").alias("__k_new"),
            F.col("o_custkey").alias("__cust_new"),
            F.when(restated, F.lit("1-URGENT"))
            .otherwise(F.col("o_orderpriority"))
            .alias("__prio_new"),
            F.when(restated, dec("o_totalprice") + F.lit(1).cast("decimal(18,2)"))
            .otherwise(dec("o_totalprice"))
            .alias("__price_new"),
        )
    )
    joined = old.join(
        new, old["__k_old"] == new["__k_new"], "full_outer"
    ).select(
        F.when(F.col("__k_old").isNull(), F.lit("inserted"))
        .when(F.col("__k_new").isNull(), F.lit("deleted"))
        .when(
            (F.col("__prio_old") != F.col("__prio_new"))
            | (F.col("__price_old") != F.col("__price_new")),
            F.lit("updated"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        F.coalesce("__cust_new", "__cust_old").alias("__cust"),
        (
            F.coalesce(F.col("__price_new"), F.lit(0).cast("decimal(18,2)"))
            - F.coalesce(F.col("__price_old"), F.lit(0).cast("decimal(18,2)"))
        ).alias("__delta"),
    )
    return (
        joined.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("__cust").cast("bigint").alias("n_customers"),
            F.round(F.sum("__delta").cast("double"), 2).alias(
                "total_price_delta"
            ),
        )
        .orderBy("change_type")
    )


_CDC01_ORACLE = f"""
WITH old_snap AS (
  SELECT o_orderkey AS k, o_custkey AS cust,
         o_orderpriority AS prio,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
  WHERE o_orderdate < TIMESTAMP '{CDC01_OLD_CUTOFF} 00:00:00'
), new_snap AS (
  SELECT o_orderkey AS k, o_custkey AS cust,
         CASE WHEN o_orderkey % {CDC01_RESTATE_MOD} = 0
              THEN '1-URGENT' ELSE o_orderpriority END AS prio,
         CASE WHEN o_orderkey % {CDC01_RESTATE_MOD} = 0
              THEN CAST(o_totalprice AS DECIMAL(18,2))
                   + CAST(1 AS DECIMAL(18,2))
              ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
  FROM orders
  WHERE o_orderdate < TIMESTAMP '{CDC01_NEW_CUTOFF} 00:00:00'
    AND o_orderkey % {CDC01_DELETE_MOD} <> 0
), classified AS (
  SELECT CASE WHEN o.k IS NULL THEN 'inserted'
              WHEN n.k IS NULL THEN 'deleted'
              WHEN o.prio <> n.prio OR o.price <> n.price THEN 'updated'
              ELSE 'unchanged' END AS change_type,
         COALESCE(n.cust, o.cust) AS cust,
         COALESCE(n.price, CAST(0 AS DECIMAL(18,2)))
           - COALESCE(o.price, CAST(0 AS DECIMAL(18,2))) AS delta
  FROM old_snap o FULL OUTER JOIN new_snap n ON o.k = n.k
)
SELECT change_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(delta) AS DOUBLE), 2) AS total_price_delta
FROM classified
GROUP BY change_type
ORDER BY change_type
"""

ROUND7_STAGED_QUERIES["cdc01_snapshot_diff"] = cdc01_snapshot_diff
ROUND7_STAGED_ORACLE["cdc01_snapshot_diff"] = _CDC01_ORACLE


def lr01_ols_regression(spark: SparkSession, sf: str) -> DataFrame:
    """Closed-form OLS of extended price on quantity per return flag —
    the normal-equations regression every "does X drive Y" warehouse
    question needs, computed entirely as ONE map-side-combinable
    aggregate (no MLlib, no iteration): slope, intercept and R² derive
    from the five classic sufficient statistics (n, Σx, Σy, Σxy, Σx²,
    Σy²).

    Determinism at 1000 executors: the sufficient statistics are exact
    DECIMAL sums (order-independent under any partitioning / AQE
    re-plan), cast to double ONCE, and the slope/intercept/R² formulas
    are single double expressions written identically here and in the
    DuckDB oracle — same operands, same operation order, bit-identical
    IEEE results. Scale: a 3-group groupBy with partial aggregation;
    nothing else."""
    li = load(spark, sf, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    return stats.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr(
            "round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)"
        ).alias("slope"),
        F.expr(
            "round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)"
            " / n, 6)"
        ).alias("intercept"),
        F.expr(
            "round(((n * sxy - sx * sy) * (n * sxy - sx * sy))"
            " / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)"
        ).alias("r2"),
    ).orderBy("l_returnflag")


_LR01_ORACLE = """
WITH stats AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             / n, 6) AS intercept,
       ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM stats
ORDER BY l_returnflag
"""

ROUND7_STAGED_QUERIES["lr01_ols_regression"] = lr01_ols_regression
ROUND7_STAGED_ORACLE["lr01_ols_regression"] = _LR01_ORACLE


def gini01_revenue_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of customer revenue per market segment — the
    concentration number behind "are we a whale business": G =
    2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over revenues x ascending with 1-based
    rank i. The same statistic audits training-corpus source
    concentration (a handful of domains owning the token mass).

    Scale: revenue rolls up per customer FIRST (fact-sized shuffle,
    partial agg), the entity-sized customer join shuffles on the shared
    key (no broadcast — the dim is SF-proportional), and the per-segment ranks
    come from the two-phase distributed ranker (operators/ranking.py) —
    never a single-partition window, even though segments are only 5
    groups, because the customer frame itself is entity-sized at
    100 TB. Σ(i·xᵢ) is an exact DECIMAL sum (rank × money, both exact);
    the Gini formula is one double expression mirrored in the oracle."""
    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
    )

    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("__rev")
    )
    # customer is ENTITY-sized (SF-proportional) — no broadcast hint;
    # the revenue frame shares its key, so this is one co-keyed shuffle
    # join (AQE may still convert it at small SF).
    seg = rev.join(
        customer.select("c_custkey", "c_mktsegment"),
        rev["o_custkey"] == F.col("c_custkey"),
    ).select(F.col("c_mktsegment").alias("mktsegment"), "o_custkey", "__rev")
    ranked = attach_global_row_number(
        seg,
        order_by=[F.asc("__rev"), F.asc("o_custkey")],
        partition_by=["mktsegment"],
        rn_col="__rn",
    )
    agg = ranked.groupBy("mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("__rev").cast("double").alias("s"),
        F.sum(
            (
                F.col("__rn").cast("decimal(18,0)")
                * F.col("__rev").cast("decimal(18,2)")
            ).cast("decimal(38,2)")
        )
        .cast("double")
        .alias("w"),
    )
    return agg.select(
        "mktsegment",
        F.col("n").cast("bigint").alias("n_customers"),
        F.expr("round(s, 2)").alias("total_revenue"),
        F.expr("round(2 * w / (n * s) - (n + 1) / n, 6)").alias("gini"),
    ).orderBy("mktsegment")


_GINI01_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS rev
  FROM orders GROUP BY o_custkey
), seg AS (
  SELECT c.c_mktsegment AS mktsegment, r.o_custkey, r.rev,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY r.rev, r.o_custkey) AS rn
  FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
), agg AS (
  SELECT mktsegment,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(rev) AS DOUBLE) AS s,
         CAST(SUM(CAST(CAST(rn AS DECIMAL(18,0))
                       * CAST(rev AS DECIMAL(18,2))
                       AS DECIMAL(38,2))) AS DOUBLE) AS w
  FROM seg GROUP BY mktsegment
)
SELECT mktsegment,
       CAST(n AS BIGINT) AS n_customers,
       ROUND(s, 2) AS total_revenue,
       ROUND(2 * w / (n * s) - (n + 1) / n, 6) AS gini
FROM agg
ORDER BY mktsegment
"""

ROUND7_STAGED_QUERIES["gini01_revenue_concentration"] = (
    gini01_revenue_concentration
)
ROUND7_STAGED_ORACLE["gini01_revenue_concentration"] = _GINI01_ORACLE


# ---------------------------------------------------------------------------
# Round-10 staged wave 64: gap sessionization, brand association rules,
# Benford first-digit audit.
# ---------------------------------------------------------------------------

#: ses01's inactivity gap in minutes: a new session starts when a
#: user's events are more than this far apart. The classic
#: web-analytics cut is 30; the default here is tuned to the driver
#: corpus's event cadence (median per-user inter-event gap ≈ 7.3 h at
#: sf0.01) so every session-size bucket carries signal — a clickstream
#: deployment sets SPARK_GRAFT_SESSION_GAP_MIN=30. Both the Spark plan
#: and the oracle read this constant, so the contract stays
#: self-consistent at any setting.
SES01_GAP_MIN = int(_os.environ.get("SPARK_GRAFT_SESSION_GAP_MIN", "720"))
SES01_GAP_US = SES01_GAP_MIN * 60 * 1_000_000


def ses01_gap_sessionization(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization of the event stream — the foundational
    clickstream operator every funnel/engagement metric sits on: a
    session is a maximal run of one user's events with no inactivity
    gap over SES01_GAP_US, built with LAG + a running SUM of
    session-start flags (never a collect_list; the per-user event
    sequence can be arbitrarily long). Sessions roll up into size
    buckets with exact microsecond durations.

    Scale: ONE shuffle on user_id serves both windows AND the session
    aggregate — the lag window, the running-sum window and the
    groupBy(user_id, session) all share the same partitioning, so
    Catalyst reuses the exchange. user_id is entity-cardinality
    (millions of keys at 100 TB), so window state spreads with the
    shuffle; per-user state is one row (the previous timestamp), never
    a buffered session. Durations are exact int64 microseconds
    (unix_micros ↔ DuckDB epoch_us); the only doubles are the final
    4-bucket averages, divided in the same operand order as the
    oracle. Ties in ts are totally ordered by event_id, and a tie's
    gap is 0 < SES01_GAP_US, so session assignment is
    order-independent anyway."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("__us")
    )
    w = Window.partitionBy("user_id").orderBy("__us", "event_id")
    gap = F.col("__us") - F.lag("__us").over(w)
    run = ev.withColumn(
        "__new",
        F.when(gap.isNull() | (gap > SES01_GAP_US), 1).otherwise(0),
    ).withColumn(
        "__sess",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sess = run.groupBy("user_id", "__sess").agg(
        F.count(F.lit(1)).alias("__n"),
        (F.max("__us") - F.min("__us")).alias("__dur_us"),
    )
    bucket = (
        F.when(F.col("__n") == 1, "1")
        .when(F.col("__n") <= 3, "2-3")
        .when(F.col("__n") <= 7, "4-7")
        .otherwise("8+")
    )
    return (
        sess.select(bucket.alias("session_size"), "__n", "__dur_us")
        .groupBy("session_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("__n").cast("bigint").alias("n_events"),
            F.round(
                F.sum("__dur_us").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0),
                4,
            ).alias("avg_duration_sec"),
            F.round(
                F.max("__dur_us").cast("double") / F.lit(1000000.0), 4
            ).alias("max_duration_sec"),
        )
        .orderBy("session_size")
    )


_SES01_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
), g AS (
  SELECT user_id, event_id, us,
         CASE WHEN LAG(us) OVER w IS NULL
                   OR us - LAG(us) OVER w > {SES01_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), s AS (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM g
), per_sess AS (
  SELECT user_id, sess, COUNT(*) AS n, MAX(us) - MIN(us) AS dur_us
  FROM s GROUP BY user_id, sess
)
SELECT CASE WHEN n = 1 THEN '1' WHEN n <= 3 THEN '2-3'
            WHEN n <= 7 THEN '4-7' ELSE '8+' END AS session_size,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) / 1000000.0, 4)
         AS avg_duration_sec,
       ROUND(CAST(MAX(dur_us) AS DOUBLE) / 1000000.0, 4)
         AS max_duration_sec
FROM per_sess GROUP BY 1 ORDER BY 1
"""

ROUND7_STAGED_QUERIES["ses01_gap_sessionization"] = ses01_gap_sessionization
ROUND7_STAGED_ORACLE["ses01_gap_sessionization"] = _SES01_ORACLE


def ar01_brand_association_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket association rules over brands co-purchased in one
    order: support, directional confidence and lift for every brand
    pair — the rule-mining complement of gr04/gr07's co-presence
    GRAPHS (those build edges; this scores rules with the classic
    support/confidence/lift contract a recommender consumes).

    Scale: lineitem ⋈ part is a co-keyed shuffle join (part is
    entity-sized — never broadcast); the per-order brand set is
    bounded by the order's line count, so the within-order self-join
    fans out at most lines²/2 pairs per order and stays co-partitioned
    on the order key; the rule aggregate is bounded by the brand
    vocabulary squared (≤ |brands|² keys, ~300 here) regardless of
    corpus size. The only unbounded-cardinality aggregates are keyed,
    partial-aggregable counts. The 1-row order total rides the
    allowlisted broadcast-scalar pattern; ratios divide exact int64
    counts in the same operand order as the oracle."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(
            F.col("l_orderkey").alias("__o"), F.col("p_brand").alias("__b")
        )
        .distinct()
    )
    totals = ob.agg(
        F.countDistinct("__o").cast("double").alias("__n_orders")
    )
    brand_n = ob.groupBy("__b").agg(F.count(F.lit(1)).alias("__nb"))
    a = ob.select(F.col("__o").alias("__oa"), F.col("__b").alias("brand_a"))
    b = ob.select(F.col("__o").alias("__ob"), F.col("__b").alias("brand_b"))
    pairs = (
        a.join(
            b,
            (F.col("__oa") == F.col("__ob"))
            & (F.col("brand_a") < F.col("brand_b")),
        )
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("__np"))
    )
    out = (
        pairs.join(
            brand_n.select(
                F.col("__b").alias("brand_a"), F.col("__nb").alias("__na")
            ),
            "brand_a",
        )
        .join(
            brand_n.select(
                F.col("__b").alias("brand_b"), F.col("__nb").alias("__nbb")
            ),
            "brand_b",
        )
        .crossJoin(F.broadcast(totals))
    )
    np_d = F.col("__np").cast("double")
    return out.select(
        "brand_a",
        "brand_b",
        F.col("__np").cast("bigint").alias("n_pair"),
        F.round(np_d / F.col("__n_orders"), 6).alias("support"),
        F.round(np_d / F.col("__na").cast("double"), 6).alias(
            "confidence_a_b"
        ),
        F.round(np_d / F.col("__nbb").cast("double"), 6).alias(
            "confidence_b_a"
        ),
        F.round(
            (np_d * F.col("__n_orders"))
            / (
                F.col("__na").cast("double") * F.col("__nbb").cast("double")
            ),
            6,
        ).alias("lift"),
    ).orderBy("brand_a", "brand_b")


_AR01_ORACLE = """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), tot AS (
  SELECT CAST(COUNT(DISTINCT o) AS DOUBLE) AS n_orders FROM ob
), bn AS (
  SELECT b, COUNT(*) AS nb FROM ob GROUP BY b
), pr AS (
  SELECT a.b AS brand_a, bb.b AS brand_b, COUNT(*) AS np
  FROM ob a JOIN ob bb ON a.o = bb.o AND a.b < bb.b
  GROUP BY 1, 2
)
SELECT pr.brand_a, pr.brand_b,
       CAST(np AS BIGINT) AS n_pair,
       ROUND(CAST(np AS DOUBLE) / t.n_orders, 6) AS support,
       ROUND(CAST(np AS DOUBLE) / CAST(na.nb AS DOUBLE), 6)
         AS confidence_a_b,
       ROUND(CAST(np AS DOUBLE) / CAST(nb2.nb AS DOUBLE), 6)
         AS confidence_b_a,
       ROUND((CAST(np AS DOUBLE) * t.n_orders)
             / (CAST(na.nb AS DOUBLE) * CAST(nb2.nb AS DOUBLE)), 6)
         AS lift
FROM pr
JOIN bn na ON pr.brand_a = na.b
JOIN bn nb2 ON pr.brand_b = nb2.b
CROSS JOIN tot t
ORDER BY pr.brand_a, pr.brand_b
"""

ROUND7_STAGED_QUERIES["ar01_brand_association_rules"] = (
    ar01_brand_association_rules
)
ROUND7_STAGED_ORACLE["ar01_brand_association_rules"] = _AR01_ORACLE


def dq03_benford_digit_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Benford first-significant-digit audit over the two money
    columns — the fraud/corruption screen auditors run on any numeric
    fact feed (and a drift screen for synthetic-data generators whose
    price models collapse to narrow ranges): per (column, digit),
    observed share vs the Benford expectation log10(1+1/d) plus that
    digit's chi-square contribution.

    Determinism: the first digit is extracted EXACTLY — floor(x·100)
    is a deterministic IEEE op on identical parquet doubles, the int64
    cents render identically as strings in both engines, and the first
    character is the digit; no log10-of-a-power-of-ten boundary can
    flip it. Scale: one row-local projection per fact table (pruned to
    the single money column), a 9-key partial-aggregable count, and a
    window over the 18-row AGGREGATED frame (never the raw rows) for
    the per-column totals."""
    from pyspark.sql import Window

    def first_digit(df: DataFrame, colname: str, label: str) -> DataFrame:
        cents = F.floor(F.col(colname) * F.lit(100)).cast("bigint")
        return df.select(
            F.lit(label).alias("column_name"),
            F.substring(cents.cast("string"), 1, 1)
            .cast("int")
            .alias("digit"),
        )

    per = (
        first_digit(
            load(spark, sf, "lineitem").select("l_extendedprice"),
            "l_extendedprice",
            "lineitem.l_extendedprice",
        )
        .unionByName(
            first_digit(
                load(spark, sf, "orders").select("o_totalprice"),
                "o_totalprice",
                "orders.o_totalprice",
            )
        )
        .groupBy("column_name", "digit")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    tot = (
        F.sum("__n")
        .over(Window.partitionBy("column_name"))
        .cast("double")
    )
    p = F.log(
        F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")
    ) / F.log(F.lit(10.0))
    n_d = F.col("__n").cast("double")
    return per.select(
        "column_name",
        "digit",
        F.col("__n").cast("bigint").alias("n_rows"),
        F.round(n_d / tot, 6).alias("obs_share"),
        F.round(p, 6).alias("benford_share"),
        F.round((n_d - tot * p) * (n_d - tot * p) / (tot * p), 6).alias(
            "chi2_term"
        ),
    ).orderBy("column_name", "digit")


_DQ03_ORACLE = """
WITH src AS (
  SELECT 'lineitem.l_extendedprice' AS column_name,
         CAST(SUBSTR(CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM lineitem
  UNION ALL
  SELECT 'orders.o_totalprice',
         CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER)
  FROM orders
), per AS (
  SELECT column_name, digit, COUNT(*) AS n FROM src GROUP BY 1, 2
), wt AS (
  SELECT column_name, digit, n,
         CAST(SUM(n) OVER (PARTITION BY column_name) AS DOUBLE) AS tot,
         LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0) AS p
  FROM per
)
SELECT column_name, digit,
       CAST(n AS BIGINT) AS n_rows,
       ROUND(CAST(n AS DOUBLE) / tot, 6) AS obs_share,
       ROUND(p, 6) AS benford_share,
       ROUND((CAST(n AS DOUBLE) - tot * p)
             * (CAST(n AS DOUBLE) - tot * p) / (tot * p), 6) AS chi2_term
FROM wt ORDER BY column_name, digit
"""

ROUND7_STAGED_QUERIES["dq03_benford_digit_audit"] = dq03_benford_digit_audit
ROUND7_STAGED_ORACLE["dq03_benford_digit_audit"] = _DQ03_ORACLE


# ---------------------------------------------------------------------------
# Round-10 staged wave 65: explicit-values pivot, dyadic-weight EWMA
# smoothing, spend-decile migration matrix.
# ---------------------------------------------------------------------------


def pv01_status_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Order count + revenue pivoted by order status per priority —
    certifies Spark's pivot operator itself, the relational surface
    the reference reaches with CASE-based conditional aggregation
    (sql/queries.sql's pivot-style reports). The status values are
    passed EXPLICITLY (``pivot("o_orderstatus", ["F","O","P"])``):
    with an implicit pivot Spark first runs a separate distinct-
    collect job over the pivot column — a hidden full scan plus a
    driver collect that a 100 TB fact table cannot afford. The
    explicit list keeps it one partial-aggregable groupBy.

    Scale: one shuffle on the 5-key priority roster; counts are exact
    int64, revenues exact DECIMAL sums cast to double once. Absent
    (priority, status) cells coalesce to 0 / 0.00 — same as the
    oracle's CASE filters."""
    orders = load(spark, sf, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("o_totalprice")).alias("rev"),
        )
    )
    zero = F.lit(0).cast("bigint")
    zdec = F.lit(0).cast("decimal(18,2)")
    return piv.select(
        F.col("o_orderpriority").alias("priority"),
        F.coalesce(F.col("F_n"), zero).cast("bigint").alias("n_f"),
        F.coalesce(F.col("O_n"), zero).cast("bigint").alias("n_o"),
        F.coalesce(F.col("P_n"), zero).cast("bigint").alias("n_p"),
        F.round(F.coalesce(F.col("F_rev"), zdec).cast("double"), 2).alias(
            "rev_f"
        ),
        F.round(F.coalesce(F.col("O_rev"), zdec).cast("double"), 2).alias(
            "rev_o"
        ),
        F.round(F.coalesce(F.col("P_rev"), zdec).cast("double"), 2).alias(
            "rev_p"
        ),
    ).orderBy("priority")


_PV01_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT)
         AS n_f,
       CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT)
         AS n_o,
       CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT)
         AS n_p,
       ROUND(CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END),
                  CAST(0 AS DECIMAL(18,2))) AS DOUBLE), 2) AS rev_f,
       ROUND(CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END),
                  CAST(0 AS DECIMAL(18,2))) AS DOUBLE), 2) AS rev_o,
       ROUND(CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END),
                  CAST(0 AS DECIMAL(18,2))) AS DOUBLE), 2) AS rev_p
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
"""

ROUND7_STAGED_QUERIES["pv01_status_pivot"] = pv01_status_pivot
ROUND7_STAGED_ORACLE["pv01_status_pivot"] = _PV01_ORACLE


#: ewma01's smoothing window: W trailing months with dyadic weights
#: 2^(W-1-i) at lag i — the adjusted EWMA with alpha = 1/2, whose
#: weights and weight totals are EXACT integers (never a float power),
#: so the weighted sums stay exact DECIMAL until the final divide.
EWMA01_WINDOW = 20


def ewma01_revenue_smoothing(spark: SparkSession, sf: str) -> DataFrame:
    """Exponentially-weighted monthly revenue smoothing — the classic
    trend line every revenue dashboard draws, computed with EXACT
    arithmetic: the fact table rolls up to the calendar-bounded
    monthly table first (one partial-aggregable shuffle; ~84 rows at
    ANY corpus size), then the trailing-window EWMA runs as W LAG
    terms inside ONE window operator over the bounded frame. Weights
    are dyadic integers (2^(W-1-i), adjusted alpha=1/2 EWMA), so
    numerator and weight total are exact DECIMAL/int64 sums — the
    only double is the final divide, written operand-for-operand as
    in the oracle. Early months smooth over their shorter history
    (adjusted semantics), pinned by n_terms.

    Scale: windowing the BOUNDED monthly table (not the fact table)
    is the point — at 100 TB the monthly frame is still 84 rows, so
    the single ordered window is a metadata operation, the same
    discipline as ts04/win01."""
    from pyspark.sql import Window

    orders = load(spark, sf, "orders")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month")
        )
        .agg(F.sum(dec("o_totalprice")).alias("__rev"))
    )
    w = Window.orderBy("month")
    terms = []
    weights = []
    counts = []
    for i in range(EWMA01_WINDOW):
        lag = F.lag("__rev", i).over(w)
        wt = 1 << (EWMA01_WINDOW - 1 - i)
        terms.append(
            F.coalesce(
                (lag * F.lit(wt).cast("decimal(18,0)")).cast(
                    "decimal(38,2)"
                ),
                F.lit(0).cast("decimal(38,2)"),
            )
        )
        weights.append(
            F.when(lag.isNull(), F.lit(0).cast("bigint")).otherwise(
                F.lit(wt).cast("bigint")
            )
        )
        counts.append(F.when(lag.isNull(), 0).otherwise(1))
    num = terms[0]
    for t in terms[1:]:
        num = num + t
    den = weights[0]
    for x in weights[1:]:
        den = den + x
    n_terms = counts[0]
    for c in counts[1:]:
        n_terms = n_terms + c
    smoothed = monthly.select(
        "month",
        F.round(F.col("__rev").cast("double"), 2).alias("revenue"),
        F.round(num.cast("double") / den.cast("double"), 2).alias(
            "ewma_revenue"
        ),
        n_terms.cast("int").alias("n_terms"),
    )
    return smoothed.orderBy("month")


def _ewma01_oracle_sql() -> str:
    terms = " + ".join(
        "COALESCE(CAST(LAG(rev, {i}) OVER w "
        "* CAST({wt} AS DECIMAL(18,0)) AS DECIMAL(38,2)), "
        "CAST(0 AS DECIMAL(38,2)))".format(
            i=i, wt=1 << (EWMA01_WINDOW - 1 - i)
        )
        for i in range(EWMA01_WINDOW)
    )
    weights = " + ".join(
        "CASE WHEN LAG(rev, {i}) OVER w IS NULL THEN CAST(0 AS BIGINT) "
        "ELSE CAST({wt} AS BIGINT) END".format(
            i=i, wt=1 << (EWMA01_WINDOW - 1 - i)
        )
        for i in range(EWMA01_WINDOW)
    )
    counts = " + ".join(
        "CASE WHEN LAG(rev, {i}) OVER w IS NULL THEN 0 ELSE 1 END".format(
            i=i
        )
        for i in range(EWMA01_WINDOW)
    )
    return f"""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
), smoothed AS (
  SELECT month,
         ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
         ROUND(CAST({terms} AS DOUBLE)
               / CAST({weights} AS DOUBLE), 2) AS ewma_revenue,
         CAST({counts} AS INTEGER) AS n_terms
  FROM monthly WINDOW w AS (ORDER BY month)
)
SELECT month, revenue, ewma_revenue, n_terms
FROM smoothed ORDER BY month
"""


ROUND7_STAGED_QUERIES["ewma01_revenue_smoothing"] = ewma01_revenue_smoothing
ROUND7_STAGED_ORACLE["ewma01_revenue_smoothing"] = _ewma01_oracle_sql()


def tm01_spend_decile_migration(spark: SparkSession, sf: str) -> DataFrame:
    """Customer spend-decile migration matrix between two consecutive
    years — the churn/upsell mobility table behind every "are our best
    customers staying" review (and, on a training corpus, the
    source-quality mobility table between two crawl snapshots): each
    customer active in BOTH years gets a revenue decile per year via
    the distributed two-phase ranker + the exact NTILE formula (q26's
    discipline — never a single-partition window on the entity-sized
    customer frame), and the matrix counts every (decile_1996 →
    decile_1997) transition with its share of the origin decile.

    Scale: two fact-sized rollups (partial agg, pruned by the year
    predicates pushed to the parquet scan), two distributed rankings,
    one co-keyed entity join on custkey, and a ≤100-key matrix
    aggregate; the origin-decile shares come from a window over the
    AGGREGATED ≤100-row matrix, never the raw rows."""
    from pyspark.sql import Window

    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
        exact_ntile,
    )

    orders = load(spark, sf, "orders")

    def year_deciles(lo: str, hi: str, out: str) -> DataFrame:
        per = (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(lo))
                & (F.col("o_orderdate") < F.lit(hi))
            )
            .groupBy("o_custkey")
            .agg(F.sum(dec("o_totalprice")).cast("double").alias("__rev"))
        )
        ranked = attach_global_row_number(
            per,
            order_by=[F.desc("__rev"), F.asc("o_custkey")],
            rn_col="__rn",
            total_col="__n",
        )
        return ranked.select(
            "o_custkey",
            exact_ntile(F.col("__rn"), F.col("__n"), 10).alias(out),
        )

    d96 = year_deciles("1996-01-01", "1997-01-01", "decile_1996")
    d97 = year_deciles("1997-01-01", "1998-01-01", "decile_1997")
    matrix = (
        d96.join(d97, "o_custkey")
        .groupBy("decile_1996", "decile_1997")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    origin = F.sum("__n").over(Window.partitionBy("decile_1996"))
    return matrix.select(
        "decile_1996",
        "decile_1997",
        F.col("__n").cast("bigint").alias("n_customers"),
        F.round(
            F.col("__n").cast("double") / origin.cast("double"), 6
        ).alias("origin_share"),
    ).orderBy("decile_1996", "decile_1997")


_TM01_ORACLE = """
WITH y96 AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY o_custkey
), y97 AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY o_custkey
), d96 AS (
  SELECT o_custkey,
         NTILE(10) OVER (ORDER BY rev DESC, o_custkey) AS decile_1996
  FROM y96
), d97 AS (
  SELECT o_custkey,
         NTILE(10) OVER (ORDER BY rev DESC, o_custkey) AS decile_1997
  FROM y97
), matrix AS (
  SELECT decile_1996, decile_1997, COUNT(*) AS n
  FROM d96 JOIN d97 USING (o_custkey)
  GROUP BY 1, 2
)
SELECT decile_1996, decile_1997,
       CAST(n AS BIGINT) AS n_customers,
       ROUND(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY decile_1996) AS DOUBLE), 6)
         AS origin_share
FROM matrix
ORDER BY decile_1996, decile_1997
"""

ROUND7_STAGED_QUERIES["tm01_spend_decile_migration"] = (
    tm01_spend_decile_migration
)
ROUND7_STAGED_ORACLE["tm01_spend_decile_migration"] = _TM01_ORACLE


# ---------------------------------------------------------------------------
# Round-10 staged wave 66: schema-evolution merged read, cross-fact
# order-total reconciliation, temporal anti-pattern detection.
# ---------------------------------------------------------------------------


def se01_schema_evolution_read(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-evolution round-trip certification — the ingest reality
    every long-lived lakehouse hits: an old batch written WITHOUT a
    column and a new batch written WITH it must read back as one
    frame, with the missing column null-filled for old rows. The old
    batch (even order keys) carries (o_orderkey, o_totalprice); the
    new batch (odd keys) adds o_orderpriority; both land in one
    directory and come back via ``mergeSchema`` — Spark's
    footer-union path, which reconciles the two Parquet schemas
    instead of trusting one file's footer. The returned accounting
    aggregates the READ-BACK frame (pk02's sink discipline), so a
    dropped row, a retyped column, or a wrongly-filled null fails the
    hash against the oracle, which computes the same numbers straight
    from the source table.

    Scale: mergeSchema's cost is one footer read per FILE (driver
    side) — bounded by file count, not data; the honest 100 TB note
    is that footer-union across millions of small files is the real
    cost, which is exactly the compaction economics inc04 quantifies.
    The read-back aggregate is one partial-aggregable 6-key rollup,
    and the batch split predicate is row-local."""
    import tempfile

    # one written copy per (process, sf) — the shared-intermediate
    # pattern (_NEARDUP_COMPONENTS_CACHE): se01 sits in the timed bench
    # path, so re-invocations in one long session (best-of-2 passes,
    # sweeps) must not accumulate a fresh two-copy mkdtemp + atexit
    # handler each; reset_shared_intermediates rmtree's and clears it
    out_dir = _SE01_DIR_CACHE.get(sf)
    if out_dir is None:
        import atexit
        import shutil

        orders = load(spark, sf, "orders")
        out_dir = tempfile.mkdtemp(prefix="se01_evolve_")
        # one idempotent handler per cached dir (ignore_errors makes a
        # double-delete after reset_shared_intermediates a no-op): a
        # process that runs se01 but exits without the bench's reset —
        # e.g. a targeted pytest run — must not leak the mkdtemp
        # (r10 ADVICE item 3)
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        old = orders.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", dec("o_totalprice").alias("o_totalprice")
        )
        new = orders.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey",
            dec("o_totalprice").alias("o_totalprice"),
            "o_orderpriority",
        )
        old.write.mode("overwrite").parquet(out_dir + "/batch=0")
        new.write.mode("overwrite").parquet(out_dir + "/batch=1")
        _SE01_DIR_CACHE[sf] = out_dir
    back = spark.read.option("mergeSchema", "true").parquet(out_dir)
    return (
        back.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("<pre-schema>"))
            .alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.col("o_orderpriority").isNull().cast("bigint")
            ).alias("n_null_priority"),
            F.round(F.sum("o_totalprice").cast("double"), 2).alias(
                "revenue"
            ),
        )
        .orderBy("priority")
    )


_SE01_ORACLE = """
WITH merged AS (
  SELECT o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
           AS o_orderpriority
  FROM orders
)
SELECT COALESCE(o_orderpriority, '<pre-schema>') AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null_priority,
       ROUND(CAST(SUM(price) AS DOUBLE), 2) AS revenue
FROM merged
GROUP BY 1 ORDER BY priority
"""

ROUND7_STAGED_QUERIES["se01_schema_evolution_read"] = (
    se01_schema_evolution_read
)
ROUND7_STAGED_ORACLE["se01_schema_evolution_read"] = _SE01_ORACLE


def dq04_order_total_reconciliation(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-fact reconciliation of the order header against its
    lines: recompute each order's total as Σ extendedprice·(1−disc)·
    (1+tax) over its lineitems — all exact DECIMAL — and band the
    header-vs-recompute deviation per priority. sync01/cdc01 compare
    a fact against ITSELF across replicas/snapshots; this is the
    other reconciliation a warehouse needs — two DIFFERENT facts that
    must agree by business rule (and, in a training pipeline, the
    manifest-vs-shard-content audit). Headless orders (no lines)
    surface as their own band instead of vanishing.

    Scale: the lineitem rollup is partial-aggregable and co-keyed
    with the orders join (one shuffle each side, AQE-coalesced); the
    banding is row-local; the output is bounded by priorities ×
    bands. Every product stays DECIMAL until the rounded deviation
    columns, so the bands are bit-stable under any partitioning."""
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    one = F.lit(1).cast("decimal(4,2)")
    term = (
        dec("l_extendedprice")
        * (one - F.col("l_discount").cast("decimal(4,2)"))
        * (one + F.col("l_tax").cast("decimal(4,2)"))
    ).cast("decimal(38,6)")
    recomputed = li.groupBy("l_orderkey").agg(
        F.sum(term).cast("decimal(38,6)").alias("__recomputed")
    )
    joined = orders.select(
        "o_orderkey", "o_orderpriority", dec("o_totalprice").alias("__hdr")
    ).join(
        recomputed,
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left",
    )
    dev = F.abs(
        F.col("__hdr").cast("decimal(38,6)") - F.col("__recomputed")
    )
    band = (
        F.when(F.col("__recomputed").isNull(), "no_lines")
        .when(dev <= F.lit(0.01).cast("decimal(38,6)"), "exact")
        .when(dev <= F.lit(1).cast("decimal(38,6)"), "cents_off")
        .otherwise("divergent")
    )
    return (
        joined.select(
            "o_orderpriority",
            band.alias("band"),
            F.coalesce(dev, F.lit(0).cast("decimal(38,6)")).alias("__dev"),
        )
        .groupBy("o_orderpriority", "band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("__dev").cast("double"), 2).alias(
                "total_abs_deviation"
            ),
            F.round(F.max("__dev").cast("double"), 6).alias(
                "max_abs_deviation"
            ),
        )
        .orderBy("o_orderpriority", "band")
    )


_DQ04_ORACLE = """
WITH recomputed AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
               * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))
               AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS rec
  FROM lineitem GROUP BY l_orderkey
), joined AS (
  SELECT o.o_orderpriority,
         CASE WHEN r.rec IS NULL THEN 'no_lines'
              WHEN ABS(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                       AS DECIMAL(38,6)) - r.rec)
                   <= CAST(0.01 AS DECIMAL(38,6)) THEN 'exact'
              WHEN ABS(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                       AS DECIMAL(38,6)) - r.rec)
                   <= CAST(1 AS DECIMAL(38,6)) THEN 'cents_off'
              ELSE 'divergent' END AS band,
         COALESCE(ABS(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                      AS DECIMAL(38,6)) - r.rec),
                  CAST(0 AS DECIMAL(38,6))) AS dev
  FROM orders o LEFT JOIN recomputed r ON o.o_orderkey = r.l_orderkey
)
SELECT o_orderpriority, band,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(dev) AS DOUBLE), 2) AS total_abs_deviation,
       ROUND(CAST(MAX(dev) AS DOUBLE), 6) AS max_abs_deviation
FROM joined
GROUP BY o_orderpriority, band
ORDER BY o_orderpriority, band
"""

ROUND7_STAGED_QUERIES["dq04_order_total_reconciliation"] = (
    dq04_order_total_reconciliation
)
ROUND7_STAGED_ORACLE["dq04_order_total_reconciliation"] = _DQ04_ORACLE


#: pat01's lookback horizon: a purchase is "error-shadowed" when the
#: same user logged an error event within this many microseconds
#: BEFORE the purchase (strictly before — concurrent timestamps do
#: not shadow).
PAT01_LOOKBACK_US = 60 * 60 * 1_000_000


def pat01_error_shadowed_purchases(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal anti-pattern detection: purchases preceded by an error
    from the SAME user within the last hour — the MATCH_RECOGNIZE-
    style "B after A within T" pattern (the conversion-despite-
    friction signal; fn01 measures the happy path, this measures the
    shadowed one), expressed as an equi-keyed LEFT SEMI join with a
    time-range residual. Daily counts, shadowed counts and the
    shadowed share.

    Scale: the join is equi-keyed on user_id — both sides fact-sized,
    one co-keyed shuffle, the range predicate evaluated as a residual
    WITHIN each user's partition (the scd02 discipline: never a
    range-only join that explodes). LEFT SEMI short-circuits per
    probe row, so a user with many errors costs one match, not a
    fan-out. The rollup is calendar-bounded (one row per day)."""
    ev = load(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("__us"),
        F.date_trunc("day", F.col("ts")).alias("__day"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("__pu"),
        F.col("__us").alias("__pus"),
        "__day",
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("__eu"), F.col("__us").alias("__eus")
    )
    shadowed = purchases.join(
        errors,
        (F.col("__pu") == F.col("__eu"))
        & (F.col("__eus") < F.col("__pus"))
        & (F.col("__eus") >= F.col("__pus") - PAT01_LOOKBACK_US),
        "left_semi",
    )
    daily = purchases.groupBy("__day").agg(
        F.count(F.lit(1)).alias("__n")
    )
    daily_sh = shadowed.groupBy("__day").agg(
        F.count(F.lit(1)).alias("__ns")
    )
    return (
        daily.join(daily_sh, "__day", "left")
        .select(
            F.col("__day").alias("day"),
            F.col("__n").cast("bigint").alias("n_purchases"),
            F.coalesce(F.col("__ns"), F.lit(0))
            .cast("bigint")
            .alias("n_shadowed"),
            F.round(
                F.coalesce(F.col("__ns"), F.lit(0)).cast("double")
                / F.col("__n").cast("double"),
                6,
            ).alias("shadowed_share"),
        )
        .orderBy("day")
    )


_PAT01_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         date_trunc('day', ts) AS day
  FROM events
), p AS (
  SELECT user_id, us, day FROM ev WHERE event_type = 'purchase'
), e AS (
  SELECT user_id, us FROM ev WHERE event_type = 'error'
), flagged AS (
  SELECT p.day,
         CASE WHEN EXISTS (
           SELECT 1 FROM e
           WHERE e.user_id = p.user_id
             AND e.us < p.us
             AND e.us >= p.us - {PAT01_LOOKBACK_US}
         ) THEN 1 ELSE 0 END AS shadowed
  FROM p
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(shadowed) AS BIGINT) AS n_shadowed,
       ROUND(CAST(SUM(shadowed) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS shadowed_share
FROM flagged
GROUP BY day ORDER BY day
"""

ROUND7_STAGED_QUERIES["pat01_error_shadowed_purchases"] = (
    pat01_error_shadowed_purchases
)
ROUND7_STAGED_ORACLE["pat01_error_shadowed_purchases"] = _PAT01_ORACLE


# ---------------------------------------------------------------------------
# Round-10 staged wave 67: calendar-function parity report,
# approx-quantile calibration, normalization-lift dedup audit.
# ---------------------------------------------------------------------------


def dt01_calendar_features(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-feature parity report over the monthly revenue table —
    a focused cross-engine certification of the datetime function
    family (last_day, month length, quarter, ISO week, ISO weekday)
    on data-bearing rows, the functions every dim_date build and
    every fiscal rollup depends on. Engine conventions differ in
    exactly the places this pins: Spark's dayofweek is
    Sunday-1-based, so the ISO weekday is derived with the
    (dow+5)%7+1 rule (q-family precedent) to match DuckDB's isodow.

    Scale: one partial-aggregable fact rollup to the calendar-bounded
    monthly frame; every calendar expression is row-local over ~84
    rows."""
    orders = load(spark, sf, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum(dec("o_totalprice")).cast("double"), 2).alias(
            "revenue"
        ),
    )
    start = F.to_date("month")
    return monthly.select(
        "month",
        "n_orders",
        "revenue",
        F.last_day("month").cast("timestamp").alias("month_end"),
        (F.datediff(F.last_day("month"), start) + 1)
        .cast("int")
        .alias("days_in_month"),
        F.quarter("month").cast("int").alias("quarter"),
        F.weekofyear("month").cast("int").alias("iso_week_start"),
        ((F.dayofweek("month") + 5) % 7 + 1)
        .cast("int")
        .alias("iso_dow_start"),
    ).orderBy("month")


_DT01_ORACLE = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS revenue
  FROM orders GROUP BY 1
)
SELECT month, n_orders, revenue,
       CAST(last_day(CAST(month AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(date_diff('day', CAST(month AS DATE),
                      last_day(CAST(month AS DATE))) + 1 AS INTEGER)
         AS days_in_month,
       CAST(quarter(month) AS INTEGER) AS quarter,
       CAST(weekofyear(month) AS INTEGER) AS iso_week_start,
       CAST(isodow(month) AS INTEGER) AS iso_dow_start
FROM monthly ORDER BY month
"""

ROUND7_STAGED_QUERIES["dt01_calendar_features"] = dt01_calendar_features
ROUND7_STAGED_ORACLE["dt01_calendar_features"] = _DT01_ORACLE


#: ap01's sketch knob: percentile_approx's accuracy parameter. The
#: engine guarantees rank error <= n/accuracy; the certification
#: window below allows twice that plus a two-row slack so ties on
#: equal values can't flip the verdict.
AP01_ACCURACY = 1000
AP01_QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def ap01_approx_quantile_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate-quantile calibration: Spark's percentile_approx
    (Greenwald-Khanna sketch — mergeable, bounded memory, THE
    quantile at 100 TB where any exact method pays a full sort or a
    selection pass) certified against the exact distributed
    percentile operator. The exact values hash-match the oracle's
    percentile_cont; the sketch's answer is engine-specific by
    nature, so what ships is its CALIBRATION: the rank of the
    approximate answer must sit within the published n/accuracy rank
    bound of the target rank (hll01's discipline — the
    engine-internal estimate rides next to exact, certifiable
    twins).

    Scale: the exact side is the range-partition selection operator
    (one pass + O(P) metadata per quantile, never a single-reducer
    sort); the sketch side is one partial-aggregable agg; the rank
    probe is one count per quantile against the 5-row broadcast
    panel."""
    from ..operators.quantile import exact_percentiles_cont

    orders = load(spark, sf, "orders")
    vals = orders.select(F.col("o_totalprice").cast("double").alias("__v"))
    totals = vals.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    # ONE range shuffle + ONE selection pass for all five quantiles
    # (exact_percentiles_cont amortizes the passes across the list)
    # round on the DataFrame side with F.round (HALF_UP, matching the
    # oracle's ROUND and the rounding discipline everywhere else) —
    # Python round() is round-half-even and can fork the hash on a
    # .00005 boundary
    exact = spark.createDataFrame(
        [
            (p, v)
            for p, v in exact_percentiles_cont(
                vals, "__v", list(AP01_QUANTILES)
            )
        ],
        "p double, exact_value double",
    ).select("p", F.round("exact_value", 4).alias("exact_value"))
    approx_panel = (
        vals.agg(
            F.percentile_approx(
                "__v", list(AP01_QUANTILES), AP01_ACCURACY
            ).alias("__qs")
        )
        .select(F.posexplode("__qs").alias("__i", "__av"))
        .select(
            F.element_at(
                F.lit(list(AP01_QUANTILES)), F.col("__i") + 1
            ).alias("p"),
            "__av",
        )
    )
    ranks = (
        vals.crossJoin(F.broadcast(approx_panel))
        .groupBy("p")
        .agg(
            F.sum((F.col("__v") <= F.col("__av")).cast("long")).alias(
                "__rank"
            )
        )
    )
    return (
        exact.join(ranks, "p")
        .crossJoin(F.broadcast(totals))
        .select(
            "p",
            "exact_value",
            (
                F.abs(F.col("__rank").cast("double") - F.col("p") * F.col("__n"))
                <= F.lit(2.0) * F.col("__n") / AP01_ACCURACY + F.lit(2.0)
            ).alias("within_bound"),
        )
        .orderBy("p")
    )


def _ap01_oracle_sql() -> str:
    rows = " UNION ALL ".join(
        f"SELECT CAST({p} AS DOUBLE) AS p, "
        f"ROUND(quantile_cont(o_totalprice, {p}), 4) AS exact_value, "
        f"TRUE AS within_bound FROM (SELECT CAST(o_totalprice AS DOUBLE) "
        f"AS o_totalprice FROM orders)"
        for p in AP01_QUANTILES
    )
    return f"SELECT * FROM ({rows}) ORDER BY p"


ROUND7_STAGED_QUERIES["ap01_approx_quantile_calibration"] = (
    ap01_approx_quantile_calibration
)
ROUND7_STAGED_ORACLE["ap01_approx_quantile_calibration"] = _ap01_oracle_sql()


def dd22_normalization_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Normalization-lift dedup audit: how many MORE duplicates does
    exact dedup find after case-folding and punctuation/whitespace
    collapse than on the raw bytes — the measured justification for
    the normalize-before-dedup step every pipeline debates (raw
    hashing misses trivially-reformatted copies; dd01 is the raw
    baseline, this quantifies the delta per source). Normalization is
    LOWER → strip non-alphanumerics to spaces → trim, written with
    the same RE2-compatible character class in both engines (px02's
    regex-parity discipline).

    Scale: two row-local hash projections in ONE scan, one
    partial-aggregable source rollup — countDistinct on two md5 keys.
    The lift is a theorem (normalization only merges hash classes,
    never splits), pinned by the invariant test."""
    docs = load(spark, sf, "documents")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    )
    return (
        docs.select(
            "source",
            F.md5("text").alias("__raw"),
            F.md5(norm).alias("__norm"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (F.count(F.lit(1)) - F.countDistinct("__raw"))
            .cast("bigint")
            .alias("raw_dup_docs"),
            (F.count(F.lit(1)) - F.countDistinct("__norm"))
            .cast("bigint")
            .alias("norm_dup_docs"),
            F.round(
                (F.countDistinct("__raw") - F.countDistinct("__norm"))
                .cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("lift_share"),
        )
        .orderBy("source")
    )


_DD22_ORACLE = """
WITH keyed AS (
  SELECT source,
         md5(text) AS raw_h,
         md5(TRIM(REGEXP_REPLACE(LOWER(text), '[^a-z0-9]+', ' ', 'g')))
           AS norm_h
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) - COUNT(DISTINCT raw_h) AS BIGINT) AS raw_dup_docs,
       CAST(COUNT(*) - COUNT(DISTINCT norm_h) AS BIGINT) AS norm_dup_docs,
       ROUND(CAST(COUNT(DISTINCT raw_h) - COUNT(DISTINCT norm_h) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS lift_share
FROM keyed
GROUP BY source ORDER BY source
"""

ROUND7_STAGED_QUERIES["dd22_normalization_lift"] = dd22_normalization_lift
ROUND7_STAGED_ORACLE["dd22_normalization_lift"] = _DD22_ORACLE


# ---------------------------------------------------------------------------
# Round-10 staged wave 68: cohort LTV curve, RFM segmentation,
# brand-concentration HHI.
# ---------------------------------------------------------------------------


def ltv01_cohort_revenue_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort lifetime-value curve: users cohorted by first-event DAY,
    purchase revenue accumulated by week-of-life offset — the
    revenue-weighted complement of ret01's retention counts (retention
    says WHO came back; this says what their return was worth, the
    curve every payback-period decision reads). Day-grain cohorts
    (ret02's convention) keep the curve informative on any corpus
    whose acquisition happens inside one calendar week.

    Scale: first-event day is one partial-aggregable min per user;
    the cohort join is co-keyed on user_id (both sides fact-sized,
    one shuffle each, AQE-coalesced); the curve aggregate is bounded
    by days × weeks regardless of corpus size, and the cumulative
    column windows over THAT bounded frame, never the raw events.
    Revenue stays exact DECIMAL until the rounded outputs; week
    offsets are exact integer day arithmetic under FLOOR (a bare /7
    CAST forks the engines — DuckDB rounds half-even, Spark
    truncates)."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("__cd")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("__u"),
        F.date_trunc("day", F.col("ts")).alias("__ed"),
        F.col("value").cast("decimal(18,2)").alias("__val"),
    )
    joined = purchases.join(
        first, purchases["__u"] == first["user_id"]
    ).select(
        F.col("__cd").alias("cohort_day"),
        F.floor(
            F.datediff(F.to_date("__ed"), F.to_date("__cd")) / F.lit(7)
        )
        .cast("int")
        .alias("week_offset"),
        "__u",
        "__val",
    )
    curve = joined.groupBy("cohort_day", "week_offset").agg(
        F.countDistinct("__u").cast("bigint").alias("n_buyers"),
        F.sum("__val").cast("decimal(38,2)").alias("__rev"),
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return curve.select(
        "cohort_day",
        "week_offset",
        "n_buyers",
        F.round(F.col("__rev").cast("double"), 2).alias("revenue"),
        F.round(
            F.sum("__rev").over(w).cast("double"), 2
        ).alias("cum_revenue"),
    ).orderBy("cohort_day", "week_offset")


_LTV01_ORACLE = """
WITH first AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS cd
  FROM events GROUP BY user_id
), purchases AS (
  SELECT user_id, date_trunc('day', ts) AS ed,
         CAST(value AS DECIMAL(18,2)) AS val
  FROM events WHERE event_type = 'purchase'
), joined AS (
  SELECT f.cd AS cohort_day,
         CAST(FLOOR(date_diff('day', CAST(f.cd AS DATE),
                             CAST(p.ed AS DATE)) / 7)
              AS INTEGER) AS week_offset,
         p.user_id, p.val
  FROM purchases p JOIN first f ON p.user_id = f.user_id
), curve AS (
  SELECT cohort_day, week_offset,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
         CAST(SUM(val) AS DECIMAL(38,2)) AS rev
  FROM joined GROUP BY 1, 2
)
SELECT cohort_day, week_offset, n_buyers,
       ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
       ROUND(CAST(SUM(rev) OVER (PARTITION BY cohort_day
                                 ORDER BY week_offset
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2)
         AS cum_revenue
FROM curve
ORDER BY cohort_day, week_offset
"""

ROUND7_STAGED_QUERIES["ltv01_cohort_revenue_curve"] = (
    ltv01_cohort_revenue_curve
)
ROUND7_STAGED_ORACLE["ltv01_cohort_revenue_curve"] = _LTV01_ORACLE


def rfm01_rfm_segmentation(spark: SparkSession, sf: str) -> DataFrame:
    """RFM segmentation census — recency / frequency / monetary
    quintiles per customer, the classic CRM partitioning (and, on a
    training corpus, the freshness / volume / quality-mass cube for
    source curation). Each dimension ranks the ENTITY-sized customer
    frame through the distributed two-phase ranker + the exact NTILE
    formula (q26's discipline, three times over), so no dimension
    ever funnels the frame through one window task; the census is
    bounded by 5³ cells.

    Quintile orientation: R=1 is MOST RECENT (rank by last order date
    descending), F=1 highest order count, M=1 highest revenue — ties
    broken by custkey ascending, mirrored in the oracle's NTILE
    ORDER BY."""
    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
        exact_ntile,
    )

    orders = load(spark, sf, "orders")
    # r13: seven consumers read this entity-sized frame (each ranker's
    # boundary-sampling + shuffle passes, plus the cube join);
    # checkpoint so the orders scan + rollup runs once
    per = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("__last"),
        F.count(F.lit(1)).cast("bigint").alias("__freq"),
        F.sum(dec("o_totalprice")).cast("double").alias("__rev"),
    ).localCheckpoint()

    def quintile(order_cols, out):
        ranked = attach_global_row_number(
            per,
            order_by=order_cols,
            rn_col="__rn",
            total_col="__n",
        )
        return ranked.select(
            F.col("o_custkey").alias(f"__k_{out}"),
            exact_ntile(F.col("__rn"), F.col("__n"), 5).alias(out),
        )

    r = quintile([F.desc("__last"), F.asc("o_custkey")], "r")
    f = quintile([F.desc("__freq"), F.asc("o_custkey")], "f")
    m = quintile([F.desc("__rev"), F.asc("o_custkey")], "m")
    cube = (
        per.join(r, per["o_custkey"] == r["__k_r"])
        .join(f, per["o_custkey"] == f["__k_f"])
        .join(m, per["o_custkey"] == m["__k_m"])
    )
    return (
        cube.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum(F.col("__rev").cast("decimal(18,2)")).cast("double"), 2)
            .alias("segment_revenue"),
        )
        .orderBy("r", "f", "m")
    )


_RFM01_ORACLE = """
WITH per AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey, rev,
         NTILE(5) OVER (ORDER BY last_order DESC, o_custkey) AS r,
         NTILE(5) OVER (ORDER BY freq DESC, o_custkey) AS f,
         NTILE(5) OVER (ORDER BY rev DESC, o_custkey) AS m
  FROM per
)
SELECT r, f, m,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS segment_revenue
FROM scored
GROUP BY r, f, m
ORDER BY r, f, m
"""

ROUND7_STAGED_QUERIES["rfm01_rfm_segmentation"] = rfm01_rfm_segmentation
ROUND7_STAGED_ORACLE["rfm01_rfm_segmentation"] = _RFM01_ORACLE


def hhi01_brand_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """Herfindahl-Hirschman brand-concentration index per market
    segment — the antitrust/market-structure statistic (Σ sᵢ² over
    brand revenue shares sᵢ, in the conventional 0–10000 points
    scale), the GROUP-share complement of gini01's individual-level
    inequality (a segment can have an equal customer base yet a
    monopolized brand mix, and vice versa). Also the source-mix
    concentration check for a training corpus at the supplier level.

    Scale: lineitem ⋈ part and the revenue rollup are co-keyed
    partial-aggregable shuffles; the orders join brings the segment
    key through the customer dimension (entity-sized, never
    broadcast); the share/HHI arithmetic runs over the bounded
    (segment × brand) frame — exact DECIMAL revenue, shares divided
    once, squares summed per segment with the window totals taken
    over the AGGREGATED frame."""
    from pyspark.sql import Window

    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", dec("l_extendedprice").alias("__amt")
    )
    part = load(spark, sf, "part").select("p_partkey", "p_brand")
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    seg_brand = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("p_brand").alias("__brand"),
        )
        .agg(F.sum("__amt").cast("decimal(38,2)").alias("__rev"))
    )
    w = Window.partitionBy("mktsegment")
    share = F.col("__rev").cast("double") / F.sum("__rev").over(w).cast(
        "double"
    )
    scored = seg_brand.select(
        "mktsegment",
        "__brand",
        share.alias("__s"),
    )
    return (
        scored.groupBy("mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_brands"),
            F.round(
                F.sum(F.col("__s") * F.col("__s")) * F.lit(10000.0), 2
            ).alias("hhi"),
            F.round(F.max("__s"), 6).alias("top_brand_share"),
        )
        .orderBy("mktsegment")
    )


_HHI01_ORACLE = """
WITH seg_brand AS (
  SELECT c.c_mktsegment AS mktsegment, p.p_brand AS brand,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(38,2)) AS rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), scored AS (
  SELECT mktsegment,
         CAST(rev AS DOUBLE)
           / CAST(SUM(rev) OVER (PARTITION BY mktsegment) AS DOUBLE) AS s
  FROM seg_brand
)
SELECT mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_brands,
       ROUND(SUM(s * s) * 10000.0, 2) AS hhi,
       ROUND(MAX(s), 6) AS top_brand_share
FROM scored
GROUP BY mktsegment ORDER BY mktsegment
"""

ROUND7_STAGED_QUERIES["hhi01_brand_concentration"] = hhi01_brand_concentration
ROUND7_STAGED_ORACLE["hhi01_brand_concentration"] = _HHI01_ORACLE


# ---------------------------------------------------------------------------
# Round-10 promotions (r9 verdict tasks 1+2): all 48 staged round-10
# queries enter the live registry. The list order is the certification
# order the r9 verdict asked for — cur03 first (the slowest staged
# sf0.1 wall; its promotion confirms the ccbase carrier attribution in
# the main bench), then the warehouse-layout family, the dedup audits,
# the streaming sketch-maintenance trio, the business-analytics wave,
# and the remainder in staging-wave order (waves 52 -> 68).
# __spark_entry__ consumes this list as the bucket-2 (never-certified)
# judgment order inside its executable window policy.

ROUND10_PROMOTED: list[str] = [
    "cur03_perplexity_curation_funnel",
    # warehouse-layout family
    "cdc01_snapshot_diff",
    "scd02_point_in_time_join",
    "se01_schema_evolution_read",
    "zo02_minmax_pruning_audit",
    # dedup audits
    "dd20_cluster_size_histogram",
    "dd21_lsh_band_sweep",
    "dd22_normalization_lift",
    # streaming sketch maintenance
    "st17_streaming_countmin",
    "st18_streaming_hll_registers",
    "st19_streaming_bloom_filter",
    # business-analytics wave
    "ltv01_cohort_revenue_curve",
    "rfm01_rfm_segmentation",
    "gini01_revenue_concentration",
    "hhi01_brand_concentration",
    "ar01_brand_association_rules",
    "ses01_gap_sessionization",
    "ewma01_revenue_smoothing",
    "pv01_status_pivot",
    "tm01_spend_decile_migration",
    "ret02_fixed_horizon_retention",
    "aj03_asof_nearest_join",
    "pat01_error_shadowed_purchases",
    # remainder, staging-wave order (52 -> 68)
    "qf05_ccnet_perplexity_buckets",
    "tx24_vocab_mass_coverage",
    "dq02_fk_orphan_matrix",
    "cal01_brier_calibration",
    "sk02_hash_partition_balance",
    "dm02_domain_reweight_step",
    "ts04_seasonal_decomposition",
    "rk02_spearman_rank_agreement",
    "ss07_stratified_reservoir",
    "en02_bigram_conditional_entropy",
    "es18_ivf_cell_balance",
    "ct05_span_decontamination_exposure",
    "cm02_countmin_width_sweep",
    "pk03_context_length_curve",
    "px02_pii_injection_roundtrip",
    "dp02_clip_bound_sweep",
    "es19_quantization_bit_sweep",
    "gr07_copurchase_communities",
    "mm09_modality_budget_manifest",
    "inc04_compaction_audit",
    "lr01_ols_regression",
    "dq03_benford_digit_audit",
    "dq04_order_total_reconciliation",
    "dt01_calendar_features",
    "ap01_approx_quantile_calibration",
]

for _name in ROUND10_PROMOTED:
    EXTENSION_QUERIES[_name] = ROUND7_STAGED_QUERIES.pop(_name)
    EXTENSION_ORACLE[_name] = ROUND7_STAGED_ORACLE.pop(_name)
del _name


# ---------------------------------------------------------------------------
# Round-11 staging, wave 69: mix01 mixture-temperature sweep, tx25
# lexical-diversity panel, gr08 degree-ordered triangle census, ss08
# weighted sample (Efraimidis-Spirakis).
# ---------------------------------------------------------------------------

#: mix01's exponent grid: share ∝ tokens^α. α = 1 is natural sampling,
#: α → 0 is uniform; the sweep brackets the flattening operating points
#: a multi-corpus run debates (dm01 reports ONE temperature; this is
#: the tuning table that picks it — the dd18/es17/cm02 sweep pattern).
MIX01_ALPHAS = (0.25, 0.5, 0.75, 1.0)


def mix01_temperature_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Mixture-temperature tuning sweep: per exponent α, every source's
    sampling share w_s ∝ tokens_s^α plus the mixture's effective source
    count exp(H(w)) — the one-table answer to "how flat do we want the
    domain mixture" (GPT-3/PaLM-style temperature sampling tunes exactly
    this trade-off: α=1 lets head domains dominate, small α approaches
    uniform and up-samples the tail). dm01 reports the single configured
    temperature; this prices the grid so the choice is measured, not
    guessed.

    Scale: ONE fact-sized aggregate (per-source token mass, partial-
    aggregable), then everything — the 4-row α grid cross join, the
    pow, the per-α normalization, the entropy — lives on the
    |sources|×|α| bounded table. Determinism (the en01 rule): pow runs
    on exact BIGINT masses, shares are rounded once to 6 dp; each
    entropy term share·ln(share) is rounded once to 10 dp and
    DECIMAL-summed so no float addition order exists; exp is applied
    to the exact sum and rounded once to 4 dp."""
    docs = load(spark, sf, "documents")
    per = docs.groupBy("source").agg(
        F.sum(tx.token_count("text")).cast("bigint").alias("total_tokens")
    )
    alphas = spark.createDataFrame(
        [(a,) for a in MIX01_ALPHAS], "alpha double"
    )
    weighted = per.crossJoin(F.broadcast(alphas)).withColumn(
        "__pw", F.pow(F.col("total_tokens").cast("double"), F.col("alpha"))
    )
    tot = weighted.groupBy("alpha").agg(F.sum("__pw").alias("__tp"))
    shares = weighted.join(F.broadcast(tot), "alpha").select(
        "alpha",
        "source",
        "total_tokens",
        F.round(F.col("__pw") / F.col("__tp"), 6).alias("share"),
    )
    eff = shares.groupBy("alpha").agg(
        F.round(
            F.exp(
                -F.sum(
                    F.round(
                        F.when(
                            F.col("share") > 0,
                            F.col("share") * F.log("share"),
                        ).otherwise(F.lit(0.0)),
                        10,
                    ).cast("decimal(20,10)")
                ).cast("double")
            ),
            4,
        ).alias("eff_sources")
    )
    return (
        shares.join(F.broadcast(eff), "alpha")
        .select("alpha", "source", "total_tokens", "share", "eff_sources")
        .orderBy("alpha", "source")
    )


_MIX01_ORACLE = f"""
WITH per AS (
  SELECT source,
         CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
           AS total_tokens
  FROM documents GROUP BY source
), alphas AS (
  SELECT unnest([{", ".join(f"CAST({a} AS DOUBLE)" for a in MIX01_ALPHAS)}])
    AS alpha
), w AS (
  SELECT alpha, source, total_tokens,
         pow(CAST(total_tokens AS DOUBLE), alpha) AS pw
  FROM per CROSS JOIN alphas
), tot AS (
  SELECT alpha, SUM(pw) AS tp FROM w GROUP BY alpha
), shares AS (
  SELECT w.alpha, w.source, w.total_tokens,
         ROUND(w.pw / t.tp, 6) AS share
  FROM w JOIN tot t ON w.alpha = t.alpha
), eff AS (
  SELECT alpha,
         ROUND(exp(-CAST(SUM(CAST(ROUND(
             CASE WHEN share > 0 THEN share * ln(share) ELSE 0 END,
             10) AS DECIMAL(20,10))) AS DOUBLE)), 4) AS eff_sources
  FROM shares GROUP BY alpha
)
SELECT s.alpha, s.source, s.total_tokens, s.share, e.eff_sources
FROM shares s JOIN eff e ON s.alpha = e.alpha
ORDER BY s.alpha, s.source
"""

ROUND7_STAGED_QUERIES["mix01_temperature_sweep"] = mix01_temperature_sweep
ROUND7_STAGED_ORACLE["mix01_temperature_sweep"] = _MIX01_ORACLE


def tx25_lexical_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language lexical-diversity panel: type-token ratio, Guiraud's
    root-TTR (types/√tokens — the length-corrected variant, since raw
    TTR decays with corpus size), and the hapax-legomena share — the
    classic vocabulary-richness signals a curation pipeline reads next
    to the qf panels (template-generated or boilerplate-heavy text shows
    abnormally LOW diversity; OCR noise and spam show abnormally HIGH
    hapax share). Rides the tx10/en02 tokenization (lowercased
    [a-z0-9]+ words).

    Scale: one token explode into a (lang, word)-keyed count — partial-
    aggregable, vocabulary-bounded output — then the diversity panel is
    a |langs|-row rollup. No windows, no self-joins; sqrt/ratios are
    computed once per bounded row from exact BIGINTs and rounded once
    (IEEE sqrt is correctly rounded, so the 6 dp values cannot fork
    between engines)."""
    toks = _docs_words(spark, sf).select(
        "lang", F.explode("__words").alias("__w")
    )
    vocab = toks.groupBy("lang", "__w").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    return (
        vocab.groupBy("lang")
        .agg(
            F.sum("__c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum((F.col("__c") == 1).cast("bigint"))
            .cast("bigint")
            .alias("n_hapax"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.round(
                F.col("n_types").cast("double") / F.col("n_tokens"), 6
            ).alias("ttr"),
            F.round(
                F.col("n_types").cast("double")
                / F.sqrt(F.col("n_tokens").cast("double")),
                6,
            ).alias("guiraud"),
            F.round(
                F.col("n_hapax").cast("double") / F.col("n_types"), 6
            ).alias("hapax_share"),
        )
        .orderBy("lang")
    )


_TX25_ORACLE = f"""
WITH toks AS (
  SELECT lang, unnest({_WORDS}) AS w FROM documents
), vocab AS (
  SELECT lang, w, COUNT(*) AS c FROM toks GROUP BY 1, 2
)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS ttr,
       ROUND(CAST(COUNT(*) AS DOUBLE) / sqrt(CAST(SUM(c) AS DOUBLE)), 6)
         AS guiraud,
       ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS hapax_share
FROM vocab GROUP BY lang ORDER BY lang
"""

ROUND7_STAGED_QUERIES["tx25_lexical_diversity"] = tx25_lexical_diversity
ROUND7_STAGED_ORACLE["tx25_lexical_diversity"] = _TX25_ORACLE


def gr08_triangle_census(spark: SparkSession, sf: str) -> DataFrame:
    """Degree-ordered triangle census of the part co-purchase graph
    (gr05's edge set: parts sharing >= GR05_MIN_CO_ORDERS distinct
    orders): edge/wedge/triangle counts and the global clustering
    coefficient — the one-row structural fingerprint that says whether
    co-occurrence is CLIQUISH (bundles, boilerplate, template families)
    or STAR-SHAPED (hub products), which is the first question asked of
    any similarity/co-occurrence graph before mining it. Completes the
    graph-kernel family: gr01/gr02 profile degrees, gr03/gr07 find
    components, gr05 scores open wedges — this closes them.

    Scale: the classic degree-ordered orientation (each undirected edge
    points from its (degree, id)-SMALLER endpoint) bounds every node's
    out-degree by O(sqrt(|E|)) on any graph, so the wedge self-join —
    keyed on the wedge center, the tc01 shape — fans out
    Σ outdeg² = O(|E|^1.5) worst-case TOTAL, independent of hub skew
    (arboricity bound; the same reason gr05 needs an explicit hub cap
    is handled here structurally, with zero dropped wedges). Each
    triangle is counted exactly once: its (degree, id)-minimal vertex
    is the only one with out-edges to both others. Everything is exact
    integer until the final clustering ratio, rounded once to 6 dp.

    Reference parity: the reference engine has no graph operators; this
    extends the LLM-data-pipeline surface (SURVEY §2.10 extensions)."""
    edges = _gr05_copurchase_edges(spark, sf).localCheckpoint()
    und = edges.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).union(edges.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("dg"))
    # orient u -> v iff (deg(u), u) < (deg(v), v): a total order, so the
    # oriented graph is acyclic and every node's out-degree is bounded
    # by O(sqrt(|E|)) — the guard IS the orientation
    dv = deg.select(F.col("u").alias("v"), F.col("dg").alias("__dgv"))
    oriented = (
        und.join(deg, "u")
        .join(dv, "v")
        .filter(
            (F.col("dg") < F.col("__dgv"))
            | ((F.col("dg") == F.col("__dgv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v", "dg", "__dgv")
    )
    # wedges at center u: unordered out-neighbor pairs, canonicalized by
    # the SAME (deg, id) order so each candidate pair appears once and
    # aligns with the oriented closing edge
    lo = oriented.select("u", F.col("v").alias("x"), F.col("__dgv").alias("__dx"))
    hi = oriented.select("u", F.col("v").alias("y"), F.col("__dgv").alias("__dy"))
    wedges = (
        lo.join(hi, "u")
        .filter(
            (F.col("__dx") < F.col("__dy"))
            | ((F.col("__dx") == F.col("__dy")) & (F.col("x") < F.col("y")))
        )
        .select(F.col("x").alias("u"), F.col("y").alias("v"))
    )
    tri = wedges.join(oriented.select("u", "v"), ["u", "v"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        (F.sum("dg") / 2).cast("bigint").alias("n_edges"),
        F.sum(F.col("dg") * (F.col("dg") - 1) / 2)
        .cast("bigint")
        .alias("n_wedges"),
    )
    # an all-degree-1 graph (isolated edges) has ZERO wedges: the
    # clustering ratio is undefined — explicit NULL on both engines
    # (Spark ANSI raises on the naive 0/0; DuckDB yields NULL — the
    # gr11/tx26/rs02 degenerate class)
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ),
        ).alias("global_clustering"),
    )


def _gr08_oracle_sql() -> str:
    return f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), good AS (
  SELECT a.pk AS id_a, b.pk AS id_b
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2
  HAVING COUNT(*) >= {GR05_MIN_CO_ORDERS}
), und AS (
  SELECT id_a AS u, id_b AS v FROM good
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM good
), deg AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS dg FROM und GROUP BY u
), oriented AS (
  SELECT n.u, n.v, du.dg AS dgu, dv.dg AS dgv
  FROM und n JOIN deg du ON du.u = n.u JOIN deg dv ON dv.u = n.v
  WHERE (du.dg < dv.dg) OR (du.dg = dv.dg AND n.u < n.v)
), wedges AS (
  SELECT a.v AS u, b.v AS v
  FROM oriented a JOIN oriented b ON a.u = b.u
  WHERE (a.dgv < b.dgv) OR (a.dgv = b.dgv AND a.v < b.v)
), tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM wedges w JOIN oriented o ON o.u = w.u AND o.v = w.v
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(dg) / 2 AS BIGINT) AS n_edges,
         CAST(SUM(dg * (dg - 1) / 2) AS BIGINT) AS n_wedges
  FROM deg
)
SELECT s.n_nodes, s.n_edges, s.n_wedges, t.n_triangles,
       CASE WHEN s.n_wedges > 0
            THEN ROUND(3.0 * t.n_triangles / s.n_wedges, 6)
       END AS global_clustering
FROM stats s CROSS JOIN tri t
"""


ROUND7_STAGED_QUERIES["gr08_triangle_census"] = gr08_triangle_census
ROUND7_STAGED_ORACLE["gr08_triangle_census"] = _gr08_oracle_sql()


#: ss08's per-source sample size. Fixed-K like ss07's reservoir — the
#: downstream consumer (an eval carve-out, a human-review queue) wants
#: an exact budget per stratum.
SS08_SAMPLE_K = 64

#: 2^60 as an exact double divisor: hash60 values are < 2^60, so
#: (h + 1) / 2^60 is a uniform deterministic u in (0, 1].
SS08_U_DENOM = 1 << 60


def ss08_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement per source —
    Efraimidis–Spirakis A-ES (Inf. Process. Lett. 97(5), 2006): each doc
    draws u from its 60-bit doc_id hash and ranks by u^(1/w) with
    w = token mass, so selection probability is proportional to weight;
    the top-K per stratum IS the weighted sample. This is THE
    distributed weighted sampler: one pass, no sequential reservoir, no
    RNG state — merge-friendly (the top-K of a union is the top-K of
    the partial top-Ks) and reproducible across runs and engines, the
    token-budget-aware cousin of ss07's uniform reservoir. The output
    pins the per-source sample digests plus the sample-vs-population
    mean token mass — the visible proof the sampler actually tilts
    toward heavy documents.

    Scale: hash/weight/key are row-local; ranking rides the two-phase
    distributed ranker partitioned by source (never one window task per
    stratum); the rollup is |sources|-bounded. Determinism: the rank
    key ln(u)/w is the monotone log transform of u^(1/w) — computed
    from the exact integer hash, ROUNDED ONCE to 12 dp before ranking
    in both engines (so a last-ulp libm divergence cannot reorder), ties
    broken by doc_id; weights are exact BIGINTs floored at 1 (a
    zero-token doc must keep a nonzero draw — A-ES's w > 0 domain)."""
    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
    )

    docs = load(spark, sf, "documents").select(
        "source",
        "doc_id",
        F.greatest(F.lit(1).cast("bigint"), tx.token_count("text")).alias(
            "__w"
        ),
        dd.hash60(F.col("doc_id").cast("string")).alias("__h"),
    )
    keyed = docs.withColumn(
        "__key",
        F.round(
            F.log(
                (F.col("__h") + 1).cast("double") / F.lit(float(SS08_U_DENOM))
            )
            / F.col("__w"),
            12,
        ),
    )
    ranked = attach_global_row_number(
        keyed,
        order_by=[F.desc("__key"), F.asc("doc_id")],
        partition_by=["source"],
        rn_col="__rn",
        total_col="__n",
    )
    pop = keyed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg(F.col("__w").cast("double")), 4).alias(
            "avg_pop_tokens"
        ),
    )
    samp = (
        ranked.filter(F.col("__rn") <= SS08_SAMPLE_K)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("sample_size"),
            F.sum("doc_id").cast("bigint").alias("sample_docid_sum"),
            F.sum("__w").cast("bigint").alias("sample_token_sum"),
            F.round(F.avg(F.col("__w").cast("double")), 4).alias(
                "avg_sample_tokens"
            ),
        )
    )
    return (
        pop.join(samp, "source")
        .select(
            "source",
            "n_docs",
            "sample_size",
            "sample_docid_sum",
            "sample_token_sum",
            "avg_sample_tokens",
            "avg_pop_tokens",
        )
        .orderBy("source")
    )


_SS08_ORACLE = f"""
WITH keyed AS (
  SELECT source, doc_id,
         GREATEST(1, len(regexp_extract_all(text, '\\S+'))) AS w,
         ROUND(ln(CAST({_H60.format(x="CAST(doc_id AS VARCHAR)")} + 1
                        AS DOUBLE) / {float(1 << 60)})
               / GREATEST(1, len(regexp_extract_all(text, '\\S+'))),
               12) AS k
  FROM documents
), ranked AS (
  SELECT source, doc_id, w, k,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY k DESC, doc_id
         ) AS rn
  FROM keyed
), pop AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         ROUND(AVG(CAST(w AS DOUBLE)), 4) AS avg_pop_tokens
  FROM keyed GROUP BY source
), samp AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS sample_size,
         CAST(SUM(doc_id) AS BIGINT) AS sample_docid_sum,
         CAST(SUM(w) AS BIGINT) AS sample_token_sum,
         ROUND(AVG(CAST(w AS DOUBLE)), 4) AS avg_sample_tokens
  FROM ranked WHERE rn <= {SS08_SAMPLE_K}
  GROUP BY source
)
SELECT p.source, p.n_docs, s.sample_size, s.sample_docid_sum,
       s.sample_token_sum, s.avg_sample_tokens, p.avg_pop_tokens
FROM pop p JOIN samp s ON p.source = s.source
ORDER BY p.source
"""

ROUND7_STAGED_QUERIES["ss08_weighted_sample"] = ss08_weighted_sample
ROUND7_STAGED_ORACLE["ss08_weighted_sample"] = _SS08_ORACLE


def _register_staged_streaming_wave69() -> None:
    from local_etl_csv_to_postgresql_spark.streaming.queries import (
        ST20_STAGED_ORACLE,
        st20_streaming_bottomk_sample,
    )

    ROUND7_STAGED_QUERIES["st20_streaming_bottomk_sample"] = (
        st20_streaming_bottomk_sample
    )
    ROUND7_STAGED_ORACLE["st20_streaming_bottomk_sample"] = (
        ST20_STAGED_ORACLE
    )


_register_staged_streaming_wave69()


# ---------------------------------------------------------------------------
# Round-11 staging, wave 70: qf06 Gopher repetition filters, ts05
# changepoint scan.
# ---------------------------------------------------------------------------

#: qf06 flag thresholds — Gopher's repetition-filter family (Rae et al.
#: 2021, arXiv:2112.11446 Table A1 uses per-n thresholds; these two are
#: the word-n-gram pair adapted to the corpus's newline-free docs).
#: Structural constants mirrored into the oracle.
QF06_TOP_BIGRAM_MAX = 0.20
QF06_DUP_TRIGRAM_MAX = 0.30


def qf06_gopher_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style REPETITION filters (the half of Rae et al.'s quality
    panel qf04 doesn't cover — qf04 checks document SHAPE, this checks
    degeneracy): per document, the fraction of bigram mass taken by the
    single most-repeated bigram and the fraction of trigram mass inside
    duplicated trigrams — the two signals that catch boilerplate,
    keyword-stuffed, and model-looped text that length/symbol rules
    pass. Rolled per source with flag counts at the published-style
    thresholds.

    Scale: two position-preserving n-gram explodes (dedup.span_grams —
    dd15's kernel), each folding straight into a (doc, gram)-keyed
    count and then a doc-keyed rollup: linear in corpus tokens, joined
    doc-co-keyed, output |sources|-bounded. Determinism: per-doc
    fractions are exact-integer ratios rounded once to 8 dp and
    DECIMAL-summed into the per-source means (the en01 rule); flags
    compare the same rounded decimals in both engines."""
    docs = _docs_words(spark, sf)
    # r14 REVERT of the r13 fused order-tagged single pass: the fusion
    # was committed without a before/after measurement and the in-bench
    # A/B (chunked fresh-JVM bench contract, plans/r14/ab_runs.jsonl)
    # measures the two-explode shape ~40% faster (r13 quiet bench had
    # it at +79%). Mechanism — the tx16 batch-4 finding: n-grams rarely
    # repeat within a doc, so the tagged per-(doc, order, gram) count
    # frame is nearly occurrence-sized and its Exchange carries the
    # bigram AND trigram streams (~2x rows) through ONE wide shuffle +
    # conditional rollup, costing more than the second map-side explode
    # it saves; the separate shapes also aggregate bigrams without the
    # trigram stream's rows in flight.
    bic = (
        docs.select(
            "doc_id",
            "source",
            F.explode(dd.span_grams(F.col("__words"), 2)).alias("__g"),
        )
        .groupBy("doc_id", "source", "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    bdoc = bic.groupBy("doc_id", "source").agg(
        F.sum("__c").alias("__n_bi"), F.max("__c").alias("__max_bi")
    )
    tric = (
        docs.select(
            "doc_id",
            F.explode(dd.span_grams(F.col("__words"), 3)).alias("__g"),
        )
        .groupBy("doc_id", "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    tdoc = tric.groupBy("doc_id").agg(
        F.sum("__c").alias("__n_tri"),
        F.sum(F.when(F.col("__c") >= 2, F.col("__c")).otherwise(0)).alias(
            "__dup_tri"
        ),
    )
    per = bdoc.join(tdoc, "doc_id", "left").select(
        "source",
        F.round(
            F.col("__max_bi").cast("double") / F.col("__n_bi"), 8
        )
        .cast("decimal(12,8)")
        .alias("__t2"),
        F.round(
            F.coalesce(
                F.col("__dup_tri").cast("double") / F.col("__n_tri"),
                F.lit(0.0),
            ),
            8,
        )
        .cast("decimal(12,8)")
        .alias("__d3"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_scored"),
            F.round(
                F.sum("__t2").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_top_bigram_frac"),
            F.round(
                F.sum("__d3").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_dup_trigram_frac"),
            F.sum(
                (
                    (F.col("__t2") > QF06_TOP_BIGRAM_MAX)
                    | (F.col("__d3") > QF06_DUP_TRIGRAM_MAX)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("n_flagged"),
        )
        .orderBy("source")
    )


_QF06_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, {_WORDS} AS ws FROM documents
), bi AS (
  SELECT doc_id, source, unnest({_sql_span_grams('ws', 2)}) AS g FROM w
), bic AS (
  SELECT doc_id, source, g, COUNT(*) AS c FROM bi GROUP BY 1, 2, 3
), bdoc AS (
  SELECT doc_id, source, SUM(c) AS n_bi, MAX(c) AS max_bi
  FROM bic GROUP BY 1, 2
), tri AS (
  SELECT doc_id, unnest({_sql_span_grams('ws', 3)}) AS g FROM w
), tric AS (
  SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY 1, 2
), tdoc AS (
  SELECT doc_id, SUM(c) AS n_tri,
         SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_tri
  FROM tric GROUP BY 1
), per AS (
  SELECT b.source,
         CAST(ROUND(CAST(b.max_bi AS DOUBLE) / b.n_bi, 8)
              AS DECIMAL(12,8)) AS t2,
         CAST(ROUND(COALESCE(CAST(t.dup_tri AS DOUBLE) / t.n_tri, 0), 8)
              AS DECIMAL(12,8)) AS d3
  FROM bdoc b LEFT JOIN tdoc t USING (doc_id)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_scored,
       ROUND(CAST(SUM(t2) AS DOUBLE) / COUNT(*), 6) AS avg_top_bigram_frac,
       ROUND(CAST(SUM(d3) AS DOUBLE) / COUNT(*), 6) AS avg_dup_trigram_frac,
       CAST(SUM(CASE WHEN t2 > {QF06_TOP_BIGRAM_MAX}
                       OR d3 > {QF06_DUP_TRIGRAM_MAX}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM per GROUP BY source ORDER BY source
"""

ROUND7_STAGED_QUERIES["qf06_gopher_repetition"] = qf06_gopher_repetition
ROUND7_STAGED_ORACLE["qf06_gopher_repetition"] = _QF06_ORACLE


#: ts05 report size: the top changepoint candidates by the scan
#: statistic. 5 gives the analyst the primary break plus runners-up.
TS05_TOP = 5


def ts05_changepoint_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Single-changepoint scan over daily revenue — the binary-
    segmentation / CUSUM-type statistic G(t) = sqrt(t·(N−t)/N) ·
    |mean_left − mean_right| evaluated at EVERY split day, reporting
    the top candidates: the first step of every changepoint pipeline
    (binary segmentation recurses on the argmax; PELT prunes the same
    family), and the level-shift detector that mk01/ks01-style drift
    panels lack a TIME LOCALIZATION for. The scaling factor is the
    two-sample-z normalization, so G is comparable across split
    positions.

    Scale: the fact table rolls up to the calendar-bounded daily frame
    first (one partial-aggregable shuffle; ~2.4k rows at ANY corpus
    size), then the scan is ONE ordered window over that bounded frame
    (cumulative DECIMAL sums — the ewma01/ts04 discipline) and a
    top-k on |days| rows. Determinism: prefix sums and counts are
    exact DECIMAL/int64; each G(t) is computed once from identical
    operand order in both engines and rounded to 6 dp; ties break by
    day."""
    from pyspark.sql import Window

    orders = load(spark, sf, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").alias("day")
    ).agg(F.sum(dec("o_totalprice")).alias("__rev"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    tot = daily.agg(
        F.sum("__rev").cast("decimal(38,2)").alias("__s_all"),
        F.count(F.lit(1)).cast("bigint").alias("__n_all"),
    )
    scanned = (
        daily.select(
            "day",
            F.sum("__rev").over(w).cast("decimal(38,2)").alias("__s_left"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("__t"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("__t") < F.col("__n_all"))
    )
    mean_l = F.col("__s_left").cast("double") / F.col("__t")
    mean_r = (F.col("__s_all") - F.col("__s_left")).cast("double") / (
        F.col("__n_all") - F.col("__t")
    )
    g = F.sqrt(
        F.col("__t").cast("double")
        * (F.col("__n_all") - F.col("__t")).cast("double")
        / F.col("__n_all").cast("double")
    ) * F.abs(mean_l - mean_r)
    return (
        scanned.select(
            "day",
            F.col("__t").alias("split_index"),
            F.round(g, 6).alias("g_stat"),
            F.round(mean_l, 4).alias("mean_left"),
            F.round(mean_r, 4).alias("mean_right"),
        )
        .orderBy(F.desc("g_stat"), "day")
        .limit(TS05_TOP)
    )


_TS05_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS rev
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(SUM(rev) AS DECIMAL(38,2)) AS s_all,
         CAST(COUNT(*) AS BIGINT) AS n_all
  FROM daily
), scanned AS (
  SELECT day,
         CAST(SUM(rev) OVER (ORDER BY day) AS DECIMAL(38,2)) AS s_left,
         CAST(COUNT(*) OVER (ORDER BY day) AS BIGINT) AS t
  FROM daily
)
SELECT day, t AS split_index,
       ROUND(sqrt(CAST(t AS DOUBLE) * CAST(n_all - t AS DOUBLE)
                  / CAST(n_all AS DOUBLE))
             * ABS(CAST(s_left AS DOUBLE) / t
                   - CAST(s_all - s_left AS DOUBLE) / (n_all - t)), 6)
         AS g_stat,
       ROUND(CAST(s_left AS DOUBLE) / t, 4) AS mean_left,
       ROUND(CAST(s_all - s_left AS DOUBLE) / (n_all - t), 4) AS mean_right
FROM scanned CROSS JOIN tot
WHERE t < n_all
ORDER BY g_stat DESC, day LIMIT {TS05_TOP}
"""

ROUND7_STAGED_QUERIES["ts05_changepoint_scan"] = ts05_changepoint_scan
ROUND7_STAGED_ORACLE["ts05_changepoint_scan"] = _TS05_ORACLE


# ---------------------------------------------------------------------------
# Round-11 staging, wave 71: pv02 unpivot round-trip, dq05 functional-
# dependency audit.
# ---------------------------------------------------------------------------


def pv02_status_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot (melt) certification — the INVERSE of pv01's pivot, and
    the other half of the wide↔long reshaping surface every reporting
    layer needs: the status-pivoted count table melts back to
    (priority, status, n_orders) long form via DataFrame.unpivot, with
    absent cells kept as explicit zero rows (the pivot's null fill
    surviving the round trip). The oracle computes the same long table
    relationally — priority roster × status list left-joined to the
    direct rollup — so the certification pins BOTH the unpivot
    operator's variable/value mapping and its null semantics.

    Scale: the pivot stage is pv01's one partial-aggregable shuffle on
    the 5-key priority roster (explicit status list — no hidden
    distinct-collect scan); the unpivot is a row-local projection of
    the 5-row wide frame (melt is metadata work — it never shuffles)."""
    orders = load(spark, sf, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    long = piv.unpivot(
        ["o_orderpriority"], ["F", "O", "P"], "status", "__n"
    )
    return (
        long.select(
            F.col("o_orderpriority").alias("priority"),
            "status",
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias(
                "n_orders"
            ),
        )
        .orderBy("priority", "status")
    )


_PV02_ORACLE = """
WITH roster AS (
  SELECT DISTINCT o_orderpriority AS priority FROM orders
), statuses AS (
  SELECT unnest(['F', 'O', 'P']) AS status
), counts AS (
  SELECT o_orderpriority AS priority, o_orderstatus AS status,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
)
SELECT r.priority, s.status,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders
FROM roster r CROSS JOIN statuses s
LEFT JOIN counts c ON c.priority = r.priority AND c.status = s.status
ORDER BY r.priority, s.status
"""

ROUND7_STAGED_QUERIES["pv02_status_unpivot"] = pv02_status_unpivot
ROUND7_STAGED_ORACLE["pv02_status_unpivot"] = _PV02_ORACLE


#: dq05's audited dependency candidates: (table, determinant,
#: dependent). A mix of true FDs (the header key determines its own
#: attributes) and plausible-but-false ones — the profiling answer a
#: warehouse needs before trusting a join key or a denormalization.
DQ05_CANDIDATES = (
    ("orders", "o_orderkey", "o_orderpriority"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("part", "p_brand", "p_type"),
    ("customer", "c_nationkey", "c_mktsegment"),
)


def dq05_functional_dependencies(spark: SparkSession, sf: str) -> DataFrame:
    """Functional-dependency audit over a fixed candidate list — the
    Metanome-style data-profiling primitive: A → B holds iff no A-group
    carries two distinct B values, and the violation census (how many
    groups, how badly) is what decides whether a denormalization, a
    dimension key, or an entity-resolution blocking key is safe. One
    row per candidate with the group counts and the verdict.

    Scale: each candidate is one det-keyed aggregate (countDistinct
    expands to the standard two-level exact-distinct plan — partial-
    aggregable, linear in the table) followed by a 1-row rollup; the
    audit list is a bounded constant, so the whole answer is
    |candidates| rows. No joins, no windows; a 100 TB profile runs
    exactly the candidates under review."""
    legs = []
    for table, det, dep in DQ05_CANDIDATES:
        per = (
            load(spark, sf, table)
            .groupBy(F.col(det))
            .agg(F.countDistinct(F.col(dep)).alias("__d"))
        )
        legs.append(
            per.agg(
                F.lit(table).alias("table_name"),
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum((F.col("__d") > 1).cast("bigint"))
                .cast("bigint")
                .alias("n_violating_groups"),
                F.max("__d").cast("bigint").alias("max_distinct_dep"),
                (F.sum((F.col("__d") > 1).cast("bigint")) == 0).alias(
                    "holds"
                ),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out.orderBy("table_name", "determinant", "dependent")


def _dq05_oracle_sql() -> str:
    legs = []
    for table, det, dep in DQ05_CANDIDATES:
        legs.append(f"""
SELECT '{table}' AS table_name, '{det}' AS determinant,
       '{dep}' AS dependent,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(MAX(d) AS BIGINT) AS max_distinct_dep,
       SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM (
  SELECT {det}, COUNT(DISTINCT {dep}) AS d FROM {table} GROUP BY {det}
)""")
    body = " UNION ALL ".join(legs)
    return (
        f"SELECT * FROM ({body}) "
        "ORDER BY table_name, determinant, dependent"
    )


ROUND7_STAGED_QUERIES["dq05_functional_dependencies"] = (
    dq05_functional_dependencies
)
ROUND7_STAGED_ORACLE["dq05_functional_dependencies"] = _dq05_oracle_sql()


# ---------------------------------------------------------------------------
# Round-11 staging, wave 72: es20 covariance power-iteration step.
# ---------------------------------------------------------------------------


def es20_power_iteration_step(spark: SparkSession, sf: str) -> DataFrame:
    """One exact power-iteration step toward the embedding covariance's
    top eigenvector — the kernel under PCA whitening, top-PC drift
    audits, and anisotropy checks (Mu & Viswanath 2018's all-but-the-
    top observation: contextual/static embeddings concentrate mass in
    a few directions; this measures the dominant one). Computed by
    MOMENT CLOSURE, never a d×d materialization: u = C·v0 expands to
    (1/n)Σ x·(xᵀv0) − μ·(μᵀv0), so the whole step is two LINEAR
    n·d passes (per-row dot, then per-dimension sums) and the d-row
    tail — at 100 TB the d² covariance never exists anywhere, which is
    the only way this scales. Output: per dimension the population
    mean, the normalized step v1 = u/‖u‖, plus the eigenvalue proxy
    ‖u‖ (exact for a converged v0; here the certified first step from
    the fixed deterministic start).

    Determinism: v0 = ±1/8 alternating (exact powers of two — x·v0 is
    ONE exact double product), per-row dots and per-dim sums ride
    DECIMAL(25,12) casts (the es09 discipline: order-free exact sums);
    the bounded d-row tail rounds each transcendental/product once
    (the en01 rule) with operand order mirrored textually in the
    oracle."""
    d12 = "CAST({} AS DECIMAL(25,12))"
    pos = (
        load(spark, sf, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("dim", "__xf"))
        .select(
            "vec_id",
            "dim",
            F.col("__xf").cast("double").alias("__x"),
            F.when(F.col("dim") % 2 == 0, F.lit(0.125))
            .otherwise(F.lit(-0.125))
            .alias("__v0"),
        )
    )
    dots = pos.groupBy("vec_id").agg(
        F.sum(F.expr(d12.format("__x * __v0"))).alias("__dot")
    )
    agg = (
        pos.join(dots, "vec_id")
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.expr(d12.format("__x"))).alias("__mu_s"),
            F.sum(
                F.expr(d12.format("__x * CAST(__dot AS DOUBLE)"))
            ).alias("__s"),
        )
    )
    n = F.col("n_vecs").cast("double")
    per = agg.select(
        "dim",
        "n_vecs",
        (F.col("__mu_s").cast("double") / n).alias("__mu"),
        (F.col("__s").cast("double") / n).alias("__sn"),
        F.when(F.col("dim") % 2 == 0, F.lit(0.125))
        .otherwise(F.lit(-0.125))
        .alias("__v0"),
    )
    # bounded d-row tail: μᵀv0, the centered step u, its norm, v1
    m0 = per.agg(
        F.sum(
            F.round(F.col("__mu") * F.col("__v0"), 12).cast(
                "decimal(20,12)"
            )
        )
        .cast("double")
        .alias("__m0")
    )
    stepped = per.crossJoin(F.broadcast(m0)).withColumn(
        "__u", F.col("__sn") - F.col("__mu") * F.col("__m0")
    )
    nrm = stepped.agg(
        F.sqrt(
            F.sum(
                F.round(F.col("__u") * F.col("__u"), 12).cast(
                    "decimal(20,12)"
                )
            ).cast("double")
        ).alias("__nrm")
    )
    return (
        stepped.crossJoin(F.broadcast(nrm))
        .select(
            "dim",
            "n_vecs",
            F.round("__mu", 8).alias("mean"),
            F.round(F.col("__u") / F.col("__nrm"), 6).alias("v1"),
            F.round("__nrm", 6).alias("lambda_proxy"),
        )
        .orderBy("dim")
    )


_ES20_ORACLE = """
WITH pos AS (
  SELECT vec_id, CAST(d - 1 AS INT) AS dim,
         CAST(embedding[d] AS DOUBLE) AS x,
         CASE WHEN (d - 1) % 2 = 0 THEN 0.125 ELSE -0.125 END AS v0
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d)
), dots AS (
  SELECT vec_id, SUM(CAST(x * v0 AS DECIMAL(25,12))) AS dot
  FROM pos GROUP BY vec_id
), agg AS (
  SELECT dim,
         CAST(COUNT(*) AS BIGINT) AS n_vecs,
         SUM(CAST(x AS DECIMAL(25,12))) AS mu_s,
         SUM(CAST(x * CAST(dot AS DOUBLE) AS DECIMAL(25,12))) AS s
  FROM pos JOIN dots USING (vec_id)
  GROUP BY dim
), per AS (
  SELECT dim, n_vecs,
         CAST(mu_s AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS mu,
         CAST(s AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS sn,
         CASE WHEN dim % 2 = 0 THEN 0.125 ELSE -0.125 END AS v0
  FROM agg
), m0 AS (
  SELECT CAST(SUM(CAST(ROUND(mu * v0, 12) AS DECIMAL(20,12))) AS DOUBLE)
    AS m0
  FROM per
), stepped AS (
  SELECT dim, n_vecs, mu, sn - mu * m0 AS u
  FROM per CROSS JOIN m0
), nrm AS (
  SELECT sqrt(CAST(SUM(CAST(ROUND(u * u, 12) AS DECIMAL(20,12)))
              AS DOUBLE)) AS nrm
  FROM stepped
)
SELECT dim, n_vecs,
       ROUND(mu, 8) AS mean,
       ROUND(u / nrm, 6) AS v1,
       ROUND(nrm, 6) AS lambda_proxy
FROM stepped CROSS JOIN nrm
ORDER BY dim
"""

ROUND7_STAGED_QUERIES["es20_power_iteration_step"] = (
    es20_power_iteration_step
)
ROUND7_STAGED_ORACLE["es20_power_iteration_step"] = _ES20_ORACLE


# ---------------------------------------------------------------------------
# Round-11 staging, wave 73: gr09 k-core summary.
# ---------------------------------------------------------------------------

#: gr09's core order: k = 3 keeps the kernel strictly denser than the
#: triangle-bearing fringe (2-core keeps every cycle).
GR09_K = 3

#: Unroll depth of the oracle's peeling. The Spark side iterates to the
#: exact fixpoint and raises beyond 50 rounds; the oracle applies this
#: many rounds unconditionally — once the fixpoint is reached every
#: further round is a no-op, so the twins agree whenever convergence
#: happens within the unroll (the invariant test pins the measured
#: round count well under it).
GR09_ORACLE_ROUNDS = 16


def gr09_kcore_summary(spark: SparkSession, sf: str) -> DataFrame:
    """k-core census of the part co-purchase graph: peel to the maximal
    subgraph of minimum degree >= k and report its size, edge count,
    degree profile, and exact membership digests — the density filter
    that finds the graph's cohesive kernel (the bundles-of-bundles in a
    co-purchase graph; the template farms in a near-dup graph) where
    component analysis (gr03/gr07) only finds reachability and the
    triangle census (gr08) only measures closure. Completes the graph
    family with the second ITERATIVE fixpoint kernel after connected
    components.

    Scale: see operators/graph.kcore — per round one vertex-keyed
    double semi-join + degree aggregate, lineage-truncated; exact
    integers end to end (the one ratio rounds once). The unique-
    fixpoint property is what makes the bounded unrolled SQL twin an
    exact oracle."""
    from ..operators.graph import kcore

    edges = _gr05_copurchase_edges(spark, sf).localCheckpoint()
    core, rounds = kcore(spark, edges, GR09_K)
    # The oracle unrolls exactly GR09_ORACLE_ROUNDS peeling rounds while
    # the engine iterates to the true fixpoint: a graph that converges
    # slower than the unroll would silently diverge as a generic hash
    # mismatch, so fail loudly here instead (r10 ADVICE item 2).
    if rounds > GR09_ORACLE_ROUNDS:
        raise RuntimeError(
            f"gr09: k-core peeling took {rounds} rounds but the DuckDB "
            f"oracle only unrolls GR09_ORACLE_ROUNDS={GR09_ORACLE_ROUNDS}; "
            "raise the unroll depth before certifying this graph"
        )
    und = edges.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).union(edges.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    core_edges = (
        und.join(core.select("u"), "u")
        .join(core.select(F.col("u").alias("v")), "v")
        .agg((F.count(F.lit(1)) / 2).cast("bigint").alias("n_core_edges"))
    )
    summary = core.agg(
        F.lit(GR09_K).cast("int").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_core_nodes"),
        F.sum("u").cast("bigint").alias("node_id_sum"),
        F.sum("core_degree").cast("bigint").alias("degree_sum"),
        F.max("core_degree").cast("bigint").alias("max_core_degree"),
    )
    return summary.crossJoin(F.broadcast(core_edges)).select(
        "k",
        "n_core_nodes",
        "n_core_edges",
        "node_id_sum",
        "degree_sum",
        "max_core_degree",
        F.round(
            F.col("degree_sum").cast("double") / F.col("n_core_nodes"), 4
        ).alias("avg_core_degree"),
    )


def _gr09_oracle_sql() -> str:
    k, rounds = GR09_K, GR09_ORACLE_ROUNDS
    # und is referenced 2x per unrolled round: force one materialization
    # so DuckDB does not re-open the parquet scan per reference (an
    # unmaterialized CTE inlines; ~35 inlined scans exhausts the fd
    # limit before it exhausts the optimizer)
    ctes = [
        "li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,"
        " l_partkey AS pk FROM lineitem)",
        "good AS MATERIALIZED (SELECT a.pk AS id_a, b.pk AS id_b"
        " FROM li a JOIN li b"
        " ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2"
        f" HAVING COUNT(*) >= {GR05_MIN_CO_ORDERS})",
        "und AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM good"
        " UNION ALL SELECT id_b AS u, id_a AS v FROM good)",
        "a0 AS MATERIALIZED (SELECT DISTINCT u FROM und)",
    ]
    # every per-round CTE is MATERIALIZED: d{r} references a{r-1}
    # twice, so unmaterialized inlining would expand the chain 2^rounds
    # times before the optimizer ever runs
    for r in range(1, rounds + 1):
        prev = f"a{r - 1}"
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT n.u, COUNT(*) AS c FROM und n"
            f" JOIN {prev} xa ON xa.u = n.u"
            f" JOIN {prev} xb ON xb.u = n.v GROUP BY n.u)"
        )
        ctes.append(
            f"a{r} AS MATERIALIZED (SELECT u FROM d{r} WHERE c >= {k})"
        )
    last_d = f"d{rounds}"
    ctes.append(
        f"core AS MATERIALIZED (SELECT u, CAST(c AS BIGINT) AS core_degree"
        f" FROM {last_d} WHERE c >= {k})"
    )
    ctes.append(
        "ce AS MATERIALIZED (SELECT CAST(COUNT(*) / 2 AS BIGINT) AS n_core_edges"
        " FROM und n JOIN core xa ON xa.u = n.u"
        " JOIN core xb ON xb.u = n.v)"
    )
    # n_core_edges comes from a scalar subquery, NOT a CROSS JOIN with
    # core: when the core is empty the join has zero rows and
    # MAX(ce.n_core_edges) aggregates to NULL while the Spark side's
    # crossJoin of two 1-row aggregates yields 0 — the gr10 r11-ADVICE
    # empty-truss class, found by tests/test_degenerate_inputs.py
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT CAST({k} AS INT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_core_nodes,
       (SELECT CAST(n_core_edges AS BIGINT) FROM ce) AS n_core_edges,
       CAST(SUM(u) AS BIGINT) AS node_id_sum,
       CAST(SUM(core_degree) AS BIGINT) AS degree_sum,
       CAST(MAX(core_degree) AS BIGINT) AS max_core_degree,
       ROUND(CAST(SUM(core_degree) AS DOUBLE) / COUNT(*), 4)
         AS avg_core_degree
FROM core"""
    )


ROUND7_STAGED_QUERIES["gr09_kcore_summary"] = gr09_kcore_summary
ROUND7_STAGED_ORACLE["gr09_kcore_summary"] = _gr09_oracle_sql()


# ---------------------------------------------------------------------------
# Round-11 staging, wave 74: ss09 greedy k-center coreset seeding.
# ---------------------------------------------------------------------------

#: ss09's coreset size (Gonzalez greedy rounds). 8 keeps the unrolled
#: oracle readable; the 2-approximation guarantee holds for any k.
SS09_CENTERS = 8


def _ss09_d2(a, b) -> "F.Column":
    """Squared L2 distance as the same sequential double fold the
    es-family's dot/norm use (similarity.dot parity with DuckDB's
    list_sum(list_transform(...))), rounded once to 4 dp so the
    running-min and argmax comparisons are on identical values in both
    engines."""
    return F.round(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        4,
    )


def ss09_kcenter_coreset(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy k-center (Gonzalez 1985) coreset seeding over the
    embedding table: start from the lowest id, repeatedly add the point
    FARTHEST from the chosen set, and report each round's center plus
    the coverage radius after adding it — the classic 2-approximation
    to the k-center objective, and the selection kernel under coreset
    construction, active-learning seeding (Sener & Savarese 2018), and
    diverse eval-set carve-outs (ss07/ss08 sample by hash/weight; this
    selects for GEOMETRIC COVERAGE). The monotone radius column IS the
    data's coverage curve: where it flattens is the intrinsic diversity
    budget.

    Scale: each of the k rounds is one row-local distance column
    against the newest center (a 64-float literal — driver metadata,
    the quantile-operator discipline), one running elementwise min, and
    one bounded argmax; k is a constant, so the whole selection is k
    linear passes — never a pairwise matrix. Determinism: distances are
    the es-family's sequential double fold rounded once to 4 dp before
    ANY comparison; argmax ties break by vec_id; the per-round state
    frame is checkpointed so round r's plan does not replay rounds
    0..r-1."""
    emb = load(spark, sf, "embeddings").select("vec_id", "embedding")
    first = emb.orderBy("vec_id").limit(1).collect()[0]
    centers = [(0, first["vec_id"])]
    center_vec = F.array(*[F.lit(float(x)) for x in first["embedding"]])
    state = emb.select(
        "vec_id",
        "embedding",
        _ss09_d2(F.col("embedding"), center_vec).alias("__md"),
    ).localCheckpoint()
    radii = [state.agg(F.max("__md")).collect()[0][0]]
    for rnd in range(1, SS09_CENTERS):
        far = (
            state.orderBy(F.desc("__md"), "vec_id").limit(1).collect()[0]
        )
        centers.append((rnd, far["vec_id"]))
        cvec = F.array(*[F.lit(float(x)) for x in far["embedding"]])
        state = state.select(
            "vec_id",
            "embedding",
            F.least(
                F.col("__md"), _ss09_d2(F.col("embedding"), cvec)
            ).alias("__md"),
        ).localCheckpoint()
        radii.append(state.agg(F.max("__md")).collect()[0][0])
    return spark.createDataFrame(
        [
            (rnd, int(cid), float(radius))
            for (rnd, cid), radius in zip(centers, radii)
        ],
        "round int, center_id bigint, coverage_radius double",
    ).orderBy("round")


_SS09_D2_SQL = (
    "ROUND(list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    " * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))), 4)"
)


def _ss09_oracle_sql() -> str:
    # unrolled greedy rounds; every CTE MATERIALIZED (the gr09 lesson:
    # m{r} references m{r-1} and the chain would otherwise inline
    # exponentially)
    d2 = _SS09_D2_SQL
    ctes = [
        "p AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings)",
        "c0 AS MATERIALIZED (SELECT vec_id AS cid, embedding AS ce"
        " FROM p ORDER BY vec_id LIMIT 1)",
        "m0 AS MATERIALIZED (SELECT p.vec_id, p.embedding, "
        + d2.format(a="p.embedding", b="c0.ce")
        + " AS md FROM p CROSS JOIN c0)",
    ]
    for r in range(1, SS09_CENTERS):
        prev = f"m{r - 1}"
        ctes.append(
            f"c{r} AS MATERIALIZED (SELECT vec_id AS cid, embedding AS ce"
            f" FROM {prev} ORDER BY md DESC, vec_id LIMIT 1)"
        )
        ctes.append(
            f"m{r} AS MATERIALIZED (SELECT m.vec_id, m.embedding,"
            f" LEAST(m.md, "
            + d2.format(a="m.embedding", b=f"c{r}.ce")
            + f") AS md FROM {prev} m CROSS JOIN c{r})"
        )
    rows = " UNION ALL ".join(
        f"SELECT {r} AS round, (SELECT cid FROM c{r}) AS center_id,"
        f" (SELECT MAX(md) FROM m{r}) AS coverage_radius"
        for r in range(SS09_CENTERS)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(round AS INT) AS round,"
        f" CAST(center_id AS BIGINT) AS center_id,"
        f" CAST(coverage_radius AS DOUBLE) AS coverage_radius"
        f" FROM ({rows}) ORDER BY round"
    )


ROUND7_STAGED_QUERIES["ss09_kcenter_coreset"] = ss09_kcenter_coreset
ROUND7_STAGED_ORACLE["ss09_kcenter_coreset"] = _ss09_oracle_sql()


# ---------------------------------------------------------------------------
# Round-11 staging, wave 75: ij01 interval-overlap attribution join.
# ---------------------------------------------------------------------------

#: ij01's promo calendar: six fixed two-week windows spread across the
#: TPC-H date range. A literal bounded dimension — the standard shape
#: for interval×interval joins where one side is a calendar (promo
#: attribution, SLA windows, maintenance blackouts).
IJ01_PROMO_WINDOWS = (
    ("promo_1993_spring", "1993-03-01", "1993-03-14"),
    ("promo_1994_summer", "1994-07-04", "1994-07-17"),
    ("promo_1995_fall", "1995-10-01", "1995-10-14"),
    ("promo_1996_winter", "1996-12-15", "1996-12-28"),
    ("promo_1997_spring", "1997-04-01", "1997-04-14"),
    ("promo_1998_summer", "1998-06-15", "1998-06-28"),
)


def ij01_interval_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Interval×interval overlap join with PRORATED attribution: each
    order's fulfillment interval (order date → last line shipment)
    overlap-joined against a bounded promo calendar, crediting each
    window with revenue × overlapDays / intervalDays — the marketing-
    attribution / SLA-accounting kernel that point-in-time joins
    (aj01–aj03, scd02) and point-in-interval joins (rj01) don't cover:
    BOTH sides are genuine intervals and the measure is split by the
    overlap, so an order straddling a window boundary contributes
    exactly its covered fraction.

    Scale: the order interval is one co-keyed fact rollup (max ship
    date per order); the join side is a literal |windows|-row broadcast
    (when neither side is bounded, the same semantics decompose into
    the bin-bucketed equi-join rj01's range_join_count uses — this
    certifies the overlap/proration arithmetic on the calendar shape).
    Overlap lengths are exact integer day arithmetic
    (max(0, min(e1,e2) − max(s1,s2) + 1)); each order's prorated credit
    is rounded once to 6 dp, DECIMAL-summed (the en01 rule), and the
    window totals round once more."""
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    span = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("__ship_end")
    )
    ointv = orders.join(
        span, orders.o_orderkey == span.l_orderkey
    ).select(
        "o_orderkey",
        dec("o_totalprice").alias("__price"),
        F.col("o_orderdate").cast("date").alias("__s"),
        F.col("__ship_end").cast("date").alias("__e"),
    )
    promos = spark.createDataFrame(
        list(IJ01_PROMO_WINDOWS), "promo_id string, ps string, pe string"
    ).select(
        "promo_id",
        F.col("ps").cast("date").alias("__ps"),
        F.col("pe").cast("date").alias("__pe"),
    )
    j = ointv.crossJoin(F.broadcast(promos))
    overlap = F.greatest(
        F.lit(0),
        F.datediff(
            F.least(F.col("__e"), F.col("__pe")),
            F.greatest(F.col("__s"), F.col("__ps")),
        )
        + F.lit(1),
    )
    dur = F.datediff(F.col("__e"), F.col("__s")) + F.lit(1)
    credited = (
        j.withColumn("__ov", overlap)
        .filter(F.col("__ov") > 0)
        .withColumn(
            "__credit",
            F.round(
                F.col("__price").cast("double")
                * F.col("__ov")
                / (F.datediff(F.col("__e"), F.col("__s")) + F.lit(1)),
                6,
            ).cast("decimal(20,6)"),
        )
        .withColumn("__full", (F.col("__ov") == dur).cast("bigint"))
    )
    return (
        credited.groupBy("promo_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_overlapping_orders"),
            F.sum("__full").cast("bigint").alias("n_fully_inside"),
            F.round(F.sum("__credit").cast("double"), 2).alias(
                "prorated_revenue"
            ),
        )
        .orderBy("promo_id")
    )


def _ij01_oracle_sql() -> str:
    promo_rows = " UNION ALL ".join(
        f"SELECT '{pid}' AS promo_id, DATE '{ps}' AS ps, DATE '{pe}' AS pe"
        for pid, ps, pe in IJ01_PROMO_WINDOWS
    )
    return f"""
WITH span AS (
  SELECT l_orderkey, MAX(l_shipdate) AS ship_end
  FROM lineitem GROUP BY l_orderkey
), ointv AS (
  SELECT o.o_orderkey,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS price,
         CAST(o.o_orderdate AS DATE) AS s,
         CAST(sp.ship_end AS DATE) AS e
  FROM orders o JOIN span sp ON o.o_orderkey = sp.l_orderkey
), promos AS ({promo_rows}), j AS (
  SELECT promo_id,
         GREATEST(0, DATEDIFF('day', GREATEST(s, ps), LEAST(e, pe)) + 1)
           AS ov,
         DATEDIFF('day', s, e) + 1 AS dur,
         price
  FROM ointv CROSS JOIN promos
), credited AS (
  SELECT promo_id, ov, dur,
         CAST(ROUND(CAST(price AS DOUBLE) * ov
                    / (dur), 6) AS DECIMAL(20,6)) AS credit
  FROM j WHERE ov > 0
)
SELECT promo_id,
       CAST(COUNT(*) AS BIGINT) AS n_overlapping_orders,
       CAST(SUM(CASE WHEN ov = dur THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fully_inside,
       ROUND(CAST(SUM(credit) AS DOUBLE), 2) AS prorated_revenue
FROM credited GROUP BY promo_id ORDER BY promo_id
"""


ROUND7_STAGED_QUERIES["ij01_interval_attribution"] = (
    ij01_interval_attribution
)
ROUND7_STAGED_ORACLE["ij01_interval_attribution"] = _ij01_oracle_sql()


# ---------------------------------------------------------------------------
# Round-11 staging, wave 76: hll04 cross-source overlap by sketch
# inclusion-exclusion.
# ---------------------------------------------------------------------------


def _hll_estimate_cols(occupied, occ_sum):
    """HLL estimate from (occupied, integer register digest) — the
    hll02 formula verbatim (alpha_m bias constant, exact-integer
    harmonic denominator, linear-counting small-range correction),
    shared so hll04's three estimates per pair cannot drift from the
    certified single-set form."""
    rest_zero_rho = HLL_REST_BITS + 1
    two53 = float(1 << rest_zero_rho)
    alpha = F.lit(0.7213) / (
        F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M))
    )
    digest = occ_sum + (F.lit(HLL_M) - occupied) * F.lit(
        1 << rest_zero_rho
    )
    raw = (
        alpha
        * F.lit(float(HLL_M) * float(HLL_M))
        * F.lit(two53)
        / digest.cast("double")
    )
    lc = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / (F.lit(HLL_M) - occupied).cast("double")
    )
    return F.round(
        F.when(
            (raw <= F.lit(2.5 * HLL_M)) & (occupied < F.lit(HLL_M)), lc
        ).otherwise(raw),
        2,
    )


def hll04_cross_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-corpus overlap planning by SKETCH ALGEBRA: per source pair,
    estimate the shared distinct-document count as |A| + |B| − |A∪B|
    where all three cardinalities come from HLL registers and the union
    sketch is the pairwise register MAX — the inclusion-exclusion
    estimator every large-scale dedup/contamination plan runs BEFORE
    paying for an exact cross-corpus join (hll02 certified the single-
    set sketch; hll03 certified merge = union; this is the algebra the
    merge exists for). The exact overlap rides along as the
    calibration column, so the output is simultaneously the planning
    table and the estimator's error report.

    Scale: registers are one (source, bucket)-keyed MAX aggregate —
    map-side-combinable, at most |sources|·m shuffle rows regardless of
    corpus size; every pairwise union lives on that bounded register
    table (a 10-pair broadcast roster join). The exact twin costs one
    distinct + self-join on the 60-bit text hash — the expensive thing
    the estimator replaces at 100 TB, kept here as ground truth.
    Determinism: the hll02 discipline end-to-end (exact-integer
    harmonic digests, one rounded estimate per set, the overlap
    computed from the ROUNDED estimates in both engines)."""
    rest_zero_rho = HLL_REST_BITS + 1
    docs = load(spark, sf, "documents").select(
        "source", dd.hash60(F.col("text")).alias("__h")
    )
    hashed = docs.select(
        "source",
        (F.col("__h") % HLL_M).alias("__b"),
        F.expr(f"__h div {HLL_M}").alias("__rest"),
    ).select(
        "source",
        "__b",
        F.expr(
            f"CASE WHEN __rest = 0 THEN {rest_zero_rho} "
            f"ELSE {HLL_REST_BITS} - length(bin(__rest)) + 1 END"
        ).alias("__rho"),
    )
    regs = hashed.groupBy("source", "__b").agg(
        F.max("__rho").alias("__mx")
    )
    occ_term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {rest_zero_rho} - __mx)"
    )
    per = regs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("__occ"),
        F.sum(occ_term).cast("bigint").alias("__osum"),
    )
    srcs = per.select("source")
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(srcs.select(F.col("source").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    # union registers per pair: both sides' registers keyed to the pair,
    # pairwise MAX per bucket — all on the bounded register table
    ra = pairs.join(
        regs, pairs.source_a == regs.source
    ).select("source_a", "source_b", "__b", "__mx")
    rb = pairs.join(
        regs, pairs.source_b == regs.source
    ).select("source_a", "source_b", "__b", "__mx")
    union_regs = (
        ra.unionAll(rb)
        .groupBy("source_a", "source_b", "__b")
        .agg(F.max("__mx").alias("__mx"))
    )
    per_union = union_regs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__occ_u"),
        F.sum(occ_term).cast("bigint").alias("__osum_u"),
    )
    dh = docs.distinct()
    ex = (
        dh.select(F.col("source").alias("source_a"), "__h")
        .join(
            dh.select(F.col("source").alias("source_b"), "__h"), "__h"
        )
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_overlap"))
    )
    pa = per.select(
        F.col("source").alias("source_a"),
        F.col("__occ").alias("__occ_a"),
        F.col("__osum").alias("__osum_a"),
    )
    pb = per.select(
        F.col("source").alias("source_b"),
        F.col("__occ").alias("__occ_b"),
        F.col("__osum").alias("__osum_b"),
    )
    est_a = _hll_estimate_cols(F.col("__occ_a"), F.col("__osum_a"))
    est_b = _hll_estimate_cols(F.col("__occ_b"), F.col("__osum_b"))
    est_u = _hll_estimate_cols(F.col("__occ_u"), F.col("__osum_u"))
    return (
        per_union.join(pa, "source_a")
        .join(pb, "source_b")
        .join(ex, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.coalesce(F.col("exact_overlap"), F.lit(0))
            .cast("bigint")
            .alias("exact_overlap"),
            est_a.alias("est_a"),
            est_b.alias("est_b"),
            est_u.alias("est_union"),
        )
        .withColumn(
            "est_overlap",
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.col("est_a") + F.col("est_b") - F.col("est_union"),
                ),
                2,
            ),
        )
        .orderBy("source_a", "source_b")
    )


def _hll04_oracle_sql() -> str:
    rest_zero_rho = HLL_REST_BITS + 1
    h = _H60.format(x="text")
    two53 = 1 << rest_zero_rho
    est = (
        "ROUND(CASE WHEN (0.7213 / (1.0 + 1.079 / {m}.0)) * {m}.0 * {m}.0"
        " * {t}.0 / CAST({{d}} AS DOUBLE) <= 2.5 * {m}"
        " AND {{o}} < {m}"
        " THEN {m}.0 * ln({m}.0 / CAST({m} - {{o}} AS DOUBLE))"
        " ELSE (0.7213 / (1.0 + 1.079 / {m}.0)) * {m}.0 * {m}.0 * {t}.0"
        " / CAST({{d}} AS DOUBLE) END, 2)"
    ).format(m=HLL_M, t=two53)

    def digest(osum, occ):
        return (
            f"({osum} + ({HLL_M} - {occ}) * CAST({two53} AS BIGINT))"
        )

    return f"""
WITH hashed AS (
  SELECT source, ({h}) % {HLL_M} AS b, ({h}) // {HLL_M} AS rest
  FROM documents
), ranked AS (
  SELECT source, b,
         MAX(CASE WHEN rest = 0 THEN {rest_zero_rho}
                  ELSE {HLL_REST_BITS} - length(bin(rest)) + 1 END) AS mx
  FROM hashed GROUP BY source, b
), per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS occ,
         CAST(SUM(CAST(1 AS BIGINT) << ({rest_zero_rho} - mx)) AS BIGINT)
           AS osum
  FROM ranked GROUP BY source
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM per a CROSS JOIN per b WHERE a.source < b.source
), union_regs AS (
  SELECT p.source_a, p.source_b, r.b, MAX(r.mx) AS mx
  FROM pairs p JOIN ranked r
    ON r.source = p.source_a OR r.source = p.source_b
  GROUP BY p.source_a, p.source_b, r.b
), per_union AS (
  SELECT source_a, source_b,
         CAST(COUNT(*) AS BIGINT) AS occ_u,
         CAST(SUM(CAST(1 AS BIGINT) << ({rest_zero_rho} - mx)) AS BIGINT)
           AS osum_u
  FROM union_regs GROUP BY source_a, source_b
), dh AS (
  SELECT DISTINCT source, ({h}) AS hh FROM documents
), ex AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS exact_overlap
  FROM dh a JOIN dh b ON a.hh = b.hh AND a.source < b.source
  GROUP BY 1, 2
), scored AS (
  SELECT u.source_a, u.source_b,
         COALESCE(e.exact_overlap, 0) AS exact_overlap,
         {est.format(d=digest('pa.osum', 'pa.occ'), o='pa.occ')} AS est_a,
         {est.format(d=digest('pb.osum', 'pb.occ'), o='pb.occ')} AS est_b,
         {est.format(d=digest('u.osum_u', 'u.occ_u'), o='u.occ_u')}
           AS est_union
  FROM per_union u
  JOIN per pa ON pa.source = u.source_a
  JOIN per pb ON pb.source = u.source_b
  LEFT JOIN ex e
    ON e.source_a = u.source_a AND e.source_b = u.source_b
)
SELECT source_a, source_b, CAST(exact_overlap AS BIGINT) AS exact_overlap,
       est_a, est_b, est_union,
       ROUND(GREATEST(0.0, est_a + est_b - est_union), 2) AS est_overlap
FROM scored ORDER BY source_a, source_b
"""


ROUND7_STAGED_QUERIES["hll04_cross_source_overlap"] = (
    hll04_cross_source_overlap
)
ROUND7_STAGED_ORACLE["hll04_cross_source_overlap"] = _hll04_oracle_sql()


# ---------------------------------------------------------------------------
# Round-11 promotion: the 14 wave-69–76 queries staged during round 10
# graduate into the live registry (r10 verdict task 1). Order = staging
# wave order (69 -> 76); __spark_entry__._window_order consumes this as
# the bucket-2 (never-certified) judgment order, so the driver's next
# 50-slot window certifies these 14 first and fills the remaining 36
# slots from the r5-era refresh-queue head.
# ---------------------------------------------------------------------------

ROUND11_PROMOTED: list[str] = [
    # wave 69
    "mix01_temperature_sweep",
    "tx25_lexical_diversity",
    "gr08_triangle_census",
    "ss08_weighted_sample",
    "st20_streaming_bottomk_sample",
    # wave 70
    "qf06_gopher_repetition",
    "ts05_changepoint_scan",
    # wave 71
    "pv02_status_unpivot",
    "dq05_functional_dependencies",
    # wave 72
    "es20_power_iteration_step",
    # wave 73
    "gr09_kcore_summary",
    # wave 74
    "ss09_kcenter_coreset",
    # wave 75
    "ij01_interval_attribution",
    # wave 76
    "hll04_cross_source_overlap",
]

for _name in ROUND11_PROMOTED:
    EXTENSION_QUERIES[_name] = ROUND7_STAGED_QUERIES.pop(_name)
    EXTENSION_ORACLE[_name] = ROUND7_STAGED_ORACLE.pop(_name)
del _name


# ---------------------------------------------------------------------------
# Round-12 staging, wave 77: gr10 k-truss summary, rs02 Theil-Sen trend.
# ---------------------------------------------------------------------------

#: gr10's truss order: k = 3 keeps exactly the edges that close at
#: least one triangle among survivors — the weakest truss that still
#: separates clique-like structure from trees/chains/stars.
GR10_K = 3

#: Unroll depth of the oracle's edge peeling. The Spark side iterates
#: to the exact fixpoint (up to 50 rounds) and ASSERTS the measured
#: round count fits inside this bound (the gr09 lesson, r10 ADVICE
#: item 2, applied from birth): slow convergence fails loudly instead
#: of surfacing as a generic oracle hash mismatch. Measured fixpoints:
#: 2 rounds at sf0.001/sf0.01/sf0.1.
GR10_ORACLE_ROUNDS = 6


def gr10_ktruss_summary(spark: SparkSession, sf: str) -> DataFrame:
    """k-truss census of the part co-purchase graph: peel to the
    maximal subgraph where every EDGE closes >= k-2 triangles among
    survivors and report its size, node count, support profile, and
    exact membership digests. The edge-level complement of gr09's
    vertex-level k-core: a hub's spoke edges survive any k-core (the
    hub has degree) but close no triangles, so the truss is the
    stricter cohesion filter — in a co-purchase graph it isolates the
    bundle cliques from the popular-product stars; in a near-dup graph
    it separates template farms from chance collisions. Third
    iterative fixpoint kernel after connected components and k-core.

    Scale: see operators/graph.ktruss — per round one degree-ordered
    triangle enumeration (O(|E|^1.5) total, hub-skew-proof) + one
    edge-keyed support aggregate, lineage-truncated; exact integers
    end to end (the one ratio rounds once). The unique-fixpoint
    property makes the bounded unrolled SQL twin an exact oracle."""
    from ..operators.graph import ktruss

    edges = _gr05_copurchase_edges(spark, sf).localCheckpoint()
    truss, rounds = ktruss(spark, edges, GR10_K)
    if rounds > GR10_ORACLE_ROUNDS:
        raise RuntimeError(
            f"gr10: k-truss peeling took {rounds} rounds but the DuckDB "
            f"oracle only unrolls GR10_ORACLE_ROUNDS={GR10_ORACLE_ROUNDS}; "
            "raise the unroll depth before certifying this graph"
        )
    nodes = (
        truss.select(F.col("a").alias("n"))
        .union(truss.select(F.col("b").alias("n")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_truss_nodes"))
    )
    summary = truss.agg(
        F.lit(GR10_K).cast("int").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_truss_edges"),
        F.sum("support").cast("bigint").alias("support_sum"),
        F.max("support").cast("bigint").alias("max_support"),
        F.sum(F.col("a") + F.col("b")).cast("bigint").alias("edge_id_sum"),
    )
    return summary.crossJoin(F.broadcast(nodes)).select(
        "k",
        "n_truss_edges",
        "n_truss_nodes",
        "support_sum",
        "max_support",
        "edge_id_sum",
        F.round(
            F.col("support_sum").cast("double") / F.col("n_truss_edges"), 4
        ).alias("avg_support"),
    )


def _gr10_oracle_sql() -> str:
    k, rounds = GR10_K, GR10_ORACLE_ROUNDS
    # every per-round CTE is MATERIALIZED: u{r} references e{r} twice
    # and s{r} references u{r-1} twice, so unmaterialized inlining
    # would expand the chain exponentially before the optimizer runs
    # (the gr09 lesson)
    ctes = [
        "li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,"
        " l_partkey AS pk FROM lineitem)",
        "e0 AS MATERIALIZED (SELECT a.pk AS a, b.pk AS b"
        " FROM li a JOIN li b"
        " ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2"
        f" HAVING COUNT(*) >= {GR05_MIN_CO_ORDERS})",
    ]
    for r in range(1, rounds + 1):
        prev = f"e{r - 1}"
        ctes.append(
            f"u{r - 1} AS MATERIALIZED (SELECT a AS u, b AS v FROM {prev}"
            f" UNION ALL SELECT b AS u, a AS v FROM {prev})"
        )
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT e.a, e.b, COUNT(*) AS c"
            f" FROM {prev} e JOIN u{r - 1} x ON x.u = e.a"
            f" JOIN u{r - 1} y ON y.u = e.b AND y.v = x.v"
            " GROUP BY e.a, e.b)"
        )
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT a, b FROM s{r}"
            f" WHERE c >= {k - 2})"
        )
    ctes.append(
        f"truss AS MATERIALIZED (SELECT a, b, CAST(c AS BIGINT) AS support"
        f" FROM s{rounds} WHERE c >= {k - 2})"
    )
    ctes.append(
        "tn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT)"
        " AS n_truss_nodes FROM"
        " (SELECT a AS n FROM truss UNION SELECT b FROM truss))"
    )
    # n_truss_nodes comes from a scalar subquery, NOT a CROSS JOIN with
    # truss: when the truss is empty the join would have zero rows and
    # MAX(tn.n_truss_nodes) would aggregate to NULL, while the Spark
    # side's crossJoin of two 1-row aggregates yields 0 (r11 ADVICE
    # item 2). The scalar subquery is evaluated independently of the
    # truss row count, so both engines report 0 on an empty truss.
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT CAST({k} AS INT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_truss_edges,
       (SELECT CAST(n_truss_nodes AS BIGINT) FROM tn) AS n_truss_nodes,
       CAST(SUM(support) AS BIGINT) AS support_sum,
       CAST(MAX(support) AS BIGINT) AS max_support,
       CAST(SUM(a + b) AS BIGINT) AS edge_id_sum,
       ROUND(CAST(SUM(support) AS DOUBLE) / COUNT(*), 4) AS avg_support
FROM truss"""
    )


ROUND7_STAGED_QUERIES["gr10_ktruss_summary"] = gr10_ktruss_summary
ROUND7_STAGED_ORACLE["gr10_ktruss_summary"] = _gr10_oracle_sql()


#: rs02's slope rounding (10 dp before ranking, the en01 rule: round
#: transcendental-free but division-bearing doubles ONCE at a fixed
#: grain so both engines rank the identical multiset).
RS02_SLOPE_ND = 10

#: Day-index epoch for rs02 — any fixed date before the data works;
#: the generator's order dates start 1995-01-01.
RS02_EPOCH = "1994-12-31"


def rs02_theil_sen_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Theil-Sen robust trend of daily order revenue — the median of
    all pairwise day-to-day slopes — next to the closed-form OLS slope
    on the same series (lr01's moment method): the robust/classical
    slope gap is the standard outlier-contamination diagnostic for a
    revenue series (a handful of mega-order days drag OLS but leave
    the pairwise-slope median untouched; breakdown point 29%).

    Scale: the fact table feeds ONE partial-aggregable daily rollup;
    everything pairwise lives on the CALENDAR-bounded day table
    (|days| ~ 2.4k regardless of row count, so the slope grid is
    ~2.9M rows at ANY scale factor — it grows with the date range,
    never the data). The median is selected by distributed EXACT rank
    selection (operators/quantile.exact_discrete_rank_values — range
    partition + O(P) bucket counts + sort only the buckets holding
    the two middle ranks), never a global sort of the grid and never
    a single-task ORDER BY window. Slopes are exact-DECIMAL revenue
    differences divided by integer day gaps, rounded once to 10 dp
    before ranking; OLS moments are exact DECIMAL/bigint sums cast to
    double at the end (the lr01 rule)."""
    from ..operators.quantile import exact_discrete_rank_values

    orders = load(spark, sf, "orders").select(
        F.datediff(
            F.to_date("o_orderdate"), F.lit(RS02_EPOCH).cast("date")
        )
        .cast("bigint")
        .alias("x"),
        dec("o_totalprice").alias("p"),
    )
    daily = orders.groupBy("x").agg(
        F.sum("p").alias("revd"),
        F.sum("p").cast("double").alias("rev"),
    )
    a = daily.select(F.col("x").alias("xa"), F.col("revd").alias("ra"))
    b = daily.select(F.col("x").alias("xb"), F.col("revd").alias("rb"))
    # try_divide, not /: the xa < xb join condition excludes every
    # zero-gap pair, but the selection operator's isNotNull filter is
    # a conjunct the optimizer may evaluate BEFORE the join condition
    # on a BNLJ pair — ANSI mode then raises DIVIDE_BY_ZERO on the
    # xa == xb diagonal. try_divide makes the expression total; the
    # NULL rows it would produce never survive the join anyway.
    # r14: the grid carries RAW slopes; the 10-dp HALF_UP round moves
    # to the <= 2 SELECTED order statistics. Legal because rounding is
    # monotone non-decreasing, so sorting commutes with it: the k-th
    # smallest rounded slope == round(k-th smallest raw slope) for
    # every k, rank SELECTION is positional (ties never change which
    # position is read), and n_pairs counts the same rows. Spark's
    # Round on double is BigDecimal-backed (~µs/row) — rounding the
    # 2.9M-row grid was ~0.9 s of pure per-row cost (measured noop:
    # rounded grid 1.60 s vs raw 0.71 s) for two values actually used.
    slopes = (
        a.join(b, F.col("xa") < F.col("xb"))
        .select(
            F.try_divide(
                (F.col("rb") - F.col("ra")).cast("double"),
                (F.col("xb") - F.col("xa")).cast("double"),
            ).alias("slope")
        )
    )
    # discrete median ranks: lo = (n+1) div 2, hi = (n+2) div 2 — one
    # value when n is odd, the two middle values when even; AVG of
    # their (identically-rounded) values is engine-portable, unlike
    # percentile interpolation whose lo + (hi-lo)·f vs (lo+hi)/2
    # formulations differ in the last ulp. Selected by the
    # range-partition + bucket-count + sort-only-the-target-buckets
    # operator (operators/quantile.exact_discrete_rank_values): the
    # full two-phase ranker sorted ALL ~2.9M grid rows to read two of
    # them — measured 6.9 s of rs02's 7.0 s sf0.1 wall; selection
    # sorts only the two target buckets (~n/P rows each).
    # materialize the grid ONCE: selection's sketch + shuffle + count
    # jobs would otherwise each re-run the BNLJ pair join (measured
    # 9.6 s sf0.1 un-materialized vs ~4.5 s with the checkpoint)
    slopes = slopes.localCheckpoint()
    n_pairs, mids = exact_discrete_rank_values(
        slopes,
        "slope",
        lambda n: sorted({(n + 1) // 2 - 1, (n + 2) // 2 - 1}),
    )
    median_rows = spark.createDataFrame(
        [(v,) for v in mids], "slope double"
    ).select(
        # the deferred 10-dp round — same Spark Round on the same raw
        # double the grid used to round before ranking
        F.round("slope", RS02_SLOPE_ND).alias("slope")
    )
    ts = median_rows.agg(
        F.round(F.avg("slope"), 8).alias("theil_sen_slope"),
        F.lit(n_pairs if n_pairs else None).cast("bigint").alias("n_pairs"),
    )
    # OLS moments: exact at the order grain (Σ x·price in DECIMAL —
    # x fits decimal(6,0), price decimal(18,2), product decimal(25,2),
    # sum decimal(35,2): no precision loss), day moments exact bigint
    sxy = orders.agg(
        F.sum(F.col("p") * F.col("x").cast("decimal(6,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum("p").cast("double").alias("sy"),
    )
    day_m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    # WRONG GRAIN GUARD: OLS here regresses DAILY revenue on the day
    # index, so Σxy must be Σ_d x_d·rev_d — which equals the order-
    # grain Σ x·price exactly (x is constant within a day). sy = Σrev.
    # a single-day series has a 0 OLS denominator: the slope is
    # undefined — explicit NULL on both engines (Spark ANSI raises on
    # the naive /0; DuckDB's double division yields NULL — the
    # gr11/tx26 degenerate class)
    ols_den = (
        F.col("n_days").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    ols = day_m.crossJoin(F.broadcast(sxy)).select(
        "n_days",
        "sx",
        F.when(
            ols_den != 0,
            F.round(
                (
                    F.col("n_days").cast("double") * F.col("sxy")
                    - F.col("sx").cast("double") * F.col("sy")
                )
                / ols_den,
                6,
            ),
        ).alias("ols_slope"),
    )
    return ols.crossJoin(F.broadcast(ts)).select(
        "n_days",
        "n_pairs",
        "theil_sen_slope",
        "ols_slope",
    )


_RS02_ORACLE = f"""
WITH orders_x AS (
  SELECT date_diff('day', DATE '{RS02_EPOCH}',
                   CAST(o_orderdate AS DATE)) AS x,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
), daily AS MATERIALIZED (
  SELECT CAST(x AS BIGINT) AS x,
         SUM(p) AS revd,
         CAST(SUM(p) AS DOUBLE) AS rev
  FROM orders_x GROUP BY 1
), slopes AS (
  SELECT ROUND(CAST(b.revd - a.revd AS DOUBLE)
               / CAST(b.x - a.x AS DOUBLE), {RS02_SLOPE_ND}) AS slope
  FROM daily a JOIN daily b ON a.x < b.x
), ranked AS (
  SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
         COUNT(*) OVER () AS n
  FROM slopes
), ts AS (
  SELECT ROUND(AVG(slope), 8) AS theil_sen_slope,
         CAST(MAX(n) AS BIGINT) AS n_pairs
  FROM ranked WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
), mo AS (
  SELECT CAST(SUM(p * CAST(x AS DECIMAL(6,0))) AS DOUBLE) AS sxy,
         CAST(SUM(p) AS DOUBLE) AS sy
  FROM orders_x
), dm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM daily
)
SELECT dm.n_days, ts.n_pairs, ts.theil_sen_slope,
       ROUND((CAST(dm.n_days AS DOUBLE) * mo.sxy
              - CAST(dm.sx AS DOUBLE) * mo.sy)
             / (CAST(dm.n_days AS DOUBLE) * CAST(dm.sxx AS DOUBLE)
                - CAST(dm.sx AS DOUBLE) * CAST(dm.sx AS DOUBLE)), 6)
         AS ols_slope
FROM dm CROSS JOIN mo CROSS JOIN ts
"""


ROUND7_STAGED_QUERIES["rs02_theil_sen_trend"] = rs02_theil_sen_trend
ROUND7_STAGED_ORACLE["rs02_theil_sen_trend"] = _RS02_ORACLE


# ---------------------------------------------------------------------------
# Round-12 staging, wave 78: st21 streaming MinHash resemblance.
# ---------------------------------------------------------------------------


def _register_staged_streaming_wave78() -> None:
    from ..streaming.queries import (
        ST21_STAGED_ORACLE,
        st21_streaming_minhash_resemblance,
    )

    ROUND7_STAGED_QUERIES["st21_streaming_minhash_resemblance"] = (
        st21_streaming_minhash_resemblance
    )
    ROUND7_STAGED_ORACLE["st21_streaming_minhash_resemblance"] = (
        ST21_STAGED_ORACLE
    )


_register_staged_streaming_wave78()


# ---------------------------------------------------------------------------
# Round-12 promotion: the 3 queries staged during round 11 graduate
# into the live registry (r11 verdict task 1). Order = staging wave
# order (77 -> 78); __spark_entry__._window_order consumes this as the
# bucket-2 (never-certified) judgment order, so the driver's next
# 50-slot window certifies these 3 first and fills the remaining 47
# slots from the refresh-queue head (the 11 r5-era rows, then 36 of
# the 50 r6-era rows).
# ---------------------------------------------------------------------------

ROUND12_PROMOTED: list[str] = [
    # wave 77
    "gr10_ktruss_summary",
    "rs02_theil_sen_trend",
    # wave 78
    "st21_streaming_minhash_resemblance",
]

for _name in ROUND12_PROMOTED:
    EXTENSION_QUERIES[_name] = ROUND7_STAGED_QUERIES.pop(_name)
    EXTENSION_ORACLE[_name] = ROUND7_STAGED_ORACLE.pop(_name)
del _name


# ---------------------------------------------------------------------------
# Round-13 staging, wave 79: gr11 local clustering profile, tx26 Zipf
# rank-frequency slope.
# ---------------------------------------------------------------------------


def gr11_local_clustering(spark: SparkSession, sf: str) -> DataFrame:
    """Degree-bucketed LOCAL clustering profile of the part co-purchase
    graph: per-VERTEX triangle counts from one degree-ordered triangle
    enumeration (the gr08 kernel), pooled per power-of-two degree
    bucket as sum(T_v) / sum(C(d_v, 2)) — the transitivity-by-degree
    curve that says WHERE the graph is clique-like (low-degree bundle
    cliques keep high clustering; hub neighborhoods decay as ~1/d in
    real co-occurrence graphs). gr08 reports the single global ratio;
    this is its distributional refinement, and the pooled-ratio form
    keeps every aggregate an exact integer (the float-sum-of-ratios
    alternative is order-dependent and was rejected by the en01 rule).

    Scale: one triangle enumeration (O(|E|^1.5) total via the degree
    orientation, hub-skew-proof), one explode to the 3 member vertices,
    one vertex-keyed count, one bounded (<= 64 power-of-two buckets)
    rollup. Exact BIGINT triangle/wedge sums; the only division is the
    final per-bucket ratio, rounded once to 6 dp."""
    edges = _gr05_copurchase_edges(spark, sf).localCheckpoint()
    und = edges.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).union(edges.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("dg"))
    dv = deg.select(F.col("u").alias("v"), F.col("dg").alias("__dgv"))
    oriented = (
        und.join(deg, "u")
        .join(dv, "v")
        .filter(
            (F.col("dg") < F.col("__dgv"))
            | ((F.col("dg") == F.col("__dgv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v", "__dgv")
    )
    lo = oriented.select("u", F.col("v").alias("x"), F.col("__dgv").alias("__dx"))
    hi = oriented.select("u", F.col("v").alias("y"), F.col("__dgv").alias("__dy"))
    wedges = (
        lo.join(hi, "u")
        .filter(
            (F.col("__dx") < F.col("__dy"))
            | ((F.col("__dx") == F.col("__dy")) & (F.col("x") < F.col("y")))
        )
        .select("u", "x", "y")
    )
    tri = wedges.join(
        oriented.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
    ).select("u", "x", "y")
    tv = (
        tri.select(
            F.explode(F.array("u", "x", "y")).alias("u")
        )
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__t"))
    )
    per_vertex = deg.join(tv, "u", "left").select(
        "dg", F.coalesce(F.col("__t"), F.lit(0)).cast("bigint").alias("__t")
    )
    return (
        per_vertex.groupBy(
            F.expr("CAST(length(bin(dg)) AS INT)").alias("deg_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.max("dg").cast("bigint").alias("max_degree"),
            F.sum("__t").cast("bigint").alias("tri_sum"),
            F.sum(F.expr("dg * (dg - 1) div 2")).cast("bigint").alias(
                "wedge_sum"
            ),
        )
        .select(
            "deg_bucket",
            "n_nodes",
            "max_degree",
            "tri_sum",
            "wedge_sum",
            # the all-degree-1 bucket has zero wedges: its clustering is
            # undefined (NULL), made explicit so ANSI mode can't raise
            F.when(
                F.col("wedge_sum") > 0,
                F.round(
                    F.col("tri_sum").cast("double")
                    / F.col("wedge_sum").cast("double"),
                    6,
                ),
            ).alias("bucket_clustering"),
        )
        .orderBy("deg_bucket")
    )


def _gr11_oracle_sql() -> str:
    return f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), good AS (
  SELECT a.pk AS id_a, b.pk AS id_b
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2
  HAVING COUNT(*) >= {GR05_MIN_CO_ORDERS}
), und AS (
  SELECT id_a AS u, id_b AS v FROM good
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM good
), deg AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS dg FROM und GROUP BY u
), oriented AS (
  SELECT n.u, n.v, du.dg AS dgu, dv.dg AS dgv
  FROM und n JOIN deg du ON du.u = n.u JOIN deg dv ON dv.u = n.v
  WHERE (du.dg < dv.dg) OR (du.dg = dv.dg AND n.u < n.v)
), wedges AS (
  SELECT a.u AS c, a.v AS x, b.v AS y
  FROM oriented a JOIN oriented b ON a.u = b.u
  WHERE (a.dgv < b.dgv) OR (a.dgv = b.dgv AND a.v < b.v)
), tri AS (
  SELECT w.c AS u, w.x, w.y
  FROM wedges w JOIN oriented o ON o.u = w.x AND o.v = w.y
), tv AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS t
  FROM (SELECT u FROM tri UNION ALL SELECT x FROM tri
        UNION ALL SELECT y FROM tri)
  GROUP BY u
), pv AS (
  SELECT d.dg, COALESCE(tv.t, 0) AS t
  FROM deg d LEFT JOIN tv ON tv.u = d.u
)
SELECT CAST(length(bin(dg)) AS INT) AS deg_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MAX(dg) AS BIGINT) AS max_degree,
       CAST(SUM(t) AS BIGINT) AS tri_sum,
       CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS wedge_sum,
       CASE WHEN SUM(dg * (dg - 1) // 2) > 0
            THEN ROUND(CAST(SUM(t) AS DOUBLE)
                       / CAST(SUM(dg * (dg - 1) // 2) AS DOUBLE), 6)
       END AS bucket_clustering
FROM pv
GROUP BY 1
ORDER BY deg_bucket
"""


#: tx26's rank cutoff: the OLS fit runs on the top-1024 vocabulary
#: ranks — a BOUNDED table (the en01 transcendental rule), and the
#: regime where the power law actually holds (the unbounded tail is
#: dominated by hapax plateaus that flatten any fit).
TX26_TOP = 1024

#: ln values are scaled by 1e8 and rounded to exact BIGINTs before any
#: summation, so every OLS moment is an order-independent integer sum
#: (a float Σln over the corpus vocabulary would be partition-order
#: dependent); 8 dp absorbs last-ulp libm divergence between engines.
TX26_LN_SCALE = 100_000_000


def tx26_zipf_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf rank-frequency fit: OLS slope and R^2 of ln(count) against
    ln(rank) over the top-TX26_TOP vocabulary ranks — THE one-number
    corpus-health fingerprint (natural text sits near slope -1;
    template spam flattens the head, dedup failures steepen it), and
    the regression twin of tx24's coverage-curve view of the same
    ranked vocabulary.

    Scale: one token-keyed count (map-side combinable), the two-phase
    distributed ranker for the global rank, a rank-cut to a BOUNDED
    1024-row table, and one 1-row moment reduce. Determinism: both
    ln() terms are rounded-and-integer-scaled per row (TX26_LN_SCALE);
    Σx, Σy, Σxy, Σx², Σy² are exact integer/decimal sums; slope and
    R² are single double divisions of exactly-equal integers, rounded
    once to 6 dp."""
    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
    )

    counts = (
        _docs_words(spark, sf)
        .select(F.explode("__words").alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__c"))
        # r13: three consumers (ranker sampling + shuffle, mass agg);
        # checkpoint so the corpus explode + vocab count runs once
        .localCheckpoint()
    )
    ranked = attach_global_row_number(
        counts,
        order_by=[F.desc("__c"), F.asc("__t")],
        rn_col="__r",
        total_col="__vocab",
    )
    top = ranked.filter(F.col("__r") <= TX26_TOP).select(
        "__r",
        "__c",
        "__vocab",
        F.expr(f"CAST(round(ln(__r) * {TX26_LN_SCALE}) AS BIGINT)").alias(
            "__x8"
        ),
        F.expr(f"CAST(round(ln(__c) * {TX26_LN_SCALE}) AS BIGINT)").alias(
            "__y8"
        ),
    )
    mass = counts.agg(
        F.sum("__c").cast("bigint").alias("token_mass"),
    )
    m = top.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranks"),
        F.max("__vocab").cast("bigint").alias("vocab_total"),
        F.max(F.when(F.col("__r") == 1, F.col("__c")))
        .cast("bigint")
        .alias("top1_count"),
        F.sum("__x8").cast("bigint").alias("__sx"),
        F.sum("__y8").cast("bigint").alias("__sy"),
        F.sum((F.col("__x8") * F.col("__y8")).cast("decimal(25,0)"))
        .alias("__sxy"),
        F.sum((F.col("__x8") * F.col("__x8")).cast("decimal(25,0)"))
        .alias("__sxx"),
        F.sum((F.col("__y8") * F.col("__y8")).cast("decimal(25,0)"))
        .alias("__syy"),
    )
    n = F.col("n_ranks").cast("decimal(10,0)")
    sx = F.col("__sx").cast("decimal(19,0)")
    sy = F.col("__sy").cast("decimal(19,0)")
    num = (n * F.col("__sxy") - sx * sy).cast("double")
    denx = (n * F.col("__sxx") - sx * sx).cast("double")
    deny = (n * F.col("__syy") - sy * sy).cast("double")
    # a degenerate corpus (n_ranks <= 1: zero or one vocabulary type)
    # has denx == 0 — the fit is undefined, made an explicit NULL on
    # both engines (Spark ANSI raises on the naive /0; DuckDB's double
    # division yields NULL — the gr11 zero-wedge class)
    return m.crossJoin(F.broadcast(mass)).select(
        "n_ranks",
        "vocab_total",
        "token_mass",
        "top1_count",
        F.when(
            F.col("token_mass") > 0,
            F.round(
                F.col("top1_count").cast("double")
                / F.col("token_mass").cast("double"),
                6,
            ),
        ).alias("top1_share"),
        F.when(denx != 0, F.round(num / denx, 6)).alias("zipf_slope"),
        F.when(
            (denx != 0) & (deny != 0),
            F.round(num * num / (denx * deny), 6),
        ).alias("zipf_r2"),
    )


def _tx26_oracle_sql() -> str:
    s = TX26_LN_SCALE
    return f"""
WITH d AS (
  SELECT {_WORDS} AS w FROM documents
), c AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(w) AS t FROM d) GROUP BY t
), r AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rn,
         COUNT(*) OVER () AS vocab
  FROM c
), top AS (
  SELECT rn, c, vocab,
         CAST(round(ln(rn) * {s}) AS BIGINT) AS x8,
         CAST(round(ln(c) * {s}) AS BIGINT) AS y8
  FROM r WHERE rn <= {TX26_TOP}
), mass AS (
  SELECT CAST(SUM(c) AS BIGINT) AS token_mass FROM c
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
         CAST(MAX(vocab) AS BIGINT) AS vocab_total,
         CAST(MAX(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS top1_count,
         CAST(SUM(x8) AS HUGEINT) AS sx,
         CAST(SUM(y8) AS HUGEINT) AS sy,
         SUM(CAST(x8 AS HUGEINT) * y8) AS sxy,
         SUM(CAST(x8 AS HUGEINT) * x8) AS sxx,
         SUM(CAST(y8 AS HUGEINT) * y8) AS syy
  FROM top
)
SELECT n_ranks, vocab_total, token_mass, top1_count,
       CASE WHEN token_mass > 0
            THEN ROUND(CAST(top1_count AS DOUBLE) / token_mass, 6)
       END AS top1_share,
       CASE WHEN n_ranks * sxx - sx * sx <> 0
            THEN ROUND(CAST(n_ranks * sxy - sx * sy AS DOUBLE)
                       / CAST(n_ranks * sxx - sx * sx AS DOUBLE), 6)
       END AS zipf_slope,
       CASE WHEN n_ranks * sxx - sx * sx <> 0
             AND n_ranks * syy - sy * sy <> 0
            THEN ROUND(CAST(n_ranks * sxy - sx * sy AS DOUBLE)
                       * CAST(n_ranks * sxy - sx * sy AS DOUBLE)
                       / (CAST(n_ranks * sxx - sx * sx AS DOUBLE)
                          * CAST(n_ranks * syy - sy * sy AS DOUBLE)), 6)
       END AS zipf_r2
FROM m CROSS JOIN mass
"""


ROUND7_STAGED_QUERIES.update(
    {
        "gr11_local_clustering": gr11_local_clustering,
        "tx26_zipf_slope": tx26_zipf_slope,
    }
)
ROUND7_STAGED_ORACLE.update(
    {
        "gr11_local_clustering": _gr11_oracle_sql(),
        "tx26_zipf_slope": _tx26_oracle_sql(),
    }
)


# ---------------------------------------------------------------------------
# Round-13 staging, wave 80: ss10 Neyman-allocation stratified sample.
# ---------------------------------------------------------------------------

#: ss10's total sample budget across all strata. Fixed like ss08's
#: per-source K — the downstream consumer (an eval carve-out, an
#: annotation batch) buys a fixed number of documents.
SS10_BUDGET = 128

#: Per-stratum char-length standard deviations are rounded to 6 dp
#: before integer-scaling into allocation weights, so a last-ulp sqrt
#: divergence between engines cannot flip an allocation count.
SS10_SD_SCALE = 1_000_000


def ss10_neyman_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """Neyman-allocation stratified sampling over (source, lang)
    strata: each stratum's share of the SS10_BUDGET-doc budget is
    proportional to N_h * sd_h (stratum size times char-length
    standard deviation) — the variance-minimizing allocation for
    estimating the corpus mean (Neyman 1934), i.e. how a curation
    pipeline SHOULD size per-slice eval carve-outs (uniform-per-slice
    oversamples homogeneous strata; proportional ignores spread). The
    sampled members are picked by deterministic hash rank, so the
    draw is reproducible across runs and engines — the variable-k
    sibling of ss08's fixed-K weighted sampler.

    Scale: the strata table is |sources|x|langs|-bounded (broadcast);
    per-stratum moments are exact integer sums (map-side combinable);
    the member pick rides the two-phase ranker partitioned by stratum
    (never one window task), then a rank-vs-allocation filter against
    the broadcast allocation. Determinism: sd is computed from exact
    DECIMAL moments, rounded once (SS10_SD_SCALE grain), allocations
    are pure integer arithmetic (floor division; the <= BUDGET
    remainder is deliberately unallocated rather than redistributed —
    largest-remainder would need a second ranking for a cosmetic
    gain), and ties in the draw break by doc_id."""
    from local_etl_csv_to_postgresql_spark.operators.ranking import (
        attach_global_row_number,
    )

    docs = load(spark, sf, "documents").select(
        "source", "lang", "doc_id", F.col("n_chars").cast("bigint").alias("__x")
    )
    # Per-row products and sums run in DECIMAL, not BIGINT: x*x on a
    # bigint pair (or the sum of many of them) can overflow long at
    # large SF, where ANSI raises while the DuckDB oracle's HUGEINT
    # succeeds — the tx26 cast-before-SUM rule (r12 ADVICE).
    xd = F.col("__x").cast("decimal(25,0)")
    strata = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(xd).cast("decimal(38,0)").alias("__sx"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("__sxx"),
    )
    n = F.col("n_docs").cast("decimal(19,0)")
    var_num = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    sd = F.when(
        F.col("n_docs") >= 2,
        F.round(
            F.sqrt(
                var_num
                / (F.col("n_docs") * (F.col("n_docs") - 1)).cast("double")
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))
    weighted = strata.withColumn("sd_chars", sd).withColumn(
        "__w",
        (
            F.col("n_docs").cast("decimal(19,0)")
            * F.expr(
                f"CAST(round(sd_chars * {SS10_SD_SCALE}) AS DECIMAL(19,0))"
            )
        ).cast("decimal(38,0)"),
    )
    tot = weighted.agg(F.sum("__w").cast("decimal(38,0)").alias("__tot"))
    alloc = (
        weighted.crossJoin(F.broadcast(tot))
        .withColumn(
            "alloc_n",
            F.when(
                F.col("__tot") > 0,
                F.least(
                    F.col("n_docs"),
                    F.expr(
                        f"(CAST({SS10_BUDGET} AS DECIMAL(13,0)) * __w)"
                        " div __tot"
                    ),
                ),
            )
            .otherwise(F.lit(0))
            .cast("bigint"),
        )
        .select("source", "lang", "n_docs", "sd_chars", "alloc_n")
    )
    ranked = attach_global_row_number(
        docs.withColumn(
            "__h", dd.hash60(F.col("doc_id").cast("string"))
        ),
        order_by=[F.asc("__h"), F.asc("doc_id")],
        partition_by=["source", "lang"],
        rn_col="__rn",
    )
    samp = (
        ranked.join(F.broadcast(alloc.select("source", "lang", "alloc_n")),
                    ["source", "lang"])
        .filter(F.col("__rn") <= F.col("alloc_n"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("sampled_n"),
            F.sum("doc_id").cast("bigint").alias("sample_docid_sum"),
            F.sum("__x").cast("bigint").alias("sample_char_sum"),
        )
    )
    return (
        alloc.join(samp, ["source", "lang"], "left")
        .select(
            "source",
            "lang",
            "n_docs",
            "sd_chars",
            "alloc_n",
            F.coalesce(F.col("sampled_n"), F.lit(0))
            .cast("bigint")
            .alias("sampled_n"),
            F.coalesce(F.col("sample_docid_sum"), F.lit(0))
            .cast("bigint")
            .alias("sample_docid_sum"),
            F.coalesce(F.col("sample_char_sum"), F.lit(0))
            .cast("bigint")
            .alias("sample_char_sum"),
        )
        .orderBy("source", "lang")
    )


def _ss10_oracle_sql() -> str:
    h = _H60.format(x="CAST(doc_id AS VARCHAR)")
    return f"""
WITH docs AS (
  SELECT source, lang, doc_id, CAST(n_chars AS BIGINT) AS x,
         ({h}) AS h
  FROM documents
), strata AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx
  FROM docs GROUP BY source, lang
), sdd AS (
  SELECT source, lang, n_docs,
         CASE WHEN n_docs >= 2
              THEN ROUND(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)
                              / CAST(n_docs * (n_docs - 1) AS DOUBLE)), 6)
              ELSE 0.0 END AS sd_chars
  FROM strata
), weighted AS (
  SELECT *,
         CAST(n_docs AS HUGEINT)
           * CAST(round(sd_chars * {SS10_SD_SCALE}) AS HUGEINT) AS w
  FROM sdd
), tot AS (
  SELECT CAST(SUM(w) AS HUGEINT) AS tot FROM weighted
), alloc AS (
  SELECT source, lang, n_docs, sd_chars,
         CASE WHEN tot > 0
              THEN LEAST(CAST(n_docs AS HUGEINT),
                         (CAST({SS10_BUDGET} AS HUGEINT) * w) // tot)
              ELSE 0 END AS alloc_n
  FROM weighted CROSS JOIN tot
), ranked AS (
  SELECT source, lang, doc_id, x,
         ROW_NUMBER() OVER (PARTITION BY source, lang
                            ORDER BY h, doc_id) AS rn
  FROM docs
), samp AS (
  SELECT r.source, r.lang,
         CAST(COUNT(*) AS BIGINT) AS sampled_n,
         CAST(SUM(r.doc_id) AS BIGINT) AS sample_docid_sum,
         CAST(SUM(r.x) AS BIGINT) AS sample_char_sum
  FROM ranked r JOIN alloc a
    ON a.source = r.source AND a.lang = r.lang AND r.rn <= a.alloc_n
  GROUP BY r.source, r.lang
)
SELECT a.source, a.lang, a.n_docs, a.sd_chars,
       CAST(a.alloc_n AS BIGINT) AS alloc_n,
       COALESCE(s.sampled_n, 0) AS sampled_n,
       COALESCE(s.sample_docid_sum, 0) AS sample_docid_sum,
       COALESCE(s.sample_char_sum, 0) AS sample_char_sum
FROM alloc a LEFT JOIN samp s
  ON s.source = a.source AND s.lang = a.lang
ORDER BY a.source, a.lang
"""


ROUND7_STAGED_QUERIES["ss10_neyman_allocation"] = ss10_neyman_allocation
ROUND7_STAGED_ORACLE["ss10_neyman_allocation"] = _ss10_oracle_sql()


# ---------------------------------------------------------------------------
# Round-13 promotions: the wave-79/80 queries graduate into the live
# registry after sf0.001+sf0.01 oracle certification, sf0.1 sweep walls
# (3.50/1.36/1.54 s), scale-curve probes, plan audit, degenerate-shape
# parity, and full-pipeline Python replay tests. The driver's round-13
# 50-slot window certifies these 3 first and fills the remaining 47
# slots from the refresh-queue head (the 14 r6-era rows, then 33 of
# the 50 r7-era rows).
# ---------------------------------------------------------------------------

ROUND13_PROMOTED: list[str] = [
    # wave 79
    "gr11_local_clustering",
    "tx26_zipf_slope",
    # wave 80
    "ss10_neyman_allocation",
]

for _name in ROUND13_PROMOTED:
    EXTENSION_QUERIES[_name] = ROUND7_STAGED_QUERIES.pop(_name)
    EXTENSION_ORACLE[_name] = ROUND7_STAGED_ORACLE.pop(_name)
del _name


# ---------------------------------------------------------------------------
# Round-14 staging, wave 81: pv03 dynamic-values pivot, fi01 mergeable
# Misra-Gries heavy hitters.
# ---------------------------------------------------------------------------

#: pv03's declared language roster: the corpus contract (TESTDATA.md's
#: 5-language documents table). The pivot itself is DYNAMIC — Spark
#: discovers the values — and the final select projects onto this
#: contract so the output schema cannot drift with the data.
PV03_LANGS = ("de", "en", "es", "fr", "zh")


def pv03_dynamic_lang_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Doc count + char mass pivoted by language per source, with the
    pivot values DISCOVERED from the data: ``pivot("lang")`` with no
    explicit list — the one Spark pivot shape pv01 deliberately
    avoids, certified here on the column where it is the right call.
    The reference reaches this surface with CASE-based conditional
    aggregation over a known roster (sql/queries.sql pivot-style
    reports); a curation dashboard over a new corpus does not know
    the roster up front.

    Scale: the implicit pivot first runs a separate distinct job over
    the pivot column — driver-collected and capped by
    spark.sql.pivotMaxValues (default 10k). On the lang column that
    scan is column-pruned to a dictionary-encoded parquet column and
    the result is a ≤|langs| value list, which is exactly when the
    dynamic form is affordable at 100 TB; pivoting a high-cardinality
    column this way is the anti-pattern pv01's docstring warns about.
    After value discovery the plan is pv01's: ONE partial-aggregable
    groupBy on the bounded source roster. Char sums run in DECIMAL
    (the tx26/ss10 cast-before-SUM rule), cast to the bigint contract
    once. Languages absent from a degenerate corpus materialize as
    all-zero contract columns (a driver-side schema fix-up on the
    pivoted schema — bounded metadata, no extra job)."""
    docs = load(spark, sf, "documents")
    piv = (
        docs.groupBy("source")
        .pivot("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_chars").cast("decimal(25,0)")).alias("chars"),
        )
    )
    have = set(piv.columns)
    zero = F.lit(0).cast("bigint")
    cols = [F.col("source")]
    for lg in PV03_LANGS:
        n = F.col(f"{lg}_n") if f"{lg}_n" in have else F.lit(None)
        ch = F.col(f"{lg}_chars") if f"{lg}_chars" in have else F.lit(None)
        cols.append(F.coalesce(n, zero).cast("bigint").alias(f"n_{lg}"))
        cols.append(
            F.coalesce(ch, F.lit(0)).cast("bigint").alias(f"chars_{lg}")
        )
    return piv.select(*cols).orderBy("source")


def _pv03_oracle_sql() -> str:
    parts = []
    for lg in PV03_LANGS:
        parts.append(
            f"       CAST(COUNT(CASE WHEN lang = '{lg}' THEN 1 END)"
            f" AS BIGINT) AS n_{lg},\n"
            f"       CAST(COALESCE(SUM(CASE WHEN lang = '{lg}'"
            f" THEN CAST(n_chars AS HUGEINT) END), 0) AS BIGINT)"
            f" AS chars_{lg}"
        )
    body = ",\n".join(parts)
    return (
        "SELECT source,\n" + body + "\nFROM documents GROUP BY source"
        "\nORDER BY source"
    )


ROUND7_STAGED_QUERIES["pv03_dynamic_lang_pivot"] = pv03_dynamic_lang_pivot
ROUND7_STAGED_ORACLE["pv03_dynamic_lang_pivot"] = _pv03_oracle_sql()


#: fi01's Misra-Gries counter budget: any token with corpus frequency
#: above 1/(K+1) (~0.5%) of the token mass is GUARANTEED to survive
#: the sketch, so the exact second pass below recovers the complete
#: heavy-hitter set. 199 keeps the per-partition summary and the
#: candidate broadcast tiny while the synthetic corpus's ~30
#: template tokens (1-4% mass each) all clear the threshold.
FI01_K = 199


def fi01_heavy_hitter_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Exact corpus heavy hitters (tokens with > 1/(K+1) of the token
    mass) recovered through a MERGEABLE Misra-Gries sketch — the
    approx-top-k shape every training-data pipeline runs to find
    boilerplate/template tokens before filtering. Two passes:

    1. SKETCH (no shuffle): one Misra-Gries summary of width K per
       partition, built incrementally over the Arrow batches inside
       ``mapInPandas`` with the summary MERGE of Agarwal et al. 2013
       (Mergeable Summaries, §3.1): add batch counts, subtract the
       (K+1)-st largest, drop non-positives — each step vectorized
       pandas, never a per-token Python loop. Only the ≤K surviving
       candidate tokens per partition leave the executor (O(K·P)
       rows), where the exact groupBy(token) alternative shuffles the
       full per-partition vocabulary — the entire point at 100 TB.
       Pigeonhole guarantee: a token with global count > n/(K+1)
       exceeds n_i/(K+1) in at least one partition i, and MG never
       evicts a token above its partition's threshold.
    2. VERIFY (exact): recount ONLY the broadcast candidate roster
       and keep counts clearing the global threshold — so the output
       is the exact deterministic heavy-hitter set, independent of
       partitioning/batching (any candidate superset yields the same
       final rows), which is what makes a sketch query
       hash-certifiable at all (the cm01 rule; contrast hll01).

    The reference has no sketch surface (its pandas value_counts
    reports are exact, src/transform.py); fi01 is the scale path for
    that report family. The share divide is one double op written
    operand-for-operand as in the oracle."""
    import pandas as _pd

    toks = _docs_words(spark, sf).select(F.explode("__words").alias("token"))

    def mg(batches):
        state = None
        for pdf in batches:
            if not len(pdf):
                continue
            vc = pdf["token"].value_counts()
            state = vc if state is None else state.add(vc, fill_value=0)
            if len(state) > FI01_K:
                kth = state.nlargest(FI01_K + 1).iloc[-1]
                state = (state[state > kth] - kth).astype("int64")
        if state is not None and len(state):
            yield _pd.DataFrame({"token": state.index.astype(str)})

    cand = toks.mapInPandas(mg, "token string").distinct()
    tot = toks.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    return (
        toks.join(F.broadcast(cand), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * F.lit(FI01_K + 1) > F.col("__n"))
        .select(
            "token",
            "cnt",
            F.round(
                F.col("cnt").cast("double") / F.col("__n").cast("double"), 6
            ).alias("share"),
        )
        .orderBy(F.desc("cnt"), "token")
    )


FI01_ORACLE = f"""
WITH w AS (
  SELECT unnest({_WORDS}) AS token FROM documents
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w
), c AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY token
)
SELECT token, cnt,
       ROUND(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share
FROM c CROSS JOIN tot
WHERE cnt * {FI01_K + 1} > n
ORDER BY cnt DESC, token
"""

ROUND7_STAGED_QUERIES["fi01_heavy_hitter_tokens"] = fi01_heavy_hitter_tokens
ROUND7_STAGED_ORACLE["fi01_heavy_hitter_tokens"] = FI01_ORACLE
