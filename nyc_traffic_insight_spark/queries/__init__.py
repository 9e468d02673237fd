"""Driver-facing query catalog.

Every operator from SURVEY.md §2 (plus the north-star large-scale
training-data operators) is registered here as a ``QuerySpec``:
a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame`` and, when the
semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle SQL run
against the same parquet tables. The driver hash-compares the two at
sf=0.01 — that is the correctness gate, so the two sides of each spec are
kept textually adjacent in the defining module.

Conventions (hash-compare survival rules):
- every computed / aggregate column is aliased to the SAME name on both
  sides;
- every floating-point column whose value depends on accumulation order
  (sums, averages, products of many rows) is ``round(x, 4)``-ed on both
  sides — Spark and DuckDB sum partitions in different orders, and a raw
  double hash would flap;
- integer sums are cast to BIGINT on both sides (DuckDB widens to
  HUGEINT, Spark to BIGINT);
- queries whose raw numbers no SQL engine can recompute (MLlib
  internals, engine-seeded randomness, digest centroids) emit a
  CONTRACT AUDIT instead: exact SQL-recomputable cardinalities plus
  booleans the oracle pins TRUE — as of r7 every registered query
  carries a value oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    survey: str  # SURVEY.md §2 row id(s) this query covers


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, survey: str = ""):
    """Decorator: add a query to the catalog."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, survey=survey)
        return fn

    return deco


# Registration-order rotation (VERDICT.md round 2 #1, r3 #7, r4 #2,
# r5 #1, r6 #3). The driver's sf0.01 correctness gate walks REGISTRY
# front-to-back with a ~50-query budget (CORRECTNESS_r04–r06 each
# carried exactly 50 rows). Round-7 ordering, freshness-driven —
# red beats changed beats never-checked beats stale beats fresh:
#   1. the three r6 RED rows, re-verified after their fixes (the
#      order-free summation rewrites + the scalar-schema propensity
#      output) — a green driver row here is the round's headline;
#   2. the eight r6 additions with zero driver evidence (VERDICT r6 #3's
#      explicit list, its order kept: cheap oracled entries before the
#      slow PCA — itself audit-oracled late in r7);
#   3. entries whose CODE changed this round, in change order: the
#      rows-only→oracled conversions (exact-integer cosine top-k,
#      t-digest rank-error audit, the ML contract-audit tier, the new
#      S12 pipeline) and the determinism-hardened queries (exact-
#      integer money sums; window sums carried as integer cents/ticks;
#      exact-moment A/B arms) — old driver evidence is void for all
#      of these;
#   4. the 34 r2-era queries whose evidence is 5 rounds stale (joins,
#      scalar/date/flag functions, the dedup front half, the first two
#      sim_search tiers, text basics) — the ~18 past slot 50 roll to
#      r8 with the overflow;
#   5. overflow: the r3-era entries in registration order.
# Everything r4+-green-and-unchanged keeps its standing evidence and
# registers last.
_CHECK_FIRST = [
    # 1. r6 red rows, now fixed
    "ml_propensity_model",
    "win_seasonal_decompose",
    "report_cohort_ltv",
    # 2. r6 additions, never driver-checked
    "ml_segmented_router",
    "emb_covariance_matrix",
    "text_bpe_pair_counts",
    "graph_pagerank_topk",
    "agg_cumulative_users",
    "report_pareto_deciles",
    "join_asof_nearest",
    "emb_pca_project",
    # 3. changed / added in r7 (incl. the rows-only→audit-oracle
    # conversions of the ML tier — their code changed, so their old
    # rows-only evidence is void)
    "sim_search_topk_vectorized",
    "sketch_tdigest",
    "pipeline_http_to_parquet",
    "ml_linear_regression",
    "ml_random_forest",
    "ml_gbt",
    "ml_segmented_model",
    "ml_permutation_importance",
    "ml_inference_single_row",
    "ml_kmeans",
    "sim_search_ivf_kmeans",
    "split_random",
    "agg_approx_count_distinct",
    # money-sum hardening (exact_sum/exact_avg): whole-catalog change
    # locally exact-verified at sf0.001+sf0.01+sf0.1; the flagship and
    # the two queries that actually flapped the sf0.1 sweep re-earn
    # driver evidence first
    "flagship_volume_features",
    "join_scd2_pointintime",
    "layout_bucketed_join",
    # late-r7 plan rewrites (per-level qdigest materialization; narrow
    # fuzzy-key candidate shuffle) — their earlier driver evidence
    # predates the new plans, so they re-earn it first
    "sketch_qdigest",
    "join_fuzzy_key",
    "dedup_connected_components",
    # post-review hardening: window sums carried as exact integers,
    # arm moments from exact integer sums
    "report_ab_test",
    "agg_bootstrap_ci",
    "win_max_drawdown",
    "win_roll_mean_24",
    "win_range_time",
    # 4. r2-stale
    "join_star_broadcast",
    "join_asof",
    "join_range_binned",
    "join_salted_skew",
    "join_nearest_spatial",
    "join_anti",
    "join_semi",
    "join_outer",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_sig",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_search_bruteforce_topk",
    "sim_search_lsh_buckets",
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "str_wkt_parse",
    "str_functions",
    "str_timestamp_build",
    "dt_extract",
    "flag_weekend",
    "flag_season",
    "flag_rush_hour",
    "cyclical_encode",
    "log1p_expm1",
    "interaction_products",
    "case_volume_bins",
    "round_decimal",
    "cond_route",
    "json_struct_build",
    "json_extract",
    # 5. r3-stale overflow (positions 49+; r8's natural front)
    "win_lag1",
    "win_lag_multi",
    "win_roll_mean_3",
    "win_time_split",
    "win_sliding_lookback",
    "win_lag_series",
    "win_ranking",
    "win_cumulative",
    "time_spine_gapfill",
    "join_traffic_weather_boro",
    "join_traffic_weather_time",
    "join_holiday_dim",
    "join_coord_map",
    "join_nearest_edge",
    "text_fingerprint",
    "doc_stats_by_source",
    "sketch_count_min",
    "sketch_heavy_hitters",
    "emb_normalize",
    "emb_quantize_int8",
    "pipeline_text_prep",
    "dedup_edit_distance",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_dedup_ids",
    "stream_sessionization",
    "mm_extract_features",
    "mm_video_frames",
    "mm_asset_stats",
    "sample_stratified",
    "sample_reservoir_topk",
    "sketch_bloom_filter",
    "text_pii_scrub",
    "agg_percentile_exact",
    "ml_grouped_ols",
    "scan_object_store",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every catalog module (side effect: fills REGISTRY), then
    reorder so the stalest / most-recently-changed queries register
    first (see ``_CHECK_FIRST``).

    REGISTRY is insertion-ordered and the driver's correctness gate
    walks it front-to-back with a ~50-query budget, so front placement
    decides what gets re-verified this round.
    """
    from nyc_traffic_insight_spark.queries import (  # noqa: F401
        windows,
        joins,
        scalars,
        textops,
        streamingq,
        multimodalq,
        samplingq,
        mlq,
        geoq,
        aggregates,
        behaviorq,
        core,
    )

    front = {n: REGISTRY[n] for n in _CHECK_FIRST if n in REGISTRY}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    REGISTRY.clear()
    REGISTRY.update(front)
    REGISTRY.update(rest)
    return REGISTRY
