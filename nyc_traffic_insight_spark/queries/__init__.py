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
- queries with engine-seeded randomness (randomSplit, rand shuffles) get
  no oracle → driver records the weaker rows-only check.
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


# Registration-order rotation (VERDICT.md round 2 #1, r3 #7, r4 #2, r5 #1).
# The driver's sf0.01 correctness gate walks REGISTRY front-to-back with a
# ~50-query budget (CORRECTNESS_r04/r05 each carried exactly 50 rows).
# Round-6 ordering, freshness-driven — never-checked beats stale beats
# fresh (VERDICT r5 "Next round" #1):
#   1. the 50 queries with ZERO driver evidence across r1–r5 — every
#      operator registered after the r5 rotation froze (the time-series
#      window tier, the behavioral/report tier, the eval-metric
#      aggregates, layout/QA ops, ORC roundtrip).  Each was hash-verified
#      locally at sf0.001 and sf0.01 before registration and re-verified
#      by tools/verify_rotation.py this round, but only a driver
#      CORRECTNESS row is the hard signal;
#   2. the 34 r2-era queries whose evidence is 4 rounds stale (joins,
#      scalar/date/flag functions, the dedup front half, the first two
#      sim_search tiers, text basics) — they overflow a 50-slot budget and
#      roll in order if the gate walks further.
# Everything r3+-green keeps its standing evidence and registers last.
_CHECK_FIRST = [
    # 1. never driver-checked (registered after the r5 rotation froze)
    "win_ewma",
    "time_spine_locf",
    "win_anomaly_zscore",
    "win_topn_per_key",
    "win_pct_change",
    "win_seasonal_decompose",
    "report_forecast_backtest",
    "win_changepoint_cusum",
    "win_autocorrelation",
    "join_scd2_pointintime",
    "text_chunk_fixed",
    "emb_pair_distance_audit",
    "dedup_canonical_select",
    "text_oov_rate",
    "text_readability",
    "stream_disorder_audit",
    "win_sessionize_native",
    "qa_rapid_repeat_audit",
    "sketch_hll_overlap",
    "agg_wau_exact",
    "sketch_hll_rolling",
    "ml_propensity_model",
    "event_attribution_last_touch",
    "sample_negatives_per_user",
    "report_copurchase_pairs",
    "agg_gini_by_group",
    "report_session_conversion",
    "win_rank_change",
    "agg_seasonality_profile",
    "pipeline_user_features",
    "agg_time_to_convert",
    "qa_freshness_audit",
    "report_revenue_bridge",
    "pipeline_training_dataset",
    "agg_auc_exact",
    "agg_precision_recall_curve",
    "agg_ks_statistic",
    "agg_lift_by_decile",
    "qa_expectations_report",
    "pipeline_incremental_rollup",
    "agg_bootstrap_ci",
    "report_ab_test",
    "agg_chi_square_independence",
    "agg_benford_audit",
    "win_max_drawdown",
    "report_cohort_ltv",
    "layout_compact_files",
    "layout_bucketed_join",
    "layout_partition_pruning",
    "scan_orc_roundtrip",
    # 1b. added in r6 (never checked either; after the r5 backlog)
    "ml_segmented_router",
    "text_bpe_pair_counts",
    "graph_pagerank_topk",
    "agg_cumulative_users",
    "report_pareto_deciles",
    "emb_covariance_matrix",
    "join_asof_nearest",
    # rows-only and ~10 s to build (runs the covariance + means jobs):
    # last of the r6 block so a time-budgeted gate checks the cheap
    # oracled entries first
    "emb_pca_project",
    # 2. r2-stale (overflow; checked in order if the budget allows)
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
