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


# Registration-order rotation (VERDICT.md round 2 #1, round 3 #7).
# The driver's sf0.01 correctness gate walks REGISTRY front-to-back with a
# ~50-query budget.  After r3 every registered query has been checked at
# least once; the round-4 ordering is freshness-driven:
#   1. queries whose result changed this round — sketch_hll (r3's only
#      red row, now round(,4)-ed per the catalog convention) and
#      sim_search_ivf_topk (plan rebuilt: narrow broadcast-argmax
#      assignment) — must be re-verified first;
#   2. the 48 queries last checked in ROUND 1 (oldest evidence — the
#      scalar/scan/agg/flagship set), so no query's last check ages past
#      two rounds;
#   3. the 35 last checked in round 2 (joins, string/date scalars, the
#      dedup/similarity front half);
# everything r3-fresh follows in module order.
_CHECK_FIRST = [
    # changed/new this round — re-verify first
    "sketch_hll",
    "sim_search_ivf_topk",
    "stream_file_ingest",
    "text_decontaminate",
    "shard_pack_greedy",
    "vocab_top_ngrams",
    "sample_temperature_mix",
    "text_repetition_filter",
    "pipeline_pretrain_corpus",
    "scan_jsonl_roundtrip",
    "scan_jsonl_malformed_skip",
    "dedup_incremental_batch",
    "sketch_hll_by_group",
    "qa_referential_integrity",
    "text_perplexity_proxy",
    "join_interval_overlap",
    "agg_mode_by_group",
    "win_ntile_buckets",
    # last checked r1 (aging 3 rounds)
    "flagship_volume_features",
    "geo_reproject_forward",
    "geo_reproject_roundtrip",
    "agg_null_counts",
    "agg_count",
    "agg_distinct_years",
    "agg_corr_matrix",
    "agg_regression_metrics",
    "agg_group_mean",
    "pivot_onehot",
    "onehot_flags",
    "agg_feature_importance_sort",
    "agg_rollup",
    "agg_cube",
    "agg_count_distinct",
    "agg_approx_count_distinct",
    "agg_quantiles",
    "ols_closed_form",
    "sketch_histogram",
    "agg_grouping_sets",
    "scan_csv",
    "scan_csv_multifile",
    "scan_csv_pruned",
    "scan_csv_parsedates",
    "sink_idempotent",
    "project_drop",
    "project_rename",
    "dedup_rows",
    "cast_int",
    "cast_numeric_coerce",
    "cast_timestamp",
    "make_timestamp_parts",
    "filter_dropna",
    "fillna",
    "filter_eq_composite",
    "filter_bool_mask",
    "filter_gt",
    "filter_threshold_flag",
    "filter_malformed_skip",
    "union_all_shards",
    "union_oversample",
    "except_rows",
    "intersect_rows",
    "unpivot_measures",
    "sort_time",
    "limit_head",
    "sample_shuffle",
    "split_random",
    # last checked r2
    "join_star_broadcast",
    "join_anti",
    "join_semi",
    "join_outer",
    "join_nearest_spatial",
    "join_salted_skew",
    "join_asof",
    "join_range_binned",
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
        core,
    )

    front = {n: REGISTRY[n] for n in _CHECK_FIRST if n in REGISTRY}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    REGISTRY.clear()
    REGISTRY.update(front)
    REGISTRY.update(rest)
    return REGISTRY
