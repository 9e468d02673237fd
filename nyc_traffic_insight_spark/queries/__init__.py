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


# Registration-order rotation (VERDICT.md rounds 2-7). The driver's
# sf0.01 correctness gate walks REGISTRY front-to-back with a
# ~50-query budget (CORRECTNESS_r04-r07 each carried exactly 50
# rows). Round-8 ordering — the round's single job is clearing the
# last driver-evidence debt (VERDICT r7 #1/#2):
#   1. dedup_substring_cdc — the round's one sanctioned registry
#      addition (the CDC promotion), zero driver evidence;
#   2. the 19 queries whose latest driver check is r2 (six rounds
#      stale) — scalar/date/flag functions, string ops, the LSH
#      sim-search tier, text basics;
#   3. the 36 r3-stale queries — the early joins/windows, streams,
#      multimodal, sketches, sampling;
#   4. belt-and-braces: the four ML audits whose code changed this
#      round (cache lifetime moved into try/finally — behavior-
#      neutral, locally oracle-green, but "code changed → re-earn
#      evidence" is the standing rule).
# 1+19+36 = 56: the driver's 50-slot budget covers the CDC entry and
# all of tier 2 plus most of tier 3; the ~6-query tail (and tier 4)
# rolls to the r9 front. Everything else keeps standing r4+ evidence
# and registers last.
_CHECK_FIRST = [
    # 1. the r8 registry addition, never driver-checked
    "dedup_substring_cdc",
    # 2. r2-stale (latest driver evidence six rounds old)
    "case_volume_bins",
    "cond_route",
    "cyclical_encode",
    "dt_extract",
    "flag_rush_hour",
    "flag_season",
    "flag_weekend",
    "interaction_products",
    "json_extract",
    "json_struct_build",
    "log1p_expm1",
    "round_decimal",
    "sim_search_lsh_buckets",
    "str_functions",
    "str_timestamp_build",
    "str_wkt_parse",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    # 3. r3-stale
    "agg_percentile_exact",
    "dedup_edit_distance",
    "doc_stats_by_source",
    "emb_normalize",
    "emb_quantize_int8",
    "join_coord_map",
    "join_holiday_dim",
    "join_nearest_edge",
    "join_traffic_weather_boro",
    "join_traffic_weather_time",
    "ml_grouped_ols",
    "mm_asset_stats",
    "mm_extract_features",
    "mm_video_frames",
    "pipeline_text_prep",
    "sample_reservoir_topk",
    "sample_stratified",
    "scan_object_store",
    "sketch_bloom_filter",
    "sketch_count_min",
    "sketch_heavy_hitters",
    "stream_dedup_ids",
    "stream_sessionization",
    "stream_sliding_counts",
    "stream_tumbling_counts",
    "text_fingerprint",
    "text_pii_scrub",
    "time_spine_gapfill",
    "win_cumulative",
    "win_lag1",
    "win_lag_multi",
    "win_lag_series",
    "win_ranking",
    "win_roll_mean_3",
    "win_sliding_lookback",
    "win_time_split",
    # 4. code changed in r8 (behavior-neutral, re-earn anyway)
    "ml_linear_regression",
    "ml_random_forest",
    "ml_gbt",
    "ml_propensity_model",
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

    unknown = set(_CHECK_FIRST) - REGISTRY.keys()
    # a typo here would silently cost the query its driver-evidence
    # slot (the whole point of the rotation) — fail loudly instead
    assert not unknown, f"_CHECK_FIRST names not in registry: {sorted(unknown)}"
    front = {n: REGISTRY[n] for n in _CHECK_FIRST}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    REGISTRY.clear()
    REGISTRY.update(front)
    REGISTRY.update(rest)
    return REGISTRY
