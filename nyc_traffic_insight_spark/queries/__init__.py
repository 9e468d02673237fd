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


# Registration-order rotation (VERDICT.md rounds 2-8). The driver's
# sf0.01 correctness gate walks REGISTRY front-to-back with a
# ~50-query budget (CORRECTNESS_r04-r08 each carried exactly 50
# rows). Round-9 ordering — the precomputed front from NOTES
# "Round-9 rotation precompute" / VERDICT r8 #1/#2:
#   1. the 6 window queries whose latest driver evidence is r3 (the
#      r8 rotation's 50-slot budget covered 50 of its 56 fronted
#      entries; these were the tail);
#   2. the 4 ML audits whose code changed in r8 (unpersist moved
#      into try/finally — behavior-neutral, locally oracle-green,
#      but "code changed → re-earn evidence" is the standing rule);
#   3. the two BPE promotions (bpe_train_merges + its application
#      sibling bpe_encode_top_tokens) — the round's sanctioned
#      registry additions, never driver-checked;
#   4. freshness fill: every query whose latest driver evidence is
#      r4 (the oldest remaining tier), oldest-registered first.
# 6+4+2 = 12 debt slots + 43 r4-stale = 55 fronted; the 50-slot
# budget clears ALL debt (tiers 1-3) and re-verifies 38 of the r4
# tier; the ~5-query r4 tail rolls to r10. Everything else keeps
# standing r5+ evidence and registers last.
_CHECK_FIRST = [
    # 1. r3-stale window tail (latest driver evidence six rounds old)
    "win_lag_multi",
    "win_lag_series",
    "win_ranking",
    "win_roll_mean_3",
    "win_sliding_lookback",
    "win_time_split",
    # 2. code changed in r8 (behavior-neutral, re-earn anyway)
    "ml_linear_regression",
    "ml_random_forest",
    "ml_gbt",
    "ml_propensity_model",
    # 3. the r9 registry additions, never driver-checked
    "bpe_train_merges",
    "bpe_encode_top_tokens",
    # 4. r4-stale freshness fill
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
    "geo_reproject_forward",
    "geo_reproject_roundtrip",
    "sim_search_ivf_topk",
    "text_decontaminate",
    "shard_pack_greedy",
    "vocab_top_ngrams",
    "sample_temperature_mix",
    "text_repetition_filter",
    "pipeline_pretrain_corpus",
    "dedup_incremental_batch",
    "sketch_hll_by_group",
    "qa_referential_integrity",
    "text_perplexity_proxy",
    "join_interval_overlap",
    "agg_mode_by_group",
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
    if unknown:
        # a typo here would silently cost the query its driver-evidence
        # slot (the whole point of the rotation) — fail loudly instead,
        # and with a real raise: a bare assert is stripped under
        # `python -O`, losing this diagnostic (ADVICE r8)
        raise ValueError(
            f"_CHECK_FIRST names not in registry: {sorted(unknown)}"
        )
    front = {n: REGISTRY[n] for n in _CHECK_FIRST}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    REGISTRY.clear()
    REGISTRY.update(front)
    REGISTRY.update(rest)
    return REGISTRY
