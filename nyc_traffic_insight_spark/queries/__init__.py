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


# Registration-order rotation (VERDICT.md rounds 2-11). The driver's
# sf0.01 correctness gate walks REGISTRY front-to-back with a
# ~50-query budget (CORRECTNESS_r04-r11 each carried exactly 50
# rows). Round-12 ordering — VERDICT r11 #1/#2:
#   1. the 4-query r5-stale registration-order tail the r11 front
#      predicted would roll here (scan_jsonl_roundtrip,
#      scan_jsonl_malformed_skip, sink_merge_upsert,
#      qa_snapshot_diff) — the oldest evidence left in the catalog;
#   2. the three embedding-curation promotions (dedup_semantic,
#      emb_prototypes_filter, pipeline_d4_curation) — the round's
#      sanctioned registry additions, never driver-checked — plus
#      lm_score_perplexity, whose oracle changed this round (the
#      order-free tick-sum rework needs a fresh driver row);
#   3. the 42-query r6-stale tier (the win_* analytics block, the
#      sketch_hll trio's overlap/rolling forms, the behavioral
#      report_*/qa_* tier, layout_*, scan_orc_roundtrip),
#      registration order.
# 4 + 4 + 42 = 50 fronted exactly; after this round no query's
# latest driver evidence predates r7. Everything else keeps standing
# r7+ evidence and registers last.
_CHECK_FIRST = [
    # 1. r5-stale tail (oldest evidence in the catalog)
    "scan_jsonl_roundtrip",
    "scan_jsonl_malformed_skip",
    "sink_merge_upsert",
    "qa_snapshot_diff",
    # 2. r12 registry additions + the reworked-oracle query
    "dedup_semantic",
    "emb_prototypes_filter",
    "pipeline_d4_curation",
    "lm_score_perplexity",
    # 3. r6-stale tier, registration order
    "win_ewma",
    "time_spine_locf",
    "win_anomaly_zscore",
    "win_topn_per_key",
    "win_pct_change",
    "report_forecast_backtest",
    "win_changepoint_cusum",
    "win_autocorrelation",
    "text_chunk_fixed",
    "emb_pair_distance_audit",
    "dedup_canonical_select",
    "text_readability",
    "text_oov_rate",
    "stream_disorder_audit",
    "win_sessionize_native",
    "qa_rapid_repeat_audit",
    "sketch_hll_overlap",
    "agg_wau_exact",
    "sketch_hll_rolling",
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
    "agg_chi_square_independence",
    "agg_benford_audit",
    "layout_compact_files",
    "layout_partition_pruning",
    "scan_orc_roundtrip",
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
        tokenizers,
        embcurate,  # D4 curation tier (registered since the r12 promotion)
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
