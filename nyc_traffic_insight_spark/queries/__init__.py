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


# Registration-order rotation (VERDICT.md rounds 2-10). The driver's
# sf0.01 correctness gate walks REGISTRY front-to-back with a
# ~50-query budget (CORRECTNESS_r04-r10 each carried exactly 50
# rows). Round-11 ordering — VERDICT r10 #1/#2 (the r9 front carried
# forward after the zero-turn round 10):
#   1. the 5 r4-stale holdovers — the oldest evidence anywhere in the
#      catalog (the r9 front placed them past slot 50; the r10
#      rotation re-ran the r9 set verbatim, so they aged two more
#      rounds without a check);
#   2. the two bigram-LM promotions (lm_train_bigram +
#      lm_score_perplexity) — the round's sanctioned registry
#      additions, never driver-checked;
#   3. the 47-query r5-stale tier (the F1-F7 filter block, U1/U2,
#      O3/O4, the report_* tier, scan_jsonl_*, win_first_last /
#      ntile / streaks / sessionize_batch, ...), registration order.
# 5 + 2 + 47 = 54 fronted; the 50-slot budget clears the holdovers
# and promotions and re-verifies 43 of the r5 tier; the 4-query
# registration-order tail (scan_jsonl_roundtrip,
# scan_jsonl_malformed_skip, sink_merge_upsert, qa_snapshot_diff)
# rolls to r12 — all 54 are locally driver-replica-verified this
# round regardless (NOTES.md). Everything else keeps standing r6+
# evidence and registers last.
_CHECK_FIRST = [
    # 1. r4-stale holdovers (oldest evidence in the catalog)
    "sketch_hll_by_group",
    "qa_referential_integrity",
    "text_perplexity_proxy",
    "join_interval_overlap",
    "agg_mode_by_group",
    # 2. the r11 registry additions, never driver-checked
    "lm_train_bigram",
    "lm_score_perplexity",
    # 3. r5-stale tier, registration order
    "win_first_last",
    "win_streaks",
    "dim_scd2_build",
    "report_shipping_priority",
    "report_region_supplier_volume",
    "report_returned_customers",
    "dedup_substring_exact",
    "emb_centroid_by_label",
    "dedup_containment",
    "text_tfidf_top_terms",
    "stream_file_ingest",
    "stream_stream_join",
    "sketch_hll",
    "join_bloom_prefilter",
    "split_deterministic",
    "layout_zorder_key",
    "win_ntile_buckets",
    "funnel_conversion",
    "cohort_retention",
    "agg_outlier_mad",
    "qa_profile_table",
    "agg_skew_kurtosis",
    "agg_entropy_by_group",
    "win_sessionize_batch",
    "event_transition_matrix",
    "report_market_share",
    "agg_audience_overlap",
    "report_rfm_scores",
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
    "scan_jsonl_roundtrip",
    "scan_jsonl_malformed_skip",
    "sink_merge_upsert",
    "qa_snapshot_diff",
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
        embcurate,  # registers nothing until the r12 promotion
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
