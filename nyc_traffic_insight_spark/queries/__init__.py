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


# Registration-order rotation (VERDICT.md round 2 #1, r3 #7, r4 #2).
# The driver's sf0.01 correctness gate walks REGISTRY front-to-back with a
# 50-query budget (CORRECTNESS_r04 carried exactly 50 rows).  Round-5
# ordering, freshness-driven — never-checked beats stale beats fresh:
#   1. sketch_hll — r4's sole red row; the root cause (oracle reg_sum left
#      un-cast, DuckDB widened to HUGEINT) is fixed this round and must be
#      re-verified first;
#   2. the 16 queries whose last evidence is ROUND 1 (the filter/union/
#      sort/sample tail that r4's 50-query budget cut off) — VERDICT r4 #2;
#   3. EVERY operator added this round (zero driver evidence yet — each was
#      hash-verified locally at sf0.001 and sf0.01 before registration, but
#      only a CORRECTNESS row counts);
#   4. queries whose code changed this round (ntile null-ordering pin,
#      JSONL/stream staging-dir reuse) — results/plans moved, re-verify.
# 1+16+29+4 = 50: exactly the budget.  The 34 r2-era queries roll to
# round 6 wholesale (deliberate: zero-evidence > stale-evidence); r6's
# front-load is section "5." below plus whatever r5 adds late.
_CHECK_FIRST = [
    # 1. the fixed red row
    "sketch_hll",
    # 2. last checked r1 (aging 4 rounds — evidence hygiene, VERDICT r4 #2)
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
    # 3. added this round — zero driver evidence until CORRECTNESS_r05
    "sketch_qdigest",
    "funnel_conversion",
    "cohort_retention",
    "agg_outlier_mad",
    "dedup_substring_exact",
    "emb_centroid_by_label",
    "join_fuzzy_key",
    "win_first_last",
    "win_streaks",
    "dim_scd2_build",
    "report_shipping_priority",
    "report_region_supplier_volume",
    "report_returned_customers",
    "dedup_containment",
    "text_tfidf_top_terms",
    "stream_stream_join",
    "join_bloom_prefilter",
    "split_deterministic",
    "layout_zorder_key",
    "qa_profile_table",
    "agg_skew_kurtosis",
    "agg_entropy_by_group",
    "sink_merge_upsert",
    "qa_snapshot_diff",
    "win_sessionize_batch",
    "event_transition_matrix",
    "report_market_share",
    "agg_audience_overlap",
    "report_rfm_scores",
    # 4. code changed this round (ntile ordering pin, staging-dir reuse)
    "win_ntile_buckets",
    "scan_jsonl_roundtrip",
    "scan_jsonl_malformed_skip",
    "stream_file_ingest",
    # 5. (rolls to r6) the 34 r2-era queries: join_star_broadcast,
    #    join_anti/semi/outer, join_nearest_spatial, join_salted_skew,
    #    join_asof, join_range_binned, str_*/dt_*/flag_*/cyclical/log1p/
    #    interaction/case_volume/round/cond_route/json_*, dedup front half
    #    (exact, ngram_jaccard, minhash_sig/lsh, simhash, embedding_cosine),
    #    sim_search_bruteforce/lsh_buckets, text_token_count/quality_score/
    #    lang_id — all passed r2; re-verify in r6's front-load.
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
