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
# ~50-query budget.  Round-5 ordering, freshness-driven:
#   1. sketch_hll — r4's sole red row; the root cause (oracle reg_sum left
#      un-cast, DuckDB widened to HUGEINT) is fixed this round and must be
#      re-verified first;
#   2. the 16 queries whose last evidence is ROUND 1 (the filter/union/
#      sort/sample tail that r4's 50-query budget cut off) — VERDICT r4 #2;
#   3. queries changed or added this round (null-ordering pin, staging-dir
#      reuse, new operators) — their results/plans moved, re-verify;
#   4. the 34 queries last checked in round 2 (joins, string/date scalars,
#      the dedup/similarity front half) — whatever fits the remaining
#      budget; the rest roll to round 6.
# everything r3/r4-fresh follows in module order.
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
    # 3. changed/added this round
    "sketch_qdigest",
    "funnel_conversion",
    "cohort_retention",
    "agg_outlier_mad",
    "dedup_substring_exact",
    "emb_centroid_by_label",
    "join_fuzzy_key",
    "win_ntile_buckets",
    "scan_jsonl_roundtrip",
    "scan_jsonl_malformed_skip",
    "stream_file_ingest",
    # 4. last checked r2 — fill the remaining budget, rest roll to r6
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
