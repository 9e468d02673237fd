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
    # DuckDB SQL text, a zero-arg callable rendered to text inside
    # load_all() (lazy oracle), or None → rows-only check. Consumers
    # reading REGISTRY[...].oracle BEFORE load_all() may see the
    # un-rendered callable.
    oracle: str | Callable[[], str] | None
    survey: str  # SURVEY.md §2 row id(s) this query covers


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | Callable[[], str] | None = None,
    survey: str = "",
):
    """Decorator: add a query to the catalog.

    ``oracle`` is the DuckDB SQL text, ``None`` (rows-only check), or
    a ZERO-ARG CALLABLE returning the text. The callable form renders
    LAZILY in ``load_all()`` after every catalog module has imported —
    use it whenever the oracle text interpolates a constant defined
    later in the module or composes another module's fragments
    (eager rendering there forces fragile placement workarounds:
    the r13 review found a register call exiled 2,400 lines from its
    builder and a comment-enforced section ordering, both of which
    this mechanism removes)."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, survey=survey)
        return fn

    return deco


# Registration-order rotation (VERDICT.md rounds 2-13). The driver's
# sf0.01 correctness gate walks REGISTRY front-to-back with a
# ~50-query budget (CORRECTNESS_r04-r13 each carried exactly 50
# rows). Round-14 ordering — VERDICT r13 #2's precomputed front,
# adjusted for this round's code changes (changed/new entries outrank
# stale refresh, the standing convention):
#   1. the THREE queries whose code changed or was added in r14:
#      mm_dedup_phash (candidate stage rebuilt as the distributed
#      (band, byte) self equi-join — VERDICT r13 "What's wrong" #1),
#      mm_dedup_canonical (new: the multimodal keep/drop arc,
#      VERDICT r13 #4) and mm_dedup_frames (new: video near-dedup by
#      frame-fingerprint overlap) — the two new entries never
#      driver-checked, all three pre-verified cross-engine at
#      sf0.001/0.01/0.1;
#   2. the 19-query r7-stale remainder, registration order
#      (sim_search_ivf_kmeans ... agg_cumulative_users);
#   3. the 4-query r7 registration-order tail (report_pareto_deciles,
#      flagship_volume_features, split_random, layout_bucketed_join);
#   4. the 24 oldest r8-stale queries, registration order
#      (win_lag1 ... sim_search_lsh_buckets).
# 3 + 19 + 4 + 24 = 50 fronted exactly; the r8-stale remainder
# (text_token_count ... scan_object_store, 26 queries) fronts in
# r15.
# Everything else keeps standing r8+ evidence and registers last.
_CHECK_FIRST = [
    # 1. changed/new in r14
    "mm_dedup_phash",
    "mm_dedup_canonical",
    "mm_dedup_frames",
    # 2. r7-stale remainder, registration order
    "sim_search_ivf_kmeans",
    "dedup_connected_components",
    "emb_covariance_matrix",
    "emb_pca_project",
    "text_bpe_pair_counts",
    "pipeline_http_to_parquet",
    "ml_segmented_model",
    "ml_permutation_importance",
    "ml_inference_single_row",
    "ml_segmented_router",
    "agg_approx_count_distinct",
    "sketch_tdigest",
    "sketch_qdigest",
    "agg_bootstrap_ci",
    "report_ab_test",
    "win_max_drawdown",
    "report_cohort_ltv",
    "graph_pagerank_topk",
    "agg_cumulative_users",
    # 3. r7 registration-order tail
    "report_pareto_deciles",
    "flagship_volume_features",
    "split_random",
    "layout_bucketed_join",
    # 4. 24 oldest r8-stale, registration order
    "win_lag1",
    "win_cumulative",
    "time_spine_gapfill",
    "join_traffic_weather_boro",
    "join_traffic_weather_time",
    "join_holiday_dim",
    "join_coord_map",
    "join_nearest_edge",
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
    "sim_search_lsh_buckets",
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

    # render lazy (callable) oracles now — every module is imported,
    # so cross-module fragments and late-defined constants resolve
    for n, s in list(REGISTRY.items()):
        if callable(s.oracle):
            REGISTRY[n] = QuerySpec(
                name=s.name,
                builder=s.builder,
                oracle=s.oracle(),
                survey=s.survey,
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
