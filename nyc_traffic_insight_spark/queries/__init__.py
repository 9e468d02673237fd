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


# Registration-order rotation (VERDICT.md round 2, "Next round" #1).
# The driver's sf0.01 correctness gate walks REGISTRY front-to-back with a
# ~50-query budget; rounds 1+2 hash-checked 98 of 126 queries, leaving
# exactly these 28 never driver-checked (union of CORRECTNESS_r01+r02 keys
# vs the registry).  They go FIRST this round — module import order alone
# can't express this because the textops/aggregates/core modules each mix
# checked and unchecked queries, so load_all() explicitly reorders the
# registry after import.  New round-3 queries are appended here too so they
# meet the driver immediately.
_CHECK_FIRST = [
    # streaming slice (§2.12) — oracle-bearing, cheap
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_dedup_ids",
    "stream_sessionization",
    # multimodal (full oracles, sha256-deterministic fake decoder)
    "mm_extract_features",
    "mm_video_frames",
    "mm_asset_stats",
    # textops back half (oracles present)
    "text_fingerprint",
    "doc_stats_by_source",
    "sketch_count_min",
    "sketch_heavy_hitters",
    "emb_normalize",
    "emb_quantize_int8",
    "pipeline_text_prep",
    "dedup_edit_distance",
    "dedup_connected_components",
    # scan/sketch stragglers
    "scan_object_store",
    "sketch_tdigest",
    # ML surface (mostly rows-only by design — engine-seeded)
    "ml_grouped_ols",
    "ml_linear_regression",
    "ml_random_forest",
    "ml_gbt",
    "ml_segmented_model",
    "ml_permutation_importance",
    "ml_inference_single_row",
    "ml_kmeans",
    "sim_search_ivf_kmeans",
    "sim_search_topk_vectorized",
    # new in round 3
    "join_nearest_edge",
    "sample_stratified",
    "sample_reservoir_topk",
    "sketch_hll",
    "sketch_bloom_filter",
    "agg_percentile_exact",
    "text_pii_scrub",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every catalog module (side effect: fills REGISTRY), then
    reorder so never-driver-checked queries register first.

    REGISTRY is insertion-ordered and the driver's correctness gate walks
    it front-to-back with a budget; after two rounds of rotation the 28
    queries in ``_CHECK_FIRST`` have never been reached, so they are moved
    to the front (followed by everything else in module order).  Done ⇒
    every registered query driver-checked at least once across rounds.
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
