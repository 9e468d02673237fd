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


# Registration-order rotation (VERDICT.md rounds 2-14). The driver's
# sf0.01 correctness gate walks REGISTRY front-to-back with a
# ~50-query budget (CORRECTNESS_r04-r14 each carried exactly 50
# rows). Round-15 ordering — NOTES "Round-15 rotation precompute",
# adjusted for this round's code changes (changed/new entries outrank
# stale refresh, the standing convention):
#   1. the 23 queries whose code, oracle, or artifact path changed in
#      r15 (LSH candidate stage → distributed band self-join; D4 tier
#      scale-k index + two-level assignment + oracle rewrite; ANN tier
#      generated-SQL literals; kmeans/centroid/LR-model disk
#      artifacts; mm_dedup_frames payload pre-digest) plus the ONE
#      new entry qa_dedup_retention_banded — all pre-verified
#      cross-engine this round;
#   2. 25 of the 26-query r8-stale remainder, registration order
#      (text_token_count ... scan_object_store — dedup_edit_distance
#      already fronts with the changed set), plus stream_file_ingest;
#   3. one r10-stale top-up (win_lag_multi) to fill the 50 budget.
# 23 + 26 + 1 = 50 fronted exactly; the r10 block
# (win_roll_mean_3 ... agg_count) fronts in r16.
# Everything else keeps standing r10+ evidence and registers last.
_CHECK_FIRST = [
    # 1. changed/new in r15
    "qa_dedup_retention_banded",
    "dedup_minhash_lsh",
    "dedup_edit_distance",
    "dedup_connected_components",
    "dedup_canonical_select",
    "text_decontaminate_fuzzy",
    "qa_lsh_recall_audit",
    "qa_lsh_banding_sweep",
    "qa_dedup_retention",
    "dedup_semantic",
    "emb_prototypes_filter",
    "pipeline_d4_curation",
    "sim_search_ivf_topk",
    "qa_ivf_index_audit",
    "pipeline_ann_ivfpq",
    "emb_pq_codes",
    "sim_search_pq_adc",
    "qa_pq_distortion",
    "sim_search_lsh_buckets",
    "sim_search_ivf_kmeans",
    "ml_permutation_importance",
    "ml_inference_single_row",
    "mm_dedup_frames",
    # 2. r8-stale remainder, registration order
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "doc_stats_by_source",
    "sketch_count_min",
    "sketch_heavy_hitters",
    "emb_normalize",
    "emb_quantize_int8",
    "pipeline_text_prep",
    "dedup_substring_cdc",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_dedup_ids",
    "stream_sessionization",
    "mm_extract_features",
    "mm_video_frames",
    "mm_asset_stats",
    "sample_stratified",
    "sample_reservoir_topk",
    "sketch_bloom_filter",
    "text_pii_scrub",
    "agg_percentile_exact",
    "ml_grouped_ols",
    "scan_object_store",
    "stream_file_ingest",
    # 3. r10-stale top-up
    "win_lag_multi",
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
