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


def register(name: str, oracle=None, survey: str = ""):
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


# Registration-order rotation (VERDICT.md rounds 2-12). The driver's
# sf0.01 correctness gate walks REGISTRY front-to-back with a
# ~50-query budget (CORRECTNESS_r04-r12 each carried exactly 50
# rows). Round-13 ordering — VERDICT r12 #1/#2, revised mid-round
# when the TWELVE r13 previews were promoted inside r13 instead of
# waiting for r14 (never-driver-checked promotions outrank stale
# refresh — the r12 verdict's own ranking):
#   1. the EIGHT r12-preview promotions (never driver-checked; each
#      pre-verified cross-engine at sf0.01 AND sf0.1 via
#      tools/preview_gate.py, 16/16 PASS at r12 close);
#   2. the TWELVE r13-preview promotions (never driver-checked;
#      pre-verified the same way, 24/24 PASS, plus the adversarial
#      local[8]/7-partition session sweep);
#   3. the SEVEN r13-LATE-preview promotions (never driver-checked;
#      gate 14/14 at both SFs + the adversarial sweep 7/7 — promoted
#      in-round rather than held to r14, same ranking rule);
#   4. the 23 oldest queries of the 46-query r7-stale tier,
#      registration order (win_roll_mean_24 ... ml_kmeans).
# 8 + 12 + 7 + 23 = 50 fronted exactly; the 19-query r7-stale
# remainder (sim_search_ivf_kmeans ... agg_cumulative_users) and the
# 4-query r7 registration-order tail (report_pareto_deciles,
# flagship_volume_features, split_random, layout_bucketed_join) roll
# to r14 — flagship keeps every-round smoke evidence via entry()
# regardless. r14 front precompute: 19 + 4 + the 27 oldest r8-stale
# = 50 exactly. Everything else keeps standing r8+ evidence and
# registers last.
_CHECK_FIRST = [
    # 1. r12-preview promotions (never driver-checked)
    "pack_context_windows",
    "pack_window_manifest",
    "qa_lsh_recall_audit",
    "text_decontaminate_fuzzy",
    "lm_ppl_buckets",
    "sample_unimax_budget",
    "sample_unimax_apply",
    "pipeline_unimax_corpus",
    # 2. r13-preview promotions (never driver-checked)
    "sample_epoch_shuffle",
    "sample_interleave_stride",
    "text_gopher_rules",
    "lm_train_kneser_ney",
    "lm_score_kneser_ney",
    "qa_ivf_index_audit",
    "qa_lsh_banding_sweep",
    "pipeline_pretrain_order",
    "text_dup_ngram_rate",
    "qa_contamination_rate",
    "qa_zipf_slope",
    "mm_dedup_phash",
    # 3. r13-late-preview promotions (never driver-checked)
    "emb_pq_codes",
    "qa_pq_distortion",
    "sim_search_pq_adc",
    "pipeline_ann_ivfpq",
    "qa_dedup_retention",
    "sample_curriculum_order",
    "text_dsir_weights",
    # 4. r7-stale tier, registration order (23 oldest of 46)
    "win_roll_mean_24",
    "win_range_time",
    "win_seasonal_decompose",
    "join_star_broadcast",
    "join_anti",
    "join_semi",
    "join_outer",
    "join_nearest_spatial",
    "join_salted_skew",
    "join_asof",
    "join_asof_nearest",
    "join_range_binned",
    "join_fuzzy_key",
    "join_scd2_pointintime",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_sig",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_search_bruteforce_topk",
    "sim_search_topk_vectorized",
    "ml_kmeans",
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
