"""r15: expensive per-row expressions are evaluated ONCE (let-binding).

A withColumn whose expensive expression is referenced by several
consumers gets INLINED into each of them by projection collapse — and
an outer-expression reference inside a higher-order-function lambda is
re-evaluated PER ELEMENT. Three operators paid this silently:

- chunk_cdc: the bounds array (containing the O(len) per-position md5
  cut scan) was sliced twice by zip_with — the optimized plan held the
  scan NINE times (10 `md5` / 3 `zip_with`), making the registered
  dedup_substring_cdc query ~2x its single-scan floor (~1.0 -> ~0.5 s
  at sf0.1).
- emb_normalize: the squared-norm fold, referenced 3x in the select ->
  9 `aggregate(` occurrences.
- emb_quantize_int8: `scale` referenced INSIDE the quantize lambda
  (O(dim) re-evaluated per element -> O(dim²)/row) and `q` consumed
  twice -> 18 `transform(` occurrences; 0.30 -> 0.12 s at sf0.1.

The r15 shape lambda-binds each such value
(``transform(array(<expr>), v -> ...)[0]``) — a lambda variable is
opaque to the optimizer, so the value is computed exactly once per
row. These pins count expression occurrences in the optimized plans so
a refactor that reintroduces the duplication fails loudly.

RENDERING DEPENDENCE (ADVICE r15 #3): the pins count raw substrings
("md5", "transform(", "aggregate(") in `optimizedPlan().toString()`,
so they depend on Spark's plan *rendering*, not only on real
re-duplication — an engine upgrade or alias-format change can trip
them with no semantic regression. If a pin fails after a Spark bump,
eyeball the plan first: the failure is real only when the counted
expression's SUBTREE (e.g. the md5 cut scan) appears more often, not
when the same single subtree merely prints differently.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.usefixtures("spark")


def test_cdc_cut_scan_is_single_evaluation(spark):
    import nyc_traffic_insight_spark.queries.textops as t

    q = t.dedup_substring_cdc(spark, SF_SMOKE)
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    # exactly two md5 call sites: the cut-scan window hash (once) and
    # the span_hash projection of the registered query
    assert plan.count("md5") == 2, plan
    # one zip_with: the single bounds->chunks pairing
    assert plan.count("zip_with") == 1, plan


def test_cdc_chunk_layer_single_scan(spark):
    from nyc_traffic_insight_spark.queries.textops import chunk_cdc, _docs

    ch = chunk_cdc(_docs(spark, SF_SMOKE))
    plan = ch._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("md5") == 1, plan
    assert plan.count("zip_with") == 1, plan


def test_emb_normalize_single_fold(spark):
    import nyc_traffic_insight_spark.queries.textops as t

    q = t.emb_normalize(spark, SF_SMOKE)
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    # exactly one squared-norm fold (was 9: inlined per consumer)
    assert plan.count("aggregate(") == 1, plan


def test_emb_quantize_single_scale_scan(spark):
    import nyc_traffic_insight_spark.queries.textops as t

    q = t.emb_quantize_int8(spark, SF_SMOKE)
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    # the nested let keeps the cast/abs/quantize transforms to their
    # structural minimum: 4 binders + 2 value scans (was 18 — the
    # scale scan inlined per element and q per consumer)
    assert plan.count("transform(") <= 6, plan
    assert plan.count("aggregate(") == 1, plan


def test_pq_assign_tick_vector_bound_once(spark):
    """The per-subspace tick conversion (`tx`) must appear once per
    subspace, not once per codebook entry: the pre-let shape embedded
    the tx text into every code's d2 expression (M·k copies — 80
    transform() occurrences at M=4, k=10), re-running the O(sub) tick
    conversion per code per row."""
    import nyc_traffic_insight_spark.queries.textops as t

    q = t.emb_pq_codes(spark, SF_SMOKE)
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    # per subspace (r16 shape): codebook binder (cbm — the from_json
    # literal bound once) + tick-vector binder (txv) + tick-conversion
    # transform + the ONE scored transform over the bound codebook +
    # argmin-struct binder -> 5·M total (M=_PQ_M); the pre-let r14
    # shape had 2·M·k (tx inlined per code AND the scored sort
    # re-evaluated per extracted field). The invariant is O(M), never
    # O(M·k). (Counts depend on Spark's plan rendering — re-derive on
    # an engine upgrade, ADVICE r15.)
    assert plan.count("transform(") <= 5 * t._PQ_M + 2, plan
