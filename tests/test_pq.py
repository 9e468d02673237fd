"""Product-quantization previews: code assignment + distortion audit.

Round-13 late previews (r14 promotions), pinned BEFORE their
@register lands (the r12 preview discipline):

- ``emb_pq_codes``: per-(vector, subspace) nearest-code assignment in
  integer tick space. Pinned: driver-style cross-engine equality, a
  synthetic-codebook unit test (a vector placed ON a code gets that
  code at distance 0; an equidistant vector breaks the tie toward the
  lower code id), the M-rows-per-vector shape, and the plan contract
  that the operator adds ZERO exchanges above the cached embeddings
  relation (it is a pure map — the 100 TB index-build claim).
- ``qa_pq_distortion``: per-(subspace, code) occupancy + mean/max
  squared quantization error. Pinned: driver-style cross-engine
  equality and the reconciliation that occupancies sum to
  M × |embeddings| with every subspace present.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect


@pytest.fixture(scope="module")
def duck_smoke():
    con = duck_connect(SF_SMOKE)
    yield con
    con.close()


def test_pq_codes_match_oracle(spark, duck_smoke):
    from nyc_traffic_insight_spark.queries.textops import (
        emb_pq_codes,
        pq_codes_oracle_sql,
    )

    spdf = emb_pq_codes(spark, SF_SMOKE).toPandas()
    odf = duck_smoke.execute(pq_codes_oracle_sql()).fetchdf()
    compare(spdf, odf, "emb_pq_codes")


def test_pq_distortion_matches_oracle(spark, duck_smoke):
    from nyc_traffic_insight_spark.queries.textops import (
        pq_distortion_oracle_sql,
        qa_pq_distortion,
    )

    spdf = qa_pq_distortion(spark, SF_SMOKE).toPandas()
    odf = duck_smoke.execute(pq_distortion_oracle_sql()).fetchdf()
    compare(spdf, odf, "qa_pq_distortion")


def test_pq_shape_m_rows_per_vector(spark):
    from nyc_traffic_insight_spark.queries.textops import (
        _PQ_M,
        emb_pq_codes,
    )

    df = emb_pq_codes(spark, SF_SMOKE).toPandas()
    per_vec = df.groupby("vec_id").size()
    assert (per_vec == _PQ_M).all(), "every vector gets exactly M codes"
    assert sorted(df["subspace"].unique()) == list(range(_PQ_M))


def test_pq_occupancy_reconciles(spark):
    from nyc_traffic_insight_spark.queries.textops import (
        _PQ_M,
        qa_pq_distortion,
    )
    from nyc_traffic_insight_spark.queries.textops import _embs

    n = _embs(spark, SF_SMOKE).count()
    df = qa_pq_distortion(spark, SF_SMOKE).toPandas()
    assert int(df["n_vectors"].sum()) == _PQ_M * n
    # every subspace is present, and per-subspace occupancy sums to n
    by_sub = df.groupby("subspace")["n_vectors"].sum()
    assert sorted(by_sub.index) == list(range(_PQ_M))
    assert (by_sub == n).all()
    # the codebook is actually discriminating at the smoke SF: more
    # than one code in use per subspace (an all-in-one-code PQ would
    # be vacuous)
    codes_used = df.groupby("subspace")["code"].nunique()
    assert (codes_used >= 2).all()


def test_pq_synthetic_codebook_exact_and_tiebreak(spark):
    """A vector equal to a code lands on it with d2 == 0; a vector
    equidistant between two codes takes the LOWER code id (the
    documented tie rule, ORDER BY d2, code)."""
    from nyc_traffic_insight_spark.queries.textops import (
        _PQ_M,
        _PQ_SUB,
        _pq_assign_frame,
    )

    dim = _PQ_M * _PQ_SUB
    # code 0 = all zeros, code 1 = all 2e-6 (ticks 0 and 2): a vector
    # of all 1e-6 (tick 1) is equidistant — must choose code 0
    cb = [
        [(0, [0] * _PQ_SUB), (1, [2] * _PQ_SUB)] for _ in range(_PQ_M)
    ]
    rows = [
        (0, [0.0] * dim),  # exactly code 0 in every subspace
        (1, [2e-6] * dim),  # exactly code 1 in every subspace
        (2, [1e-6] * dim),  # equidistant -> code 0 by tie rule
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = _pq_assign_frame(e, cb).toPandas().sort_values(
        ["vec_id", "subspace"]
    )
    v0 = out[out.vec_id == 0]
    assert (v0.code == 0).all() and (v0.d2_ticks == 0).all()
    v1 = out[out.vec_id == 1]
    assert (v1.code == 1).all() and (v1.d2_ticks == 0).all()
    v2 = out[out.vec_id == 2]
    assert (v2.code == 0).all() and (v2.d2_ticks == _PQ_SUB).all()


def _non_cache_exchanges(plan: str) -> int:
    """Exchanges in the operator's own plan segment, excluding the
    source-widening artifacts. Two cache states occur in-suite: with
    the _embs persist live, its REPARTITION renders under
    InMemoryRelation (below InMemoryTableScan — the test_doc_claims
    gotcha); after some earlier test clears the Spark cache, the same
    RoundRobin repartition renders INLINE. Count only exchanges above
    any InMemoryTableScan that are not the RoundRobin widening."""
    own = plan.split("InMemoryTableScan")[0]
    return own.count("Exchange") - own.count(
        "Exchange RoundRobinPartitioning"
    )


def test_pq_codes_plan_is_a_pure_map(spark):
    """The assignment operator adds NO exchange of any kind: the plan
    above the (possibly uncached) embeddings source is scan ->
    project -> generate."""
    from nyc_traffic_insight_spark.queries.textops import emb_pq_codes

    plan = (
        emb_pq_codes(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert _non_cache_exchanges(plan) == 0, f"pure-map contract broken:\n{plan[:3000]}"
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pq_adc_matches_oracle(spark, duck_smoke):
    from nyc_traffic_insight_spark.queries.textops import (
        pq_adc_oracle_sql,
        sim_search_pq_adc,
    )

    spdf = sim_search_pq_adc(spark, SF_SMOKE).toPandas()
    odf = duck_smoke.execute(pq_adc_oracle_sql()).fetchdf()
    compare(spdf, odf, "sim_search_pq_adc")


def test_pq_adc_rank1_is_the_self_distortion(spark):
    """Provable floor: for any x, adc(q, x) = Σ_m dist(q_m,
    cb[code_m(x)]) ≥ Σ_m min_code dist(q_m, ·) = q's own assignment
    distortion — so every query's rank-1 ADC distance must equal the
    sum of its emb_pq_codes d2_ticks."""
    from nyc_traffic_insight_spark.queries.textops import (
        _ADC_NQUERY,
        emb_pq_codes,
        sim_search_pq_adc,
    )

    own = (
        emb_pq_codes(spark, SF_SMOKE)
        .toPandas()
        .query(f"vec_id < {_ADC_NQUERY}")
        .groupby("vec_id")["d2_ticks"]
        .sum()
    )
    top = sim_search_pq_adc(spark, SF_SMOKE).toPandas()
    r1 = top[top["rank"] == 1].set_index("query_id")["adc_d2_ticks"]
    assert len(r1) == _ADC_NQUERY
    for q, floor_d2 in own.items():
        assert int(r1.loc[q]) == int(floor_d2), q


def test_pq_adc_plan_is_flag_free(spark):
    """The LUT (M·k rows per query) broadcasts onto the corpus codes:
    no BNLJ, no cartesian, no single-partition exchange — the corpus
    itself is only shuffled as (query, neighbor) partial sums."""
    from nyc_traffic_insight_spark.queries.textops import sim_search_pq_adc

    plan = (
        sim_search_pq_adc(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    own = plan.split("InMemoryTableScan")[0]
    assert "Exchange SinglePartition" not in own
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_matches_oracle(spark, duck_smoke):
    from nyc_traffic_insight_spark.queries.textops import (
        ivfpq_oracle_sql,
        pipeline_ann_ivfpq,
    )

    spdf = pipeline_ann_ivfpq(spark, SF_SMOKE).toPandas()
    odf = duck_smoke.execute(ivfpq_oracle_sql()).fetchdf()
    compare(spdf, odf, "pipeline_ann_ivfpq")


def test_ivfpq_structure_and_adc_consistency(spark):
    """Shape: 3 ranked rows per query, no self-matches, distances
    non-decreasing with rank. Consistency: IVF-PQ and the full-scan
    ADC baseline run the SAME distance machine, so any (query,
    neighbor) pair appearing in both top-k lists must carry the
    identical adc_d2_ticks."""
    from nyc_traffic_insight_spark.queries.textops import (
        _ADC_NQUERY,
        _ADC_TOPK,
        pipeline_ann_ivfpq,
        sim_search_pq_adc,
    )

    ivf = pipeline_ann_ivfpq(spark, SF_SMOKE).toPandas()
    assert len(ivf) == _ADC_NQUERY * _ADC_TOPK
    assert (ivf["query_id"] != ivf["neighbor_id"]).all()
    for _, g in ivf.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, _ADC_TOPK + 1))
        assert g["adc_d2_ticks"].is_monotonic_increasing
    adc = sim_search_pq_adc(spark, SF_SMOKE).toPandas()
    both = ivf.merge(
        adc,
        on=["query_id", "neighbor_id"],
        suffixes=("_ivf", "_adc"),
    )
    assert len(both) > 0, "top-k lists never overlap — vacuous check"
    assert (
        both["adc_d2_ticks_ivf"] == both["adc_d2_ticks_adc"]
    ).all()


def test_ivfpq_plan_is_flag_free(spark):
    """The composed plan inherits its parts' shapes: narrow coarse +
    code assignment, broadcast probes and LUT — no BNLJ, cartesian,
    or single-partition exchange anywhere."""
    from nyc_traffic_insight_spark.queries.textops import (
        pipeline_ann_ivfpq,
    )

    plan = (
        pipeline_ann_ivfpq(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    own = plan.split("InMemoryTableScan")[0]
    assert "Exchange SinglePartition" not in own
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pq_distortion_plan_one_group_exchange(spark):
    """The audit adds exactly ONE hash exchange (the map-side
    combinable (subspace, code) groupBy) and no SinglePartition."""
    from nyc_traffic_insight_spark.queries.textops import qa_pq_distortion

    plan = (
        qa_pq_distortion(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert _non_cache_exchanges(plan) == 1, f"expected 1 exchange:\n{plan[:3000]}"
    assert "Exchange SinglePartition" not in plan.split("InMemoryTableScan")[0]
