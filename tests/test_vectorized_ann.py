"""Vectorized ANN scorer vs the exact JVM-HOF baseline.

The numpy path sums in pairwise/SIMD order, so cosines differ from the
sequential fold in the last ulp and exact rank equality is not
guaranteed — recall and score agreement are the correct contracts.
"""

from __future__ import annotations

from nyc_traffic_insight_spark.queries import load_all
from tests.conftest import SF_SMOKE


def test_vectorized_topk_recall(spark):
    specs = load_all()
    exact = specs["sim_search_bruteforce_topk"].builder(spark, SF_SMOKE).collect()
    fast = specs["sim_search_topk_vectorized"].builder(spark, SF_SMOKE).collect()

    def by_query(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    a, b = by_query(exact), by_query(fast)
    assert set(a) == set(b)
    total = hits = 0
    for q in a:
        total += len(a[q])
        hits += len(a[q] & b[q])
    assert hits / total >= 0.99, f"recall {hits/total:.3f}"

    # scores for shared (query, neighbor) pairs agree at the rounded 4dp
    ae = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    af = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in fast}
    for key in set(ae) & set(af):
        assert abs(ae[key] - af[key]) <= 1e-4, (key, ae[key], af[key])
