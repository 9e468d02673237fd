"""min_label_components vs Python union-find on adversarial graphs.

The registered dedup_connected_components entry exercises the
propagation only on the fixture's shallow near-dup clusters (and its
DuckDB oracle is an independent recursive-CTE closure, so the hash
already cross-checks THAT graph). Here the extracted operator is
differentially tested on graph shapes the fixture never produces —
long paths (diameter stress for the round bound), cycles, stars,
multiple components, a random graph — and the non-convergence guard
is pinned to RAISE rather than return partial labels.
"""

from __future__ import annotations

import random

import pytest

from nyc_traffic_insight_spark.queries.textops import min_label_components


def _union_find_components(edges, vertices):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for v in vertices:
        roots.setdefault(find(v), []).append(v)
    return {v: min(vs) for vs in roots.values() for v in vs}


def _check(spark, edges, max_rounds=20):
    vertices = sorted({v for e in edges for v in e})
    df = spark.createDataFrame(edges, "doc1 BIGINT, doc2 BIGINT")
    got = {
        r["v"]: r["label"]
        for r in min_label_components(
            df, "doc1", "doc2", max_rounds=max_rounds
        ).collect()
    }
    assert got == _union_find_components(edges, vertices)


def test_path_cycle_star_and_two_components(spark):
    path = [(i, i + 1) for i in range(10, 25)]  # diameter 15 < 20
    cycle = [(100 + i, 100 + (i + 1) % 8) for i in range(8)]
    star = [(200, 200 + i) for i in range(1, 12)]
    _check(spark, path + cycle + star)


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(45)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_deep_path_converges_with_raised_bound(spark):
    deep = [(i, i + 1) for i in range(30)]  # diameter 30 > default 20
    _check(spark, deep, max_rounds=40)


def test_nonconvergence_raises_instead_of_partial_labels(spark):
    deep = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(deep, "doc1 BIGINT, doc2 BIGINT")
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(df, "doc1", "doc2", max_rounds=5)
