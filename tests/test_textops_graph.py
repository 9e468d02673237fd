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


def test_substring_dedup_alignment_recall_property(spark, tmp_path):
    """Pin dedup_substring_exact's documented recall property on
    planted inputs the fixture never produces: a 160-char block shared
    at stride-congruent offsets IS caught; the SAME block pasted at a
    misaligned offset yields zero matching windows at any length —
    tiling's documented gap vs a suffix array. Runs the registered
    builder against a purpose-built documents.parquet."""
    import pandas as pd

    from nyc_traffic_insight_spark.queries import load_all

    block = ("boilerplate-" * 20)[:160]  # 160 chars = 2 full windows
    pad_a = "a" * 40
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "source": ["t"] * 4,
            # doc1: block at offset 0; doc2: block at offset 40
            # (congruent mod 40 -> shared grid -> CAUGHT)
            "text": [
                block + "x" * 120,
                pad_a + block + "y" * 120,
                # doc3/doc4: same block but offsets 0 vs 17
                # (misaligned -> every window samples different chars
                # -> MISSED, at any region length)
                block + "z" * 120,
                "m" * 17 + block + "w" * 120,
            ],
        }
    )
    sf_dir = tmp_path / "sf_planted"
    sf_dir.mkdir()
    docs.iloc[:2].to_parquet(sf_dir / "documents.parquet")
    aligned = load_all()["dedup_substring_exact"].builder(
        spark, str(sf_dir)
    ).collect()
    assert len(aligned) >= 1  # the shared grid windows were caught

    sf_dir2 = tmp_path / "sf_misaligned"
    sf_dir2.mkdir()
    docs.iloc[2:].to_parquet(sf_dir2 / "documents.parquet")
    misaligned = load_all()["dedup_substring_exact"].builder(
        spark, str(sf_dir2)
    ).collect()
    assert misaligned == []  # tiling's documented miss
