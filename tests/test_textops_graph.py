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


def _cdc_chunks_ref(text, w=32, d=64):
    """Python reference of chunk_cdc's exact definition."""
    import hashlib

    cuts = [
        i
        for i in range(w, len(text) + 1)
        if int(
            hashlib.md5(text[i - w:i].encode()).hexdigest()[:8], 16
        ) % d == 0
    ]
    bounds = sorted(set([0] + cuts + [len(text)]))
    return [
        (s + 1, text[s:e]) for s, e in zip(bounds, bounds[1:])
    ]


def test_chunk_cdc_matches_python_reference(spark):
    import random

    from nyc_traffic_insight_spark.queries.textops import chunk_cdc

    rng = random.Random(7)
    texts = [
        "".join(rng.choice("abcdef ") for _ in range(rng.randint(1, 400)))
        for _ in range(20)
    ]
    # Explicit sub-window lengths: seed 7's 1-400 draw happens to
    # produce nothing under 32 chars, which is exactly the path where
    # sequence(W, len) would descend and emit phantom cuts — pin the
    # boundary (1, 16, 31, 32, 33) and a dense random sweep of 1-31.
    texts += [
        "".join(rng.choice("abcdef ") for _ in range(n))
        for n in (1, 16, 31, 32, 33)
    ]
    texts += [
        "".join(rng.choice("abcdef ") for _ in range(rng.randint(1, 31)))
        for _ in range(200)
    ]
    # Multibyte coverage: length/substring are CHARACTER-based on both
    # engines while md5 hashes UTF-8 BYTES — the differential pins that
    # Spark's spelling matches Python slicing + .encode() on 2-, 3-
    # and 4-byte code points (the parquet corpus is ASCII, so without
    # this the unicode path would ride untested).
    texts += [
        "".join(rng.choice("abcdef éü汉字🚀 ") for _ in range(rng.randint(1, 120)))
        for _ in range(30)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    got = {}
    for r in chunk_cdc(df).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_start"], r["chunk"]))
    for i, t in enumerate(texts):
        assert sorted(got[i]) == _cdc_chunks_ref(t), i


def test_chunk_cdc_is_shift_invariant_over_shared_region(spark):
    """The property tiling lacks: a prefix edit shifts offsets but the
    chunk SET over the unchanged region is identical — only chunks
    overlapping the edit (the first W-1 chars of the shared region)
    can differ, so the shared-suffix chunk multisets agree except for
    at most one leading chunk per doc."""
    import random

    from nyc_traffic_insight_spark.queries.textops import chunk_cdc

    rng = random.Random(13)
    shared = "".join(rng.choice("abcdef ") for _ in range(600))
    df = spark.createDataFrame(
        [(1, shared), (2, "PREFIX-17-chars!!" + shared)],
        "doc_id INT, text STRING",
    )
    by_doc = {1: set(), 2: set()}
    for r in chunk_cdc(df).collect():
        by_doc[r["doc_id"]].add(r["chunk"])
    common = by_doc[1] & by_doc[2]
    # all but the first chunk of each doc must be common
    assert len(by_doc[1] - common) <= 1
    assert len(by_doc[2] - common) <= 1
    assert len(common) >= 3  # the shared tail really was re-found


def test_cdc_catches_the_misaligned_duplicate_tiling_misses(spark, tmp_path):
    """The exact planted case test_substring_dedup_alignment_recall_
    property documents as MISSED by stride tiling: the same block at
    offsets 0 and 17. The CDC inventory must report shared spans."""
    import random

    import pandas as pd

    from nyc_traffic_insight_spark.queries.textops import (
        dedup_substring_cdc,
    )

    rng = random.Random(99)
    block = "".join(rng.choice("abcdef ") for _ in range(400))
    docs = pd.DataFrame(
        {
            "doc_id": [3, 4],
            "source": ["t", "t"],
            "text": [block + "z" * 120, "m" * 17 + block + "w" * 120],
        }
    )
    sf_dir = tmp_path / "sf_misaligned_cdc"
    sf_dir.mkdir()
    docs.to_parquet(sf_dir / "documents.parquet")
    shared = dedup_substring_cdc(spark, str(sf_dir)).collect()
    assert len(shared) >= 1
    assert all(r["n_docs"] == 2 for r in shared)


def test_cdc_oracle_spelling_matches_python_on_unicode():
    """The registered dedup_substring_cdc oracle's chunking fragment —
    THE SAME generated SQL text the @register oracle is assembled from
    (textops._cdc_chunks_oracle_cte; W/D interpolated from _CDC_W/
    _CDC_D, so this cannot silently test a stale copy) — against the
    Python reference on multibyte text. The driver's cross-engine
    check only ever feeds it the ASCII parquet corpus; this pins that
    the DuckDB spelling is character-correct (substr/length) and
    byte-correct (md5 over UTF-8) for 2-/3-/4-byte code points too,
    so the oracle stays valid if the corpus gains unicode."""
    import random

    import duckdb

    from nyc_traffic_insight_spark.queries.textops import (
        _CDC_D,
        _CDC_W,
        _cdc_chunks_oracle_cte,
    )

    rng = random.Random(99)
    texts = [
        "".join(rng.choice("abcdef éü汉字🚀 ") for _ in range(rng.randint(1, 200)))
        for _ in range(30)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    got: dict[int, list] = {}
    for doc, cs, ch in con.sql(
        _cdc_chunks_oracle_cte("t")
        + " SELECT doc_id, chunk_start, chunk FROM ch"
    ).fetchall():
        got.setdefault(doc, []).append((cs, ch))
    for i, t in enumerate(texts):
        assert sorted(got.get(i, [])) == _cdc_chunks_ref(t, w=_CDC_W, d=_CDC_D), i
