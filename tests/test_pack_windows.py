"""pack_context_windows (round-12 preview): GPT-style concat-and-chunk
sequence packing via a two-phase distributed prefix sum.

Pinned before the r13 promotion:

1. a pure-Python reference (sequential integer prefix over doc_id
   order) differentially fuzzed against the DuckDB oracle text on
   random corpora;
2. the same reference vs the SPARK frame, including bucket sizes that
   force the two-phase decomposition through many buckets;
3. two-phase invariance: any bucket size produces the identical frame
   (the decomposition is layout, not semantics);
4. Spark vs DuckDB row-exact on the real testdata documents table,
   driver-style (the compare the r13 promotion's driver gate will
   run);
5. the tiling algebra (token intervals are contiguous and windows
   cover them) and the plan contract (the only global-order window
   runs on the BUCKET table — corpus windows are per-bucket).
"""

from __future__ import annotations

import re

import pytest

from nyc_traffic_insight_spark.queries.textops import (
    _CTX_LEN,
    _PACK_BUCKET,
    pack_context_windows,
    pack_manifest_frame,
    pack_manifest_oracle_sql,
    pack_window_manifest,
    pack_windows_frame,
    pack_windows_oracle_sql,
)
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect


def _ref_pack(texts, ctx_len):
    """Reference: whitespace-token counts (split-of-trimmed, the
    engines' shared idiom — an empty/blank text counts 1, the empty
    string token), exclusive prefix in doc_id order, floor-div spans."""
    out = []
    start = 0
    for doc_id, t in enumerate(texts):
        n = len(re.split(r"\s+", t.strip()))
        first = start // ctx_len
        last = (start + n - 1) // ctx_len
        out.append((doc_id, n, start, first, last, last - first + 1))
        start += n
    return out


def _duck_on(texts):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    if texts:
        con.executemany(
            "INSERT INTO docs VALUES (?, ?)", list(enumerate(texts))
        )
    return con


def _rand_texts(rng, n_docs):
    return [
        " ".join("w%d" % rng.randint(0, 9) for _ in range(rng.randint(0, 40)))
        for _ in range(n_docs)
    ]


def test_oracle_matches_python_reference_fuzz():
    import random

    rng = random.Random(12)
    for trial in range(12):
        texts = _rand_texts(rng, rng.randint(1, 60))
        ctx = rng.choice([4, 16, 64])
        con = _duck_on(texts)  # keep the ref: GC closes the conn
        got = sorted(
            con.sql(pack_windows_oracle_sql("docs", ctx_len=ctx)).fetchall()
        )
        assert got == _ref_pack(texts, ctx), (trial, ctx)


def test_spark_matches_python_reference(spark):
    import random

    rng = random.Random(13)
    for trial in range(3):
        texts = _rand_texts(rng, 50)
        e = spark.createDataFrame(
            list(enumerate(texts)), "doc_id BIGINT, text STRING"
        )
        for bucket in (7, 10**9):  # many buckets / one bucket
            got = sorted(
                tuple(r)
                for r in pack_windows_frame(e, 16, bucket).collect()
            )
            assert got == _ref_pack(texts, 16), (trial, bucket)


def test_two_phase_bucket_size_is_layout_not_semantics(spark):
    """Any bucket size yields the identical frame — the decomposition
    must never leak into the numbers."""
    base = sorted(
        tuple(r)
        for r in pack_windows_frame(
            __import__(
                "nyc_traffic_insight_spark.queries.textops",
                fromlist=["_docs"],
            )._docs(spark, SF_SMOKE),
            _CTX_LEN,
            3,
        ).collect()
    )
    again = sorted(
        tuple(r) for r in pack_context_windows(spark, SF_SMOKE).collect()
    )
    assert base == again


def test_spark_matches_duckdb_on_testdata(spark):
    """Driver-style row-exact compare on the real documents table —
    the exact check the r13 promotion's driver gate will run."""
    spdf = pack_context_windows(spark, SF_SMOKE).toPandas()
    con = duck_connect(SF_SMOKE)
    odf = con.execute(pack_windows_oracle_sql()).fetchdf()
    compare(spdf, odf, "pack_context_windows")
    # preview sanity: the chunking actually splits some docs across
    # window boundaries, and the stream spans many windows
    assert len(spdf) == 500
    assert int((spdf["n_windows"] > 1).sum()) > 0
    assert int(spdf["last_window"].max()) > 10


def test_tiling_algebra(spark):
    """Token intervals are contiguous (each doc starts where the
    previous ended) and the span arithmetic covers them exactly."""
    rows = sorted(
        (r["doc_id"], r["n_tok"], r["tok_start"], r["first_window"],
         r["last_window"], r["n_windows"])
        for r in pack_context_windows(spark, SF_SMOKE).collect()
    )
    expect_start = 0
    for _doc, n, start, first, last, nw in rows:
        assert start == expect_start
        assert n >= 1  # split-of-trimmed never yields zero tokens
        assert first == start // _CTX_LEN
        assert last == (start + n - 1) // _CTX_LEN
        assert nw == last - first + 1 >= 1
        expect_start = start + n


def test_only_the_bucket_table_windows_globally(spark):
    """The plan contract: exactly one single-partition exchange — the
    exclusive prefix over the corpus/B-row BUCKET table — and never a
    corpus-sized global-order window."""
    df = pack_context_windows(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") == 1, plan[:2000]


# ---------------- pack_window_manifest (the window-centric companion)


def _ref_manifest(texts, ctx_len):
    """Reference per-window rollup from the doc-span reference."""
    spans = _ref_pack(texts, ctx_len)
    agg: dict = {}
    for doc_id, n, start, first, last, _nw in spans:
        for w in range(first, last + 1):
            lo, hi = w * ctx_len, (w + 1) * ctx_len
            plen = min(start + n, hi) - max(start, lo)
            e = agg.setdefault(
                w, [0, 0, doc_id, doc_id, False, False]
            )
            e[0] += 1
            e[1] += plen
            e[2] = min(e[2], doc_id)
            e[3] = max(e[3], doc_id)
            e[4] = e[4] or start < lo
            e[5] = e[5] or start + n > hi
    return sorted((w, *v) for w, v in agg.items())


def test_manifest_oracle_matches_python_reference_fuzz():
    import random

    rng = random.Random(16)
    for trial in range(10):
        texts = _rand_texts(rng, rng.randint(1, 50))
        ctx = rng.choice([4, 16, 64])
        con = _duck_on(texts)
        got = sorted(
            con.sql(
                pack_manifest_oracle_sql("docs", ctx_len=ctx)
            ).fetchall()
        )
        assert got == _ref_manifest(texts, ctx), (trial, ctx)


def test_manifest_spark_matches_python_reference(spark):
    import random

    rng = random.Random(17)
    texts = _rand_texts(rng, 40)
    e = spark.createDataFrame(
        list(enumerate(texts)), "doc_id BIGINT, text STRING"
    )
    got = sorted(
        tuple(r) for r in pack_manifest_frame(e, 16, 7).collect()
    )
    assert got == _ref_manifest(texts, 16)


def test_manifest_spark_matches_duckdb_on_testdata(spark):
    spdf = pack_window_manifest(spark, SF_SMOKE).toPandas()
    con = duck_connect(SF_SMOKE)
    odf = con.execute(pack_manifest_oracle_sql()).fetchdf()
    compare(spdf, odf, "pack_window_manifest")


def test_manifest_fill_algebra(spark):
    """Every window except the last is exactly full; window ids are
    dense from 0; the doc- and window-views agree on total tokens."""
    man = sorted(
        (r["window_id"], r["n_tokens"], r["n_docs"])
        for r in pack_window_manifest(spark, SF_SMOKE).collect()
    )
    ids = [w for w, _, _ in man]
    assert ids == list(range(len(ids)))
    for w, n_tokens, n_docs in man[:-1]:
        assert n_tokens == _CTX_LEN, (w, n_tokens)
        assert 1 <= n_docs <= _CTX_LEN + 1
    assert 0 < man[-1][1] <= _CTX_LEN
    spans = pack_context_windows(spark, SF_SMOKE).collect()
    assert sum(r["n_tok"] for r in spans) == sum(t for _, t, _ in man)
