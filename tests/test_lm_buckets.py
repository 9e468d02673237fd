"""lm_ppl_buckets (round-12 preview): CCNet head/middle/tail split.

The claim: rank every scoreable document by bigram-LM perplexity
WITHIN ITS LANGUAGE and ntile(3) — Wenzek et al. 2020's §4.3 filter,
composed from the already-proven LM scorer fragments. Pinned before
the r13 promotion:

1. a pure-Python reference (the scorer reference from test_lm_train
   plus an explicit SQL-standard ntile fill) vs the DuckDB oracle on
   synthetic corpora with a lang column;
2. the same reference vs the SPARK builder;
3. Spark vs DuckDB row-exact on the real testdata documents table,
   driver-style (the compare the r13 promotion's driver gate runs);
4. the bucket algebra: per-lang bucket sizes differ by at most one,
   bucket boundaries respect the (ppl, doc_id) order, every scoreable
   doc appears exactly once.
"""

from __future__ import annotations

import pytest

from nyc_traffic_insight_spark.queries.tokenizers import (
    _PPL_BUCKETS,
    lm_buckets_oracle_sql,
    lm_ppl_buckets,
)
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect
from tests.test_lm_train import _TINY_CAP, _lm_score_ref


def _ref_buckets(texts, langs, cap, nb):
    """Reference: score via the test_lm_train reference, then the
    SQL-standard ntile within lang — the first (n mod nb) buckets take
    the extra row — over (ppl, doc_id) order."""
    scores = _lm_score_ref(texts, cap)  # [(doc_id, n_bigrams, ppl)]
    by_lang: dict = {}
    for doc_id, _n, ppl in scores:
        by_lang.setdefault(langs[doc_id], []).append((ppl, doc_id))
    out = []
    for lang, rows in by_lang.items():
        rows.sort()
        n = len(rows)
        base, extra = divmod(n, nb)
        idx = 0
        for b in range(1, nb + 1):
            # parametric label rule (matches _ppl_label_case): bucket 1
            # is head, bucket nb is tail, everything between middle
            label = "head" if b == 1 else ("tail" if b == nb else "middle")
            size = base + (1 if b <= extra else 0)
            for _ in range(size):
                ppl, doc_id = rows[idx]
                out.append((doc_id, lang, ppl, b, label))
                idx += 1
    return sorted(out)


def _duck_on(texts, langs):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    if texts:
        con.executemany(
            "INSERT INTO docs VALUES (?, ?, ?)",
            [(i, t, langs[i]) for i, t in enumerate(texts)],
        )
    return con


def test_oracle_matches_python_reference_fuzz():
    import random

    rng = random.Random(14)
    for trial in range(8):
        texts = [
            " ".join(
                rng.choice(["aa", "ab", "ba", "bb", "cc", "dd", "e"])
                for _ in range(rng.randint(2, 25))
            )
            for _ in range(rng.randint(3, 12))
        ]
        langs = [rng.choice(["en", "de"]) for _ in texts]
        con = _duck_on(texts, langs)  # keep the ref: GC closes the conn
        got = sorted(
            con.sql(
                lm_buckets_oracle_sql("docs", cap=_TINY_CAP)
            ).fetchall()
        )
        assert got == _ref_buckets(texts, langs, _TINY_CAP, _PPL_BUCKETS), (
            trial
        )
        # non-default bucket counts keep labels consistent with the
        # parametric rule (nb=2: head/tail only, no middle)
        got2 = sorted(
            con.sql(
                lm_buckets_oracle_sql("docs", cap=_TINY_CAP, nb=2)
            ).fetchall()
        )
        assert got2 == _ref_buckets(texts, langs, _TINY_CAP, 2), trial
        assert not any(r[4] == "middle" for r in got2)


def test_spark_matches_python_reference(spark, tmp_path):
    import random

    import pandas as pd

    rng = random.Random(15)
    texts = [
        " ".join(
            rng.choice(["aa", "ab", "ba", "bb", "cc"])
            for _ in range(rng.randint(2, 25))
        )
        for _ in range(10)
    ]
    langs = [rng.choice(["en", "de", "fr"]) for _ in texts]
    sf_dir = tmp_path / "sf_lmb"
    sf_dir.mkdir()
    pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "source": pd.array(["t"] * len(texts), dtype="string"),
            "lang": pd.array(langs, dtype="string"),
            "text": pd.array(texts, dtype="string"),
        }
    ).to_parquet(sf_dir / "documents.parquet")
    got = sorted(
        (r["doc_id"], r["lang"], r["ppl"], r["ppl_bucket"], r["bucket_label"])
        for r in lm_ppl_buckets(spark, str(sf_dir), cap=_TINY_CAP).collect()
    )
    assert got == _ref_buckets(texts, langs, _TINY_CAP, _PPL_BUCKETS)


def test_spark_matches_duckdb_on_testdata(spark):
    """Driver-style row-exact compare on the real documents table —
    the exact check the r13 promotion's driver gate will run."""
    spdf = lm_ppl_buckets(spark, SF_SMOKE).toPandas()
    con = duck_connect(SF_SMOKE)
    odf = con.execute(lm_buckets_oracle_sql()).fetchdf()
    compare(spdf, odf, "lm_ppl_buckets")
    assert len(spdf) == 500  # every fixture doc has >= 2 tokens


def test_bucket_algebra_on_testdata(spark):
    pdf = lm_ppl_buckets(spark, SF_SMOKE).toPandas()
    assert pdf["doc_id"].is_unique
    for lang, grp in pdf.groupby("lang"):
        sizes = grp.groupby("ppl_bucket").size()
        assert set(sizes.index) <= {1, 2, 3}
        assert sizes.max() - sizes.min() <= 1  # ntile balance
        # boundaries respect the (ppl, doc_id) order: the worst head
        # key precedes the best middle key, etc.
        key = grp.assign(k=list(zip(grp["ppl"], grp["doc_id"])))
        for lo, hi in ((1, 2), (2, 3)):
            a = key.loc[key["ppl_bucket"] == lo, "k"]
            b = key.loc[key["ppl_bucket"] == hi, "k"]
            if len(a) and len(b):
                assert max(a) < min(b), (lang, lo, hi)
    assert set(pdf["bucket_label"]) == {"head", "middle", "tail"}
