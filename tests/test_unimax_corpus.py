"""pipeline_unimax_corpus (round-12 preview): curate-then-allocate.

The composed operator must equal composing the standalone machines BY
HAND — dedup_exact's keep rule, the eval slice, the fuzzy-decon
flags, then the UniMax allocation RE-SCOPED to the survivors (not the
raw corpus: dropping one language's docs moves every language's water
level). Pinned by a full reference recomputation from the registered
parts, a driver-style cross-engine compare, a re-scoping witness, and
a synthetic exact-duplicate fuzz (the real fixture has exact dups
only at sf0.1, so the canonical branch gets synthetic coverage
here)."""

from __future__ import annotations

import math

from nyc_traffic_insight_spark.queries.samplingq import (
    _UNIMAX_BUDGET_X,
    _UNIMAX_EPOCHS,
    pipeline_unimax_corpus,
    sample_unimax_budget,
    unimax_corpus_oracle_sql,
)
from nyc_traffic_insight_spark.queries.textops import (
    _DECON_EVAL_MOD,
    text_decontaminate_fuzzy,
)
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect
from tests.test_unimax import _md5_draw32, _ref_waterfill


def test_spark_matches_duckdb_on_testdata(spark):
    spdf = pipeline_unimax_corpus(spark, SF_SMOKE).toPandas()
    con = duck_connect(SF_SMOKE)
    odf = con.execute(unimax_corpus_oracle_sql()).fetchdf()
    compare(spdf, odf, "pipeline_unimax_corpus")
    assert len(spdf) == 500


def test_composition_equals_parts(spark):
    """Recompose from the registered parts: flags from the fuzzy-decon
    output and the eval mod, survivor token sums from the documents
    table, the waterfill reference, the md5 coin."""
    import re

    from nyc_traffic_insight_spark.sources import load_table

    docs = {
        r["doc_id"]: (r["lang"], r["text"])
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    }
    contaminated = {
        r["doc_id"]
        for r in text_decontaminate_fuzzy(spark, SF_SMOKE).collect()
    }
    first_by_text: dict = {}
    for doc_id in sorted(docs):
        first_by_text.setdefault(docs[doc_id][1], doc_id)
    surv_tokens: dict = {}
    surviving = set()
    for doc_id, (lang, text) in docs.items():
        if (
            first_by_text[text] == doc_id
            and doc_id % _DECON_EVAL_MOD != 0
            and doc_id not in contaminated
        ):
            surviving.add(doc_id)
            surv_tokens[lang] = surv_tokens.get(lang, 0) + len(
                re.split(r"\s+", text.strip())
            )
    epochs = {
        r[0]: r[5]
        for r in _ref_waterfill(
            list(surv_tokens.items()), _UNIMAX_EPOCHS, _UNIMAX_BUDGET_X
        )
    }
    got = {
        r["doc_id"]: r
        for r in pipeline_unimax_corpus(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(docs)
    for doc_id, (lang, text) in docs.items():
        row = got[doc_id]
        assert row["is_canonical"] == (first_by_text[text] == doc_id)
        assert row["is_eval"] == (doc_id % _DECON_EVAL_MOD == 0)
        assert row["is_contaminated"] == (doc_id in contaminated)
        if doc_id not in surviving:
            assert row["n_repeats"] == 0, doc_id
        else:
            e = epochs[lang]
            whole = math.floor(e)
            thr = math.floor((e - whole) * 4294967296.0)
            want = whole + (1 if _md5_draw32(doc_id) < thr else 0)
            assert row["n_repeats"] == want, (doc_id, e)


def test_allocation_is_rescoped_to_survivors(spark):
    """The composed allocation must differ from the raw-corpus one —
    the eval/contaminated drops change the per-language token sums,
    so joining the standalone budget onto the flags would be wrong."""
    raw = {
        r["lang"]: r["epochs"]
        for r in sample_unimax_budget(spark, SF_SMOKE).collect()
    }
    pdf = pipeline_unimax_corpus(spark, SF_SMOKE).toPandas()
    surv = pdf[
        pdf.is_canonical & ~pdf.is_eval & ~pdf.is_contaminated
    ]
    # back out each lang's composed repeat mean; for at least one
    # fractional-epoch language it must differ from the raw epochs
    # (identical values would mean the re-scoping is not happening)
    diffs = 0
    for lang, grp in surv.groupby("lang"):
        mean = grp["n_repeats"].mean()
        if abs(mean - raw[lang]) > 0.02:
            diffs += 1
    assert diffs > 0


def test_synthetic_exact_dups_lose_their_repeats(spark, tmp_path):
    """The canonical branch, exercised synthetically (the fixture has
    exact dups only at sf0.1): duplicated texts keep repeats only on
    the min doc_id."""
    import pandas as pd

    texts = ["alpha beta gamma delta"] * 3 + [
        "one two three four five six",
        "seven eight nine ten eleven",
    ]
    sf_dir = tmp_path / "sf_dup"
    sf_dir.mkdir()
    pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "source": pd.array(["t"] * len(texts), dtype="string"),
            "lang": pd.array(["en"] * len(texts), dtype="string"),
            "text": pd.array(texts, dtype="string"),
        }
    ).to_parquet(sf_dir / "documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in pipeline_unimax_corpus(spark, str(sf_dir)).collect()
    }
    # doc 0 is eval (0 % 97 == 0): dropped. docs 1, 2 duplicate doc
    # 0's text; doc 1 is the surviving canonical copy, doc 2 is not
    assert rows[0]["is_eval"] and rows[0]["n_repeats"] == 0
    assert rows[1]["is_canonical"] is False  # doc 0 holds the hash
    assert rows[2]["is_canonical"] is False
    assert rows[1]["n_repeats"] == 0 and rows[2]["n_repeats"] == 0
    assert rows[3]["n_repeats"] > 0 and rows[4]["n_repeats"] > 0
