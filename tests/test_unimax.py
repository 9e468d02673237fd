"""sample_unimax_budget (round-12 preview): UniMax waterfilling.

The claim: allocate a 3-corpus-epoch token budget across languages
under a 4-epoch cap — small languages take full capacity, the rest
split the remainder evenly (Chung et al. 2023). Pinned before the r13
promotion:

1. a pure-Python waterfilling reference (the textbook sequential
   algorithm, NOT the closed form the SQL uses — so the prefix/j*
   algebra is verified, not copied) differentially fuzzed against the
   DuckDB fragment on random language tables;
2. Spark vs DuckDB row-exact on the real testdata documents table,
   driver-style, asserting BOTH branches fire at this fixture;
3. the allocation algebra: full set is a capacity-ascending prefix,
   every allocation respects the cap, the un-full languages share one
   water level, and allocations sum to the budget (exact arithmetic,
   pre-rounding).
"""

from __future__ import annotations

import math

import pytest

from nyc_traffic_insight_spark.queries.samplingq import (
    _UNIMAX_BUDGET_X,
    _UNIMAX_EPOCHS,
    sample_unimax_budget,
    unimax_alloc_sql,
    unimax_oracle_sql,
)
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect


def _r4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _ref_waterfill(lang_toks, epoch_cap, budget_x):
    """Sequential waterfilling: visit languages by ascending capacity,
    grant full capacity while it fits the running fair share, then
    split the remainder evenly."""
    total = sum(n for _, n in lang_toks)
    budget = total * budget_x
    rows = sorted(
        ((lang, n, n * epoch_cap) for lang, n in lang_toks),
        key=lambda r: (r[2], r[0]),
    )
    out = {}
    remaining, left = budget, len(rows)
    for i, (lang, n, c) in enumerate(rows):
        fair = remaining / left
        if c <= fair:
            out[lang] = (n, c, True, float(c))
            remaining -= c
            left -= 1
        else:
            # every remaining language shares the same water level
            for lang2, n2, c2 in rows[i:]:
                out[lang2] = (n2, c2, False, remaining / left)
            break
    return sorted(
        (lang, n, c, full, _r4(alloc), _r4(alloc / n))
        for lang, (n, c, full, alloc) in out.items()
    )


def _duck_langs(rows):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE lt(lang VARCHAR, n_tok BIGINT)")
    con.executemany("INSERT INTO lt VALUES (?, ?)", rows)
    return con


def test_fragment_matches_python_reference_fuzz():
    import random

    rng = random.Random(18)
    for trial in range(30):
        k = rng.randint(1, 12)
        rows = [
            (f"l{i:02d}", rng.randint(1, 10 ** rng.randint(1, 6)))
            for i in range(k)
        ]
        cap = rng.choice([1, 2, 4, 8])
        bx = rng.choice([1, 2, 3])  # bx < cap → water level can bind
        con = _duck_langs(rows)
        got = sorted(
            con.sql(unimax_alloc_sql("lt", cap, budget_x=bx)).fetchall()
        )
        assert got == _ref_waterfill(rows, cap, bx), (trial, rows, cap, bx)


def test_budget_exceeds_capacity_everyone_full():
    """budget_x >= epoch_cap → every language takes full capacity and
    the j* = k branch (no water level) must not divide by zero."""
    rows = [("aa", 10), ("bb", 1000), ("cc", 7)]
    con = _duck_langs(rows)
    got = con.sql(unimax_alloc_sql("lt", 2, budget_x=2)).fetchall()
    assert all(r[3] for r in got)  # is_full everywhere
    assert all(r[4] == float(r[2]) for r in got)


def test_budget_exceeds_capacity_everyone_full_spark(spark):
    """ADVICE r12: the everyone-full branch through the SPARK engine
    too — the shared fragment's water-level division is guarded by
    NULLIF, so an ANSI-mode or branch-eager evaluation of the unused
    else-branch cannot surface a divide-by-zero. Cross-engine exact
    on the same synthetic language table."""
    from nyc_traffic_insight_spark.queries.samplingq import _alloc_frame

    rows = [("aa", 10), ("bb", 1000), ("cc", 7)]
    lt = spark.createDataFrame(rows, "lang string, n_tok long")
    spdf = (
        _alloc_frame(spark, lt, 2, 2).toPandas().sort_values("lang")
    )
    assert spdf["is_full"].all()
    assert (spdf["alloc_tokens"] == spdf["capacity"].astype(float)).all()
    assert (spdf["epochs"] == 2.0).all()
    con = _duck_langs(rows)
    odf = con.sql(unimax_alloc_sql("lt", 2, budget_x=2)).fetchdf()
    compare(spdf, odf, "unimax_alloc[everyone_full]")


def test_spark_matches_duckdb_on_testdata(spark):
    """Driver-style row-exact compare on the real documents table —
    the exact check the r13 promotion's driver gate will run."""
    spdf = sample_unimax_budget(spark, SF_SMOKE).toPandas()
    con = duck_connect(SF_SMOKE)
    odf = con.execute(unimax_oracle_sql()).fetchdf()
    compare(spdf, odf, "sample_unimax_budget")
    # both branches carry weight at this fixture
    assert set(spdf["is_full"]) == {True, False}
    assert (spdf.loc[spdf["is_full"], "epochs"] == _UNIMAX_EPOCHS).all()


def test_allocation_algebra(spark):
    pdf = (
        sample_unimax_budget(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["capacity", "lang"])
        .reset_index(drop=True)
    )
    # the full set is a capacity-ascending prefix
    fulls = list(pdf["is_full"])
    assert fulls == sorted(fulls, reverse=True)
    # cap respected; un-full languages share one water level
    assert (pdf["alloc_tokens"] <= pdf["capacity"] + 1e-9).all()
    levels = set(pdf.loc[~pdf["is_full"], "alloc_tokens"])
    assert len(levels) <= 1
    # allocations sum to the budget (recompute exactly, pre-rounding)
    total = int(pdf["n_tokens"].sum())
    budget = total * _UNIMAX_BUDGET_X
    full_c = int(pdf.loc[pdf["is_full"], "capacity"].sum())
    n_unfull = int((~pdf["is_full"]).sum())
    if n_unfull:
        level = (budget - full_c) / n_unfull
        assert abs(full_c + level * n_unfull - budget) < 1e-6
        assert _r4(level) == next(iter(levels))


# ----------------- sample_unimax_apply (the materialization half)


def _md5_draw32(doc_id: int) -> int:
    import hashlib

    return int(
        hashlib.md5(str(doc_id).encode()).hexdigest()[24:32], 16
    )


def _ref_apply(texts, langs, epoch_cap, budget_x):
    """Reference: per-lang whitespace token sums -> waterfill ->
    floor(epochs) + md5-coin on the fractional part."""
    import re

    lt: dict = {}
    for t, lang in zip(texts, langs):
        lt[lang] = lt.get(lang, 0) + len(re.split(r"\s+", t.strip()))
    alloc = {
        r[0]: r[5] for r in _ref_waterfill(list(lt.items()), epoch_cap, budget_x)
    }  # lang -> epochs (r4)
    out = []
    for doc_id, lang in enumerate(langs):
        e = alloc[lang]
        whole = math.floor(e)
        thr = math.floor((e - whole) * 4294967296.0)
        out.append(
            (doc_id, lang, e, whole + (1 if _md5_draw32(doc_id) < thr else 0))
        )
    return sorted(out)


def _duck_docs(texts, langs):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(i, t, langs[i]) for i, t in enumerate(texts)],
    )
    return con


def test_apply_oracle_matches_python_reference_fuzz():
    import random

    from nyc_traffic_insight_spark.queries.samplingq import (
        unimax_apply_oracle_sql,
    )

    rng = random.Random(19)
    for trial in range(12):
        n = rng.randint(2, 40)
        texts = [
            " ".join("w" for _ in range(rng.randint(1, 30)))
            for _ in range(n)
        ]
        langs = [rng.choice(["en", "de", "fr"]) for _ in range(n)]
        cap = rng.choice([2, 4])
        bx = rng.choice([1, 3])
        con = _duck_docs(texts, langs)
        got = sorted(
            con.sql(
                unimax_apply_oracle_sql("documents", cap, bx)
            ).fetchall()
        )
        assert got == _ref_apply(texts, langs, cap, bx), trial


def test_apply_spark_matches_duckdb_on_testdata(spark):
    from nyc_traffic_insight_spark.queries.samplingq import (
        sample_unimax_apply,
        unimax_apply_oracle_sql,
    )

    spdf = sample_unimax_apply(spark, SF_SMOKE).toPandas()
    con = duck_connect(SF_SMOKE)
    odf = con.execute(unimax_apply_oracle_sql()).fetchdf()
    compare(spdf, odf, "sample_unimax_apply")
    assert len(spdf) == 500
    # repeat counts live in {floor(e), floor(e)+1}; full-capacity
    # languages repeat exactly epoch_cap times
    import numpy as np

    whole = np.floor(spdf["epochs"])
    assert ((spdf["n_repeats"] == whole) | (spdf["n_repeats"] == whole + 1)).all()
    full = spdf[spdf["epochs"] == _UNIMAX_EPOCHS]
    assert len(full) > 0 and (full["n_repeats"] == _UNIMAX_EPOCHS).all()
    # the coin fires both ways somewhere on the fractional languages
    fracs = spdf[spdf["epochs"] != np.floor(spdf["epochs"])]
    assert set(fracs["n_repeats"] - np.floor(fracs["epochs"])) == {0.0, 1.0}


def test_nondefault_budget_threads_through_spark(spark):
    """Review r12: budget_x must reach the Spark-side allocation —
    a dropped parameter would diverge from the oracle only on
    non-default calls, invisible to the default-args gate. Run both
    operators at budget_x=1 cross-engine."""
    from nyc_traffic_insight_spark.queries.samplingq import (
        sample_unimax_apply,
        unimax_apply_oracle_sql,
    )

    con = duck_connect(SF_SMOKE)
    spdf = sample_unimax_budget(spark, SF_SMOKE, budget_x=1).toPandas()
    odf = con.execute(unimax_oracle_sql(budget_x=1)).fetchdf()
    compare(spdf, odf, "sample_unimax_budget[bx=1]")
    assert not spdf["is_full"].any()  # one corpus epoch under a 4-cap
    spdf2 = sample_unimax_apply(spark, SF_SMOKE, budget_x=1).toPandas()
    odf2 = con.execute(unimax_apply_oracle_sql(budget_x=1)).fetchdf()
    compare(spdf2, odf2, "sample_unimax_apply[bx=1]")
