"""text_decontaminate_fuzzy (round-12 preview): MinHash-verified
near-duplicate eval contamination.

The operator is a composition of two byte-shared machines (banding
candidates + exact-Jaccard verify, the dedup_minhash_lsh fragments)
with an eval-xor split and a min-witness window — so the tests derive
the expected rows FROM dedup_minhash_lsh's registered output and
require exact agreement, then cross-check Spark vs DuckDB
driver-style on testdata.
"""

from __future__ import annotations

from nyc_traffic_insight_spark.queries.textops import (
    _DECON_EVAL_MOD,
    decon_fuzzy_oracle_sql,
    dedup_minhash_lsh,
    text_decontaminate,
    text_decontaminate_fuzzy,
)
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect


def test_consistent_with_the_lsh_machine(spark):
    """Expected rows recomputed from dedup_minhash_lsh's output: keep
    train×eval pairs, group by the train doc, take the min eval
    witness and that pair's jaccard."""
    lsh = dedup_minhash_lsh(spark, SF_SMOKE).collect()
    want: dict = {}
    for r in lsh:
        e1 = r["doc1"] % _DECON_EVAL_MOD == 0
        e2 = r["doc2"] % _DECON_EVAL_MOD == 0
        if e1 == e2:
            continue
        doc, ev = (r["doc2"], r["doc1"]) if e1 else (r["doc1"], r["doc2"])
        if doc not in want or ev < want[doc][0]:
            want[doc] = (ev, r["jaccard"])
    got = {
        r["doc_id"]: (r["eval_witness"], r["jaccard"])
        for r in text_decontaminate_fuzzy(spark, SF_SMOKE).collect()
    }
    assert got == want
    # non-degenerate at this fixture: the near-dup cluster around the
    # eval slice produces real flags, and no eval doc flags itself
    assert len(got) > 0
    assert all(d % _DECON_EVAL_MOD != 0 for d in got)
    assert all(w % _DECON_EVAL_MOD == 0 for w, _ in got.values())


def test_spark_matches_duckdb_on_testdata(spark):
    """Driver-style row-exact compare — the check the r13 promotion's
    driver gate will run."""
    spdf = text_decontaminate_fuzzy(spark, SF_SMOKE).toPandas()
    con = duck_connect(SF_SMOKE)
    odf = con.execute(decon_fuzzy_oracle_sql()).fetchdf()
    compare(spdf, odf, "text_decontaminate_fuzzy")


def test_complements_the_exact_filter(spark):
    """The fuzzy flags catch genuine near-dups: a flagged doc whose
    shared-shingle count with the eval set reaches the exact filter's
    ≥2 bar must ALSO be flagged there — the fuzzy operator's value is
    the WITNESS and the score. (fuzzy ⊆ exact outright is NOT an
    operator property: a single-shingle doc can hit jaccard 1.0 with
    n_shared = 1, review r12 — so the assertion recomputes the
    precondition per doc instead of assuming the fixture shape.)"""
    from pyspark.sql import functions as F

    from nyc_traffic_insight_spark.queries.textops import (
        _shingle_sets_persisted,
    )

    fuzzy = {
        r["doc_id"]
        for r in text_decontaminate_fuzzy(spark, SF_SMOKE).collect()
    }
    assert fuzzy  # the fixture produces real flags
    exact = {
        r["doc_id"] for r in text_decontaminate(spark, SF_SMOKE).collect()
    }
    sh = _shingle_sets_persisted(spark, SF_SMOKE).select(
        "doc_id", F.explode("sh").alias("s")
    )
    eval_sh = {
        r["s"]
        for r in sh.filter(F.col("doc_id") % _DECON_EVAL_MOD == 0)
        .select("s")
        .distinct()
        .collect()
    }
    for doc in fuzzy:
        doc_sh = {
            r["s"] for r in sh.filter(F.col("doc_id") == doc).collect()
        }
        if len(doc_sh & eval_sh) >= 2:
            assert doc in exact, doc
