"""qa_lsh_recall_audit (round-12 preview): LSH banding measured
against exact-Jaccard ground truth.

The audit must be CONSISTENT WITH the two registered machines it
audits — its truth leg is dedup_ngram_jaccard's pair set and its
candidate leg is the dedup_minhash_lsh banding — so rather than an
independent reference implementation, the tests recompute the three
counts FROM those registered queries and require the one-row audit to
agree, then cross-check Spark vs DuckDB row-exact (driver-style), and
pin the set algebra (hits ≤ both legs; verify output = truth ∩
candidates, i.e. n_hits = |dedup_minhash_lsh| exactly).
"""

from __future__ import annotations

import math

from nyc_traffic_insight_spark.queries.textops import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    lsh_recall_oracle_sql,
    qa_lsh_recall_audit,
)
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect


def _r4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def test_audit_consistent_with_the_machines_it_audits(spark):
    row = qa_lsh_recall_audit(spark, SF_SMOKE).collect()[0]
    truth = {
        (r["doc1"], r["doc2"])
        for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    }
    verified = {
        (r["doc1"], r["doc2"])
        for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()
    }
    assert row["n_true_pairs"] == len(truth)
    # the verify stage keeps exactly truth ∩ candidates, so the hit
    # count IS the registered LSH output size
    assert row["n_hits"] == len(verified)
    assert verified <= truth
    assert row["n_hits"] <= row["n_lsh_candidates"]
    assert row["recall"] == _r4(row["n_hits"] / row["n_true_pairs"])
    assert row["candidate_precision"] == _r4(
        row["n_hits"] / row["n_lsh_candidates"]
    )
    # the audit is non-degenerate at this fixture: truth exists and
    # the banding finds a real fraction of it
    assert row["n_true_pairs"] > 0
    assert 0.0 < row["recall"] <= 1.0


def test_spark_matches_duckdb_on_testdata(spark):
    """Driver-style row-exact compare — the check the r13 promotion's
    driver gate will run."""
    spdf = qa_lsh_recall_audit(spark, SF_SMOKE).toPandas()
    con = duck_connect(SF_SMOKE)
    odf = con.execute(lsh_recall_oracle_sql()).fetchdf()
    compare(spdf, odf, "qa_lsh_recall_audit")
    assert len(spdf) == 1


def test_banding_geometry_threads_through_both_engines(spark):
    """r14 (VERDICT r13 #6): the (b, r) banding geometry is a module
    constant pair consumed by the Spark candidate stage AND the shared
    oracle fragment. Prove the threading at BOTH the production r=2
    geometry and the 100 TB r=4 lever: per geometry, the parametric
    Spark candidate set == the parametric DuckDB candidate set == the
    sweep helper's array-key form."""
    import nyc_traffic_insight_spark.queries.textops as T
    from pyspark.sql import functions as F

    ds = T._shingle_sets_persisted(spark, SF_SMOKE)
    sig = T._sig_from_shingles(
        ds.select("doc_id", F.explode("sh").alias("s"))
    )
    con = duck_connect(SF_SMOKE)
    for b, r in ((4, 2), (2, 4)):
        sp = {
            (x["doc1"], x["doc2"])
            for x in T._lsh_candidate_pairs(ds, b, r).collect()
        }
        geom = {
            (x["doc1"], x["doc2"])
            for x in T._lsh_cands_geom(sig, b, r).collect()
        }
        sql = (
            T._SIG_SQL
            + T._lsh_cands_geom_sql("candidates", b, r)
            + "SELECT doc1, doc2 FROM candidates"
        )
        du = {tuple(t) for t in con.execute(sql).fetchall()}
        assert sp == geom == du, (b, r, len(sp), len(geom), len(du))
    # r=4 is strictly sparser than r=2 on the same signatures
    # (fewer bands x stricter collision), pinned at this fixture by
    # the sweep's monotonicity test; here just pin derivation:
    assert T._LSH_CANDS_SQL == T._lsh_cands_geom_sql(
        "candidates", T._LSH_B, T._LSH_R
    )
    assert T._LSH_B * T._LSH_R == T._N_HASHES
