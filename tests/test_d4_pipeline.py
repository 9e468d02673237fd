"""Composed D4 pipeline preview (round 11): SemDeDup → SSL prototypes.

The composed operator must equal its parts composed BY HAND — the
prototype stage runs over SemDeDup's survivors, not over the full
corpus, so the composition is not the intersection of the standalone
filters. Pinned three ways: Python reference fuzz vs the composed
DuckDB oracle, Spark-vs-parts consistency, and the driver-style
cross-engine compare on testdata.
"""

from __future__ import annotations

import random

import pandas as pd

from nyc_traffic_insight_spark.queries.embcurate import (
    _SEMDEDUP_THRESH,
    d4_oracle_sql,
    dedup_semantic,
    pipeline_d4_curation,
    proto_filter_frame,
)
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect

from tests.test_semdedup import _random_corpus, ref_semdedup


def ref_d4(rows, thresh):
    """Reference composition: semdedup verdicts on the full set, then
    prototype ranks over the survivors — computed against the
    FULL-CORPUS centroid artifact (the fixed index both stages share;
    rebuilding centroids from the survivor subset, as a naive
    ref_proto_filter(survivors) would, is the wrong semantics and was
    the first draft's bug)."""
    from tests.test_semdedup import _r6, _seq_cos

    sd = ref_semdedup(rows, thresh)
    by_label: dict = {}
    for _vid, emb, lab in rows:
        by_label.setdefault(lab, []).append(emb)
    cents = {
        lab: [
            _r6(sum(float(v[i]) for v in vecs) / len(vecs))
            for i in range(len(vecs[0]))
        ]
        for lab, vecs in by_label.items()
    }
    own_cos = {}
    for vid, emb, _lab in rows:
        negcos, cell = min(
            ((-_seq_cos(emb, cv), c) for c, cv in cents.items())
        )
        assert cell == sd[vid]["cell"]
        own_cos[vid] = -negcos
    by_cell: dict = {}
    for vid, _emb, _lab in rows:
        if sd[vid]["is_kept"]:
            by_cell.setdefault(sd[vid]["cell"], []).append(
                (-own_cos[vid], vid)
            )
    ranks = {}
    kept2 = {}
    for cell, members in by_cell.items():
        members.sort()
        n_prune = len(members) // 10
        for rank0, (_negcos, vid) in enumerate(members):
            ranks[vid] = rank0 + 1
            kept2[vid] = rank0 + 1 > n_prune
    return {
        vid: {
            "cell": sd[vid]["cell"],
            "semdedup_kept": sd[vid]["is_kept"],
            "proto_rank": ranks.get(vid, -1),
            "is_kept": kept2.get(vid, False),
        }
        for vid, _emb, _lab in rows
    }


def _duck_run(rows, thresh):
    import duckdb

    con = duckdb.connect()
    df = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [[float(x) for x in r[1]] for r in rows],
            "label": [r[2] for r in rows],
        }
    )
    con.register("embeddings_pd", df)
    con.execute(
        "CREATE VIEW embeddings AS SELECT CAST(vec_id AS BIGINT) AS vec_id,"
        " CAST(embedding AS FLOAT[]) AS embedding,"
        " CAST(label AS INTEGER) AS label FROM embeddings_pd"
    )
    return con.execute(d4_oracle_sql(thresh=thresh)).fetchdf()


def test_duckdb_oracle_matches_reference_fuzz():
    """10-trial differential fuzz: the composed oracle vs the composed
    reference — exercises both 'pruned at stage 1' and 'pruned at
    stage 2' paths (asserted non-empty over the batch)."""
    n_sd_pruned = n_proto_pruned = 0
    for trial in range(10):
        rng = random.Random(6000 + trial)
        rows = _random_corpus(rng, n=rng.randrange(25, 60), n_labels=3)
        ref = ref_d4(rows, _SEMDEDUP_THRESH)
        got = _duck_run(rows, _SEMDEDUP_THRESH)
        assert len(got) == len(ref)
        for row in got.itertuples(index=False):
            exp = ref[int(row.vec_id)]
            assert int(row.cell) == exp["cell"], (trial, row, exp)
            assert bool(row.semdedup_kept) == exp["semdedup_kept"]
            assert int(row.proto_rank) == exp["proto_rank"], (trial, row, exp)
            assert bool(row.is_kept) == exp["is_kept"], (trial, row, exp)
            n_sd_pruned += not exp["semdedup_kept"]
            n_proto_pruned += exp["semdedup_kept"] and not exp["is_kept"]
    assert n_sd_pruned > 5 and n_proto_pruned > 5, (
        n_sd_pruned,
        n_proto_pruned,
    )


def test_spark_vs_duckdb_on_testdata(spark):
    spdf = pipeline_d4_curation(spark, SF_SMOKE).toPandas()
    con = duck_connect(SF_SMOKE)
    odf = con.execute(d4_oracle_sql()).fetchdf()
    compare(spdf, odf, "pipeline_d4_curation")
    assert len(spdf) == 500
    # both stages fire on the real corpus
    assert int((~spdf["semdedup_kept"]).sum()) > 0
    assert int((spdf["semdedup_kept"] & ~spdf["is_kept"]).sum()) > 0


def test_composition_equals_parts(spark):
    """The composed Spark operator must equal hand-composing the two
    standalone frames on the survivor set."""
    from pyspark.sql import functions as F

    from nyc_traffic_insight_spark.queries.textops import (
        _embs,
        _ivf_centroids,
    )

    # sort_index: the operators promise a SET of rows, not an order —
    # the r12 semdedup restructure changed incidental output order
    d4 = (
        pipeline_d4_curation(spark, SF_SMOKE)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    sd = (
        dedup_semantic(spark, SF_SMOKE)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert (d4["semdedup_kept"] == sd["is_kept"]).all()
    assert (d4["cell"] == sd["cell"]).all()
    # is_kept ⇒ semdedup_kept, and stage-1 drops carry rank -1
    assert (d4["is_kept"] <= d4["semdedup_kept"]).all()
    assert (d4.loc[~d4["semdedup_kept"], "proto_rank"] == -1).all()
    # the survivor-side ranks equal a standalone prototype pass over
    # the survivor frame
    surv_ids = sd[sd["is_kept"]].index
    e = _embs(spark, SF_SMOKE)
    survivors = e.filter(F.col("vec_id").isin([int(i) for i in surv_ids]))
    pf = (
        proto_filter_frame(survivors, _ivf_centroids(spark, SF_SMOKE))
        .toPandas()
        .set_index("vec_id")
    )
    sub = d4.loc[pf.index]
    assert (sub["proto_rank"] == pf["proto_rank"]).all()
    assert (sub["is_kept"] == pf["is_kept"]).all()


def test_fused_plan_shape(spark):
    """The r12 fusion contract: the composed pipeline is the SemDeDup
    shape plus one window — two in-memory assignment scans (the two
    witness-join sides) and no third branch or vec_id re-join. A
    regression to the preview's composed shape (8 scans, 29
    exchanges) fails here."""
    df = pipeline_d4_curation(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") <= 2, plan[:2000]
    assert plan.count("Exchange") <= 8, plan[:2000]
