"""SSL-prototype filter preview (round 11): D4's second embedding pass.

Same three-way pinning as the SemDeDup preview it composes with
(tests/test_semdedup.py): Python reference (sequential-accumulation
doubles) fuzzed against the DuckDB oracle text, Spark frame vs the
reference on a trial subset, and a driver-style row-exact cross-engine
compare on testdata — plus the prune-count algebra (floor tenth per
cell, singleton cells survive, rank-1 pruned in big-enough cells).
"""

from __future__ import annotations

import math
import random

import pandas as pd

from nyc_traffic_insight_spark.queries.embcurate import (
    emb_prototypes_filter,
    emb_prototypes_oracle_sql,
    proto_filter_frame,
)
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect
from tests.test_semdedup import _r6, _random_corpus, _seq_cos

_DIM = 64


def _r4(x: float) -> float:
    mag = math.floor(abs(x) * 1e4 + 0.5) / 1e4
    return -mag if x < 0 else mag


def ref_proto_filter(rows):
    """Reference: label-mean centroids (floor-form 6dp), nearest-cell
    assignment (cos DESC, cell ASC), per-cell prototypicality rank
    (cos DESC, vec_id ASC), prune ranks 1..floor(n_cell/10)."""
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
    assign = {}
    for vid, emb, _lab in rows:
        negcos, cell = min(
            ((-_seq_cos(emb, cv), c) for c, cv in cents.items())
        )
        assign[vid] = (cell, -negcos)
    out = {}
    by_cell: dict = {}
    for vid, (cell, cos) in assign.items():
        by_cell.setdefault(cell, []).append((-cos, vid))
    for cell, members in by_cell.items():
        members.sort()
        n_prune = len(members) // 10
        for rank0, (negcos, vid) in enumerate(members):
            out[vid] = {
                "cell": cell,
                "proto_cos": _r4(-negcos),
                "proto_rank": rank0 + 1,
                "is_kept": rank0 + 1 > n_prune,
            }
    return out


def _duck_run(rows):
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
    return con.execute(emb_prototypes_oracle_sql()).fetchdf()


def _assert_matches_ref(got: pd.DataFrame, ref: dict, label: str):
    assert len(got) == len(ref), f"{label}: {len(got)} != {len(ref)}"
    for row in got.itertuples(index=False):
        exp = ref[int(row.vec_id)]
        assert int(row.cell) == exp["cell"], (label, row, exp)
        assert float(row.proto_cos) == exp["proto_cos"], (label, row, exp)
        assert int(row.proto_rank) == exp["proto_rank"], (label, row, exp)
        assert bool(row.is_kept) == exp["is_kept"], (label, row, exp)


def test_duckdb_oracle_matches_reference_fuzz():
    for trial in range(20):
        rng = random.Random(3000 + trial)
        rows = _random_corpus(rng, n=rng.randrange(15, 60), n_labels=4)
        _assert_matches_ref(
            _duck_run(rows), ref_proto_filter(rows), f"trial{trial}"
        )


def test_spark_frame_matches_reference(spark):
    for trial in range(3):
        rng = random.Random(4000 + trial)
        rows = _random_corpus(rng, n=35, n_labels=3)
        ref = ref_proto_filter(rows)
        by_label: dict = {}
        for _vid, emb, lab in rows:
            by_label.setdefault(lab, []).append(emb)
        cells = sorted(
            (
                lab,
                [
                    _r6(sum(float(v[i]) for v in vecs) / len(vecs))
                    for i in range(_DIM)
                ],
            )
            for lab, vecs in by_label.items()
        )
        e = spark.createDataFrame(
            [(vid, emb) for vid, emb, _ in rows],
            "vec_id BIGINT, embedding ARRAY<FLOAT>",
        )
        got = proto_filter_frame(e, cells).toPandas()
        _assert_matches_ref(got, ref, f"spark-trial{trial}")


def test_spark_vs_duckdb_on_testdata(spark):
    spdf = emb_prototypes_filter(spark, SF_SMOKE).toPandas()
    con = duck_connect(SF_SMOKE)
    odf = con.execute(emb_prototypes_oracle_sql()).fetchdf()
    compare(spdf, odf, "emb_prototypes_filter")
    # prune-count algebra: per cell, exactly floor(n/10) pruned
    g = spdf.groupby("cell").agg(
        n=("vec_id", "size"), pruned=("is_kept", lambda s: int((~s).sum()))
    )
    assert (g["pruned"] == g["n"] // 10).all(), g
    assert len(spdf) == 500 and 0 < int((~spdf["is_kept"]).sum()) < 100


def test_rank_one_pruned_singletons_kept(spark):
    """In any cell with ≥10 members the most-prototypical (rank 1)
    vector is pruned; a singleton cell keeps its vector (floor, not
    ceil — the n=1 edge that made us pick floor)."""
    v = [0.5] * _DIM
    rows = [(i, [x + 0.001 * i for x in v]) for i in range(12)]
    rows.append((99, [1.0 if i % 2 else -1.0 for i in range(_DIM)]))
    e = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    cells = [(0, [0.4] * _DIM), (1, [1.0 if i % 2 else -1.0 for i in range(_DIM)])]
    got = proto_filter_frame(e, cells).toPandas().set_index("vec_id")
    big = got[got["cell"] == 0]
    assert len(big) == 12 and int((~big["is_kept"]).sum()) == 1
    assert not bool(big[big["proto_rank"] == 1]["is_kept"].iloc[0])
    assert bool(got.loc[99, "is_kept"]) and got.loc[99, "proto_rank"] == 1


def test_plan_is_window_not_pairjoin(spark):
    """Scale-shape guard: no pair join at all — assignment is narrow,
    sizes broadcast back, one window per cell."""
    plan = (
        emb_prototypes_filter(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan  # sizes join must broadcast


def test_spark_output_is_input_order_insensitive(spark):
    """Same corpus shuffled/repartitioned → identical row set (ranks,
    kept flags, rounded cos) — partition-order independence of the
    per-cell window and the size join."""
    from pyspark.sql import functions as F

    from nyc_traffic_insight_spark.queries.textops import (
        _embs,
        _ivf_centroids,
    )

    base = sorted(
        map(
            tuple,
            emb_prototypes_filter(spark, SF_SMOKE)
            .toPandas()
            .itertuples(index=False),
        )
    )
    shuffled = (
        _embs(spark, SF_SMOKE)
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .repartition(7)
    )
    again = sorted(
        map(
            tuple,
            proto_filter_frame(shuffled, _ivf_centroids(spark, SF_SMOKE))
            .toPandas()
            .itertuples(index=False),
        )
    )
    assert base == again
