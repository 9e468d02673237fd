"""SemDeDup (round-11 preview, registered r12): within-cluster
cosine-threshold pruning.

Three independent checks pinned dedup_semantic before its r12
promotion (and keep holding after it):

1. a pure-Python reference (sequential-accumulation doubles, the exact
   arithmetic both engines use) differentially fuzzed against the
   DuckDB oracle text on random corpora;
2. the same reference vs the SPARK frame (semdedup_frame) on a subset
   of trials (Spark startup cost bounds the count);
3. Spark vs DuckDB row-exact on the real testdata tables, driver-style
   (the compare the r12 driver gate will run).

Plus the keep-rule's algebraic properties (min id per cell always
survives; threshold extremes; kept+pruned partitions the corpus).

The reference computes dot products with a sequential left-to-right
Python loop, NOT numpy.dot — numpy accumulates pairwise/SIMD and can
differ in the last ulp, which is exactly the class of flap the
engines' shared sequential accumulation avoids (textops._norm_dot).
"""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nyc_traffic_insight_spark.queries.embcurate import (
    _SEMDEDUP_THRESH,
    dedup_semantic,
    dedup_semantic_oracle_sql,
    semdedup_frame,
)
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect

_DIM = 64  # the oracle text is generated for the embeddings schema


def _r6(x: float) -> float:
    """functions/rounding.r at scale 6 (floor-form, sign-restored)."""
    mag = math.floor(abs(x) * 1e6 + 0.5) / 1e6
    return -mag if x < 0 else mag


def _seq_cos(a, b) -> float:
    """Sequential-accumulation cosine — the engines' shared arithmetic."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def ref_semdedup(rows, thresh):
    """Reference SemDeDup over [(vec_id, embedding, label), ...]:
    label-mean centroids rounded floor-form 6dp, nearest-centroid
    assignment (cos DESC, cell ASC), within-cell earlier-id witness."""
    by_label: dict = {}
    for _vid, emb, lab in rows:
        by_label.setdefault(lab, []).append(emb)
    cents = {}
    for lab, vecs in by_label.items():
        n = len(vecs)
        cents[lab] = [
            _r6(sum(float(v[i]) for v in vecs) / n) for i in range(len(vecs[0]))
        ]
    out = {}
    assign = {}
    for vid, emb, _lab in rows:
        best = min(
            ((-_seq_cos(emb, cv), cell) for cell, cv in cents.items())
        )
        assign[vid] = (best[1], emb)
    for vid, (cell, emb) in assign.items():
        dup_of = -1
        for o_vid, (o_cell, o_emb) in assign.items():
            if o_cell == cell and o_vid < vid and _seq_cos(o_emb, emb) > thresh:
                dup_of = o_vid if dup_of == -1 else min(dup_of, o_vid)
        out[vid] = (cell, dup_of == -1, dup_of)
    return {
        vid: {"cell": c, "is_kept": k, "dup_of": d}
        for vid, (c, k, d) in out.items()
    }


def _random_corpus(rng, n, n_labels):
    """Random embeddings table with planted near-duplicates so the
    threshold actually fires (pure-random 64-dim cosines cluster near
    0 and never cross 0.4)."""
    rows = []
    base = [
        [rng.uniform(-1, 1) for _ in range(_DIM)] for _ in range(n_labels)
    ]
    for vid in range(n):
        lab = rng.randrange(n_labels)
        if rng.random() < 0.35 and rows:
            # near-duplicate of an earlier row: same direction + noise
            src = rng.choice(rows)[1]
            emb = [v + rng.gauss(0, 0.05) for v in src]
        else:
            emb = [
                base[lab][i] * 0.5 + rng.uniform(-1, 1) for i in range(_DIM)
            ]
        # float32-quantize like the parquet column so both engines and
        # the reference see identical inputs
        import struct

        emb = [struct.unpack("f", struct.pack("f", v))[0] for v in emb]
        rows.append((vid, emb, lab))
    return rows


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
    return con.execute(dedup_semantic_oracle_sql(thresh=thresh)).fetchdf()


def _assert_matches_ref(got: pd.DataFrame, ref: dict, label: str):
    assert len(got) == len(ref), f"{label}: row count {len(got)} != {len(ref)}"
    n_pruned = 0
    for row in got.itertuples(index=False):
        exp = ref[int(row.vec_id)]
        assert int(row.cell) == exp["cell"], (label, row, exp)
        assert bool(row.is_kept) == exp["is_kept"], (label, row, exp)
        assert int(row.dup_of) == exp["dup_of"], (label, row, exp)
        n_pruned += not exp["is_kept"]
    return n_pruned


def test_duckdb_oracle_matches_reference_fuzz():
    """20-trial differential fuzz: oracle text vs the Python reference."""
    total_pruned = 0
    for trial in range(20):
        rng = random.Random(1000 + trial)
        rows = _random_corpus(rng, n=rng.randrange(20, 50), n_labels=4)
        ref = ref_semdedup(rows, _SEMDEDUP_THRESH)
        got = _duck_run(rows, _SEMDEDUP_THRESH)
        total_pruned += _assert_matches_ref(got, ref, f"trial{trial}")
    # the planted near-dups must actually exercise the prune branch
    assert total_pruned > 20, f"fuzz too lax: only {total_pruned} prunes"


def test_spark_frame_matches_reference(spark):
    """Spark semdedup_frame vs the reference on 3 fuzz corpora, with
    the centroid artifact computed by the reference rule."""
    for trial in range(3):
        rng = random.Random(2000 + trial)
        rows = _random_corpus(rng, n=30, n_labels=3)
        ref = ref_semdedup(rows, _SEMDEDUP_THRESH)
        # reference-built centroids == what _ivf_centroids computes
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
        got = semdedup_frame(e, cells, _SEMDEDUP_THRESH).toPandas()
        _assert_matches_ref(got, ref, f"spark-trial{trial}")


def test_spark_vs_duckdb_on_testdata(spark):
    """Driver-style row-exact compare on the real embeddings table —
    the exact check the r12 promotion's driver gate will run."""
    spdf = dedup_semantic(spark, SF_SMOKE).toPandas()
    con = duck_connect(SF_SMOKE)
    odf = con.execute(dedup_semantic_oracle_sql()).fetchdf()
    compare(spdf, odf, "dedup_semantic")
    # preview sanity: the corpus partitions into kept + pruned, the
    # threshold fires, and not everything is pruned
    assert len(spdf) == 500
    n_pruned = int((~spdf["is_kept"]).sum())
    assert 0 < n_pruned < 100, n_pruned


def test_min_id_per_cell_always_kept(spark):
    """Algebraic keep-rule property: a cell's minimum vec_id can have
    no earlier witness, so it must survive at ANY threshold."""
    spdf = dedup_semantic(spark, SF_SMOKE, thresh=-2.0).toPandas()
    mins = spdf.groupby("cell")["vec_id"].min()
    kept_mins = spdf.set_index("vec_id").loc[mins.values, "is_kept"]
    assert kept_mins.all()
    # thresh=-2: cosine > -2 always holds, so ONLY the min per cell
    # survives — the degenerate everything-is-a-dup corner
    assert int(spdf["is_kept"].sum()) == spdf["cell"].nunique()
    # and every pruned row's witness IS its cell's minimum id
    pruned = spdf[~spdf["is_kept"]]
    assert (
        pruned["dup_of"].values == mins.loc[pruned["cell"]].values
    ).all()


def test_threshold_above_one_keeps_everything(spark):
    """cosine ≤ 1 always, so thresh=1.01 prunes nothing."""
    spdf = dedup_semantic(spark, SF_SMOKE, thresh=1.01).toPandas()
    assert spdf["is_kept"].all()
    assert (spdf["dup_of"] == -1).all()


def test_identical_vectors_prune_to_min_id(spark):
    """Planted exact duplicates: the min id survives, every copy is
    pruned with dup_of = that min id."""
    v = [0.5] * _DIM
    w = [1.0 if i % 2 else -1.0 for i in range(_DIM)]
    rows = [(7, v), (3, v), (11, v), (20, w)]
    e = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    cells = [(0, [0.1] * _DIM)]  # one cell: everything lands together
    got = (
        semdedup_frame(e, cells, 0.99)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert bool(got.loc[3, "is_kept"]) and got.loc[3, "dup_of"] == -1
    for vid in (7, 11):
        assert not bool(got.loc[vid, "is_kept"])
        assert got.loc[vid, "dup_of"] == 3
    # w is orthogonal-ish to v — cos(v, w) = 0 < 0.99 — so it survives
    assert bool(got.loc[20, "is_kept"])


def test_plan_is_bucketed_not_cartesian(spark):
    """Scale-shape guard ahead of the r12 plan-audit row: assignment is
    narrow (literal centroids), the pair join is an equi-join on cell —
    no CartesianProduct, no per-row Python."""
    plan = (
        dedup_semantic(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_keep_rule_monotone_under_higher_id_inserts():
    """Keep-rule algebra (pure reference, which the engine checks above
    tie to both engines): with a FIXED centroid set, adding a vector
    with a HIGHER id can never change an earlier vector's cell,
    kept-status, or witness — the witness relation only looks at
    smaller ids. (Does not hold for the full pipeline, where a new
    vector moves the label centroids; the frame-level contract is what
    incremental ingestion would rely on.)"""
    for trial in range(10):
        rng = random.Random(5000 + trial)
        rows = _random_corpus(rng, n=25, n_labels=3)
        # fixed centroids from the label means of the BASE corpus
        by_label: dict = {}
        for _vid, emb, lab in rows:
            by_label.setdefault(lab, []).append(emb)
        cents = {
            lab: [
                _r6(sum(float(v[i]) for v in vecs) / len(vecs))
                for i in range(_DIM)
            ]
            for lab, vecs in by_label.items()
        }

        def ref_fixed(rs):
            assign = {}
            for vid, emb, _lab in rs:
                best = min(
                    ((-_seq_cos(emb, cv), cell) for cell, cv in cents.items())
                )
                assign[vid] = (best[1], emb)
            out = {}
            for vid, (cell, emb) in assign.items():
                dup = [
                    o
                    for o, (oc, oe) in assign.items()
                    if oc == cell and o < vid
                    and _seq_cos(oe, emb) > _SEMDEDUP_THRESH
                ]
                out[vid] = (cell, not dup, min(dup) if dup else -1)
            return out

        base = ref_fixed(rows)
        extra = rows + [
            (
                1000 + j,
                rng.choice(rows)[1],
                rng.randrange(3),
            )
            for j in range(3)
        ]
        grown = ref_fixed(extra)
        for vid, _emb, _lab in rows:
            assert grown[vid] == base[vid], (trial, vid)


def test_spark_output_is_input_order_insensitive(spark):
    """The driver hash is order-insensitive but VALUE-exact: the same
    corpus shuffled/repartitioned must produce the identical row set —
    the property that would break if any per-row decision picked up
    accumulation-order or partition-order dependence."""
    e = dedup_semantic(spark, SF_SMOKE)
    base = sorted(map(tuple, e.toPandas().itertuples(index=False)))
    from nyc_traffic_insight_spark.queries.textops import (
        _embs,
        _ivf_centroids,
    )

    shuffled = (
        _embs(spark, SF_SMOKE)
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .repartition(7)
    )
    again = sorted(
        map(
            tuple,
            semdedup_frame(
                shuffled, _ivf_centroids(spark, SF_SMOKE), _SEMDEDUP_THRESH
            )
            .toPandas()
            .itertuples(index=False),
        )
    )
    assert base == again


def test_k_scales_with_corpus_contract(spark):
    """Executable witness for the 100 TB contract (VERDICT r11 #3):
    SemDeDup's pair cost is Σ|cell|², bounded only because the
    centroid count k scales WITH the corpus (the paper's ~110k
    clusters on LAION; NOTES r11 records the (n/k)² caveat at fixed
    k). This runs the frame at two corpus sizes with k ∝ n — constant
    per-cell occupancy n/k — and asserts (a) the assignment honors the
    PASSED artifact exactly (every cell holds n/k vectors; a later
    hard-coded k would collapse the big corpus into fewer cells and
    break this), and (b) the candidate-pair mass Σ|cell|² grows
    linearly in n, not quadratically. sim_search_ivf_topk shares the
    same passed-artifact parameterization, so this pins the shape for
    both."""
    dim = 16
    occupancy = 50  # n/k held constant across scales
    masses = {}
    for n, k in ((200, 4), (800, 16)):
        # cell i's centroid is the one-hot axis e_i; vector vid of
        # cell i is e_i plus a small deterministic off-axis nudge so
        # vectors are distinct but assignment is unambiguous
        cells = [
            (i, [1.0 if d == i else 0.0 for d in range(dim)])
            for i in range(k)
        ]
        rows = []
        for vid in range(n):
            i = vid % k
            emb = [0.0] * dim
            emb[i] = 1.0
            emb[(i + k) % dim if k < dim else (i + 1) % dim] = (
                0.01 * (vid % 7 + 1) / 7.0
            )
            rows.append((vid, emb))
        e = spark.createDataFrame(
            rows, "vec_id BIGINT, embedding ARRAY<FLOAT>"
        )
        out = semdedup_frame(e, cells, _SEMDEDUP_THRESH).toPandas()
        assert len(out) == n  # one verdict per input vector
        sizes = out.groupby("cell").size()
        assert len(sizes) == k, f"expected {k} occupied cells"
        assert (sizes == occupancy).all(), (
            f"n={n}, k={k}: assignment must honor the passed artifact "
            f"(uniform {occupancy}/cell), got {dict(sizes)}"
        )
        masses[n] = int((sizes**2).sum())
    # k ∝ n keeps pair mass linear: 4× the corpus → 4× the candidates
    # (a hard-coded k would give 16×)
    data_ratio = 800 / 200
    mass_ratio = masses[800] / masses[200]
    assert mass_ratio <= data_ratio * 1.25, (
        f"candidate-pair mass grew {mass_ratio:.1f}× on a "
        f"{data_ratio:.0f}× corpus — the k∝corpus contract is broken"
    )
