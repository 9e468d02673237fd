"""Length-curriculum loader-order preview (round-13 late; r14
promotion).

``sample_curriculum_order``: epoch 0 presents the corpus
short-to-long (hash-shuffled within each fixed length bin), later
epochs are the standard deterministic shuffle. Pinned here before the
@register lands: driver-style cross-engine equality, the curriculum
property itself (bins monotone along epoch-0 order, NOT monotone
along epoch-1 order), per-epoch permutation, equality to the
registered epoch-shuffle machine on a degenerate all-zero bin
(the two implementations cannot drift silently), and the
zero-SinglePartition plan contract.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect


@pytest.fixture(scope="module")
def duck_smoke():
    con = duck_connect(SF_SMOKE)
    yield con
    con.close()


def test_curriculum_matches_oracle(spark, duck_smoke):
    from nyc_traffic_insight_spark.queries.samplingq import (
        curriculum_oracle_sql,
        sample_curriculum_order,
    )

    spdf = sample_curriculum_order(spark, SF_SMOKE).toPandas()
    odf = duck_smoke.execute(curriculum_oracle_sql()).fetchdf()
    compare(spdf, odf, "sample_curriculum_order")


def test_curriculum_property_and_permutation(spark):
    from nyc_traffic_insight_spark.queries.samplingq import (
        sample_curriculum_order,
    )

    df = sample_curriculum_order(spark, SF_SMOKE).toPandas()
    n = df["doc_id"].nunique()
    for epoch, g in df.groupby("epoch"):
        assert sorted(g["pos"]) == list(range(n)), "pos is a permutation"
    e0 = df[df.epoch == 0].sort_values("pos")
    assert e0["bin"].is_monotonic_increasing, "epoch 0 is short-to-long"
    assert e0["bin"].nunique() >= 2, "vacuous fixture: one bin only"
    e1 = df[df.epoch == 1].sort_values("pos")
    assert not e1["bin"].is_monotonic_increasing, (
        "epoch 1 must be the plain shuffle, not the curriculum order"
    )
    # within a bin, epoch 0 is hash-shuffled, not id-ordered
    big = e0[e0["bin"] == e0["bin"].mode().iloc[0]]
    assert not big["doc_id"].is_monotonic_increasing


def test_curriculum_degenerates_to_epoch_shuffle(spark):
    """With every bin forced to 0 the composite key collapses to the
    plain hash, so the curriculum machine must emit EXACTLY the
    registered epoch shuffle's order — the pin that keeps the two
    deliberately-unconsolidated implementations equal."""
    from pyspark.sql import functions as F

    from nyc_traffic_insight_spark.queries.samplingq import (
        _curriculum_frame,
        epoch_shuffle_frame,
    )
    from nyc_traffic_insight_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    cur = (
        _curriculum_frame(
            d.withColumn("bin", F.lit(0).cast("int")), 2, spark
        )
        .select("epoch", "doc_id", "pos")
        .toPandas()
        .sort_values(["epoch", "doc_id"])
        .reset_index(drop=True)
    )
    shuf = (
        epoch_shuffle_frame(d, 2, spark)
        .toPandas()
        .sort_values(["epoch", "doc_id"])
        .reset_index(drop=True)
    )
    assert cur.equals(shuf[["epoch", "doc_id", "pos"]])


def test_curriculum_plan_no_single_partition(spark):
    """Same contract as the registered epoch shuffle: the only
    windows partition by (epoch[, sort_bin, bucket]) — never a global
    single-partition sort; the one BNLJ is the 2-row epoch range."""
    from nyc_traffic_insight_spark.queries.samplingq import (
        sample_curriculum_order,
    )

    plan = (
        sample_curriculum_order(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
