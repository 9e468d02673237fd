"""Physical-plan regression tests: the scale properties, enforced.

Correctness says a query returns the right rows; these tests pin HOW —
filters reach the parquet scan, projections prune columns, small dims
broadcast, aggregates combine map-side, and nothing silently plans a
cartesian product. A regression here is invisible at test scale and
fatal at 100 TB, which is exactly why it's asserted.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from nyc_traffic_insight_spark.queries import load_all
from tests.conftest import SF_SMOKE

SPECS = load_all()

# Builders that train MLlib models while building the DataFrame.
ML = {n for n in SPECS if n.startswith("ml_")}

# Documented brute-force baselines / tiny-broadcast probe joins: these
# intentionally compare many pairs, but even they must do it via a
# BROADCAST nested-loop (small side shipped), never CartesianProduct.
NON_EQUI_OK = {
    "dedup_embedding_cosine",
    "sim_search_bruteforce_topk",
    "sim_search_ivf_topk",
    "dedup_ngram_jaccard",
}


def plan_of(spark, name: str) -> str:
    df = SPECS[name].builder(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(n for n in SPECS if n not in ML))
def test_no_cartesian_product_anywhere(spark, name):
    assert "CartesianProduct" not in plan_of(spark, name), (
        f"{name} plans a cartesian product"
    )


def test_flagship_plan_shape(spark):
    plan = plan_of(spark, "flagship_volume_features")
    # join-key null filter pushed into the parquet scan
    assert "PushedFilters: [IsNotNull(l_orderkey)]" in plan
    # column pruning: the lineitem scan reads exactly the 4 used columns
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_quantity:double,"
        "l_extendedprice:double,l_discount:double>" in plan
    )
    # orders is the small side → broadcast join, not a shuffle join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # partial (map-side) + final aggregation around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan
    # the window runs partitioned by priority, never a global window
    assert "windowspecdefinition(priority" in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "join_semi")
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan


def test_column_pruning_on_pruned_scan(spark):
    plan = plan_of(spark, "scan_csv_pruned")
    # the reference prunes with usecols (S3); here Catalyst must emit a
    # scan schema that is a strict subset of the table
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert line.count(":") <= 5, line  # few columns, not all


def test_small_dims_broadcast(spark):
    for name in ("join_star_broadcast", "join_holiday_dim", "join_coord_map"):
        plan = plan_of(spark, name)
        assert "BroadcastExchange" in plan, f"{name} lost its broadcast"
        assert "SortMergeJoin" not in plan, f"{name} shuffled a tiny dim"


def test_lsh_dedup_has_no_pairwise_join(spark):
    # the LSH path must generate candidates from grouping, not a
    # self-join of the corpus
    plan = plan_of(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_window_queries_are_partitioned(spark):
    # every per-group window declares a partitioning (the global-sort
    # W5 split is the one documented exception)
    for name in ("win_lag_multi", "win_roll_mean_24", "win_lag1"):
        plan = plan_of(spark, name)
        assert "windowspecdefinition(" in plan
        assert "WindowExec: No Partition" not in plan
