"""AQE skew-join handling, demonstrated end-to-end.

join_salted_skew shows the deterministic (manual) remedy; this test
shows the adaptive one: with a pathologically hot key and thresholds
scaled to test data, AQE must split the oversized partition at runtime
(skew=true in the final adaptive plan) while producing exactly the
plain-join result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_traffic_insight_spark.sources import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def skew_conf(spark):
    keep = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "20KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in keep}
    for k, v in keep.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark, skew_conf):
    # repartition first: AQE splits a skewed reduce partition by MAPPER
    # ranges, and the local single-row-group parquet scans as one map
    # task — one mapper leaves nothing to split (on a cluster the scan
    # has hundreds of mappers and this step doesn't exist)
    ev = load_table(spark, "/root/testdata/sf0.01", "events").repartition(8)
    # 95% of rows share key 0 → one shuffle partition dwarfs the rest
    fact = ev.select(
        "event_id",
        "props",
        F.when(F.col("event_id") % 20 < 19, F.lit(0))
        .otherwise(F.col("event_id") % 50)
        .cast("bigint")
        .alias("k"),
    )
    # dim must feed the join straight from its shuffle (no agg between):
    # the skew rule splits a skewed left partition by REPLICATING the
    # matching right shuffle partition, which it can only do when the
    # join child IS the shuffle stage. nationkey is already unique.
    dim = load_table(spark, SF_SMOKE, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("k"),
        F.col("n_name").alias("nm"),
    )
    joined = fact.join(dim, "k")
    # execute THIS DataFrame's own plan (count() would build a new one
    # whose adaptive plan is separate) and read the finalized version
    n = len(joined.collect())
    final = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "skew=true" in final, f"AQE did not split the skew:\n{final[:800]}"

    # and the adaptive remedy changes no results
    want = fact.join(dim, "k").count()
    assert n == want > 0
