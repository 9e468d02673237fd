"""Flagship pipeline: the reference's training-data shape on the test tables.

The reference's flagship "query" (SURVEY.md §3.2,
``traffic_volume_models/SegmentedModeling.py:185-256``) is:

    scan → equi-join → time features → per-group lag/rolling windows → sort

re-expressed here on ``orders ⋈ lineitem``: monthly volume per order
priority with lag-1 / trailing-3 / trailing-12 window features — the exact
operator chain used to build the traffic model's feature table (lag-1h,
roll-3h, roll-24h per borough; reference ``SegmentedModeling.py:238-247``).

Scale notes (100 TB):
- the join is a key-equi join Catalyst can shuffle-hash or sort-merge; at
  scale both sides would be bucketed by orderkey so it co-locates.
- the aggregate shrinks data to |groups × months| BEFORE the window, so the
  window input is tiny — windows never see raw fact rows.
- the window partitions by group key; no global single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_traffic_insight_spark.sources import load_table
from nyc_traffic_insight_spark.functions.rounding import exact_sum, r as _r


def flagship_volume_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly shipped volume per order priority, with lag/rolling features.

    Mirrors reference ``SegmentedModeling.py:220-247`` semantics:
    inner equi-join (J1), time-part extraction (C5), grouped aggregate,
    per-group time-ordered lag (W1) and trailing rolling means (W3/W4,
    frame excludes the current row = pandas ``rolling().mean().shift(1)``).
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    monthly = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mth"),
        )
        .agg(
            _r(F.sum("l_quantity"), 4).alias("vol"),
            _r(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )

    w = Window.partitionBy("priority").orderBy("yr", "mth")
    return (
        monthly.withColumn("vol_lag_1", F.lag("vol", 1).over(w))
        .withColumn(
            "vol_roll_3", _r(F.avg("vol").over(w.rowsBetween(-3, -1)), 4)
        )
        .withColumn(
            "vol_roll_12", _r(F.avg("vol").over(w.rowsBetween(-12, -1)), 4)
        )
        .orderBy("priority", "yr", "mth")
    )
