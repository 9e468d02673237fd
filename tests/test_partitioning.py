"""Partition-pruned layout: the §3.3 serving-side design, pinned.

The reference's /map endpoint downloads and re-parses a 515 MB GeoJSON
per request and filters features in a Python loop (main.py:175-191).
The engine's layout is hive-partitioned parquet where the same
(borough, year)-shaped predicate prunes directories before any IO.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from nyc_traffic_insight_spark.sources import load_table
from nyc_traffic_insight_spark.sources.catalog import write_partitioned
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").withColumn("yr", F.year("ts"))
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, "event_type", "yr")

    some_type = ev.select("event_type").first()[0]
    pruned = spark.read.parquet(path).filter(
        (F.col("event_type") == some_type) & (F.col("yr") >= 2024)
    )
    plan = _plan(pruned)
    # the predicate became directory pruning, not a post-scan filter
    # (columns carry expr ids in the plan: `event_type#15 = click`)
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert f"= {some_type})" in pf and "yr" in pf
    # and values round-trip exactly vs filtering the unpartitioned table
    want = ev.filter(
        (F.col("event_type") == some_type) & (F.col("yr") >= 2024)
    ).count()
    assert pruned.count() == want > 0


def test_partition_scan_reads_single_directory(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "by_type")
    write_partitioned(ev, path, "event_type")
    # addressing one partition directory directly is also valid layout
    # usage (the reference's per-borough request maps to exactly this)
    one = spark.read.parquet(f"{path}/event_type=click")
    assert one.count() == ev.filter(F.col("event_type") == "click").count() > 0
    files = one.inputFiles()
    assert files and all("event_type=click" in f for f in files)
