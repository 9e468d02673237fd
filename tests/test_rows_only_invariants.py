"""Invariant pins for the rows-only catalog entries that have no other
dedicated test: seeded random split and the HLL distinct sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_traffic_insight_spark.queries import load_all
from nyc_traffic_insight_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_split_random_invariants(spark):
    # the builder returns the 15% test side of randomSplit(seed=62):
    # fraction near target, same seed → identical rows, and the two
    # sides of the split partition the table exactly
    spec = load_all()["split_random"]
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )
    total = ev.count()
    test1 = spec.builder(spark, SF_SMOKE)
    n = test1.count()
    assert 0.10 <= n / total <= 0.20  # Bernoulli around 0.15
    ids1 = {r["event_id"] for r in test1.collect()}
    ids2 = {r["event_id"] for r in spec.builder(spark, SF_SMOKE).collect()}
    assert ids1 == ids2  # seeded: reproducible draw
    train, test = ev.randomSplit([0.85, 0.15], seed=62)
    assert train.count() + test.count() == total  # exact partition


def test_approx_count_distinct_error_bound(spark):
    spec = load_all()["agg_approx_count_distinct"]
    rows = spec.builder(spark, SF_SMOKE).collect()
    assert rows, "no output"
    # compare each approx value against the exact distinct count
    ev = load_table(spark, SF_SMOKE, "events")
    exact = ev.select("user_id").distinct().count()
    approx_vals = [v for r in rows for k, v in r.asDict().items()
                   if isinstance(v, (int, float)) and v > 0]
    assert any(abs(v - exact) / exact < 0.1 for v in approx_vals), (
        f"no approx value within 10% of exact {exact}: {rows}"
    )
