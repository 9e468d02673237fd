"""Structural invariants for the behavioral analytics tier (behaviorq).

The value-level cross-engine checks live in test_queries_oracle.py /
the driver gate; these pin the semantic properties a hash compare
can't express (partition-of-events, probability normalization,
quartile balance).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nyc_traffic_insight_spark.queries import load_all
from nyc_traffic_insight_spark.sources import load_table
from tests.conftest import SF_SMOKE

SPECS = load_all()


@pytest.fixture(scope="module")
def sessions(spark):
    return SPECS["win_sessionize_batch"].builder(spark, SF_SMOKE).cache()


def test_sessions_partition_all_events(spark, sessions):
    """Every event lands in exactly one session: per-user session
    n_events sums back to the user's event count."""
    ev_counts = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_ev"))
    )
    sess_counts = sessions.groupBy("user_id").agg(
        F.sum("n_events").alias("n_sess_ev")
    )
    diff = (
        ev_counts.join(sess_counts, "user_id", "full")
        .filter(
            F.coalesce("n_ev", F.lit(-1)) != F.coalesce("n_sess_ev", F.lit(-2))
        )
        .count()
    )
    assert diff == 0


def test_sessions_seq_dense_from_one(sessions):
    """session_seq per user is 1..k with no gaps (running-sum flag)."""
    stats = (
        sessions.groupBy("user_id")
        .agg(
            F.min("session_seq").alias("lo"),
            F.max("session_seq").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter((F.col("lo") != 1) | (F.col("hi") != F.col("n")))
        .count()
    )
    assert stats == 0


def test_sessions_nonnegative_duration(sessions):
    assert sessions.filter(F.col("duration_s") < 0).count() == 0


def test_transition_probs_normalize(spark):
    """p_next sums to ~1 within each prev_type row of the matrix."""
    df = SPECS["event_transition_matrix"].builder(spark, SF_SMOKE)
    rows = df.groupBy("prev_type").agg(F.sum("p_next").alias("s")).collect()
    assert rows
    for r_ in rows:
        # each p_next is rounded to 4dp, so the row sum drifts by at
        # most 5e-5 per cell
        assert abs(r_["s"] - 1.0) < 5e-4, r_


def test_market_share_normalizes_per_day(spark):
    df = SPECS["report_market_share"].builder(spark, SF_SMOKE)
    rows = df.groupBy("day").agg(F.sum("share").alias("s")).collect()
    assert rows
    for r_ in rows:
        assert abs(r_["s"] - 1.0) < 5e-4, r_


def test_audience_overlap_bounds(spark):
    """Intersection can't exceed either audience; Jaccard in [0, 1];
    all C(|types|, 2) unordered pairs present exactly once."""
    df = SPECS["agg_audience_overlap"].builder(spark, SF_SMOKE).cache()
    bad = df.filter(
        (F.col("n_both") > F.least("n_a", "n_b"))
        | (F.col("jaccard") < 0)
        | (F.col("jaccard") > 1)
        | (F.col("type_a") >= F.col("type_b"))
    ).count()
    assert bad == 0
    n_types = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type")
        .distinct()
        .count()
    )
    assert df.count() == n_types * (n_types - 1) // 2


def test_rfm_quartiles_balanced(spark):
    """ntile(4) buckets differ in size by at most 1, every score axis."""
    df = SPECS["report_rfm_scores"].builder(spark, SF_SMOKE).cache()
    total = df.count()
    for col in ("r_score", "f_score", "m_score"):
        sizes = [
            r_["n"]
            for r_ in df.groupBy(col).agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        assert len(sizes) == 4
        assert max(sizes) - min(sizes) <= 1, (col, sizes)
    assert sum(sizes) == total
