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


# ----------------------------- pandas-differential (reference engine)


def _events_pdf():
    import pandas as pd

    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")[
        ["user_id", "ts", "event_id", "event_type"]
    ]
    return pdf.sort_values(["user_id", "ts", "event_id"]).reset_index(
        drop=True
    )


def test_sessionize_matches_pandas_golden(spark, sessions):
    """The reference's engine is pandas: groupby.diff + cumsum is the
    canonical single-machine sessionize. Spark must reproduce it
    exactly — session boundaries, numbering, floor-second durations."""
    import pandas as pd

    pdf = _events_pdf()
    gap = pdf.groupby("user_id")["ts"].diff()
    new_sess = gap.isna() | (gap > pd.Timedelta(minutes=30))
    pdf["session_seq"] = new_sess.astype(int).groupby(pdf["user_id"]).cumsum()
    golden = (
        pdf.groupby(["user_id", "session_seq"])
        .agg(start=("ts", "min"), end=("ts", "max"), n_events=("ts", "size"))
        .reset_index()
    )
    # ts loads as datetime64[us]: int64 view is epoch MICROseconds;
    # floor-divide to whole epoch seconds like Spark's unix_timestamp
    golden["duration_s"] = (
        golden["end"].astype("datetime64[us]").astype("int64") // 10**6
        - golden["start"].astype("datetime64[us]").astype("int64") // 10**6
    )
    got = (
        sessions.toPandas()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )
    golden = golden.sort_values(["user_id", "session_seq"]).reset_index(
        drop=True
    )
    assert len(got) == len(golden)
    assert (got["user_id"].to_numpy() == golden["user_id"].to_numpy()).all()
    assert (
        got["session_seq"].to_numpy() == golden["session_seq"].to_numpy()
    ).all()
    assert (got["n_events"].to_numpy() == golden["n_events"].to_numpy()).all()
    assert (
        got["duration_s"].to_numpy() == golden["duration_s"].to_numpy()
    ).all()


def test_transitions_match_pandas_golden(spark):
    """groupby.shift is the pandas spelling of the per-user lag; the
    (prev, next) count table must agree cell for cell."""
    df = SPECS["event_transition_matrix"].builder(spark, SF_SMOKE)
    pdf = _events_pdf()
    pdf["prev_type"] = pdf.groupby("user_id")["event_type"].shift(1)
    golden = (
        pdf.dropna(subset=["prev_type"])
        .groupby(["prev_type", "event_type"])
        .size()
        .reset_index(name="n_transitions")
        .rename(columns={"event_type": "next_type"})
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    got = (
        df.select("prev_type", "next_type", "n_transitions")
        .toPandas()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    assert got.equals(golden.astype({"n_transitions": got["n_transitions"].dtype}))


def test_auc_exact_matches_numpy_mannwhitney(spark):
    """The SQL rank-statistic AUC must equal the NumPy Mann-Whitney
    computation (average ranks for ties) on the same score/label
    pairs."""
    import numpy as np
    import pandas as pd

    from nyc_traffic_insight_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events").toPandas()
    cutoff = ev["ts"].max() - pd.Timedelta(days=7)
    pre = ev[ev["ts"] <= cutoff]
    score = pre.groupby("user_id").size()
    post_purch = set(
        ev[(ev["ts"] > cutoff) & (ev["event_type"] == "purchase")]["user_id"]
    )
    label = np.array([1 if u in post_purch else 0 for u in score.index])
    s = score.to_numpy(dtype=float)
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s))
    sorted_s = s[order]
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and sorted_s[j] == sorted_s[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    p, n = label.sum(), (1 - label).sum()
    golden = (ranks[label == 1].sum() - p * (p + 1) / 2) / (p * n)

    got = load_all()["agg_auc_exact"].builder(spark, SF_SMOKE).first()
    assert got["n_pos"] == p and got["n_neg"] == n
    assert abs(got["auc"] - round(golden, 4)) < 1e-9


def test_bootstrap_ci_covers_true_mean_and_shrinks(spark):
    """The interval must contain the exact corpus mean, and 10x the
    data must shrink it (≈√10); weights average ≈1 so the bootstrap
    mean sits near the true mean."""
    got = {}
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        row = SPECS["agg_bootstrap_ci"].builder(spark, sf).first()
        true_mean = (
            load_table(spark, sf, "events").agg(F.avg("value")).first()[0]
        )
        assert row["ci_lo"] <= true_mean <= row["ci_hi"], (sf, row, true_mean)
        assert abs(row["boot_mean"] - true_mean) < 2.0
        got[sf] = row["ci_hi"] - row["ci_lo"]
    ratio = got["/root/testdata/sf0.001"] / got["/root/testdata/sf0.01"]
    assert 1.5 < ratio < 7.0, got  # ~sqrt(10)≈3.2 with bootstrap noise


def test_ab_test_null_behaves_and_chi2_positive(spark):
    """The un-treated fixture's arms are exchangeable: |z| must stay
    well under the significance bar; chi² is nonnegative with the
    right dof for a |types|x7 grid."""
    ab = SPECS["report_ab_test"].builder(spark, "/root/testdata/sf0.01").first()
    assert abs(ab["z"]) < 1.96 and not ab["significant_95"]
    chi = SPECS["agg_chi_square_independence"].builder(
        spark, "/root/testdata/sf0.01"
    ).first()
    assert chi["chi2"] >= 0 and chi["dof"] == 24 and chi["n_cells"] == 35


def test_cohort_ltv_matches_pandas(spark):
    """LTV curves recomputed in pandas (first-order cohort, integer
    month offsets, cumulative per-customer revenue) must match."""
    import pandas as pd

    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    first = orders.groupby("o_custkey")["o_orderdate"].min().dt.to_period("M")
    orders = orders.assign(
        cohort=orders["o_custkey"].map(first),
        om=orders["o_orderdate"].dt.to_period("M"),
    )
    orders["month_offset"] = (
        (orders["om"] - orders["cohort"]).apply(lambda p: p.n).astype(int)
    )
    rev = (
        orders.groupby(["cohort", "month_offset"])["o_totalprice"]
        .sum()
        .round(4)
        .rename("revenue")
        .reset_index()
        .sort_values(["cohort", "month_offset"])
    )
    sizes = first.value_counts()
    rev["cum"] = rev.groupby("cohort")["revenue"].cumsum()
    rev["ltv"] = (
        rev["cum"] / rev["cohort"].map(sizes).astype(float)
    ).round(4)
    golden = {
        (str(r.cohort), r.month_offset): r.ltv for r in rev.itertuples()
    }
    got = SPECS["report_cohort_ltv"].builder(spark, SF_SMOKE).collect()
    assert len(got) == len(golden)
    for r in got:
        key = (r["cohort_month"], r["month_offset"])
        assert abs(r["cum_ltv_per_customer"] - golden[key]) < 1e-3, (
            key,
            r["cum_ltv_per_customer"],
            golden[key],
        )
