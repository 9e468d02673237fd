"""Pandas goldens for the round-5 window tier: the docstrings claim
pandas-equivalent semantics (pct_change, groupby.nlargest, truncated
adjusted EWMA); these tests hold them to it on the real fixture."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from nyc_traffic_insight_spark.queries import load_all
from tests.conftest import SF_SMOKE

SPECS = load_all()


@pytest.fixture(scope="module")
def events_pdf():
    return pd.read_parquet(f"{SF_SMOKE}/events.parquet")


def test_pct_change_matches_pandas(spark, events_pdf):
    golden = (
        events_pdf.assign(day=events_pdf["ts"].dt.strftime("%Y-%m-%d"))
        .groupby(["event_type", "day"])
        .size()
        .rename("cnt")
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    golden["pct_change"] = golden.groupby("event_type")["cnt"].pct_change()
    got = (
        SPECS["win_pct_change"]
        .builder(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    g = golden.reset_index(drop=True)
    assert (got["cnt"].to_numpy() == g["cnt"].to_numpy()).all()
    both = np.isfinite(got["pct_change"].to_numpy(dtype=float)) & np.isfinite(
        g["pct_change"].to_numpy(dtype=float)
    )
    assert both.sum() > 0
    # catalog rounds 4dp floor-form; compare to pandas within 1e-4
    diff = np.abs(
        got["pct_change"].to_numpy(dtype=float)[both]
        - g["pct_change"].to_numpy(dtype=float)[both]
    )
    assert diff.max() < 1e-4


def test_topn_matches_pandas_nlargest(spark):
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    golden = (
        orders.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        .groupby("o_custkey")
        .head(3)
    )
    got = SPECS["win_topn_per_key"].builder(spark, SF_SMOKE).toPandas()
    assert len(got) == len(golden)
    a = set(map(tuple, got[["o_custkey", "o_orderkey"]].to_numpy()))
    b = set(map(tuple, golden[["o_custkey", "o_orderkey"]].to_numpy()))
    assert a == b


def test_ewma_matches_manual_truncated_form(spark, events_pdf):
    """The 8-term truncated adjusted EWMA recomputed in pandas must
    match the catalog's window formulation to the rounding grid."""
    from nyc_traffic_insight_spark.queries.windows import _EWMA_K, _EWMA_W

    hourly = (
        events_pdf.assign(hr=events_pdf["ts"].dt.floor("h"))
        .groupby(["event_type", "hr"])
        .size()
        .rename("cnt")
        .reset_index()
        .sort_values(["event_type", "hr"])
    )

    def trunc_ewma(s: pd.Series) -> pd.Series:
        arr = s.to_numpy(dtype=float)
        out = np.empty_like(arr)
        for t in range(len(arr)):
            num = den = 0.0
            for k, w in enumerate(_EWMA_W[: min(_EWMA_K, t + 1)]):
                num += arr[t - k] * w
                den += w
            out[t] = num / den
        return pd.Series(out, index=s.index)

    hourly["ewma"] = hourly.groupby("event_type")["cnt"].transform(trunc_ewma)
    got = (
        SPECS["win_ewma"]
        .builder(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["event_type", "hr"])
        .reset_index(drop=True)
    )
    g = hourly.reset_index(drop=True)
    assert len(got) == len(g)
    assert (
        np.abs(got["ewma"].to_numpy() - g["ewma"].to_numpy()).max() < 1e-4
    )


def test_cusum_changepoint_matches_numpy(spark, events_pdf):
    """The integer-numerator argmax must select the same day NumPy's
    float CUSUM peaks on (no ties in this fixture)."""
    daily = (
        events_pdf.assign(day=events_pdf["ts"].dt.strftime("%Y-%m-%d"))
        .groupby(["event_type", "day"])
        .size()
        .rename("cnt")
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    got = {
        r["event_type"]: (r["change_day"], r["max_cusum"])
        for r in SPECS["win_changepoint_cusum"].builder(spark, SF_SMOKE).collect()
    }
    for etype, g in daily.groupby("event_type"):
        x = g["cnt"].to_numpy(dtype=float)
        k = np.arange(1, len(x) + 1)
        cusum = np.abs(np.cumsum(x) - k * x.sum() / len(x))
        idx = int(np.argmax(cusum))
        assert got[etype][0] == g["day"].iloc[idx], (etype, got[etype])
        assert abs(got[etype][1] - round(cusum[idx], 4)) < 1e-6


def test_drawdown_matches_numpy(spark):
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    daily = (
        orders.assign(day=orders["o_orderdate"].dt.strftime("%Y-%m-%d"))
        .groupby(["o_orderpriority", "day"])["o_totalprice"]
        .sum()
        .round(4)
        .rename("rev")
        .reset_index()
        .sort_values(["o_orderpriority", "day"])
    )
    got = {
        r["priority"]: r["max_drawdown"]
        for r in SPECS["win_max_drawdown"].builder(spark, SF_SMOKE).collect()
    }
    for prio, g in daily.groupby("o_orderpriority"):
        equity = g["rev"].cumsum().to_numpy()
        dd = np.maximum.accumulate(equity) - equity
        assert abs(got[prio] - round(dd.max(), 4)) < 1e-3, (prio, got[prio], dd.max())


def test_seasonal_decompose_matches_pandas(spark, events_pdf):
    """Trend (centered 25h rolling mean, partial edges) and the
    hour-of-day seasonal means recomputed in pandas must match the
    catalog's decomposition on the rounding grid, and the components
    must rebuild the series: cnt = trend + seasonal + residual up to
    rounding."""
    hourly = (
        events_pdf.assign(hr=events_pdf["ts"].dt.floor("h"))
        .groupby(["event_type", "hr"])
        .size()
        .rename("cnt")
        .reset_index()
        .sort_values(["event_type", "hr"])
    )
    hourly["trend"] = (
        hourly.groupby("event_type")["cnt"]
        .transform(lambda s: s.rolling(25, center=True, min_periods=1).mean())
        .round(4)
    )
    got = (
        SPECS["win_seasonal_decompose"]
        .builder(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["event_type", "hr"])
        .reset_index(drop=True)
    )
    g = hourly.reset_index(drop=True)
    assert len(got) == len(g)
    assert np.abs(got["trend"].to_numpy() - g["trend"].to_numpy()).max() < 1e-3
    rebuilt = got["trend"] + got["seasonal"] + got["residual"]
    assert np.abs(rebuilt.to_numpy() - got["cnt"].to_numpy()).max() < 2e-3
