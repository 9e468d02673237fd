"""Reference-shaped fixtures (FIXTURES.md §A): pandas↔Spark semantics.

The reference's engine IS pandas, so the sharpest correctness check for
the traffic/weather pipeline is differential against pandas on
reference-shaped data: the 5-key merge (J1), the deliberate time-only
fan-out merge (J2), cleaning (P3/P1/C1/F2), the per-borough
lag/shifted-rolling features (W1/W3/W4 — pandas
``rolling(w, min_periods=1).mean().shift(1)`` ≡ Spark
``avg over rowsBetween(-w, -1)``), and the Mon=0 weekday convention
(C6). Everything seeded; golden values come from running pandas here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nyc_traffic_insight_spark.functions.geo import wkt_point_x, wkt_point_y

BOROS = ["Manhattan", "Brooklyn", "Queens", "Bronx", "Staten Island"]


@pytest.fixture(scope="module")
def traffic_pdf():
    """FIXTURES.md §A1: traffic-count shape, incl. duplicates, nulls and
    a WKT geometry column (seed 42)."""
    rng = np.random.default_rng(42)
    n = 600
    hours = rng.integers(0, 24 * 60, n)  # hour slots over 60 days
    pdf = pd.DataFrame(
        {
            "RequestID": np.arange(n),
            "Boro": rng.choice(BOROS, n),
            "Yr": 2023,
            "M": 1 + (hours // (24 * 28)) % 12,
            "D": 1 + (hours // 24) % 28,
            "HH": hours % 24,
            "MM": rng.choice([0, 15, 30, 45], n),
            "Vol": rng.poisson(12.0, n).astype("float64"),
            "SegmentID": rng.integers(1, 99, n),
            "WktGeom": [
                f"POINT ({985000 + i % 37 * 113}.5 {190000 + i % 53 * 97}.25)"
                for i in range(n)
            ],
            "street": rng.choice([f"ST_{i}" for i in range(50)], n),
            "Direction": rng.choice(["NB", "SB", "EB", "WB"], n),
        }
    )
    pdf.loc[rng.choice(n, 6, replace=False), "Vol"] = np.nan  # ~1% null
    dup = pdf.sample(6, random_state=42)  # ~1% exact duplicates
    return pd.concat([pdf, dup], ignore_index=True)


@pytest.fixture(scope="module")
def weather_pdf():
    """FIXTURES.md §A2: 10 (borough, point) hourly sample points — 2 per
    borough, so a time-only merge fans out ×10 per matched hour."""
    hours = pd.date_range("2023-01-01", periods=24 * 60, freq="h")
    rows = []
    rng = np.random.default_rng(7)
    for b in BOROS:
        for p in range(2):
            for ts in hours:
                rows.append(
                    (b, p, ts.year, ts.month, ts.day, ts.hour,
                     float(rng.normal(5, 8)), float(max(rng.normal(0, 1), 0)))
                )
    return pd.DataFrame(
        rows, columns=["borough", "pt", "Yr", "M", "D", "HH",
                       "temperature_2m", "precipitation"]
    )


def test_clean_traffic_matches_pandas(spark, traffic_pdf):
    # P3 dedup + P1 drops + C1 WKT parse + F2 fillna, the raw_merge.py
    # clean (its inplace-drop bug replicated as INTENT, not behavior).
    sdf = spark.createDataFrame(traffic_pdf)
    cleaned = (
        sdf.dropDuplicates()
        .drop("MM", "SegmentID")
        .withColumn("x", wkt_point_x("WktGeom"))
        .withColumn("y", wkt_point_y("WktGeom"))
        .drop("WktGeom")
        .na.fill({"Vol": 0.0})
    )
    p = traffic_pdf.drop_duplicates()
    assert cleaned.count() == len(p)
    assert cleaned.filter(F.col("Vol").isNull()).count() == 0
    assert cleaned.filter(F.col("x").isNull()).count() == 0
    got = cleaned.filter(F.col("RequestID") == 0).first()
    want = traffic_pdf.loc[0, "WktGeom"]
    assert f"POINT ({got['x']} {got['y']})" == want.replace(".50 ", ".5 ").replace(
        ".250)", ".25)"
    )


def test_j1_five_key_join_matches_pandas(spark, traffic_pdf, weather_pdf):
    keys = ["Yr", "M", "D", "HH", "Boro"]
    t = spark.createDataFrame(traffic_pdf.drop_duplicates())
    w = spark.createDataFrame(
        weather_pdf.rename(columns={"borough": "Boro"})
    )
    merged = t.join(w, on=keys, how="inner")
    want = pd.merge(
        traffic_pdf.drop_duplicates(),
        weather_pdf.rename(columns={"borough": "Boro"}),
        on=keys,
        how="inner",
    )
    assert merged.count() == len(want)


def test_j2_time_only_join_fans_out(spark, traffic_pdf, weather_pdf):
    # the deliberate many-to-many: every traffic row matches all 10
    # borough sample points of its hour (SegmentedModeling.py:220-223)
    keys = ["Yr", "M", "D", "HH"]
    t = spark.createDataFrame(traffic_pdf.drop_duplicates())
    w = spark.createDataFrame(weather_pdf)
    merged = t.join(w, on=keys, how="inner")
    want = pd.merge(traffic_pdf.drop_duplicates(), weather_pdf, on=keys)
    assert merged.count() == len(want)
    # fan-out factor is exactly the 10 sample points for matched hours
    matched = t.join(w.select(keys).distinct(), on=keys).count()
    assert merged.count() == matched * 10


def test_lag_and_shifted_rolling_match_pandas(spark, weather_pdf):
    # W1/W3/W4 on an hourly per-borough series: pandas shift/rolling
    # golden vs Spark window frames. min_periods=1 + .shift(1) ≡
    # rowsBetween(-w, -1) with avg ignoring the empty head (null).
    pdf = (
        weather_pdf[weather_pdf["pt"] == 0][
            ["borough", "Yr", "M", "D", "HH", "temperature_2m"]
        ]
        .sort_values(["borough", "Yr", "M", "D", "HH"])
        .reset_index(drop=True)
    )
    g = pdf.groupby("borough")["temperature_2m"]
    pdf["lag1"] = g.shift(1)
    pdf["roll3"] = (
        g.rolling(3, min_periods=1).mean().groupby(level=0).shift(1).values
    )
    pdf["roll24"] = (
        g.rolling(24, min_periods=1).mean().groupby(level=0).shift(1).values
    )

    sdf = spark.createDataFrame(pdf.drop(columns=["lag1", "roll3", "roll24"]))
    w = Window.partitionBy("borough").orderBy("Yr", "M", "D", "HH")
    got = (
        sdf.withColumn("lag1", F.lag("temperature_2m", 1).over(w))
        .withColumn("roll3", F.avg("temperature_2m").over(w.rowsBetween(-3, -1)))
        .withColumn("roll24", F.avg("temperature_2m").over(w.rowsBetween(-24, -1)))
        .toPandas()
        .sort_values(["borough", "Yr", "M", "D", "HH"])
        .reset_index(drop=True)
    )
    for col in ("lag1", "roll3", "roll24"):
        a, b = got[col], pdf[col]
        both_nan = a.isna() & b.isna()
        assert (both_nan == (a.isna() | b.isna())).all(), f"{col} null skew"
        diff = (a[~both_nan] - b[~both_nan]).abs().max()
        assert diff < 1e-9, f"{col}: max diff {diff}"
    # Subtlety pinned: pandas rolling(3, min_periods=1).mean().shift(1)
    # at row t averages rows t-3..t-1 — Spark's frame is rowsBetween(-3,
    # -1), and the partition head gets null (empty frame ≡ shift's NaN):
    head = got[got["borough"] == "Bronx"].head(4)
    assert pd.isna(head.iloc[0]["roll3"])  # empty frame → null (= shift head)
    assert abs(head.iloc[1]["roll3"] - head.iloc[0]["temperature_2m"]) < 1e-12


def test_weekday_mon0_convention(spark):
    # C6: pandas .dt.weekday is Mon=0; F.weekday matches, F.dayofweek
    # (Sun=1) does NOT — the classic porting bug, pinned here.
    days = pd.date_range("2024-01-01", periods=14, freq="D")  # Mon first
    pdf = pd.DataFrame({"ts": days})
    want = pdf["ts"].dt.weekday.tolist()
    got = (
        spark.createDataFrame(pdf)
        .select(F.weekday("ts").alias("wd"))
        .toPandas()["wd"]
        .tolist()
    )
    assert got == want
    assert want[0] == 0  # 2024-01-01 is a Monday
