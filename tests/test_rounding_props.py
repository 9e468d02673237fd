"""The rounding contract, fuzzed.

The whole oracle strategy leans on ``functions.rounding.r`` producing
bit-identical results to DuckDB's ``round(double, n)``. Two layers:

1. hypothesis fuzz of the shared arithmetic model against DuckDB
   (no Spark needed — fast, wide);
2. a seeded bulk check that Spark's actual ``r()`` expression equals
   DuckDB on the same values, including sign boundaries and half-cases.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def model(x: float, n: int) -> float:
    """The arithmetic r() implements: DuckDB's std::round(x·10ⁿ)/10ⁿ."""
    m = float(10**n)
    return math.copysign(math.floor(abs(x) * m + 0.5), x) / m if x else x * m / m


@settings(max_examples=500, deadline=None)
@given(
    x=st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
    n=st.integers(min_value=0, max_value=6),
)
def test_model_matches_duckdb(x, n):
    # bind x as a parameter: a 17-digit SQL literal would be parsed as
    # DECIMAL first and cast to DOUBLE, which can land on a different
    # double than the host float — that's literal parsing, not rounding
    want = duckdb.sql(
        f"SELECT round($x::DOUBLE, {n})", params={"x": x}
    ).fetchone()[0]
    got = model(x, n)
    assert got == want or (math.isnan(got) and math.isnan(want)), (x, n, got, want)


@pytest.mark.parametrize("scale", [1, 2, 4, 6])
def test_spark_r_matches_duckdb_bulk(spark, scale):
    rng = np.random.default_rng(42)
    xs = np.concatenate(
        [
            rng.uniform(-1e6, 1e6, 400),
            rng.uniform(-1.0, 1.0, 400),  # cosine/correlation range
            # exact half-cases at the target scale, both signs
            np.array([s * (k + 0.5) / 10**scale for k in range(20) for s in (1, -1)]),
        ]
    )
    from nyc_traffic_insight_spark.functions.rounding import r

    sdf = spark.createDataFrame([(float(v),) for v in xs], "x DOUBLE")
    got = [row["y"] for row in sdf.select(r("x", scale).alias("y")).collect()]
    want = [
        row[0]
        for row in duckdb.sql(
            "SELECT round(x::DOUBLE, $s) FROM (SELECT unnest($xs) AS x)",
            params={"s": scale, "xs": [float(v) for v in xs]},
        ).fetchall()
    ]
    mism = [(x, g, w) for x, g, w in zip(xs, got, want) if g != w]
    assert not mism, f"scale {scale}: {len(mism)} mismatches, first {mism[:3]}"


def test_exact_sum_avg_match_duckdb_spelling_and_decimal_truth(spark):
    """exact_sum/exact_avg (r7 catalog-wide hardening) must (a) equal
    the documented oracle-side scaled-BIGINT spelling bit-for-bit and
    (b) equal the true decimal sum/mean exactly — for dp-exact inputs
    the helpers are lossless, not approximations."""
    import duckdb
    from decimal import Decimal

    import numpy as np

    from nyc_traffic_insight_spark.functions.rounding import exact_avg, exact_sum

    rng = np.random.default_rng(7)
    # 2dp-exact money values, mixed signs and magnitudes
    cents = rng.integers(-10**7, 10**7, 3000)
    xs = [c / 100.0 for c in cents]

    sdf = spark.createDataFrame([(float(v),) for v in xs], "x DOUBLE")
    got = sdf.agg(
        exact_sum("x", 2).alias("s"), exact_avg("x", 2).alias("m")
    ).first()

    want = duckdb.sql(
        """SELECT CAST(sum(CAST(round(x * 100) AS BIGINT)) AS DOUBLE) / 100,
                  CAST(sum(CAST(round(x * 100) AS BIGINT)) AS DOUBLE)
                    / (count(x) * 100)
           FROM (SELECT unnest($xs) AS x)""",
        params={"xs": xs},
    ).fetchone()
    assert (got["s"], got["m"]) == want

    true_sum = sum(Decimal(int(c)) for c in cents) / 100
    assert Decimal(repr(got["s"])) == true_sum


def test_exact_wsum_matches_duckdb_window_spelling_and_decimal_truth(spark):
    """exact_wsum (the windowed sibling, r7 review refactor) must equal
    the documented oracle window spelling bit-for-bit and the true
    decimal trailing-frame sum exactly — same lossless contract as
    exact_sum, per frame instead of per group. scaled_long is the
    shared input form, so this pins both helpers."""
    import duckdb
    from decimal import Decimal

    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nyc_traffic_insight_spark.functions.rounding import exact_wsum

    rng = np.random.default_rng(11)
    cents = rng.integers(-10**7, 10**7, 500)
    xs = [c / 100.0 for c in cents]

    sdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(xs)], "i INT, x DOUBLE"
    )
    frame = Window.orderBy("i").rowsBetween(-5, -1)
    got = {
        row["i"]: row["s"]
        for row in sdf.select(
            "i", exact_wsum("x", 2, frame).alias("s")
        ).collect()
    }
    want = dict(
        duckdb.sql(
            """SELECT i,
                      CAST(sum(CAST(round(x * 100) AS BIGINT)) OVER (
                             ORDER BY i ROWS BETWEEN 5 PRECEDING
                                             AND 1 PRECEDING
                           ) AS DOUBLE) / 100
               FROM (SELECT unnest($ii) AS i, unnest($xs) AS x)""",
            params={"ii": list(range(len(xs))), "xs": xs},
        ).fetchall()
    )
    assert got == want
    for i in range(len(xs)):
        lo = max(0, i - 5)
        if lo == i:  # empty frame -> null on both engines
            assert got[i] is None
            continue
        true = sum(Decimal(int(c)) for c in cents[lo:i]) / 100
        assert Decimal(repr(got[i])) == true, i


def test_rn_sql_emits_the_pinned_legacy_texts():
    """r4_sql's emitted text is load-bearing across dozens of
    registered oracle strings (sha-verified fragments reference it);
    the r13 rn_sql consolidation must stay byte-identical to the
    pre-r13 hand-spelled forms."""
    from nyc_traffic_insight_spark.functions.rounding import (
        r4_sql,
        r6_sql,
        rn_sql,
    )

    assert (
        r4_sql("x + y")
        == "CAST(floor((x + y) * 10000.0 + 0.5) AS DOUBLE) / 10000.0"
    )
    assert (
        r6_sql("z")
        == "CAST(floor((z) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0"
    )
    assert rn_sql("q", 2) == "CAST(floor((q) * 100.0 + 0.5) AS DOUBLE) / 100.0"
