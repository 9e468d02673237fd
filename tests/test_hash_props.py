"""Property tests for the catalog's deterministic-hash primitives.

The md5→bucket/rho arithmetic and the content-addressed draws are the
foundation the sketch/sampling oracles stand on; these fuzz them
against independent hashlib goldens so a refactor can't silently bend
the hash semantics both engines share.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from nyc_traffic_insight_spark.queries.samplingq import _HLL_M


def _golden_bucket_rho(key: int) -> tuple[int, int]:
    hx = hashlib.md5(str(key).encode()).hexdigest()
    bucket = int(hx[:2], 16) % _HLL_M
    stripped = hx[2:15].lstrip("0")
    if stripped:
        first = stripped[0]
        lz = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}.get(
            first, 0
        )
        rho = 4 * (13 - len(stripped)) + lz + 1
    else:
        rho = 4 * 13 + 0 + 1
    return bucket, rho


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=50, unique=True))
def test_hll_register_arithmetic_matches_hashlib(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    hx = F.md5(F.col("user_id").cast("string"))
    stripped = F.regexp_replace(F.substring(hx, 3, 13), "^0+", "")
    first = F.substring(stripped, 1, 1)
    lz = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rows = df.select(
        "user_id",
        (F.conv(F.substring(hx, 1, 2), 16, 10).cast("bigint") % _HLL_M).alias(
            "bucket"
        ),
        (4 * (13 - F.length(stripped)) + lz + 1).alias("rho"),
    ).collect()
    for r in rows:
        b, rho = _golden_bucket_rho(r["user_id"])
        assert (r["bucket"], r["rho"]) == (b, rho), r


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10**6), st.integers(0, 20), st.integers(1, 5000))
def test_negative_sampling_draw_matches_hashlib(spark, cust, i, n_parts):
    got = (
        spark.range(1)
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.lit(f"{cust}#{i}")), 1, 12), 16, 10
                ).cast("bigint")
                % F.lit(n_parts)
            ).alias("cand")
        )
        .first()["cand"]
    )
    want = int(hashlib.md5(f"{cust}#{i}".encode()).hexdigest()[:12], 16) % n_parts
    assert got == want


# ---- exact-integer tick quantization (sim_search_topk_vectorized) ----
#
# The vectorized top-k's oracle equivalence rests on one primitive:
# floor-form quantization of a float32 component to BIGINT ticks must
# agree between numpy (the mapInPandas path) and DuckDB's CASE/floor
# spelling for EVERY representable input — a single disagreeing
# component would shift an exact integer dot product by whole units.


@given(
    st.lists(
        st.floats(
            min_value=-10.0,
            max_value=10.0,
            allow_nan=False,
            width=32,  # embeddings are float32
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=200, deadline=None)
def test_tick_quantization_matches_duckdb(values):
    import duckdb
    import numpy as np

    from nyc_traffic_insight_spark.queries.textops import _TICK

    # the numpy spelling from sim_search_topk_vectorized._ticks
    scaled = np.array(values, dtype=np.float32).astype(np.float64) * _TICK
    got = np.where(
        scaled >= 0, np.floor(scaled + 0.5), -np.floor(-scaled + 0.5)
    ).astype(np.int64)

    con = duckdb.connect()
    want = [
        con.execute(
            f"""SELECT CAST(CASE WHEN x >= 0
                         THEN floor(x * {_TICK} + 0.5)
                         ELSE -floor(-x * {_TICK} + 0.5) END AS BIGINT)
                FROM (SELECT CAST(CAST(? AS FLOAT) AS DOUBLE) AS x)""",
            [float(v)],
        ).fetchone()[0]
        for v in values
    ]
    assert got.tolist() == want
