"""Catalog: geo reprojection queries (SURVEY.md §2.9 C17, §2.10).

The reference's one genuine UDF is the EPSG:2263 (NY state-plane, US
survey feet) ↔ WGS84 reprojection done with pyproj at
``scripts/convert_traffic_csv_to_geojson_point.py:15-22``. Our engine
implements it as a vectorized numpy Pandas UDF over the Lambert
Conformal Conic (2SP) closed forms (``functions/geo.py``).

Because the forward projection is closed-form, it gets a FULL value
oracle: the DuckDB SQL evaluates the same Snyder equations with the
same float64 constants, and both sides round with the shared
floor-form. The inverse (iterative) is checked by round-trip against
the identity. Test lon/lat are synthesized from customer keys inside
the projection's valid NYC domain — integer-derived doubles, so both
engines start from bit-identical inputs.

Scale: the UDF is Arrow-batched and stateless — a narrow map that
scales linearly with no shuffle; the planner treats it like any other
projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_traffic_insight_spark.functions.geo import (
    _A,
    _BIG_F,
    _E,
    _FE,
    _LON0,
    _N,
    _RHO0,
    epsg2263_to_wgs84,
    wgs84_to_epsg2263,
)
from nyc_traffic_insight_spark.functions.rounding import r as _r
from nyc_traffic_insight_spark.queries import register
from nyc_traffic_insight_spark.sources import load_table


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic NYC-area lon/lat derived from customer keys.
    (int % m) / const arithmetic is exact in float64, so Spark and
    DuckDB construct bit-identical coordinates."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        (F.lit(-74.3) + (F.col("c_custkey") % 1000) / 2500.0).alias("lon"),
        (F.lit(40.5) + (F.col("c_custkey") % 797) / 1600.0).alias("lat"),
    )


_PTS_SQL = """
    pts AS (
      SELECT c_custkey AS id,
             -74.3 + (c_custkey % 1000) / 2500.0 AS lon,
             40.5 + (c_custkey % 797) / 1600.0 AS lat
      FROM customer
    )
"""


@register(
    "geo_reproject_forward",
    survey="C17 CRS reprojection UDF, forward LCC (convert_traffic_csv_to_geojson_point.py:15-22)",
    oracle=f"""
    WITH {_PTS_SQL},
    tt AS (
      SELECT id, lon, lat,
             tan(pi()/4 - radians(lat)/2)
               / pow((1 - {_E!r} * sin(radians(lat)))
                     / (1 + {_E!r} * sin(radians(lat))), {_E / 2.0!r}) AS t,
             {_N!r} * (radians(lon) - {_LON0!r}) AS theta
      FROM pts
    ),
    proj AS (
      SELECT id, lon, lat,
             {_A!r} * {_BIG_F!r} * pow(t, {_N!r}) AS rho, theta
      FROM tt
    )
    SELECT id, lon, lat,
           round({_FE!r} + rho * sin(theta), 2) AS x_ft,
           round(0.0 + {_RHO0!r} - rho * cos(theta), 2) AS y_ft
    FROM proj
    """,
)
def geo_reproject_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WGS84 lon/lat → EPSG:2263 easting/northing (ftUS) via the
    Arrow-batched numpy Pandas UDF; oracle evaluates the identical
    Lambert Conformal Conic forward equations in SQL."""
    pts = _pts(spark, sf_dir)
    return pts.select(
        "id", "lon", "lat", wgs84_to_epsg2263("lon", "lat").alias("xy")
    ).select(
        "id",
        "lon",
        "lat",
        _r(F.col("xy.x"), 2).alias("x_ft"),
        _r(F.col("xy.y"), 2).alias("y_ft"),
    )


@register(
    "geo_reproject_roundtrip",
    survey="C17 CRS reprojection UDF, inverse LCC round-trip (convert_traffic_csv_to_geojson_point.py:15-22)",
    oracle=f"""
    WITH {_PTS_SQL}
    SELECT id, round(lon, 6) AS lon_rt, round(lat, 6) AS lat_rt FROM pts
    """,
)
def geo_reproject_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """forward∘inverse ≡ identity to well under 1e-6°: pins the
    iterative inverse against the closed-form forward."""
    pts = _pts(spark, sf_dir)
    fwd = pts.select("id", wgs84_to_epsg2263("lon", "lat").alias("xy"))
    inv = fwd.select(
        "id", epsg2263_to_wgs84(F.col("xy.x"), F.col("xy.y")).alias("ll")
    )
    return inv.select(
        "id",
        _r(F.col("ll.lon"), 6).alias("lon_rt"),
        _r(F.col("ll.lat"), 6).alias("lat_rt"),
    )
