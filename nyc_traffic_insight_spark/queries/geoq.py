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


_Z_BITS = 8  # 256 x 256 grid over the NYC bounding box
_Z_LON0, _Z_LON_W = -74.3, 0.4
_Z_LAT0, _Z_LAT_H = 40.5, 0.5


def _z_interleave_sql(xcol: str, ycol: str) -> str:
    """Morton interleave as portable integer arithmetic (no engine
    shift operators): bit i of x lands at position 2i, bit i of y at
    2i+1 — spelled ((v div 2^i) % 2) * 4^i (*2 for the y plane). One
    generated text, both engines."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(
            f"((CAST(floor({xcol} / {2**i}.0) AS BIGINT) % 2) * {4**i})"
        )
        terms.append(
            f"((CAST(floor({ycol} / {2**i}.0) AS BIGINT) % 2) * {2 * 4**i})"
        )
    return " + ".join(terms)


@register(
    "layout_zorder_key",
    survey="layout/scale tier: Z-order (Morton) clustering key over the "
    "point grid — the Delta/Iceberg Z-ORDER primitive that makes a "
    "2-D bounding-box predicate prune row groups in BOTH dimensions "
    "when files are written sorted by this key",
    oracle=f"""
    WITH {_PTS_SQL},
    cells AS (
      SELECT id,
             CAST(least(CAST(floor((lon - {_Z_LON0!r})
                    / ({_Z_LON_W!r} / {2**_Z_BITS}.0)) AS BIGINT),
                    {2**_Z_BITS - 1}) AS BIGINT) AS cx,
             CAST(least(CAST(floor((lat - {_Z_LAT0!r})
                    / ({_Z_LAT_H!r} / {2**_Z_BITS}.0)) AS BIGINT),
                    {2**_Z_BITS - 1}) AS BIGINT) AS cy
      FROM pts
    )
    SELECT id, cx, cy,
           CAST({_z_interleave_sql('cx', 'cy')} AS BIGINT) AS zorder,
           CAST(floor(({_z_interleave_sql('cx', 'cy')}) / 256.0) AS BIGINT)
             AS zbucket
    FROM cells
    """,
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton code per point: quantize (lon, lat) to a 256×256 grid
    over the NYC box and interleave the cell bits. Writing files
    sorted/bucketed by this key gives every 2-D range predicate
    locality in ONE sort key — a lat or lon band maps to O(√n) Morton
    ranges instead of striping across every file, which is how
    Delta/Iceberg Z-ORDER BY makes min/max row-group stats prunable in
    both dimensions at once (a plain lexicographic (lon, lat) sort
    prunes only the leading column).

    The zbucket column (top 8 Morton bits) is the file-assignment
    demonstration: 256 buckets, each covering a compact 16×16-cell
    tile. Scale shape: pure per-row integer arithmetic — narrow map,
    no shuffle; the downstream writer's repartitionByRange(zorder) is
    the only exchange and is exactly the clustering you are paying
    for. Both engines evaluate the same generated interleave text, so
    the key is bit-identical cross-engine."""
    pts = _pts(spark, sf_dir)
    cell_w = _Z_LON_W / 2**_Z_BITS
    cell_h = _Z_LAT_H / 2**_Z_BITS
    cx = F.least(
        F.floor((F.col("lon") - _Z_LON0) / cell_w).cast("bigint"),
        F.lit(2**_Z_BITS - 1),
    ).cast("bigint")
    cy = F.least(
        F.floor((F.col("lat") - _Z_LAT0) / cell_h).cast("bigint"),
        F.lit(2**_Z_BITS - 1),
    ).cast("bigint")
    cells = pts.select("id", cx.alias("cx"), cy.alias("cy"))
    z = None
    for i in range(_Z_BITS):
        xbit = (F.floor(F.col("cx") / float(2**i)).cast("bigint") % 2) * (
            4**i
        )
        ybit = (F.floor(F.col("cy") / float(2**i)).cast("bigint") % 2) * (
            2 * 4**i
        )
        z = xbit + ybit if z is None else z + xbit + ybit
    return cells.select(
        "id",
        "cx",
        "cy",
        z.cast("bigint").alias("zorder"),
        F.floor(z / 256.0).cast("bigint").alias("zbucket"),
    )
