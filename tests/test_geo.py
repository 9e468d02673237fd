"""functions/geo: LCC projection math + WKT parse + the pandas UDFs.

The closed-form forward is pinned to the EPSG:2263 projection origin
(false easting/northing) and the iterative inverse to the forward by
round-trip; the full-table oracle check lives in
test_queries_oracle.py::geo_reproject_*.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nyc_traffic_insight_spark.functions.geo import (
    lcc_forward,
    lcc_inverse,
    wkt_point_x,
    wkt_point_y,
)


def test_forward_hits_projection_origin():
    # At the latitude of origin (40°10'N) on the central meridian
    # (74°W) the projected coordinate IS the false easting/northing.
    x, y = lcc_forward(np.array([-74.0]), np.array([40.0 + 10.0 / 60.0]))
    assert abs(x[0] - 984250.0) < 1e-6
    assert abs(y[0] - 0.0) < 1e-6


def test_forward_orientation():
    # East of the meridian → larger easting; north of origin → larger
    # northing (sanity on axis orientation and units).
    x, y = lcc_forward(np.array([-74.0, -73.9]), np.array([40.7, 40.7]))
    assert x[1] > x[0]
    x2, y2 = lcc_forward(np.array([-74.0]), np.array([40.8]))
    assert y2[0] > y[0]
    # One degree of longitude at 40.7N is ~280k ftUS; allow wide band.
    assert 20_000 < (x[1] - x[0]) < 40_000


def test_roundtrip_precision():
    rng = np.random.default_rng(42)
    lon = -74.3 + 0.6 * rng.random(500)
    lat = 40.4 + 0.6 * rng.random(500)
    x, y = lcc_forward(lon, lat)
    lon2, lat2 = lcc_inverse(x, y)
    assert np.max(np.abs(lon2 - lon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9


def test_wkt_parse_and_udf_roundtrip(spark):
    df = spark.createDataFrame(
        [
            (1, "POINT (987654.32 187654.1)"),
            (2, "not a point"),
            (3, None),
        ],
        "id INT, wkt STRING",
    )
    parsed = df.select(
        "id",
        wkt_point_x("wkt").alias("x"),
        wkt_point_y("wkt").alias("y"),
    )
    rows = {r["id"]: (r["x"], r["y"]) for r in parsed.collect()}
    assert rows[1] == (987654.32, 187654.1)
    assert rows[2] == (None, None)  # malformed → null, job survives (F7)
    assert rows[3] == (None, None)

    from nyc_traffic_insight_spark.functions.geo import (
        epsg2263_to_wgs84,
        wgs84_to_epsg2263,
    )

    good = parsed.filter(F.col("x").isNotNull())
    ll = good.select("id", epsg2263_to_wgs84(F.col("x"), F.col("y")).alias("ll"))
    back = ll.select(
        "id", wgs84_to_epsg2263(F.col("ll.lon"), F.col("ll.lat")).alias("xy")
    ).collect()
    assert abs(back[0]["xy"]["x"] - 987654.32) < 1e-6
    assert abs(back[0]["xy"]["y"] - 187654.1) < 1e-6


def test_zorder_buckets_are_compact_tiles(spark):
    # the point of the Morton key: the top bits address a COMPACT 2-D
    # tile, so file-level min/max stats prune in both dimensions. Every
    # zbucket (top 8 of 16 bits) must cover at most a 16x16-cell extent
    from nyc_traffic_insight_spark.queries import load_all
    from tests.conftest import SF_SMOKE

    df = load_all()["layout_zorder_key"].builder(spark, SF_SMOKE)
    ext = df.groupBy("zbucket").agg(
        (F.max("cx") - F.min("cx")).alias("wx"),
        (F.max("cy") - F.min("cy")).alias("wy"),
    )
    bad = ext.filter((F.col("wx") > 15) | (F.col("wy") > 15)).count()
    assert bad == 0
    # and the key is bijective with the cell: decoding round-trips
    one = df.select("cx", "cy", "zorder").collect()
    for r in one[:100]:
        x = y = 0
        for i in range(8):
            x |= ((r["zorder"] >> (2 * i)) & 1) << i
            y |= ((r["zorder"] >> (2 * i + 1)) & 1) << i
        assert (x, y) == (r["cx"], r["cy"])


# ---------------------------------------- gated Sedona spatial backend


def _toy_spatial(spark):
    pts = spark.createDataFrame(
        [(1, 0.010, 0.010), (2, 0.031, 0.002), (3, 0.9, 0.9)],
        "point_id LONG, px DOUBLE, py DOUBLE",
    )
    segs = spark.createDataFrame(
        [(10, 0.0, 0.0, 0.02, 0.0), (20, 0.03, 0.0, 0.03, 0.02)],
        "seg_id LONG, x1 DOUBLE, y1 DOUBLE, x2 DOUBLE, y2 DOUBLE",
    )
    return pts, segs


def test_nearest_edge_auto_backend_falls_back_without_sedona(spark):
    # the import gate itself: on this container auto must resolve to
    # the builtin path and produce the projection-distance answer
    from nyc_traffic_insight_spark.operators.spatial import (
        nearest_edge_join,
        sedona_enabled,
    )

    pts, segs = _toy_spatial(spark)
    rows = {
        r["point_id"]: (r["seg_id"], r["dist2"])
        for r in nearest_edge_join(pts, segs, 0.05, backend="auto").collect()
    }
    # point 1 projects onto the body of seg 10 (t=0.5): dist2 = 0.01^2
    assert rows[1][0] == 10 and abs(rows[1][1] - 1e-4) < 1e-15
    # point 2 is nearer seg 20's body than seg 10's endpoint
    assert rows[2][0] == 20
    # point 3 is outside tolerance of everything
    assert 3 not in rows
    if not sedona_enabled(spark):
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="sedona"):
            nearest_edge_join(pts, segs, 0.05, backend="sedona").collect()


def test_nearest_edge_sedona_agrees_with_builtin(spark):
    # runs only where Apache Sedona (package + jars) is installed
    import pytest as _pytest

    from nyc_traffic_insight_spark.operators.spatial import (
        nearest_edge_join,
        sedona_enabled,
    )

    if not sedona_enabled(spark):
        _pytest.skip("Apache Sedona not available in this environment")
    pts, segs = _toy_spatial(spark)
    a = nearest_edge_join(pts, segs, 0.05, backend="builtin").collect()
    b = nearest_edge_join(pts, segs, 0.05, backend="sedona").collect()
    av = {r["point_id"]: (r["seg_id"], r["dist2"]) for r in a}
    bv = {r["point_id"]: (r["seg_id"], r["dist2"]) for r in b}
    assert av.keys() == bv.keys()
    for k in av:
        assert av[k][0] == bv[k][0]
        assert abs(av[k][1] - bv[k][1]) < 1e-12
