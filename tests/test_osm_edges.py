"""OSM extract → edge table → nearest-edge snap (VERDICT r6 #6).

A real (tiny) OSM XML extract fixture — the format `osmium cat` emits
from any public .osm.pbf — is parsed into the segment table, and
join_nearest_edge's operator snaps points against it; the expected
nearest edges are brute-forced in numpy with the same clamped
projection formula. The GeoJSON LineString path (what an osmnx export
looks like) must produce the identical segment set fully Spark-side.
"""

from __future__ import annotations

import json

import pytest

from nyc_traffic_insight_spark.sources.osm_edges import (
    DRIVE_HIGHWAYS,
    load_geojson_lines,
    load_osm_pbf,
    load_osm_xml,
)

# 5 nodes, 2 drive ways (one 3-node way → 2 segments, one 2-node way),
# 1 footway (filtered), 1 way with a clipped endpoint (dropped segment)
_OSM_XML = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="test">
  <node id="1" lat="40.700" lon="-74.000"/>
  <node id="2" lat="40.710" lon="-74.000"/>
  <node id="3" lat="40.710" lon="-73.990"/>
  <node id="4" lat="40.720" lon="-73.990"/>
  <node id="5" lat="40.700" lon="-73.980"/>
  <way id="100">
    <nd ref="1"/><nd ref="2"/><nd ref="3"/>
    <tag k="highway" v="residential"/>
    <tag k="name" v="Test Street"/>
  </way>
  <way id="200">
    <nd ref="4"/><nd ref="5"/>
    <tag k="highway" v="primary"/>
  </way>
  <way id="300">
    <nd ref="1"/><nd ref="5"/>
    <tag k="highway" v="footway"/>
  </way>
  <way id="400">
    <nd ref="2"/><nd ref="999"/>
    <tag k="highway" v="residential"/>
  </way>
</osm>
"""


@pytest.fixture()
def osm_file(tmp_path):
    p = tmp_path / "extract.osm"
    p.write_text(_OSM_XML)
    return str(p)


def test_osm_xml_parses_drive_segments(spark, osm_file):
    edges = load_osm_xml(spark, osm_file).collect()
    by_id = {r["edge_id"]: r for r in edges}
    # way 100 → 2 segments, way 200 → 1; footway filtered; way 400's
    # only segment references a node outside the extract → dropped
    assert set(by_id) == {100 * 100_000, 100 * 100_000 + 1, 200 * 100_000}
    e = by_id[100 * 100_000]
    assert (e["u"], e["v"]) == (1, 2)
    assert (e["x1"], e["y1"], e["x2"], e["y2"]) == (
        -74.0, 40.7, -74.0, 40.71
    )
    assert e["name"] == "Test Street"
    assert by_id[200 * 100_000]["highway"] == "primary"
    assert by_id[200 * 100_000]["name"] is None
    # highways=None keeps the footway too
    all_edges = load_osm_xml(spark, osm_file, highways=None).collect()
    assert {r["way_id"] for r in all_edges} == {100, 200, 300}


def test_nearest_edge_snap_against_real_extract(spark, osm_file):
    import numpy as np

    from nyc_traffic_insight_spark.operators.spatial import nearest_edge_join
    from pyspark.sql import functions as F

    edges = load_osm_xml(spark, osm_file)
    seg = edges.select(
        F.col("edge_id").alias("seg_id"), "x1", "y1", "x2", "y2"
    )
    pts_rows = [
        (0, -74.0005, 40.705),   # beside way 100 seg 0
        (1, -73.995, 40.7105),   # above way 100 seg 1
        (2, -73.985, 40.710),    # near way 200
        (3, -74.2, 40.9),        # far from everything: no match
    ]
    pts = spark.createDataFrame(
        pts_rows, "point_id long, px double, py double"
    )
    tol = 0.02
    got = {
        r["point_id"]: (r["seg_id"], r["dist2"])
        for r in nearest_edge_join(pts, seg, tol).collect()
    }

    segs = {
        r["seg_id"]: (r["x1"], r["y1"], r["x2"], r["y2"])
        for r in seg.collect()
    }

    def brute(px, py):
        best = None
        for sid, (x1, y1, x2, y2) in sorted(segs.items()):
            dx, dy = x2 - x1, y2 - y1
            L2 = dx * dx + dy * dy
            t = 0.0 if L2 == 0 else min(
                max(((px - x1) * dx + (py - y1) * dy) / L2, 0.0), 1.0
            )
            d2 = (px - (x1 + t * dx)) ** 2 + (py - (y1 + t * dy)) ** 2
            if d2 <= tol * tol and (best is None or d2 < best[1]):
                best = (sid, d2)
        return best

    for pid, px, py in [(r[0], r[1], r[2]) for r in pts_rows]:
        want = brute(px, py)
        if want is None:
            assert pid not in got
        else:
            assert got[pid][0] == want[0], (pid, got.get(pid), want)
            assert np.isclose(got[pid][1], want[1], rtol=1e-12)


def test_geojson_lines_matches_xml_segments(spark, osm_file, tmp_path):
    # the osmnx-export-shaped ndjson path must yield the same segments
    feats = []
    for way_id, coords, name, hw in [
        (100, [[-74.0, 40.7], [-74.0, 40.71], [-73.99, 40.71]],
         "Test Street", "residential"),
        (200, [[-73.99, 40.72], [-73.98, 40.7]], None, "primary"),
    ]:
        feats.append(
            {
                "type": "Feature",
                "geometry": {"type": "LineString", "coordinates": coords},
                "properties": {"way_id": way_id, "name": name, "highway": hw},
            }
        )
    p = tmp_path / "lines.ndjson"
    p.write_text("\n".join(json.dumps(f) for f in feats))

    gj = {
        r["edge_id"]: r
        for r in load_geojson_lines(spark, str(p)).collect()
    }
    xml = {
        r["edge_id"]: r
        for r in load_osm_xml(spark, str(osm_file)).collect()
    }
    assert set(gj) == set(xml)
    for eid in gj:
        for c in ("way_id", "name", "highway", "x1", "y1", "x2", "y2"):
            assert gj[eid][c] == xml[eid][c], (eid, c)


def test_pbf_gate_raises_with_guidance(spark):
    with pytest.raises((ImportError, NotImplementedError), match="pbf|osmium"):
        load_osm_pbf(spark, "/nonexistent.osm.pbf")


def test_drive_filter_is_the_reference_network_type():
    # reference: ox.graph_from_place(..., network_type='drive')
    assert "residential" in DRIVE_HIGHWAYS
    assert "footway" not in DRIVE_HIGHWAYS


def test_geojson_missing_property_keys_yield_nulls(spark, tmp_path):
    # an export with no way_id/name/highway keys anywhere must load
    # with typed NULL columns, not crash analysis (ADVICE-class fix)
    f = {
        "type": "Feature",
        "geometry": {"type": "LineString",
                     "coordinates": [[-74.0, 40.7], [-73.99, 40.71]]},
        "properties": {"osmid": 7},
    }
    p = tmp_path / "bare.ndjson"
    p.write_text(json.dumps(f))
    rows = load_geojson_lines(spark, str(p)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["way_id"] is None and r["edge_id"] is None
    assert r["name"] is None and r["highway"] is None
    assert (r["x1"], r["y1"], r["x2"], r["y2"]) == (-74.0, 40.7, -73.99, 40.71)


def test_edge_ids_do_not_collide_on_long_ways(spark, tmp_path):
    # a 1001-node way (legal: OSM caps at 2000) must not alias into the
    # next way id's segment keyspace
    nodes = "".join(
        f'<node id="{i}" lat="{40.7 + i * 1e-6}" lon="-74.0"/>'
        for i in range(1, 1002)
    )
    nds = "".join(f'<nd ref="{i}"/>' for i in range(1, 1002))
    xml = (
        "<?xml version='1.0'?><osm>" + nodes +
        f'<way id="500">{nds}<tag k="highway" v="primary"/></way>'
        '<node id="2000" lat="40.8" lon="-74.1"/>'
        '<node id="2001" lat="40.81" lon="-74.1"/>'
        '<way id="501"><nd ref="2000"/><nd ref="2001"/>'
        '<tag k="highway" v="primary"/></way>'
        "</osm>"
    )
    p = tmp_path / "long.osm"
    p.write_text(xml)
    edges = load_osm_xml(spark, str(p)).collect()
    ids = [r["edge_id"] for r in edges]
    assert len(ids) == len(set(ids)) == 1001  # 1000 segments + 1
    assert 501 * 100_000 in ids  # way 501's first segment, unaliased


def test_root_detach_mid_way_keeps_the_open_ways_segments(spark, tmp_path):
    """The periodic root-detach (every 100k end events) must not lose
    an in-progress way: build an extract where the 100,000th end event
    lands on an <nd> INSIDE an open <way>, so the slice deletion
    detaches everything up to (and the safety argument says: except)
    that open way. The way's full segment list and the coordinates of
    long-cleared early nodes must both survive.

    Node end events 1..99,997; the way's first three <nd> are events
    99,998-100,000 (the detach trigger); three more <nd> and the
    highway tag follow, so the way closes well after the detach."""
    n_nodes = 99_997
    lines = [
        "<?xml version='1.0' encoding='UTF-8'?>",
        '<osm version="0.6" generator="test">',
    ]
    for i in range(1, n_nodes + 1):
        lines.append(
            f'  <node id="{i}" lat="{40.0 + i * 1e-6:.6f}" lon="-74.000"/>'
        )
    refs = [1, 2, 3, 4, 5, 6]  # cleared long before the way opens
    lines.append('  <way id="777">')
    for ref in refs:
        lines.append(f'    <nd ref="{ref}"/>')
    lines.append('    <tag k="highway" v="residential"/>')
    lines.append("  </way>")
    lines.append("</osm>")
    p = tmp_path / "big.osm"
    p.write_text("\n".join(lines))

    rows = {r["edge_id"]: r for r in load_osm_xml(spark, str(p)).collect()}
    assert set(rows) == {777 * 100_000 + k for k in range(len(refs) - 1)}
    first = rows[777 * 100_000]
    assert first.u == 1 and first.v == 2
    assert abs(first.y1 - 40.000001) < 1e-9  # node 1's coords survived
    assert abs(first.y2 - 40.000002) < 1e-9
