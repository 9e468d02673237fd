"""sources/geojson: S6 FeatureCollection read / S8 sinks round-trip.

The reference reads a whole FeatureCollection with json.load
(main.py:175-191) and writes one with json.dumps
(convert_traffic_csv_to_geojson_point.py:52-59); these tests pin our
spark.read.json(multiLine) + explode source and both sink shapes
(single-file FeatureCollection, splittable NDJSON) against each other.
"""

from __future__ import annotations

import glob
import json

from nyc_traffic_insight_spark.sources.geojson import (
    read_feature_collection,
    write_feature_collection,
    write_features_ndjson,
)

ROWS = [
    (-73.98, 40.75, 1, 12.0, "2024-01-01T07:00:00", "BROADWAY", "W 42", "W 43", "NB", "Manhattan"),
    (-73.95, 40.65, 2, 5.0, "2024-01-01T08:00:00", "FLATBUSH", "AV A", "AV B", "SB", "Brooklyn"),
]
SCHEMA = (
    "lon DOUBLE, lat DOUBLE, RequestID LONG, Volume DOUBLE, Timestamp STRING, "
    "Street STRING, From STRING, To STRING, Direction STRING, Borough STRING"
)


def test_feature_collection_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = str(tmp_path / "fc")
    write_feature_collection(df, out)

    # the sink writes a valid single-object FeatureCollection
    [part] = glob.glob(out + "/part-*")
    fc = json.loads(open(part).read())
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == 2
    f = sorted(fc["features"], key=lambda f: f["properties"]["RequestID"])[0]
    assert f["geometry"] == {"type": "Point", "coordinates": [-73.98, 40.75]}
    assert f["properties"]["Borough"] == "Manhattan"

    # and our S6 source reads it back to the original rows
    back = read_feature_collection(spark, part)
    got = {
        r["RequestID"]: (r["lon"], r["lat"], r["Street"], r["Borough"])
        for r in back.collect()
    }
    assert got == {
        1: (-73.98, 40.75, "BROADWAY", "Manhattan"),
        2: (-73.95, 40.65, "FLATBUSH", "Brooklyn"),
    }


def test_ndjson_sink_is_splittable_shape(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = str(tmp_path / "nd")
    write_features_ndjson(df, out)
    lines = []
    for part in glob.glob(out + "/part-*"):
        lines += [json.loads(l) for l in open(part) if l.strip()]
    assert len(lines) == 2
    assert all(l["type"] == "Feature" for l in lines)
    assert {l["properties"]["RequestID"] for l in lines} == {1, 2}


def test_linestring_sink(spark, tmp_path):
    from nyc_traffic_insight_spark.sources.geojson import write_linestrings_ndjson

    rows = [
        (-73.98, 40.75, -73.97, 40.76, 1, 12.0, "2024-01-01T07:00:00",
         "BROADWAY", "W 42", "W 43", "NB", "Manhattan"),
    ]
    schema = (
        "lon1 DOUBLE, lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE, RequestID LONG, "
        "Volume DOUBLE, Timestamp STRING, Street STRING, From STRING, "
        "To STRING, Direction STRING, Borough STRING"
    )
    out = str(tmp_path / "lines")
    write_linestrings_ndjson(spark.createDataFrame(rows, schema), out)
    lines = []
    for part in glob.glob(out + "/part-*"):
        lines += [json.loads(l) for l in open(part) if l.strip()]
    [f] = lines
    assert f["geometry"] == {
        "type": "LineString",
        "coordinates": [[-73.98, 40.75], [-73.97, 40.76]],
    }
    assert f["properties"]["Street"] == "BROADWAY"
