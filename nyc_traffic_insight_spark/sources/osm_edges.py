"""OSM road-network extract → edge/segment DataFrame (last reference
delta, VERDICT r6 #6).

Reference behavior (scripts/point_to_linestring.py:24-29): osmnx
downloads the NYC drive network and builds a graph whose EDGES carry
the road geometry; :54-65 then snaps each traffic point to its nearest
edge. The engine-side counterpart is a source that turns a public OSM
extract into the ``seg_id, x1, y1, x2, y2`` segment table that
``operators/spatial.py::nearest_edge_join`` consumes (plus the way
metadata a user would filter on), replacing the osmnx download with
reproducible file input.

Three formats, by how they actually ship:

- ``.osm`` XML (load_osm_xml): stdlib-parsed — no dependency. OSM XML
  is ONE document, not splittable, so the parse is a driver-side
  one-time prep exactly like the reference script; the output goes to
  parquet once and every downstream read is columnar+splittable. Fine
  for city extracts (NYC drive network ≈ 10⁵ ways); NOT the planet
  path.
- ``.osm.pbf`` (load_osm_pbf): the planet path — import-gated on
  ``osmium`` / ``pyrosm`` (absent in this container, same gate pattern
  as Sedona), raising with install guidance rather than a stub result.
- LineString GeoJSON / ndjson (load_geojson_lines): what an
  osmnx/overpass export actually looks like on disk. Read with
  spark.read.json (splittable in ndjson form), exploded into segments
  JVM-side — the fully distributed path.

A way with n geometry nodes yields n-1 directed segments
(``edge_id = way_id * _SEG_STRIDE + k`` for the k-th segment,
mirroring how osmnx keys multi-segment edges; the stride of 10⁵
clears the OSM API's 2000-node way cap with room, so segment keys of
consecutive way ids can never collide); ``highway`` classifies,
``name`` labels. Coordinates stay EPSG:4326 — snap tolerance is in degrees like
the catalog's J5 grid, and functions/geo.py reprojects when meters are
needed.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = (
    "edge_id long, way_id long, u long, v long, name string, "
    "highway string, x1 double, y1 double, x2 double, y2 double"
)

# edge_id = way_id * stride + segment index. OSM caps ways at 2000
# nodes (1999 segments), so a stride of 10^5 guarantees no aliasing
# into the next way's keyspace; way ids are ~2^31 today, leaving
# 10^5 * 2^31 ≈ 2^48 well inside int64.
_SEG_STRIDE = 100_000

# way types the reference's network_type='drive' keeps (osmnx's drive
# filter, minus the service/track tail): everything a car routes on
DRIVE_HIGHWAYS = frozenset(
    {
        "motorway", "trunk", "primary", "secondary", "tertiary",
        "unclassified", "residential", "living_street",
        "motorway_link", "trunk_link", "primary_link",
        "secondary_link", "tertiary_link",
    }
)


def load_osm_xml(
    spark: SparkSession,
    path: str,
    highways: frozenset[str] | None = DRIVE_HIGHWAYS,
) -> DataFrame:
    """Parse an OSM XML extract into the edge-segment table.

    Driver-side by design: .osm is a single XML document (not
    splittable), and the reference's graph build is the same one-time
    prep step — land the result in parquet and scan THAT at scale.
    ``highways=None`` keeps every way that has a highway tag."""
    nodes: dict[int, tuple[float, float]] = {}
    rows: list[tuple] = []
    # iterparse with eager clearing: nodes dominate an extract (~90% of
    # elements), so BOTH consumed element kinds are cleared, and the
    # root's processed children are detached periodically — without the
    # root detach every cleared-but-attached Element still costs its
    # object header and the parse is O(file), not O(way)
    it = ET.iterparse(path, events=("start", "end"))
    _, root = next(it)  # the <osm> root, for periodic child detach
    n_seen = 0
    for event, el in it:
        if event != "end":
            continue
        if el.tag == "node":
            nodes[int(el.get("id"))] = (
                float(el.get("lon")), float(el.get("lat"))
            )
            el.clear()
        elif el.tag == "way":
            tags = {
                t.get("k"): t.get("v") for t in el.findall("tag")
            }
            hw = tags.get("highway")
            if hw is not None and (highways is None or hw in highways):
                way_id = int(el.get("id"))
                refs = [int(nd.get("ref")) for nd in el.findall("nd")]
                name = tags.get("name")
                for k in range(len(refs) - 1):
                    u, v = refs[k], refs[k + 1]
                    if u not in nodes or v not in nodes:
                        continue  # clipped extract: endpoint outside bbox
                    (x1, y1), (x2, y2) = nodes[u], nodes[v]
                    rows.append(
                        (
                            way_id * _SEG_STRIDE + k, way_id, u, v,
                            name, hw, x1, y1, x2, y2,
                        )
                    )
            el.clear()
        n_seen += 1
        if n_seen % 100_000 == 0:
            # detach already-processed children from the root so the
            # cleared husks become garbage-collectable. Slice deletion
            # is O(children); per-child root.remove() is O(children²)
            # per pass (~0.9 s per 100k on this box — minutes of pure
            # list churn on a metro extract). Keeping only the LAST
            # child is safe: root's children append in start-tag order,
            # so the last one is either el itself or the still-open way
            # el is nested under (whose subtree the parser stack and
            # the end-event handler reference directly, not via root).
            del root[:-1]
    return spark.createDataFrame(rows, EDGE_SCHEMA)


def load_osm_pbf(
    spark: SparkSession,
    path: str,
    highways: frozenset[str] | None = DRIVE_HIGHWAYS,
) -> DataFrame:
    """Planet-scale extracts: requires a pbf parser, absent here.

    Import-gated like the Sedona backend (operators/spatial.py): the
    engine's plumbing (schema, segment expansion, nearest_edge_join
    handoff) is identical to load_osm_xml — only the decode step needs
    the native reader."""
    try:
        import osmium  # noqa: F401
    except ImportError:
        try:
            import pyrosm  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "reading .osm.pbf needs 'osmium' or 'pyrosm' "
                "(neither is installed); convert the extract to .osm "
                "XML (osmium cat x.osm.pbf -o x.osm) or a LineString "
                "GeoJSON export and use load_osm_xml / "
                "load_geojson_lines"
            ) from e
    raise NotImplementedError(
        "pbf fast-path not wired in this environment; see load_osm_xml"
    )


def load_geojson_lines(spark: SparkSession, path: str) -> DataFrame:
    """LineString FeatureCollection/ndjson (an osmnx or overpass
    export) → the same edge-segment table, fully Spark-side.

    Each feature's coordinate array explodes into consecutive pairs
    with posexplode + a self-zip offset — no Python row loop; ndjson
    input keeps the read splittable (sources/geojson.py documents the
    multiLine tradeoff for whole-collection files).

    Properties absent from the whole file (an export keyed "osmid"
    instead of "way_id", name-less extracts) yield typed NULL columns
    rather than an analysis error; features without a way_id get a
    NULL edge_id — assign surrogate keys downstream if such an export
    must join by edge."""
    feat = spark.read.json(path)

    # read.json infers the properties struct only from keys that occur
    # somewhere in the file — getField on an absent key is an ANALYSIS
    # error, not a null ("osmid"-keyed exports, name-less extracts), so
    # probe the inferred schema and substitute typed nulls for missing
    # fields
    try:
        prop_fields = {
            f.name for f in feat.schema["properties"].dataType.fields
        }
    except (KeyError, AttributeError):
        prop_fields = set()

    def prop(name: str, typ: str):
        if name in prop_fields:
            return F.col("properties").getField(name).cast(typ)
        return F.lit(None).cast(typ)

    coords = F.col("geometry.coordinates")
    seg = (
        feat.filter(F.col("geometry.type") == "LineString")
        .select(
            prop("way_id", "long").alias("way_id"),
            prop("name", "string").alias("name"),
            prop("highway", "string").alias("highway"),
            F.posexplode(
                F.zip_with(
                    F.slice(coords, 1, F.greatest(F.size(coords) - 1, F.lit(0))),
                    F.slice(coords, 2, F.greatest(F.size(coords) - 1, F.lit(0))),
                    lambda a, b: F.struct(
                        a[0].alias("x1"), a[1].alias("y1"),
                        b[0].alias("x2"), b[1].alias("y2"),
                    ),
                )
            ).alias("k", "s"),
        )
    )
    return seg.select(
        (F.col("way_id") * _SEG_STRIDE + F.col("k")).alias("edge_id"),
        "way_id",
        F.lit(None).cast("long").alias("u"),
        F.lit(None).cast("long").alias("v"),
        "name",
        "highway",
        F.col("s.x1").cast("double").alias("x1"),
        F.col("s.y1").cast("double").alias("y1"),
        F.col("s.x2").cast("double").alias("x2"),
        F.col("s.y2").cast("double").alias("y2"),
    )
