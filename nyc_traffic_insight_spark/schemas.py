"""Explicit schemas for every table the engine touches.

The reference infers every schema at read time and then patches dtypes
imperatively (``backend/raw_merge.py:25-26``,
``traffic_volume_models/RandomForest.py:47-48`` — ``astype(int)`` on the
join keys because inference disagrees across files). We declare schemas
once instead; see SURVEY.md §1.

Two groups:
- the driver's TPC-H-ish test tables (TESTDATA.md / FIXTURES.md §B)
- the reference-shaped ``traffic`` / ``weather`` tables (FIXTURES.md §A),
  used by the reference-semantics fixtures in ``tests/``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# ---------------------------------------------------------------- testdata

REGION = _st(("r_regionkey", IntegerType()), ("r_name", StringType()))

NATION = _st(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)

CUSTOMER = _st(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)

SUPPLIER = _st(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)

PART = _st(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)

ORDERS = _st(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampType()),
    ("o_orderpriority", StringType()),
)

LINEITEM = _st(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampType()),
)

EVENTS = _st(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)

DOCUMENTS = _st(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)

EMBEDDINGS = _st(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType())),
    ("label", IntegerType()),
)

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)


# ------------------------------------------------- reference-shaped tables

# NYC DOT Automated Traffic Volume Counts shape.
# Columns per reference `backend/raw_merge.py:12-33`,
# `scripts/convert_traffic_csv_to_geojson_point.py:12,36-44`.
TRAFFIC = _st(
    ("RequestID", LongType()),
    ("Boro", StringType()),
    ("Yr", IntegerType()),
    ("M", IntegerType()),
    ("D", IntegerType()),
    ("HH", IntegerType()),
    ("MM", IntegerType()),
    ("Vol", DoubleType()),
    ("SegmentID", LongType()),
    ("WktGeom", StringType()),
    ("street", StringType()),
    ("fromSt", StringType()),
    ("toSt", StringType()),
    ("Direction", StringType()),
)

# Open-Meteo hourly shard shape, per reference `scripts/enrich_weather.py:145-166`.
WEATHER = _st(
    ("date", TimestampType()),
    ("latitude", DoubleType()),
    ("longitude", DoubleType()),
    ("borough", StringType()),
    ("temperature_2m", DoubleType()),
    ("precipitation", DoubleType()),
    ("cloud_cover_low", DoubleType()),
    ("snow_depth", DoubleType()),
    ("visibility", DoubleType()),
    ("weather_code", DoubleType()),
    ("freezing_level_height", DoubleType()),
    ("rain", DoubleType()),
    ("showers", DoubleType()),
    ("snowfall", DoubleType()),
    ("uv_index", DoubleType()),
)

# Street-segment endpoint dim (reference `data/processed/coordinate_map.json`
# flattened; `scripts/point_to_linestring.py:32-51`).
COORDINATE_MAP = _st(
    ("street", StringType()),
    ("fromSt", StringType()),
    ("toSt", StringType()),
    ("from_lon", DoubleType()),
    ("from_lat", DoubleType()),
    ("to_lon", DoubleType()),
    ("to_lat", DoubleType()),
)

# Multimodal asset table (north-star extension): opaque binary payload +
# typed metadata. The decode path is a stubbed Pandas UDF (operators/
# multimodal.py); this schema is the real Spark-side contract.
ASSETS = _st(
    ("asset_id", LongType()),
    ("modality", StringType()),  # image | audio | video
    ("payload", BinaryType()),
    ("mime_type", StringType()),
    ("width", IntegerType()),
    ("height", IntegerType()),
    ("duration_ms", LongType()),
)
