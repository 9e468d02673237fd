"""GeoJSON source/sink (SURVEY.md §2.1 S6/S8).

The reference loads whole GeoJSON FeatureCollections with json.load and
iterates features in Python (``main.py:175-191``); writing assembles a
dict and json.dumps (``convert_traffic_csv_to_geojson_point.py:52-59``).
Spark form: explicit-schema spark.read.json + explode(features) for the
source; struct + to_json + coalesce(1) for the single-file sink.

A FeatureCollection is ONE json object spanning the file, so the read
uses multiLine=true — fine for the reference's 515 MB file, but not
splittable; at 100 TB the right layout is newline-delimited Features
(one per line, the default splittable JSON source), which
``write_features_ndjson`` produces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROPERTIES = StructType(
    [
        StructField("RequestID", LongType()),
        StructField("Volume", DoubleType()),
        StructField("Timestamp", StringType()),
        StructField("Street", StringType()),
        StructField("From", StringType()),
        StructField("To", StringType()),
        StructField("Direction", StringType()),
        StructField("Borough", StringType()),
    ]
)

FEATURE = StructType(
    [
        StructField("type", StringType()),
        StructField(
            "geometry",
            StructType(
                [
                    StructField("type", StringType()),
                    StructField("coordinates", ArrayType(DoubleType())),
                ]
            ),
        ),
        StructField("properties", PROPERTIES),
    ]
)

FEATURE_COLLECTION = StructType(
    [
        StructField("type", StringType()),
        StructField("features", ArrayType(FEATURE)),
    ]
)


def read_feature_collection(spark: SparkSession, path: str) -> DataFrame:
    """S6: FeatureCollection file → one row per feature (flattened)."""
    fc = spark.read.json(path, schema=FEATURE_COLLECTION, multiLine=True)
    feat = fc.select(F.explode("features").alias("f"))
    return feat.select(
        F.col("f.geometry.type").alias("geom_type"),
        F.col("f.geometry.coordinates").getItem(0).alias("lon"),
        F.col("f.geometry.coordinates").getItem(1).alias("lat"),
        F.col("f.properties.*"),
    )


def feature_struct(df: DataFrame) -> Column:
    """Rows (lon, lat, RequestID, Volume, ...) → GeoJSON Feature struct."""
    props = F.struct(*[F.col(f.name) for f in PROPERTIES.fields])
    return F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array("lon", "lat").alias("coordinates"),
        ).alias("geometry"),
        props.alias("properties"),
    )


def write_features_ndjson(df: DataFrame, path: str) -> None:
    """Scalable sink: one Feature per line (splittable on re-read)."""
    df.select(F.to_json(feature_struct(df)).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def write_feature_collection(df: DataFrame, path: str) -> None:
    """S8: single-file FeatureCollection, matching the reference's output
    shape. coalesce(1) + driver-side concat is acceptable because this
    sink is explicitly a small-export path (SURVEY.md §7)."""
    features = df.select(F.to_json(feature_struct(df)).alias("j")).coalesce(1)
    body = features.agg(F.concat_ws(",", F.collect_list("j")).alias("b"))
    fc = body.select(
        F.concat(
            F.lit('{"type":"FeatureCollection","features":['),
            F.col("b"),
            F.lit("]}"),
        ).alias("value")
    )
    fc.coalesce(1).write.mode("overwrite").text(path)


def linestring_feature(df: DataFrame) -> Column:
    """LineString Feature struct from endpoint columns (lon1, lat1,
    lon2, lat2) — the reference's OSM-snapped segment output shape
    (``scripts/point_to_linestring.py:67-80``)."""
    props = F.struct(*[F.col(f.name) for f in PROPERTIES.fields])
    return F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("LineString").alias("type"),
            F.array(
                F.array("lon1", "lat1"), F.array("lon2", "lat2")
            ).alias("coordinates"),
        ).alias("geometry"),
        props.alias("properties"),
    )


def write_linestrings_ndjson(df: DataFrame, path: str) -> None:
    """Splittable LineString sink: one Feature per line."""
    df.select(F.to_json(linestring_feature(df)).alias("value")).write.mode(
        "overwrite"
    ).text(path)
