"""Catalog: multimodal (binary payload) queries.

North-star extension (BASELINE.json): a 100 TB training-data pipeline
carries image/audio/video as opaque ``binary`` columns with typed
metadata. The Spark-side plumbing — binary column, Arrow-batched
``mapInPandas`` decode/feature-extract, frame-sample fan-out — is real
(``operators/multimodal.py``); only the codec is a deterministic fake
(sha256-derived features), which is exactly what makes a full DuckDB
value oracle possible: both engines compute uint16/65535.0 from the
same sha256 digest.

Assets are synthesized from the documents table (payload = UTF-8 bytes
of text, modality cycles by doc_id, video duration derived from
n_chars) so Spark and DuckDB construct bit-identical inputs.

Scale notes:
- payloads move executor-side only, as Arrow record batches
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds memory for
  fat binaries); nothing is collected.
- decode/extract is a narrow map — the first shuffle is whatever
  aggregation consumes the (small) extracted features.
- frame sampling multiplies rows executor-side (flatMap shape), the
  same plan a real video pipeline uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_traffic_insight_spark.operators.multimodal import (
    extract_features,
    sample_video_frames,
)
from nyc_traffic_insight_spark.queries import register
from nyc_traffic_insight_spark.queries.textops import _docs


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → assets(asset_id, modality, payload binary,
    duration_ms): the engine's canonical multimodal table shape."""
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    mod3 = F.col("doc_id") % 3
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.when(mod3 == 0, "image")
        .when(mod3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.when(mod3 == 2, F.lit(1000) + (F.col("n_chars") * 7) % 9000)
        .cast("long")
        .alias("duration_ms"),
    )


_ASSETS_SQL = """
    assets AS (
      SELECT doc_id AS asset_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             sha256(text) AS hex,
             octet_length(encode(text)) AS payload_bytes,
             CASE WHEN doc_id % 3 = 2
                  THEN 1000 + (n_chars * 7) % 9000 END AS duration_ms
      FROM documents WHERE text IS NOT NULL
    )
"""


def _feat_sql(k: int) -> str:
    """Feature k of the fake decoder: little-endian uint16 from sha256
    digest bytes (2k, 2k+1), as a fraction of 65535."""
    lo, hi = 4 * k + 1, 4 * k + 3
    return (
        f"(('0x' || substr(hex, {lo}, 2))::INT"
        f" + 256 * ('0x' || substr(hex, {hi}, 2))::INT) / 65535.0"
    )


@register(
    "mm_extract_features",
    survey="north-star: multimodal decode/feature-extract via mapInPandas",
    oracle=f"""
    WITH {_ASSETS_SQL}
    SELECT asset_id, modality, TRUE AS ok, 16 AS feat_dim,
           {_feat_sql(0)} AS feat_0,
           {_feat_sql(7)} AS feat_7,
           {_feat_sql(15)} AS feat_15
    FROM assets
    """,
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract every asset through the Arrow-batched
    mapInPandas operator; probe features are exact doubles (uint16 /
    65535.0), so no rounding is needed for hash stability."""
    feats = extract_features(_assets(spark, sf_dir))
    return feats.select(
        "asset_id",
        "modality",
        "ok",
        "feat_dim",
        F.element_at("features", 1).alias("feat_0"),
        F.element_at("features", 8).alias("feat_7"),
        F.element_at("features", 16).alias("feat_15"),
    )


@register(
    "mm_video_frames",
    survey="north-star: video frame-sample fan-out (explode(sequence))",
    oracle=f"""
    WITH {_ASSETS_SQL}
    SELECT asset_id, unnest(range(0, duration_ms, 1000)) AS frame_ms
    FROM assets WHERE modality = 'video'
    """,
)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One output row per sampled frame (1 frame/s). Pure relational
    fan-out — explode(sequence) inside whole-stage codegen, no Python
    in the plan; a real frame decoder chains extract_features onto the
    (asset_id, frame_ms) rows this emits."""
    return sample_video_frames(_assets(spark, sf_dir), every_ms=1000)


@register(
    "mm_asset_stats",
    survey="north-star: corpus rollup over binary payload metadata",
    oracle=f"""
    WITH {_ASSETS_SQL}
    SELECT modality, count(*) AS n_assets,
           CAST(sum(payload_bytes) AS BIGINT) AS total_bytes,
           CAST(sum(coalesce(duration_ms, 0)) AS BIGINT) AS total_ms
    FROM assets GROUP BY modality
    """,
)
def mm_asset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup: byte/duration accounting per modality —
    the partition-planning query every media pipeline runs first."""
    return (
        _assets(spark, sf_dir)
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
            F.sum(F.coalesce("duration_ms", F.lit(0)))
            .cast("bigint")
            .alias("total_ms"),
        )
    )
