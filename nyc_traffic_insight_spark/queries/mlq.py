"""Catalog: MLlib pipeline queries (SURVEY.md §2.11, M1–M9).

sklearn↔MLlib models never match numerically (different optimizers,
different tree binning), so these are rows-only checks here; the
pipeline-level invariants (R² floor, expm1∘log1p round-trip, importance
normalization, segmented routing) are pinned in tests/test_ml.py
(SURVEY.md §5.4). The SQL-checkable skeleton of the metric math is the
``agg_regression_metrics`` / ``ols_closed_form`` entries in
aggregates.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_traffic_insight_spark.queries import register


@register(
    "ml_linear_regression",
    survey="M1 LinearRegression fit+metrics (backend/LinearRegression.py:11-93)",
    oracle=None,  # MLlib-internal numerics: rows-only
)
def ml_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_traffic_insight_spark.ml.pipelines import linear_regression_metrics

    return linear_regression_metrics(spark, sf_dir)


@register(
    "ml_random_forest",
    survey="M2 RandomForestRegressor 100×15 seed42 (backend/random_forest.py:17)",
    oracle=None,
)
def ml_random_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_traffic_insight_spark.ml.pipelines import random_forest_metrics

    return random_forest_metrics(spark, sf_dir)


@register(
    "ml_gbt",
    survey="M3 HistGradientBoosting → GBTRegressor (HistGradientBoostingRegressor.py:118-125)",
    oracle=None,
)
def ml_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_traffic_insight_spark.ml.pipelines import gbt_metrics

    return gbt_metrics(spark, sf_dir)


@register(
    "ml_segmented_model",
    survey="M4 event/normal segmented router (SegmentedModeling.py:18-108)",
    oracle=None,
)
def ml_segmented_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_traffic_insight_spark.ml.pipelines import segmented_model_metrics

    return segmented_model_metrics(spark, sf_dir)
