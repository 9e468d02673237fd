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
    survey="M1 LinearRegression fit+metrics (backend/LinearRegression.py:11-93); S10 model sink/source = MLlib write/load, pinned in tests/test_ml.py (save_models.py:32,43,50)",
    oracle=None,  # MLlib-internal numerics: rows-only
)
def ml_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_traffic_insight_spark.ml.pipelines import linear_regression_metrics

    return linear_regression_metrics(spark, sf_dir)


@register(
    "ml_random_forest",
    survey="M2 RandomForestRegressor 100×15 seed42 (backend/random_forest.py:17) + M7 impurity importances invariant (backend/random_forest.py:106-109)",
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


@register(
    "ml_permutation_importance",
    survey="M8 permutation importance, A8 desc sort "
    "(HistGradientBoostingRegressor.py:128-137; SegmentedModeling.py:144-158)",
    oracle=None,  # model-dependent numerics: rows-only
)
def ml_permutation_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feature permutation importance of a linear model on the
    temporal test split, sorted descending (the reference prints the
    same table). Reduced n_repeats for the per-round driver run; the
    reference's n_repeats=5 is the helper's default."""
    from nyc_traffic_insight_spark.ml.pipelines import (
        feature_table,
        fit_linear_regression,
        permutation_importance,
        temporal_split,
    )

    df = feature_table(spark, sf_dir)
    train, test = temporal_split(df)
    model = fit_linear_regression(train)
    imp = permutation_importance(spark, model, test, n_repeats=2)
    rows = sorted(imp.items(), key=lambda kv: (-kv[1], kv[0]))
    return spark.createDataFrame(rows, "feature STRING, importance DOUBLE")


@register(
    "ml_inference_single_row",
    survey="M9 single-row /predict serving path (main.py:278-310)",
    oracle=None,
)
def ml_inference_single_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train once, predict one request-shaped row through the same
    pipeline — the FastAPI /predict path as a catalog entry."""
    from nyc_traffic_insight_spark.ml.pipelines import (
        FEATURES,
        feature_table,
        fit_linear_regression,
        single_row_inference,
    )

    model = fit_linear_regression(feature_table(spark, sf_dir))
    row = {
        "l_quantity": 10.0,
        "l_discount": 0.05,
        "l_tax": 0.04,
        "p_retailprice": 1500.0,
        "qty_price": 15000.0,
        "mth": 6.0,
        "wd": 2.0,
    }
    assert set(row) == set(FEATURES)
    pred = single_row_inference(spark, model, row)
    return spark.createDataFrame(
        [("linear_regression", pred)], "model STRING, prediction DOUBLE"
    )
