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
from pyspark.sql import functions as F

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


@register(
    "ml_grouped_ols",
    survey="M1 variant via applyInPandas: per-group closed-form OLS "
    "(the grouped-map UDF surface; SegmentedModeling's per-segment fits)",
    oracle="""
    SELECT event_type,
           round(regr_slope(value, CAST(hour(ts) AS DOUBLE)), 6) AS slope,
           round(regr_intercept(value, CAST(hour(ts) AS DOUBLE)), 6)
             AS intercept,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def ml_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple OLS (value ~ hour) as an Arrow-batched grouped
    map: each group's closed-form fit runs in numpy inside
    applyInPandas — the pattern for per-segment model fitting when
    groups are many and each fits in one executor's memory (the
    reference's SegmentedModeling fits per-segment models the same
    way, driver-side). Slope/intercept use the covariance form, which
    matches SQL's regr_slope/regr_intercept to well under the 1e-6
    rounding."""
    import numpy as np
    import pandas as pd

    from nyc_traffic_insight_spark.sources import load_table

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["hh"].to_numpy(dtype="float64")
        y = pdf["value"].to_numpy(dtype="float64")
        vx = ((x - x.mean()) ** 2).sum()
        slope = (((x - x.mean()) * (y - y.mean())).sum() / vx) if vx else None
        inter = (y.mean() - slope * x.mean()) if slope is not None else None
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "slope": [slope],
                "intercept": [inter],
                "n": [len(pdf)],
            }
        )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("double").alias("hh"), "value"
    )
    out = ev.groupBy("event_type").applyInPandas(
        fit, "event_type STRING, slope DOUBLE, intercept DOUBLE, n LONG"
    )
    from nyc_traffic_insight_spark.functions.rounding import r as _r

    return out.select(
        "event_type",
        _r("slope", 6).alias("slope"),
        _r("intercept", 6).alias("intercept"),
        "n",
    )


@register(
    "ml_segmented_router",
    survey="M4 router semantics with a FULL value oracle (VERDICT r5 #2): "
    "the deterministic half of SegmentedModeling.py:61-71 — temporal "
    "80/20 split, event/normal mask routing, rare-segment ×5 oversample "
    "sizing — everything except the submodel fit itself, which stays in "
    "ml_segmented_model (rows-only) with its invariants in tests/test_ml.py",
    oracle="""
    WITH feat AS (
      SELECT l.l_shipdate,
             CAST(l.l_discount > 0.07 AS INTEGER) AS is_event,
             (l.l_quantity * p.p_retailprice) * (1.0 - l.l_discount)
               + 50.0 * CAST(month(l.l_shipdate) AS DOUBLE)
               + ((l.l_orderkey * 2654435761) % 1000) / 10.0 AS label
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_quantity IS NOT NULL AND l.l_discount IS NOT NULL
        AND l.l_tax IS NOT NULL AND p.p_retailprice IS NOT NULL
        AND l.l_shipdate IS NOT NULL
    ),
    flagged AS (
      SELECT is_event, label,
             CASE WHEN percent_rank() OVER (ORDER BY l_shipdate) <= 0.8
                  THEN 'train' ELSE 'test' END AS split
      FROM feat
    ),
    seg AS (
      SELECT split, is_event,
             CAST(count(*) AS BIGINT) AS n,
             round(avg(label), 4) AS avg_label
      FROM flagged GROUP BY split, is_event
    )
    SELECT split, is_event, n, avg_label,
           CAST(CASE WHEN split = 'train' AND is_event = 1
                      AND CAST(n AS DOUBLE) / sum(
                            CASE WHEN split = 'train' THEN n ELSE 0 END
                          ) OVER () < 0.10
                     THEN n * 5 ELSE n END AS BIGINT) AS effective_train_n
    FROM seg
    """,
)
def ml_segmented_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic router/oversample accounting of the segmented model
    as an oracle-checked aggregate: per (split, segment) row counts,
    mean label, and the effective training size after the rare-event ×5
    oversample rule (SegmentedModeling.py:67-71).

    Scale shape: the temporal split is computed on the DATE DIMENSION
    (groupBy l_shipdate shrinks the fact table to |dates| rows, the
    percent_rank window runs over that tiny dim — percent_rank assigns
    tie groups their first rank, so the per-date value equals the
    per-row value) and broadcast-joined back; no global window over
    fact rows, no single-partition exchange on fact-sized data."""
    from pyspark.sql import Window

    from nyc_traffic_insight_spark.functions.rounding import r as _r
    from nyc_traffic_insight_spark.ml.pipelines import feature_table

    feat = feature_table(spark, sf_dir).select(
        "l_shipdate",
        (F.col("l_discount") > 0.07).cast("int").alias("is_event"),
        F.col("label_vol").alias("label"),
    )
    dates = feat.groupBy("l_shipdate").agg(F.count("*").alias("cnt"))
    whole = Window.partitionBy()
    preceding = (
        Window.orderBy("l_shipdate")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dated = dates.select(
        "l_shipdate",
        (
            F.coalesce(F.sum("cnt").over(preceding), F.lit(0))
            / (F.sum("cnt").over(whole) - F.lit(1))
        ).alias("pr"),
    ).select(
        "l_shipdate",
        F.when(F.col("pr") <= 0.8, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    seg = (
        feat.join(F.broadcast(dated), "l_shipdate")
        .groupBy("split", "is_event")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            _r(F.avg("label"), 4).alias("avg_label"),
        )
    )
    train_total = F.sum(
        F.when(F.col("split") == "train", F.col("n")).otherwise(F.lit(0))
    ).over(Window.partitionBy())
    return seg.select(
        "split",
        "is_event",
        "n",
        "avg_label",
        F.when(
            (F.col("split") == "train")
            & (F.col("is_event") == 1)
            & (F.col("n").cast("double") / train_total < 0.10),
            F.col("n") * 5,
        )
        .otherwise(F.col("n"))
        .cast("bigint")
        .alias("effective_train_n"),
    )


@register(
    "ml_propensity_model",
    survey="M-family extension: the catalog's first CLASSIFIER — "
    "MLlib LogisticRegression on the leakage-safe propensity table "
    "(pipeline_training_dataset), evaluated with areaUnderROC "
    "(rows-only: MLlib-internal optimizer numerics; the exact-AUC "
    "skeleton of the evaluation is the oracle-checked agg_auc_exact)",
    oracle=None,
)
def ml_propensity_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit will-purchase propensity on the training split of
    pipeline_training_dataset (features: n_events, n_purchases,
    mean_value, recency_s), score the test split, report train/test
    AUC and the coefficient vector. Seeded and single-threaded-stable;
    invariants (AUC ≥ 0.5 on train, coefficients finite, test scoring
    covers every test row) are pinned in tests/test_ml.py."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    from nyc_traffic_insight_spark.queries import REGISTRY

    ds = REGISTRY["pipeline_training_dataset"].builder(spark, sf_dir)
    feats = ["n_events", "n_purchases", "mean_value", "recency_s"]
    va = VectorAssembler(inputCols=feats, outputCol="features")
    train = va.transform(ds.filter(F.col("split") == "train"))
    test = va.transform(ds.filter(F.col("split") == "test"))
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=50, regParam=0.01
    )
    model = lr.fit(train)
    ev = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    )
    train_auc = ev.evaluate(model.transform(train))
    # One row per feature (posexplode shape): every output column is a
    # driver-hashable scalar — the driver's rows-only canonicalization
    # sorts EVERY column, and an array<double> column crashes that sort
    # (CORRECTNESS_r06 TypeError: unhashable type 'list').
    rows = [
        (
            feat,
            float(coef),
            float(train_auc),
            float(test.count()),
            float(model.intercept),
        )
        for feat, coef in zip(feats, model.coefficients)
    ]
    return spark.createDataFrame(
        rows,
        "feature string, coefficient double, train_auc double, "
        "n_test double, intercept double",
    )
