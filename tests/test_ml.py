"""ml/pipelines: invariant tests (SURVEY.md §5.4).

sklearn↔MLlib never match numerically, so these pin pipeline-level
invariants instead: R² floor on the temporal split, importance
normalization, permutation importance ranking, save/load round-trip
(S10), single-row serving (M9), and split boundaries (M5/W5).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nyc_traffic_insight_spark.ml.pipelines import (
    FEATURES,
    LABEL,
    feature_table,
    fit_linear_regression,
    fit_random_forest,
    permutation_importance,
    single_row_inference,
    temporal_split,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def split(spark):
    df = feature_table(spark, SF_SMOKE).cache()
    train, test = temporal_split(df)
    return train.cache(), test.cache()


@pytest.fixture(scope="module")
def lr_model(split):
    train, _ = split
    return fit_linear_regression(train)


def test_temporal_split_is_temporal(split):
    train, test = split
    t_max = train.agg(F.max("l_shipdate")).first()[0]
    s_min = test.agg(F.min("l_shipdate")).first()[0]
    assert t_max <= s_min  # no leakage: train strictly precedes test
    n_train, n_test = train.count(), test.count()
    frac = n_train / (n_train + n_test)
    assert 0.75 <= frac <= 0.85


def test_lr_r2_floor(spark, split, lr_model):
    # qty_price ≈ the label's main term, so a linear fit must be strong;
    # mirrors the reference's eyeballed "Expected Test R²" culture
    # (RandomForest.py:4) as an enforced floor.
    from pyspark.ml.evaluation import RegressionEvaluator

    _, test = split
    ev = RegressionEvaluator(labelCol=LABEL, predictionCol="prediction",
                             metricName="r2")
    assert ev.evaluate(lr_model.transform(test)) > 0.8


def test_model_save_load_roundtrip(spark, tmp_path, split, lr_model):
    # S10: MLlib writer/reader replaces the reference's joblib dump/load
    # (save_models.py:32,43,50; main.py:108-144).
    from pyspark.ml import PipelineModel

    _, test = split
    path = str(tmp_path / "lr_model")
    lr_model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    a = [r["prediction"] for r in lr_model.transform(test).collect()]
    b = [r["prediction"] for r in loaded.transform(test).collect()]
    assert a == b


def test_rf_feature_importances_normalized(split):
    # M7: impurity importances form a distribution (sum==1, all >=0).
    train, _ = split
    model = fit_random_forest(train, num_trees=10, max_depth=6)
    imp = model.stages[-1].featureImportances.toArray()
    assert len(imp) == len(FEATURES)
    assert all(v >= 0 for v in imp)
    assert math.isclose(float(imp.sum()), 1.0, rel_tol=1e-9)


def test_permutation_importance_ranks_dominant_feature(spark, split, lr_model):
    # M8: permuting the feature that carries the signal (qty_price) must
    # hurt R² more than any other single feature.
    _, test = split
    imp = permutation_importance(spark, lr_model, test, n_repeats=2)
    assert set(imp) == set(FEATURES)
    assert max(imp, key=imp.get) == "qty_price"
    assert imp["qty_price"] > 0.1


def test_single_row_inference_matches_batch(spark, lr_model):
    # M9: the serving path is the same pipeline — one row in, one
    # prediction out, equal to the batch transform of that row.
    row = {
        "l_quantity": 10.0,
        "l_discount": 0.05,
        "l_tax": 0.04,
        "p_retailprice": 1500.0,
        "qty_price": 15000.0,
        "mth": 6.0,
        "wd": 2.0,
    }
    p = single_row_inference(spark, lr_model, row)
    batch = spark.createDataFrame([tuple(row[f] for f in FEATURES)], FEATURES)
    want = lr_model.transform(batch).select("prediction").first()[0]
    assert math.isclose(p, want, rel_tol=1e-12)
    assert math.isfinite(p) and p > 0


def test_log_target_roundtrip(spark, split):
    # C11 within M3's shape: training on log1p and inverting with expm1
    # reproduces the raw-scale magnitudes (monotone bijection).
    train, test = split
    model = fit_linear_regression(train.withColumnRenamed("label_log", "y"),
                                  label_col="y")
    pred = model.transform(test).withColumn("raw_pred", F.expm1("prediction"))
    row = pred.agg(
        F.min("raw_pred").alias("lo"), F.corr("raw_pred", LABEL).alias("c")
    ).first()
    assert row["lo"] > 0  # expm1(log-space prediction) stays positive
    assert row["c"] > 0.8


def test_scalable_split_agrees_with_reference_split(spark):
    # the quantile-cutoff split must place the same fraction and keep
    # the temporal boundary, without any single-partition window
    from nyc_traffic_insight_spark.ml.pipelines import temporal_split_scalable

    df = feature_table(spark, SF_SMOKE)
    train, test = temporal_split_scalable(df)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == df.count()
    frac = n_train / (n_train + n_test)
    assert 0.75 <= frac <= 0.85
    t_max = train.agg(F.max("l_shipdate")).first()[0]
    s_min = test.agg(F.min("l_shipdate")).first()[0]
    assert t_max < s_min


def test_mllib_lr_matches_closed_form_ols(spark):
    # VERDICT r4 #6: close the loop between the oracle-green closed-form
    # OLS (aggregates.py::ols_closed_form — slope = cov/var, checked
    # against DuckDB by value hash) and the MLlib optimizer path. An
    # unregularized univariate LinearRegression on the same (x, y)
    # column pair must reproduce the closed-form slope/intercept to
    # optimizer precision — if MLlib's answer drifts from the aggregate
    # algebra, one of the two M1 paths is wrong.
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from nyc_traffic_insight_spark.sources import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_quantity", "l_extendedprice"
    )
    agg = li.agg(
        (
            F.covar_pop("l_quantity", "l_extendedprice")
            / F.var_pop("l_quantity")
        ).alias("slope"),
        F.avg("l_extendedprice").alias("my"),
        F.avg("l_quantity").alias("mx"),
    ).first()
    want_slope = agg["slope"]
    want_intercept = agg["my"] - want_slope * agg["mx"]

    train = VectorAssembler(
        inputCols=["l_quantity"], outputCol="features"
    ).transform(li)
    model = LinearRegression(
        featuresCol="features",
        labelCol="l_extendedprice",
        regParam=0.0,
        solver="normal",
    ).fit(train)
    got_slope = float(model.coefficients[0])
    got_intercept = float(model.intercept)

    assert math.isclose(got_slope, want_slope, rel_tol=1e-6)
    assert math.isclose(got_intercept, want_intercept, rel_tol=1e-6)


def test_propensity_model_learns_and_scores(spark):
    from nyc_traffic_insight_spark.queries import load_all
    from tests.conftest import SF_SMOKE

    rows = load_all()["ml_propensity_model"].builder(spark, SF_SMOKE).collect()

    assert len(rows) == 4  # one row per feature
    assert {r["feature"] for r in rows} == {
        "n_events", "n_purchases", "mean_value", "recency_s"
    }
    for row in rows:
        assert row["auc_floor_ok"] is True
        assert row["coefficient_finite"] is True
        assert row["test_scored"] is True
