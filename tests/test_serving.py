"""serving.py: the three reference endpoints, engine-side."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from nyc_traffic_insight_spark.serving import (
    PredictService,
    map_view,
    publish_map_table,
    volume_color,
)
from nyc_traffic_insight_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _features(spark):
    # events standing in for the traffic features table
    return load_table(spark, SF_SMOKE, "events").select(
        F.col("event_id").alias("RequestID"),
        "ts",
        (F.col("value") * 30).alias("Volume"),
        F.concat(F.lit("b"), (F.col("user_id") % 5)).alias("Borough"),
    )


def test_map_view_is_partition_pruned(spark, tmp_path):
    path = str(tmp_path / "map_table")
    feats = _features(spark)
    publish_map_table(feats, path)

    year = feats.select(F.year("ts")).first()[0]
    view = map_view(spark, path, "B3", year)  # case-insensitive borough

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        view.explain("formatted")
    plan = buf.getvalue()
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "b3" in pf.lower() and "year" in pf

    rows = view.collect()
    want = feats.filter(
        (F.lower("Borough") == "b3") & (F.year("ts") == year)
    ).count()
    assert len(rows) == want > 0
    assert {r["color"] for r in rows} <= {"red", "orange", "yellow", "green"}


def test_volume_color_bins(spark):
    df = spark.createDataFrame([(25.0,), (15.0,), (7.0,), (2.0,)], "v DOUBLE")
    got = [r["c"] for r in df.select(volume_color("v").alias("c")).collect()]
    assert got == ["red", "orange", "yellow", "green"]


def test_predict_service_round_trip(spark, tmp_path):
    from nyc_traffic_insight_spark.ml.pipelines import (
        feature_table,
        fit_linear_regression,
    )

    model = fit_linear_regression(feature_table(spark, SF_SMOKE))
    path = str(tmp_path / "served_model")
    model.write().overwrite().save(path)

    svc = PredictService(spark, path)
    p = svc.predict(
        {
            "l_quantity": 10.0,
            "l_discount": 0.05,
            "l_tax": 0.04,
            "p_retailprice": 1500.0,
            "qty_price": 15000.0,
            "mth": 6.0,
            "wd": 2.0,
        }
    )
    assert p > 0
    # served prediction == direct pipeline prediction (same model, S10)
    from nyc_traffic_insight_spark.ml.pipelines import single_row_inference

    direct = single_row_inference(
        spark,
        model,
        {
            "l_quantity": 10.0,
            "l_discount": 0.05,
            "l_tax": 0.04,
            "p_retailprice": 1500.0,
            "qty_price": 15000.0,
            "mth": 6.0,
            "wd": 2.0,
        },
    )
    assert abs(p - direct) < 1e-9
