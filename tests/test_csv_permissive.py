"""Malformed-input handling (F7): the engine's PERMISSIVE-mode contract.

The reference skips malformed rows with per-row try/except
(main.py:186-191; convert_traffic_csv_to_geojson_point.py:26-49) and
null-coerces bad numerics (P5). Spark's declarative equivalents:
PERMISSIVE parse with a corrupt-record column, DROPMALFORMED, and
try_cast — pinned here on a deliberately dirty CSV.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DIRTY = """id,vol,boro
1,12.5,Queens
2,not_a_number,Bronx
garbage line without commas
4,7.25,Brooklyn
5,,Manhattan
"""

SCHEMA = "id INT, vol DOUBLE, boro STRING, _corrupt STRING"


def _write(tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(DIRTY)
    return str(p)


def test_permissive_captures_corrupt_rows(spark, tmp_path):
    df = spark.read.csv(
        _write(tmp_path),
        header=True,
        schema=SCHEMA,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt",
    ).cache()
    df.count()  # materialize before splitting on _corrupt
    good = df.filter(F.col("_corrupt").isNull())
    bad = df.filter(F.col("_corrupt").isNotNull())
    # rows 1, 4, 5 parse fully; row 2 (bad numeric) and the garbage
    # line are captured, not dropped, with the raw text preserved
    assert good.count() == 3
    assert bad.count() == 2
    raws = [r["_corrupt"] for r in bad.collect()]
    assert any("not_a_number" in r for r in raws)
    assert any("garbage" in r for r in raws)
    # the malformed-numeric row still surfaces its parseable columns
    row2 = df.filter(F.col("id") == 2).first()
    assert row2["vol"] is None and row2["boro"] == "Bronx"
    # empty string → null double without corrupting the row (P5 shape)
    row5 = good.filter(F.col("id") == 5).first()
    assert row5["vol"] is None


def test_dropmalformed_keeps_only_clean_rows(spark, tmp_path):
    df = spark.read.csv(
        _write(tmp_path),
        header=True,
        schema="id INT, vol DOUBLE, boro STRING",
        mode="DROPMALFORMED",
    )
    ids = sorted(r["id"] for r in df.collect())
    assert ids == [1, 4, 5]  # the try/except-skip semantic, declaratively


def test_try_cast_null_coercion(spark):
    # P5: to_numeric(errors='coerce') ≡ try_cast — invalid → null, no job
    # failure, valid rows untouched
    df = spark.createDataFrame(
        [("12.5",), ("oops",), (None,)], "raw STRING"
    ).select(F.col("raw").try_cast("double").alias("v"))
    assert [r["v"] for r in df.collect()] == [12.5, None, None]
