"""Differential test: every cataloged query vs its DuckDB oracle.

This is the local replica of the driver's sf=0.01 correctness gate,
run at sf=0.001 for speed (override with NTIS_TEST_SF_DIR).
"""

from __future__ import annotations

import pytest

from nyc_traffic_insight_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare

SPECS = load_all()
ORACLED = [n for n, s in SPECS.items() if s.oracle is not None]
ROWS_ONLY = [n for n, s in SPECS.items() if s.oracle is None]
SLOW = {"ml_linear_regression", "ml_random_forest", "ml_gbt", "ml_segmented_model"}


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    spec = SPECS[name]
    got = spec.builder(spark, SF_ORACLE).toPandas()
    want = duck.sql(spec.oracle).df()
    compare(got, want, name)


@pytest.mark.parametrize("name", [n for n in ROWS_ONLY if n not in SLOW])
def test_rows_only_queries_run(spark, name):
    spec = SPECS[name]
    df = spec.builder(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0
