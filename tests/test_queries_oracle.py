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
    from tests.oracle_utils import canon_driver_style

    spec = SPECS[name]
    df = spec.builder(spark, SF_ORACLE)
    assert len(df.columns) > 0
    pdf = df.toPandas()
    assert len(pdf) >= 0
    # the driver's rows-only check sorts the frame by EVERY column;
    # an unhashable cell type (array/struct output column) crashes it
    # (CORRECTNESS_r06 ml_propensity_model) — fail here first
    canon_driver_style(pdf)
