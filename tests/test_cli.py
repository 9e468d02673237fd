"""The CLI front door (python -m nyc_traffic_insight_spark)."""

from __future__ import annotations

import contextlib
import io

from nyc_traffic_insight_spark.__main__ import main
from tests.conftest import SF_SMOKE


def _capture(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(argv)
    return rc, out.getvalue()


def test_list_filters_and_marks_oracles():
    rc, out = _capture(["list", "sessionize"])
    assert rc == 0
    assert "win_sessionize_batch" in out
    assert "[sql-oracle]" in out


def test_oracle_prints_sql():
    rc, out = _capture(["oracle", "agg_count"])
    assert rc == 0
    assert "SELECT" in out.upper()


def test_oracle_rows_only_is_an_error():
    # every cataloged query carries an oracle since r7 (emb_pca_project
    # was the last rows-only entry); keep the CLI's rows-only branch
    # pinned with a transient spec
    from nyc_traffic_insight_spark.queries import REGISTRY, QuerySpec

    REGISTRY["_test_rows_only"] = QuerySpec(
        name="_test_rows_only",
        builder=lambda spark, sf_dir: None,
        oracle=None,
        survey="test fixture",
    )
    try:
        rc, _ = _capture(["oracle", "_test_rows_only"])
    finally:
        del REGISTRY["_test_rows_only"]
    assert rc == 1


def test_catalog_fully_oracled():
    """r7 closing state: zero rows-only entries remain (the driver's
    weaker rows-only check is never the best available evidence)."""
    from nyc_traffic_insight_spark.queries import load_all

    assert all(s.oracle is not None for s in load_all().values())


def test_unknown_query_suggests():
    rc, _ = _capture(["run", "agg_coun"])
    assert rc == 2


def test_run_show_and_explain(spark):
    # `spark` fixture keeps the session alive; get_spark() inside main
    # reuses it, so the CLI rides the test session
    rc, out = _capture(["run", "agg_count", "--sf-dir", SF_SMOKE, "--limit", "3"])
    assert rc == 0
    assert "event_type" in out
    rc, out = _capture(["run", "agg_count", "--sf-dir", SF_SMOKE, "--explain"])
    assert rc == 0
    assert "Physical Plan" in out


def test_contract_subcommand_passes_clean_fixture(spark):
    rc, out = _capture(["contract", "--sf-dir", SF_SMOKE])
    assert rc == 0
    assert "PASS" in out and "FAIL" not in out
