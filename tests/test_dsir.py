"""DSIR importance-weight preview (round-13 late; r14 promotion).

``text_dsir_weights``: per-train-doc log importance ratio of two
hashed-unigram bag-of-words models (target = the standing eval
slice), the Xie et al. 2023 data-selection score. Pinned here before
the @register lands: driver-style cross-engine equality (the sf0.001
fixture contains two docs whose tick sums land EXACTLY on half-tick
4dp boundaries — docs 70 and 404 — so this compare is also the
regression test for the tick-space readout), a synthetic direction
test (target-word docs outrank off-target docs), the n_tokens
reconciliation, and the pure-integer boundary-rounding rule itself.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect


@pytest.fixture(scope="module")
def duck_smoke():
    con = duck_connect(SF_SMOKE)
    yield con
    con.close()


def test_dsir_matches_oracle(spark, duck_smoke):
    from nyc_traffic_insight_spark.queries.textops import (
        dsir_oracle_sql,
        text_dsir_weights,
    )

    spdf = text_dsir_weights(spark, SF_SMOKE).toPandas()
    odf = duck_smoke.execute(dsir_oracle_sql()).fetchdf()
    compare(spdf, odf, "text_dsir_weights")


def test_dsir_counts_and_spread(spark):
    """Every train doc is scored, token counts reconcile with the
    whitespace tokenizer, and the weights actually discriminate."""
    from nyc_traffic_insight_spark.queries.textops import (
        _DECON_EVAL_MOD,
        _docs,
        text_dsir_weights,
    )
    from pyspark.sql import functions as F

    d = _docs(spark, SF_SMOKE)
    n_train = d.filter(
        F.col("doc_id") % _DECON_EVAL_MOD != 0
    ).count()
    df = text_dsir_weights(spark, SF_SMOKE).toPandas()
    assert len(df) == n_train
    assert df["log_weight"].nunique() > 10, "vacuous constant weights"
    assert (df["n_tokens"] > 0).all()


def test_dsir_direction_on_synthetic_corpus(spark):
    """A train doc made of the target doc's words must outscore a
    train doc made of words the target never uses — the sign of the
    whole operator. doc 0 is the target (0 % 97 == 0); docs 1 and 2
    are train."""
    from nyc_traffic_insight_spark.queries.textops import _dsir_frame

    rows = [
        (0, "aaa bbb aaa bbb aaa bbb"),  # target
        (1, "aaa bbb aaa bbb"),  # train, pure target words
        (2, "zzz yyy zzz yyy"),  # train, never-target words
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        _dsir_frame(d).toPandas().set_index("doc_id")["log_weight"]
    )
    assert set(out.index) == {1, 2}
    assert out.loc[1] > out.loc[2]


def test_dsir_tick_space_rounding_rule():
    """floor((S+50)/100)/1e4 is the half-up 4dp rounding of S·1e-6,
    computed exactly in integers — including the negative half-tick
    boundary that flipped the naive r4(S/1e6) spelling across engines
    (S = -93,773,150 → -93.7731, half-up toward +inf)."""
    cases = [
        (-93773150, -93.7731),
        (-152179250, -152.1792),
        (93773150, 93.7732),
        (100, 0.0001),
        (49, 0.0),
        (-49, 0.0),
        (-50, 0.0),
        (-51, -0.0001),
    ]
    for s, want in cases:
        got = math.floor((s + 50) / 100.0) / 1e4
        assert got == want, (s, got, want)
