"""Accumulation-order fuzz: every float-emitting oracled query, run
under two adversarial partitioning configs, must be bit-identical.

The r6 driver found two hash mismatches (win_seasonal_decompose,
report_cohort_ltv) that the local 1e-9-tolerant harness could not see:
a double sum accumulated in engine/partition-dependent order landed a
half-ulp away and flipped a 4dp rounding boundary. Order sensitivity
is a function of PARTITIONING, so it is fuzzable locally: run the same
query with (a) one shuffle partition / default input splits and
(b) seven shuffle partitions / tiny forced input splits, and require
the results to be EXACTLY equal. Any query whose floats depend on
accumulation order flips somewhere in the catalog-wide sweep.

Only queries whose output schema contains float/double (incl. inside
arrays) are swept — integer/string/date outputs cannot flap.
"""

from __future__ import annotations

import pytest

from nyc_traffic_insight_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare

SPECS = load_all()
ORACLED = [n for n, s in SPECS.items() if s.oracle is not None]

# (conf key, config-A value, config-B value); B forces many tiny input
# splits so scan-side partial aggregation runs in a different order.
_FUZZ_CONFS = [
    ("spark.sql.shuffle.partitions", "1", "7"),
    ("spark.sql.files.maxPartitionBytes", "134217728", "65536"),
    ("spark.sql.files.openCostInBytes", "4194304", "0"),
]


def _floaty(df) -> bool:
    s = df.schema.simpleString()
    return "double" in s or "float" in s


def _run_with(spark, spec, values):
    saved = {}
    for (key, _a, _b), v in zip(_FUZZ_CONFS, values):
        saved[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        spark.catalog.clearCache()
        return spec.builder(spark, SF_ORACLE).toPandas()
    finally:
        for key, old in saved.items():
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
        spark.catalog.clearCache()


@pytest.mark.parametrize("name", ORACLED)
def test_result_is_partitioning_invariant(spark, name):
    spec = SPECS[name]
    if not _floaty(spec.builder(spark, SF_ORACLE)):
        pytest.skip("no float output — cannot flap")
    a = _run_with(spark, spec, [v for _, v, _ in _FUZZ_CONFS])
    b = _run_with(spark, spec, [v for _, _, v in _FUZZ_CONFS])
    compare(a, b, f"{name}[partitions 1 vs 7]", exact=True)
