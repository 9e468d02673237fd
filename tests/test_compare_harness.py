"""Meta-test: the differential comparator must actually catch defects.

If compare() silently normalized away real differences, every green
oracle row would be meaningless — so corrupt each aspect it claims to
check and assert it raises."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle_utils import compare

BASE = pd.DataFrame(
    {"k": [1, 2, 3], "v": [1.5, 2.5, 3.5], "s": ["a", "b", "c"]}
)


def test_passes_on_identical_and_reordered():
    compare(BASE, BASE.copy(), "id")
    compare(BASE.iloc[[2, 0, 1]].reset_index(drop=True), BASE, "reorder")


def test_catches_value_corruption():
    bad = BASE.copy()
    bad.loc[1, "v"] = 2.5000001
    with pytest.raises(AssertionError):
        compare(bad, BASE, "float_drift")
    bad2 = BASE.copy()
    bad2.loc[0, "s"] = "z"
    with pytest.raises(AssertionError):
        compare(bad2, BASE, "string_swap")


def test_catches_row_count_and_schema_drift():
    with pytest.raises(AssertionError):
        compare(BASE.iloc[:2], BASE, "missing_row")
    with pytest.raises(AssertionError):
        compare(BASE.rename(columns={"v": "value"}), BASE, "renamed_col")


def test_catches_null_flip():
    bad = BASE.copy()
    bad.loc[2, "v"] = None
    with pytest.raises(AssertionError):
        compare(bad, BASE, "null_flip")


def test_rotation_front_names_all_exist():
    """load_all() silently skips _CHECK_FIRST names missing from the
    registry (`if n in REGISTRY`), so a typo would quietly drop a query
    from the driver's check rotation — the exact evidence-debt failure
    mode VERDICT r5 #1 was about. Pin every name and no duplicates."""
    from nyc_traffic_insight_spark.queries import _CHECK_FIRST, load_all

    reg = load_all()
    missing = [n for n in _CHECK_FIRST if n not in reg]
    assert not missing, f"_CHECK_FIRST names not in registry: {missing}"
    assert len(set(_CHECK_FIRST)) == len(_CHECK_FIRST), "duplicate rotation names"
