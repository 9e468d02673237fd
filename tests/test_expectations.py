"""The expectations DSL must COUNT violations correctly, not just pass
clean data: both compilers (Spark Column and ANSI SQL) are run over a
deliberately dirty frame and must agree with hand-counted truth."""

from __future__ import annotations

import duckdb
import pandas as pd

from nyc_traffic_insight_spark.operators.expectations import (
    Expectation,
    compile_spark,
    compile_sql,
)

DIRTY = pd.DataFrame(
    {
        "event_id": [1, 2, 2, None, 5, 6],
        "user_id": [10, None, 12, 13, None, 15],
        "event_type": ["view", "click", "hack", "view", "view", "purchase"],
        "value": [5.0, -1.0, 50.0, 2000.0, None, 7.5],
    }
)

CONTRACT = [
    Expectation("event_id", "not_null"),
    Expectation("event_id", "unique"),
    Expectation("user_id", "not_null"),
    Expectation("value", "in_range", (0.0, 1000.0)),
    Expectation(
        "event_type", "accepted_values", ("view", "click", "purchase")
    ),
    Expectation("", "min_rows", (10,)),
]

# hand-counted truth on DIRTY (6 rows):
#   event_id nulls: 1; dup event_ids: count(5)-distinct(4)=1;
#   user_id nulls: 2; value out of [0,1000] (incl. NULL): 3 (-1, 2000, NULL);
#   event_type not accepted: 1 ('hack'); min_rows 10: short by 4
TRUTH = {
    "event_id__not_null": 1,
    "event_id__unique": 1,
    "user_id__not_null": 2,
    "value__in_range__0_0_1000_0": 3,
    "event_type__accepted_values__view_click_purchase": 1,
    "table__min_rows__10": 4,
}


def test_spark_compiler_counts_violations(spark):
    got = {
        r["expectation"]: r["violations"]
        for r in compile_spark(spark.createDataFrame(DIRTY), CONTRACT).collect()
    }
    assert got == TRUTH
    flags = {
        r["expectation"]: r["passed"]
        for r in compile_spark(spark.createDataFrame(DIRTY), CONTRACT).collect()
    }
    assert not any(flags.values())


def test_sql_compiler_matches_spark_compiler():
    con = duckdb.connect()
    con.register("dirty", DIRTY)
    rows = con.sql(compile_sql("dirty", CONTRACT)).fetchall()
    got = {name: viol for name, viol, _ in rows}
    assert got == TRUTH
