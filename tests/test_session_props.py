"""Sessionization, fuzzed against a pure-python reference.

The gaps-and-islands SQL form (stream_sessionization) is subtle enough
to deserve more than one fixed dataset: hypothesis generates arbitrary
per-user event-time multisets (including duplicates and exact 30-min
boundary gaps) and the Spark result must equal an independent
sequential implementation on every draw.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

GAP_US = 30 * 60 * 1_000_000
BASE = dt.datetime(2024, 1, 1)


def python_sessions(user_ts: dict[int, list[int]]):
    """Sequential reference: sort, split on gap > 30min, summarize."""
    out = set()
    for uid, tss in user_ts.items():
        tss = sorted(tss)
        sid, start, prev, n = 1, tss[0], tss[0], 1
        for t in tss[1:]:
            if t - prev > GAP_US:
                out.add((uid, sid, start, prev, n))
                sid, start, n = sid + 1, t, 0
            n += 1
            prev = t
        out.add((uid, sid, start, prev, n))
    return out


def spark_sessions(spark, user_ts):
    rows = [
        (uid, BASE + dt.timedelta(microseconds=t))
        for uid, tss in user_ts.items()
        for t in tss
    ]
    ev = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    new_session = (
        prev.isNull() | (F.unix_micros("ts") - F.unix_micros(prev) > GAP_US)
    ).cast("int")
    sess = ev.withColumn(
        "sid",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    agg = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e"), F.count(F.lit(1)).alias("n")
    )
    epoch = lambda t: (t - BASE) // dt.timedelta(microseconds=1)
    return {
        (r["user_id"], r["sid"], epoch(r["s"]), epoch(r["e"]), r["n"])
        for r in agg.collect()
    }


# timestamps as microsecond offsets; includes exact-boundary gaps
# (delta == GAP_US must NOT split; GAP_US + 1 must)
ts_strategy = st.lists(
    st.integers(min_value=0, max_value=6 * 60 * 60 * 1_000_000),
    min_size=1,
    max_size=25,
)


@settings(max_examples=25, deadline=None)
@given(
    data=st.dictionaries(
        st.integers(min_value=1, max_value=5), ts_strategy, min_size=1, max_size=4
    )
)
def test_sessionization_matches_python(spark, data):
    assert spark_sessions(spark, data) == python_sessions(data)


def test_exact_boundary_is_same_session(spark):
    # a gap of exactly 30 min stays in-session (strict > splits)
    data = {1: [0, GAP_US, 2 * GAP_US, 3 * GAP_US + 1]}
    got = spark_sessions(spark, data)
    assert got == {
        (1, 1, 0, 2 * GAP_US, 3),
        (1, 2, 3 * GAP_US + 1, 3 * GAP_US + 1, 1),
    }
