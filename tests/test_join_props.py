"""As-of and binned range joins, fuzzed against python references.

Both operators have oracle checks on the real tables; these hypothesis
tests attack the edge geometry specifically: equal timestamps (as-of
tie must match the snapshot AT the event time), events before any
snapshot (inner-asof drops them), interval ends (exclusive), and
intervals/points landing exactly on bin boundaries.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)


def _ts(minutes: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minutes)


# ----------------------------------------------------------------- as-of

def python_asof(events, snaps):
    """events: [(id, key, t)]; snaps: [(key, t, val)] → most recent
    snapshot with s.t <= e.t per key, inner join semantics."""
    out = set()
    for eid, k, t in events:
        cand = [(st_, v) for (sk, st_, v) in snaps if sk == k and st_ <= t]
        if cand:
            st_, v = max(cand, key=lambda c: c[0])
            out.add((eid, k, t, st_, v))
    return out


def spark_asof(spark, events, snaps):
    ev = spark.createDataFrame(
        [(i, k, _ts(t)) for i, k, t in events], "event_id LONG, k STRING, ts TIMESTAMP"
    )
    sn = spark.createDataFrame(
        [(k, _ts(t), float(v)) for k, t, v in snaps],
        "k STRING, snap_ts TIMESTAMP, snap_value DOUBLE",
    )
    left = ev.select(
        "k", F.col("ts").alias("o_ts"), F.lit(0).alias("is_snap"), "event_id",
        F.lit(None).cast("timestamp").alias("snap_ts"),
        F.lit(None).cast("double").alias("snap_value"),
    )
    right = sn.select(
        "k", F.col("snap_ts").alias("o_ts"), F.lit(1).alias("is_snap"),
        F.lit(None).cast("bigint").alias("event_id"), "snap_ts", "snap_value",
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("o_ts"), F.desc("is_snap"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = left.unionByName(right).select(
        "k", "o_ts", "is_snap", "event_id",
        F.last("snap_ts", ignorenulls=True).over(w).alias("snap_ts"),
        F.last("snap_value", ignorenulls=True).over(w).alias("snap_value"),
    )
    rows = (
        merged.filter((F.col("is_snap") == 0) & F.col("snap_ts").isNotNull())
        .collect()
    )
    back = lambda t: int((t - BASE) // dt.timedelta(minutes=1))
    return {
        (r["event_id"], r["k"], back(r["o_ts"]), back(r["snap_ts"]), r["snap_value"])
        for r in rows
    }


@settings(max_examples=20, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 50), st.sampled_from(["a", "b"]),
                  st.integers(0, 120)),
        min_size=1, max_size=15, unique_by=lambda e: e[0],
    ),
    snaps=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 120),
                  st.integers(0, 99)),
        min_size=0, max_size=10,
        unique_by=lambda s: (s[0], s[1]),  # one snapshot per (key, t)
    ),
)
def test_asof_matches_python(spark, events, snaps):
    got = spark_asof(spark, events, snaps)
    want = {
        (eid, k, t, st_, float(v))
        for (eid, k, t, st_, v) in python_asof(events, snaps)
    }
    assert got == want


# ---------------------------------------------------------- binned range

def python_range(points, intervals):
    return {
        (pid, iid)
        for pid, pt in points
        for iid, lo, hi in intervals
        if lo <= pt < hi
    }


@settings(max_examples=20, deadline=None)
@given(
    points=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 400)),
        min_size=1, max_size=15, unique_by=lambda p: p[0],
    ),
    intervals=st.lists(
        st.tuples(st.integers(100, 150), st.integers(0, 400), st.integers(0, 61)),
        min_size=1, max_size=10, unique_by=lambda i: i[0],
    ).map(lambda ivs: [(i, lo, lo + ln) for i, lo, ln in ivs]),
)
def test_binned_range_join_matches_python(spark, points, intervals):
    # the operator's contract: bin width ≥ max interval length — clamp
    # generated intervals to the 60-unit bin so ≤2 candidate bins hold
    intervals = [(i, lo, min(hi, lo + 60)) for i, lo, hi in intervals]
    BIN = 60
    p = spark.createDataFrame(points, "pid LONG, pt LONG")
    iv = spark.createDataFrame(intervals, "iid LONG, lo LONG, hi LONG").filter(
        F.col("hi") > F.col("lo")
    )
    ivb = iv.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / BIN), F.floor((F.col("hi") - 1) / BIN)
            )
        ),
    )
    pb = p.withColumn("bin", F.floor(F.col("pt") / BIN))
    got = {
        (r["pid"], r["iid"])
        for r in pb.join(ivb, "bin")
        .filter((F.col("pt") >= F.col("lo")) & (F.col("pt") < F.col("hi")))
        .select("pid", "iid")
        .collect()
    }
    want = python_range(points, [(i, lo, hi) for i, lo, hi in intervals if hi > lo])
    assert got == want


def _ed_le_1(a: str, b: str) -> bool:
    """Exact edit-distance-<=1 check (substitution/insert/delete)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b = b, a
        lb = la
    return any(b[:i] + b[i + 1:] == a for i in range(lb))


def test_fuzzy_pairs_ed1_matches_bruteforce_on_adversarial_strings(spark):
    """FastSS completeness on inputs the oracle never exercises: random
    short strings over a 2-letter alphabet (dense ed<=1 neighborhoods,
    heavy variant collisions), runs of repeated characters (the in-row
    array_distinct path), the empty string, and single characters. The
    distributed pair set must equal the O(n^2) Python brute force
    EXACTLY — completeness means no missing pair, verification means
    no extra pair."""
    import random

    from nyc_traffic_insight_spark.queries.joins import fuzzy_pairs_ed1

    rng = random.Random(1729)
    names = ["", "a", "b", "aa", "ab", "aaaa", "aaab", "abab"]
    names += [
        "".join(rng.choice("ab") for _ in range(rng.randint(0, 6)))
        for _ in range(60)
    ]
    rows = [(i, s) for i, s in enumerate(names)]
    df = spark.createDataFrame(rows, "k INT, s STRING")

    got = {
        (r["custkey_a"], r["custkey_b"], r["dist"])
        for r in fuzzy_pairs_ed1(df, "k", "s").collect()
    }
    want = {
        (ka, kb, 0 if na == nb else 1)
        for ka, na in rows
        for kb, nb in rows
        if ka < kb and _ed_le_1(na, nb)
    }
    assert got == want
