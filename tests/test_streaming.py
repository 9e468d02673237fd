"""streaming/events: the REAL Structured Streaming execution path.

The batch forms of these transformations are oracle-checked in
test_queries_oracle.py (stream_* queries); here the same code runs as
an actual readStream → watermark → windowed agg → checkpointed
writeStream job (availableNow trigger), proving the unified-model claim
rather than assuming it.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from nyc_traffic_insight_spark.sources import load_table
from nyc_traffic_insight_spark.streaming.events import (
    dedup_events,
    run_tumbling_stream,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def source_dir(spark, tmp_path):
    """Events parquet re-written through load_table so the stream reads
    proper TIMESTAMP (the raw testdata file is TIMESTAMP(NANOS))."""
    src = str(tmp_path / "src")
    load_table(spark, SF_SMOKE, "events").write.parquet(src)
    yield src
    shutil.rmtree(src, ignore_errors=True)


def test_streaming_matches_batch(spark, tmp_path, source_dir):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_tumbling_stream(spark, source_dir, ckpt, out)

    got = spark.read.parquet(out)
    batch = tumbling_counts(load_table(spark, SF_SMOKE, "events"))

    # Append mode emits only windows the 2h watermark has closed; the
    # final (still-open) windows stay in state. Everything emitted must
    # match the batch result exactly, and nearly all windows close.
    emitted = {tuple(r) for r in got.collect()}
    full = {tuple(r) for r in batch.collect()}
    assert emitted <= full
    assert len(emitted) >= len(full) - 10
    assert len(emitted) > 0


def test_streaming_is_incremental_and_resumes(spark, tmp_path, source_dir):
    # Same job, run twice against the same checkpoint: the second run
    # sees no new files and must emit nothing new (exactly-once sink).
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    run_tumbling_stream(spark, source_dir, ckpt, out)
    n1 = spark.read.parquet(out).count()
    run_tumbling_stream(spark, source_dir, ckpt, out)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0


def test_streaming_dedup(spark, tmp_path, source_dir):
    # duplicate every source file by copying it alongside itself
    dup = str(tmp_path / "dup")
    ev = spark.read.parquet(source_dir)
    ev.unionAll(ev).write.parquet(dup)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 4).parquet(dup)
    )
    out = str(tmp_path / "ddout")
    (
        dedup_events(stream, watermark="1 hour")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ddckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out)
    n_src = ev.select("event_id").distinct().count()
    assert got.count() == got.select("event_id").distinct().count()
    # at-most-one per id, and the overwhelming majority survive the
    # watermark (late duplicates beyond 1h may be dropped entirely)
    assert got.count() >= int(n_src * 0.9)


def test_stateful_sessionization_matches_batch(spark, tmp_path, source_dir):
    # applyInPandasWithState sessionizer vs the oracle-checked batch
    # gaps-and-islands form: every CLOSED session emitted by the stream
    # must appear identically (same start, end=max ts, count) in batch.
    from nyc_traffic_insight_spark.queries import load_all
    from nyc_traffic_insight_spark.streaming.events import sessionize_stateful

    ev = spark.read.parquet(source_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(source_dir)
    )
    out = str(tmp_path / "sess_out")
    (
        sessionize_stateful(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out)
    emitted = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got.collect()
    }

    batch = load_all()["stream_sessionization"].builder(spark, SF_SMOKE)
    full = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    assert emitted, "stream emitted no closed sessions"
    assert emitted <= full
    # only the trailing open session per user stays in state
    n_users = spark.read.parquet(source_dir).select("user_id").distinct().count()
    assert len(emitted) >= len(full) - n_users


def test_session_window_declarative(spark, tmp_path, source_dir):
    # built-in session_window streaming run; session end is
    # last_event + gap by definition, so compare starts and counts.
    from nyc_traffic_insight_spark.queries import load_all
    from nyc_traffic_insight_spark.streaming.events import session_windows

    ev = spark.read.parquet(source_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    out = str(tmp_path / "sw_out")
    (
        session_windows(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sw_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out)
    emitted = {
        (r["user_id"], r["session_start"], r["n_events"]) for r in got.collect()
    }
    batch = load_all()["stream_sessionization"].builder(spark, SF_SMOKE)
    full = {
        (r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect()
    }
    assert emitted and emitted <= full


def test_foreachbatch_upsert_is_idempotent(spark, tmp_path, source_dir):
    # the upsert sink overwrites touched hour-partitions per batch:
    # final table equals the batch aggregate for every emitted window,
    # with no duplicate (window, type) rows even across restarts.
    from nyc_traffic_insight_spark.streaming.events import (
        run_upsert_stream,
        tumbling_counts,
    )

    out = str(tmp_path / "upsert_out")
    ckpt = str(tmp_path / "upsert_ckpt")
    run_upsert_stream(spark, source_dir, ckpt, out)
    got = spark.read.parquet(out).drop("hour_part")
    keys = got.groupBy("window_start", "event_type").count()
    assert keys.filter(F.col("count") > 1).count() == 0

    batch = tumbling_counts(load_table(spark, SF_SMOKE, "events"))
    full = {tuple(r) for r in batch.collect()}
    emitted = {tuple(r) for r in got.collect()}
    assert emitted and emitted <= full

    # replay with the same checkpoint: nothing changes (idempotent)
    n1 = spark.read.parquet(out).count()
    run_upsert_stream(spark, source_dir, ckpt, out)
    assert spark.read.parquet(out).count() == n1


def _run_stream_to_parquet(df, tmp_path, tag):
    out = str(tmp_path / f"{tag}_out")
    (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"{tag}_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return out


def test_stream_static_enrich(spark, tmp_path, source_dir):
    from nyc_traffic_insight_spark.streaming.events import enrich_with_static

    ev = spark.read.parquet(source_dir)
    dim = ev.select("event_type").distinct().withColumn(
        "type_id", F.crc32("event_type")
    )
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 4).parquet(source_dir)
    )
    out = _run_stream_to_parquet(enrich_with_static(stream, dim), tmp_path, "enrich")
    got = spark.read.parquet(out)
    assert got.count() == ev.count()  # left join: every event enriched
    assert got.filter(F.col("type_id").isNull()).count() == 0

    want = ev.join(dim, "event_type", "left")
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_stream_stream_join_matches_batch(spark, tmp_path, source_dir):
    from nyc_traffic_insight_spark.streaming.events import correlate_streams

    ev = spark.read.parquet(source_dir)
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    t_click, t_buy = sorted(types)[0], sorted(types)[-1]

    def side(t):
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(source_dir)
            .filter(F.col("event_type") == t)
        )

    out = _run_stream_to_parquet(
        correlate_streams(side(t_click), side(t_buy)), tmp_path, "ss"
    )
    got = {tuple(r) for r in spark.read.parquet(out).collect()}

    c = ev.filter(F.col("event_type") == t_click).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == t_buy).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    want = {
        tuple(r)
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select("c_user", "click_id", "click_ts", "purchase_id", "purchase_ts", "amount")
        .collect()
    }
    # append-mode emits pairs the watermark has finalized; all emitted
    # pairs must be real, and the vast majority of pairs are emitted
    assert got <= want
    assert len(got) >= max(1, int(len(want) * 0.8))


def test_transform_with_state_sessionizer(spark, tmp_path, source_dir):
    # the v2 arbitrary-state API must produce the same closed sessions
    # as the applyInPandasWithState form and the batch gold standard.
    # Its Python worker needs grpcio (not in this container) — skip
    # rather than xfail so the suite stays green either way.
    pytest.importorskip("grpc", reason="transformWithState worker needs grpcio")
    from nyc_traffic_insight_spark.queries import load_all
    from nyc_traffic_insight_spark.streaming.events import sessionize_tws

    ev = spark.read.parquet(source_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(source_dir)
    )
    out = _run_stream_to_parquet(sessionize_tws(stream), tmp_path, "tws")
    got = spark.read.parquet(out)
    emitted = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got.collect()
    }
    batch = load_all()["stream_sessionization"].builder(spark, SF_SMOKE)
    full = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    assert emitted, "no sessions emitted"
    assert emitted <= full
    n_users = ev.select("user_id").distinct().count()
    assert len(emitted) >= len(full) - n_users


def test_throttled_ingest_resumes_from_checkpoint(spark, tmp_path):
    """S12: maxFilesPerTrigger=1 ingest with checkpoint/resume.

    Phase 1 stages 3 source files and drains them one per micro-batch;
    phase 2 adds 2 more files and restarts against the SAME checkpoint —
    only the new files may be ingested (offsets resume), and nothing is
    double-counted (exactly-once sink commit log)."""
    from nyc_traffic_insight_spark.streaming.events import run_throttled_ingest

    ev = load_table(spark, SF_SMOKE, "events")
    total = ev.count()
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")

    first = ev.filter(F.col("event_id") % 5 < 3)
    second = ev.filter(F.col("event_id") % 5 >= 3)
    first.repartition(3).write.mode("append").parquet(src)

    run_throttled_ingest(spark, src, chk, out, files_per_trigger=1)
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()

    second.repartition(2).write.mode("append").parquet(src)
    run_throttled_ingest(spark, src, chk, out, files_per_trigger=1)

    got = spark.read.parquet(out)
    assert got.count() == total  # nothing lost...
    assert got.select("event_id").distinct().count() == total  # ...or duplicated

    # re-run with NO new files: offsets say everything is committed
    run_throttled_ingest(spark, src, chk, out, files_per_trigger=1)
    assert spark.read.parquet(out).count() == total


def test_disorder_audit_on_shuffled_stream(spark):
    """disorder_audit must quantify real out-of-orderness: feed a
    stream whose arrival order (event_id) deliberately disagrees with
    event time and check the lateness stats against a NumPy golden."""
    import numpy as np
    import pandas as pd

    from nyc_traffic_insight_spark.queries.streamingq import disorder_audit

    rng = np.random.default_rng(7)
    n = 500
    base = pd.Timestamp("2024-01-01")
    # event time ordered; arrival order = event time + bounded jitter
    ts = base + pd.to_timedelta(np.arange(n) * 60, unit="s")
    arrival_rank = np.argsort(np.arange(n) + rng.integers(0, 10, n))
    pdf = pd.DataFrame(
        {
            "event_type": ["a"] * n,
            "event_id": np.empty(n, dtype=np.int64),
            "ts": ts,
        }
    )
    pdf.loc[arrival_rank, "event_id"] = np.arange(n, dtype=np.int64)

    # numpy golden: running max over arrival order
    order = pdf.sort_values("event_id")
    run_max = order["ts"].cummax()
    late = (run_max - order["ts"]).dt.total_seconds().astype(int)
    golden_n_late = int((late > 0).sum())
    golden_max = int(late.max())

    got = disorder_audit(spark.createDataFrame(pdf)).collect()[0]
    assert got["n"] == n
    assert got["n_late"] == golden_n_late > 0
    assert got["max_late_s"] == golden_max > 0
