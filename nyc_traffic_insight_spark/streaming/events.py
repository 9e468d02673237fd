"""Structured Streaming slice over the events table.

The reference has no streaming surface (SURVEY.md §2.12); its closest
analogs are the checkpointed, rate-limited ingest poller
(``scripts/enrich_weather.py:69-121,172-178`` — at-least-once with
resume) and the lazily refreshed model cache. This module is the
idiomatic Spark re-expression: file-source readStream → event-time
windowed aggregation with a watermark for late data → checkpointed
writeStream.

The transformation functions below take a plain DataFrame and work
identically in batch and streaming mode — that is the point of
Structured Streaming's unified model, and it lets the DuckDB oracle
check the batch form of the exact code the stream runs
(queries/streamingq.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_traffic_insight_spark.schemas import EVENTS
from nyc_traffic_insight_spark.functions.rounding import exact_sum, r as _r


def tumbling_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """1-hour tumbling windows per event_type: count + value sum.

    With ``watermark`` set (streaming mode), state for windows older
    than max(event time) - watermark is evicted — bounded memory at any
    throughput; late rows within the watermark still update their
    window (the reference's partial-checkpoint resume gives only
    at-least-once appends, no late-data correction).
    """
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r(exact_sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event in 2 windows)."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dropDuplicates on event_id with watermark-bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def read_event_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream: new parquet files under source_dir become
    micro-batches (maxFilesPerTrigger caps per-batch work — the
    streaming analog of the reference's request rate limiter)."""
    return (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )


def run_tumbling_stream(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    """End-to-end streaming job, availableNow trigger (process whatever
    is there, then stop — deterministic for tests; swap for continuous
    triggers in production)."""
    stream = read_event_stream(spark, source_dir)
    agg = tumbling_counts(stream, watermark="2 hours")
    (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_throttled_ingest(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    files_per_trigger: int = 1,
) -> None:
    """S12 closure: the reference's rate-limited, checkpointed ingest
    poller (``scripts/enrich_weather.py:69-121,172-178`` — 0.8 s
    inter-request sleep, retry/backoff, partial-checkpoint resume)
    re-expressed as a throttled file-source stream.

    ``maxFilesPerTrigger=1`` caps per-micro-batch work — the streaming
    analog of the request rate limit; the checkpoint dir records source
    offsets — the resume state (a restarted run continues from the last
    committed file, never re-ingesting); and the parquet sink's commit
    log upgrades the reference's at-least-once appends to exactly-once
    (a replayed batch is recognized and skipped). availableNow drains
    whatever is present then stops — deterministic for tests; a
    processingTime trigger gives the continuous poller."""
    stream = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
    )
    (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ------------------------------------------------ custom stateful operator

SESSION_GAP_MIN = 30

SESSION_SCHEMA = (
    "user_id LONG, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events LONG"
)
_STATE_SCHEMA = "start LONG, last LONG, n LONG"  # open session, micros


def session_windows(events: DataFrame) -> DataFrame:
    """Declarative streaming sessionization: the built-in
    session_window gap-merges per user. session end here is
    last_event + gap (Spark's session_window semantics), vs max(ts) in
    the batch gaps-and-islands form (queries/streamingq.py)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def sessionize_stateful(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState — the
    escape hatch for operators session_window can't express (here:
    emitting max(ts) as the session end, matching the reference-shaped
    batch form, plus arbitrary per-session logic).

    Per user_id the state holds the open session (start, last, count)
    as an Arrow-typed tuple; each micro-batch folds its rows in
    event-time order, emits every session closed by a > gap jump, and
    leaves the trailing open session in state (bounded: one tuple per
    active user). Works identically under availableNow (tests) and
    continuous triggers.
    """
    import pandas as pd  # executor-side import

    gap_us = gap_min * 60 * 1_000_000

    def fn(key, pdfs, state):
        (user_id,) = key
        open_sess = state.get if state.exists else None
        ts_all = []
        for pdf in pdfs:
            ts_all.append(pd.to_datetime(pdf["ts"]).astype("int64") // 1000)
        ts = pd.concat(ts_all).sort_values() if ts_all else pd.Series([], dtype="int64")

        closed = []
        start = last = n = None
        if open_sess is not None:
            start, last, n = open_sess
        for t in ts:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            state.update((start, last, n))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(l, unit="us") for _, l, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_upsert_stream(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    """foreachBatch upsert sink: each micro-batch OVERWRITES exactly the
    hour-partitions it touches (dynamic partition overwrite), so window
    results are revised in place as late rows arrive instead of
    appended as duplicates — the production pattern for materializing a
    streaming aggregate exactly-once into a table.

    Idempotent by construction: replaying a batch rewrites the same
    partitions to the same content, so checkpoint replay after a crash
    cannot double-count.
    """
    stream = read_event_stream(spark, source_dir)
    # complete-mode agg state in the engine; per-batch diff lands below
    agg = tumbling_counts(stream, watermark="2 hours")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        (
            batch_df.withColumn("hour_part", F.date_format("window_start", "yyyyMMddHH"))
            .write.mode("overwrite")
            .partitionBy("hour_part")
            .parquet(out_dir)
        )

    (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def enrich_with_static(stream: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch joins the (broadcastable)
    dimension as of that batch — the standard enrich pattern (the
    engine's holiday/coordinate dims would join a live event stream
    exactly like this). No watermark needed: the static side is not
    stateful."""
    return stream.join(F.broadcast(dim), "event_type", "left")


def correlate_streams(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream inner join: purchases within 30 minutes AFTER a
    click by the same user. Both sides carry watermarks so the join
    state for expired time ranges is evicted — without them the state
    grows forever; with them Spark knows a click older than the
    watermark can never match a future purchase."""
    c = clicks.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    ).select("c_user", "click_id", "click_ts", "purchase_id", "purchase_ts", "amount")


def sessionize_tws(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """The same sessionizer on the transformWithStateInPandas API
    (Spark 4 arbitrary-state v2): a StatefulProcessor holding the open
    session in a ValueState. Functionally identical to
    sessionize_stateful; exists because the v2 API adds state TTL,
    timers and multiple typed state variables — the direction custom
    stateful operators are headed.

    Runtime requirement: the v2 Python worker speaks gRPC to the state
    server, so ``grpcio``/``protobuf`` must be installed (they are NOT
    in this container — tests skip; on a cluster with the standard
    PySpark connect/streaming extras this runs as-is). Without them the
    TWS driver worker exits at startup ("driver worker crashed")."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_min * 60 * 1_000_000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._open = handle.getValueState("open", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            ts_all = []
            for pdf in rows:
                ts_all.append(pd.to_datetime(pdf["ts"]).astype("int64") // 1000)
            ts = (
                pd.concat(ts_all).sort_values()
                if ts_all
                else pd.Series([], dtype="int64")
            )
            start = last = n = None
            if self._open.exists():
                start, last, n = self._open.get()
            closed = []
            for t in ts:
                t = int(t)
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            if start is not None:
                self._open.update((start, last, n))
            if closed:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id] * len(closed),
                        "session_start": [
                            pd.Timestamp(s, unit="us") for s, _, _ in closed
                        ],
                        "session_end": [
                            pd.Timestamp(l, unit="us") for _, l, _ in closed
                        ],
                        "n_events": [c for _, _, c in closed],
                    }
                )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=SESSION_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
