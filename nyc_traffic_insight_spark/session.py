"""SparkSession builder tuned for the engine.

Local testing runs on ``local[N]`` but every setting here is chosen to be
the right default on a large cluster too:

- AQE on (runtime re-plan: broadcast promotion, skew-join splitting,
  partition coalescing) — replaces every hand-tuned knob the reference
  uses (chunk sizes, usecols; SURVEY.md §4).
- shuffle partitions sized for the test scale; AQE coalesces down so a
  too-high number is cheap, and on a real cluster this would be
  ~2–3× total cores.
- Arrow enabled so the few Pandas-UDF paths (CRS reprojection,
  multimodal decode) batch-transfer instead of pickling rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "nyc-traffic-insight-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``extra_conf`` overrides (applied last) let callers flip
    session-construction-time settings — bench.py turns the UI back on
    to read executor metrics from the status REST API.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{DEFAULT_CPUS}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode = one JVM doing all 32 threads' executor work; 8g
        # (the r1 default) left >100 GiB of the box idle and produced
        # GC storms late in long sessions — object-heavy aggregates
        # (collect_set baskets) ran 5-8x slower after ~28 cached-cache
        # queries than in a fresh session with identical plans and
        # shuffle bytes (round-6 bench forensics). 24g matches what a
        # per-executor heap would be on a real cluster node.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the driver's testdata stores events.ts as TIMESTAMP(NANOS)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
