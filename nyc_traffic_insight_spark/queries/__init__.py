"""Driver-facing query catalog.

Every operator from SURVEY.md §2 (plus the north-star large-scale
training-data operators) is registered here as a ``QuerySpec``:
a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame`` and, when the
semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle SQL run
against the same parquet tables. The driver hash-compares the two at
sf=0.01 — that is the correctness gate, so the two sides of each spec are
kept textually adjacent in the defining module.

Conventions (hash-compare survival rules):
- every computed / aggregate column is aliased to the SAME name on both
  sides;
- every floating-point column whose value depends on accumulation order
  (sums, averages, products of many rows) is ``round(x, 4)``-ed on both
  sides — Spark and DuckDB sum partitions in different orders, and a raw
  double hash would flap;
- integer sums are cast to BIGINT on both sides (DuckDB widens to
  HUGEINT, Spark to BIGINT);
- queries with engine-seeded randomness (randomSplit, rand shuffles) get
  no oracle → driver records the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    survey: str  # SURVEY.md §2 row id(s) this query covers


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, survey: str = ""):
    """Decorator: add a query to the catalog."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, survey=survey)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every catalog module (side effect: fills REGISTRY).

    Import order IS driver-check order (REGISTRY is insertion-ordered and
    the driver's sf0.01 correctness gate walks it front-to-back with a
    budget).  Round 1 the gate stopped at 50 queries having only reached
    aggregates/core/geoq/joins[:2]; modules that have never produced a
    driver-green row therefore register FIRST this round — windows, joins,
    scalars, textops, streaming, multimodal, ml — and the already-green
    aggregates/core register LAST, rotating coverage (VERDICT.md round 1,
    "Next round" #1).
    """
    from nyc_traffic_insight_spark.queries import (  # noqa: F401
        windows,
        joins,
        scalars,
        textops,
        streamingq,
        multimodalq,
        mlq,
        geoq,
        aggregates,
        core,
    )

    return REGISTRY
