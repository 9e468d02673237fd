"""Declarative data expectations compiled to ONE aggregate pass.

A contract is a list of ``Expectation`` rows (column, kind, params);
``compile_spark`` turns the whole list into a single ``agg()`` over the
table — one scan, map-side partials, a one-row result widened back to
one row per expectation. ``compile_sql`` emits the equivalent ANSI SQL
(UNION ALL of the same aggregate expressions) so any engine can
cross-check the report; the catalog entry ``qa_expectations_report``
runs both sides through the driver's value-hash gate.

Supported kinds (the core of what Great Expectations-style suites use
in practice):

- ``not_null``            — count of NULLs must be 0
- ``unique``              — count(*) − count(DISTINCT col) must be 0
- ``in_range(lo, hi)``    — count outside [lo, hi] must be 0
- ``accepted_values(vs)`` — count outside the value list must be 0
- ``min_rows(n)``         — table must have ≥ n rows

Each expectation reports its violation COUNT (an exact integer — never
a float rate, so pass/fail can't flip cross-engine) and a passed flag.

Scale: one shuffle-free aggregate pass regardless of how many
expectations the contract carries — adding a check costs one more
partial aggregate, not one more scan. This is the shape a 100 TB
nightly contract run must have; per-check table scans are the
anti-pattern this module exists to prevent.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    column: str  # "" for table-level expectations (min_rows)
    kind: str
    params: tuple = field(default_factory=tuple)

    @property
    def name(self) -> str:
        import re

        p = "_".join(str(x) for x in self.params)
        p = re.sub(r"[^A-Za-z0-9_]", "_", p)  # dots break column refs
        col = self.column or "table"
        return f"{col}__{self.kind}" + (f"__{p}" if p else "")


def _violation_col(e: Expectation, total: Column) -> Column:
    c = F.col(e.column) if e.column else None
    if e.kind == "not_null":
        return F.sum(F.when(c.isNull(), 1).otherwise(0))
    if e.kind == "unique":
        return F.count(c) - F.countDistinct(c)
    if e.kind == "in_range":
        lo, hi = e.params
        return F.sum(
            F.when(c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi)), 1).otherwise(0)
        )
    if e.kind == "accepted_values":
        return F.sum(F.when(~c.isin(*e.params), 1).otherwise(0))
    if e.kind == "min_rows":
        (n,) = e.params
        return F.when(total >= F.lit(n), F.lit(0)).otherwise(F.lit(n) - total)
    raise ValueError(f"unknown expectation kind {e.kind!r}")


def _violation_sql(e: Expectation) -> str:
    c = e.column
    if e.kind == "not_null":
        return f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)"
    if e.kind == "unique":
        return f"count({c}) - count(DISTINCT {c})"
    if e.kind == "in_range":
        lo, hi = e.params
        return (
            f"sum(CASE WHEN {c} IS NULL OR {c} < {lo!r} OR {c} > {hi!r} "
            f"THEN 1 ELSE 0 END)"
        )
    if e.kind == "accepted_values":
        vals = ", ".join(f"'{v}'" for v in e.params)
        return f"sum(CASE WHEN {c} NOT IN ({vals}) THEN 1 ELSE 0 END)"
    if e.kind == "min_rows":
        (n,) = e.params
        return f"CASE WHEN count(*) >= {n} THEN 0 ELSE {n} - count(*) END"
    raise ValueError(f"unknown expectation kind {e.kind!r}")


def compile_spark(df: DataFrame, contract: list[Expectation]) -> DataFrame:
    """One aggregate pass → (expectation, violations BIGINT, passed)."""
    total = F.count(F.lit(1))
    aggs = [
        _violation_col(e, total).cast("bigint").alias(e.name)
        for e in contract
    ]
    row = df.agg(*aggs)
    stacked = row.unpivot([], list(row.columns), "expectation", "violations")
    return stacked.select(
        "expectation",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def compile_sql(table: str, contract: list[Expectation]) -> str:
    """The same report as ANSI SQL (one aggregate + UNION ALL widen)."""
    cols = ",\n      ".join(
        f"CAST({_violation_sql(e)} AS BIGINT) AS \"{e.name}\""
        for e in contract
    )
    unions = "\n    UNION ALL ".join(
        f"SELECT '{e.name}' AS expectation, \"{e.name}\" AS violations FROM agg"
        for e in contract
    )
    return f"""
    WITH agg AS (
      SELECT {cols}
      FROM {table}
    )
    SELECT expectation, violations, violations = 0 AS passed
    FROM ({unions})
    """
