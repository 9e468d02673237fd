"""Cross-engine-stable decimal rounding.

Spark's ``round()`` converts the double to its shortest decimal string
and applies HALF_UP (java.math.BigDecimal); DuckDB rounds the binary
double as ``sign(x) · floor(|x·10ⁿ| + 0.5) / 10ⁿ`` (std::round —
half away from zero). The two disagree whenever the shortest repr ends
in a literal 5 at the target scale (e.g. 38.37875 → Spark 38.3788,
DuckDB 38.3787), which the oracle hash-compare then flags.

``r(col, n)`` reproduces DuckDB's arithmetic exactly — including the
sign handling: a plain ``floor(x·10ⁿ + 0.5)`` matches only for x ≥ 0
and silently rounds negative half-cases the other way (-7.45 @ 1dp:
DuckDB -7.5, naive floor-form -7.4). Every catalog query that rounds
floats for hash stability uses this instead of F.round;
tests/test_rounding_props.py fuzzes the equivalence.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r(col: Column | str, scale: int) -> Column:
    m = F.lit(float(10**scale))
    c = F.col(col) if isinstance(col, str) else col
    mag = F.floor(F.abs(c) * m + F.lit(0.5)) / m
    return F.when(c < 0, -mag).otherwise(mag)
