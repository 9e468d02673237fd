"""Cross-engine-stable decimal rounding.

Spark's ``round()`` converts the double to its shortest decimal string
and applies HALF_UP (java.math.BigDecimal); DuckDB rounds in binary as
``floor(x·10ⁿ + 0.5)/10ⁿ``. The two disagree whenever the shortest repr
ends in a literal 5 at the target scale (e.g. 38.37875 → Spark 38.3788,
DuckDB 38.3787), which the oracle hash-compare then flags.

``r(col, n)`` is the floor-form, bit-identical to DuckDB's round for
doubles — every catalog query that rounds floats for hash stability
uses it instead of F.round.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r(col: Column | str, scale: int) -> Column:
    m = F.lit(float(10**scale))
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * m + F.lit(0.5)) / m
