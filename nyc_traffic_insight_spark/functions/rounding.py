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


def exact_sum(col: Column | str, dp: int = 2) -> Column:
    """Accumulation-ORDER-FREE sum of a dp-exact decimal column.

    ``sum(double)`` accumulates in partition-dependent order, and a
    half-ulp difference can flip the output's rounding boundary
    against the DuckDB oracle (r6: win_seasonal_decompose /
    report_cohort_ltv at sf0.01; r7 sweep: join_scd2_pointintime /
    layout_bucketed_join at sf0.1). For inputs that are exact at dp
    decimals (the fixture's money/value columns are 2dp-exact;
    price×(1−discount) is 4dp-exact), scaling to integers and summing
    BIGINT is commutative-exact; the single divide back is one
    deterministic IEEE op. Oracle-side spelling:
    ``CAST(sum(CAST(round(x * 10^dp) AS BIGINT)) AS DOUBLE) / 10^dp``.

    int64 headroom: |col| ≤ 10⁶ at dp=4 gives 10¹⁰/row — ~10⁸ rows per
    group before overflow; beyond that (true 100 TB single-group sums)
    use DECIMAL(38, dp), same order-free property.
    """
    m = 10**dp
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * m).cast("long")).cast("double") / m


def scaled_long(col: Column | str, dp: int = 2) -> Column:
    """dp-exact decimal → BIGINT ticks (``round(x·10^dp)``), the input
    form every order-free integer aggregate here builds on. Use it
    directly when the ticks should STAY integer (cumulative cents,
    scaled moments) so the one spelling that must match the oracle's
    ``CAST(round(x * 10^dp) AS BIGINT)`` lives in one place."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**dp)).cast("long")


def exact_wsum(col: Column | str, dp: int, window) -> Column:
    """Order-free WINDOWED sum of a dp-exact decimal column — the
    window-frame sibling of exact_sum (sum BIGINT ticks over the frame,
    divide back once). Frames with a unique total order are already
    bit-deterministic (both engines scan the sorted frame), but the
    integer form also survives ties and partition-layout changes.
    Oracle spelling:
    ``CAST(sum(CAST(round(x*10^dp) AS BIGINT)) OVER w AS DOUBLE)
      / 10^dp``."""
    m = 10**dp
    return F.sum(scaled_long(col, dp)).over(window).cast("double") / m


def exact_avg(col: Column | str, dp: int = 2) -> Column:
    """Order-free mean of a dp-exact decimal column (null-skipping,
    like ``avg``). Oracle spelling:
    ``CAST(sum(CAST(round(x*10^dp) AS BIGINT)) AS DOUBLE)
      / (count(x) * 10^dp)``."""
    m = 10**dp
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(F.round(c * m).cast("long")).cast("double")
        / (F.count(c) * m).cast("double")
    )


def rn_sql(expr: str, dp: int) -> str:
    """``r`` at scale dp as SQL TEXT for NON-NEGATIVE expressions —
    the one engine-portable spelling, shared by every generated
    oracle that rounds a strictly non-negative double (LM neg
    log-probs and perplexities, UniMax allocations, audit ratios).
    The unsigned floor form is exact only for x ≥ 0 (see the module
    docstring for the signed case — use ``r`` / a CASE on sign
    there). The ``CAST AS DOUBLE`` is load-bearing on the Spark side:
    Spark's floor() returns BIGINT and parses the scale literal as
    DECIMAL, so the uncast quotient comes back
    Decimal('0.6931000') and hash-mismatches DuckDB's double."""
    m = f"{10 ** dp}.0"
    return f"CAST(floor(({expr}) * {m} + 0.5) AS DOUBLE) / {m}"


def r4_sql(expr: str) -> str:
    """``rn_sql`` at the catalog's standard 4dp scale. Kept as a named
    function (not a partial) because dozens of oracle texts import it
    by name; the emitted text is byte-identical to the pre-r13
    hand-spelled form (pinned by tests/test_rounding_props.py)."""
    return rn_sql(expr, 4)


def r6_sql(expr: str) -> str:
    """``rn_sql`` at the 6dp scale the ratio-emitting text operators
    round with (their Spark side uses ``_r(x, 6)``)."""
    return rn_sql(expr, 6)
