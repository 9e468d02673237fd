"""One-off r15 sweep: expensive-expression DUPLICATION in optimized plans.

The chunk_cdc finding (bounds array inlined into every consumer ->
the O(len) md5 cut scan evaluated 9x per row) generalizes: any
withColumn whose expensive array/hash expression is referenced more
than once can be silently duplicated by projection collapse. This
sweep counts marker substrings per optimized plan across the WHOLE
registry and prints the top counts for review.

Usage: python tools/expr_dup_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_traffic_insight_spark.queries import load_all  # noqa: E402
from nyc_traffic_insight_spark.session import get_spark  # noqa: E402

MARKERS = (
    "md5(",
    "sha2(",
    "xxhash64(",
    "zip_with(",
    "aggregate(",
    "transform(",
    "levenshtein(",
    "regexp_extract_all(",
    "sequence(",
    # r16 second pass: the r15 list missed the tokenizer-shaped
    # duplications (split/filter are O(len) per evaluation and HOFs
    # are CodegenFallback, so codegen CSE does not rescue them)
    "split(",
    "regexp_replace(",
    "filter(",
    "array_sort(",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="expr-dup-sweep", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    rows = []
    for name, spec in specs.items():
        try:
            plan = (
                spec.builder(spark, sf_dir)
                ._jdf.queryExecution()
                .optimizedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{name:38s} BUILD_ERROR: {str(ex)[:80]}")
            continue
        counts = {m: plan.count(m) for m in MARKERS}
        total = sum(counts.values())
        if total:
            rows.append((total, name, counts))
    rows.sort(reverse=True)
    for total, name, counts in rows[:40]:
        hits = ", ".join(f"{m.rstrip('(')}x{c}" for m, c in counts.items() if c)
        print(f"{total:4d} {name:38s} {hits}")


if __name__ == "__main__":
    main()
