"""Full-registry physical-plan audit (run per round; see NOTES.md).

Builds every cataloged query at the smallest SF and scans the executed
plan for the patterns that kill a 100 TB run. The fast headline subset
runs in CI as tests/test_plan_audit.py; this tool covers the WHOLE
registry, including builders that execute jobs at build time (ML fits,
the streaming ingest), which is why it is a tool and not a test.

Usage: python tools/plan_audit.py [sf_dir]
Prints one line per flagged query and exits 0 (informational).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_traffic_insight_spark.queries import load_all  # noqa: E402
from nyc_traffic_insight_spark.session import get_spark  # noqa: E402


def flags_of(plan: str) -> list[str]:
    out = []
    if "CartesianProduct" in plan:
        out.append("CartesianProduct")
    if "BatchEvalPython" in plan:
        out.append("row-at-a-time PythonUDF")
    n = plan.count("Exchange SinglePartition")
    if n:
        out.append(f"SinglePartitionExchange x{n}")
    if "BroadcastNestedLoopJoin" in plan:
        out.append("BNLJ")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    flagged = 0
    for name, spec in specs.items():
        try:
            plan = (
                spec.builder(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 - report, keep auditing
            print(f"{name:38s} BUILD_ERROR: {str(ex)[:100]}")
            flagged += 1
            continue
        f = flags_of(plan)
        if f:
            print(f"{name:38s} {', '.join(f)}")
            flagged += 1
    print(f"-- {flagged} flagged of {len(specs)}")
    spark.stop()


if __name__ == "__main__":
    main()
