"""Flagship scan-parallelism probe (VERDICT r15 #10 evidence).

The sf0.1 lineitem/orders fixtures are ONE parquet row group each, so
flagship_volume_features' scan+join+partial-aggregate stage runs in
one task locally no matter the core count — the r15 widening A/B was
NEUTRAL-to-worse because a forced exchange costs more than the 600k-row
serial scan it parallelizes. This probe writes a CLUSTER-SHAPED copy
of the same rows (32 files => 32 row groups, the layout any real table
has at scale) and re-times the UNCHANGED query on it, at 32 and 8
cores, so the scale-regime story in SCALE.md carries measured numbers:
row-group sizing upstream, not a repartition-after-scan in the query,
is the 100 TB lever.

Usage: python tools/flagship_rg_probe.py [--cores N] [--variant rg32|single]
Prints one line: {"variant", "cores", "median_s", "reps"}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_BASE = "/root/testdata/sf0.1"
SCRATCH = f"/tmp/ntis_rg_probe_{os.getuid()}"


def build_rg32(spark) -> str:
    out = os.path.join(SCRATCH, "rg32")
    marker = os.path.join(out, "_done")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    from nyc_traffic_insight_spark.sources import load_table

    for name in ("lineitem", "orders"):
        (
            load_table(spark, SF_BASE, name)
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{name}.parquet"))
        )
    open(marker, "w").close()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--variant", choices=["rg32", "single"], default="rg32")
    args = ap.parse_args()

    from nyc_traffic_insight_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cores}]")
    from nyc_traffic_insight_spark.plans.flagship import flagship_volume_features

    sf_dir = build_rg32(spark) if args.variant == "rg32" else SF_BASE

    def run():
        flagship_volume_features(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    spark.sparkContext.setJobDescription(
        f"flagship rg probe {args.variant} c{args.cores}"
    )
    for _ in range(4):  # cold-session JIT dominates the first runs
        run()
    reps = []
    for _ in range(5):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        run()
        reps.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "variant": args.variant,
                "cores": args.cores,
                "median_s": statistics.median(reps),
                "reps": reps,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
