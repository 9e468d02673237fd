"""Measured scaling evidence: headline queries at two scale factors.

SCALE.md argues per-family that every catalog plan survives a 100×
scale-up; this tool MEASURES the first decade of that claim. Each
headline query runs at two SFs (default 0.01 → 0.1, a 10× row-count
step on every fact table) and the sweep reports, per query:

  wall ratio   = median wall(sf_hi) / median wall(sf_lo)
  bytes ratio  = shuffle-write bytes(sf_hi) / bytes(sf_lo)

against the 10× data ratio. Reading the ratios:
  - wall/bytes ratio <= data ratio: at-most-linear — the plan's work is
    proportional to input (or better: constant-bounded aggregates,
    broadcast dims, fixed top-k). Survives scale-up.
  - ratio >> data ratio: super-linear — the red flag this tool exists
    to catch (quadratic candidate generation, shrinking window frames,
    re-inlined CTE scans). join_asof_nearest's O(n²) frame (66 s at
    sf0.1, fixed round 6) would have shown wall ratio ≈ 400 here.

Caveats printed with the table:
  - At these SFs per-query wall has a fixed scheduling/codegen floor of
    ~0.1-0.3 s, so CHEAP queries read sublinear (ratio << 10) — that is
    overhead amortizing, not magic. The signal is the flag column.
  - Shuffle bytes of 0 at both SFs means the plan moves no data
    (map-only or broadcast-only); the ratio is reported as "-".

Usage:
  python tools/scaling_sweep.py [--lo /root/testdata/sf0.01]
      [--hi /root/testdata/sf0.1] [--reps 3] [--only a,b,c]
      [--threshold 1.5]

Super-linear flag: wall ratio > data_ratio * threshold AND the high-SF
wall is above 1.0 s (so a 0.1 s → 0.4 s floor wobble can't flag).
Exit status 1 if any query flags, else 0 — suitable as a round ritual
next to tools/verify_rotation.py.

Output: a markdown table (stdout) and one final JSON line; merge the
table into SCALE.md's "Measured scaling" section when re-recording.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: HEADLINE + _exec_totals)
from nyc_traffic_insight_spark.queries import load_all  # noqa: E402
from nyc_traffic_insight_spark.session import get_spark  # noqa: E402


def _sf_of(path: str) -> float:
    return float(os.path.basename(os.path.normpath(path)).replace("sf", ""))


def _measure(spark, specs, names, sf_dir, reps, ui_url):
    """Median wall + per-run shuffle-write bytes for each query at one SF."""
    out = {}
    for name in names:
        walls = []
        before = bench._settled_totals(spark, ui_url)
        for _ in range(reps):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            bench.consume(specs[name].builder(spark, sf_dir))
            walls.append(time.perf_counter() - t0)
        after = bench._settled_totals(spark, ui_url)
        out[name] = {
            "wall": sorted(walls)[len(walls) // 2],
            "bytes": max(
                0, after["shuffle_write_bytes"] - before["shuffle_write_bytes"]
            ) // reps,
        }
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--lo", default="/root/testdata/sf0.01")
    ap.add_argument("--hi", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--only", type=lambda s: s.split(","), default=None, metavar="a,b,c"
    )
    ap.add_argument(
        "--threshold", type=float, default=1.5,
        help="flag when wall ratio exceeds data_ratio * threshold",
    )
    args = ap.parse_args()
    data_ratio = _sf_of(args.hi) / _sf_of(args.lo)

    spark = get_spark(
        app_name="ntis-scaling-sweep",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui_url = spark.sparkContext.uiWebUrl
    specs = load_all()
    names = args.only or list(bench.HEADLINE)

    # Warmup: codegen + JIT at the smallest SF, exactly like bench.py.
    warm = "/root/testdata/sf0.001"
    if not os.path.isdir(warm):
        warm = args.lo
    for name in names:
        bench.consume(specs[name].builder(spark, warm))

    lo = _measure(spark, specs, names, args.lo, args.reps, ui_url)
    hi = _measure(spark, specs, names, args.hi, args.reps, ui_url)

    flagged = []
    rows = []
    for name in names:
        wall_ratio = hi[name]["wall"] / max(lo[name]["wall"], 1e-9)
        if lo[name]["bytes"] > 0:
            bytes_ratio = f"{hi[name]['bytes'] / lo[name]['bytes']:.1f}x"
        elif hi[name]["bytes"] > 0:
            bytes_ratio = "new"  # shuffle appeared only at the high SF
        else:
            bytes_ratio = "-"
        flag = (
            wall_ratio > data_ratio * args.threshold
            and hi[name]["wall"] > 1.0
        )
        if flag:
            flagged.append(name)
        rows.append(
            f"| {name} | {lo[name]['wall']:.3f} | {hi[name]['wall']:.3f} "
            f"| {wall_ratio:.1f}x | {lo[name]['bytes']:,} "
            f"| {hi[name]['bytes']:,} | {bytes_ratio} "
            f"| {'SUPER-LINEAR' if flag else 'ok'} |"
        )

    from nyc_traffic_insight_spark.queries.textops import clear_caches

    clear_caches(spark)

    print(
        f"\nData ratio {data_ratio:.0f}x ({args.lo} -> {args.hi}); "
        f"flag = wall ratio > {data_ratio * args.threshold:.0f}x "
        f"and hi wall > 1 s. Sub-{data_ratio:.0f}x wall ratios on cheap "
        f"queries are the fixed per-query floor amortizing, not sub-linear "
        f"compute."
    )
    print(
        "\n| query | wall lo (s) | wall hi (s) | wall ratio "
        "| bytes lo | bytes hi | bytes ratio | verdict |"
    )
    print("|---|---:|---:|---:|---:|---:|---:|---|")
    for r in rows:
        print(r)
    print()
    print(
        json.dumps(
            {
                "metric": "scaling_sweep",
                "data_ratio": data_ratio,
                "flagged": flagged,
                "queries": {
                    n: {
                        "wall_lo": round(lo[n]["wall"], 3),
                        "wall_hi": round(hi[n]["wall"], 3),
                        "bytes_lo": lo[n]["bytes"],
                        "bytes_hi": hi[n]["bytes"],
                    }
                    for n in names
                },
            }
        )
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
