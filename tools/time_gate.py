"""Time the driver-style correctness gate over the full catalog.

Mirrors what the driver does per query at sf=0.01: build the Spark
DataFrame and collect it, run the DuckDB oracle on the same parquet
tables, and (here) just record wall time per side. Output: one JSON
line per query to stdout, slowest-first summary at the end.

Usage:  python tools/time_gate.py [sf_dir] [--limit N] [--only a,b,c]

This is a dev tool for budgeting the driver's 50-query-ish gate window
(VERDICT r1 "Next round" #1): queries near the front of registration
order must be cheap enough that the gate reaches the back. The
spark_s/oracle_s split is also the triage step before chasing any
slow-looking sweep wall — only spark_s is engine time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from nyc_traffic_insight_spark.queries import load_all  # noqa: E402
from nyc_traffic_insight_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import duck_connect  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Time the driver-style correctness gate per query "
        "(Spark and DuckDB sides separately)."
    )
    ap.add_argument(
        "sf_dir", nargs="?", default="/root/testdata/sf0.01",
        help="parquet table directory (default sf0.01)",
    )
    ap.add_argument(
        "--limit", type=int, default=None,
        help="time only the first N registry entries",
    )
    ap.add_argument(
        "--only", type=lambda s: s.split(","), default=None,
        metavar="a,b,c", help="time only the named queries",
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir

    spark = get_spark(app_name="ntis-time-gate")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)

    specs = load_all()
    rows = []
    if args.only:
        names = args.only
    else:
        names = list(specs)[: args.limit] if args.limit else list(specs)
    for name in names:
        spec = specs[name]
        t0 = time.perf_counter()
        err = None
        n = None
        try:
            n = len(spec.builder(spark, sf_dir).collect())
        except Exception as exc:  # noqa: BLE001
            err = f"{type(exc).__name__}: {exc}"[:200]
        t_spark = time.perf_counter() - t0
        t1 = time.perf_counter()
        if spec.oracle is not None and err is None:
            try:
                con.execute(spec.oracle).fetchall()
            except Exception as exc:  # noqa: BLE001
                err = f"oracle {type(exc).__name__}: {exc}"[:200]
        t_oracle = time.perf_counter() - t1
        rec = {
            "q": name,
            "spark_s": round(t_spark, 3),
            "oracle_s": round(t_oracle, 3),
            "rows": n,
            "err": err,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    total = sum(r["spark_s"] + r["oracle_s"] for r in rows)
    print(f"\nTOTAL {total:.1f}s over {len(rows)} queries", file=sys.stderr)
    for r in sorted(rows, key=lambda r: -(r["spark_s"] + r["oracle_s"]))[:20]:
        print(
            f"  {r['q']:38s} spark={r['spark_s']:7.2f} "
            f"oracle={r['oracle_s']:7.2f}{'  ERR ' + r['err'] if r['err'] else ''}",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
