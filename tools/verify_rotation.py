"""Driver-style local verification of the correctness-rotation front.

Runs each query at the front of the registry (the ``_CHECK_FIRST``
rotation) the way the driver does at sf=0.01 — build the Spark
DataFrame, run the DuckDB oracle on the same parquet tables, compare
row count + column names + order-insensitive values — and prints one
PASS/FAIL/NO_ORACLE line per query.

Usage:  python tools/verify_rotation.py [sf_dir] [--limit N] [--only a,b,c]

Exit status 1 if any query FAILs (build error or mismatch), else 0.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_traffic_insight_spark.queries import load_all  # noqa: E402
from nyc_traffic_insight_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import compare, duck_connect  # noqa: E402


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="Driver-style local verification of the "
        "correctness-rotation front."
    )
    ap.add_argument(
        "sf_dir", nargs="?", default="/root/testdata/sf0.01",
        help="parquet table directory (default sf0.01)",
    )
    ap.add_argument(
        "--limit", type=int, default=None,
        help="check only the first N registry entries",
    )
    ap.add_argument(
        "--only", type=lambda s: s.split(","), default=None,
        metavar="a,b,c", help="check only the named queries",
    )
    args = ap.parse_args()
    sf_dir, limit, only = args.sf_dir, args.limit, args.only

    spark = get_spark(app_name="ntis-verify-rotation")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)

    specs = load_all()
    names = only if only else (list(specs)[:limit] if limit else list(specs))
    n_fail = 0
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"{name:38s} FAIL unknown query")
            n_fail += 1
            continue
        t0 = time.perf_counter()
        try:
            spdf = spec.builder(spark, sf_dir).toPandas()
        except Exception:
            print(f"{name:38s} FAIL build error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if spec.oracle is None:
            print(
                f"{name:38s} NO_ORACLE rows={len(spdf)} "
                f"({time.perf_counter() - t0:.2f}s)"
            )
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
            compare(spdf, odf, name)
        except AssertionError as ex:
            print(f"{name:38s} FAIL {str(ex)[:160]}")
            n_fail += 1
            continue
        except Exception:
            print(f"{name:38s} FAIL oracle error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        print(
            f"{name:38s} PASS rows={len(spdf)} "
            f"({time.perf_counter() - t0:.2f}s)"
        )
    print(f"-- {n_fail} failed of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
