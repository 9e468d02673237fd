"""Command-line front door: run any cataloged query from a shell.

The reference's users invoke scripts (``python main.py``,
``python RandomForest.py``); the equivalent surface here is one entry
point over the whole catalog:

    python -m nyc_traffic_insight_spark list [substring]
    python -m nyc_traffic_insight_spark run <query> [--sf-dir DIR]
        [--limit N] [--explain] [--out PATH]
    python -m nyc_traffic_insight_spark oracle <query>
    python -m nyc_traffic_insight_spark contract [--sf-dir DIR]

``run`` prints the first rows (default 20) as Spark's show() table, or
writes the full result as parquet when ``--out`` is given — results
belong in tables, not driver stdout, so --out is the pipeline path and
show() is the inspection path. ``--explain`` prints the formatted
physical plan instead of executing (the plan-shape inspection loop).
``oracle`` prints the registered DuckDB SQL so any engine speaking
ANSI SQL can cross-check a result. ``contract`` runs the standing
events data contract (operators/expectations.py) and exits nonzero on
any violation — the shape a CI data gate wants.
"""

from __future__ import annotations

import argparse
import sys

from nyc_traffic_insight_spark.queries import load_all
from nyc_traffic_insight_spark.session import DEFAULT_SF_DIR, get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="nyc_traffic_insight_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list cataloged queries")
    p_list.add_argument("substring", nargs="?", default="")

    p_run = sub.add_parser("run", help="run one query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument(
        "--explain", action="store_true", help="print the plan, don't execute"
    )
    p_run.add_argument(
        "--out", default=None, help="write full result as parquet here"
    )

    p_or = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    p_or.add_argument("query")

    p_ct = sub.add_parser(
        "contract", help="run the standing events data contract"
    )
    p_ct.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    a = p.parse_args(argv)
    specs = load_all()

    if a.cmd == "list":
        hits = [n for n in sorted(specs) if a.substring in n]
        for n in hits:
            mark = "sql-oracle" if specs[n].oracle else "rows-only"
            print(f"{n:40s} [{mark}] {specs[n].survey.splitlines()[0][:70]}")
        print(f"-- {len(hits)} of {len(specs)} queries", file=sys.stderr)
        return 0

    if a.cmd == "contract":
        spark = get_spark(app_name="ntis-cli-contract")
        spark.sparkContext.setLogLevel("ERROR")
        report = specs["qa_expectations_report"].builder(spark, a.sf_dir)
        rows = report.collect()
        for r_ in rows:
            mark = "PASS" if r_["passed"] else "FAIL"
            print(f"{mark}  {r_['expectation']:60s} violations={r_['violations']}")
        n_fail = sum(1 for r_ in rows if not r_["passed"])
        print(f"-- {len(rows) - n_fail}/{len(rows)} expectations passed",
              file=sys.stderr)
        return 0 if n_fail == 0 else 1

    if a.query not in specs:
        near = [n for n in sorted(specs) if a.query in n]
        print(
            f"unknown query {a.query!r}"
            + (f"; did you mean: {', '.join(near[:5])}" if near else ""),
            file=sys.stderr,
        )
        return 2

    if a.cmd == "oracle":
        sql = specs[a.query].oracle
        if sql is None:
            print(
                f"{a.query} is rows-only (no SQL-expressible oracle); see "
                "its docstring for the invariant tests that pin it",
                file=sys.stderr,
            )
            return 1
        print(sql)
        return 0

    spark = get_spark(app_name=f"ntis-cli-{a.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = specs[a.query].builder(spark, a.sf_dir)
    if a.explain:
        df.explain("formatted")
    elif a.out:
        df.write.mode("overwrite").parquet(a.out)
        print(f"wrote {a.out}", file=sys.stderr)
    else:
        df.show(a.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
