"""r16 third-level assignment probe (VERDICT r15 #9 evidence).

Replicates the sf0.1 embeddings 100x (jitter variant, deterministic —
tools/docs_decade_probe.build_emb_corpus) to 200k vectors, where the
scale-k index reaches m = 100 and the r16 third assignment level
engages. Measures dedup_semantic median-of-3 noop-sink wall with

- L3 (current code: nearest label -> nearest mid-rep -> nearest
  sub-cell, 10 + 2*ceil(sqrt(m)) scored centroids per vector), and
- L2 (the r15 two-level shape, forced by raising the gate in-process:
  10 + m scored centroids per vector),

plus the 20k corpus (m = 10, gate dormant -> L2 == L3 by construction)
as the flat-decade reference. Optionally (--oracle) runs the DuckDB
three-level oracle chain on the 200k corpus and sorted-compares it to
the Spark output — the cross-engine check at the scale the driver's
gate can never reach.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_traffic_insight_spark.session import get_spark  # noqa: E402


def median3(fn) -> float:
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        reps.append(time.perf_counter() - t0)
    return statistics.median(reps)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--skip-20k", action="store_true")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]")
    from tools.docs_decade_probe import build_emb_corpus

    import nyc_traffic_insight_spark.queries.embcurate as ec

    def consume(df):
        df.write.format("noop").mode("overwrite").save()

    def run(sf_dir):
        consume(
            ec.semdedup_frame(
                ec._embs(spark, sf_dir),
                ec._semdedup_index(spark, sf_dir),
                ec._SEMDEDUP_THRESH,
            )
        )

    results = {}
    if not args.skip_20k:
        d20 = build_emb_corpus(spark, "jitter", 10)
        spark.sparkContext.setJobDescription("l3probe: 20k (m=10, L2==L3)")
        run(d20)  # warm the index artifact outside the timed reps
        results["20k_m10"] = round(median3(lambda: run(d20)), 2)
        print("20k (m=10):", results["20k_m10"], "s", flush=True)

    d200 = build_emb_corpus(spark, "jitter", 100)
    spark.sparkContext.setJobDescription("l3probe: 200k L3")
    run(d200)  # warm artifact
    results["200k_L3"] = round(median3(lambda: run(d200)), 2)
    print("200k L3:", results["200k_L3"], "s", flush=True)

    gate = ec._SEMDEDUP_L3_MIN_M
    ec._SEMDEDUP_L3_MIN_M = 10**9  # force the r15 two-level shape
    try:
        spark.sparkContext.setJobDescription("l3probe: 200k L2 (r15 shape)")
        results["200k_L2"] = round(median3(lambda: run(d200)), 2)
        print("200k L2:", results["200k_L2"], "s", flush=True)
    finally:
        ec._SEMDEDUP_L3_MIN_M = gate

    if args.oracle:
        from tests.oracle_utils import compare, duck_connect

        got = ec.semdedup_frame(
            ec._embs(spark, d200),
            ec._semdedup_index(spark, d200),
            ec._SEMDEDUP_THRESH,
        ).toPandas()
        con = duck_connect(d200)
        try:
            t0 = time.perf_counter()
            want = con.sql(ec.dedup_semantic_oracle_sql()).df()
            print(f"duckdb oracle: {time.perf_counter() - t0:.1f} s", flush=True)
        finally:
            con.close()
        compare(got, want, "dedup_semantic[200k,L3]")
        print("200k cross-engine: MATCH", flush=True)

    print(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
