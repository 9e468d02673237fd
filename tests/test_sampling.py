"""Sampling + HLL/Bloom sketch semantics, pinned.

The query RESULTS are oracle-checked (md5 determinism -> full value-hash
match in test_queries_oracle.py); these tests pin the guarantees the
hash comparison can't express: HLL estimation error, Bloom's
no-false-negative contract, sample rate/size/determinism properties,
and register mergeability across shards.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_traffic_insight_spark.queries import load_all
from nyc_traffic_insight_spark.sources import load_table
from tests.conftest import SF_SMOKE

SF_MID = "/root/testdata/sf0.01"


def test_stratified_sample_rates(spark):
    specs = load_all()
    docs = load_table(spark, SF_MID, "documents")
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sampled = (
        specs["sample_stratified"].builder(spark, SF_MID)
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    rates = {"en": 0.25, "zh": 0.60, "de": 0.60, "es": 0.90, "fr": 0.90}
    for row in sampled:
        lang, got = row["lang"], row["n"]
        want = rates[lang] * totals[lang]
        # binomial 4-sigma tolerance around the target rate
        sigma = (totals[lang] * rates[lang] * (1 - rates[lang])) ** 0.5
        assert abs(got - want) <= 4 * sigma + 1, (
            f"{lang}: sampled {got} vs expected {want:.0f}±{4*sigma:.0f}"
        )


def test_stratified_sample_is_deterministic_subset(spark):
    specs = load_all()
    a = {r["doc_id"] for r in
         specs["sample_stratified"].builder(spark, SF_MID).collect()}
    b = {r["doc_id"] for r in
         specs["sample_stratified"].builder(spark, SF_MID).collect()}
    assert a == b  # content-addressed draw -> identical across runs
    all_ids = {r["doc_id"] for r in
               load_table(spark, SF_MID, "documents").select("doc_id").collect()}
    assert a <= all_ids and 0 < len(a) < len(all_ids)


def test_reservoir_topk_exact_k_per_stratum(spark):
    specs = load_all()
    rows = specs["sample_reservoir_topk"].builder(spark, SF_MID).collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], set()).add(r["doc_id"])
    n_sources = load_table(spark, SF_MID, "documents").select("source").distinct().count()
    assert len(per) == n_sources
    for src, ids in per.items():
        assert len(ids) == 5, f"{src}: {len(ids)} != k=5"


def test_hll_estimate_within_error_bound(spark):
    specs = load_all()
    for sf_dir in (SF_SMOKE, SF_MID):
        row = specs["sketch_hll"].builder(spark, sf_dir).collect()[0]
        truth = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey").distinct().count()
        )
        est = row["hll_estimate"]
        # raw HLL (no bias correction): generous 3 * 1.04/sqrt(64) bound
        rel = abs(est - truth) / truth
        assert rel < 3 * 1.04 / 8, f"{sf_dir}: est {est:.0f} vs {truth} ({rel:.1%})"
        assert row["m"] == 64 and 0 < row["buckets_used"] <= 64


def test_hll_registers_merge_across_shards(spark):
    # max-merge of per-shard registers == whole-corpus registers: split
    # lineitem by parity of l_linenumber, build registers per half via
    # the same md5 pipeline, take cellwise max, compare to full build.
    from nyc_traffic_insight_spark.queries.samplingq import _HLL_M

    li = load_table(spark, SF_SMOKE, "lineitem")
    hx = F.md5(F.col("l_orderkey").cast("string"))
    stripped = F.regexp_replace(F.substring(hx, 3, 13), "^0+", "")
    first = F.substring(stripped, 1, 1)
    lz = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    base = li.select(
        (F.conv(F.substring(hx, 1, 2), 16, 10).cast("bigint") % _HLL_M)
        .alias("bucket"),
        (4 * (13 - F.length(stripped)) + lz + 1).alias("rho"),
        (F.col("l_linenumber") % 2).alias("shard"),
    )

    def regs(df):
        return {
            r["bucket"]: r["mr"]
            for r in df.groupBy("bucket").agg(F.max("rho").alias("mr")).collect()
        }

    full = regs(base)
    s0 = regs(base.filter(F.col("shard") == 0))
    s1 = regs(base.filter(F.col("shard") == 1))
    merged = {
        b: max(s0.get(b, 0), s1.get(b, 0)) for b in set(s0) | set(s1)
    }
    assert merged == full


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    specs = load_all()
    got = {
        r["probe_id"]: r["maybe_present"]
        for r in specs["sketch_bloom_filter"].builder(spark, SF_MID).collect()
    }
    cust = {
        r["c_custkey"]
        for r in load_table(spark, SF_MID, "customer")
        .select("c_custkey").collect()
    }
    fp = 0
    negatives = 0
    for pid, present in got.items():
        if pid in cust:
            assert present, f"false negative for member key {pid}"
        else:
            negatives += 1
            fp += int(present)
    assert negatives > 0, "probe set never left the member range"
    # expected fp rate (1-e^{-kn/m})^k ~ 1.4% for n=1500, m=16384, k=3;
    # allow generous headroom for md5-position clustering
    assert fp / negatives < 0.05, f"fp rate {fp / negatives:.1%}"


def test_percentile_exact_monotone_and_in_range(spark):
    specs = load_all()
    rows = specs["agg_percentile_exact"].builder(spark, SF_MID).collect()
    li = load_table(spark, SF_MID, "lineitem")
    bounds = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in li.groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("lo"), F.max("l_quantity").alias("hi"))
        .collect()
    }
    assert len(rows) == 3
    for r in rows:
        lo, hi = bounds[r["l_returnflag"]]
        assert lo <= r["p50"] <= r["p90"] <= r["p99"] <= hi
