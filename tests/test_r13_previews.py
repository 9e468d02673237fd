"""Round-13 previews: epoch shuffle, Gopher rules, KN trainer, IVF audit.

Four of the round-13 previews, each pinned here BEFORE its @register
landed (the r12 preview discipline; all four were then registered
later in r13 with the rest of the twelve-preview wave):

- ``sample_epoch_shuffle``: deterministic per-epoch loader order via
  the two-phase hash-rank decomposition. Pinned: the composed rank is
  a PERMUTATION per epoch, equals the oracle's flat row_number
  (driver-style), epochs genuinely reorder, and the plan carries ZERO
  SinglePartition exchanges (the scale claim — the only window
  partitions by (epoch, bucket)).
- ``text_gopher_rules``: the Rae et al. 2021 rule gate. Pinned:
  driver-style cross-engine equality, Python-reference fuzz of the
  oracle on adversarial synthetic docs, and rule-branch liveness on
  the fixture (a gate whose rules never fire is vacuous).
- ``lm_train_kneser_ney``: interpolated KN bigram LM. Pinned:
  driver-style cross-engine equality and the textbook invariant that
  P_kn sums to exactly 1 over the vocabulary per context (discount
  mass == redistributed continuation mass) — checked in DuckDB over
  the full (untruncated) model via the same shared fragments.
- ``qa_ivf_index_audit``: IVF occupancy/quantization audit. Pinned:
  driver-style cross-engine equality and reconciliation against the
  index it audits (occupancies sum to the corpus, shares to ~1,
  min <= mean <= max per cell).
"""

from __future__ import annotations

import math
import random
import re

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect


# ----------------------------------------------------- epoch shuffle


def test_epoch_shuffle_matches_oracle(spark):
    from nyc_traffic_insight_spark.queries.samplingq import (
        epoch_shuffle_oracle_sql,
        sample_epoch_shuffle,
    )

    spdf = sample_epoch_shuffle(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(epoch_shuffle_oracle_sql()).fetchdf()
    compare(spdf, odf, "sample_epoch_shuffle")


def test_epoch_shuffle_is_permutation_and_reorders(spark):
    from nyc_traffic_insight_spark.queries.samplingq import (
        sample_epoch_shuffle,
    )

    pdf = sample_epoch_shuffle(spark, SF_SMOKE).toPandas()
    n = pdf["doc_id"].nunique()
    orders = {}
    for e, grp in pdf.groupby("epoch"):
        assert sorted(grp["pos"]) == list(range(n)), "pos not a permutation"
        orders[e] = list(grp.sort_values("pos")["doc_id"])
    assert len(orders) == 2
    # a shuffle that never reorders is the identity — epochs must differ
    assert orders[0] != orders[1]
    # and neither epoch is doc_id order (rank-of-hash, not identity)
    assert orders[0] != sorted(orders[0])


def test_epoch_shuffle_plan_has_no_global_window(spark):
    """The scale claim: the rank is computed WITHOUT a corpus-sized
    single-partition window — only (epoch, bucket) partitions and the
    per-epoch 256-row bucket prefix. The 2-row epoch-range broadcast
    plans as BNLJ (the accounted tiny-side shape)."""
    from nyc_traffic_insight_spark.queries.samplingq import (
        sample_epoch_shuffle,
    )

    plan = (
        sample_epoch_shuffle(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


# ----------------------------------------------------- Gopher rules


def _gopher_ref(texts):
    """Independent Python reference of the rule gate."""
    from nyc_traffic_insight_spark.queries.textops import (
        _GOPHER_MAX_MEAN_LEN,
        _GOPHER_MAX_WORDS,
        _GOPHER_MIN_ALPHA_RATIO,
        _GOPHER_MIN_MEAN_LEN,
        _GOPHER_MIN_STOPWORDS,
        _GOPHER_MIN_WORDS,
        _STOPWORDS,
    )

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    out = []
    for doc_id, text in enumerate(texts):
        words = re.split(r"\s+", text.strip())
        low = re.split(r"\s+", text.lower())
        n = len(words)
        n_alpha = sum(1 for w in words if re.search("[a-zA-Z]", w))
        n_stop = sum(1 for w in low if w in _STOPWORDS)
        wchars = len(re.sub(r"\s", "", text))
        ml, ar = r6(wchars / n), r6(n_alpha / n)
        ok_wc = _GOPHER_MIN_WORDS <= n <= _GOPHER_MAX_WORDS
        ok_ml = _GOPHER_MIN_MEAN_LEN <= ml <= _GOPHER_MAX_MEAN_LEN
        ok_ar = ar >= _GOPHER_MIN_ALPHA_RATIO
        ok_sw = n_stop >= _GOPHER_MIN_STOPWORDS
        out.append(
            (doc_id, n, ml, ar, n_stop, ok_wc, ok_ml, ok_ar, ok_sw,
             ok_wc and ok_ml and ok_ar and ok_sw)
        )
    return out


def test_gopher_oracle_matches_python_reference_fuzz():
    """Adversarial synthetic docs through the DuckDB oracle vs the
    independent reference: numeric tokens (alpha rule), stopword-free
    docs, boundary word counts, long words (mean-len rule)."""
    import duckdb

    from nyc_traffic_insight_spark.queries.textops import (
        gopher_rules_oracle_sql,
    )

    rng = random.Random(31)
    vocab = ["the", "a", "zz", "97", "wordwordword", "x", "of", "##"]
    texts = []
    for _ in range(60):
        n = rng.choice([1, 5, 19, 20, 21, 79, 80, 81, 99])
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", list(enumerate(texts))
    )
    got = sorted(con.sql(gopher_rules_oracle_sql("docs")).fetchall())
    assert got == _gopher_ref(texts)


def test_gopher_rules_match_oracle_and_rules_are_live(spark):
    from nyc_traffic_insight_spark.queries.textops import (
        gopher_rules_oracle_sql,
        text_gopher_rules,
    )

    spdf = text_gopher_rules(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(gopher_rules_oracle_sql()).fetchdf()
    compare(spdf, odf, "text_gopher_rules")
    # the gate must actually gate on this fixture
    assert set(spdf["keep"]) == {True, False}
    assert set(spdf["ok_word_count"]) == {True, False}
    assert set(spdf["ok_stopwords"]) == {True, False}


# ----------------------------------------------------- Kneser-Ney LM


def test_kn_trainer_matches_oracle(spark):
    from nyc_traffic_insight_spark.queries.tokenizers import (
        lm_kn_oracle_sql,
        lm_train_kneser_ney,
    )

    spdf = lm_train_kneser_ney(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(lm_kn_oracle_sql()).fetchdf()
    compare(spdf, odf, "lm_train_kneser_ney")
    assert len(spdf) == 100
    # discounted probabilities are probabilities
    assert (spdf["pkn"] > 0).all() and (spdf["pkn"] < 1).all()


def test_kn_mass_sums_to_one_per_context():
    """Interpolated KN's defining identity: for every context w1,
    sum over the vocabulary of P_kn(w2|w1) == 1 — the discount mass
    d*N1+(w1,.) is exactly what the continuation term redistributes.
    Checked in DuckDB over the FULL (untruncated) model assembled from
    the same shared fragments the operator registers."""
    from nyc_traffic_insight_spark.queries.tokenizers import (
        _KN_DISCOUNT,
        _lm_kn_parts,
        _lm_oracle_parts,
    )

    d = _KN_DISCOUNT
    sql = (
        _lm_oracle_parts("documents", 2000)
        + f", {_lm_kn_parts('bg')} "
        + f"""
        , seen AS (
          SELECT b.w1,
                 sum((b.pair_cnt - {d}) / c.ctx_cnt) AS seen_mass,
                 any_value(c.ctx_cnt) AS ctx_cnt,
                 any_value(f.fanout) AS fanout
          FROM bg b JOIN ctx c ON b.w1 = c.w1 JOIN n1f f ON b.w1 = f.w1
          GROUP BY 1
        )
        SELECT s.w1,
               s.seen_mass + {d} * s.fanout / s.ctx_cnt
                 * (SELECT sum(fanin) FROM n1b)
                 / (SELECT n FROM nall) AS total_mass
        FROM seen s
        """
    )
    rows = duck_connect(SF_SMOKE).execute(sql).fetchall()
    assert rows, "empty model"
    for w1, mass in rows:
        assert abs(mass - 1.0) < 1e-9, (w1, mass)


# ----------------------------------------------------- IVF index audit


def test_ivf_audit_matches_oracle_and_reconciles(spark):
    import duckdb

    from nyc_traffic_insight_spark.queries.textops import (
        ivf_audit_oracle_sql,
        qa_ivf_index_audit,
    )

    spdf = qa_ivf_index_audit(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(ivf_audit_oracle_sql()).fetchdf()
    compare(spdf, odf, "qa_ivf_index_audit")
    n_emb = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchone()[0]
    assert int(spdf["n_vectors"].sum()) == n_emb
    k = len(spdf)
    assert abs(spdf["share"].sum() - 1.0) <= k * 1e-6  # r6 rounding slack
    assert (spdf["min_cos"] <= spdf["mean_cos"]).all()
    assert (spdf["mean_cos"] <= spdf["max_cos"]).all()


# ------------------------------------------------ stride interleave


def _interleave_ref(counts: dict) -> dict:
    """Naive sort-by-key reference: key(i,s) = (2i-1)/(2 n_s), ties by
    (source, i). Returns {(source, i): pos}."""
    docs = [(s, i) for s, n in counts.items() for i in range(1, n + 1)]
    docs.sort(key=lambda d: ((2 * d[1] - 1) / (2 * counts[d[0]]), d[0], d[1]))
    return {d: p for p, d in enumerate(docs)}


def test_interleave_oracle_matches_sort_reference_fuzz():
    """The closed form (what BOTH engines run) vs the naive sort-by-key
    reference on random mixtures — the algebra is verified, not
    copied."""
    import duckdb

    from nyc_traffic_insight_spark.queries.samplingq import (
        interleave_oracle_sql,
    )

    rng = random.Random(41)
    for trial in range(300):
        k = rng.randint(1, 5)
        counts = {f"s{j}": rng.randint(1, 12) for j in range(k)}
        rows, doc_id = [], 0
        for s, n in counts.items():
            for _ in range(n):
                rows.append((doc_id, s))
                doc_id += 1
        con = duckdb.connect()
        con.execute("CREATE TABLE docs(doc_id BIGINT, source VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
        got = {
            (s, i): p
            for _, s, i, p in con.sql(
                interleave_oracle_sql("docs")
            ).fetchall()
        }
        assert got == _interleave_ref(counts), (trial, counts)


def test_interleave_matches_oracle_and_paces_sources(spark):
    from nyc_traffic_insight_spark.queries.samplingq import (
        interleave_oracle_sql,
        sample_interleave_stride,
    )

    spdf = sample_interleave_stride(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(interleave_oracle_sql()).fetchdf()
    compare(spdf, odf, "sample_interleave_stride")
    n = len(spdf)
    assert sorted(spdf["pos"]) == list(range(n))  # permutation
    # pacing: within any contiguous window of the schedule, each
    # source's share tracks its corpus share (the whole point vs a
    # source-sorted order) — check the first half
    half = spdf[spdf["pos"] < n // 2]["source"].value_counts()
    full = spdf["source"].value_counts()
    for s in full.index:
        assert abs(half.get(s, 0) / (n // 2) - full[s] / n) < 0.02, s


def test_interleave_plan_is_narrow(spark):
    """One source-partition rank window + a one-row broadcast fold —
    the only SinglePartition is the k-row counts collect_list merge,
    and the BNLJ is the one-row array broadcast (accounted shapes)."""
    from nyc_traffic_insight_spark.queries.samplingq import (
        sample_interleave_stride,
    )

    plan = (
        sample_interleave_stride(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange SinglePartition") <= 1
    assert "CartesianProduct" not in plan


# ------------------------------------------------ KN scorer


def test_kn_scorer_matches_oracle_and_covers_same_docs(spark):
    """Cross-engine equality, plus consistency with the Laplace
    scorer: both score exactly the docs with >=2 (unk-mapped) tokens,
    so the doc sets must be identical."""
    from nyc_traffic_insight_spark.queries.tokenizers import (
        lm_kn_score_oracle_sql,
        lm_score_kneser_ney,
        lm_score_perplexity,
    )

    spdf = lm_score_kneser_ney(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(lm_kn_score_oracle_sql()).fetchdf()
    compare(spdf, odf, "lm_score_kneser_ney")
    assert (spdf["ppl_kn"] >= 1.0).all()  # exp of a mean of -ln(p<=1)
    lap = lm_score_perplexity(spark, SF_SMOKE).toPandas()
    assert set(spdf["doc_id"]) == set(lap["doc_id"])
    # KN's discounting redistributes mass to frequent continuations,
    # so the two scorers genuinely differ (not a re-spelling)
    merged = spdf.merge(lap, on="doc_id")
    assert (merged["ppl_kn"] != merged["ppl"]).any()


# ------------------------------------------------ banding sweep


def test_lsh_sweep_matches_oracle_and_tradeoff_is_monotone(spark):
    """Cross-engine equality; the production-geometry row equals the
    standalone recall audit; and the tuning story holds: fewer rows
    per band -> more candidates and recall never decreases."""
    from nyc_traffic_insight_spark.queries.textops import (
        lsh_sweep_oracle_sql,
        qa_lsh_banding_sweep,
        qa_lsh_recall_audit,
    )

    spdf = qa_lsh_banding_sweep(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(lsh_sweep_oracle_sql()).fetchdf()
    compare(spdf, odf, "qa_lsh_banding_sweep")
    assert len(spdf) == 3
    audit = qa_lsh_recall_audit(spark, SF_SMOKE).toPandas().iloc[0]
    prod = spdf[spdf["rows_per_band"] == 2].iloc[0]
    for col in ["n_true_pairs", "n_lsh_candidates", "n_hits",
                "recall", "candidate_precision"]:
        assert prod[col] == audit[col], col
    by_r = spdf.sort_values("rows_per_band")
    cands = list(by_r["n_lsh_candidates"])
    recalls = list(by_r["recall"])
    assert cands == sorted(cands, reverse=True)  # more rows, fewer cands
    assert recalls == sorted(recalls, reverse=True)  # and recall only drops


def test_interleave_tie_heavy_through_spark(spark):
    """Equal source counts make EVERY rank tie across sources (key
    (2i-1)/(2n) identical for all of them) — the committed fuzz covers
    this path on DuckDB only; this drives the SPARK closed form + tie
    adjustment on the same synthetic frame and cross-checks both
    engines and the naive reference."""
    import duckdb

    from nyc_traffic_insight_spark.queries.samplingq import (
        interleave_oracle_sql,
    )

    rows = [(i, f"s{i % 3}") for i in range(24)]  # 3 sources x 8 docs
    sdf = spark.createDataFrame(rows, "doc_id long, source string")
    # run the builder's logic on the synthetic frame via a temp view +
    # the oracle text on a DuckDB twin, then compare to the reference
    import nyc_traffic_insight_spark.queries.samplingq as sq

    orig = sq.load_table
    try:
        sq.load_table = lambda _s, _d, _t: sdf
        spdf = sq.sample_interleave_stride(spark, "unused").toPandas()
    finally:
        sq.load_table = orig
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, source VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    odf = con.sql(interleave_oracle_sql("docs")).fetchdf()
    compare(spdf, odf, "interleave[tie-heavy]")
    # against the naive reference too: with equal counts the order is
    # round-robin by source name — s0, s1, s2, s0, s1, s2, ...
    by_pos = spdf.sort_values("pos")["source"].tolist()
    assert by_pos == ["s0", "s1", "s2"] * 8


# ------------------------------------------------ pretrain-order capstone


def test_pretrain_order_matches_oracle_and_is_rescoped(spark):
    """Cross-engine equality, plus the re-scoping pin: the packing
    prefix runs over the GOPHER SURVIVORS, so total packed tokens
    equal the survivors' token count (not the corpus's), the window
    count shrinks accordingly, and per epoch the positions are a
    permutation of the windows."""
    from nyc_traffic_insight_spark.queries.textops import (
        pack_window_manifest,
        pipeline_pretrain_order,
        pretrain_order_oracle_sql,
        text_gopher_rules,
    )

    spdf = pipeline_pretrain_order(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(pretrain_order_oracle_sql()).fetchdf()
    compare(spdf, odf, "pipeline_pretrain_order")
    e0 = spdf[spdf["epoch"] == 0]
    n_win = len(e0)
    for _, grp in spdf.groupby("epoch"):
        assert sorted(grp["pos"]) == list(range(n_win))
    # token conservation over survivors
    gop = text_gopher_rules(spark, SF_SMOKE).toPandas()
    surv_tokens = int(gop.loc[gop["keep"], "n_words"].sum())
    assert int(e0["n_tokens"].sum()) == surv_tokens
    # and the re-scope genuinely changes the layout vs raw packing
    raw = pack_window_manifest(spark, SF_SMOKE).toPandas()
    assert len(raw) > n_win


# ------------------------------------------------ corpus-health trio


def _duck_documents(texts):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    return con


def test_dup_ngram_rate_matches_oracle_and_reference(spark):
    from nyc_traffic_insight_spark.queries.textops import (
        dup_ngram_oracle_sql,
        text_dup_ngram_rate,
    )

    spdf = text_dup_ngram_rate(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(dup_ngram_oracle_sql()).fetchdf()
    compare(spdf, odf, "text_dup_ngram_rate")
    row = spdf.iloc[0]
    assert 0 <= row["n_dup_occurrences"] <= row["n_occurrences"]
    assert row["n_repeated_distinct"] <= row["n_distinct"]
    # Python reference on a corpus with a known repetition structure:
    # 'a b c d' contributes trigrams (a b c), (b c d); repeating the
    # doc makes every occurrence a duplicate
    texts = ["a b c d", "a b c d", "x y z"]
    con = _duck_documents(texts)  # keep the connection referenced
    got = con.sql(dup_ngram_oracle_sql()).fetchone()
    # occurrences: 2+2+1 = 5; dups: the four from the repeated doc
    assert got[0] == 5 and got[1] == 4 and got[3] == 3 and got[4] == 2


def test_contamination_rate_matches_oracle_and_bounds(spark):
    from nyc_traffic_insight_spark.queries.textops import (
        contamination_rate_oracle_sql,
        qa_contamination_rate,
    )

    spdf = qa_contamination_rate(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(
        contamination_rate_oracle_sql()
    ).fetchdf()
    compare(spdf, odf, "qa_contamination_rate")
    row = spdf.iloc[0]
    assert 0 <= row["n_contaminated_ngrams"] <= row["n_eval_ngrams"]
    assert 0 <= row["n_eval_docs_hit"] <= row["n_eval_docs"]


def test_zipf_slope_recovers_a_known_power_law(spark):
    """A corpus constructed with exact Zipf counts (word_i appears
    floor(3000/i) times) must fit neg_slope ~ 1 with high r² — and the
    real fixture must NOT (its ~31-word vocabulary is near-uniform),
    so the metric genuinely discriminates."""
    from nyc_traffic_insight_spark.queries.textops import (
        qa_zipf_slope,
        zipf_oracle_sql,
    )

    texts = [" ".join([f"w{i:03d}"] * (3000 // i)) for i in range(1, 41)]
    con = _duck_documents(texts)  # keep the connection referenced
    got = con.sql(zipf_oracle_sql()).fetchdf().iloc[0]
    assert 0.9 <= got["neg_slope"] <= 1.1, got
    assert got["r2"] > 0.98, got
    # and at a FULL top-V=1000 vocabulary (review r13): the original
    # integer readout overflowed INT64 at ~1000 ranked words
    # (sx*sx ~ 3.5e19); the DOUBLE-projected form must fit the same
    # law over 1500 distinct words without erroring
    big = _duck_documents(
        [" ".join([f"w{i:05d}"] * (1 + 3000 // (i + 1))) for i in range(1500)]
    )
    wide = big.sql(zipf_oracle_sql()).fetchdf().iloc[0]
    assert wide["n_vocab"] == 1000
    assert 0.9 <= wide["neg_slope"] <= 1.1 and wide["r2"] > 0.98, wide
    real = qa_zipf_slope(spark, SF_SMOKE).toPandas().iloc[0]
    assert real["r2"] < 0.5  # the synthetic fixture is not Zipfian


def test_zipf_matches_oracle(spark):
    from nyc_traffic_insight_spark.queries.textops import (
        qa_zipf_slope,
        zipf_oracle_sql,
    )

    spdf = qa_zipf_slope(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(zipf_oracle_sql()).fetchdf()
    compare(spdf, odf, "qa_zipf_slope")


# ------------------------------------------------ pHash asset dedup


def test_phash_dedup_matches_oracle(spark):
    from nyc_traffic_insight_spark.queries.multimodalq import (
        mm_dedup_phash,
        phash_oracle_sql,
    )

    spdf = mm_dedup_phash(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(phash_oracle_sql()).fetchdf()
    compare(spdf, odf, "mm_dedup_phash")
    # honest gate note: sha-derived 32-bit hashes are uniform, so the
    # smoke fixture (no exact-dup texts) yields a true empty match
    assert (spdf["hamming"] <= 2).all() if len(spdf) else True


def test_phash_dedup_finds_synthetic_duplicates(spark):
    """The live branch: k copies of a payload must surface as C(k,2)
    hamming-0 pairs in BOTH engines (exact dups are the only pairs the
    sha-stub decoder can place at distance 0 — a real pHash clusters
    near-dups too, behind the same seam)."""
    import duckdb

    import nyc_traffic_insight_spark.queries.multimodalq as mm
    from nyc_traffic_insight_spark.queries.multimodalq import (
        phash_oracle_sql,
    )

    texts = [(0, "alpha beta gamma", 16), (1, "alpha beta gamma", 16),
             (2, "alpha beta gamma", 16), (3, "delta epsilon", 13),
             (4, "zeta eta theta iota", 19)]
    sdf = spark.createDataFrame(
        texts, "doc_id long, text string, n_chars long"
    )
    # multimodalq binds _docs at import time (from textops import
    # _docs), so the patch must land on mm's own name, not textops'
    orig = mm._docs
    try:
        mm._docs = lambda _s, _d: sdf
        spdf = mm.mm_dedup_phash(spark, "unused").toPandas()
    finally:
        mm._docs = orig
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", [(i, t) for i, t, _ in texts]
    )
    odf = con.sql(phash_oracle_sql("docs")).fetchdf()
    compare(spdf, odf, "mm_dedup_phash[synthetic]")
    zeros = spdf[spdf["hamming"] == 0]
    assert len(zeros) == 3  # C(3,2) pairs among the triplicate
    assert set(map(tuple, zeros[["asset1", "asset2"]].values)) == {
        (0, 1), (0, 2), (1, 2)
    }


def test_phash_candidate_stage_is_distributed_join(spark):
    """r14 (VERDICT r13 "What's wrong" #1): the candidate stage must be
    the self equi-join on (band, byte), NOT a per-bucket collect_list +
    in-row pair expansion — the array form put a whole n/256-asset
    bucket into ONE row and its Θ(bucket²) expansion into one task.
    Pin: no CollectList anywhere in the executed plan, and with
    broadcast disabled (the cluster-scale shape — neither side of a
    10⁹-asset self-join broadcasts) the join is a shuffled
    SortMergeJoin over hash-partitioned exchanges."""
    import nyc_traffic_insight_spark.queries.multimodalq as mm

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = mm.mm_dedup_phash(spark, SF_SMOKE)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "CollectList" not in plan and "collect_list" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_phash_banding_recall_guarantee_still_holds(spark):
    """Re-run of the d<=2 recall-guarantee argument on the r14 join
    shape: plant hash pairs at Hamming distance 0, 1, 2 (must ALL
    surface — pigeonhole over 4 bands) and at distance 3+ in a shared
    band (may surface as candidates but must be filtered by the
    popcount verify)."""
    import nyc_traffic_insight_spark.queries.multimodalq as mm

    # craft texts whose sha-derived 32-bit phash we compute host-side
    import hashlib

    def phash(text: str) -> int:
        hexd = hashlib.sha256(text.encode()).hexdigest()
        out = 0
        for p in range(32):
            if int(hexd[2 * p : 2 * p + 2], 16) >= 128:
                out |= 1 << p
        return out

    # search a small text pool for pairs at the distances we need
    pool = [f"doc {i} filler" for i in range(4000)]
    hashes = {t: phash(t) for t in pool}
    base = pool[0]
    bh = hashes[base]
    by_d = {}
    for t in pool[1:]:
        d = bin(bh ^ hashes[t]).count("1")
        by_d.setdefault(d, t)
    texts = [(0, base, len(base))]
    want_pairs = set()
    next_id = 1
    for d in (0, 1, 2):
        if d == 0:
            t = base  # exact copy: distance 0 guaranteed
        elif d not in by_d:
            continue  # pool too small for this distance — rare
        else:
            t = by_d[d]
        texts.append((next_id, t, len(t)))
        want_pairs.add((0, next_id, d))
        next_id += 1
    # the must-NOT-surface case: a text at Hamming distance >= 3 from
    # base that nevertheless SHARES a full band (a band-collision
    # candidate) — the popcount verify must filter it. P(share a
    # band) ~= 1.6% per pair, so the pool always contains one.
    def bands(h):
        return {(k, (h >> (8 * k)) & 255) for k in range(4)}

    base_bands = bands(bh)
    far_id = None
    for t in pool[1:]:
        d = bin(bh ^ hashes[t]).count("1")
        if d >= 3 and bands(hashes[t]) & base_bands:
            texts.append((next_id, t, len(t)))
            far_id = next_id
            next_id += 1
            break
    assert far_id is not None, "pool has no shared-band far pair"
    sdf = spark.createDataFrame(
        texts, "doc_id long, text string, n_chars long"
    )
    orig = mm._docs
    try:
        mm._docs = lambda _s, _d: sdf
        got = {
            (r["asset1"], r["asset2"]): r["hamming"]
            for r in mm.mm_dedup_phash(spark, "unused").collect()
            if r["asset1"] == 0
        }
    finally:
        mm._docs = orig
    for a, b, d in want_pairs:
        assert got.get((a, b)) == d, (a, b, d, got)
    # the shared-band far pair IS a banding candidate but must be
    # verified away — its absence is the popcount filter working,
    # not a fixture accident
    assert (0, far_id) not in got, got.get((0, far_id))
    assert all(v <= 2 for v in got.values())


def test_mm_dedup_canonical_matches_oracle(spark):
    from nyc_traffic_insight_spark.queries.multimodalq import (
        mm_dedup_canonical,
        phash_canonical_oracle_sql,
    )

    spdf = mm_dedup_canonical(spark, SF_SMOKE).toPandas()
    odf = duck_connect(SF_SMOKE).execute(
        phash_canonical_oracle_sql()
    ).fetchdf()
    compare(spdf, odf, "mm_dedup_canonical")
    # every asset appears exactly once; exactly one canonical per comp
    assert spdf["asset_id"].is_unique
    g = spdf.groupby("component")["is_canonical"].sum()
    assert (g == 1).all()


def test_mm_dedup_canonical_synthetic_cluster(spark):
    """Live branch: a triplicate payload forms ONE component whose
    canonical is the lowest asset_id (equal payload bytes → id
    tie-break); singletons are their own canonical. Cross-engine via
    the same docs-table patch as the phash synthetic test."""
    import duckdb

    import nyc_traffic_insight_spark.queries.multimodalq as mm
    from nyc_traffic_insight_spark.queries.multimodalq import (
        phash_canonical_oracle_sql,
    )

    texts = [(0, "alpha beta gamma", 16), (1, "alpha beta gamma", 16),
             (2, "alpha beta gamma", 16), (3, "delta epsilon", 13),
             (4, "zeta eta theta iota", 19)]
    sdf = spark.createDataFrame(
        texts, "doc_id long, text string, n_chars long"
    )
    orig = mm._docs
    try:
        mm._docs = lambda _s, _d: sdf
        spdf = mm.mm_dedup_canonical(spark, "unused").toPandas()
    finally:
        mm._docs = orig
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", [(i, t) for i, t, _ in texts]
    )
    odf = con.sql(phash_canonical_oracle_sql("docs")).fetchdf()
    compare(spdf, odf, "mm_dedup_canonical[synthetic]")
    rows = {r.asset_id: r for r in spdf.itertuples()}
    assert rows[0].component == rows[1].component == rows[2].component == 0
    assert all(rows[i].canonical_asset == 0 for i in (0, 1, 2))
    assert rows[0].is_canonical and not rows[1].is_canonical
    for i in (3, 4):
        assert rows[i].component == i and rows[i].is_canonical
