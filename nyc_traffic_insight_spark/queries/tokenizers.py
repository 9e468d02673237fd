"""Catalog: tokenizer and language-model operators (text tier).

Pure file-move out of ``textops.py`` (round 11; VERDICT r9/r10 #3):
the vocabulary / tokenizer-training / language-model block —
``vocab_top_ngrams``, ``text_bpe_pair_counts``, ``text_oov_rate``, the
distributed BPE merge trainer + encoder (``bpe_train_merges`` /
``bpe_encode_top_tokens``) and the bigram LM pair (``lm_train_bigram``
/ ``lm_score_perplexity``). Nothing here changed in the move — the
generated oracle-SQL texts are byte-identical before/after (pinned by
tests/test_tokenizers_module.py) — textops.py simply passed the point
where a 900-line self-contained tier should share a file with dedup
and similarity search.

Shared conventions (determinism inventory, shared-SQL-fragment oracle
pattern, _BPE_WS / _BPE_UP / _BPE_LO engine-portability probes) are
documented on the constants and section comments below, verbatim from
their original home.
"""

from __future__ import annotations

import itertools as _itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_traffic_insight_spark.queries import register
from nyc_traffic_insight_spark.functions.rounding import r as _r, r4_sql
from nyc_traffic_insight_spark.queries.textops import _docs, _materialize


_VOCAB_TOPK = 100


@register(
    "vocab_top_ngrams",
    survey="north-star: vocabulary building — corpus top-k unigrams by "
    "document frequency (tokenizer-training prep)",
    oracle=rf"""
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
               AS term
      FROM documents
    ),
    df_tf AS (
      SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS term_freq
      FROM words GROUP BY 1
    ),
    ranked AS (
      SELECT term, CAST(doc_freq AS BIGINT) AS doc_freq,
             CAST(term_freq AS BIGINT) AS term_freq,
             row_number() OVER (ORDER BY doc_freq DESC, term_freq DESC, term)
               AS rk
      FROM df_tf
    )
    SELECT term, doc_freq, term_freq, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= {_VOCAB_TOPK}
    """,
)
def vocab_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-k terms by document frequency (ties by
    total term frequency, then lexicographic — fully deterministic).

    Scale shape: explode → two-level aggregate with map-side partials
    (the per-(term, doc) distinct collapses locally before shuffling),
    then a top-k. Hot terms skew the TERM aggregate but aggregates
    (unlike joins) absorb skew via partial combine. The top-k itself is
    orderBy().limit(k) — Spark's distributed TakeOrdered: each partition
    keeps its local k, the driver merges k×partitions rows — NOT a
    row_number window, which would single-partition-sort the entire
    vocabulary (billions of terms at 100 TB). The rank column is then a
    window over just the k survivors."""
    from pyspark.sql import Window

    words = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    )
    df_tf = words.groupBy("term").agg(
        F.count_distinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("term_freq"),
    )
    order = [F.desc("doc_freq"), F.desc("term_freq"), F.col("term")]
    topk = df_tf.orderBy(*order).limit(_VOCAB_TOPK)
    wr = Window.orderBy(*order)
    return topk.select(
        "term",
        F.col("doc_freq").cast("bigint").alias("doc_freq"),
        F.col("term_freq").cast("bigint").alias("term_freq"),
        F.row_number().over(wr).cast("int").alias("rk"),
    )


_BPE_TOPK = 50


@register(
    "text_bpe_pair_counts",
    survey="north-star: tokenizer training prep — BPE first-iteration "
    "merge candidates (adjacent symbol-pair counts over the word-"
    "frequency table; Sennrich et al. 2016 step 1)",
    oracle=rf"""
    WITH words AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
      FROM documents
    ),
    wf AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt
      FROM words WHERE w <> '' GROUP BY 1
    ),
    pairs AS (
      SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b, cnt
      FROM wf, UNNEST(generate_series(1, length(w) - 1)) AS t(i)
      WHERE length(w) >= 2
    ),
    agg AS (
      SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pair_count
      FROM pairs GROUP BY 1, 2
    ),
    ranked AS (
      SELECT a, b, pair_count,
             row_number() OVER (ORDER BY pair_count DESC, a, b) AS rk
      FROM agg
    )
    SELECT a, b, pair_count, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= {_BPE_TOPK}
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge candidates: count adjacent character
    pairs weighted by word frequency, top-k by count (ties by pair,
    lexicographic — deterministic). Picking the argmax pair and
    re-segmenting is one BPE training step; the COUNT table is the
    expensive distributed part, so it is the catalog operator (the
    full merge LOOP is the registered bpe_train_merges below — same
    collapse, iterated relationally).

    Scale shape: the corpus collapses to the word-frequency table first
    (one aggregate with map-side partials — the standard BPE trick: pair
    expansion runs over the VOCABULARY, not the corpus, so a trillion-
    token corpus costs one word-count aggregate + a vocab-sized array
    transform). The pair aggregate is alphabet²-bounded, and the top-k
    is orderBy().limit() — distributed TakeOrdered, no global sort
    (the vocab_top_ngrams lesson); rank is a window over the k
    survivors only."""
    from pyspark.sql import Window

    words = _docs(spark, sf_dir).select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    )
    wf = (
        words.filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    pair_structs = F.expr(
        "transform(sequence(1, length(w) - 1), i -> "
        "struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))"
    )
    agg = (
        wf.filter(F.length("w") >= 2)
        .select(F.explode(pair_structs).alias("p"), "cnt")
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").cast("bigint").alias("pair_count"))
    )
    order = [F.desc("pair_count"), F.col("a"), F.col("b")]
    topk = agg.orderBy(*order).limit(_BPE_TOPK)
    wr = Window.orderBy(*order)
    return topk.select(
        "a",
        "b",
        "pair_count",
        F.row_number().over(wr).cast("int").alias("rk"),
    )



@register(
    "text_oov_rate",
    survey="north-star: out-of-vocabulary rate per source against the "
    "corpus top-20 vocabulary — the tokenizer-coverage metric that "
    "decides whether a vocab is big enough for a new data source",
    oracle=r"""
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
               AS term
      FROM documents
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term,
               row_number() OVER (ORDER BY count(*) DESC,
                                  count(DISTINCT doc_id) DESC, term) AS rk
        FROM words GROUP BY term
      ) WHERE rk <= 20
    ),
    flagged AS (
      SELECT w.doc_id,
             CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
      FROM words w LEFT JOIN vocab v ON v.term = w.term
    ),
    per_doc AS (
      SELECT d.source, f.doc_id,
             CAST(sum(f.oov) AS DOUBLE) / count(*) AS oov_rate
      FROM flagged f JOIN documents d ON d.doc_id = f.doc_id
      GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(oov_rate), 4) AS mean_oov_rate
    FROM per_doc GROUP BY 1
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each source's text a top-20-term corpus vocabulary
    fails to cover: per-doc OOV token share averaged per source (the
    fixture corpus draws from ~31 distinct words, so a realistic-scale
    vocab would cover 100% and the metric would be vacuous; 20-of-31
    leaves a real tail to measure). A
    rising mean for a new source means the tokenizer/vocab was trained
    on the wrong distribution — the go/no-go check before mixing a
    source into a pretraining corpus.

    Determinism: the vocabulary ranks with a full tie-break (term
    frequency, doc frequency, lexicographic); per-doc rates are exact
    integer ratios widened to double, and only the final per-source
    mean is rounded. Scale shape: the vocab is a bounded-k broadcast
    onto the exploded token stream; the doc and source aggregates
    shuffle on ids, never on tokens."""
    d = _docs(spark, sf_dir)
    words = d.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "term"
        ),
    )
    from pyspark.sql import Window

    ranked = (
        words.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .select(
            "term",
            F.row_number()
            .over(
                Window.orderBy(
                    F.desc("tf"), F.desc("df"), F.asc("term")
                )
            )
            .alias("rk"),
        )
        .filter(F.col("rk") <= 20)
        .select("term")
        # bounded-k table materialized once so the scoring join doesn't
        # re-derive the vocabulary's corpus scan
        .localCheckpoint()
    )
    flagged = words.join(
        F.broadcast(ranked.withColumn("in_vocab", F.lit(1))), "term", "left"
    ).select(
        "doc_id",
        "source",
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0).alias("oov"),
    )
    per_doc = flagged.groupBy("source", "doc_id").agg(
        (F.sum("oov").cast("double") / F.count(F.lit(1))).alias("oov_rate")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        _r(F.avg("oov_rate"), 4).alias("mean_oov_rate"),
    )



# ----------------- distributed BPE merge training
# (r8 preview, registered r9)
#
# text_bpe_pair_counts computes ONE BPE training step's candidate
# table and its docstring parks the merge loop as "tokenizer-sized
# driver work". These operators make the LOOP itself an engine
# operator — and the application sibling tokenizes the corpus under
# the learned merges. The whole trainer — vocabulary cap, symbol
# explosion, per-iteration pair statistics, argmax selection, greedy
# non-overlapping merge — is expressed as portable ANSI SQL (windows +
# joins + exact integer sums; no regex over symbols, no
# strings-as-state), generated once and executed by BOTH engines (the
# qdigest shared-fragment pattern), so the @register carries a full
# value-hash oracle for an iterative algorithm.
#
# The merge step is the part Spark/DuckDB SQL does not have a
# primitive for: BPE's merge is GREEDY LEFTMOST NON-OVERLAPPING
# (Sennrich et al. 2016's pattern.sub with lookarounds; for pair
# (a,a) on the run "a a a a" it yields "aa aa", never "aa a a").
# A string replace() loop is NOT equivalent — replace consumes the
# trailing separator, misses boundary-sharing occurrences, and its
# fixpoint diverges from greedy on same-symbol runs (measured:
# "a a a a a a" -> "aa a aa", wrong). The relational form is exact:
# matches of (a,b) with a<>b can never overlap (a match at p+1 would
# need sym(p+1)=a, but it is b), so they all merge; for a=b the
# overlap structure is runs of equal symbols, where greedy merges at
# run offsets 0, 2, 4, ... — the "(pos - run_start) % 2 = 0" parity
# rule over gaps-and-islands run detection. Both facts are pinned
# differentially against a Python reference implementation of the
# greedy fold (tests/test_bpe_train.py), including same-symbol runs
# and an isolated 400-case fuzz of the merge body.
#
# Scale shape: the ONLY full-corpus operation is the word-frequency
# aggregate (map-side partials, the standard BPE collapse — a
# trillion-token corpus costs one word count). Everything after runs
# on bounded or word-keyed state, split by WHERE the bound comes from:
#
# - TRAINING state is CAP-BOUNDED BY CONSTRUCTION: the top-_BPE_VOCAB
#   vocabulary is <= 2000 (word, freq) rows at ANY corpus size, so the
#   merge loop runs DRIVER-SIDE on the collected vocabulary
#   (_bpe_train_local) — the same contract-bounded-collect class as
#   the catalog's query-set broadcast and the 64x64 eigensolve, and
#   exactly how production BPE trainers work (HuggingFace tokenizers /
#   SentencePiece: distributed count, in-memory merge loop). The r15
#   per-iteration Spark orchestration was measured at its floor
#   (~0.5 s/job x ~20 sequential bounded-data jobs, pure scheduling —
#   NOTES r15 "BPE fusion attempt"); a 62k-row loop does not need a
#   cluster, and pretending it does costs 20 scheduler round-trips.
# - APPLICATION state is ∝ DISTINCT corpus words (NOT cap-bounded), so
#   it stays distributed: one Arrow-batched mapInPandas pass over the
#   word-frequency table applies the merges as a chain of C-speed
#   non-regex str.replace calls on the token-delimited rendering
#   (_bpe_render / _bpe_pats — leftmost non-overlapping replace on
#   that rendering IS the greedy fold), pre-aggregated per batch so
#   the only shuffle is the partially-aggregated token histogram.
#
# DuckDB's oracle is UNCHANGED: the full relational WITH-chain (AS
# MATERIALIZED hints — the un-hinted monolith re-expands the chain
# 2^iterations: 14 s at 6 iterations vs 0.2 s hinted). The driver's
# value-hash compare therefore pins the driver-side fold against the
# relational parity-rule algorithm EXECUTED by DuckDB on every check,
# and tests/test_bpe_train.py pins both against an independent Python
# reference (400-case fuzz of the merge body included).

_BPE_MAXLEN = 30  # words longer than this are excluded (both engines)
_BPE_VOCAB = 2000  # vocabulary cap: top-V words by (freq DESC, word ASC)
_BPE_MERGES = 10  # merge iterations = trainer output rows
_BPE_TOP_TOKENS = 50  # bpe_encode output size

# Explicit ASCII-whitespace class, NOT \s: Java regex (Spark), RE2
# (DuckDB) and Python disagree on \s (RE2's \s excludes \x0B; Python's
# str \s adds unicode spaces), and in an ITERATIVE trainer a single
# word-table difference flips an argmax and cascades through every
# later merge. One spelling, three engines, zero ambiguity. The
# registered \s+ splitters elsewhere in this module keep their
# spelling (their fixed ASCII corpora never hit the divergence and
# their outputs are non-iterative); see NOTES r8.
_BPE_WS = r"[ \t\n\r\x0B\f]+"

# Explicit ASCII case fold via translate(), NOT lower() — the same
# class of engine divergence as \s, found by ADVICE r8 and confirmed
# by probe: DuckDB's utf8proc lowercases U+0130 ('İ') in-context to
# plain 'i' ('İstanbul' → 'istanbul') while Java (Spark) and Python
# emit 'i' + combining U+0307 ('i̇stanbul'); one differing word flips
# an argmax and cascades through every later merge. translate() is a
# pure per-codepoint substitution all three engines define
# identically, so the trainer's normalization is ASCII-only case
# folding: A-Z fold, every non-ASCII codepoint passes through
# untouched (pinned by the casefold corpus in tests/test_bpe_train.py;
# the registered non-iterative lower() call sites elsewhere keep
# their spelling for the same reason the \s+ ones do).
_BPE_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_BPE_LO = "abcdefghijklmnopqrstuvwxyz"


def _bpe_spine_sql() -> str:
    """Position spine 1.._BPE_MAXLEN as UNION ALL literals — the
    engine-portable spelling of generate_series (the qdigest probe
    trick)."""
    return " UNION ALL ".join(
        f"SELECT {k} AS pos" for k in range(1, _BPE_MAXLEN + 1)
    )


def _bpe_vocab_body() -> str:
    """Capped vocabulary from a `wf(w, cnt)` word-frequency relation.
    Deterministic: ties broken by word ASC."""
    return (
        f"SELECT w AS word, cnt AS freq FROM wf "
        f"WHERE length(w) <= {_BPE_MAXLEN} "
        f"ORDER BY cnt DESC, w LIMIT {_BPE_VOCAB}"
    )


def _bpe_allwords_body() -> str:
    """Application-side word table: every corpus word under the length
    cap, NO vocabulary cap — the tokenizer must segment the long tail
    too, and the sub-cap words are exactly where subword segmentation
    earns its keep."""
    return (
        f"SELECT w AS word, cnt AS freq FROM wf "
        f"WHERE length(w) <= {_BPE_MAXLEN}"
    )


def _bpe_init_body(words: str = "vocab") -> str:
    """Word table -> exploded symbol table (word, freq, pos, sym): one
    row per character position via the spine join, plus the '</w>'
    terminal (Sennrich's end-of-word marker). Used for both the
    training state (words='vocab') and the application state
    (words='allwords') so the two explosions cannot drift."""
    return (
        f"SELECT v.word, v.freq, sp.pos, substr(v.word, sp.pos, 1) AS sym "
        f"FROM {words} v JOIN spine sp ON sp.pos <= length(v.word) "
        f"UNION ALL "
        f"SELECT word, freq, length(word) + 1 AS pos, '</w>' AS sym "
        f"FROM {words}"
    )


def _bpe_pairs_body(w: str) -> str:
    """Adjacent-pair statistics over symbol table `w`: every adjacent
    position counts (overlapping occurrences included — Sennrich
    get_stats semantics), weighted by word frequency, exact BIGINT."""
    return (
        "SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS cnt "
        "FROM (SELECT sym AS left_sym, "
        "lead(sym) OVER (PARTITION BY word ORDER BY pos) AS right_sym, "
        f"freq FROM {w}) t "
        "WHERE right_sym IS NOT NULL GROUP BY left_sym, right_sym"
    )


def _bpe_best_body(p: str) -> str:
    """Argmax merge candidate, fully deterministic (cnt DESC, then
    lexicographic pair ASC)."""
    return (
        f"SELECT left_sym, right_sym, cnt FROM {p} "
        "ORDER BY cnt DESC, left_sym, right_sym LIMIT 1"
    )


def _bpe_merge_body(w: str, b: str) -> str:
    """Apply the 1-row best pair to symbol table `w` with GREEDY
    LEFTMOST NON-OVERLAPPING semantics, relationally:

    - flagged: broadcast the pair, look one symbol ahead. LEFT JOIN
      ON 1=1, not CROSS JOIN: when the pair table has drained, `b` is
      EMPTY, and a cross join would wipe the whole symbol table (fatal
      for the application chain in bpe_encode_top_tokens, which must
      pass through unchanged); with the left join the pair columns
      come back NULL, every merged_here is 0, and the state survives;
    - isl/runs: gaps-and-islands run detection (pos - row_number over
      equal-symbol islands is constant within a run; run_start is the
      run's min pos) — needed only for the a=b overlap case;
    - dec: a position merges iff it heads a pair occurrence AND
      (a <> b, where occurrences cannot overlap, OR its offset into
      the equal-symbol run is even — greedy picks 0, 2, 4, ...);
    - keep/renumber: a position is consumed iff its predecessor
      merged (lag); survivors emit the merged symbol or their own,
      and row_number re-densifies pos for the next iteration.
    """
    return (
        "SELECT word, freq, "
        "CAST(row_number() OVER (PARTITION BY word ORDER BY pos) AS INTEGER)"
        " AS pos, sym "
        "FROM ("
        "  SELECT word, freq, pos, "
        "         CASE WHEN merged_here = 1 THEN a || bb ELSE sym END AS sym, "
        "         lag(merged_here) OVER (PARTITION BY word ORDER BY pos)"
        "           AS consumed "
        "  FROM ("
        "    SELECT *, "
        "           CASE WHEN sym = a AND nxt = bb "
        "                     AND (a <> bb OR (pos - run_start) % 2 = 0) "
        "                THEN 1 ELSE 0 END AS merged_here "
        "    FROM ("
        "      SELECT *, min(pos) OVER (PARTITION BY word, sym, grp)"
        "               AS run_start "
        "      FROM ("
        "        SELECT *, pos - row_number() OVER"
        "                 (PARTITION BY word, sym ORDER BY pos) AS grp "
        "        FROM ("
        "          SELECT s.word, s.freq, s.pos, s.sym, "
        "                 b.left_sym AS a, b.right_sym AS bb, "
        "                 lead(s.sym) OVER"
        "                   (PARTITION BY s.word ORDER BY s.pos) AS nxt "
        f"          FROM {w} s LEFT JOIN {b} b ON 1 = 1"
        "        ) t0"
        "      ) t1"
        "    ) t2"
        "  ) t3"
        ") t4 "
        "WHERE consumed IS NULL OR consumed = 0"
    )


def _bpe_merges_select(best_rel: str = "b") -> str:
    """Trainer output: one row per learned merge, rank-ordered."""
    selects = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS INTEGER) AS rank, left_sym, right_sym, "
        f"left_sym || right_sym AS merged, cnt FROM {best_rel}{i}"
        for i in range(_BPE_MERGES)
    )
    return f"SELECT * FROM ({selects}) out ORDER BY rank"


def _bpe_token_counts_body(a: str) -> str:
    """Corpus token-frequency table after segmentation: the artifact a
    pretraining data pipeline actually ships (token histogram under
    the learned vocabulary). Deterministic top-k: ties by token ASC."""
    return (
        "SELECT sym AS token, CAST(sum(freq) AS BIGINT) AS n_occurrences "
        f"FROM {a} GROUP BY sym "
        f"ORDER BY n_occurrences DESC, token LIMIT {_BPE_TOP_TOKENS}"
    )


def _bpe_wf_duckdb(table: str) -> str:
    """DuckDB-side word-frequency glue (the one engine-specific step;
    explicit whitespace class and ASCII case fold, see _BPE_WS /
    _BPE_UP)."""
    return (
        "SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM ("
        "SELECT unnest(regexp_split_to_array("
        f"translate(trim(text), '{_BPE_UP}', '{_BPE_LO}'), "
        f"'{_BPE_WS}')) AS w FROM {table}) u WHERE w <> '' GROUP BY 1"
    )


def _bpe_oracle_parts(table: str, with_apply: bool) -> list[str]:
    """ONE assembly of the DuckDB WITH-chain for both oracles —
    trainer-only, or trainer + the parallel application chain a0..aN
    over the uncapped word table. AS MATERIALIZED is DuckDB-side glue,
    not fragment text: each chained state is referenced twice, so the
    default inlining re-expands the chain exponentially (see the
    module comment). The Spark side executes the SAME vocab/init/merge
    fragments (bpe_encode_top_tokens's fused application chain and
    _bpe_collect_vocab) around the driver-side merge loop, so a fix to
    a fragment is a fix to both engines and both operators."""
    parts = [
        f"WITH wf AS ({_bpe_wf_duckdb(table)}),",
        f"spine AS ({_bpe_spine_sql()}),",
        f"vocab AS MATERIALIZED ({_bpe_vocab_body()}),",
        f"w0 AS MATERIALIZED ({_bpe_init_body('vocab')})",
    ]
    if with_apply:
        parts.insert(
            3, f"allwords AS MATERIALIZED ({_bpe_allwords_body()}),"
        )
        parts.append(
            f", a0 AS MATERIALIZED ({_bpe_init_body('allwords')})"
        )
    for i in range(_BPE_MERGES):
        parts.append(f", p{i} AS MATERIALIZED ({_bpe_pairs_body(f'w{i}')})")
        parts.append(f", b{i} AS MATERIALIZED ({_bpe_best_body(f'p{i}')})")
        parts.append(
            f", w{i + 1} AS MATERIALIZED "
            f"({_bpe_merge_body(f'w{i}', f'b{i}')})"
        )
        if with_apply:
            parts.append(
                f", a{i + 1} AS MATERIALIZED "
                f"({_bpe_merge_body(f'a{i}', f'b{i}')})"
            )
    return parts


def bpe_oracle_sql(table: str = "documents") -> str:
    """The full trainer as ONE DuckDB SQL text, assembled from the
    same fragment generators the Spark path executes. Output:
    (rank, left_sym, right_sym, merged, cnt), _BPE_MERGES rows (fewer
    only if the pair table drains — both engines agree)."""
    return "".join(
        _bpe_oracle_parts(table, with_apply=False)
        + [" ", _bpe_merges_select()]
    )


def bpe_encode_oracle_sql(table: str = "documents") -> str:
    """bpe_encode_top_tokens as one DuckDB text — the trainer chain
    plus the parallel application chain, same shared assembly."""
    return "".join(
        _bpe_oracle_parts(table, with_apply=True)
        + [" ", _bpe_token_counts_body(f"a{_BPE_MERGES}")]
    )


# Per-call temp-view namespace (ADVICE r8): the chain used fixed
# session-global view names (__bpe_w{i}, ...), so two BPE operators —
# or the same one on two sf_dirs — executing concurrently in one
# SparkSession could cross-contaminate MID-orchestration (sequential
# use was safe: spark.sql analyzes eagerly, so a replaced view never
# retroactively changes an already-built DataFrame). Every chain now
# gets a unique prefix from this counter (itertools.count's __next__
# is atomic under the GIL), and the builders drop their views once
# the result DataFrame is analyzed.
_BPE_SEQ = _itertools.count()


def _bpe_wf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus word-frequency aggregate — the ONLY full-data pass
    in either BPE operator, and the only engine-glue step (same
    _BPE_WS class and _BPE_UP/_BPE_LO ASCII fold as the DuckDB side's
    _bpe_wf_duckdb). Map-side partials, one shuffle keyed on
    uniformly distributed words."""
    words = _docs(spark, sf_dir).select(
        F.explode(
            F.split(F.translate(F.trim("text"), _BPE_UP, _BPE_LO), _BPE_WS)
        ).alias("w")
    )
    return (
        words.filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _bpe_collect_vocab(
    spark: SparkSession, wf_view: str
) -> list[tuple[str, int]]:
    """Collect the capped vocabulary through the SAME generated
    fragment the oracle runs (_bpe_vocab_body: freq DESC, word ASC,
    LIMIT _BPE_VOCAB). The collect is contract-bounded by the LIMIT —
    <= 2000 rows at any corpus size, the same bounded-collect class as
    the catalog's query-set broadcast — and arrives freq-DESC/word-ASC
    ordered, which _bpe_train_local's argmax does not depend on."""
    return [
        (r["word"], r["freq"])
        for r in spark.sql(
            f"WITH wf AS (SELECT * FROM {wf_view}) {_bpe_vocab_body()}"
        ).collect()
    ]


def _bpe_train_local(
    vocab: list[tuple[str, int]], merges: int = _BPE_MERGES
) -> list[tuple[int, str, str, str, int]]:
    """The BPE merge loop (Sennrich et al. 2016) over the CAP-BOUNDED
    collected vocabulary: per iteration, exact frequency-weighted
    adjacent-pair counts over every spelling, argmax with the
    deterministic tie-break (cnt DESC, then lexicographic pair ASC —
    the same ORDER BY as _bpe_best_body), then the greedy LEFTMOST
    NON-OVERLAPPING fold. Returns (rank, left, right, merged, cnt)
    rows; stops early if the pair table drains.

    This is the algorithm the oracle's relational chain computes
    (parity rule over symbol runs == greedy fold — proven and fuzzed
    in tests/test_bpe_train.py); the driver's value-hash compare
    re-pins the two forms against each other on every check. Python
    iterates code points (list(w)), matching both engines'
    character-based substr()."""
    spellings = {w: list(w) + ["</w>"] for w, _ in vocab}
    freqs = dict(vocab)
    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, merges + 1):
        stats: dict[tuple[str, str], int] = {}
        for w, syms in spellings.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                stats[pair] = stats.get(pair, 0) + f
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, a, b, a + b, cnt))
        for w, syms in spellings.items():
            merged: list[str] = []
            i = 0
            n = len(syms)
            while i < n:  # greedy leftmost non-overlap
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            spellings[w] = merged
    return out


def _bpe_render(w: str) -> str:
    """Token-delimited rendering of a word's initial symbol sequence:
    every symbol wrapped in single spaces (so adjacent symbols are
    separated by exactly TWO spaces, and the string starts/ends with
    one). Symbols can never contain 0x20 — words come from a split on
    the _BPE_WS class — so ' a  b ' occurs in the rendering IFF symbol
    a immediately precedes symbol b, and replacing it with ' ab '
    preserves the invariant exactly."""
    return " " + "  ".join([*w, "</w>"]) + " "


def _bpe_pats(
    merges: list[tuple[int, str, str, str, int]],
) -> list[tuple[str, str]]:
    """The learned merges as (pattern, replacement) pairs over the
    _bpe_render form, rank-ordered. Python's non-regex str.replace
    scans left-to-right and never rescans replaced text, which on the
    token-delimited rendering is EXACTLY the greedy leftmost
    non-overlapping fold (the a = b equal-run case included: in
    ' a  a  a ' the pattern ' a  a ' consumes offsets 0-1, resumes
    after the match, and leaves the odd trailing symbol — positions
    0, 2, 4, ... merge, the parity rule). Differentially fuzzed
    against the list fold in tests/test_bpe_train.py."""
    return [(f" {a}  {b} ", f" {a + b} ") for _, a, b, _, _ in merges]


@register(
    "bpe_train_merges",
    survey="north-star text tier: distributed BPE tokenizer TRAINING "
    "(Sennrich et al. 2016) — the full merge loop text_bpe_pair_counts "
    "computes only step 1 of, as a value-hash-oracled iterative "
    "relational algorithm (greedy leftmost non-overlapping merge "
    "proven equal to the parity rule over symbol runs)",
    oracle=bpe_oracle_sql("documents"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge training over the documents corpus — the r8 preview
    promoted in round 9, completing text_bpe_pair_counts (which is
    this trainer's first pair table). Output: (rank, left_sym,
    right_sym, merged, cnt), one row per learned merge, _BPE_MERGES
    rows unless the pair table drains.

    Orchestration (r15; see the section comment): ONE distributed job
    — the word-frequency aggregate feeding the generated vocab
    fragment's top-_BPE_VOCAB collect — then the merge loop runs
    driver-side on the <= 2000-row vocabulary (_bpe_train_local),
    exactly the distributed-count + in-memory-loop split every
    production BPE trainer uses. Replaces 22 sequential bounded-data
    Spark jobs whose cost was pure scheduling (measured at its floor,
    NOTES r15); the oracle still executes the full relational chain,
    so the driver compare pins the fold against the parity-rule
    algorithm on every check."""
    v = f"__bpe{next(_BPE_SEQ)}"
    _bpe_wf(spark, sf_dir).createOrReplaceTempView(f"{v}_wf")
    try:
        vocab = _bpe_collect_vocab(spark, f"{v}_wf")
    finally:
        spark.catalog.dropTempView(f"{v}_wf")
    return spark.createDataFrame(
        _bpe_train_local(vocab),
        schema="rank INT, left_sym STRING, right_sym STRING, "
        "merged STRING, cnt BIGINT",
    )


@register(
    "bpe_encode_top_tokens",
    survey="north-star text tier: BPE tokenizer APPLICATION — segment "
    "the corpus under the merges learned on it (train + apply "
    "self-contained) and emit the top-K token frequencies; the "
    "learned-vocabulary upgrade of text_token_count's whitespace "
    "proxy, sharing the trainer's generated merge fragment so the "
    "two sides cannot drift",
    oracle=bpe_encode_oracle_sql("documents"),
)
def bpe_encode_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the BPE merges learned on it (train +
    apply in one self-contained query) and emit the top-K token
    frequencies — the inference side of bpe_train_merges.

    The application side stays DISTRIBUTED (its state is ∝ distinct
    corpus words, not cap-bounded): one Arrow-batched mapInPandas
    pass over the word-frequency table applies the learned merges as
    a chain of C-speed non-regex str.replace calls on the
    token-delimited rendering (_bpe_render / _bpe_pats — leftmost
    non-overlapping replace on that rendering IS the greedy fold,
    proven + fuzzed in tests/test_bpe_train.py), then pre-aggregates
    (token, Σfreq) per batch so the only shuffle is the map-side
    partially-aggregated token histogram. This replaced the r14
    relational window cascade (5 window passes × _BPE_MERGES merges
    over the exploded symbol table + a localCheckpoint every 4 merge
    bodies): same fold, zero window shuffles, zero checkpoints, one
    job instead of ~5 (bench median 7.3 s → ~1.5 s at sf0.1). A
    drained trainer (k < _BPE_MERGES merges) applies k replaces; the
    oracle's remaining empty-best merges are identity passes (the
    LEFT JOIN pass-through pinned by tests/test_bpe_train.py's
    drained case), so the two sides agree. Output:
    (token, n_occurrences), _BPE_TOP_TOKENS rows max, ties broken by
    token ASC."""
    v = f"__bpe{next(_BPE_SEQ)}"
    wf = _materialize(_bpe_wf(spark, sf_dir))
    wf.createOrReplaceTempView(f"{v}_wf")
    try:
        merges = _bpe_train_local(_bpe_collect_vocab(spark, f"{v}_wf"))
    finally:
        spark.catalog.dropTempView(f"{v}_wf")
    pats = _bpe_pats(merges)

    def _segment(batches):
        import pandas as pd

        for pdf in batches:
            s = pd.Series(
                [_bpe_render(w) for w in pdf["w"]], dtype=object
            )
            for pat, rep in pats:
                s = s.str.replace(pat, rep, regex=False)
            out = pd.DataFrame(
                {"token": s.str.split(), "n": pdf["cnt"].to_numpy()}
            ).explode("token", ignore_index=True)
            yield (
                out.groupby("token", sort=False)["n"].sum().reset_index()
            )

    allwords = wf.filter(F.length("w") <= _BPE_MAXLEN).select("w", "cnt")
    toks = allwords.mapInPandas(_segment, schema="token STRING, n BIGINT")
    return (
        toks.groupBy("token")
        .agg(F.sum("n").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(_BPE_TOP_TOKENS)
    )


# ----------------- bigram language model (round-10 preview)
#
# text_perplexity_proxy scores documents with a UNIGRAM table — the
# degenerate, dependency-free form of CCNet's LM-perplexity corpus
# ranking (Wenzek et al. 2020 train a small KenLM n-gram model and
# rank Common Crawl by perplexity). This preview is the real first
# step up that ladder: train a Laplace-smoothed BIGRAM model on the
# corpus (lm_train_bigram) and score every document's perplexity
# under it (lm_score_perplexity) — train + apply self-contained, the
# same two-operator story as the BPE pair above, and like it built
# from ONE set of generated ANSI-SQL fragments both engines execute
# (the shared-fragment oracle pattern), so the iterative-free chain
# gets a full value-hash oracle.
#
# Determinism inventory (everything the hash compare depends on):
# tokenization is the engine-exact _BPE_WS split + _BPE_UP/_BPE_LO
# ASCII fold (see those constants for the probe evidence); the
# vocabulary cap breaks ties (count DESC, word ASC); Laplace add-1
# keeps every probability a ratio of INTEGERS, so neg log-probs are
# ln(bigint) - ln(bigint) — cross-engine to the last ulp — and the
# per-doc mean is ORDER-FREE: each pair's neg log-prob is quantized
# to integer 1e-6 ticks and summed as BIGINT (exact, associative;
# ADVICE r11 — avg(double) would depend on partition order and could
# flake the hash on a 4dp boundary), then one double division + exp +
# the floor-form 4dp round (_lm_r4; all values strictly positive so
# the unsigned floor form is exact).
#
# Scale shape: vocab and the bigram table are CAP-BOUNDED —
# ≤ _LM_VOCAB + 1 context rows and ≤ (_LM_VOCAB + 1)² bigram rows no
# matter the corpus — so the model is a broadcastable artifact
# (CCNet ships its model to every worker the same way). The corpus
# appears in exactly three linear passes: the token count behind the
# vocabulary, the bigram count, and the scoring join (model
# broadcast onto the pair stream, then one groupBy doc_id). Hot keys
# (stopwords, '<unk>') land in GROUP BYs with map-side partials, and
# the unk-mapping joins are against the tiny vocab relation —
# broadcast, never a shuffled skew join on term keys.

_LM_VOCAB = 2000  # vocabulary cap (top-V words; everything else <unk>)
_LM_TOPK = 100  # trainer output: top-K bigrams by count


# Floor-form round-to-4dp as shared SQL text for the strictly
# positive LM values (neg log-probs, perplexities) — the one shared
# spelling (r12 hoist; the exact text is load-bearing, see
# functions/rounding.r4_sql's docstring).
_lm_r4 = r4_sql


def _lm_vocab_body(toks: str, cap: int) -> str:
    """Capped vocabulary from a (doc_id, w) token relation.
    Deterministic: ties broken by word ASC."""
    return (
        f"SELECT w FROM (SELECT w, count(*) AS c FROM {toks} "
        f"GROUP BY 1 ORDER BY c DESC, w LIMIT {cap}) v"
    )


def _lm_vs_body(vocab: str) -> str:
    """Smoothing denominator size: |vocab| + 1 (the '<unk>' bucket)."""
    return f"SELECT CAST(count(*) + 1 AS BIGINT) AS vs FROM {vocab}"


def _lm_mpairs_body(pairs: str, vocab: str) -> str:
    """Unk-map both sides of the adjacent-pair relation: a token
    outside the capped vocabulary becomes '<unk>' BEFORE counting —
    standard open-vocabulary n-gram practice, and what bounds the
    model by the cap instead of the corpus."""
    return (
        "SELECT p.doc_id, "
        "CASE WHEN v1.w IS NULL THEN '<unk>' ELSE p.w1 END AS w1, "
        "CASE WHEN v2.w IS NULL THEN '<unk>' ELSE p.w2 END AS w2 "
        f"FROM {pairs} p LEFT JOIN {vocab} v1 ON p.w1 = v1.w "
        f"LEFT JOIN {vocab} v2 ON p.w2 = v2.w"
    )


def _lm_bg_body(mpairs: str) -> str:
    """Bigram counts over the unk-mapped pairs — the model table,
    (cap+1)²-bounded."""
    return (
        "SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_cnt "
        f"FROM {mpairs} GROUP BY 1, 2"
    )


def _lm_ctx_body(bg: str) -> str:
    """Context totals c(w1) — derived from the bigram table (every
    pair occurrence contributes once), cap+1-bounded."""
    return (
        "SELECT w1, CAST(sum(pair_cnt) AS BIGINT) AS ctx_cnt "
        f"FROM {bg} GROUP BY 1"
    )


def _lm_neglogp(vsize: str) -> str:
    """Laplace-smoothed negative log conditional probability,
    -ln P(w2|w1) = ln(c(w1) + V') - ln(c(w1,w2) + 1) — both ln
    arguments are BIGINTs, so the doubles agree cross-engine."""
    return f"ln(ctx_cnt + (SELECT vs FROM {vsize})) - ln(pair_cnt + 1)"


# The /*+ BROADCAST(...) */ hints below are Spark join-strategy hints
# spelled as standard SQL block comments, so the SAME fragment text
# runs on DuckDB (which ignores them). They are load-bearing on the
# Spark side: the model tables come in as materialized ExistingRDD
# views with NO stats, so without the hint Catalyst sort-merge-joins —
# shuffling the corpus-sized pair stream on bigram keys, which are
# stopword-skewed, against a table bounded by the vocab cap. With the
# hint the model broadcasts (≤ (cap+1)² rows by construction; the cap
# sizes the broadcast — raise it past ~10⁴ and this should flip to the
# shuffle join) and the scorer's only corpus shuffle is the final
# per-doc groupBy.


def _lm_train_select(bg: str, ctx: str, vsize: str, topk: int) -> str:
    """Trainer output: the top-K bigrams by count with their counts
    and smoothed neg log-probs. Deterministic: ties by (w1, w2)."""
    return (
        "SELECT /*+ BROADCAST(c) */ b.w1, b.w2, b.pair_cnt, c.ctx_cnt, "
        f"{_lm_r4(_lm_neglogp(vsize))} AS neg_logp "
        f"FROM {bg} b JOIN {ctx} c ON b.w1 = c.w1 "
        f"ORDER BY b.pair_cnt DESC, b.w1, b.w2 LIMIT {topk}"
    )


def _lm_score_select(mpairs: str, bg: str, ctx: str, vsize: str) -> str:
    """Per-document perplexity under the trained model: exp of the
    mean neg log-prob over the doc's (unk-mapped) adjacent pairs.
    Inner joins are total by construction — the model was trained on
    this corpus, so every scored pair exists in it. Documents with
    fewer than two tokens have no bigrams and are (definitionally)
    absent from the output.

    The per-doc mean is ORDER-FREE by construction (ADVICE r11): each
    pair's neg log-prob — already cross-engine exact, ln(bigint) -
    ln(bigint) — is quantized to integer 1e-6 ticks (unsigned floor
    form; the value is strictly positive) and the doc accumulates a
    BIGINT tick sum, which is associative/commutative exactly, unlike
    avg(double) whose result depends on partition order. The mean in
    tick space is then one double division and exp, identical in both
    engines because the integer inputs are identical. The 1e6 tick
    (≲5e7 ticks/pair) keeps even a billion-bigram document well
    inside BIGINT. Accuracy note (ADVICE r12): the ≤0.5e-6 mean-tick
    error propagates through exp() as a RELATIVE ppl error of
    ppl · 5e-7 — for perplexities near the vocab-size ceiling (~2e3)
    that is ~1e-3 absolute, an order ABOVE the 1e-4 output
    granularity. The invariant here is cross-engine EXACTNESS (both
    engines quantize the identical neg log-probs to the identical
    ticks), not absolute fidelity of the 4th decimal to the
    unquantized mean; use 1e9 ticks if that fidelity is ever
    needed."""
    ticks = f"CAST(floor(({_lm_neglogp(vsize)}) * 1e6 + 0.5) AS BIGINT)"
    return (
        "SELECT /*+ BROADCAST(b, c) */ "
        "m.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        f"{_lm_r4(f'exp(sum({ticks}) / (count(*) * 1e6))')} AS ppl "
        f"FROM {mpairs} m JOIN {bg} b ON m.w1 = b.w1 AND m.w2 = b.w2 "
        f"JOIN {ctx} c ON m.w1 = c.w1 "
        "GROUP BY m.doc_id"
    )


def _lm_duckdb_glue(table: str) -> str:
    """DuckDB-side tokenization glue (the engine-specific step): the
    folded, empty-filtered token array, its exploded (doc_id, w) view,
    and the in-row adjacent pairs via the established
    unnest(range(...)) index idiom (empty/1-token arrays yield no
    pairs: range(1, 1) is empty)."""
    fold = (
        f"list_filter(regexp_split_to_array(translate(trim(text), "
        f"'{_BPE_UP}', '{_BPE_LO}'), '{_BPE_WS}'), x -> x <> '')"
    )
    return (
        f"arr AS (SELECT doc_id, {fold} AS a FROM {table}), "
        "toks AS (SELECT doc_id, unnest(a) AS w FROM arr), "
        "idx AS (SELECT doc_id, a, unnest(range(1, greatest(len(a), 1)))"
        " AS i FROM arr), "
        "pairs AS (SELECT doc_id, a[i] AS w1, a[i + 1] AS w2 FROM idx)"
    )


def _lm_oracle_parts(table: str, cap: int) -> str:
    """Shared WITH-chain both oracles build on (glue + model). AS
    MATERIALIZED on the twice-referenced relations for the same
    re-inlining reason as the BPE oracle."""
    return (
        "WITH "
        + _lm_duckdb_glue(table)
        + f", vocab AS MATERIALIZED ({_lm_vocab_body('toks', cap)})"
        + f", vsize AS ({_lm_vs_body('vocab')})"
        + f", mpairs AS MATERIALIZED ({_lm_mpairs_body('pairs', 'vocab')})"
        + f", bg AS MATERIALIZED ({_lm_bg_body('mpairs')})"
        + f", ctx AS ({_lm_ctx_body('bg')}) "
    )


def lm_oracle_sql(
    table: str = "documents", cap: int = _LM_VOCAB, topk: int = _LM_TOPK
) -> str:
    """lm_train_bigram as one DuckDB text, from the shared fragments."""
    return _lm_oracle_parts(table, cap) + _lm_train_select(
        "bg", "ctx", "vsize", topk
    )


def lm_score_oracle_sql(table: str = "documents", cap: int = _LM_VOCAB) -> str:
    """lm_score_perplexity as one DuckDB text, same shared assembly."""
    return _lm_oracle_parts(table, cap) + _lm_score_select(
        "mpairs", "bg", "ctx", "vsize"
    )


_LM_SEQ = _itertools.count()  # per-call temp-view namespace (BPE pattern)


def _lm_run_chain(
    spark: SparkSession, sf_dir: str, cap: int, v: str
) -> None:
    """ONE Spark orchestration for both LM operators: build the token
    and in-row adjacent-pair relations (the engine-glue step — the
    shingle slice/zip_with idiom, zero shuffle), then materialize the
    two cap-bounded model stages (vocab, bigram counts) the generated
    fragments define, under the caller-allocated view prefix.
    Materialization is re-inlining protection, not checkpoint-chain
    survival (this chain is two stages, not ten): without it Spark
    re-expands each CTE reference into a fresh corpus scan. Callers
    drop the views in a finally via _lm_drop_views() — a mid-chain
    failure must not leak catalog views (same rule as the BPE
    chain)."""
    docs = _docs(spark, sf_dir)
    a = F.filter(
        F.split(F.translate(F.trim("text"), _BPE_UP, _BPE_LO), _BPE_WS),
        lambda x: x != F.lit(""),
    )
    docs.select("doc_id", F.explode(a).alias("w")).createOrReplaceTempView(
        f"{v}_toks"
    )
    # r16 single-evaluation shape for the pairs view: `a` (an O(len)
    # split+filter scan) was referenced five times by the pair
    # expression (two slices, and size(a) behind each slice's length
    # term) — CollapseProject inlined the scan into every site. A
    # first Generate (explode(array(a))) materializes the token array
    # once per row as a bound attribute (a Project cannot be collapsed
    # into a Generate's input — the same barrier gopher_rules_frame
    # uses); the pair zip_with then reads the attribute. Values are
    # identical: the pair expression is unchanged, only its shared
    # subterm is evaluated once.
    aa = F.col("a")
    n = F.greatest(F.size(aa) - 1, F.lit(0))
    pair = F.zip_with(
        F.slice(aa, 1, n),
        F.slice(aa, 2, n),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    (
        docs.select("doc_id", F.explode(F.array(a)).alias("a"))
        .select("doc_id", F.explode(pair).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
        .createOrReplaceTempView(f"{v}_pairs")
    )
    _materialize(
        spark.sql(_lm_vocab_body(f"{v}_toks", cap))
    ).createOrReplaceTempView(f"{v}_vocab")
    _materialize(
        spark.sql(
            f"WITH mpairs AS ({_lm_mpairs_body(f'{v}_pairs', f'{v}_vocab')}) "
            + _lm_bg_body("mpairs")
        )
    ).createOrReplaceTempView(f"{v}_bg")


def _lm_drop_views(spark: SparkSession, v: str) -> None:
    """Drop one LM chain's temp views — finally-safe on a partially
    built chain (dropTempView on a never-registered name returns
    False, no raise), and safe AFTER the result DataFrame is built
    (spark.sql resolves views eagerly at analysis)."""
    for name in (f"{v}_toks", f"{v}_pairs", f"{v}_vocab", f"{v}_bg"):
        spark.catalog.dropTempView(name)


@register(
    "lm_train_bigram",
    survey="north-star text tier: bigram language-model TRAINING — the "
    "learned-model half of CCNet's LM-perplexity corpus ranking "
    "(Wenzek et al. 2020 train a small KenLM n-gram model and rank "
    "Common Crawl by perplexity); Laplace add-1 smoothing keeps every "
    "probability a ratio of BIGINTs so the neg log-probs hash "
    "cross-engine, and the (cap+1)²-bounded model table is a "
    "broadcastable artifact",
    oracle=lm_oracle_sql("documents"),
)
def lm_train_bigram(
    spark: SparkSession,
    sf_dir: str,
    cap: int = _LM_VOCAB,
    topk: int = _LM_TOPK,
) -> DataFrame:
    """Train a Laplace-smoothed bigram LM on the documents corpus and
    emit the top-K bigrams with their counts and smoothed neg
    log-probs — the model-table half of the CCNet-style perplexity
    ranking story. Round-10 preview promoted in round 11. Output:
    (w1, w2, pair_cnt, ctx_cnt, neg_logp)."""
    v = f"__lm{next(_LM_SEQ)}"
    try:
        _lm_run_chain(spark, sf_dir, cap, v)
        return spark.sql(
            f"WITH ctx AS ({_lm_ctx_body(f'{v}_bg')}), "
            f"vsize AS ({_lm_vs_body(f'{v}_vocab')}) "
            + _lm_train_select(f"{v}_bg", "ctx", "vsize", topk)
        )
    finally:
        _lm_drop_views(spark, v)


@register(
    "lm_score_perplexity",
    survey="north-star text tier: bigram language-model SCORING — "
    "per-document perplexity under the LM trained on the corpus "
    "itself (train + apply self-contained, the BPE pair's two-operator "
    "story); the learned upgrade of text_perplexity_proxy's unigram "
    "cross-entropy, i.e. the signal CCNet filters Common Crawl with; "
    "model broadcast onto the pair stream, ONE corpus shuffle (the "
    "per-doc groupBy)",
    oracle=lm_score_oracle_sql("documents"),
)
def lm_score_perplexity(
    spark: SparkSession, sf_dir: str, cap: int = _LM_VOCAB
) -> DataFrame:
    """Score every document's perplexity under the bigram LM trained
    on the corpus itself (train + apply self-contained) — the learned
    upgrade of text_perplexity_proxy's unigram cross-entropy, and the
    quality signal CCNet ranks Common Crawl with. Round-10 preview
    promoted in round 11. Output: (doc_id, n_bigrams, ppl);
    docs with <2 tokens have no bigrams and are absent."""
    v = f"__lm{next(_LM_SEQ)}"
    try:
        _lm_run_chain(spark, sf_dir, cap, v)
        return spark.sql(
            f"WITH mpairs AS ({_lm_mpairs_body(f'{v}_pairs', f'{v}_vocab')}), "
            f"ctx AS ({_lm_ctx_body(f'{v}_bg')}), "
            f"vsize AS ({_lm_vs_body(f'{v}_vocab')}) "
            + _lm_score_select("mpairs", f"{v}_bg", "ctx", "vsize")
        )
    finally:
        _lm_drop_views(spark, v)



# ---------------- CCNet head/middle/tail split (round-12 preview)
#
# The step CCNet actually FILTERS with (Wenzek et al. 2020 §4.3):
# rank every document by its LM perplexity WITHIN ITS LANGUAGE and
# cut the corpus into three equal buckets — head (lowest perplexity,
# cleanest), middle, tail (usually discarded or down-sampled). This
# completes the catalog's CCNet arc: lm_train_bigram (train) →
# lm_score_perplexity (score) → lm_ppl_buckets (rank + split).
#
# Determinism: the per-doc ppl is already order-free (the r12
# tick-sum rework) and 4dp-rounded, ties broken by doc_id, and
# ntile(3) follows the SQL-standard fill (the first n mod 3 buckets
# take the extra row) in both engines — so the bucket assignment is
# a pure function of the corpus and hashes cross-engine.
#
# Scale shape: the scorer's shape (model broadcast + one per-doc
# groupBy) plus ONE window partitioned by lang. A per-language ntile
# sorts each language partition — exactly what CCNet does (their
# per-language shards ARE this sort); at 100 TB with few giant
# languages, swap the exact ntile for two approx_percentile cutpoints
# per lang (computed in one groupBy pass and broadcast back) — same
# bucket semantics at a tolerance, sort-free; the exact form below is
# the oracle-matching reference. Registered r13 (r12 preview).

_PPL_BUCKETS = 3  # head / middle / tail


def _ppl_label_case(nb: int) -> str:
    """Bucket label as a function of the PARAMETRIC bucket count:
    bucket 1 is always 'head', bucket nb always 'tail', everything
    between 'middle' (at nb=1 the first branch wins — a single bucket
    is all head; at nb=2 there is no middle). A hardcoded 3-way CASE
    here would silently mislabel any nb≠3 run in BOTH engines at once
    — invisible to the cross-engine compare (review r12)."""
    return (
        "CASE WHEN ppl_bucket = 1 THEN 'head' "
        f"WHEN ppl_bucket = {nb} THEN 'tail' ELSE 'middle' END"
    )


def _lm_buckets_select(scores: str, docs: str, nb: int) -> str:
    """Shared final select: join the scored docs to their language and
    ntile within lang by (ppl, doc_id)."""
    return (
        "SELECT doc_id, lang, ppl, CAST(ppl_bucket AS INTEGER) AS ppl_bucket, "
        f"{_ppl_label_case(nb)} AS bucket_label FROM ("
        "SELECT s.doc_id, d.lang, s.ppl, "
        f"ntile({nb}) OVER (PARTITION BY d.lang "
        "ORDER BY s.ppl, s.doc_id) AS ppl_bucket "
        f"FROM {scores} s JOIN {docs} d ON s.doc_id = d.doc_id) t"
    )


def lm_buckets_oracle_sql(
    table: str = "documents", cap: int = _LM_VOCAB, nb: int = _PPL_BUCKETS
) -> str:
    """lm_ppl_buckets as one DuckDB text — the shared LM chain, the
    scorer as a CTE, then the per-language ntile."""
    return (
        _lm_oracle_parts(table, cap)
        + f", scores AS ({_lm_score_select('mpairs', 'bg', 'ctx', 'vsize')}) "
        + _lm_buckets_select("scores", table, nb)
    )


@register(
    "lm_ppl_buckets",
    oracle=lm_buckets_oracle_sql(),
    survey="north-star: CCNet head/middle/tail corpus split "
    "(per-language perplexity ntile over the bigram-LM scores)",
)
def lm_ppl_buckets(
    spark: SparkSession,
    sf_dir: str,
    cap: int = _LM_VOCAB,
    nb: int = _PPL_BUCKETS,
) -> DataFrame:
    """CCNet-style corpus split: rank every scoreable document by its
    bigram-LM perplexity within its language and ntile into head /
    middle / tail (registered r13; r12 preview). Output: (doc_id,
    lang, ppl, ppl_bucket, bucket_label); docs with <2 tokens have no
    perplexity and are absent (the scorer's contract)."""
    v = f"__lm{next(_LM_SEQ)}"
    try:
        _lm_run_chain(spark, sf_dir, cap, v)
        docs = _docs(spark, sf_dir)
        docs.select("doc_id", "lang").createOrReplaceTempView(f"{v}_docs")
        return spark.sql(
            f"WITH mpairs AS ({_lm_mpairs_body(f'{v}_pairs', f'{v}_vocab')}), "
            f"ctx AS ({_lm_ctx_body(f'{v}_bg')}), "
            f"vsize AS ({_lm_vs_body(f'{v}_vocab')}), "
            f"scores AS ({_lm_score_select('mpairs', f'{v}_bg', 'ctx', 'vsize')}) "
            + _lm_buckets_select("scores", f"{v}_docs", nb)
        )
    finally:
        _lm_drop_views(spark, v)
        spark.catalog.dropTempView(f"{v}_docs")


# ---------------- Kneser-Ney bigram trainer (round-13 preview)
#
# The smoothing upgrade every n-gram LM stack eventually ships:
# interpolated Kneser-Ney (Kneser & Ney 1995; the KenLM default that
# CCNet's filtering models actually use) replaces Laplace add-1 with
# absolute discounting plus a CONTINUATION-count backoff —
#
#   P_kn(w2|w1) = (c(w1,w2) − d)/c(w1)
#               + d · N1+(w1,·)/c(w1) · N1+(·,w2)/N1+(·,·)
#
# with d = 0.75 (exact in binary, so the discounted numerator is an
# exact double). Every quantity is an integer aggregate of the SAME
# (cap+1)²-bounded bigram table the Laplace trainer builds — forward
# fan-out N1+(w1,·), backward fan-in N1+(·,w2), distinct-bigram total
# N1+(·,·) — so the whole KN computation runs on model-table-sized
# relations after the one corpus pass the shared chain already pays.
# P_kn sums to exactly 1 over the vocabulary per context (the
# discount mass d·N1+(w1,·) is exactly the mass the continuation term
# redistributes) — pinned as a test invariant.
#
# Determinism: all inputs BIGINT; the formula is one shared SQL text,
# so both engines evaluate the identical parse tree over identical
# integers; rounded floor-form 4dp (strictly positive). Scale shape:
# the corpus pass is the chain's (shared with lm_train_bigram); the
# KN joins/aggregates are all cap-bounded, with the one-row N1+(·,·)
# total the accounted single-partition merge (the vsize shape).
# Registered r13 (the register call follows the builder below).

# The discount, exact in binary (2^-1 + 2^-2). The CAST is
# load-bearing on the Spark side (the r4_sql lesson): Spark parses a
# bare 0.75 literal as DECIMAL(3,2), silently pulling the whole P_kn
# expression into HALF_UP decimal arithmetic whose rounding diverges
# from DuckDB's double math — caught as a 1-tick ppl flip when the
# KN scorer's tick sum first ran cross-engine.
_KN_DISCOUNT = "CAST(0.75 AS DOUBLE)"


def _lm_kn_parts(bg: str) -> str:
    """The three continuation-count relations over a bigram table —
    ONE shared text for both engines."""
    return (
        f"n1f AS (SELECT w1, CAST(count(*) AS BIGINT) AS fanout "
        f"FROM {bg} GROUP BY 1), "
        f"n1b AS (SELECT w2, CAST(count(*) AS BIGINT) AS fanin "
        f"FROM {bg} GROUP BY 1), "
        f"nall AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {bg})"
    )


def _lm_kn_select(bg: str, ctx: str, topk: int) -> str:
    """KN trainer output: top-K bigrams by count with the discounted
    + continuation-interpolated probability. Ties by (w1, w2); the
    BROADCAST hints ride the cap-bounded model tables (DuckDB ignores
    them, same convention as the Laplace trainer)."""
    d = _KN_DISCOUNT
    pkn = (
        f"(b.pair_cnt - {d}) / c.ctx_cnt"
        f" + {d} * f.fanout / c.ctx_cnt * i.fanin / a.n"
    )
    return (
        "SELECT /*+ BROADCAST(c, f, i, a) */ "
        "b.w1, b.w2, b.pair_cnt, c.ctx_cnt, f.fanout, i.fanin, "
        f"{_lm_r4(pkn)} AS pkn "
        f"FROM {bg} b "
        f"JOIN {ctx} c ON b.w1 = c.w1 "
        f"JOIN n1f f ON b.w1 = f.w1 "
        f"JOIN n1b i ON b.w2 = i.w2 "
        f"CROSS JOIN nall a "
        f"ORDER BY b.pair_cnt DESC, b.w1, b.w2 LIMIT {topk}"
    )


def lm_kn_oracle_sql(
    table: str = "documents", cap: int = _LM_VOCAB, topk: int = _LM_TOPK
) -> str:
    """lm_train_kneser_ney as one DuckDB text — the shared LM chain
    plus the shared KN fragments."""
    return (
        _lm_oracle_parts(table, cap)
        + f", {_lm_kn_parts('bg')} "
        + _lm_kn_select("bg", "ctx", topk)
    )


def lm_train_kneser_ney(
    spark: SparkSession,
    sf_dir: str,
    cap: int = _LM_VOCAB,
    topk: int = _LM_TOPK,
) -> DataFrame:
    """Train an interpolated Kneser-Ney bigram LM on the documents
    corpus and emit the top-K bigrams with counts, continuation
    counts, and P_kn (registered r13; r13 preview). Output: (w1, w2,
    pair_cnt, ctx_cnt, fanout, fanin, pkn)."""
    v = f"__lm{next(_LM_SEQ)}"
    try:
        _lm_run_chain(spark, sf_dir, cap, v)
        return spark.sql(
            f"WITH ctx AS ({_lm_ctx_body(f'{v}_bg')}), "
            + _lm_kn_parts(f"{v}_bg")
            + " "
            + _lm_kn_select(f"{v}_bg", "ctx", topk)
        )
    finally:
        _lm_drop_views(spark, v)


# r13 promotion of the r13 preview — register call after the builder
# (this module defines oracles before builders, unlike textops).
register(
    "lm_train_kneser_ney",
    oracle=lm_kn_oracle_sql(),
    survey="north-star: interpolated Kneser-Ney bigram LM trainer "
    "(continuation counts over the shared LM chain)",
)(lm_train_kneser_ney)


# ---------------- Kneser-Ney scorer (round-13 preview, pair of the
# KN trainer above — the same train→score arc as the Laplace pair)
#
# Per-document perplexity under the KN model trained on the corpus
# itself. Inner joins are total by construction (the model was
# trained on this corpus, so every scored pair exists in the bigram
# table — the lm_score_perplexity argument verbatim), which also
# means the backoff-only branch for UNSEEN pairs never fires here:
# scoring held-out text would need it (and a fanin=0 continuation
# floors at probability 0 — the standard reason held-out KN scoring
# interpolates with a unigram floor). Determinism: p_kn is one shared
# expression over BIGINTs (identical doubles both engines), -ln of it
# quantizes to integer 1e-6 ticks, the per-doc mean is the order-free
# BIGINT tick sum (the ADVICE-r11 rework's pattern, applied from
# birth). Scale shape: the scorer's (model broadcast + one per-doc
# groupBy) with the KN continuation tables riding the same broadcast.
# Registered r13 (the register call follows the builder below).


def _lm_kn_neglogp() -> str:
    """-ln P_kn(w2|w1) over the joined (m, b, c, f, i, a) aliases —
    ONE shared text (note: >= 0; == 0 only in the degenerate
    single-continuation corpus where P_kn == 1)."""
    d = _KN_DISCOUNT
    return (
        f"-ln((b.pair_cnt - {d}) / c.ctx_cnt"
        f" + {d} * f.fanout / c.ctx_cnt * i.fanin / a.n)"
    )


def _lm_kn_score_select(mpairs: str, bg: str, ctx: str) -> str:
    """Per-document KN perplexity: exp of the tick-sum mean of the
    pairwise -ln P_kn."""
    ticks = f"CAST(floor(({_lm_kn_neglogp()}) * 1e6 + 0.5) AS BIGINT)"
    return (
        "SELECT /*+ BROADCAST(b, c, f, i, a) */ "
        "m.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        f"{_lm_r4(f'exp(sum({ticks}) / (count(*) * 1e6))')} AS ppl_kn "
        f"FROM {mpairs} m "
        f"JOIN {bg} b ON m.w1 = b.w1 AND m.w2 = b.w2 "
        f"JOIN {ctx} c ON m.w1 = c.w1 "
        f"JOIN n1f f ON m.w1 = f.w1 "
        f"JOIN n1b i ON m.w2 = i.w2 "
        f"CROSS JOIN nall a "
        "GROUP BY m.doc_id"
    )


def lm_kn_score_oracle_sql(
    table: str = "documents", cap: int = _LM_VOCAB
) -> str:
    """lm_score_kneser_ney as one DuckDB text — the shared chain, the
    shared KN continuation fragments, the shared scorer select."""
    return (
        _lm_oracle_parts(table, cap)
        + f", {_lm_kn_parts('bg')} "
        + _lm_kn_score_select("mpairs", "bg", "ctx")
    )


def lm_score_kneser_ney(
    spark: SparkSession, sf_dir: str, cap: int = _LM_VOCAB
) -> DataFrame:
    """Score every document's perplexity under the KN bigram model
    trained on the corpus itself (train + apply self-contained, the
    KN sibling of lm_score_perplexity; registered r13, r13 preview).
    Output: (doc_id, n_bigrams, ppl_kn); docs with <2 tokens are
    absent."""
    v = f"__lm{next(_LM_SEQ)}"
    try:
        _lm_run_chain(spark, sf_dir, cap, v)
        return spark.sql(
            f"WITH mpairs AS ({_lm_mpairs_body(f'{v}_pairs', f'{v}_vocab')}), "
            f"ctx AS ({_lm_ctx_body(f'{v}_bg')}), "
            + _lm_kn_parts(f"{v}_bg")
            + " "
            + _lm_kn_score_select("mpairs", f"{v}_bg", "ctx")
        )
    finally:
        _lm_drop_views(spark, v)


# r13 promotion of the r13 preview — register call after the builder.
register(
    "lm_score_kneser_ney",
    oracle=lm_kn_score_oracle_sql(),
    survey="north-star: per-document Kneser-Ney perplexity scoring "
    "(order-free tick-sum mean, model broadcast)",
)(lm_score_kneser_ney)
