"""bpe_train_merges (round-9 preview): differential tests.

The trainer's one nontrivial claim is that its relational merge step
equals BPE's greedy leftmost non-overlapping merge (Sennrich et al.
2016) — including the same-symbol-run overlap case where a string
replace() loop diverges (see the module comment in tokenizers.py). These
tests pin the whole trainer, both engines, against an independent
Python implementation of the standard algorithm:

1. Spark pipeline vs Python on synthetic corpora built to stress the
   merge rule (same-symbol runs, alternations, ties);
2. the generated DuckDB oracle text vs Python on the same corpora;
3. Spark vs DuckDB, row-exact, on the real sf0.001 documents table.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from nyc_traffic_insight_spark.queries.tokenizers import (
    _BPE_MAXLEN,
    _BPE_MERGES,
    _BPE_VOCAB,
    bpe_oracle_sql,
    bpe_train_merges,
)


# ASCII-only case fold matching tokenizers._BPE_UP/_BPE_LO: Python's
# str.lower() full-Unicode case map diverges from DuckDB's utf8proc on
# edges like U+0130 'İ' (see the _BPE_UP comment in tokenizers.py), so
# the reference folds A-Z only, exactly like both engines' translate()
_ASCII_FOLD = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def _bpe_wf_ref(texts):
    """Reference word-frequency table: ASCII case fold + explicit
    ASCII whitespace split, matching _BPE_UP/_BPE_LO and _BPE_WS
    (Python's str \\s would add unicode whitespace the engines don't
    split on; no strip() — str.strip() removes unicode whitespace the
    engines' trim() keeps, and split-plus-drop-empties already
    handles ASCII edges)."""
    return Counter(
        w
        for t in texts
        for w in re.split("[ \t\n\r\x0b\f]+", t.translate(_ASCII_FOLD))
        if w
    )


def _bpe_ref(texts, maxlen=None, vocab_cap=None, merges=None):
    """Independent reference: standard BPE training on word
    frequencies with greedy leftmost non-overlapping merges."""
    maxlen = maxlen or _BPE_MAXLEN
    vocab_cap = vocab_cap or _BPE_VOCAB
    merges = merges or _BPE_MERGES
    wf = _bpe_wf_ref(texts)
    vocab = sorted(
        ((w, c) for w, c in wf.items() if len(w) <= maxlen),
        key=lambda x: (-x[1], x[0]),
    )[:vocab_cap]
    spellings = {w: list(w) + ["</w>"] for w, _ in vocab}
    freqs = dict(vocab)
    out = []
    for rank in range(1, merges + 1):
        stats: Counter = Counter()
        for w, syms in spellings.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += freqs[w]
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        out.append((rank, a, b, a + b, cnt))
        for w, syms in spellings.items():
            merged = []
            i = 0
            while i < len(syms):  # greedy leftmost non-overlap
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            spellings[w] = merged
    return out


# corpora chosen to force the hard merge cases: same-symbol runs of
# odd/even length (the replace()-divergence case), alternations whose
# occurrences share separators, count ties resolved lexicographically,
# and words at/over the length cap
CORPORA = {
    "runs": ["aaaa aaa aaaaaa b", "aaaa aaaa c aaa"],
    "alternation": ["abab ababab abababab", "ab ab abab"],
    "ties": ["xy xy uv uv", "xy uv"],
    "mixed": [
        "the quick brown fox jumps over the lazy dog",
        "the the the quick quick fox",
        "a" * (_BPE_MAXLEN + 5) + " within limit",
    ],
    # substr(word, pos, 1) must be CHARACTER-based on both engines
    # (2-/3-/4-byte code points), mirroring the CDC unicode pinning
    "unicode": ["héllo héllo wörld 汉字汉字 🚀🚀🚀", "héllo 汉字 🚀"],
    # \x0B (vertical tab) is whitespace to Java's \s but NOT to
    # RE2's — the review-found engine divergence _BPE_WS exists to
    # close; in an iterative trainer one differing word flips an
    # argmax and cascades. All three engines must split it.
    "ws_edge": ["foo\x0bbar foo bar", "a\x0ba\fb\tb\rc\nc"],
    # full-Unicode lower() diverges across the three engines (DuckDB's
    # utf8proc maps in-context U+0130 'İ' to plain 'i'; Java and
    # Python emit 'i' + combining U+0307) — the ADVICE-r8 exposure the
    # ASCII-only translate() fold (_BPE_UP/_BPE_LO) exists to close.
    # These words pin that non-ASCII case stays UNfolded identically
    # on all three engines: İ in-context and alone, ß (whose upcase
    # 'SS' round-trip is asymmetric), and Σ/ς (final-sigma context
    # sensitivity).
    "casefold": [
        "İstanbul İSTANBUL istanbul İ MİX",
        "STRASSE straße ßß ß",
        "ΣΥΡΙΖΑ σύριζα Σ ς ΒΑΣΙΣ",
    ],
}


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_oracle_sql_matches_python_reference(name):
    import duckdb

    texts = CORPORA[name]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?)", [(t,) for t in texts])
    got = con.sql(bpe_oracle_sql("docs")).fetchall()
    assert got == _bpe_ref(texts), name


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_spark_matches_python_reference(spark, name, tmp_path):
    import pandas as pd

    texts = CORPORA[name]
    sf_dir = tmp_path / f"sf_bpe_{name}"
    sf_dir.mkdir()
    pd.DataFrame(
        {"doc_id": range(len(texts)), "source": "t", "text": texts}
    ).to_parquet(sf_dir / "documents.parquet")
    got = [
        (r["rank"], r["left_sym"], r["right_sym"], r["merged"], r["cnt"])
        for r in bpe_train_merges(spark, str(sf_dir)).collect()
    ]
    assert got == _bpe_ref(texts), name


def test_spark_matches_duckdb_on_testdata(spark):
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import duck_connect

    got = [
        (r["rank"], r["left_sym"], r["right_sym"], r["merged"], r["cnt"])
        for r in bpe_train_merges(spark, SF_SMOKE).collect()
    ]
    con = duck_connect(SF_SMOKE)  # keep the ref: GC closes the conn
    want = con.sql(bpe_oracle_sql("documents")).fetchall()
    assert got == want
    assert len(got) == _BPE_MERGES  # real corpus never drains the pairs


def test_random_corpora_match_python_reference():
    """Randomized DuckDB-vs-Python sweep over a tiny alphabet (dense
    runs and ties — the adversarial regime for the merge rule)."""
    import random

    import duckdb

    rng = random.Random(17)
    for trial in range(8):
        texts = [
            " ".join(
                "".join(
                    rng.choice("aab") for _ in range(rng.randint(1, 12))
                )
                for _ in range(rng.randint(3, 25))
            )
            for _ in range(rng.randint(1, 4))
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE docs(text VARCHAR)")
        con.executemany(
            "INSERT INTO docs VALUES (?)", [(t,) for t in texts]
        )
        got = con.sql(bpe_oracle_sql("docs")).fetchall()
        assert got == _bpe_ref(texts), (trial, texts)


def test_empty_and_drained_corpora_agree_across_engines(spark, tmp_path):
    """Engine agreement on the degenerate paths: an empty corpus emits
    zero merges, and a corpus whose pair table drains before
    _BPE_MERGES iterations emits exactly the drained count — both
    engines must agree on the short row count (the UNION ALL arms over
    empty best-tables are empty in both)."""
    import pandas as pd

    from tests.oracle_utils import duck_connect

    cases = {
        "empty": [],
        # one repeated 2-char word: [a, b, </w>] fully merges in 2
        # steps, then the pair table drains
        "drained": ["ab ab ab"],
    }
    for name, texts in cases.items():
        sf_dir = tmp_path / f"sf_bpe_{name}"
        sf_dir.mkdir()
        pd.DataFrame(
            {
                "doc_id": pd.array(range(len(texts)), dtype="int64"),
                "source": pd.array(["t"] * len(texts), dtype="string"),
                "text": pd.array(texts, dtype="string"),
            }
        ).to_parquet(sf_dir / "documents.parquet")
        got = [
            (r["rank"], r["left_sym"], r["right_sym"], r["merged"], r["cnt"])
            for r in bpe_train_merges(spark, str(sf_dir)).collect()
        ]
        con = duck_connect(str(sf_dir))
        want = con.sql(bpe_oracle_sql("documents")).fetchall()
        assert got == want == _bpe_ref(texts), name
        assert len(got) < _BPE_MERGES  # genuinely exercised the drain
        # the ENCODE chain must survive the drain (the empty best-table
        # left-join pass-through — a cross join here wiped the state)
        from nyc_traffic_insight_spark.queries.tokenizers import (
            bpe_encode_oracle_sql,
            bpe_encode_top_tokens,
        )

        enc = [
            (r["token"], r["n_occurrences"])
            for r in bpe_encode_top_tokens(spark, str(sf_dir)).collect()
        ]
        enc_want = con.sql(bpe_encode_oracle_sql("documents")).fetchall()
        assert enc == enc_want == _bpe_encode_ref(texts), name
        if name == "drained":  # fully merged single word survives
            assert enc == [("ab</w>", 3)]


def _bpe_encode_ref(texts, top_k=None):
    """Reference application: train via _bpe_ref's algorithm, then
    segment EVERY word (len <= cap, no vocab cap) with the learned
    merges in rank order; return top-k (token, count)."""
    from nyc_traffic_insight_spark.queries.tokenizers import _BPE_TOP_TOKENS

    top_k = top_k or _BPE_TOP_TOKENS
    wf = _bpe_wf_ref(texts)
    merges = [(a, b) for _, a, b, _, _ in _bpe_ref(texts)]
    counts: Counter = Counter()
    for w, freq in wf.items():
        if len(w) > _BPE_MAXLEN:
            continue
        syms = list(w) + ["</w>"]
        for a, b in merges:
            merged = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        for s in syms:
            counts[s] += freq
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_encode_oracle_matches_python_reference(name):
    import duckdb

    from nyc_traffic_insight_spark.queries.tokenizers import bpe_encode_oracle_sql

    texts = CORPORA[name]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?)", [(t,) for t in texts])
    got = con.sql(bpe_encode_oracle_sql("docs")).fetchall()
    assert got == _bpe_encode_ref(texts), name


def test_encode_spark_matches_duckdb_on_testdata(spark):
    from nyc_traffic_insight_spark.queries.tokenizers import (
        bpe_encode_oracle_sql,
        bpe_encode_top_tokens,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_utils import duck_connect

    got = [
        (r["token"], r["n_occurrences"])
        for r in bpe_encode_top_tokens(spark, SF_SMOKE).collect()
    ]
    con = duck_connect(SF_SMOKE)
    want = con.sql(bpe_encode_oracle_sql("documents")).fetchall()
    assert got == want
    # the learned subwords really took over the top of the histogram:
    # multi-char tokens must appear (pure chars would mean no merge
    # ever applied)
    assert any(len(t.replace("</w>", "x")) > 1 for t, _ in got)


def test_merge_body_fuzz_vs_greedy_fold():
    """Unit-level fuzz of the single hardest fragment — the relational
    greedy-merge body (_bpe_merge_body's run-parity rule) — against
    the Python greedy fold, in isolation and at much higher case
    density than the end-to-end sweeps: 400 random symbol sequences ×
    random pairs over a 2-symbol alphabet (maximum run/overlap
    density), executed via DuckDB on a hand-built symbol table."""
    import random

    import duckdb

    from nyc_traffic_insight_spark.queries.tokenizers import _bpe_merge_body

    rng = random.Random(23)
    rows = []
    expected = {}
    for wid in range(400):
        n = rng.randint(1, 14)
        syms = [rng.choice("ab") for _ in range(n)]
        a, b = rng.choice([("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")])
        word = f"w{wid}|{a}{b}"  # pair rides in the key: one query
        rows += [(word, 1, p + 1, s) for p, s in enumerate(syms)]
        merged = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        expected[word] = merged
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE symtab(word VARCHAR, freq BIGINT, pos INT, sym VARCHAR)"
    )
    con.executemany("INSERT INTO symtab VALUES (?,?,?,?)", rows)
    # one merge body per pair value, filtered to that pair's words
    for a, b in [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]:
        con.execute("CREATE OR REPLACE TABLE best(left_sym VARCHAR, right_sym VARCHAR, cnt BIGINT)")
        con.execute("INSERT INTO best VALUES (?,?,1)", [a, b])
        got: dict[str, list] = {}
        for word, pos, sym in con.sql(
            "SELECT word, pos, sym FROM ("
            + _bpe_merge_body(
                f"(SELECT * FROM symtab WHERE word LIKE '%|{a}{b}')",
                "best",
            )
            + ") m ORDER BY word, pos"
        ).fetchall():
            got.setdefault(word, []).append(sym)
        for word, want in expected.items():
            if word.endswith(f"|{a}{b}"):
                assert got.get(word, []) == want, (word, a, b)


def test_string_replace_fold_matches_list_fold_fuzz():
    """r15 encode rework pin: on the token-delimited rendering
    (_bpe_render), a chain of non-regex str.replace calls (_bpe_pats)
    must equal the greedy leftmost non-overlapping list fold for every
    merge chain — including the a = b equal-symbol-run parity cases
    the relational merge body needed gaps-and-islands for."""
    import random

    from nyc_traffic_insight_spark.queries.tokenizers import (
        _bpe_pats,
        _bpe_render,
        _bpe_train_local,
    )

    rng = random.Random(1509)

    def list_fold(word, merges):
        syms = list(word) + ["</w>"]
        for _, a, b, _, _ in merges:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        return syms

    def str_fold(word, pats):
        s = _bpe_render(word)
        for pat, rep in pats:
            s = s.replace(pat, rep)
        return s.split()

    # deterministic worst-cases first: odd/even equal runs, full merge
    explicit = ["a", "aa", "aaa", "aaaa", "aaaaa", "ab", "abab", "aab"]
    for trial in range(200):
        if trial < len(explicit):
            words = [explicit[trial]]
        else:
            words = [
                "".join(
                    rng.choice("aab") for _ in range(rng.randint(1, 12))
                )
                for _ in range(rng.randint(1, 20))
            ]
        vocab = [(w, rng.randint(1, 9)) for w in sorted(set(words))]
        merges = _bpe_train_local(vocab)
        pats = _bpe_pats(merges)
        for w, _ in vocab:
            assert str_fold(w, pats) == list_fold(w, merges), (w, merges)
