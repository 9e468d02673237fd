"""Guard the round-11 tokenizers.py extraction (a pure file-move).

The BPE trainer/encoder and bigram-LM fragment builders are the most
delicate generated-SQL code in the catalog (differentially fuzzed,
byte-anchored). Moving them out of textops.py must not change a single
byte of the generated oracle texts — these sha256 pins were recorded
from the PRE-move textops.py and asserted equal across the move. If
you change the generators DELIBERATELY (new cap, new fragment), update
the pins in the same commit and say so; an unexpected diff here means
the move/edit silently altered the shared cross-engine SQL.
"""

from __future__ import annotations

import hashlib

from nyc_traffic_insight_spark.queries import load_all
from nyc_traffic_insight_spark.queries import tokenizers as tk

# sha256 of each generator's output for the canonical "documents" table,
# recorded from the pre-move textops.py (round 11).
PINS = {
    "bpe_oracle_sql": (
        "64fb50581025717543e0e2ecee26364fbe89f27ffd54b93a7725d3e052df7f92"
    ),
    "bpe_encode_oracle_sql": (
        "3542914cd5432d9ef2612d3a9e7bb5837b994944a7a934a7a6693a97b2ba7dbe"
    ),
    "lm_oracle_sql": (
        "79aea95cd798be7221da2367f0bb58ea05eeaaf1420e691e588284f3147052b8"
    ),
    # updated round 12: _lm_score_select switched the per-doc mean to
    # the order-free integer-tick sum (ADVICE r11) — deliberate change,
    # new pin recorded in the same commit
    "lm_score_oracle_sql": (
        "c64f1c9ecd0cce90964cab677e7737877358ecf4219d1e4c542cb9da1665f8e6"
    ),
}


def _sha(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()


def test_generated_oracle_texts_unchanged_by_move():
    got = {
        "bpe_oracle_sql": tk.bpe_oracle_sql("documents"),
        "bpe_encode_oracle_sql": tk.bpe_encode_oracle_sql("documents"),
        "lm_oracle_sql": tk.lm_oracle_sql("documents"),
        "lm_score_oracle_sql": tk.lm_score_oracle_sql("documents"),
    }
    bad = {k: _sha(v) for k, v in got.items() if _sha(v) != PINS[k]}
    assert not bad, (
        "generated oracle SQL changed (deliberate? update PINS in the "
        f"same commit): {bad}"
    )


def test_registered_oracles_come_from_the_generators():
    """The registry must carry exactly the generator outputs — a drift
    between the @register literal and the generator would let Spark and
    DuckDB run different fragments."""
    specs = load_all()
    assert specs["bpe_train_merges"].oracle == tk.bpe_oracle_sql("documents")
    assert specs["bpe_encode_top_tokens"].oracle == tk.bpe_encode_oracle_sql(
        "documents"
    )
    assert specs["lm_train_bigram"].oracle == tk.lm_oracle_sql("documents")
    assert specs["lm_score_perplexity"].oracle == tk.lm_score_oracle_sql(
        "documents"
    )


def test_move_left_no_tokenizer_symbols_in_textops():
    """Pure move, not a copy: textops must not retain a second
    definition of any moved symbol (two definitions would drift)."""
    from nyc_traffic_insight_spark.queries import textops

    moved = [
        "vocab_top_ngrams",
        "text_bpe_pair_counts",
        "text_oov_rate",
        "bpe_train_merges",
        "bpe_encode_top_tokens",
        "lm_train_bigram",
        "lm_score_perplexity",
        "bpe_oracle_sql",
        "lm_oracle_sql",
        "_BPE_WS",
        "_LM_VOCAB",
    ]
    leftovers = [n for n in moved if hasattr(textops, n)]
    assert not leftovers, f"still defined in textops: {leftovers}"
    present = [n for n in moved if not hasattr(tk, n)]
    assert not present, f"missing from tokenizers: {present}"
