"""Driver-style verification of the UNREGISTERED previews.

The registered catalog has tools/verify_rotation.py; this is the same
compare for the current round's preview operators — the ones whose
@register lands next round. Running it at the gate SF (sf0.01, plus
sf0.1 for the order-dependence class) BEFORE promotion means the
promotion commit is a decorator, never a debugging session.

The PREVIEWS list is per-round by nature: entries move OUT when they
are promoted (they then appear in verify_rotation's sweep) and new
previews move IN. Keep it in sync with the NOTES.md preview log.

Usage:  python tools/preview_gate.py [sf_dir ...]
        (default: /root/testdata/sf0.01 /root/testdata/sf0.1)

Exit status 1 if any preview FAILs, else 0.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_traffic_insight_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import compare, duck_connect  # noqa: E402


def _previews():
    """(name, builder, oracle_sql_text) for every current-round
    preview. The full round-12 set (pack_context_windows,
    pack_window_manifest, lm_ppl_buckets, sample_unimax_budget,
    sample_unimax_apply, qa_lsh_recall_audit,
    text_decontaminate_fuzzy, pipeline_unimax_corpus) was promoted to
    registered entries in r13 (16/16 PASS here first), and the full
    round-13 set (sample_epoch_shuffle, sample_interleave_stride,
    text_gopher_rules, lm_train_kneser_ney, lm_score_kneser_ney,
    qa_ivf_index_audit, qa_lsh_banding_sweep, pipeline_pretrain_order,
    text_dup_ngram_rate, qa_contamination_rate, qa_zipf_slope,
    mm_dedup_phash) followed later the same round (24/24 PASS here
    first), and the round-13 LATE set (emb_pq_codes,
    qa_pq_distortion, sim_search_pq_adc, pipeline_ann_ivfpq,
    qa_dedup_retention, text_dsir_weights, sample_curriculum_order)
    closed the round the same way (14/14 PASS here + the adversarial
    sweep before their registers landed) — all twenty-seven now ride
    tools/verify_rotation.py like the rest of the catalog. The list
    is EMPTY until the next preview lands; keep it in sync with the
    NOTES.md preview log."""
    return []


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark(app_name="ntis-preview-gate")
    spark.sparkContext.setLogLevel("ERROR")
    n_fail = 0
    for sf_dir in sf_dirs:
        # closed at the end of the per-sf loop — a multi-SF run was
        # accumulating file handles + DuckDB memory for the process
        # lifetime (ADVICE r12)
        con = duck_connect(sf_dir)
        try:
            tag = os.path.basename(os.path.normpath(sf_dir))
            for name, builder, oracle in _previews():
                t0 = time.time()
                try:
                    spdf = builder(spark, sf_dir).toPandas()
                    odf = con.execute(oracle).fetchdf()
                    compare(spdf, odf, name)
                except Exception as exc:  # noqa: BLE001 - report and continue
                    n_fail += 1
                    print(f"{tag} {name:26s} FAIL {str(exc)[:160]}")
                    continue
                print(
                    f"{tag} {name:26s} PASS rows={len(spdf)}"
                    f" ({time.time() - t0:.2f}s)"
                )
        finally:
            con.close()
    print(f"-- {n_fail} failed of {len(_previews()) * len(sf_dirs)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
