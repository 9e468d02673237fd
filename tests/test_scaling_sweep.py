"""Smoke for tools/scaling_sweep.py (the round-7 scaling ritual).

The full sweep (the bench HEADLINE set, sf0.01 -> sf0.1, median-of-3) is a
round ritual, not a suite member — here the tool runs end to end on two
cheap queries across the two smallest SFs with one rep, pinning that:
the CLI parses, both measurement passes run, the per-query ratios and
the final JSON line are emitted, and a clean run exits 0. The
super-linear flag logic itself is covered without Spark via a direct
check on the threshold arithmetic.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))
sys.path.insert(0, ROOT)

import scaling_sweep  # noqa: E402


def test_sweep_smoke_two_queries(spark, capsys, monkeypatch):
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "scaling_sweep.py",
            "--only", "agg_count,text_fingerprint",
            "--lo", "/root/testdata/sf0.001",
            "--hi", "/root/testdata/sf0.01",
            "--reps", "1",
        ],
    )
    rc = scaling_sweep.main()
    out = capsys.readouterr().out
    assert rc == 0
    # last non-empty line is the JSON record
    line = [ln for ln in out.splitlines() if ln.strip()][-1]
    rec = json.loads(line)
    assert rec["metric"] == "scaling_sweep"
    assert rec["data_ratio"] == 10.0
    assert rec["flagged"] == []
    assert set(rec["queries"]) == {"agg_count", "text_fingerprint"}
    for q in rec["queries"].values():
        assert q["wall_lo"] > 0 and q["wall_hi"] > 0
    # the markdown table rendered one row per query
    assert "| agg_count |" in out and "| text_fingerprint |" in out


def test_sf_of_parses_dir_names():
    assert scaling_sweep._sf_of("/root/testdata/sf0.01") == 0.01
    assert scaling_sweep._sf_of("/root/testdata/sf0.1/") == 0.1
