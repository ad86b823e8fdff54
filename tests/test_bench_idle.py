"""tools/bench_idle.py — idle-reference re-recording (round-6 verdict
item 6). The bench runs themselves are exercised manually on an idle
machine; these tests pin the parts that can silently corrupt
BASELINE.md: the anchor regex, the Use-note preservation, and the
not-idle refusal gate."""

from __future__ import annotations

import os
import shutil
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import bench_idle  # noqa: E402


def test_rewrite_anchors_match_current_baseline(tmp_path, monkeypatch):
    tmp = tmp_path / "BASELINE.md"
    shutil.copy(os.path.join(REPO, "BASELINE.md"), tmp)
    monkeypatch.setattr(bench_idle, "BASELINE", str(tmp))
    mins = {"q_alpha": 1.2345, "q_beta": 0.5}
    bench_idle.rewrite_baseline(mins, runs=2, totals=[1.81, 1.74])
    out = open(tmp).read()
    assert "| `q_alpha` | 1.234 |" in out or "| `q_alpha` | 1.235 |" in out
    assert "Suite total of mins: **1.73 s** (2 queries)." in out
    # EVERY paragraph between preamble and table must survive the
    # rewrite — the 'Use:' adjudication protocol AND machine-change
    # notes (round-7 review: the narrower Use:-only capture silently
    # dropped the machine-change paragraph).
    assert "Use: when a driver-recorded" in out
    assert "ROUND-9 RE-RECORDING" in out
    # Old table rows must be gone.
    assert "`candles_1s`" not in out
    # Idempotent anchors: a second rewrite still finds them.
    bench_idle.rewrite_baseline({"q_gamma": 2.0}, runs=2, totals=[2.0, 2.1])
    out2 = open(tmp).read()
    assert "q_gamma" in out2 and "q_alpha" not in out2
    assert "ROUND-9 RE-RECORDING" in out2 and "Use: when a driver-recorded" in out2


def test_unconfirmed_min_is_marked(tmp_path, monkeypatch):
    """Round-7 verdict item 5: a min whose setting run exhausted
    bench.py's stabilization cap without a confirming pass must be
    visibly flagged in the recorded table."""
    tmp = tmp_path / "BASELINE.md"
    shutil.copy(os.path.join(REPO, "BASELINE.md"), tmp)
    monkeypatch.setattr(bench_idle, "BASELINE", str(tmp))
    bench_idle.rewrite_baseline(
        {"q_alpha": 1.0, "q_beta": 0.5},
        runs=2,
        totals=[1.5, 1.6],
        unconfirmed={"q_beta"},
    )
    out = open(tmp).read()
    assert "| `q_beta` | 0.500 † |" in out
    assert "| `q_alpha` | 1.000 |" in out
    assert "'unconfirmed'" in out  # preamble explains the marker


def test_rewrite_refuses_when_adjudication_notes_missing(tmp_path, monkeypatch):
    """Round-7 review: a regex miss on the middle paragraphs must be
    LOUD — silently dropping the adjudication protocol would defeat
    the table's purpose."""
    tmp = tmp_path / "BASELINE.md"
    src = open(os.path.join(REPO, "BASELINE.md")).read().replace("Use:", "Usage:")
    tmp.write_text(src)
    monkeypatch.setattr(bench_idle, "BASELINE", str(tmp))
    with pytest.raises(RuntimeError, match="refusing to rewrite"):
        bench_idle.rewrite_baseline({"q": 1.0}, runs=2, totals=[1.0, 1.0])


def test_refuses_disagreeing_runs():
    with pytest.raises(RuntimeError, match="not idle"):
        bench_idle.check_idle([10.0, 13.0])
    bench_idle.check_idle([10.0, 10.9])  # within the gate — accepted
    # 3+ runs: the closest PAIR gates — one contaminated run among
    # otherwise-agreeing runs is tolerated...
    bench_idle.check_idle([10.0, 15.0, 10.8])
    # ...but all-mutually-disagreeing runs are still refused.
    with pytest.raises(RuntimeError, match="not idle"):
        bench_idle.check_idle([10.0, 13.0, 17.0])
