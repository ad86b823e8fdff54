"""tools/canary.py audit_windows — the per-run recording gate
bench_idle relies on (round-9: a recorded min must never come from a
wave-contaminated run)."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from canary import MED_GATE_MS, P90_GATE_MS, audit_windows  # noqa: E402


def _log(tmp_path, samples):
    p = tmp_path / "canary.jsonl"
    p.write_text("".join(json.dumps({"t": t, "ms": ms}) + "\n" for t, ms in samples))
    return str(p)


def test_clean_window_passes(tmp_path):
    path = _log(tmp_path, [(float(i), 20.0) for i in range(100)])
    v = audit_windows(path, [(0.0, 99.0)])
    assert v["clean"] and v["n"] == 100 and v["med_ms"] == 20.0


def test_wave_median_fails(tmp_path):
    path = _log(tmp_path, [(float(i), 120.0) for i in range(100)])
    v = audit_windows(path, [(None, None)])
    assert not v["clean"] and v["med_ms"] >= MED_GATE_MS


def test_p90_tail_fails_even_with_clean_median(tmp_path):
    samples = [(float(i), 20.0) for i in range(80)] + [
        (float(80 + i), 400.0) for i in range(20)
    ]
    path = _log(tmp_path, samples)
    v = audit_windows(path, [(None, None)])
    assert v["med_ms"] < MED_GATE_MS and v["p90_ms"] >= P90_GATE_MS and not v["clean"]


def test_window_selection_excludes_outside_samples(tmp_path):
    # Wave before the window, clean inside: only the inside counts.
    samples = [(float(i), 500.0) for i in range(50)] + [
        (float(100 + i), 18.0) for i in range(50)
    ]
    path = _log(tmp_path, samples)
    v = audit_windows(path, [(100.0, 200.0)])
    assert v["clean"] and v["n"] == 50


def test_multiple_windows_pool(tmp_path):
    samples = (
        [(float(i), 18.0) for i in range(30)]
        + [(float(50 + i), 500.0) for i in range(30)]  # dropped run's window
        + [(float(120 + i), 22.0) for i in range(30)]
    )
    path = _log(tmp_path, samples)
    v = audit_windows(path, [(0.0, 29.0), (120.0, 149.0)])
    assert v["clean"] and v["n"] == 60


def test_no_samples_is_a_tool_error_not_contamination(tmp_path):
    path = _log(tmp_path, [(0.0, 20.0)])
    with pytest.raises(ValueError):
        audit_windows(path, [(1000.0, 2000.0)])
