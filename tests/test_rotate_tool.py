"""tools/rotate_window.py — the mechanized rotation must reproduce the
committed round-7 plan: reds first, the full deferral drain, stalest
greens as filler, and the visibility invariant re-checked before any
rewrite."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import rotate_window  # noqa: E402


_REAL_ROUNDS = rotate_window._correctness_rounds


def _simulated_rounds():
    """The state at round-7 start: every CORRECTNESS_r*.json on disk
    plus a synthetic r06 in which the whole current window went green."""
    from auto_trade_data_pipeline_spark.corpus import DRIVER_QUERY_SLOTS, load_all

    rounds = _REAL_ROUNDS()
    latest = max(rounds)
    window_now = list(load_all())[:DRIVER_QUERY_SLOTS]
    rounds = dict(rounds)
    rounds[latest + 1] = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True}
        for n in window_now
    }
    return rounds


def test_round7_plan_drains_deferrals_to_zero(monkeypatch):
    from auto_trade_data_pipeline_spark.corpus import (
        DEFERRED_TO_NEXT_ROUND,
        DRIVER_QUERY_SLOTS,
        load_all,
    )

    monkeypatch.setattr(rotate_window, "_correctness_rounds", _simulated_rounds)
    window, residual, new_order, stranded = rotate_window.plan()

    assert len(window) == DRIVER_QUERY_SLOTS
    assert residual == [], "round 7 must drain the deferral set to zero"
    assert stranded == [], "post-r06 plan must satisfy the visibility invariant"
    # Every remaining deferral is in the window (the drain)...
    assert DEFERRED_TO_NEXT_ROUND <= set(window)
    # ...and no current-window query is re-selected (they just went green
    # in the simulated r06 — the freshest possible).
    reg = load_all()
    current = set(list(reg)[:DRIVER_QUERY_SLOTS])
    assert not (current & set(window))
    # New order is a permutation of the registry.
    assert sorted(new_order) == sorted(reg)


def test_red_queries_lead_the_window(monkeypatch):
    from auto_trade_data_pipeline_spark.corpus import load_all

    reg = load_all()

    def with_red():
        rounds = _simulated_rounds()
        latest = max(rounds)
        # Pick an ORACLED window entry: hash-red only exists for
        # oracled queries (a rows-only record has no oracle hash).
        name = next(n for n in rounds[latest] if reg[n].oracle is not None)
        rounds[latest][name] = {
            "rows_match": True, "schema_match": True, "hash_match": False,
        }
        with_red.red = name
        return rounds

    monkeypatch.setattr(rotate_window, "_correctness_rounds", with_red)
    window, _residual, _new_order, stranded = rotate_window.plan()
    assert window[0] == with_red.red, "a red must headline the next window"
    assert stranded == []


def test_rows_only_red_is_an_err_not_a_hash_miss(monkeypatch):
    """A rows-only query's driver record carries no oracle hash:
    hash_match=False must NOT mark it red (it would pin a window slot
    forever), but a recorded err MUST."""
    from auto_trade_data_pipeline_spark.corpus import load_all

    reg = load_all()
    rows_only = next(n for n, q in reg.items() if q.oracle is None)

    def hash_miss():
        rounds = _simulated_rounds()
        rounds[max(rounds)][rows_only] = {
            "rows_match": True, "schema_match": False, "hash_match": False,
        }
        return rounds

    monkeypatch.setattr(rotate_window, "_correctness_rounds", hash_miss)
    window, _r, _o, _s = rotate_window.plan()
    assert window[0] != rows_only

    def errored():
        rounds = _simulated_rounds()
        rounds[max(rounds)][rows_only] = {"err": "boom", "rows_match": False}
        return rounds

    monkeypatch.setattr(rotate_window, "_correctness_rounds", errored)
    window, _r, _o, _s = rotate_window.plan()
    assert window[0] == rows_only, "an errored rows-only run must re-headline"
