"""The 50-slot driver-window rotation invariant.

The external driver evaluates only the first ``DRIVER_QUERY_SLOTS``
entries of ``queries()`` each round — a full rows+schema+hash check
for queries with an ``oracle_sql()`` twin, a weaker rows-only record
otherwise. Since round 8 rows-only queries are first-class rotation
citizens (round-7 verdict item 2: a rows-only query outside the
window is invisible to the driver gate forever), so every invariant
here ranges over ALL queries: driver coverage cannot silently
stagnate — every query must either sit inside the current window or
already have a recorded driver row in a ``CORRECTNESS_r*.json``.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_checked() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        names |= set(json.load(open(path)))
    return names


def test_every_query_reaches_the_driver():
    from auto_trade_data_pipeline_spark.corpus import (
        DEFERRED_TO_NEXT_ROUND,
        DRIVER_QUERY_SLOTS,
        load_all,
    )

    reg = load_all()
    window = set(list(reg)[:DRIVER_QUERY_SLOTS])
    checked = _driver_checked()
    stranded = {
        n for n in reg if n not in window and n not in checked
    }
    undeclared = stranded - DEFERRED_TO_NEXT_ROUND
    assert not undeclared, (
        "queries with no driver row, no slot in the current "
        f"window, and no declared deferral: {sorted(undeclared)}"
    )
    stale = DEFERRED_TO_NEXT_ROUND - stranded
    assert not stale, (
        f"DEFERRED_TO_NEXT_ROUND entries no longer stranded — prune them: {sorted(stale)}"
    )


def test_window_is_full():
    from auto_trade_data_pipeline_spark.corpus import DRIVER_QUERY_SLOTS, load_all

    reg = load_all()
    head = list(reg.values())[:DRIVER_QUERY_SLOTS]
    assert len(head) == DRIVER_QUERY_SLOTS
    # Rows-only queries may hold a slot (their only path to a driver
    # record), but they are rare by construction — a window that is
    # mostly rows-only would be wasting the hash gate.
    rows_only_in_window = [q.name for q in head if q.oracle is None]
    assert len(rows_only_in_window) <= 5, rows_only_in_window


def test_staleness_bound():
    """Round-4 verdict item 8: no query may go >= 3 rounds with
    neither a driver row nor a recorded local-sweep entry
    (SWEEP_MANIFEST.json, written by tools/verify_local.py). Being in
    the CURRENT window counts — it gets a driver row this round."""
    from auto_trade_data_pipeline_spark.corpus import DRIVER_QUERY_SLOTS, load_all

    rounds = [
        int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")])
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    building = max(rounds, default=0) + 1

    last_seen: dict[str, int] = {}
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        r = int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")])
        for n in json.load(open(p)):
            last_seen[n] = max(last_seen.get(n, 0), r)
    manifest_path = os.path.join(REPO, "SWEEP_MANIFEST.json")
    if os.path.exists(manifest_path):
        for n, rec in json.load(open(manifest_path)).items():
            last_seen[n] = max(last_seen.get(n, 0), int(rec["round"]))

    reg = load_all()
    window = set(list(reg)[:DRIVER_QUERY_SLOTS])
    stale = sorted(
        n for n in reg
        if n not in window and building - last_seen.get(n, 0) >= 3
    )
    assert not stale, (
        f"queries unverified for >=3 rounds (run tools/verify_local.py "
        f"on them or rotate them into the window): {stale}"
    )


def test_no_oracle_convention_guard():
    """Round-8 verdict item 5: the driver's ``err: "no_oracle"``
    convention (a rows-only query ran; nothing to hash) must never
    whitewash an ORACLED query's record. The guard lives in
    tools/rotate_window.py (plan() raises on violation); this pins
    both the recorded history and the guard's own logic."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from rotate_window import _correctness_rounds, no_oracle_violations

    from auto_trade_data_pipeline_spark.corpus import load_all

    reg = load_all()
    rounds = _correctness_rounds()
    assert no_oracle_violations(rounds, reg) == []

    # Synthetic violation: 'no_oracle' on an oracled query is caught.
    oracled = next(n for n in reg if reg[n].oracle is not None)
    fake = {99: {oracled: {"err": "no_oracle", "spark_rows": 1}}}
    assert no_oracle_violations(fake, reg) == [f"r99:{oracled}"]

    # The convention itself stays allowed: 'no_oracle' on a rows-only
    # query is NOT a violation.
    rows_only = [n for n in reg if reg[n].oracle is None]
    if rows_only:
        ok = {99: {rows_only[0]: {"err": "no_oracle", "spark_rows": 1}}}
        assert no_oracle_violations(ok, reg) == []
