"""The 50-slot driver-window rotation invariant.

The external driver evaluates only the first ``DRIVER_QUERY_SLOTS``
entries of ``queries()`` each round. ``load_all`` already guarantees
no rows-only query wastes a slot; this test pins the INVERSE
invariant — driver coverage cannot silently stagnate: every oracled
query must either sit inside the current window or already have a
recorded driver row in a ``CORRECTNESS_r*.json``.
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


def test_every_oracled_query_reaches_the_driver():
    from auto_trade_data_pipeline_spark.corpus import (
        DEFERRED_TO_NEXT_ROUND,
        DRIVER_QUERY_SLOTS,
        load_all,
    )

    reg = load_all()
    window = set(list(reg)[:DRIVER_QUERY_SLOTS])
    checked = _driver_checked()
    stranded = {
        n for n, q in reg.items()
        if q.oracle is not None and n not in window and n not in checked
    }
    undeclared = stranded - DEFERRED_TO_NEXT_ROUND
    assert not undeclared, (
        "oracled queries with no driver row, no slot in the current "
        f"window, and no declared deferral: {sorted(undeclared)}"
    )
    stale = DEFERRED_TO_NEXT_ROUND - stranded
    assert not stale, (
        f"DEFERRED_TO_NEXT_ROUND entries no longer stranded — prune them: {sorted(stale)}"
    )


def test_window_is_fully_oracled_and_full():
    from auto_trade_data_pipeline_spark.corpus import DRIVER_QUERY_SLOTS, load_all

    reg = load_all()
    head = list(reg.values())[:DRIVER_QUERY_SLOTS]
    assert len(head) == DRIVER_QUERY_SLOTS
    assert all(q.oracle is not None for q in head)


def test_staleness_bound():
    """Round-4 verdict item 8: no oracled query may go >= 3 rounds
    with neither a driver row nor a recorded local-sweep entry
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
        n for n, q in reg.items()
        if q.oracle is not None
        and n not in window
        and building - last_seen.get(n, 0) >= 3
    )
    assert not stale, (
        f"oracled queries unverified for >=3 rounds (run tools/verify_local.py "
        f"on them or rotate them into the window): {stale}"
    )


def test_rows_only_queries_sit_after_the_cut_line():
    from auto_trade_data_pipeline_spark.corpus import DRIVER_QUERY_SLOTS, load_all

    reg = load_all()
    tail = list(reg.values())[DRIVER_QUERY_SLOTS:]
    rows_only = [q.name for q in reg.values() if q.oracle is None]
    assert set(rows_only) <= {q.name for q in tail}
