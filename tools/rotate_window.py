"""Compute (and optionally apply) the next round's 50-slot driver
window rotation — the mechanical form of the plan STATUS.md commits
each round, so the rotation can never drift from its own rules.

Selection order (highest priority first):
1. any query RED in the latest ``CORRECTNESS_r*.json`` (a red must be
   re-checked the round after its fix);
2. every remaining ``DEFERRED_TO_NEXT_ROUND`` entry, in current
   declaration order (the drain);
3. fill to 50 with the STALEST previously-green queries — smallest
   last-driver-row round, ties by current declaration order.

Rows-only queries (``oracle is None``) are first-class here (round-7
verdict item 2): the driver records a weaker rows-only check for a
window entry with no ``oracle_sql()`` twin, which is still a driver
row — without it a rows-only query is invisible to the driver gate
forever. Green for a rows-only record = ran without error (no
``err``), since there is no oracle hash to match.

``--apply`` rewrites ``corpus/__init__.py``'s ``_ORDER`` (new window
first, every displaced query keeping its relative order behind it)
and ``DEFERRED_TO_NEXT_ROUND`` (whatever deferrals did not fit —
empty once the drain completes). After applying, re-verify the window
on a vanilla session before committing:

    SPARK_GRAFT_VANILLA=1 python tools/verify_local.py \
        /root/testdata/sf0.01 $(python tools/rotate_window.py --names)

Without flags, prints the planned window + residual deferrals.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INIT = os.path.join(REPO, "auto_trade_data_pipeline_spark", "corpus", "__init__.py")
sys.path.insert(0, REPO)


def _correctness_rounds() -> dict[int, dict]:
    out = {}
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        r = int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")])
        out[r] = json.load(open(p))
    return out


def no_oracle_violations(rounds: dict[int, dict], reg) -> list[str]:
    """Guard on the driver's ``err: "no_oracle"`` convention (round-8
    verdict finding 1 / item 5): that literal is the driver saying "a
    rows-only query ran; there is nothing to hash" — it may ONLY ever
    appear on a query registered rows-only (``oracle is None``). On an
    oracled query it means the driver could not see the oracle entry
    (a rename or registry bug) — a record that must never adjudicate
    green. Only the LATEST round is judged against the CURRENT
    registry: a query may gain an oracle over time (six round-2
    rows-only queries did exactly that), so an older round's marker
    reflects the registry as of that round — and the rotation only
    adjudicates reds from the latest file anyway. Returns
    ``["r<N>:<name>", ...]`` violations; callers raise."""
    if not rounds:
        return []
    latest = max(rounds)
    return [
        f"r{latest}:{n}"
        for n, rec in rounds[latest].items()
        if rec.get("err") == "no_oracle" and n in reg and reg[n].oracle is not None
    ]


def plan() -> tuple[list[str], list[str], list[str], list[str]]:
    """Return (window, residual_deferred, new_order, stranded) —
    ``stranded`` lists queries the rotation would leave with no
    driver row, no window slot, and no declared deferral (non-empty
    only when run mid-round, before the in-flight CORRECTNESS file
    lands; ``--apply`` refuses while it is non-empty)."""
    from auto_trade_data_pipeline_spark.corpus import (
        DEFERRED_TO_NEXT_ROUND,
        DRIVER_QUERY_SLOTS,
        load_all,
    )

    reg = load_all()
    order = list(reg)
    rounds = _correctness_rounds()
    latest = max(rounds, default=0)

    violations = no_oracle_violations(rounds, reg)
    if violations:
        raise RuntimeError(
            "err='no_oracle' recorded for ORACLED queries — a real "
            f"breakage is hiding behind the rows-only convention: {violations}"
        )

    def is_green(name: str, rec: dict) -> bool:
        if name in reg and reg[name].oracle is None:
            # Rows-only: the driver has no oracle to hash against; its
            # weaker check is "the Spark side ran". The driver records
            # the literal err='no_oracle' for such a ran-fine row
            # (CORRECTNESS_r08: indicators_chunked_pack, 9,997 rows);
            # any OTHER err string is a genuine failure. The guard
            # above ensures 'no_oracle' can never whitewash an oracled
            # query's record.
            err = rec.get("err")
            return not err or err == "no_oracle"
        return bool(rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"))

    reds = [
        n for n in order
        if latest and n in rounds[latest] and not is_green(n, rounds[latest][n])
    ]
    deferred = [n for n in order if n in DEFERRED_TO_NEXT_ROUND and n not in reds]

    last_seen: dict[str, int] = {}
    for r, recs in rounds.items():
        for n, rec in recs.items():
            if is_green(n, rec):
                last_seen[n] = max(last_seen.get(n, 0), r)
    # Queries in the CURRENT window are guaranteed a driver row in the
    # round being built (same convention as test_staleness_bound) —
    # rank them freshest, so running this tool BEFORE that round's
    # CORRECTNESS file lands cannot misread them as never-checked and
    # strand them outside both the new window and the deferral set.
    for n in order[:DRIVER_QUERY_SLOTS]:
        last_seen[n] = max(last_seen.get(n, 0), latest + 1)
    pool = [n for n in order if n not in reds and n not in deferred]
    pool.sort(key=lambda n: (last_seen.get(n, 0), order.index(n)))

    window = (reds + deferred + pool)[:DRIVER_QUERY_SLOTS]
    residual = [n for n in deferred if n not in window]
    new_order = window + [n for n in order if n not in set(window)]

    # The visibility invariant tests/test_rotation.py enforces: every
    # query (oracled or rows-only) is in the new window, has SOME
    # driver row already, or is a declared residual deferral.
    # Current-window queries without rows yet make the plan
    # PROVISIONAL (their rows land with the in-flight round's
    # CORRECTNESS file): main() warns on them, apply() refuses — so
    # --apply can never write a violating state.
    checked = {n for recs in rounds.values() for n in recs}
    stranded = sorted(
        n for n in order
        if n not in set(window) and n not in checked and n not in set(residual)
    )
    return window, residual, new_order, stranded


def apply(window: list[str], residual: list[str], new_order: list[str]) -> None:
    rounds = _correctness_rounds()
    nxt = max(rounds, default=0) + 1
    src = open(INIT).read()

    def_body = "\n".join(f'    "{n}",' for n in sorted(residual))
    def_txt = (
        "DEFERRED_TO_NEXT_ROUND = frozenset({"
        + (
            f"\n    # Residual of the round-{nxt} rotation "
            "(tools/rotate_window.py).\n" + def_body + "\n"
            if residual
            else ""
        )
        + "})"
    )
    src, n1 = re.subn(
        r"DEFERRED_TO_NEXT_ROUND = frozenset\(\{.*?\}\)", def_txt, src, count=1, flags=re.S
    )
    order_body = "\n".join(f'    "{n}",' for n in new_order)
    order_txt = (
        f"#: Explicit registry order — round-{nxt} rotation, computed by\n"
        "#: tools/rotate_window.py (reds, then the deferral drain, then the\n"
        "#: stalest previously-green queries; displaced queries keep their\n"
        "#: relative order behind the window).\n"
        "_ORDER = [\n" + order_body + "\n]"
    )
    src, n2 = re.subn(
        r"#: Explicit registry order[^\n]*\n(#:[^\n]*\n)*_ORDER = \[.*?\n\]",
        order_txt,
        src,
        count=1,
        flags=re.S,
    )
    if n1 != 1 or n2 != 1:
        raise RuntimeError(f"rewrite anchors not found (deferred={n1}, order={n2})")
    open(INIT, "w").write(src)


def main() -> int:
    if "--names" in sys.argv:
        # The CURRENT window (what the driver will evaluate) — NOT a
        # recomputed plan: run after --apply, plan() would already
        # rank the applied window freshest and print the NEXT
        # rotation's window instead (the round-8 footgun).
        from auto_trade_data_pipeline_spark.corpus import DRIVER_QUERY_SLOTS, load_all

        print(" ".join(list(load_all())[:DRIVER_QUERY_SLOTS]))
        return 0
    window, residual, new_order, stranded = plan()
    print(f"window ({len(window)}):")
    for n in window:
        print("  ", n)
    print(f"residual deferrals ({len(residual)}):")
    for n in residual:
        print("  ", n)
    if stranded:
        print(
            f"PROVISIONAL: {len(stranded)} current-window queries have no "
            "recorded driver row yet (their rows land with the in-flight "
            "round's CORRECTNESS file) — re-run after it lands; --apply "
            "refuses until then"
        )
    if "--apply" in sys.argv:
        if stranded:
            raise RuntimeError(
                "rotation would strand oracled queries with no driver row, "
                f"no window slot, and no declared deferral: {stranded}"
            )
        apply(window, residual, new_order)
        print("applied — re-run pytest tests/test_rotation.py and the "
              "vanilla window verification before committing")
    return 0


if __name__ == "__main__":
    sys.exit(main())
