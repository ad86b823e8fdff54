"""Re-record BASELINE.md's "Idle-machine reference" table (round-6
verdict item 6: promote the idle-reference discipline into tooling).

Runs ``bench.py`` ``--runs`` times back to back (each query inside a
run is already a stabilized multi-pass minimum — see bench.py's
method note for the exact pass policy), takes the per-query MINIMUM
across runs, and rewrites the idle table between the markers in
BASELINE.md in one command. Refuses to rewrite
when the runs disagree badly on the suite total (>15%) — that is the
signature of a LOADED machine, and a loaded recording would poison
every future regression adjudication.

Usage (on an idle machine — nothing else running):

    python tools/bench_idle.py            # 2 runs, rewrite BASELINE.md
    python tools/bench_idle.py --runs 3
    python tools/bench_idle.py --dry-run  # print the table, touch nothing
    python tools/bench_idle.py --runs 3 --only kalman_price_smooth \
        rolling_active_users              # scoped re-adjudication; print-only
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "BASELINE.md")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from canary import MED_GATE_MS, P90_GATE_MS  # noqa: E402

#: Agreement gate on the suite total across runs: max/min above this
#: means the machine was not idle and the recording is untrustworthy.
MAX_RUN_DISAGREEMENT = 1.15


def run_bench(only: list[str] | None = None) -> dict:
    env = dict(os.environ)
    if only:
        env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(only)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
        env=env,
    )
    # bench.py prints ONE JSON line on stdout (Spark noise goes to stderr).
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench.py printed no JSON line:\n{out.stdout[-2000:]}")


def check_idle(totals: list[float]) -> None:
    """Refuse a recording whose runs disagree more than the gate —
    the signature of a loaded machine. With 3+ runs, the CLOSEST pair
    of suite totals must agree (one contaminated run among several
    clean ones should not scrap the whole recording — on a box with
    intrinsic variance, run with --runs 3)."""
    s = sorted(totals)
    closest = min(b / a for a, b in zip(s, s[1:])) if len(s) > 1 else 1.0
    if closest > MAX_RUN_DISAGREEMENT:
        raise RuntimeError(
            f"no two suite totals agree within {MAX_RUN_DISAGREEMENT}x "
            f"(closest pair {closest:.2f}x; totals {totals}) — machine is "
            "not idle; recording refused"
        )


def render_table(mins: dict[str, float], unconfirmed: set[str] = frozenset()) -> str:
    rows = "\n".join(
        f"| `{n}` | {t:.3f}{' †' if n in unconfirmed else ''} |"
        for n, t in sorted(mins.items())
    )
    total = sum(mins.values())
    return (
        "| Query | idle min (s), sf0.1 |\n|---|---|\n"
        + rows
        + f"\n\nSuite total of mins: **{total:.2f} s** ({len(mins)} queries)."
    )


def rewrite_baseline(
    mins: dict[str, float],
    runs: int,
    totals: list[float],
    unconfirmed: set[str] = frozenset(),
    canary_verdict: dict | None = None,
) -> None:
    src = open(BASELINE).read()
    today = datetime.date.today().isoformat()
    totals_txt = " / ".join(f"{t:.2f} s" for t in totals)
    preamble = (
        f"Recorded **{today}** (tools/bench_idle.py) on the build sandbox "
        f"with nothing else running: {runs} full back-to-back `bench.py` "
        "runs (each query already a stabilized multi-pass minimum — see "
        "bench.py's method note for the pass policy), per-query minimum "
        "across the runs. Suite totals per run: "
        f"{totals_txt}."
        + (
            # Auditable gate constants (round-8 verdict finding 3): if
            # the sandbox hardware generation changes, the recorded
            # clean-window numbers date the gates instead of letting
            # them silently mis-adjudicate.
            " Canary audit over the kept runs' exact windows: "
            f"med {canary_verdict['med_ms']} ms / "
            f"p90 {canary_verdict['p90_ms']} ms over "
            f"{canary_verdict['n']} samples — CLEAN under tools/canary.py's "
            f"gates (med<{MED_GATE_MS:g} ms, p90<{P90_GATE_MS:g} ms, "
            "calibrated against this sandbox's ~15-24 ms clean baseline); "
            f"{canary_verdict['runs_clean']} run(s) kept, "
            f"{canary_verdict['runs_dropped']} dropped as wave-ridden "
            "(per-run audits; a min never comes from a contaminated run)."
            if canary_verdict
            else ""
        )
        + (
            " † marks a query whose min-setting run reported it "
            "'unconfirmed' (bench.py stabilization cap exhausted with no "
            "later pass within 5% of the min) — its row may read low."
            if unconfirmed
            else ""
        )
    )
    # Replace from the recording preamble through the suite-total line.
    pat = re.compile(
        r"Recorded \*\*.*?Suite total of mins: \*\*[0-9.]+ s\*\* \(\d+ queries\)\.",
        re.S,
    )
    new = preamble + "\n\n" + _use_note(src) + render_table(mins, unconfirmed)
    # Replacement via callable: `new` is free-form text (it embeds the
    # preserved Use-note verbatim), not a regex template — a literal
    # backslash in it must not be interpreted as an escape.
    src, n = pat.subn(lambda _m: new, src, count=1)
    if n != 1:
        raise RuntimeError(
            "BASELINE.md idle-reference section anchors not found — "
            "rewrite it by hand once, keeping the 'Recorded **' prefix "
            "and the 'Suite total of mins:' suffix"
        )
    open(BASELINE, "w").write(src)


def _use_note(src: str) -> str:
    """Keep EVERY paragraph between the recording preamble and the
    table verbatim (the 'Use:' adjudication protocol, machine-change
    notes — round history worth preserving). Raises rather than
    silently dropping them — losing the adjudication protocol would
    defeat the table's purpose."""
    m = re.search(
        r"Recorded \*\*[^\n]*(?:\n[^\n]+)*\n\n(.*?)\n\n\| Query \|", src, re.S
    )
    if not m or "Use:" not in m.group(1):
        raise RuntimeError(
            "BASELINE.md idle section has no 'Use: ...' adjudication "
            "notes between the preamble and the table — refusing to "
            "rewrite (they would be silently dropped); restore them or "
            "update _use_note's anchor"
        )
    return m.group(1) + "\n\n"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument(
        "--only",
        nargs="+",
        metavar="QUERY",
        help="re-adjudicate just these queries: runs the scoped suite "
        "and PRINTS the idle-min table — never rewrites BASELINE.md "
        "(a scoped rewrite would drop every other row)",
    )
    ap.add_argument(
        "--canary",
        metavar="LOG",
        help="path to a running tools/canary.py log; EACH run's window "
        "is audited separately and wave-ridden runs are DROPPED (the "
        "round-9 refinement: an all-or-nothing audit over the union "
        "window demands ~30 uninterrupted quiet minutes, which this "
        "host's minutes-long steal waves rarely allow — per-run "
        "auditing keeps the sound property, a min never comes from a "
        "contaminated run, while needing only two disjoint quiet "
        "runs). Fewer than 2 clean runs refuses the recording. "
        "Round-8 lesson stands: back-to-back runs slowed UNIFORMLY by "
        "a wave agree within the 1.15x gate and would record a "
        "poisoned table — only an independent-process audit catches "
        "that mode.",
    )
    args = ap.parse_args()

    import time as _time

    # (rec, t0, t1) per run — the window is audited per run when
    # --canary is given, and a contaminated run is dropped wholesale.
    runs: list[tuple[dict, float, float]] = []
    for i in range(args.runs):
        t0 = _time.time()
        rec = run_bench(args.only)
        runs.append((rec, t0, _time.time()))
        run_unconf = set(rec.get("unconfirmed", []))
        print(
            f"run {i + 1}/{args.runs}: suite {rec['value']} s"
            + (f" (unconfirmed: {sorted(run_unconf)})" if run_unconf else ""),
            file=sys.stderr,
        )

    canary_verdict = None
    if args.canary:
        from canary import audit_windows

        kept = []
        for i, (rec, t0, t1) in enumerate(runs):
            # audit_windows raises on a missing/empty log — a tooling
            # error, reported as such, never as contamination (ADVICE r8).
            v = audit_windows(args.canary, [(t0, t1)])
            print(f"run {i + 1} canary audit: {json.dumps(v)}", file=sys.stderr)
            if v["clean"]:
                kept.append((rec, t0, t1))
            else:
                print(
                    f"run {i + 1} DROPPED (host wave rode its window)",
                    file=sys.stderr,
                )
        if len(kept) < 2:
            raise RuntimeError(
                f"only {len(kept)}/{len(runs)} runs had canary-clean "
                "windows — a single clean run cannot witness its own "
                "minimum; recording refused (re-run on a quieter host)"
            )
        canary_verdict = audit_windows(args.canary, [(t0, t1) for _, t0, t1 in kept])
        canary_verdict["runs_clean"] = len(kept)
        canary_verdict["runs_dropped"] = len(runs) - len(kept)
        runs = kept

    mins: dict[str, float] = {}
    totals: list[float] = []
    # A query is flagged when the run that SET its recorded min
    # reported it "unconfirmed" (bench.py's stabilization-cap flag) —
    # a later run confirming a slower time does not rescue a min that
    # was never witnessed twice.
    min_unconfirmed: dict[str, bool] = {}
    for i, (rec, _t0, _t1) in enumerate(runs):
        totals.append(rec["value"])
        run_unconf = set(rec.get("unconfirmed", []))
        for name, t in rec["queries"].items():
            if t < 0:
                raise RuntimeError(f"{name} failed in bench run {i + 1}")
            if t < mins.get(name, float("inf")):
                mins[name] = t
                min_unconfirmed[name] = name in run_unconf

    check_idle(totals)
    unconfirmed = {n for n, u in min_unconfirmed.items() if u}
    if args.dry_run or args.only:
        print(render_table(mins, unconfirmed))
        return 0
    rewrite_baseline(mins, len(runs), totals, unconfirmed, canary_verdict)
    print(f"BASELINE.md idle table rewritten ({len(mins)} queries, "
          f"total {sum(mins.values()):.2f} s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
