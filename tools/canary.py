"""Host-interference canary — the discriminating instrument from the
round-8 CC-bimodality root-cause (STATUS.md): a fixed numpy workload
timed every 0.4 s, independent of any Spark JVM. On this sandbox the
clean baseline is ~15-25 ms per sample; host CPU-steal waves push it
to 60-800+ ms for minutes at a time and slow EVERY process by the
same factor, so any benchmark window whose canary median reads >~35 ms
(or p90 >~150 ms) is contaminated and must not be recorded as idle.

Run it alongside any timing session and audit the window afterwards:

    python tools/canary.py > /tmp/canary.jsonl 2>/dev/null &
    ... timing work ...
    python tools/canary.py --audit /tmp/canary.jsonl T0 T1

The audit prints median/p90/max over [T0, T1] (unix seconds; omit for
the whole file) and exits 1 if the window is contaminated.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

#: Contamination gates, calibrated on this sandbox (clean med 15-25 ms).
MED_GATE_MS = 35.0
P90_GATE_MS = 150.0


_PROBE = None


def probe_ms() -> float:
    """Time ONE canary workload, in milliseconds — the exact op the
    long-running canary samples. numpy matmul releases the GIL and
    runs outside any JVM, so it measures HOST cpu health (steal /
    throttling waves), not the calling process's own load. Importable
    (bench.py embeds it between query passes to stamp every bench
    artifact with ambient evidence — round-8 verdict item 4)."""
    global _PROBE
    import numpy as np

    if _PROBE is None:
        _PROBE = np.random.default_rng(0).standard_normal((256, 256))
    t0 = time.perf_counter()
    for _ in range(8):
        _PROBE @ _PROBE
    return (time.perf_counter() - t0) * 1000


def run() -> None:
    while True:
        print(json.dumps({"t": time.time(), "ms": round(probe_ms(), 1)}), flush=True)
        time.sleep(0.4)


def audit_windows(path: str, windows: list[tuple[float | None, float | None]]) -> dict:
    """Pool the canary samples falling inside ANY of the [t0, t1]
    windows and adjudicate against the gates. Importable (bench_idle
    audits each bench run's window separately and records the verdict
    over the union of the CLEAN windows). Raises ValueError when no
    samples land in the windows — a tooling error (canary not
    running), never a contamination finding."""
    vals = []
    for line in open(path):
        if not line.strip():
            continue
        rec = json.loads(line)
        for t0, t1 in windows:
            if (t0 is None or rec["t"] >= t0) and (t1 is None or rec["t"] <= t1):
                vals.append(rec["ms"])
                break
    if not vals:
        raise ValueError(f"no canary samples in window(s) {windows} of {path}")
    med = statistics.median(vals)
    p90 = sorted(vals)[int(0.9 * len(vals))]
    return {
        "n": len(vals),
        "med_ms": round(med, 1),
        "p90_ms": round(p90, 1),
        "max_ms": round(max(vals), 1),
        "clean": med < MED_GATE_MS and p90 < P90_GATE_MS,
    }


def audit(path: str, t0: float | None, t1: float | None) -> int:
    try:
        verdict = audit_windows(path, [(t0, t1)])
    except ValueError as exc:
        print(exc)
        return 1
    print(json.dumps(verdict))
    return 0 if verdict["clean"] else 1


def main() -> int:
    if "--audit" in sys.argv:
        i = sys.argv.index("--audit")
        path = sys.argv[i + 1]
        rest = sys.argv[i + 2:]
        t0 = float(rest[0]) if len(rest) > 0 else None
        t1 = float(rest[1]) if len(rest) > 1 else None
        return audit(path, t0, t1)
    run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
