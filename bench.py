"""Driver bench harness — times the headline corpus queries and prints
ONE JSON line on stdout.

Env contract:
  SPARK_GRAFT_SF_DIR      input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        local[<n>] parallelism (default: all cores)
  SPARK_GRAFT_BENCH_ONLY  comma-separated query names — restrict the
                          suite (adjudication re-runs of a few
                          queries; tools/bench_idle.py --only)

Each query is materialized with the `noop` sink: the full plan runs on
executors (scan → shuffle → agg/window) but no rows cross back to the
driver, so timings measure the engine, not driver-side collect.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

from canary import MED_GATE_MS, P90_GATE_MS, probe_ms  # noqa: E402

#: Headline suite — one representative per major operator family.
#: Extend as families land; keep total runtime at sf0.1 under ~3 min.
HEADLINE = [
    "candles_1s",
    "candles_cascade",
    "dedup_keep_last",
    "upsert_merge",
    "rolling_window_features",
    "session_flags",
    "trend_labels",
    "tick_quality_report",
    "gap_report",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from auto_trade_data_pipeline_spark.corpus import load_all
    from auto_trade_data_pipeline_spark.session import get_spark
    from auto_trade_data_pipeline_spark.sources.files import load_table

    spark = get_spark("bench")
    registry = load_all()
    names = [n for n in HEADLINE if n in registry]
    # Optional extras registered with the "bench" tag (joins, EXT, ...).
    names += [n for n, q in sorted(registry.items()) if "bench" in q.tags and n not in names]
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    if only:
        wanted = [n.strip() for n in only.split(",") if n.strip()]
        missing = [n for n in wanted if n not in names]
        if missing:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY names not in the suite: {missing}")
        names = [n for n in names if n in wanted]

    # Warm the JVM + parquet footers once so per-query times measure the
    # plans, not first-touch session setup.
    load_table(spark, sf_dir, "events").limit(1).count()

    # Two back-to-back passes per query, min: the first pass pays
    # whole-stage codegen compilation, JIT warm-up, and fills the
    # query's own persisted intermediates; the min is the steady-state
    # engine time. Caches are dropped BETWEEN queries (not between a
    # query's passes), so query N+1 never pays query N's
    # executor-memory pressure and timings match single-query
    # isolation.
    # Four passes, min: pass 1 additionally pays whole-stage-codegen
    # JIT compilation, which for the codegen-heavy LSH shapes can be
    # 5-10x the steady state, and the JIT tail can still bleed into
    # pass 2-3 (observed: rolling_window_features 7.3 / 3.0 / 2.4 /
    # 2.2 s — min-of-3 overstates steady state by ~10%).
    # Sub-second queries get extra passes (up to 7 total): on a loaded
    # sandbox their recorded min can read up to ~80% high (the round-4
    # driver recording vs idle re-runs — every apparent regression
    # re-benched to the r03 value), and extra cheap passes tighten the
    # min at negligible suite cost. BASELINE.md pins an idle-machine
    # reference column for adjudicating apparent regressions.
    # Round 7 adds a STABILITY extension on top of the pass floors:
    # the recording sandbox shows ~10-15% run-to-run variance even
    # when idle (BASELINE.md adjudication notes), so after the floor
    # a query keeps earning passes (cap 10) until a pass AFTER the
    # min-setting one lands within 5% of the min — a min no later
    # pass can approach was set by a transient quiet window and would
    # overstate a later "regression". (The min-setting pass must not
    # confirm itself: whenever a pass lowers the min, confirmation
    # resets and another pass is required, up to the cap.)
    # Queries that exhausted the 10-pass cap with no pass after the
    # min-setting one landing within 5% of the min: their recorded
    # minimum is UNCONFIRMED (round-7 verdict item 5) — a transient
    # quiet window may have set it, so adjudicate apparent
    # regressions on these against BASELINE.md's idle table rather
    # than the recorded number.
    # Ambient-load evidence, embedded in the artifact itself (round-8
    # verdict item 4): the driver records BENCH files on a box the
    # builder cannot schedule, and host CPU-steal waves (the round-8
    # root cause) poison face-value deltas. One canary probe
    # (tools/canary.py's fixed numpy op — GIL-releasing, outside the
    # JVM, so it reads HOST health) is timed before every query pass;
    # the per-query median plus suite med/p90 let a reader adjudicate
    # "code regression vs loaded recording" without a separate canary
    # log. Probes run BETWEEN passes, so they never inflate timings.
    probe_ms()  # warm-up: the first call pays BLAS init, not host load
    ambient_by_query: dict[str, list[float]] = {}
    unconfirmed: list[str] = []
    timings: dict[str, float] = {}
    # Round-10 (r9 verdict item 3, additions-only): the recorded min
    # is taken over passes that reuse a query's own scoped persists,
    # so persist-based optimizations are timed mostly cache-warm.
    # `cold_first_pass_sec` records pass 1 — every cache cold, plus
    # first-plan codegen/JIT — alongside the min, so a reader can
    # bound the cold-path benefit of persist-touched queries. The
    # timing loop and every pre-existing JSON key are unchanged.
    cold: dict[str, float] = {}
    for name in names:
        passes = 0
        confirmed = False
        while passes < 10:
            ambient_by_query.setdefault(name, []).append(probe_ms())
            t0 = time.perf_counter()
            try:
                df = registry[name].fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                dt = round(time.perf_counter() - t0, 3)
                if passes == 0:
                    cold[name] = dt
                prev = timings.get(name)
                if prev is None or (0 <= dt < prev):
                    timings[name] = dt
                    confirmed = False  # new min needs a later witness
                elif dt <= prev * 1.05:
                    confirmed = True
            except Exception as exc:  # one broken query must not kill the bench
                print(f"bench: {name} failed: {exc}", file=sys.stderr)
                timings[name] = -1.0
                break
            passes += 1
            floor = 4 if timings[name] >= 1.0 else 7
            if passes >= floor and confirmed:
                break
        if not confirmed and timings.get(name, -1.0) >= 0:
            unconfirmed.append(name)
        spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    all_samples = sorted(s for v in ambient_by_query.values() for s in v)
    med = all_samples[len(all_samples) // 2] if all_samples else None
    p90 = all_samples[int(0.9 * len(all_samples))] if all_samples else None
    # The IN-PROCESS probe baseline differs from the external canary's:
    # sampled hot between passes it reads ~3-4 ms clean (the external
    # canary's sleep-wake loop reads 15-24 ms), so the canary gates
    # would be blind to a 4x wave here. Gate the SUITE median at 3x the
    # observed in-process clean baseline; the p90 and per-query tails
    # are reported but not gated — probes right after a heavy query's
    # pass land during JVM cleanup (observed 40-60 ms on a
    # canary-verified-clean window) and reflect self-load, not host
    # waves.
    suite_med_gate = 12.0
    ambient = {
        "suite_med_ms": round(med, 1) if med is not None else None,
        "suite_p90_ms": round(p90, 1) if p90 is not None else None,
        "n": len(all_samples),
        "gates_ms": {"suite_med": suite_med_gate},
        "clean": bool(med is not None and med < suite_med_gate),
        "clean_baseline_ms": "3-4 in-process (external canary: 15-24, "
        f"gates med<{MED_GATE_MS:g}/p90<{P90_GATE_MS:g})",
        "per_query_med_ms": {
            n: round(sorted(v)[len(v) // 2], 1)
            for n, v in ambient_by_query.items()
            if v
        },
    }
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_first_pass_sec": cold,
                "unconfirmed": sorted(unconfirmed),
                "ambient_ms": ambient,
                "sf": sf,
                "method": "noop sink; min of >=4 passes (>=7 for sub-second "
                "queries), extended to at most 10 until a recent pass lands "
                "within 5% of the min (noisy-sandbox stabilization); "
                "'cold_first_pass_sec' is each query's pass-1 time (caches "
                "cold + first-plan codegen) reported NEXT TO the min, which "
                "reuses a query's own scoped persists across its passes; "
                "'unconfirmed' lists queries that exhausted the cap with no "
                "later pass within 5% of their min; caches cleared between "
                "queries; 'ambient_ms' is a host-load canary (tools/"
                "canary.py's fixed numpy op, timed before every pass — "
                "never inside a timed pass): clean=false means a host "
                "CPU-steal wave rode the recording; see BASELINE.md "
                "'Idle-machine reference' for the regression-adjudication "
                "row",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
