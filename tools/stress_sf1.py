"""Order-of-magnitude stress run (round-4 verdict item 5): execute
the heaviest bench queries plus the overflow-sensitive families once
at sf1 (tools/make_sf1.py output) and at sf0.1, and record wall times
+ errors to STRESS_SF1.json (incrementally, so a crash preserves the
evidence up to the failing query).

Zero errors is the bar — Spark runs ANSI here, so int64 overflow,
div-by-zero, and cast truncation RAISE instead of silently corrupting
(the two round-4 scale-bug classes were caught exactly this way).
Times should scale ~linearly with input (LSH/CC families are expected
super-linear in the duplicate-clique blow-up the sf1 recipe builds
in; that's the stress, bounded by the skew caps).

Usage: python tools/stress_sf1.py [queries ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/repo/.stress/sf1"
SF01 = "/root/testdata/sf0.1"
OUT = "/root/repo/STRESS_SF1.json"

#: Heaviest bench queries + one per overflow-sensitive family:
#: co-moment combinations (symbol_corr_stats, rolling_corr_window),
#: distributed prefix sums (pps_sample_docs, gini_concentration),
#: LSH fan-out / CC (dedup_near_minhash_lsh, dedup_groups_cc,
#: llm_corpus_pipeline), long-tape recursions (full_enrichment,
#: indicators_recursive_pack, ema_recursive, kalman_price_smooth),
#: big aggregation/join (tpch_q1, tpch_q5, join_order_revenue,
#: candles_1s/cascade), histogram/training loops (bpe_train_merges).
QUERIES = [
    "candles_1s",
    "candles_cascade",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "join_order_revenue",
    "symbol_corr_stats",
    "rolling_corr_window",
    "rolling_window_features",
    "ema_recursive",
    "kalman_price_smooth",
    "heikin_ashi_candles",
    "holt_winters_smooth",
    "pps_sample_docs",
    "gini_concentration",
    "dedup_near_minhash_lsh",
    "dedup_groups_cc",
    "bpe_train_merges",
    "llm_corpus_pipeline",
    "indicators_recursive_pack",
    "full_enrichment",
]


def main() -> int:
    from auto_trade_data_pipeline_spark.corpus import load_all
    from auto_trade_data_pipeline_spark.session import get_spark

    only = sys.argv[1:]
    names = only or QUERIES
    spark = get_spark("stress_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    results = json.load(open(OUT)) if os.path.exists(OUT) else {}
    for name in names:
        q = reg[name]
        rec = results.get(name, {})
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            try:
                # Min of 2 passes: the first pass pays whole-stage
                # codegen JIT, which on the heavy shapes can inflate a
                # one-shot sf0.1 time 5-10x and turn the sf1/sf0.1
                # ratio into nonsense (a review finding: recorded
                # ratios < 1 at 10x the data). The ratio column is the
                # file's point, so both scales time warm.
                best, n = None, None
                for _ in range(2):
                    t0 = time.time()
                    n = q.fn(spark, sf_dir).count()
                    dt = round(time.time() - t0, 2)
                    best = dt if best is None else min(best, dt)
                rec[label] = {"rows": n, "sec": best}
            except Exception as exc:  # noqa: BLE001 - recorded, not masked
                rec[label] = {
                    "error": f"{type(exc).__name__}: {str(exc)[:400]}",
                }
                traceback.print_exc()
            finally:
                # Always drop caches — a failing pass must not leave
                # its persisted intermediates resident to skew (or
                # OOM) every later query's recorded time.
                spark.catalog.clearCache()
        r01, r1 = rec.get("sf0.1", {}), rec.get("sf1", {})
        if "sec" in r01 and "sec" in r1 and "error" not in r1 and r01["sec"] > 0:
            rec["ratio"] = round(r1["sec"] / r01["sec"], 2)
        results[name] = rec
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(name, json.dumps(rec))
    errs = [n for n, r in results.items() if "error" in r.get("sf1", {})]
    print(f"\n{len(results) - len(errs)}/{len(results)} clean; errors: {errs}")
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
