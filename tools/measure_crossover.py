"""Measure the JVM-fold vs numpy-kernel crossover that
``operators/jvm_folds.CROSSOVER_ROWS_PER_KEY`` encodes — the
empirical basis of the round-6 shape routing.

For a grid of tape lengths (rows per key, 5 keys — the testdata
symbol cardinality), times the SAME kalman+EMA scan through both
``scan_by_key`` arms (min of 3 passes each, noop-materialized) and
prints one JSON line per shape. The JVM arm's cost is linear in
elements at interpreted-lambda speed; the numpy arm pays a fixed
Python-worker + Arrow cost then ~10x-cheaper elements — so the lines
cross once, and the routing constant should sit near that crossing.

Usage: python tools/measure_crossover.py [rows_per_key ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRID = [512, 1024, 2048, 4096, 8192, 16384, 32768]
KEYS = int(os.environ.get("CROSSOVER_KEYS", "5"))
PASSES = 3


def main() -> int:
    import numpy as np

    from auto_trade_data_pipeline_spark.functions import ta
    from auto_trade_data_pipeline_spark.operators import jvm_folds as jf
    from auto_trade_data_pipeline_spark.session import get_spark

    spark = get_spark("crossover")
    spark.sparkContext.setLogLevel("ERROR")
    grid = [int(a) for a in sys.argv[1:]] or GRID

    def build(n):
        rng = np.random.RandomState(7)
        rows = []
        for k in range(KEYS):
            px = np.round(100.0 + np.cumsum(rng.randn(n) * 0.5), 4)
            rows += [(f"S{k}", i, float(px[i])) for i in range(n)]
        return spark.createDataFrame(rows, "symbol string, i int, close double")

    scans = {
        "kx": jf.kalman_scan_sql("transform(s, e -> e.close)", 1e-5, 0.01),
        "e12": jf.ema_scan_sql("transform(s, e -> e.close)", 12),
    }
    numpy_scans = {
        "kx": ("double", lambda pdf: ta.kalman_filter(pdf["close"].to_numpy(dtype=float), 1e-5, 0.01)),
        "e12": ("double", lambda pdf: ta.ema(pdf["close"].to_numpy(dtype=float), 12)),
    }

    for n in grid:
        df = build(n).persist()
        df.count()
        rec = {"rows_per_key": n, "keys": KEYS}
        for arm, rpk in (("jvm", 1), ("numpy", 10**9)):
            best = None
            for _ in range(PASSES):
                t0 = time.perf_counter()
                out = jf.scan_by_key(
                    df, ["symbol"], "i", ["close"], scans,
                    numpy_scans=numpy_scans, rows_per_key=rpk,
                )
                out.write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            rec[arm] = round(best, 3)
        rec["jvm_over_numpy"] = round(rec["jvm"] / rec["numpy"], 2)
        print(json.dumps(rec))
        df.unpersist()
    print(json.dumps({"routing_constant": jf.CROSSOVER_ROWS_PER_KEY}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
