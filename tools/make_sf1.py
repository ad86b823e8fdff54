"""Synthesize an sf1-equivalent dataset locally (10x sf0.1) for the
order-of-magnitude stress run (round-4 verdict item 5).

Round 4's 10x sweep (sf0.01 -> sf0.1) caught two real scale bugs the
driver gate cannot see (ANSI div-by-zero on exact-zero prices, int64
co-moment-combination overflow); sf1 is the next cliff. The recipe:

- ``events`` is replicated 10x with each copy shifted +k*32 days and
  +k*10^12 event ids — per-symbol tapes get 10x LONGER (more days),
  which is the stress the recursive/window/candle families need, and
  event ids stay unique for the dedup/tie-break contracts.
- ``documents`` / ``embeddings`` are replicated 10x with doc_id
  shifted +k*10^9 and text/vectors kept IDENTICAL — every document
  gains >=10 exact/near duplicates, so the LSH band buckets and the
  connected components see a realistic crawl-duplication blow-up
  (candidate pairs grow ~100x inside cliques; the quadratic-block
  caps in operators/skew.py are what this exercises).
- ``orders`` / ``lineitem`` are replicated 10x with orderkeys shifted
  +k*10^9 and all dates/values kept — the TPC-H filter windows keep
  their selectivity while aggregate/co-moment inputs grow 10x.
- dimensions (customer, supplier, part, nation, region) copy as-is.

Writes parquet to the target dir (default ``/root/repo/.stress/sf1``,
gitignored). Pure Spark — no driver-side row materialization.

Usage: python tools/make_sf1.py [src_dir] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPIES = 10


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.stress/sf1"

    from pyspark.sql import functions as F

    from auto_trade_data_pipeline_spark.session import get_spark
    from auto_trade_data_pipeline_spark.sources.files import load_table

    spark = get_spark("make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    def replicate(name: str, mutate):
        df = load_table(spark, src, name)
        parts = [mutate(df, k) for k in range(COPIES)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        tmp = f"{out}/__tmp_{name}"
        u.coalesce(8).write.mode("overwrite").parquet(tmp)
        # the corpus reads <dir>/<table>.parquet — a parquet DIRECTORY
        # under that name works for every reader (Spark and DuckDB)
        dst = f"{out}/{name}.parquet"
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.rename(tmp, dst)
        print(f"{name}: {u.columns} -> {dst}")

    def copy(name: str):
        df = load_table(spark, src, name)
        dst = f"{out}/{name}.parquet"
        if os.path.exists(dst):
            shutil.rmtree(dst)
        df.write.mode("overwrite").parquet(dst)
        print(f"{name}: copied")

    day32 = 32 * 86400

    replicate(
        "events",
        lambda df, k: df.withColumn(
            "event_id", F.col("event_id") + F.lit(k * 10**12)
        ).withColumn(
            "ts",
            F.timestamp_micros(
                (F.unix_micros(F.col("ts")) + F.lit(k * day32 * 1_000_000))
            ),
        ),
    )
    replicate(
        "documents",
        lambda df, k: df.withColumn("doc_id", F.col("doc_id") + F.lit(k * 10**9)),
    )
    replicate(
        "embeddings",
        lambda df, k: df.withColumn("vec_id", F.col("vec_id") + F.lit(k * 10**9)),
    )
    replicate(
        "orders",
        lambda df, k: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(k * 10**9)
        ),
    )
    replicate(
        "lineitem",
        lambda df, k: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * 10**9)
        ),
    )
    for t in ("customer", "supplier", "part", "nation", "region"):
        copy(t)
    print("done:", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
