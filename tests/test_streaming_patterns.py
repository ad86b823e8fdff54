"""Streaming CEP pattern matching: multi-batch replay parity with the
batch lag/lead formulation, including matches that FINALIZE in a later
micro-batch than the tick that completed the pattern."""

from __future__ import annotations

import uuid
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.streaming.patterns import streaming_pattern_matches

BASE = datetime(2024, 1, 2, 14, 30, 0)
SCHEMA = "symbol string, timestamp timestamp, price double, volume double, tick_id long"


def _ticks():
    # Symbol A: steady rise -> many three_up completions; one volume
    # spike late. Symbol B: sawtooth -> no three_up runs.
    rows = []
    price = 100.0
    for i in range(40):
        price += 0.5 if i not in (10, 20, 30) else -1.0
        vol = 800.0 if i == 33 else 10.0
        rows.append(("A", BASE + timedelta(seconds=i), price, vol, i))
    p = 50.0
    for i in range(40):
        p += 0.5 if i % 2 == 0 else -0.5
        rows.append(("B", BASE + timedelta(seconds=i), p, 10.0, 100 + i))
    return rows


def _batch_expected(spark, df):
    """Batch twin restricted to finalized matches (2 later ticks)."""
    from pyspark.sql.window import Window

    wo = Window.partitionBy("symbol").orderBy("timestamp", "tick_id")
    up = F.when(F.col("price") > F.lag("price").over(wo), 1).otherwise(0)
    seq = df.select(
        "*", up.alias("up"), F.avg("volume").over(wo.rowsBetween(-20, -1)).alias("va")
    )
    three = (
        (F.col("up") == 1)
        & (F.lag("up", 1).over(wo) == 1)
        & (F.lag("up", 2).over(wo) == 1)
    )
    spike = F.when(F.col("va").isNotNull() & (F.col("volume") > 3 * F.col("va")), 1).otherwise(0)
    flags = seq.select("*", three.alias("three"), spike.alias("spike"))
    near = F.greatest(
        F.col("spike"),
        F.coalesce(F.lead("spike", 1).over(wo), F.lit(0)),
        F.coalesce(F.lead("spike", 2).over(wo), F.lit(0)),
    )
    m = flags.select(
        "symbol", "timestamp", "price", "tick_id",
        F.col("three"),
        near.alias("near"),
        F.lead("tick_id", 2).over(wo).alias("fin"),
    ).filter(F.col("three") & F.col("fin").isNotNull())
    return sorted(
        (r.symbol, r.tick_id, r.price, r.near) for r in m.collect()
    )


def test_streaming_pattern_multibatch_equals_batch(spark, tmp_path):
    rows = _ticks()
    d = str(tmp_path / "ticks")
    # Three arrival-ordered files -> three micro-batches; several
    # three_up ticks sit within 2 ticks of a file boundary, so their
    # confirmation arrives in the NEXT batch.
    for lo, hi in ((0, 13), (13, 27), (27, 40)):
        chunk = [r for r in rows if (r[4] % 100) in range(lo, hi)]
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    )
    name = f"t_cep_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_pattern_matches(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.symbol, r.tick_id, r.price, r.volume_confirmed)
        for r in spark.table(name).collect()
    )
    expected = _batch_expected(spark, spark.createDataFrame(rows, SCHEMA))
    assert got == expected
    # The data genuinely exercises the pattern: A matches, B none,
    # and at least one match is volume-confirmed.
    assert any(s == "A" for s, *_ in got)
    assert not any(s == "B" for s, *_ in got)
    assert any(c == 1 for *_, c in got)


def test_streaming_pattern_single_batch_matches_too(spark, tmp_path):
    rows = _ticks()
    d = str(tmp_path / "one")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(d)
    stream = spark.readStream.schema(SCHEMA).parquet(d)
    name = f"t_cep1_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_pattern_matches(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.symbol, r.tick_id, r.price, r.volume_confirmed)
        for r in spark.table(name).collect()
    )
    assert got == _batch_expected(spark, spark.createDataFrame(rows, SCHEMA))


def test_streaming_pattern_restart_carries_state(spark, tmp_path):
    """TRUE restart: two separate availableNow runs share one
    checkpoint — the second run must resume the keyed state (tail
    buffer + watermark) written by the first, so matches whose
    confirmation arrives after the restart still emit exactly once."""
    rows = _ticks()
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    first = [r for r in rows if (r[4] % 100) < 20]
    second = [r for r in rows if (r[4] % 100) >= 20]

    def run():
        # foreachBatch parquet sink: unlike the memory sink, it
        # supports restarting from an existing checkpoint.
        stream = spark.readStream.schema(SCHEMA).parquet(src)

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            streaming_pattern_matches(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return [
            (r.symbol, r.tick_id, r.price, r.volume_confirmed)
            for r in spark.read.parquet(out_dir).collect()
        ]

    spark.createDataFrame(first, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    out1 = run()

    spark.createDataFrame(second, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    all_out = run()
    out2 = [t for t in all_out if t not in out1 or all_out.count(t) > out1.count(t)]

    got = sorted(all_out)
    expected = _batch_expected(spark, spark.createDataFrame(rows, SCHEMA))
    assert got == expected
    # The restart genuinely mattered: some matches finalize only in
    # run 2, and no match is emitted twice.
    assert out1 and out2
    assert len(got) == len(set(got))
