"""Streaming LSH near-dup filter — split-parity with the relational
earliest-occupant definition, and the cross-batch index contract (a
duplicate arriving BATCHES after its original must still be caught)."""

from __future__ import annotations

import glob
import shutil

import pytest

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.operators import text as TX
from auto_trade_data_pipeline_spark.operators.text import _banded
from auto_trade_data_pipeline_spark.streaming import run_available_now
from auto_trade_data_pipeline_spark.streaming.lsh import streaming_lsh_flags

DOCS = "doc_id long, text string"

_PERMS, _RPB = 8, 2


def _docs():
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "machine learning models trained on large corpora need careful dedup",
        "sparkling water flows down the mountain into the quiet green valley",
        "completely different text about astronomy stars galaxies and nebulae",
    ]
    rows = []
    for i in range(40):
        if i % 5 == 4:
            # Near-verbatim copy of a much earlier doc (one word changed).
            src = base[i % len(base)].replace("the", "a", 1)
        else:
            src = base[i % len(base)] + f" unique tail {i} " + "pad " * (i % 3)
        rows.append((i, src))
    return rows


def _stream_dir(spark, tmp_path, batches):
    data_dir = tmp_path / "lsh_stream"
    data_dir.mkdir()
    for b, rows in enumerate(batches):
        df = spark.createDataFrame(rows, DOCS).coalesce(1)
        df.write.parquet(f"{tmp_path}/ls{b}")
        for i, f in enumerate(glob.glob(f"{tmp_path}/ls{b}/part-*.parquet")):
            shutil.copy(f, data_dir / f"f_{b}_{i}.parquet")
    return str(data_dir)


def _sig(df):
    sh = TX.shingles_array(TX.tokens(F.col("text")))
    return df.select("doc_id", *TX.minhash_cols_expr(sh, _PERMS)).filter(
        F.col("mh0").isNotNull()
    )


def _expected(spark, rows):
    """Relational definition: nearest smaller doc_id sharing a bucket."""
    bands = _banded(_sig(spark.createDataFrame(rows, DOCS)), "doc_id", _PERMS, _RPB)
    a, b = bands.alias("a"), bands.alias("b")
    earlier = (
        b.join(
            a,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
            "left",
        )
        .groupBy(F.col("b.doc_id").alias("doc_id"))
        .agg(F.min(F.col("a.doc_id")).alias("nearest_earlier"))
    )
    return {
        r["doc_id"]: r["nearest_earlier"] for r in earlier.collect()
    }


def _streamed(spark, tmp_path, batches, name):
    path = _stream_dir(spark, tmp_path, batches)
    stream = (
        spark.readStream.format("parquet")
        .schema(DOCS)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    flags = streaming_lsh_flags(_banded(_sig(stream), "doc_id", _PERMS, _RPB))
    out = run_available_now(flags, f"t_stream_lsh_{name}", output_mode="append")
    final = out.groupBy("doc_id").agg(F.min("earlier").alias("nearest_earlier"))
    return {r["doc_id"]: r["nearest_earlier"] for r in final.collect()}


@pytest.mark.parametrize("splits", [1, 4])
def test_streamed_flags_equal_relational_definition(spark, tmp_path, splits):
    rows = _docs()
    k = len(rows) // splits
    batches = [rows[i * k : (i + 1) * k] for i in range(splits - 1)]
    batches.append(rows[(splits - 1) * k :])
    got = _streamed(spark, tmp_path, batches, f"s{splits}")
    want = _expected(spark, rows)
    assert got == want
    # The corpus engineered real near-dups: some doc must be flagged.
    assert any(v is not None for v in got.values())


def test_duplicate_across_batch_boundary_is_caught(spark, tmp_path):
    text = "an exact duplicate crossing the micro batch boundary is the point"
    rows0 = [(0, text), (1, "some unrelated filler text with many extra words here")]
    rows1 = [(2, text)]  # arrives one batch later
    got = _streamed(spark, tmp_path, [rows0, rows1], "xb")
    assert got[2] == 0 and got[0] is None
