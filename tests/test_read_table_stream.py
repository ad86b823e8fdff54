"""read_table_stream must stream a table in BOTH physical layouts —
the round-9 sf1 scale-edge find: a pathGlobFilter on the parent dir
only matches top-level FILE names, so a directory-shaped table
(Spark-written; every real deployment) silently streamed zero rows,
while a single-file table (the driver's testdata) is refused as a
stream basePath. Both layouts must yield the same rows."""

from __future__ import annotations

import glob
import shutil

from auto_trade_data_pipeline_spark.streaming import read_table_stream, run_available_now

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

ROWS = [(i, f"text {i}", "en", "web", 10) for i in range(25)]


def _drain(spark, sf_dir, name):
    stream = read_table_stream(spark, str(sf_dir), "documents", SCHEMA)
    out = run_available_now(
        stream.select("doc_id"), f"t_rts_{name}", output_mode="append"
    )
    return sorted(r["doc_id"] for r in out.collect())


def test_single_file_table_streams_all_rows(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA).coalesce(1)
    df.write.parquet(f"{tmp_path}/stage")
    part = glob.glob(f"{tmp_path}/stage/part-*.parquet")[0]
    sf_dir = tmp_path / "sf_file"
    sf_dir.mkdir()
    shutil.copy(part, sf_dir / "documents.parquet")
    assert _drain(spark, sf_dir, "file") == list(range(25))


def test_directory_table_streams_all_rows(spark, tmp_path):
    sf_dir = tmp_path / "sf_dir"
    sf_dir.mkdir()
    # Spark-written table: a DIRECTORY named documents.parquet with
    # multiple part files — the sf1 layout that used to stream zero rows.
    spark.createDataFrame(ROWS, SCHEMA).repartition(3).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    assert _drain(spark, sf_dir, "dir") == list(range(25))
