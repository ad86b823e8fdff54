

def test_stream_upsert_writer_rejects_remote_uri(tmp_path):
    """Commit markers are driver-local os.rename files; a remote URI
    would silently degrade exactly-once to value-idempotence. The sink
    must refuse remote schemes and accept local paths."""
    import pytest

    from auto_trade_data_pipeline_spark.streaming.sink import (
        committed_batches,
        stream_upsert_writer,
    )

    with pytest.raises(ValueError, match="local filesystem"):
        stream_upsert_writer("s3a://bucket/table", ["k"], "ts")
    with pytest.raises(ValueError, match="local filesystem"):
        committed_batches("hdfs://nn/table")
    stream_upsert_writer(str(tmp_path / "t"), ["k"], "ts")
    stream_upsert_writer(f"file://{tmp_path}/t", ["k"], "ts")
