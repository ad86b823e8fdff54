"""Multimodal column plumbing (EXT, SURVEY §2.11): opaque binary
payloads + typed metadata structs, processed by Arrow-batched
``mapInPandas`` kernels.

The image/audio codec libraries are not present in this environment,
so the *decode* step is a clearly-marked deterministic stand-in
(:func:`fake_decode_stats`) — byte-level arithmetic standing where
PIL/ffmpeg would run. Everything around it is the real production
shape: BinaryType column, metadata struct, mapInPandas with bounded
Arrow batches, output schema declared up front. Swapping the stand-in
for a real codec changes one pandas function and nothing else.

Scale notes: mapInPandas streams record batches (no whole-partition
materialization), the payload column stays off the shuffle until
after feature extraction, and feature rows are small — the classic
"extract early, drop the blob" pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attach_payload", "decode_stats"]

#: Output schema of the pseudo-decoder — what a real image decoder
#: would emit (dims + byte stats) with deterministic fake values.
DECODE_SCHEMA = (
    "doc_id bigint, lang string, n_bytes int, width int, height int, channels int"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Wrap a text table into the multimodal layout: opaque binary
    `payload` + `meta` struct. In production the payload would come
    from an object store; encoding the text keeps it deterministic."""
    return docs.select(
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("doc_id"), F.col("lang"), F.col("source"), F.col("n_chars")
        ).alias("meta"),
    )


def fake_decode_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder (no codec libs in this container): derives
    image-like dimensions from the byte length deterministically.
    A real implementation would `PIL.Image.open(io.BytesIO(payload))`
    here; the batch shape, schema, and streaming contract are what
    production code uses."""
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["meta"].map(lambda m: m["doc_id"]),
                "lang": pdf["meta"].map(lambda m: m["lang"]),
                "n_bytes": n_bytes.astype("int32"),
                "width": (n_bytes % 64 + 1).astype("int32"),
                "height": (n_bytes // 64 % 64 + 1).astype("int32"),
                "channels": pd.Series([3] * len(pdf), index=pdf.index, dtype="int32"),
            }
        )


def decode_stats(docs: DataFrame) -> DataFrame:
    """Binary payload -> per-document decode features via mapInPandas
    (Arrow-batched; one Python worker per task, no driver collect)."""
    return attach_payload(docs).mapInPandas(fake_decode_stats, schema=DECODE_SCHEMA)
