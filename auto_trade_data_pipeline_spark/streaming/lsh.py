"""Streaming MinHash-LSH near-duplicate filtering — ingest-time dedup
against everything previously seen, the streaming twin of the batch
``dedup_near_minhash_lsh`` candidate stage.

The signature is computed STATELESSLY per arriving document
(operators/text.py:minhash_cols_expr — pure expressions, identical
arithmetic to the batch groupBy path) and banded with the same inline
band-hash array as the batch `_banded`. The ONLY state is the LSH
index itself: one cell per (band_idx, band_hash) bucket holding the
minimum doc id ever seen there — exactly the structure a 100 TB/day
ingest keeps warm. Each arriving document emits, per band, the
earliest prior occupant of its bucket (NULL if it opens the bucket);
the post-drain readout reduces that to per-document (is_dup,
nearest_earlier).

Emission contract: a (doc, band) row is emitted exactly once, in the
document's arrival micro-batch, and its value is final (the bucket
minimum can only involve EARLIER documents). With documents arriving
in doc_id order across micro-batches (each batch sorted internally),
"earliest prior occupant" equals "minimum smaller doc_id sharing the
bucket" — a relational statement, so the corpus query carries a full
SQL oracle for this stateful operator.

State size: O(distinct buckets) cells of one long each — the same
asymptotics as the stored-signature table the incremental batch dedup
(`dedup_incremental_delta`) joins against, kept in streaming state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_lsh_flags"]

_STATE_SCHEMA = "min_id long"

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("earlier", T.LongType()),  # NULL = opened the bucket
    ]
)

_OUT_COLS = [f.name for f in _OUT_SCHEMA.fields]


def _bucket_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (min_id,) = state.get if state.exists else (None,)

    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch) == 0:
        yield pd.DataFrame(columns=_OUT_COLS)
        return
    batch = batch.sort_values("doc_id", kind="mergesort")

    rows = []
    for doc_id in batch["doc_id"]:
        doc_id = int(doc_id)
        rows.append((doc_id, min_id if (min_id is not None and min_id < doc_id) else None))
        if min_id is None or doc_id < min_id:
            min_id = doc_id
    state.update((int(min_id),))
    yield pd.DataFrame(rows, columns=_OUT_COLS)


def streaming_lsh_flags(banded: DataFrame) -> DataFrame:
    """``banded``: streaming (doc_id, band_idx, band_hash) rows.
    Returns the per-(doc, band) stream of earliest prior bucket
    occupants, append-mode."""
    return banded.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _bucket_fn,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
