"""Streaming exact dedup (training-data ingest path).

Batch `exact_dedup` (operators/dedup.py:55) keeps the MIN-id row per
normalized text — a global decision a stream cannot make (future rows
are unknown). The streaming contract is the standard ingest one:
FIRST-SEEN wins across micro-batches (min-id within a micro-batch for
determinism), carried as per-hash keeper state via
``applyInPandasWithState``. When every batch arrives in id order the
two contracts coincide, which is the parity test
(tests/test_streaming.py).

State is one tiny row (keeper id) per DISTINCT document hash — the
streaming analogue of the batch groupBy's keyspace, partitioned the
same way. For boundless corpora set ``state_ttl`` so hashes idle
longer than the TTL are evicted (a later re-occurrence then counts as
a fresh keeper — the same trade Spark's own
``dropDuplicatesWithinWatermark`` makes; eviction is TIME-based, so a
hash that keeps recurring inside the TTL keeps its original keeper).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_DEDUP_STATE = T.StructType([T.StructField("keeper_id", T.StringType())])
_DEDUP_OUT = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("keeper_id", T.StringType()),
    T.StructField("is_duplicate", T.BooleanType()),
])


def _make_dedup_fn(ttl_ms: int | None):
    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        keeper = state.get[0] if state.exists else None
        ids: list[str] = []
        for pdf in pdfs:
            ids.extend(pdf["doc_id"].tolist())
        if not ids:
            return
        if keeper is None:
            keeper = min(ids)
        state.update((keeper,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({
            "doc_id": ids,
            "keeper_id": [keeper] * len(ids),
            "is_duplicate": [i != keeper for i in ids],
        })

    return fn


def stream_exact_dedup(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       state_ttl_minutes: int | None = None) -> DataFrame:
    """First-seen exact dedup over a streaming DataFrame: emits every
    input row annotated with (keeper_id, is_duplicate), keeper state
    carried across micro-batches per normalized-text hash."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    hashed = docs.select(F.col(id_col).cast("string").alias("doc_id"),
                         F.md5(norm).alias("_h"))
    ttl_ms = (None if state_ttl_minutes is None
              else state_ttl_minutes * 60_000)
    timeout = (GroupStateTimeout.NoTimeout if ttl_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (hashed.groupBy("_h")
            .applyInPandasWithState(_make_dedup_fn(ttl_ms), _DEDUP_OUT,
                                    _DEDUP_STATE, "append", timeout))
