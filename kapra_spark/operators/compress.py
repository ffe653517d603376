"""Gorilla-compressed block storage for the 1m tier (SURVEY.md F7,
FIXTURES.md F-5).

At 10^12 sequences the raw 1-minute tier is the volume problem: one
row per token. These operators store it as one compressed block per
(series, UTC day) — ~14 bits/point on token walks vs 96+ raw — via a
single narrow ``mapInArrow`` pass (no shuffle: each input row carries
its whole series). Decompression is the exact inverse; round-trip
token-array equality is the per-row invariant (BASELINE.json
input_hint) and is enforced in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import gorilla
from .rollup import EPOCH_SECONDS

BLOCKS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("source", T.StringType(), False),
    T.StructField("tier", T.StringType(), False),
    T.StructField("bucket_day", T.DateType(), False),
    T.StructField("t0", T.LongType(), False),
    T.StructField("v0", T.LongType(), False),
    T.StructField("n", T.IntegerType(), False),
    T.StructField("payload", T.BinaryType(), True),
])

_ARROW_BLOCKS = pa.schema([
    ("doc_id", pa.string()),
    ("source", pa.string()),
    ("tier", pa.string()),
    ("bucket_day", pa.date32()),
    ("t0", pa.int64()),
    ("v0", pa.int64()),
    ("n", pa.int32()),
    ("payload", pa.binary()),
])

TOKENS_ARROW = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])


def _list_to_matrix(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """ListArray -> (flat values, offsets); caller reshapes when the
    batch is rectangular."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy()
    flat = col.values.to_numpy(zero_copy_only=False)
    return flat, offsets


def compress_tokens(tokens_df: DataFrame, tier: str = "1m") -> DataFrame:
    """tokens table -> Gorilla blocks, one per (doc_id, day). For the
    canonical 144-token (one day at 1-minute grain) series this is one
    block per series; longer series split on UTC-day boundaries."""

    def fn(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            n_tok = rb.column(2).to_numpy()
            flat, offsets = _list_to_matrix(rb.column(1))
            out_cols: dict[str, list] = {k: [] for k in
                                         ("take", "bucket_day", "t0", "v0", "n", "payload")}
            for nt in np.unique(n_tok):
                idx = np.nonzero(n_tok == nt)[0]
                starts = offsets[idx]
                vals = flat[starts[:, None] + np.arange(nt)[None, :]].astype(np.int64)
                pos0 = 0
                day_pts = 1440
                for s in range(0, int(nt), day_pts):
                    e = min(s + day_pts, int(nt))
                    ts = (EPOCH_SECONDS + (np.arange(s, e, dtype=np.int64) * 60))
                    ts2d = np.broadcast_to(ts, (len(idx), e - s))
                    t0a, v0a, na, payloads = gorilla.encode_batch(ts2d, vals[:, s:e])
                    out_cols["take"].append(idx)
                    out_cols["bucket_day"].append(
                        np.full(len(idx), (EPOCH_SECONDS + s * 60) // 86400, dtype=np.int32))
                    out_cols["t0"].append(t0a)
                    out_cols["v0"].append(v0a)
                    out_cols["n"].append(na.astype(np.int32))
                    out_cols["payload"].append(payloads)
            take = pa.array(np.concatenate(out_cols["take"]), type=pa.int64())
            payloads_all: list[bytes] = []
            for p in out_cols["payload"]:
                payloads_all.extend(p)
            yield pa.RecordBatch.from_arrays([
                rb.column(0).take(take),
                rb.column(3).take(take),
                pa.array(["1m"] * len(take), type=pa.string()),
                pa.array(np.concatenate(out_cols["bucket_day"]), type=pa.date32()),
                pa.array(np.concatenate(out_cols["t0"]), type=pa.int64()),
                pa.array(np.concatenate(out_cols["v0"]), type=pa.int64()),
                pa.array(np.concatenate(out_cols["n"]), type=pa.int32()),
                pa.array(payloads_all, type=pa.binary()),
            ], schema=_ARROW_BLOCKS)

    return tokens_df.mapInArrow(fn, BLOCKS_SCHEMA)


def decompress_tokens(blocks_df: DataFrame) -> DataFrame:
    """Gorilla blocks -> tokens table (exact inverse for single-day
    series; multi-day series come back as one row per day-block, join
    on doc_id + sort by t0 to reassemble)."""
    from kapra_spark.datagen import TOKENS_SCHEMA

    def fn(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            t0 = rb.column(4).to_numpy()
            v0 = rb.column(5).to_numpy()
            n = rb.column(6).to_numpy().astype(np.int64)
            payloads = rb.column(7).to_pylist()
            toks_out = []
            order = []
            for nt in np.unique(n):
                idx = np.nonzero(n == nt)[0]
                _, vals2d = gorilla.decode_batch(
                    t0[idx], v0[idx], n[idx], [payloads[i] for i in idx])
                toks_out.append(vals2d.astype(np.int32))
                order.append(idx)
            order_all = np.concatenate(order)
            inv = pa.array(order_all, type=pa.int64())
            flat_lists = pa.array(
                [row for block in toks_out for row in block],
                type=pa.list_(pa.int32()))
            yield pa.RecordBatch.from_arrays([
                rb.column(0).take(inv),
                flat_lists,
                pa.array(np.concatenate([np.full(len(i), nt, dtype=np.int32)
                                         for nt, i in zip(np.unique(n), order)]),
                         type=pa.int32()),
                rb.column(1).take(inv),
            ], schema=TOKENS_ARROW)

    return blocks_df.mapInArrow(fn, TOKENS_SCHEMA)
