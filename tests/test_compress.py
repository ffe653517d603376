"""Gorilla compression tests: kernel round-trips + Spark-level
token-array equality (the BASELINE.json per-row invariant)."""

import numpy as np
import pytest

from kapra_spark import datagen
from kapra_spark.functions import gorilla as G


def test_kernel_roundtrip_token_walks():
    rng = np.random.default_rng(7)
    vals = np.maximum(np.cumsum(rng.integers(-3, 4, size=(100, 144)), axis=1) + 40, 0)
    ts = np.arange(144)[None, :].repeat(100, axis=0) * 60 + 1704067200
    t0, v0, n, p = G.encode_batch(ts, vals)
    dts, dvals = G.decode_batch(t0, v0, n, p)
    assert np.array_equal(dts, ts)
    assert np.array_equal(dvals, vals)
    bits_pp = sum(len(x) for x in p) * 8 / vals.size
    assert bits_pp < 20  # >4.8x vs raw 96-bit (ts+value)


def test_kernel_roundtrip_adversarial():
    rng = np.random.default_rng(8)
    cases = [
        (np.sort(rng.integers(0, 10**9, size=(20, 50)), axis=1),
         rng.integers(-2**62, 2**62, size=(20, 50))),
        (np.arange(10)[None, :].repeat(3, axis=0), np.full((3, 10), -1)),
        (np.array([[0, 1]]), np.array([[np.iinfo(np.int64).min, np.iinfo(np.int64).max]])),
        (np.array([[5]]), np.array([[42]])),  # single point
    ]
    for ts, vals in cases:
        t0, v0, n, p = G.encode_batch(ts, vals)
        for i in range(len(p)):
            dts, dv = G.decode_block(int(t0[i]), int(v0[i]), int(n[i]), p[i])
            assert np.array_equal(dts, ts[i])
            assert np.array_equal(dv, vals[i])


def test_single_and_batch_decoders_agree():
    rng = np.random.default_rng(9)
    vals = rng.integers(-1000, 1000, size=(30, 77))
    ts = np.cumsum(rng.integers(1, 100, size=(30, 77)), axis=1)
    t0, v0, n, p = G.encode_batch(ts, vals)
    bts, bvals = G.decode_batch(t0, v0, n, p)
    for i in range(30):
        sts, svals = G.decode_block(int(t0[i]), int(v0[i]), int(n[i]), p[i])
        assert np.array_equal(sts, bts[i]) and np.array_equal(svals, bvals[i])


@pytest.mark.parametrize("n_tok", [144, 1500])  # single-day and multi-day
def test_spark_roundtrip_token_array_equality(spark, n_tok):
    from kapra_spark.operators.compress import compress_tokens, decompress_tokens

    pdf = datagen.tokens_pdf(40, n_tok=n_tok, seed=5, gap_fraction=0.2)
    df = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)
    blocks = compress_tokens(df)
    back = decompress_tokens(blocks).toPandas()

    orig = {r.doc_id: list(r.tokens) for r in pdf.itertuples()}
    got: dict[str, list] = {}
    # multi-day series come back day-block by day-block; reassemble in
    # t0 order (decompress_tokens carries the block start timestamp)
    for r in back.sort_values(["doc_id", "t0"]).itertuples():
        got.setdefault(r.doc_id, []).extend(r.tokens)
    for k, v in orig.items():
        assert got[k] == v, k


def test_compression_ratio_reported(spark):
    from kapra_spark.operators.compress import compress_tokens
    import pyspark.sql.functions as F

    pdf = datagen.tokens_pdf(64, n_tok=144, seed=6)
    df = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)
    blocks = compress_tokens(df)
    stats = blocks.agg(F.sum(F.length("payload")).alias("bytes"),
                       F.sum("n").alias("points")).collect()[0]
    bits_pp = stats["bytes"] * 8 / stats["points"]
    assert bits_pp < 20


def test_fused_compress_and_cascade(spark):
    """The fused single-pass operator must equal compress_tokens +
    cascade_fast exactly (same kernels, one scan)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from kapra_spark import datagen
    from kapra_spark.operators.compress import (compress_and_cascade,
                                                compress_tokens)
    from kapra_spark.operators.rollup import cascade_fast

    pdf = datagen.tokens_pdf(80, n_tok=144, seed=3, gap_fraction=0.2)
    tokens = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)

    fused = compress_and_cascade(tokens, tiers=("1h", "1d")).cache()
    blocks_f = (fused.filter("kind = 'block'")
                .select("doc_id", "source", "bucket_day", "t0", "v0",
                        "n", "payload").toPandas()
                .sort_values(["doc_id", "t0"]).reset_index(drop=True))
    tiers_f = (fused.filter("kind = 'tier'")
               .select("tier", "source", "doc_id", "bucket", "cnt", "sum",
                       "min", "max", "first", "last", "n_filled").toPandas()
               .sort_values(["tier", "doc_id", "bucket"]).reset_index(drop=True))

    blocks = (compress_tokens(tokens)
              .select("doc_id", "source", "bucket_day", "t0", "v0",
                      "n", "payload").toPandas()
              .sort_values(["doc_id", "t0"]).reset_index(drop=True))
    tiers = (cascade_fast(tokens, tiers=("1h", "1d"))
             .select("tier", "source", "doc_id", "bucket", "cnt", "sum",
                     "min", "max", "first", "last", "n_filled").toPandas()
             .sort_values(["tier", "doc_id", "bucket"]).reset_index(drop=True))

    pd.testing.assert_frame_equal(blocks_f, blocks)
    pd.testing.assert_frame_equal(tiers_f, tiers)
    fused.unpersist()
