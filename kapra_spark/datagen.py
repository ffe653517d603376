"""Deterministic synthetic tokens table (FIXTURES.md F-1).

Canonical input shape (BASELINE.json input_hint):
    doc_id: string, tokens: array<int32>, n_tok: int32, source: string

Generation is *per-row deterministic* (seed derived from the row index
alone), so any partitioning / parallelism / scale produces the same
rows — the property that lets bench runs at local[8] and local[32]
consume identical data, and lets a 1000-executor cluster regenerate any
split independently.

A configurable fraction of series starts with a run of ``-1`` sentinel
values, mimicking the reference's Facebook "not published yet"
placeholders (visible in data/facebook_palestine.csv row 2), which the
reference leaves untouched and our gap-fill/LOCF path repairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SOURCES = ["sales", "palestine", "microsoft", "economy"]
# Zipf-ish skew on purpose: one hot source dominates, exercising the
# salted repartitioning path (SURVEY.md §7.4 risk 4).
SOURCE_WEIGHTS = np.array([0.55, 0.25, 0.15, 0.05])

TOKENS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), True), False),
    T.StructField("n_tok", T.IntegerType(), False),
    T.StructField("source", T.StringType(), False),
])


def _gen_rows(ids: np.ndarray, n_tok: int, seed: int, gap_fraction: float) -> pd.DataFrame:
    """Generation for a batch of row indices: per-row seeded draws, but
    the AR(1) walk itself is vectorized across the batch (loop over
    time steps, not rows)."""
    rows = len(ids)
    steps = np.empty((rows, n_tok), dtype=np.int64)
    starts = np.empty(rows, dtype=np.int64)
    gap_u = np.empty(rows)
    gap_len = np.empty(rows, dtype=np.int64)
    src_u = np.empty(rows)
    for r, i in enumerate(ids):
        rng = np.random.default_rng(seed * 1_000_000_007 + int(i))
        steps[r] = rng.integers(-3, 4, size=n_tok)
        starts[r] = rng.integers(0, 100)
        gap_u[r] = rng.random()
        gap_len[r] = rng.integers(1, max(2, n_tok // 4))
        src_u[r] = rng.random()

    vals = np.empty((rows, n_tok), dtype=np.int64)
    v = starts
    for j in range(n_tok):
        v = np.maximum(0, v + steps[:, j])
        vals[:, j] = v

    has_gap = gap_u < gap_fraction
    col = np.arange(n_tok)[None, :]
    vals = np.where(has_gap[:, None] & (col < gap_len[:, None]), -1, vals)

    cum = np.cumsum(SOURCE_WEIGHTS)
    src_idx = np.searchsorted(cum, src_u)
    vals32 = vals.astype(np.int32)
    # plain-Python lists, NOT np.int32 arrays: a non-Arrow
    # createDataFrame path (driver harnesses without
    # spark.sql.execution.arrow.pyspark.enabled) type-verifies each
    # element and rejects numpy scalars
    return pd.DataFrame({
        "doc_id": [f"d{int(i):08d}" for i in ids],
        "tokens": vals32.tolist(),
        "n_tok": np.full(rows, n_tok, dtype=np.int32),
        "source": [SOURCES[i] for i in src_idx],
    })


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (Steele/Lea/Flood 2014, public
    domain reference constants) — a counter-based hash usable as an
    RNG: mix(counter) is i.i.d.-quality uniform over uint64."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        x ^= x >> np.uint64(30)
        x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
        x ^= x >> np.uint64(27)
        x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
        return x ^ (x >> np.uint64(31))


def _gen_rows_fast(ids: np.ndarray, n_tok: int, seed: int,
                   gap_fraction: float) -> pd.DataFrame:
    """Fully vectorized generation via splitmix64 COUNTER streams: every
    draw is mix(seed, row_id, stream, position) — no per-row Generator
    objects at all (the legacy path seeds one numpy Generator per row,
    which dominated bench setup). Same logical shape (AR(1) walk, gap
    prefixes, zipf sources) and the same per-row-determinism guarantee;
    the VALUES differ from the legacy path, so pinned fixtures keep
    using :func:`_gen_rows` while bench/scaling setup uses this."""
    rows = len(ids)
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        base = (np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
                + ids.astype(np.uint64) * np.uint64(0x2545F4914F6CDD1D))
        # stream 0: per-position step draws in [-3, 3]
        ctr = base[:, None] + np.uint64(1_000_003) * np.arange(
            1, n_tok + 1, dtype=np.uint64)[None, :]
        steps = (_splitmix64(ctr) % np.uint64(7)).astype(np.int64) - 3

        # streams 1..4: start, gap uniform, gap length, source uniform
        def u(stream: int) -> np.ndarray:
            return _splitmix64(
                base + np.uint64(stream) * np.uint64(0xD6E8FEB86659FD93))
        starts = (u(1) % np.uint64(100)).astype(np.int64)
        gap_u = (u(2) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        gap_len = (u(3) % np.uint64(max(1, n_tok // 4 - 1))
                   + np.uint64(1)).astype(np.int64)
        src_u = (u(4) >> np.uint64(11)).astype(np.float64) / float(1 << 53)

    # clamp-at-0 walk v_j = max(0, v_{j-1} + s_j) vectorized exactly via
    # the Lindley/reflection identity v_j = c_j - min(0, min_{k<=j} c_k)
    # with c_j = start + cumsum(s)
    c = starts[:, None] + np.cumsum(steps, axis=1)
    vals = c - np.minimum.accumulate(np.minimum(c, 0), axis=1)

    has_gap = gap_u < gap_fraction
    col = np.arange(n_tok)[None, :]
    vals = np.where(has_gap[:, None] & (col < gap_len[:, None]), -1, vals)

    cum = np.cumsum(SOURCE_WEIGHTS)
    src_idx = np.searchsorted(cum, src_u)
    vals32 = vals.astype(np.int32)
    return pd.DataFrame({
        "doc_id": [f"d{int(i):08d}" for i in ids],
        "tokens": vals32.tolist(),
        "n_tok": np.full(rows, n_tok, dtype=np.int32),
        "source": [SOURCES[i] for i in src_idx],
    })


def tokens_pdf(n: int, n_tok: int = 144, seed: int = 42,
               gap_fraction: float = 0.15) -> pd.DataFrame:
    """Driver-side generation (tests, small fixtures)."""
    return _gen_rows(np.arange(n), n_tok, seed, gap_fraction)


def neardup_docs_pdf(n_base: int = 120, n_exact: int = 12,
                     n_variant: int = 12, seed: int = 5) -> pd.DataFrame:
    """Deterministic corpus with PLANTED duplicates for self-verifying
    near-dup checks: ``docNNNN`` are random-word texts; ``xNNNN`` is an
    exact copy of doc i (i < n_exact, simhash hamming 0 by
    construction); ``vNNNN`` is doc i with one character changed
    (n_exact <= i < n_exact+n_variant, hamming small). Random base
    docs share essentially no shingles, so recovered pairs = planted
    pairs."""
    rng = np.random.default_rng(seed)
    vocab = [f"tok{j:04d}" for j in range(4000)]
    ids, texts = [], []
    base: list[str] = []
    for i in range(n_base):
        words = rng.integers(0, len(vocab), size=60)
        t = " ".join(vocab[w] for w in words)
        base.append(t)
        ids.append(f"doc{i:04d}")
        texts.append(t)
    for i in range(n_exact):
        ids.append(f"x{i:04d}")
        texts.append(base[i])
    for i in range(n_exact, n_exact + n_variant):
        t = base[i]
        ids.append(f"v{i:04d}")
        texts.append(t[:10] + ("z" if t[10] != "z" else "q") + t[11:])
    return pd.DataFrame({"doc_id": ids, "text": texts})


def tokens_df(spark: SparkSession, n: int, n_tok: int = 144, seed: int = 42,
              gap_fraction: float = 0.15, partitions: int | None = None,
              fast: bool = False) -> DataFrame:
    """Distributed generation via mapInPandas over spark.range — scales
    to any N because each task generates only its own id range.
    ``fast=True`` uses the vectorized counter-stream generator (same
    shape and determinism, different values — bench/scaling setup);
    the default keeps the legacy per-row-Generator values that the
    pinned correctness fixtures were digested from."""
    if partitions is None:
        partitions = max(8, n // 25_000)
    gen_rows = _gen_rows_fast if fast else _gen_rows

    def gen(batches):
        for pdf in batches:
            yield gen_rows(pdf["id"].to_numpy(), n_tok, seed, gap_fraction)

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, TOKENS_SCHEMA)
