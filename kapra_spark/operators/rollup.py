"""Rollup cascade + gap-fill + retention (SURVEY.md A10/W1/J4).

The reference's data model has time implicit in column position
(weekly / 20-minute grids, reference includes/io.py:114-134) and does
NOT handle its ``-1`` "not published yet" placeholders. This module is
the principled Spark-native replacement: position -> timestamp, LOCF
gap-fill, and a 1m/1h/1d continuous-aggregate cascade where every
aggregate is re-aggregable (count/sum/min/max/first/last), so each
tier derives from the previous one, never from raw data.

Scale design (the part that matters at 10^12 sequences):

- ZERO shuffles for the tokens cascade (r6): each input row carries its
  whole series, so every tier is computed array-locally in a narrow
  ``mapInArrow`` pass — no explode, no window sort, no per-point hash
  aggregate (tests/test_rollup.py::test_cascade_zero_shuffle_plan).
  The declarative long-form plan survives as
  :func:`cascade_declarative` (exactly ONE shuffle: the upfront
  ``repartition(source, doc_id)`` that the LOCF window and every tier
  groupBy reuse — ::test_single_shuffle_plan); it is the independent
  implementation backing the parity certificates.
- The tokens fast path never explodes to long form at all: one
  ``mapInArrow`` pass reshapes each Arrow batch in NumPy and emits
  per-tier buckets directly — zero shuffles, linear scan, exact
  integer arithmetic (token-array equality is preserved end-to-end).
- first/last use min_by/max_by on the bucket/position, not
  order-dependent ``first()``, so results are partition-layout
  independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EPOCH = "2024-01-01 00:00:00"
EPOCH_SECONDS = 1704067200  # 2024-01-01T00:00:00Z

#: minutes per bucket for each retention tier
TIERS = {"1m": 1, "1h": 60, "1d": 1440}

#: default retention policy (buckets to keep per tier; None = forever)
DEFAULT_RETENTION = {"1m": 7 * 1440, "1h": 90 * 24, "1d": None}


# ---------------------------------------------------------------------------
# long form + gap-fill
# ---------------------------------------------------------------------------

def tokens_long(tokens_df: DataFrame, sentinel: int = -1) -> DataFrame:
    """tokens table -> long form (source, doc_id, pos, ts, value).

    ``sentinel`` values become NULL (the reference leaves them in the
    data untouched; we surface them as gaps). ``ts`` maps position ->
    EPOCH + pos minutes.
    """
    return (
        tokens_df
        .select("source", "doc_id", F.posexplode("tokens").alias("pos", "raw"))
        .withColumn("value", F.when(F.col("raw") == sentinel, None)
                    .otherwise(F.col("raw")).cast("long"))
        .withColumn("ts", F.timestamp_seconds(F.lit(EPOCH_SECONDS) + F.col("pos") * 60))
        .drop("raw")
    )


def gapfill_locf(long_df: DataFrame,
                 series_cols: tuple[str, ...] = ("source", "doc_id"),
                 order_col: str = "pos",
                 value_col: str = "value") -> DataFrame:
    """Last-observation-carried-forward over each series (W1).

    Leading gaps (no prior observation) stay NULL. Adds
    ``filled`` = true where the value was carried rather than observed.
    The window partitions by the series keys — with the cascade's
    upfront repartition this needs no extra shuffle.
    """
    w = (Window.partitionBy(*series_cols).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        long_df
        .withColumn("_locf", F.last(value_col, ignorenulls=True).over(w))
        .withColumn("filled", F.col(value_col).isNull() & F.col("_locf").isNotNull())
        .withColumn(value_col, F.col("_locf"))
        .drop("_locf")
    )


def gapfill_interpolate(long_df: DataFrame,
                        series_cols: tuple[str, ...] = ("source", "doc_id"),
                        order_col: str = "pos",
                        value_col: str = "value") -> DataFrame:
    """Linear-interpolation gap-fill over each series (the
    TimescaleDB ``interpolate()`` analogue to :func:`gapfill_locf`):
    a NULL at position p between observations (p0, v0) and (p1, v1)
    becomes v0 + (v1 - v0) * (p - p0) / (p1 - p0), as DOUBLE. Leading
    and trailing gaps (no observation on one side) stay NULL. Adds
    ``filled`` = true where a value was interpolated.

    Pure window functions over the same series partitioning as LOCF
    (two passes over one Exchange: last/ignoreNulls looking back,
    first/ignoreNulls looking forward) — no UDF, no extra shuffle
    under the cascade's upfront repartition."""
    back = (Window.partitionBy(*series_cols).orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, 0))
    fwd = (Window.partitionBy(*series_cols).orderBy(order_col)
           .rowsBetween(0, Window.unboundedFollowing))
    v = F.col(value_col)
    prev_v = F.last(value_col, ignorenulls=True).over(back)
    next_v = F.first(value_col, ignorenulls=True).over(fwd)
    prev_p = F.last(F.when(v.isNotNull(), F.col(order_col)),
                    ignorenulls=True).over(back)
    next_p = F.first(F.when(v.isNotNull(), F.col(order_col)),
                     ignorenulls=True).over(fwd)
    interp = (prev_v.cast("double")
              + (next_v - prev_v).cast("double")
              * (F.col(order_col) - prev_p).cast("double")
              / (next_p - prev_p).cast("double"))
    filled = v.isNull() & prev_v.isNotNull() & next_v.isNotNull()
    return (long_df
            .withColumn("_interp",
                        F.when(v.isNotNull(), v.cast("double"))
                        .when(filled, interp))
            .withColumn("filled", filled)
            .withColumn(value_col, F.col("_interp"))
            .drop("_interp"))


# ---------------------------------------------------------------------------
# cascade (long-form, general path)
# ---------------------------------------------------------------------------

_AGGS = ["cnt", "sum", "min", "max", "first", "last", "n_filled"]


def rollup_base(long_df: DataFrame, tier: str = "1m",
                series_cols: tuple[str, ...] = ("source", "doc_id")) -> DataFrame:
    """First-tier aggregation from (gap-filled) long form."""
    mins = TIERS[tier]
    bucket = F.timestamp_seconds(
        F.lit(EPOCH_SECONDS) + (F.col("pos") / F.lit(mins)).cast("long") * mins * 60)
    return (
        long_df
        .groupBy(*series_cols, bucket.alias("bucket"))
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.min_by("value", "pos").alias("first"),
            F.max_by("value", "pos").alias("last"),
            F.sum(F.col("filled").cast("long")).alias("n_filled"),
        )
        # buckets before a series' first observation have no value at
        # all (leading gaps are not carried) — drop them
        .filter(F.col("cnt") > 0)
    )


def rollup_next(tier_df: DataFrame, from_tier: str, to_tier: str,
                series_cols: tuple[str, ...] = ("source", "doc_id")) -> DataFrame:
    """Re-aggregate one tier into a coarser one (continuous-aggregate
    cascade; every column is decomposable so this is exact)."""
    mins = TIERS[to_tier]
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("bucket") / F.lit(mins * 60)).cast("long") * mins * 60)
    return (
        tier_df
        .groupBy(*series_cols, bucket.alias("bucket"))
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.min_by("first", "bucket").alias("first"),
            F.max_by("last", "bucket").alias("last"),
            F.sum("n_filled").alias("n_filled"),
        )
    )


def cascade_declarative(tokens_df: DataFrame,
                        tiers: tuple[str, ...] = ("1m", "1h", "1d"),
                        partitions: int | None = None) -> dict[str, DataFrame]:
    """tokens table -> {tier: rollup DataFrame} via the declarative
    long-form plan (posexplode -> LOCF window -> chained groupBys),
    single shuffle total: the upfront repartition on (source, doc_id)
    co-locates each series; the LOCF window and every tier groupBy then
    reuse that exchange.

    This is the INDEPENDENT implementation kept for parity certificates
    (it shares no kernel with the mapInArrow paths). :func:`cascade` is
    the production entry point — same results, zero shuffles, no
    144-points-per-series explode (guide §2.4: at 10^12 sequences the
    explode+sort+window over every point, and the 1m hash aggregate
    with one group per point, dwarf the array-local computation)."""
    if partitions is not None:
        tokens_df = tokens_df.repartition(partitions, "source", "doc_id")
    else:
        tokens_df = tokens_df.repartition("source", "doc_id")
    long_df = gapfill_locf(tokens_long(tokens_df))
    out: dict[str, DataFrame] = {}
    prev_tier: str | None = None
    for tier in tiers:
        if prev_tier is None:
            out[tier] = rollup_base(long_df, tier)
        else:
            out[tier] = rollup_next(out[prev_tier], prev_tier, tier)
        prev_tier = tier
    return out


_TIER_RAW_SCHEMA = T.StructType([
    T.StructField("source", T.StringType(), False),
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("bucket_s", T.LongType(), False),  # epoch seconds
    T.StructField("cnt", T.LongType(), True),
    T.StructField("sum", T.LongType(), True),
    T.StructField("min", T.LongType(), True),
    T.StructField("max", T.LongType(), True),
    T.StructField("first", T.LongType(), True),
    T.StructField("last", T.LongType(), True),
    T.StructField("n_filled", T.LongType(), True),
])


def _tier_from_tokens(tokens_df: DataFrame, tier: str) -> DataFrame:
    """ONE tier of the cascade straight from the token arrays: a
    zero-shuffle mapInArrow pass running the same LOCF + bucket-reduce
    kernels as :func:`cascade_fast` (whose equality to the declarative
    plan and to the DuckDB oracle is pytest-pinned), emitting the
    long-form tier schema with ``bucket_s`` as epoch seconds."""
    import pyarrow as pa

    mins = TIERS[tier]
    arrow_schema = pa.schema([
        ("source", pa.string()), ("doc_id", pa.string()),
        ("bucket_s", pa.int64()), ("cnt", pa.int64()), ("sum", pa.int64()),
        ("min", pa.int64()), ("max", pa.int64()), ("first", pa.int64()),
        ("last", pa.int64()), ("n_filled", pa.int64()),
    ])

    def run(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            names = rb.schema.names
            c_doc = rb.column(names.index("doc_id"))
            c_src = rb.column(names.index("source"))
            n_tok = rb.column(names.index("n_tok")).to_numpy()
            col = rb.column(names.index("tokens"))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            offsets = col.offsets.to_numpy()
            flat = col.values.to_numpy(zero_copy_only=False)
            for nt in np.unique(n_tok):
                idx = np.nonzero(n_tok == nt)[0]
                vals = rows_matrix(flat, offsets, idx, int(nt), dtype=None)
                filled, fmask = _locf_2d(vals)
                rr, bb, cnt, s, mn, mx, first, last, nfil = _tier_reduce(
                    filled, fmask, mins)
                take = pa.array(idx[rr], type=pa.int64())
                yield pa.RecordBatch.from_arrays([
                    c_src.take(take),
                    c_doc.take(take),
                    pa.array(EPOCH_SECONDS + bb.astype(np.int64, copy=False) * mins * 60),
                    pa.array(cnt), pa.array(s), pa.array(mn),
                    pa.array(mx), pa.array(first), pa.array(last),
                    pa.array(nfil),
                ], schema=arrow_schema)

    return tokens_df.mapInArrow(run, _TIER_RAW_SCHEMA)


def cascade(tokens_df: DataFrame, tiers: tuple[str, ...] = ("1m", "1h", "1d"),
            partitions: int | None = None) -> dict[str, DataFrame]:
    """tokens table -> {tier: rollup DataFrame}, ZERO shuffles.

    Each input row carries its whole series, so every tier is computed
    array-locally in one narrow mapInArrow pass per tier — no explode,
    no window sort, no per-point hash aggregate, no Exchange (guide
    §2.4/§4.2). Results are identical to :func:`cascade_declarative`
    (pytest-pinned, and each tier equals the DuckDB long-form oracle);
    materializing only the 1d tier no longer pays for the 1m tier.

    ``partitions`` is honoured for layout compatibility (callers that
    want a specific output partitioning) but is no longer needed for
    correctness or plan shape.
    """
    if partitions is not None:
        tokens_df = tokens_df.repartition(partitions, "source", "doc_id")
    out: dict[str, DataFrame] = {}
    for tier in tiers:
        out[tier] = _tier_from_tokens(tokens_df, tier).select(
            "source", "doc_id",
            F.timestamp_seconds("bucket_s").alias("bucket"),
            "cnt", "sum", "min", "max", "first", "last", "n_filled")
    return out


# ---------------------------------------------------------------------------
# tokens fast path: zero-shuffle mapInPandas cascade
# ---------------------------------------------------------------------------

_FAST_SCHEMA = T.StructType([
    T.StructField("tier", T.StringType(), False),
    T.StructField("source", T.StringType(), False),
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("bucket", T.LongType(), False),  # epoch seconds
    T.StructField("cnt", T.LongType(), False),
    T.StructField("sum", T.LongType(), True),
    T.StructField("min", T.LongType(), True),
    T.StructField("max", T.LongType(), True),
    T.StructField("first", T.LongType(), True),
    T.StructField("last", T.LongType(), True),
    T.StructField("n_filled", T.LongType(), False),
])


def rows_matrix(flat: np.ndarray, offsets: np.ndarray, idx: np.ndarray,
                nt: int, dtype=np.int64) -> np.ndarray:
    """Gather rows ``idx`` (each ``nt`` long) from a ListArray's flat
    values into a (len(idx), nt) matrix of ``dtype`` (``None`` keeps
    the native element type — the LOCF/tier kernels consume int32
    directly, skipping a full-matrix widening copy; Gorilla needs
    int64 for sign-extended XOR). When the selected rows are contiguous
    and uniformly strided (the common one-n_tok-per-batch case) this is
    a zero-copy reshape — a VIEW of the Arrow buffer when no widening
    is needed — instead of a fancy-index gather (~7x less memory
    traffic, now zero)."""
    starts = offsets[idx]
    if len(starts) > 0 and np.all(np.diff(starts) == nt):
        base = int(starts[0])
        # copy=False: a true zero-copy VIEW of the Arrow buffer when
        # the dtype already matches — downstream consumers (_locf_2d,
        # encode_batch) only read, never mutate
        m = flat[base:base + len(starts) * nt].reshape(len(starts), nt)
    else:
        m = flat[starts[:, None] + np.arange(nt)[None, :]]
    return m if dtype is None else m.astype(dtype, copy=False)


def _locf_2d(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized row-wise LOCF. -1 is the gap sentinel. Returns
    (filled float matrix with NaN for leading gaps, filled-mask).

    Rows without any gap (the overwhelming majority on real corpora)
    skip the carry machinery entirely: the gather/cumsum passes run
    only over the gapped-row subset, so the common case is one float
    cast plus one boolean reduction over the matrix."""
    x = vals.astype(np.float64)
    miss = vals == -1
    rowmiss = np.nonzero(miss.any(axis=1))[0]
    filled_mask = np.zeros(vals.shape, dtype=bool)
    if len(rowmiss) == 0:
        return x, filled_mask
    xs = x[rowmiss]
    ms = miss[rowmiss]
    idx = np.where(~ms, np.arange(xs.shape[1])[None, :], 0)
    np.maximum.accumulate(idx, axis=1, out=idx)
    carried = xs[np.arange(xs.shape[0])[:, None], idx]
    # rows whose first value was a gap: positions before the first
    # observation keep NaN
    lead = ms & (np.cumsum(~ms, axis=1) == 0)
    carried[lead] = np.nan
    x[rowmiss] = carried
    filled_mask[rowmiss] = ms & ~lead
    return x, filled_mask


def _tier_reduce(filled: np.ndarray, fmask: np.ndarray, mins: int):
    """(rows, T) LOCF'd matrix -> FLAT per-bucket aggregate vectors
    ``(rr, bb, cnt, sum, min, max, first, last, n_filled)`` over the
    non-empty (row, bucket) pairs only, already int64 (one gather per
    column here instead of one per consumer; the 1m tier shares ONE
    value gather across sum/min/max/first/last, which are all the
    point itself).

    ``mins`` is clamped to the row length: a 1440-minute bucket over a
    144-point series is ONE bucket of 144 points (bucket index =
    pos // mins = 0 for every point), so reducing over min(mins, t)
    columns is exact and avoids padding the matrix up to ``mins``
    (10x inflation for the 1d tier on day-length series)."""
    rows, t = filled.shape
    if mins == 1:
        # 1m tier: every point is its own bucket — all aggregates are
        # the point itself; skip the (rows, t, 1) reshape reductions
        obs = ~np.isnan(filled)
        rr, bb = np.nonzero(obs)
        v = filled[rr, bb].astype(np.int64)
        cnt = np.ones(len(rr), dtype=np.int64)
        nfil = fmask[rr, bb].astype(np.int64)
        return rr, bb, cnt, v, v, v, v, v, nfil
    mins = min(mins, t)
    nb = int(np.ceil(t / mins))
    pad = nb * mins - t
    if pad:
        fv = np.pad(filled, ((0, 0), (0, pad)), constant_values=np.nan)
        fm = np.pad(fmask, ((0, 0), (0, pad)), constant_values=False)
    else:
        fv, fm = filled, fmask
    r = fv.reshape(rows, nb, mins)
    rm = fm.reshape(rows, nb, mins)
    obs = ~np.isnan(r)
    cnt = obs.sum(axis=2)
    s = np.nansum(np.where(obs, r, 0), axis=2)
    with np.errstate(all="ignore"):
        mn = np.min(np.where(obs, r, np.inf), axis=2)
        mx = np.max(np.where(obs, r, -np.inf), axis=2)
    first_idx = np.argmax(obs, axis=2)
    last_idx = mins - 1 - np.argmax(obs[:, :, ::-1], axis=2)
    ri = np.arange(rows)[:, None]
    bi = np.arange(nb)[None, :]
    first = r[ri, bi, first_idx]
    last = r[ri, bi, last_idx]
    nfil = rm.sum(axis=2)
    rr, bb = np.nonzero(cnt > 0)
    return (rr, bb, cnt[rr, bb],
            s[rr, bb].astype(np.int64),
            mn[rr, bb].astype(np.int64), mx[rr, bb].astype(np.int64),
            first[rr, bb].astype(np.int64), last[rr, bb].astype(np.int64),
            nfil[rr, bb])


def cascade_fast(tokens_df: DataFrame,
                 tiers: tuple[str, ...] = ("1m", "1h", "1d")) -> DataFrame:
    """All tiers in ONE narrow mapInArrow pass (no shuffle at all):
    each input row carries its whole series, so every bucket of every
    tier is computable locally. Output: union of tiers, tagged by
    ``tier``; bucket as epoch seconds. Integer-exact. String columns
    are gathered with Arrow ``take`` — no Python objects anywhere."""
    import pyarrow as pa

    arrow_schema = pa.schema([
        ("tier", pa.string()), ("source", pa.string()), ("doc_id", pa.string()),
        ("bucket", pa.int64()), ("cnt", pa.int64()), ("sum", pa.int64()),
        ("min", pa.int64()), ("max", pa.int64()), ("first", pa.int64()),
        ("last", pa.int64()), ("n_filled", pa.int64()),
    ])

    def run(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            # resolve columns by NAME (partitioned read-back or a
            # caller's select can reorder the schema)
            names = rb.schema.names
            c_doc = rb.column(names.index("doc_id"))
            c_src = rb.column(names.index("source"))
            n_tok = rb.column(names.index("n_tok")).to_numpy()
            col = rb.column(names.index("tokens"))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            offsets = col.offsets.to_numpy()
            flat = col.values.to_numpy(zero_copy_only=False)
            for nt in np.unique(n_tok):
                idx = np.nonzero(n_tok == nt)[0]
                vals = rows_matrix(flat, offsets, idx, int(nt), dtype=None)
                filled, fmask = _locf_2d(vals)
                for tier in tiers:
                    mins = TIERS[tier]
                    rr, bb, cnt, s, mn, mx, first, last, nfil = _tier_reduce(
                        filled, fmask, mins)
                    take = pa.array(idx[rr], type=pa.int64())
                    tier_col = pa.DictionaryArray.from_arrays(
                        pa.array(np.zeros(len(rr), dtype=np.int32)),
                        pa.array([tier])).cast(pa.string())
                    yield pa.RecordBatch.from_arrays([
                        tier_col,
                        c_src.take(take),
                        c_doc.take(take),
                        pa.array(EPOCH_SECONDS + bb.astype(np.int64, copy=False) * mins * 60),
                        pa.array(cnt), pa.array(s), pa.array(mn),
                        pa.array(mx), pa.array(first), pa.array(last),
                        pa.array(nfil),
                    ], schema=arrow_schema)

    return tokens_df.mapInArrow(run, _FAST_SCHEMA)


# ---------------------------------------------------------------------------
# retention (downsample-and-expire)
# ---------------------------------------------------------------------------

def apply_retention(tier_df: DataFrame, tier: str, now_bucket_seconds: int,
                    policy: dict[str, int | None] | None = None) -> DataFrame:
    """Drop buckets older than the tier's retention horizon. ``now``
    is an explicit bucket timestamp (epoch seconds) so runs are
    deterministic and resumable."""
    policy = policy if policy is not None else DEFAULT_RETENTION
    keep = policy.get(tier)
    if keep is None:
        return tier_df
    mins = TIERS[tier]
    horizon = now_bucket_seconds - keep * mins * 60
    bucket = tier_df.schema["bucket"].dataType
    if isinstance(bucket, T.LongType):
        return tier_df.filter(F.col("bucket") >= horizon)
    return tier_df.filter(F.unix_timestamp("bucket") >= horizon)


# ---------------------------------------------------------------------------
# events path (irregular timestamps): spine gap-fill + rollup
# ---------------------------------------------------------------------------

def events_rollup(events_df: DataFrame, tier_seconds: int,
                  series_col: str = "event_type",
                  ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """General rollup over an irregular event stream: tumbling buckets
    of ``tier_seconds`` per series. Buckets as epoch seconds (oracle
    tz-safe)."""
    bucket = (F.unix_timestamp(ts_col) / tier_seconds).cast("long") * tier_seconds
    return (
        events_df
        .groupBy(F.col(series_col).alias("series"), bucket.alias("bucket"))
        .agg(
            F.count(value_col).alias("cnt"),
            F.sum(value_col).alias("sum"),
            F.min(value_col).alias("min"),
            F.max(value_col).alias("max"),
        )
    )


def events_gapfill(events_df: DataFrame, tier_seconds: int,
                   series_col: str = "event_type",
                   ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Dense per-series bucket spine via sequence+explode (J4), left
    join of actual buckets, then LOCF (W1). ``filled`` marks carried
    buckets. One value per (series, bucket): the bucket sum (a sum of
    2-decimal inputs stays decimal-exact after round(4), unlike an avg
    whose quotient can straddle a rounding boundary between engines)."""
    bucket = (F.unix_timestamp(ts_col) / tier_seconds).cast("long") * tier_seconds
    actual = (
        events_df
        .groupBy(F.col(series_col).alias("series"), bucket.alias("bucket"))
        .agg(F.sum(value_col).alias("value"))
    )
    # bounds and the series set derive from `actual`, not from a
    # re-scan of the raw events: floor is monotone so min/max of the
    # bucketized values equal the bucketized min/max, and every series
    # has >= 1 event hence >= 1 bucket. Catalyst then REUSES the one
    # aggregation exchange for all three subtrees (guide §2.4) — one
    # scan of the events table instead of three.
    bounds = actual.agg(F.min("bucket").alias("lo"),
                        F.max("bucket").alias("hi"))
    spine = (
        actual.select("series").distinct()
        .crossJoin(F.broadcast(bounds))
        .select("series", F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(tier_seconds))).alias("bucket"))
    )
    w = (Window.partitionBy("series").orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        spine.join(actual, ["series", "bucket"], "left")
        .withColumn("filled", F.col("value").isNull())
        .withColumn("value", F.last("value", ignorenulls=True).over(w))
    )


def events_gapfill_interp(events_df: DataFrame, tier_seconds: int,
                          series_col: str = "event_type",
                          ts_col: str = "ts",
                          value_col: str = "value") -> DataFrame:
    """Like :func:`events_gapfill` but gaps are LINEARLY INTERPOLATED
    between the surrounding observed buckets
    (:func:`gapfill_interpolate`); leading/trailing gaps stay NULL."""
    bucket = (F.unix_timestamp(ts_col) / tier_seconds).cast("long") * tier_seconds
    actual = (
        events_df
        .groupBy(F.col(series_col).alias("series"), bucket.alias("bucket"))
        .agg(F.sum(value_col).alias("value"))
    )
    # one scan of events: bounds/series derive from `actual` (see
    # events_gapfill) and share its aggregation exchange
    bounds = actual.agg(F.min("bucket").alias("lo"),
                        F.max("bucket").alias("hi"))
    spine = (
        actual.select("series").distinct()
        .crossJoin(F.broadcast(bounds))
        .select("series", F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(tier_seconds))).alias("bucket"))
    )
    joined = spine.join(actual, ["series", "bucket"], "left")
    return gapfill_interpolate(joined, series_cols=("series",),
                               order_col="bucket", value_col="value")
