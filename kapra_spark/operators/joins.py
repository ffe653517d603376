"""As-of and range joins (SURVEY.md §2.3 — the engine's public join
surface for LOCF-style correlation; absent in the reference, whose only
joins are dict lookups on series id, reference includes/common.py:452-457).

``asof_join`` is the scalable union+window formulation, NOT a
sort-merge-with-inequality hack:

- tag both sides, union, ONE shuffle on the ``by`` keys;
- a running ``last(right_payload, ignoreNulls)`` over
  (by, ts, side-priority) gives every left row the most recent right
  row with ``right.ts <= left.ts`` (ties match, like DuckDB/pandas
  ASOF);
- no O(n_left * n_right) join condition anywhere, so Catalyst never
  falls back to broadcast-nested-loop. At 100 TB this is a single
  re-partition + per-partition sort — the same shape as the rollup
  cascade, and AQE handles stragglers.

``range_join`` (point-in-interval) is a plain equi+range join with an
explicit broadcast hint for the (always small) interval side —
Catalyst turns it into BroadcastHashJoin on the equi key with the
range as a post-filter, which is the right plan when intervals fit in
memory; for giant interval tables, bucket both sides on ``by`` first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _auto_skew_bucket_seconds(
    left: DataFrame,
    by: list[str],
    ts_col: str,
    share_threshold: float = 0.2,
    target_buckets: int = 64,
    sample_fraction: float = 0.01,
    min_sample: int = 500,
    seed: int = 13,
) -> int | None:
    """Decide ``skew_bucket_seconds`` from a CHEAP distributed
    key-frequency sample: ONE Bernoulli-sampled aggregate job
    (column-pruned scan → per-key partial aggregation → a single
    4-field summary row collected). Every partition contributes, so a
    hot key clustered late in the scan is weighted the same as an early
    one — no scan-prefix bias. Returns a bucket width iff some ``by``
    key holds >= ``share_threshold`` of the sampled rows — the regime
    where that key's window sort serializes that fraction of the whole
    join in ONE task — sized so the hot key splits into
    ~``target_buckets`` window tasks. Returns None (global path) for
    high-cardinality/uniform keys or inputs too small to matter."""
    samp = (left.select(*by, F.col(ts_col).cast("timestamp").alias("_t"))
            .sample(fraction=sample_fraction, seed=seed))
    row = (samp.groupBy(*by)
           .agg(F.count("*").alias("_c"),
                F.min("_t").alias("_mn"), F.max("_t").alias("_mx"))
           .agg(F.sum("_c").alias("_n"), F.max("_c").alias("_top"),
                F.min("_mn").alias("_lo"), F.max("_mx").alias("_hi"))
           .collect()[0])
    n = row["_n"] or 0
    if n < min_sample:
        return None
    if row["_top"] / n < share_threshold:
        return None
    if row["_lo"] is None or row["_hi"] is None:
        return None
    span = (row["_hi"] - row["_lo"]).total_seconds()
    if not (span > 0):   # positive check: handles 0 and NaN uniformly
        return None
    return max(1, int(span // target_buckets))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
    tolerance_seconds: int | None = None,
    right_prefix: str = "r_",
    skew_bucket_seconds: int | str | None = None,
    auto_opts: dict | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same ``by`` group (backward
    as-of; ties match). ``how='left'`` keeps unmatched left rows with
    NULL right columns. Right's non-key columns come back prefixed.

    ``skew_bucket_seconds`` enables the hot-key mitigation: without it
    every row of a ``by`` key funnels through ONE window task (a hot
    event_type at web scale serializes in one sort). With it, rows are
    pre-partitioned on (by, coarse time bucket) and the window runs per
    bucket; cross-bucket state is restored by a carry row per bucket —
    the latest right row of any earlier bucket, computed from a
    bucket-level aggregate that is metadata-sized (one row per
    (by, bucket)). Results are EXACTLY equal to the unbucketed
    formulation (parity-tested); choose a bucket width that splits the
    hottest key into enough buckets to saturate the cluster — or pass
    ``skew_bucket_seconds="auto"`` to let a cheap key-frequency sample
    decide: bucketing engages (with a width splitting the hot key into
    ~64 tasks) only when some key holds >= 20% of the sampled rows, so
    the user who doesn't know they have a hot key still gets the
    mitigation, and uniform high-cardinality keys keep the one-shuffle
    global plan. ``auto_opts`` overrides the sampler's knobs
    (share_threshold, target_buckets, sample_fraction, min_sample,
    seed — see :func:`_auto_skew_bucket_seconds`).
    """
    by = [by] if isinstance(by, str) else list(by)
    if skew_bucket_seconds == "auto":
        skew_bucket_seconds = _auto_skew_bucket_seconds(
            left, by, left_ts, **(auto_opts or {}))
    elif isinstance(skew_bucket_seconds, str):
        raise ValueError(
            f"skew_bucket_seconds must be an int, None, or 'auto'; "
            f"got {skew_bucket_seconds!r}")
    r_payload = [c for c in right.columns if c not in by]
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    for name, df, col in (("left", left, left_ts), ("right", right, right_ts)):
        if col not in df.columns:
            raise ValueError(
                f"asof_join: {name} timestamp column {col!r} not in {name} "
                f"columns {df.columns}")
        missing = [k for k in by if k not in df.columns]
        if missing:
            raise ValueError(f"asof_join: by keys {missing} not in {name} "
                             f"columns {df.columns}")

    rpay_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in r_payload])
    l_tagged = (left
                .withColumn("_t", F.col(left_ts).cast("timestamp"))
                .withColumn("_side", F.lit(1))
                .withColumn("_rpay", F.lit(None).cast(rpay_type)))
    r_tagged = (right
                .withColumn("_t", F.col(right_ts).cast("timestamp"))
                .withColumn("_side", F.lit(0))
                .withColumn("_rpay", F.struct(*[F.col(c) for c in r_payload]))
                .select(*by, "_t", "_side", "_rpay",
                        *[F.lit(None).cast(f.dataType).alias(f.name)
                          for f in left.schema.fields if f.name not in by]))

    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    if skew_bucket_seconds is None:
        w = (Window.partitionBy(*by).orderBy("_t", "_side")
             .rowsBetween(Window.unboundedPreceding, 0))
        matched = (unioned
                   .withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
                   .filter(F.col("_side") == 1))
    else:
        u = unioned.withColumn(
            "_cb", F.floor(F.unix_timestamp("_t")
                           / F.lit(skew_bucket_seconds)).cast("long"))
        # latest right row per (by, bucket) — metadata-sized
        per_bucket = (u.filter(F.col("_side") == 0)
                      .groupBy(*by, "_cb")
                      .agg(F.max_by("_rpay", "_t").alias("_rp"),
                           F.max("_t").alias("_rt")))
        # carry-in per bucket actually present on either side: the
        # latest right row over all STRICTLY EARLIER buckets (a right
        # row in bucket b-1 has ts < b*width <= every ts in bucket b,
        # so carry rows always sort first within their bucket)
        w_carry = (Window.partitionBy(*by).orderBy("_cb")
                   .rowsBetween(Window.unboundedPreceding, -1))
        carry = (u.select(*by, "_cb").distinct()
                 .join(per_bucket, [*by, "_cb"], "left")
                 .withColumn("_cin", F.last("_rp", ignorenulls=True).over(w_carry))
                 .withColumn("_cin_t", F.last("_rt", ignorenulls=True).over(w_carry))
                 .filter(F.col("_cin").isNotNull()))
        carry_rows = carry.select(
            *by,
            F.col("_cin_t").alias("_t"),
            F.lit(0).alias("_side"),
            F.col("_cin").alias("_rpay"),
            *[F.lit(None).cast(f.dataType).alias(f.name)
              for f in left.schema.fields if f.name not in by],
            "_cb")
        u2 = u.unionByName(carry_rows.select(*u.columns))
        w = (Window.partitionBy(*by, "_cb").orderBy("_t", "_side")
             .rowsBetween(Window.unboundedPreceding, 0))
        matched = (u2
                   .withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
                   .filter(F.col("_side") == 1))
    if tolerance_seconds is not None:
        in_tol = (F.unix_timestamp("_t")
                  - F.unix_timestamp(F.col("_m")[right_ts])) <= tolerance_seconds
        matched = matched.withColumn(
            "_m", F.when(F.col("_m").isNotNull() & in_tol, F.col("_m")))
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())
    out_cols = ([F.col(c) for c in left.columns]
                + [F.col("_m")[c].alias(f"{right_prefix}{c}") for c in r_payload])
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str] | str,
    left_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """Join each left row to the interval rows [start, end) that
    contain its timestamp, matching on the ``by`` keys."""
    by = [by] if isinstance(by, str) else list(by)
    r = F.broadcast(right) if broadcast_right else right
    cond = None
    for k in by:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    cond = (cond
            & (left[left_ts] >= right[start_col])
            & (left[left_ts] < right[end_col]))
    joined = left.join(r, cond, how)
    keep = ([left[c] for c in left.columns]
            + [right[c] for c in right.columns
               if c not in by])
    return joined.select(*keep)
