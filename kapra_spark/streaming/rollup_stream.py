"""Streaming rollup cascade (SURVEY.md §2.10).

The batch cascade was designed re-aggregable precisely so this layer
could exist without changing stored schemas: the same
count/sum/min/max aggregates run as a watermarked tumbling-window
streaming query, and late data within the watermark updates the same
buckets the batch path would produce. Batch/stream parity is the test
contract (tests/test_streaming.py).

Two operators:
- :func:`stream_rollup` — built-in windowed aggregation with
  watermarking (late rows inside the watermark are merged; later ones
  dropped — in batch mode, the lineage table re-runs affected buckets
  instead, SURVEY.md §7).
- :func:`stream_locf` — custom stateful gap-fill: per-series
  last-observation state via ``applyInPandasWithState``, carrying the
  LOCF value across micro-batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_rollup(events: DataFrame, tier_seconds: int,
                  watermark: str = "10 minutes",
                  series_col: str = "event_type",
                  ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Watermarked tumbling-window rollup with the cascade's aggregate
    set. Works on any streaming DataFrame with (series, ts, value)."""
    # watermarks require TIMESTAMP (with local tz); NTZ sources are
    # cast — the session runs in UTC so values are unchanged
    return (events
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .groupBy(F.col(series_col).alias("series"),
                     F.window(ts_col, f"{tier_seconds} seconds").alias("w"))
            .agg(F.count(value_col).alias("cnt"),
                 F.sum(value_col).alias("sum"),
                 F.min(value_col).alias("min"),
                 F.max(value_col).alias("max"))
            .select("series",
                    F.unix_timestamp(F.col("w.start")).alias("bucket"),
                    "cnt", "sum", "min", "max"))


_LOCF_STATE = T.StructType([T.StructField("last_value", T.DoubleType())])
_LOCF_OUT = T.StructType([
    T.StructField("series", T.StringType()),
    T.StructField("bucket", T.LongType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("filled", T.BooleanType()),
])


def _locf_fn(key, pdfs, state: GroupState):
    """Carry the last observed value per series across micro-batches;
    emit one row per (bucket), filling NULL buckets from state."""
    (series,) = key
    last = state.get[0] if state.exists else None
    rows = []
    frames = list(pdfs)
    batch = (pd.concat(frames).sort_values("bucket")
             if frames else pd.DataFrame(columns=["bucket", "value"]))
    for _, r in batch.iterrows():
        v = r["value"]
        if pd.isna(v):
            if last is not None:
                rows.append((series, int(r["bucket"]), float(last), True))
        else:
            last = float(v)
            rows.append((series, int(r["bucket"]), float(v), False))
    if last is not None:
        state.update((float(last),))
    yield pd.DataFrame(rows, columns=["series", "bucket", "value", "filled"])


def stream_locf(bucketed: DataFrame) -> DataFrame:
    """Stateful LOCF over a streaming (series, bucket, value) frame
    where NULL value marks a gap bucket."""
    return (bucketed
            .groupBy("series")
            .applyInPandasWithState(
                _locf_fn, _LOCF_OUT, _LOCF_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
