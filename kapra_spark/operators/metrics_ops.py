"""Anonymization quality metrics as Spark aggregates (SURVEY.md A3-A6).

VL/NCP run as native DataFrame aggregations over the stored envelope
arrays (higher-order functions — no Python in the loop); pattern loss
is an Arrow-vectorized pandas UDF that broadcasts the precomputed
(level, letter) -> empirical-median table (seeded, deterministic —
reference includes/pattern_loss.py:49-129).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import metrics as M
from ..functions import sax as S


def group_value_loss(anon_df: DataFrame) -> DataFrame:
    """Per-group instant value loss from stored envelopes
    (reference metric.py:85-123: VL uses the group's shared envelope,
    every member contributes the same range)."""
    t = F.size(F.col("lo"))
    rng2 = F.aggregate(
        F.zip_with("hi", "lo", lambda h, l: (h - l) * (h - l)),
        F.lit(0.0), lambda acc, x: acc + x)
    per_group = (
        anon_df.filter(~F.col("suppressed"))
        .groupBy("source", "group_id")
        .agg(F.count("*").alias("n"),
             F.first("lo").alias("lo"), F.first("hi").alias("hi"))
    )
    return per_group.select(
        "source", "group_id", "n",
        (F.col("n") * F.sqrt(rng2 / t)).alias("vl"))


def global_value_loss(anon_df: DataFrame) -> DataFrame:
    """tot/avg VL; the average divides by ALL output rows including
    suppressed ones (reference metric.py:121-123)."""
    per_group = group_value_loss(anon_df)
    total_rows = anon_df.count()
    return per_group.agg(
        F.sum("vl").alias("tot_value_loss"),
        (F.sum("vl") / F.lit(total_rows)).alias("avg_value_loss"))


def pattern_loss_per_record(tokens_df: DataFrame, anon_df: DataFrame) -> DataFrame:
    """PL per record: cosine distance between the record's PAA feature
    vector and the reconstruction of its group's SAX pattern
    (reference pattern_loss.py:167-197; paa size = len(sax))."""
    joined = (
        tokens_df.select("doc_id", "tokens")
        .join(anon_df.filter(F.col("sax").isNotNull()).select("doc_id", "sax"), "doc_id")
    )

    # precompute medians for every alphabet size once on the driver;
    # the dict is tiny and ships inside the UDF closure
    medians = {lvl: S.interval_medians(lvl) for lvl in range(2, S.MAX_LEVEL + 2)}

    @F.pandas_udf(T.DoubleType())
    def pl_udf(tokens: pd.Series, sax: pd.Series) -> pd.Series:
        out = np.empty(len(tokens))
        for i in range(len(tokens)):
            series = np.asarray(tokens.iloc[i], dtype=np.float64)[:-1]
            pr = sax.iloc[i]
            idx = np.frombuffer(pr.encode(), dtype=np.uint8).astype(np.int64) - 97
            level = int(idx.max()) + 1
            p_star = medians[level][idx] if level > 1 else np.zeros(len(idx))
            p = S.paa(S.znorm(series), len(pr))
            out[i] = M.cosine_distance(p, p_star)
        return pd.Series(out)

    return joined.select("doc_id", pl_udf("tokens", "sax").alias("pl"))


def global_pattern_loss(tokens_df: DataFrame, anon_df: DataFrame) -> DataFrame:
    """tot/avg PL; average divides by the number of ORIGINAL series
    (reference pattern_loss.py:249-256)."""
    per_rec = pattern_loss_per_record(tokens_df, anon_df)
    n_series = tokens_df.count()
    return per_rec.agg(
        F.sum("pl").alias("tot_pattern_loss"),
        (F.sum("pl") / F.lit(n_series)).alias("avg_pattern_loss"))
