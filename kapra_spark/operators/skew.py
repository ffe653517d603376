"""Skew handling: salted repartition + two-phase aggregation (C7).

The tokens table's ``source`` is Zipf-skewed by construction (one hot
source can hold most of 10^12 sequences). Any groupBy(source) without
salting funnels the hot key through one task. Two tools:

- :func:`salted_repartition` — spread rows of the same key over
  ``n_salts`` partitions via ``pmod(xxhash64(id), n_salts)``; use
  before per-series work that doesn't need key co-location.
- :func:`two_phase_agg` — salt -> partial agg -> final agg, for
  re-aggregable aggregates (the cascade's are all decomposable).

AQE skew-join splitting is enabled in the session for the join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, key_cols: list[str], id_col: str,
                       n_salts: int = 16,
                       num_partitions: int | None = None) -> DataFrame:
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    cols = [F.col(c) for c in key_cols] + [salt]
    if num_partitions:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)


def two_phase_agg(df: DataFrame, key_cols: list[str],
                  aggs: dict[str, tuple[str, str]],
                  salt_col: str | None = None, n_salts: int = 16) -> DataFrame:
    """Skew-safe aggregation: partial agg on (keys, salt), final agg on
    keys. ``aggs`` maps output name -> (input col, fn) where fn is one
    of sum/count/min/max (decomposable).

    count re-aggregates as a sum of partial counts; min/max as
    min/max of partials — exactly the cascade's re-aggregation rule.
    """
    salt = (F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
            if salt_col else F.pmod(F.xxhash64(F.rand(seed=0)), F.lit(n_salts)))
    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-decomposable agg {fn!r}")
    partial = (df.groupBy(*key_cols, salt.alias("_salt"))
               .agg(*partial_exprs))
    return partial.groupBy(*key_cols).agg(*final_exprs)
