"""End-to-end rollup + downsample + retention pipeline with resumable
lineage-tracked writes — the engine's flagship plan (BASELINE.json
north_rule).

    tokens (doc_id, tokens, n_tok, source)
      ├─ 1m tier  -> Gorilla blocks  (compress.py, zero shuffle)
      ├─ 1h tier  -> rows            (cascade_fast, zero shuffle)
      └─ 1d tier  -> rows
    each written partitioned by (source, day) through
    lineage.write_with_lineage: a killed run resumes from committed
    partitions, re-writes are idempotent, checksums certify equality.

Two execution modes:

- default: three independent linear scans of the columnar input (no
  cache — at 100 TB you never want a 100 TB cache), one per output.
- ``fused=True``: ONE scan + ONE Python pass via
  ``compress_and_cascade`` writes everything as a single table
  partitioned by (kind, source, day), where kind in
  {blocks, 1h, 1d} — the partition dirs ARE the three tables
  (read ``.../kind=1h/``). At 100 TB this trades two extra source
  scans (~2x input bytes) for one staging write of ~15% of input
  bytes — the cheaper side of that trade on any real storage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.compress import compress_and_cascade, compress_tokens
from ..operators.lineage import write_with_lineage
from ..operators.rollup import DEFAULT_RETENTION, apply_retention, cascade_fast


def run_rollup_pipeline(
    spark: SparkSession,
    tokens: DataFrame,
    base_path: str,
    run_id: str,
    now_bucket_seconds: int | None = None,
    retention: dict | None = None,
    resume: bool = True,
    fused: bool = False,
) -> dict:
    """Returns per-stage write stats. ``now_bucket_seconds`` pins the
    retention horizon (explicit for determinism/resume)."""
    stats = {}
    lineage_path = f"{base_path}/_lineage"

    if fused:
        union = compress_and_cascade(tokens, tiers=("1h", "1d"))
        union = (union
                 .withColumn("kind", F.coalesce("tier", F.lit("blocks")))
                 .withColumn("day", F.when(
                     F.col("kind") == "blocks", F.col("bucket_day"))
                     .otherwise(F.to_date(F.timestamp_seconds("bucket"))))
                 .drop("tier", "bucket_day"))
        if now_bucket_seconds is not None:
            # same horizon filter apply_retention applies per tier in
            # the unfused path, expressed as one predicate over the
            # tagged union (blocks pass through, like the unfused path)
            from ..operators.rollup import TIERS
            policy = retention or DEFAULT_RETENTION
            keep_pred = F.col("kind") == "blocks"
            for tier in ("1h", "1d"):
                is_tier = F.col("kind") == tier
                keep = policy.get(tier)
                if keep is None:
                    keep_pred = keep_pred | is_tier
                else:
                    horizon = now_bucket_seconds - keep * TIERS[tier] * 60
                    keep_pred = keep_pred | (
                        is_tier & (F.col("bucket") >= F.lit(horizon)))
            union = union.filter(keep_pred)
        stats["fused"] = write_with_lineage(
            union, f"{base_path}/fused", ["kind", "source", "day"],
            lineage_path, run_id, "fused", resume=resume)
        return stats

    blocks = (compress_tokens(tokens)
              .withColumnRenamed("bucket_day", "day"))
    stats["blocks_1m"] = write_with_lineage(
        blocks, f"{base_path}/blocks_1m", ["source", "day"],
        lineage_path, run_id, "blocks_1m", resume=resume)

    tiers = cascade_fast(tokens, tiers=("1h", "1d"))
    for tier in ("1h", "1d"):
        t = (tiers.filter(F.col("tier") == tier).drop("tier")
             .withColumn("day", F.to_date(F.timestamp_seconds(F.col("bucket")))))
        if now_bucket_seconds is not None:
            t = apply_retention(t, tier, now_bucket_seconds,
                                retention or DEFAULT_RETENTION)
        stats[f"tier_{tier}"] = write_with_lineage(
            t, f"{base_path}/tier_{tier}", ["source", "day"],
            lineage_path, run_id, f"tier_{tier}", resume=resume)
    return stats
