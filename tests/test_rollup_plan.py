"""Flagship pipeline: end-to-end run, kill/resume, retention, and
decompressed-1m == raw-tokens equality."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from kapra_spark import datagen
from kapra_spark.plans.rollup_plan import run_rollup_pipeline


@pytest.fixture(scope="module")
def tokens(spark):
    pdf = datagen.tokens_pdf(60, n_tok=1440 * 2, seed=9, gap_fraction=0.1)
    return spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA).cache()


def test_pipeline_end_to_end_and_resume(spark, tokens, tmp_path):
    base = str(tmp_path / "pipe")
    s1 = run_rollup_pipeline(spark, tokens, base, run_id="r1")
    assert all(v["written_partitions"] > 0 for v in s1.values())

    # rerun = full resume: nothing rewritten
    s2 = run_rollup_pipeline(spark, tokens, base, run_id="r2")
    assert all(v["written_partitions"] == 0 for v in s2.values())
    assert all(v["skipped_partitions"] == s1[k]["written_partitions"]
               for k, v in s2.items())

    # 1h tier contents match a fresh computation
    from kapra_spark.operators.rollup import cascade_fast

    stored = spark.read.parquet(f"{base}/tier_1h")
    fresh = cascade_fast(tokens, tiers=("1h",)).drop("tier")
    assert stored.count() == fresh.count()
    a = stored.groupBy("source").agg(F.sum("sum").alias("s")).collect()
    b = fresh.groupBy("source").agg(F.sum("sum").alias("s")).collect()
    assert {r["source"]: r["s"] for r in a} == {r["source"]: r["s"] for r in b}


def test_pipeline_decompress_equals_input(spark, tokens, tmp_path):
    from kapra_spark.operators.compress import decompress_tokens

    base = str(tmp_path / "pipe2")
    run_rollup_pipeline(spark, tokens, base, run_id="r1")
    blocks = (spark.read.parquet(f"{base}/blocks_1m")
              .withColumnRenamed("day", "bucket_day"))
    back = decompress_tokens(blocks)
    # day-blocks: reassemble per doc in t0 order (2 days -> 2 blocks)
    orig = {r.doc_id: list(r.tokens) for r in tokens.collect()}
    got: dict[str, list] = {}
    for r in sorted(back.collect(), key=lambda r: (r.doc_id, r.t0)):
        got.setdefault(r.doc_id, []).extend(r.tokens)
    for k, v in orig.items():
        assert got[k] == v, k


def test_pipeline_retention(spark, tokens, tmp_path):
    from kapra_spark.operators.rollup import EPOCH_SECONDS

    base = str(tmp_path / "pipe3")
    # "now" = 10 days after epoch; 1h keeps 90 days -> all kept;
    # shrink 1h retention to 1 day to see expiry
    stats = run_rollup_pipeline(
        spark, tokens, base, run_id="r1",
        now_bucket_seconds=EPOCH_SECONDS + 10 * 86400,
        retention={"1m": None, "1h": 24, "1d": None})
    # tokens span days 1-2 after epoch, all earlier than the 1-day
    # horizon: everything expired -> no 1h partitions even exist
    assert stats["tier_1h"]["written_partitions"] == 0
    import os

    assert not os.path.exists(f"{base}/tier_1h") \
        or spark.read.parquet(f"{base}/tier_1h").count() == 0
    # 1d tier (retention None = keep forever) still written
    assert stats["tier_1d"]["written_partitions"] > 0


def test_fused_pipeline_matches_unfused(spark, tmp_path):
    """fused=True writes one (kind, source, day)-partitioned table
    whose kind partitions equal the three unfused outputs; resume
    skips everything on re-run."""
    from pyspark.sql import functions as F

    from kapra_spark import datagen
    from kapra_spark.operators.compress import decompress_tokens
    from kapra_spark.plans.rollup_plan import run_rollup_pipeline

    pdf = datagen.tokens_pdf(60, n_tok=144, seed=21, gap_fraction=0.1)
    tokens = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)

    b1 = str(tmp_path / "unfused")
    b2 = str(tmp_path / "fused")
    run_rollup_pipeline(spark, tokens, b1, run_id="a")
    s = run_rollup_pipeline(spark, tokens, b2, run_id="a", fused=True)
    assert s["fused"]["written_partitions"] > 0

    # tier partitions equal the unfused tier tables
    for tier in ("1h", "1d"):
        got = (spark.read.parquet(f"{b2}/fused/kind={tier}")
               .select("doc_id", "bucket", "cnt", "sum", "min", "max")
               .toPandas().sort_values(["doc_id", "bucket"]).reset_index(drop=True))
        exp = (spark.read.parquet(f"{b1}/tier_{tier}")
               .select("doc_id", "bucket", "cnt", "sum", "min", "max")
               .toPandas().sort_values(["doc_id", "bucket"]).reset_index(drop=True))
        import pandas as pd
        pd.testing.assert_frame_equal(got, exp)

    # blocks partition round-trips to the original tokens
    blocks = (spark.read.parquet(f"{b2}/fused/kind=blocks")
              .withColumnRenamed("day", "bucket_day")
              .select("doc_id", "source", "bucket_day", "t0", "v0", "n", "payload"))
    back = decompress_tokens(blocks).orderBy("doc_id").toPandas()
    orig = pdf.sort_values("doc_id").reset_index(drop=True)
    assert len(back) == len(orig)
    for i in range(len(orig)):
        assert list(back["tokens"][i]) == list(orig["tokens"][i])

    # resume: second run writes nothing
    s2 = run_rollup_pipeline(spark, tokens, b2, run_id="b", fused=True)
    assert s2["fused"]["written_partitions"] == 0
    assert s2["fused"]["skipped_partitions"] > 0


def test_fused_retention_matches_unfused(spark, tmp_path):
    """fused=True applies the SAME per-tier retention horizon as the
    unfused path (ADVICE r2 #1): with a horizon that expires part of
    the 1h tier, the fused kind partitions equal the unfused tier
    tables row-for-row, and resume stays idempotent."""
    from pyspark.sql import functions as F

    from kapra_spark import datagen
    from kapra_spark.operators.rollup import EPOCH_SECONDS
    from kapra_spark.plans.rollup_plan import run_rollup_pipeline

    pdf = datagen.tokens_pdf(50, n_tok=144, seed=9, gap_fraction=0.05)
    tokens = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)
    # tokens span 3 one-hour buckets; put the 1h horizon between
    # bucket 0 and bucket 1 => partial expiry
    now = EPOCH_SECONDS + 90 * 24 * 3600 + 5400

    b1, b2 = str(tmp_path / "unfused"), str(tmp_path / "fused")
    run_rollup_pipeline(spark, tokens, b1, run_id="r",
                        now_bucket_seconds=now)
    s = run_rollup_pipeline(spark, tokens, b2, run_id="r",
                            now_bucket_seconds=now, fused=True)
    assert s["fused"]["written_partitions"] > 0

    fused = spark.read.parquet(f"{b2}/fused")
    for tier in ("1h", "1d"):
        a = spark.read.parquet(f"{b1}/tier_{tier}")
        b = fused.filter(F.col("kind") == tier).select(*a.columns)
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
    # retention actually pruned the 1h tier (1 of 3 buckets kept)
    n_1h = fused.filter(F.col("kind") == "1h").count()
    assert n_1h == 50

    s2 = run_rollup_pipeline(spark, tokens, b2, run_id="r2",
                             now_bucket_seconds=now, fused=True)
    assert s2["fused"]["written_partitions"] == 0
