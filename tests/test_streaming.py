"""Streaming rollup: batch/stream parity + stateful LOCF across
micro-batches (file source, availableNow trigger, memory sink)."""

import time

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


def _await(q, timeout=120):
    q.processAllAvailable()
    q.stop()


def test_stream_rollup_matches_batch(spark, tmp_path):
    from kapra_spark.operators.rollup import events_rollup
    from kapra_spark.streaming.rollup_stream import stream_rollup

    ev = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "stream_src")
    # two chunks -> two micro-batches
    ev.filter("event_id % 2 = 0").write.mode("overwrite").parquet(src)
    ev.filter("event_id % 2 = 1").write.mode("append").parquet(src)

    stream = (spark.readStream.schema(ev.schema).parquet(src))
    out = stream_rollup(stream, 3600, watermark="365 days")
    q = (out.writeStream.format("memory").queryName("rollup_sink")
         .outputMode("complete").trigger(availableNow=True).start())
    _await(q)

    got = {(r["series"], r["bucket"]): (r["cnt"], round(r["sum"], 4),
                                        r["min"], r["max"])
           for r in spark.sql("select * from rollup_sink").collect()}
    expect = {(r["series"], r["bucket"]): (r["cnt"], round(r["sum"], 4),
                                           r["min"], r["max"])
              for r in events_rollup(ev, 3600).collect()}
    assert got == expect


def test_stream_locf_state_across_batches(spark, tmp_path):
    from kapra_spark.streaming.rollup_stream import stream_locf

    src = str(tmp_path / "locf_src")
    schema = "series string, bucket long, value double"
    # batch 1: value at bucket 0, gap at 1
    spark.createDataFrame(
        [("a", 0, 5.0), ("a", 1, None), ("b", 0, None)],
        schema).coalesce(1).write.mode("overwrite").parquet(src)
    # batch 2 written after the first is consumed (separate file):
    spark.createDataFrame(
        [("a", 2, None), ("a", 3, 7.0), ("b", 1, 2.0)],
        schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(src)
    out = stream_locf(stream)
    q = (out.writeStream.format("memory").queryName("locf_sink")
         .outputMode("append").trigger(availableNow=True).start())
    _await(q)

    rows = {(r["series"], r["bucket"]): (r["value"], r["filled"])
            for r in spark.sql("select * from locf_sink").collect()}
    assert rows[("a", 0)] == (5.0, False)
    assert rows[("a", 1)] == (5.0, True)    # filled within batch
    assert rows[("a", 2)] == (5.0, True)    # filled ACROSS micro-batches
    assert rows[("a", 3)] == (7.0, False)
    assert ("b", 0) not in rows             # leading gap: nothing to carry
    assert rows[("b", 1)] == (2.0, False)


def test_stream_exact_dedup_parity_and_state(spark, tmp_path):
    """Streaming first-seen dedup == batch exact_dedup when ids arrive
    in id order (batch 1 = low ids), and a batch-2 duplicate of a
    batch-1 doc resolves to the batch-1 keeper via carried state."""
    from kapra_spark.operators.dedup import exact_dedup
    from kapra_spark.streaming.dedup_stream import stream_exact_dedup

    src = str(tmp_path / "dedup_src")
    schema = "doc_id string, text string"
    b1 = [("a1", "The cat sat."), ("a2", "the  cat sat. "),
          ("a3", "dogs bark"), ("a4", "unique one")]
    b2 = [("b1", "THE CAT SAT."), ("b2", "dogs bark"),
          ("b3", "fresh text"), ("b4", "fresh text")]
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(src)
    out = stream_exact_dedup(stream)
    q = (out.writeStream.format("memory").queryName("dedup_sink")
         .outputMode("append").trigger(availableNow=True).start())
    _await(q)
    got = {r["doc_id"]: (r["keeper_id"], r["is_duplicate"])
           for r in spark.sql("select * from dedup_sink").collect()}

    batch = spark.createDataFrame(b1 + b2, schema)
    expect = {r["doc_id"]: (r["keeper_id"], r["is_duplicate"])
              for r in exact_dedup(batch).collect()}
    assert got == expect  # first-seen == min-id here by construction
    assert got["b1"] == ("a1", True)    # cross-batch state carried
    assert got["b4"] == ("b3", True)    # within-batch min-id keeper
    assert got["a1"] == ("a1", False)


def test_stream_minhash_neardup_parity_and_state(spark, tmp_path):
    """Streaming first-seen MinHash near-dup == batch minhash_dedup on
    id-ordered micro-batches (exact-copy groups + one clear near-copy
    pair + distinct docs), and a batch-2 near-dup of a batch-1 doc
    resolves to the batch-1 keeper via carried bucket state."""
    from kapra_spark.operators.dedup import minhash_dedup
    from kapra_spark.streaming.neardup_stream import (
        band_verdicts_to_docs, stream_minhash_neardup)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away across the wide green meadow tonight")
    b1 = [("a1", base), ("a2", base),                 # exact copies
          ("a3", base.replace("tonight", "tonite")),  # near copy of a1
          ("a4", "completely different text about spark shuffles and "
                 "partition pruning at terabyte scale in the engine")]
    b2 = [("b1", base),                               # near-dup, batch 2
          ("b2", "yet another unrelated document with its own words "
                 "nothing shared with any of the previous documents")]
    schema = "doc_id string, text string"
    src = str(tmp_path / "nd_src")
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(src)
    out = stream_minhash_neardup(stream)
    q = (out.writeStream.format("memory").queryName("nd_sink")
         .outputMode("append").trigger(availableNow=True).start())
    _await(q)
    docs = band_verdicts_to_docs(spark.table("nd_sink"))
    got = {r["doc_id"]: (r["keeper_id"], r["is_duplicate"])
           for r in docs.collect()}

    batch = spark.createDataFrame(b1 + b2, schema)
    expect = {r["doc_id"]: (r["keeper_id"], r["doc_id"] != r["keeper_id"])
              for r in minhash_dedup(batch).collect()}
    assert got == expect
    assert got["a2"] == ("a1", True)   # exact copy, within batch 1
    assert got["a3"] == ("a1", True)   # near copy passes the estimator
    assert got["b1"] == ("a1", True)   # cross-batch bucket state
    assert got["a4"][1] is False and got["b2"][1] is False
