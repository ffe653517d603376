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
