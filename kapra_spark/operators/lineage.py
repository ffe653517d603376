"""Per-partition lineage + resumable writes (SURVEY.md J5/S3,
FIXTURES.md F-6).

The reference loses everything on a kill (single process, no
persistence until the final CSV). The engine writes each stage
partition-by-partition with dynamic partition overwrite and records
(run scope, stage, partition_key, row_count, checksum) in a lineage
table. Resume = left anti-join of the input's partition keys against
committed lineage: only missing partitions are recomputed, and
re-writing a partition is idempotent (overwrite), so a kill between
data write and lineage append cannot double-count.

Checksum is an order-independent BIT_XOR of xxhash64 over every column,
so it is partition-layout and task-retry independent.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = ["run_id", "stage", "partition_key", "row_count",
                "checksum", "committed_at"]


def row_checksum(df: DataFrame) -> F.Column:
    """Canonical row digest: columns sorted by name and cast to string,
    so the checksum is stable across column reorderings (partitioned
    parquet moves partition columns to the end on read-back)."""
    return F.xxhash64(*[F.col(c).cast("string") for c in sorted(df.columns)])


def partition_metrics(df: DataFrame, partition_cols: list[str]) -> DataFrame:
    """(partition_key, row_count, checksum) per partition."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in partition_cols])
    return (df.groupBy(key.alias("partition_key"))
            .agg(F.count("*").alias("row_count"),
                 F.bit_xor(row_checksum(df)).alias("checksum")))


def committed_partitions(spark: SparkSession, lineage_path: str,
                         stage: str) -> DataFrame | None:
    try:
        lin = spark.read.parquet(lineage_path)
    except Exception:
        return None
    return (lin.filter(F.col("stage") == stage)
            .select("partition_key").distinct())


def write_with_lineage(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    lineage_path: str,
    run_id: str,
    stage: str,
    resume: bool = True,
    sort_within: list[str] | None = None,
) -> dict:
    """Write ``df`` partitioned by ``partition_cols`` with exactly-once
    semantics. Returns {written_partitions, skipped_partitions}.

    ``sort_within`` sorts rows WITHIN each task before writing (no
    shuffle — ``sortWithinPartitions``), which makes parquet row-group
    min/max statistics on those columns tight and disjoint: a point
    lookup (``doc_id = X``) then skips whole row groups at scan time
    instead of reading the partition. The scan-locality knob for the
    blocks store — the parquet equivalent of an Iceberg sort order."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in partition_cols])
    df = df.withColumn("_pk", key)

    skipped = 0
    if resume:
        done = committed_partitions(spark, lineage_path, stage)
        if done is not None:
            # the committed set is metadata-sized (one key per written
            # partition), so collect it once and derive `skipped` from
            # lineage alone: on a resume the committed keys are a
            # subset of the input's keys by construction. This avoids
            # the two full-input distinct-count shuffles the previous
            # accounting cost (at 100 TB: two shuffles for a log line),
            # and broadcasting the key set keeps the anti-join
            # shuffle-free on the data side.
            # NOTE: `skipped` counts committed partitions SEEN for the
            # stage, not the intersection with this input's keys — an
            # incremental resume covering a subset of history reports
            # the full committed count. Exact intersection would need a
            # distinct over the input (the full-input scan this path
            # exists to avoid), so the metric is documented as
            # "committed partitions seen" instead.
            done_keys = done.collect()
            skipped = len(done_keys)
            if done_keys:
                done_df = F.broadcast(
                    spark.createDataFrame(done_keys)
                    .withColumnRenamed("partition_key", "_pk"))
                df = df.join(done_df, "_pk", "left_anti")

    work = df.drop("_pk")
    if sort_within:
        # partition cols lead so the file writer's required clustering
        # is already satisfied and it inserts no second (unstable) sort
        work = work.sortWithinPartitions(*partition_cols, *sort_within)
    work = work.cache()
    # materialize metrics BEFORE the lineage append (the plan reads the
    # lineage table through the resume anti-join, so a lazy
    # re-evaluation after the append would see its own commit) and
    # BEFORE the data write: an all-committed resume then ends here
    # without creating an empty (schema-less) data directory
    rows = (partition_metrics(work, partition_cols)
            .withColumn("run_id", F.lit(run_id))
            .withColumn("stage", F.lit(stage))
            .withColumn("committed_at", F.current_timestamp())
            .select(*LINEAGE_COLS)
            .collect())
    if rows:
        work.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
        spark.createDataFrame(rows).write.mode("append").parquet(lineage_path)
    work.unpersist()
    return {"written_partitions": len(rows), "skipped_partitions": skipped}


def verify_against_lineage(spark: SparkSession, path: str,
                           partition_cols: list[str], lineage_path: str,
                           stage: str) -> DataFrame:
    """Recompute per-partition (row_count, checksum) from the stored
    table and diff against the latest lineage records — the resume
    test's no-double-counting certificate."""
    from pyspark.sql import Window

    stored = spark.read.parquet(path)
    actual = partition_metrics(stored, partition_cols)
    # latest record per partition via row_number, NOT orderBy +
    # dropDuplicates (Spark does not guarantee dropDuplicates keeps the
    # first row of a prior sort)
    w = (Window.partitionBy("partition_key")
         .orderBy(F.desc("committed_at"), F.desc("run_id")))
    lin = (spark.read.parquet(lineage_path)
           .filter(F.col("stage") == stage)
           .withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == 1)
           .select("partition_key",
                   F.col("row_count").alias("expect_rows"),
                   F.col("checksum").alias("expect_checksum")))
    return (actual.join(lin, "partition_key", "full_outer")
            .withColumn("ok", (F.col("row_count") == F.col("expect_rows"))
                        & (F.col("checksum") == F.col("expect_checksum"))))
