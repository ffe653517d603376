"""Reference CSV compatibility layer (SURVEY.md S1/S2/S5, F8).

The reference's input is a wide CSV — col 0 = series id, last col =
sensitive attribute, everything between = the series
(includes/io.py:114-134) — and its output renders group envelopes as
"[lo|hi]" strings with " - " for suppressed rows
(includes/anonymized_dataset.py:27-55). These adapters convert both to
and from the engine's native tokens / anonymized tables; the string
round-trip exists ONLY at this boundary (arrays stay native inside)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_wide_csv(spark: SparkSession, path: str,
                  source: str | None = None) -> DataFrame:
    """Wide CSV -> canonical tokens table. The sensitive column stays
    as the LAST element of ``tokens`` (the convention kp_anonymize
    expects, mirroring io.py:131-134)."""
    df = spark.read.csv(path, header=True, inferSchema=True)
    cols = df.columns
    id_col, value_cols = cols[0], cols[1:]
    src = source if source is not None else path.rsplit("/", 1)[-1].split(".")[0]
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.array(*[F.col(c).cast("int") for c in value_cols]).alias("tokens"),
        F.lit(len(value_cols)).cast("int").alias("n_tok"),
        F.lit(src).alias("source"),
    )


def write_anonymized_csv(anon_df: DataFrame, path: str) -> None:
    """Anonymized table -> reference output shape: one envelope string
    per position, then sax, as, group; suppressed rows all " - "
    (anonymized_dataset.py:35-50)."""
    env = F.when(
        F.col("suppressed"), F.lit(None)
    ).otherwise(
        F.zip_with("lo", "hi", lambda lo, hi:
                   F.format_string("[%d|%d]", lo.cast("long"), hi.cast("long")))
    )
    rendered = anon_df.select(
        "doc_id",
        F.when(F.col("suppressed"), F.lit(" - "))
         .otherwise(F.array_join(env, ",")).alias("envelopes"),
        F.coalesce(F.col("sax"), F.lit(" - ")).alias("sax"),
        F.coalesce(F.col("as_perturbed").cast("string"), F.lit(" - ")).alias("as"),
        F.coalesce(F.concat(F.lit("Group: "),
                            F.col("group_id")), F.lit(" - ")).alias("group"),
    )
    rendered.write.mode("overwrite").option("header", True).csv(path)


def downsample_wide_csv(spark: SparkSession, path: str,
                        records_to_keep: list[int],
                        out_dir: str | None = None) -> list[str]:
    """Reference ``utils/downsample_dataset.py``: write head-N variants
    of a wide CSV as ``<name>_<n>.csv`` under ``downsampled/``. Head-N
    means the FILE's first N rows (the reference uses ``df.head``), so
    the read is pinned to one partition to preserve file order. Counts
    larger than the dataset are skipped with a warning, like the
    reference (downsample_dataset.py:22-26). Returns written paths."""
    import warnings

    df = spark.read.csv(path, header=True).coalesce(1).cache()
    total = df.count()
    base = path.rsplit("/", 1)[-1]
    parent = path.rsplit("/", 1)[0] if "/" in path else "."
    out_base = out_dir if out_dir is not None else f"{parent}/downsampled"
    written = []
    for n in records_to_keep:
        if n > total:
            warnings.warn(f"Cannot extract {n} records from {base}: "
                          f"only {total} available", stacklevel=2)
            continue
        out = f"{out_base}/{base.replace('.csv', '')}_{n}.csv"
        (df.limit(n).coalesce(1)
         .write.mode("overwrite").option("header", True).csv(out))
        written.append(out)
    df.unpersist()
    return written


def parse_envelope_strings(df: DataFrame, col: str = "envelopes") -> DataFrame:
    """Inverse of the render (S5): "[lo|hi],[lo|hi],..." -> lo/hi
    arrays via regexp (reference metric.py:116-120 does a string
    split per cell). Suppressed rows — the " - " placeholder or NULL —
    parse to NULL arrays."""
    is_env = F.col(col).isNotNull() & (F.trim(F.col(col)) != "-")
    parts = F.split(F.col(col), ",")
    lo = F.transform(parts, lambda s: F.regexp_extract(s, r"\[(-?\d+)\|", 1).cast("long"))
    hi = F.transform(parts, lambda s: F.regexp_extract(s, r"\|(-?\d+)\]", 1).cast("long"))
    return (df.withColumn("lo", F.when(is_env, lo))
            .withColumn("hi", F.when(is_env, hi)))
