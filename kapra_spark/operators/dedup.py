"""Deduplication family for training-data pipelines.

- exact:      hash-groupBy on normalized text (scan-speed, 1 shuffle)
- minhash:    char-shingle MinHash signatures (Arrow-vectorized NumPy)
              + LSH banding (bucket self-join finds candidates without
              the O(n^2) cross join) + exact-Jaccard verification with
              native array_intersect/array_union
- simhash:    64-bit SimHash + pigeonhole banding for hamming<=3
- embedding:  cosine near-dup via random-hyperplane LSH buckets,
              verified with an exact dot product (vectors normalized)

All candidate generation is bucket-join shaped: at 10^12 docs the only
shuffles are on (band, band_hash) keys, never all-pairs. Clusters are
resolved to a canonical keeper (min doc_id) with a small iterative
min-propagation loop that converges in O(log(cluster diameter)) rounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per exact (normalized) text. Adds
    ``is_duplicate`` + ``keeper_id`` for the dropped rows."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    w = df.withColumn("_h", F.md5(norm))
    keepers = (w.groupBy("_h").agg(F.min(id_col).alias("keeper_id")))
    return (w.join(keepers, "_h")
            .withColumn("is_duplicate", F.col(id_col) != F.col("keeper_id"))
            .drop("_h"))


# ---------------------------------------------------------------------------
# shingles + minhash signatures (vectorized)
# ---------------------------------------------------------------------------

def _char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-char shingle hashes via a vectorized polynomial
    rolling hash (base 257 mod 2^61-1) over the byte sequence."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    n = len(b)
    if n < k:
        b = np.pad(b, (0, k - n), constant_values=32)
        n = k
    # power matrix trick: hash_i = sum(b[i+j] * base^(k-1-j)) mod p
    powers = np.array([pow(257, k - 1 - j, MERSENNE) for j in range(k)],
                      dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    h = (windows * powers[None, :] % MERSENNE).sum(axis=1) % MERSENNE
    return np.unique(h)


def shingle_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               k: int = 5) -> DataFrame:
    """(id, shingles: array<long>) — distinct shingle hashes per doc."""
    schema = T.StructType([
        T.StructField("doc_id", df.schema[id_col].dataType, False),
        T.StructField("shingles", T.ArrayType(T.LongType()), False),
    ])

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "shingles": [
                    _char_shingle_hashes(t if isinstance(t, str) else "", k)
                    .astype(np.int64) for t in pdf[text_col]],
            })

    return df.select(id_col, text_col).mapInPandas(fn, schema)


def minhash_signatures(shingles_df: DataFrame, num_hashes: int = 64,
                       seed: int = 42) -> DataFrame:
    """(doc_id, sig: array<long>) MinHash signatures: universal hashing
    h_i(x) = (a_i * x + b_i) mod p, min over the doc's shingle set."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=num_hashes, dtype=np.uint64)

    schema = T.StructType([
        T.StructField("doc_id", shingles_df.schema["doc_id"].dataType, False),
        T.StructField("sig", T.ArrayType(T.LongType()), False),
    ])

    def fn(batches):
        for pdf in batches:
            sigs = []
            for sh in pdf["shingles"]:
                x = np.asarray(sh, dtype=np.uint64)
                # (s, h) matrix in python ints would overflow; use
                # object-free modmul: (a*x) % p with uint64 overflow-safe
                # split multiply
                hi = (x[:, None] >> np.uint64(32)) * a[None, :] % MERSENNE
                lo = (x[:, None] & np.uint64(0xFFFFFFFF)) * a[None, :] % MERSENNE
                ax = ((hi << np.uint64(32)) % MERSENNE + lo) % MERSENNE
                sig = ((ax + b[None, :]) % MERSENNE).min(axis=0)
                sigs.append(sig.astype(np.int64))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    return shingles_df.mapInPandas(fn, schema)


def lsh_candidate_pairs(sig_df: DataFrame, bands: int = 16) -> DataFrame:
    """Band the signatures and self-join each bucket: docs sharing any
    band hash become candidate pairs (id_a < id_b)."""
    n = bands
    banded = sig_df.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n - 1)),
                lambda i: F.xxhash64(
                    F.slice(F.col("sig"), i * (F.size("sig") / n).cast("int") + 1,
                            (F.size("sig") / n).cast("int")).cast("string"))
            )).alias("band", "band_hash"))
    x = banded.alias("x")
    y = banded.alias("y")
    return (x.join(y, (F.col("x.band") == F.col("y.band"))
                   & (F.col("x.band_hash") == F.col("y.band_hash"))
                   & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("id_a"),
                    F.col("y.doc_id").alias("id_b"))
            .distinct())


def verify_jaccard(pairs: DataFrame, shingles_df: DataFrame,
                   threshold: float = 0.7) -> DataFrame:
    """Exact Jaccard on candidate pairs with native array ops."""
    a = shingles_df.select(F.col("doc_id").alias("id_a"),
                           F.col("shingles").alias("sh_a"))
    b = shingles_df.select(F.col("doc_id").alias("id_b"),
                           F.col("shingles").alias("sh_b"))
    j = (pairs.join(a, "id_a").join(b, "id_b")
         .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
         .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
         .withColumn("jaccard", F.col("inter") / F.greatest("uni", F.lit(1))))
    return (j.filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def minhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 5, num_hashes: int = 64,
                  bands: int = 16, threshold: float = 0.7) -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> band -> bucket
    join -> exact-Jaccard verify -> cluster to canonical keeper."""
    sh = shingle_df(df, text_col, id_col, k).cache()
    sig = minhash_signatures(sh, num_hashes)
    cand = lsh_candidate_pairs(sig, bands)
    dup_pairs = verify_jaccard(cand, sh, threshold)
    clusters = cluster_pairs(dup_pairs, df.select(F.col(id_col).alias("doc_id")))
    return clusters


def cluster_pairs(pairs: DataFrame, all_ids: DataFrame,
                  max_iter: int = 10) -> DataFrame:
    """(doc_id, keeper_id): connected components by iterative min-id
    propagation over the duplicate-pair graph (converges in
    O(log diameter) joins; duplicate clusters are tiny in practice)."""
    edges = (pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
             .union(pairs.select(F.col("id_b").alias("u"),
                                 F.col("id_a").alias("v"))))
    labels = all_ids.select(F.col("doc_id").alias("u"),
                            F.col("doc_id").alias("keeper_id"))
    for _ in range(max_iter):
        neigh = (edges.join(labels.withColumnRenamed("u", "v"), "v")
                 .groupBy("u").agg(F.min("keeper_id").alias("n_min")))
        new_labels = (labels.join(neigh, "u", "left")
                      .select("u", F.least(
                          F.col("keeper_id"),
                          F.coalesce("n_min", F.col("keeper_id"))).alias("keeper_id")))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "u")
                   .filter(F.col("n.keeper_id") != F.col("o.keeper_id")).count())
        labels = new_labels.cache()
        if changed == 0:
            break
    return labels.select(F.col("u").alias("doc_id"), "keeper_id")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_signatures(shingles_df: DataFrame) -> DataFrame:
    """64-bit SimHash from the shingle hash set (weight 1 per shingle)."""
    schema = T.StructType([
        T.StructField("doc_id", shingles_df.schema["doc_id"].dataType, False),
        T.StructField("simhash", T.LongType(), False),
    ])

    def fn(batches):
        for pdf in batches:
            out = np.empty(len(pdf), dtype=np.int64)
            for i, sh in enumerate(pdf["shingles"]):
                x = np.asarray(sh, dtype=np.uint64)
                bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                        & np.uint64(1)).astype(np.int32)
                score = bits.sum(axis=0) * 2 - len(x)  # (+1/-1 votes)
                sig = np.uint64(0)
                for j in np.nonzero(score > 0)[0]:
                    sig |= np.uint64(1) << np.uint64(j)
                out[i] = np.int64(sig.astype(np.int64))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return shingles_df.mapInPandas(fn, schema)


def simhash_near_dups(sim_df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pigeonhole banding: split 64 bits into max_hamming+1 chunks; any
    pair within the distance budget shares at least one exact chunk.
    Bucket self-join + exact hamming verify (bit_count of xor)."""
    chunks = max_hamming + 1
    width = 64 // chunks
    banded = sim_df.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("simhash"), i * width)
             .bitwiseAND(F.lit((1 << width) - 1))
            for i in range(chunks)])).alias("chunk", "chunk_val"))
    x = banded.alias("x")
    y = banded.alias("y")
    cand = (x.join(y, (F.col("x.chunk") == F.col("y.chunk"))
                   & (F.col("x.chunk_val") == F.col("y.chunk_val"))
                   & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("id_a"),
                    F.col("y.doc_id").alias("id_b"),
                    F.col("x.simhash").alias("sh_a"),
                    F.col("y.simhash").alias("sh_b"))
            .distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# embedding near-dup (cosine)
# ---------------------------------------------------------------------------

def _norm_col(vec: str) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(vec, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def dot_col(a: str | F.Column, b: str | F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def embedding_near_dups(emb_df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95,
                        n_planes: int = 16, seed: int = 7) -> DataFrame:
    """Random-hyperplane LSH: same sign pattern -> candidate bucket;
    verify with the exact cosine. Bucketing keeps the join linear-ish;
    near-identical vectors collide with high probability."""
    first = emb_df.select(F.size(vec_col).alias("d")).first()
    dim = first["d"]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    sig = F.concat_ws("", *[
        (dot_col(vec_col, F.array(*[F.lit(float(p[j])) for j in range(dim)]))
         > 0).cast("int").cast("string")
        for p in planes])
    normed = emb_df.withColumn("_norm", _norm_col(vec_col))
    hashed = normed.withColumn("_bucket", sig)
    x = hashed.alias("x")
    y = hashed.alias("y")
    cos = (dot_col(F.col("x." + vec_col), F.col("y." + vec_col))
           / (F.col("x._norm") * F.col("y._norm")))
    return (x.join(y, (F.col("x._bucket") == F.col("y._bucket"))
                   & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")))
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select(F.col(f"x.{id_col}").alias("id_a"),
                    F.col(f"y.{id_col}").alias("id_b"), "cosine"))
