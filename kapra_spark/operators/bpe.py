"""Byte-pair-encoding tokenizer: distributed training + encoding.

BPE (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units" — the published algorithm; also Gage
1994) learns a merge list from corpus statistics and encodes text as
subword tokens. This is the canonical "tokenizer training" step of a
large-scale training-data pipeline, built Spark-first:

- **Word counting is the distributed part** — the only pass over the
  corpus. Pre-tokenize with a regex (words | single punctuation),
  explode, and hash-aggregate to a (word, count) table: ONE shuffle,
  map-side partial aggregation, pure JVM expressions. At 100 TB the
  corpus is petabyte-ish tokens but the DISTINCT-word table is
  10^7-10^8 rows — the classic heavy-tail collapse.
- **Merge learning runs on the word table, not the corpus.**
  ``min_count`` prunes the hapax tail first (standard practice; a
  word must occur >= min_count to influence merges), then the table
  is collected and the exact greedy runs locally: count adjacent
  symbol pairs weighted by word frequency, merge the argmax
  (deterministic tie-break: count desc, then lexicographic pair),
  repeat. The collect is O(distinct words after pruning) — stated
  honestly as the driver bound; the corpus itself is never collected
  and never re-scanned per merge. (An n_merges-shuffle fully
  distributed variant exists in the literature; the collect-the-
  vocabulary form is what production tokenizer trainers do.)
- **Encoding is a narrow mapInPandas** with the merge ranks
  broadcast: per Arrow batch, each DISTINCT word is encoded once
  (memoized — web text repeats words heavily) by the standard
  lowest-rank-first merge loop, then tokens are stitched per row.
  No shuffle; linear in bytes scanned.

End-of-word is marked with the ``</w>`` suffix symbol (the paper's
formulation), so decoding is concatenation + boundary restore —
``bpe_decode_tokens`` round-trips exactly.

Reference context: /root/reference has no tokenizer (its tokens
arrive pre-computed); this is engine surface for SURVEY.md §2.12.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WORD_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
_EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text",
                min_count: int = 1) -> DataFrame:
    """(word, count) over the corpus — the one distributed pass.
    Pure JVM: regexp extraction + explode + hash aggregate."""
    w = (df.select(F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(_WORD_RE),
                                 F.lit(0)))
          .alias("word"))
         .groupBy("word").agg(F.count("*").alias("count")))
    if min_count > 1:
        w = w.filter(F.col("count") >= min_count)
    return w


def _train_merges(freqs: dict[str, int],
                  n_merges: int) -> list[tuple[str, str]]:
    """Exact greedy BPE on a word-frequency table. Deterministic:
    ties broken by (count desc, pair lexicographic)."""
    words: dict[tuple[str, ...], int] = {}
    for w, c in freqs.items():
        words[tuple(w) + (_EOW,)] = words.get(tuple(w) + (_EOW,), 0) + c

    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set] = {}
    for sym, c in words.items():
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] += c
            where.setdefault((a, b), set()).add(sym)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        # rewrite only the words that contain the pair
        for sym in list(where.get(pair, ())):
            c = words.pop(sym, None)
            if c is None:
                continue
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] -= c
            out = []
            i = 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == pair[0]
                        and sym[i + 1] == pair[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new = tuple(out)
            words[new] = words.get(new, 0) + c
            for a, b in zip(new, new[1:]):
                pair_counts[(a, b)] += c
                where.setdefault((a, b), set()).add(new)
        where.pop(pair, None)
    return merges


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 200,
              min_count: int = 1) -> list[tuple[str, str]]:
    """Train a BPE merge list: one distributed counting pass, then the
    exact greedy on the collected (pruned) word table. Returns the
    ordered merge list (rank = position)."""
    freqs = {r["word"]: r["count"]
             for r in word_counts(df, text_col, min_count).collect()}
    return _train_merges(freqs, n_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE apply: repeatedly merge the lowest-rank adjacent
    pair (exactly reproduces training order)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


BPE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("bpe_tokens", T.ArrayType(T.StringType()), False),
    T.StructField("n_bpe", T.IntegerType(), False),
])


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id",
               carry_cols: list[str] | None = None) -> DataFrame:
    """Encode the corpus with a trained merge list: narrow
    mapInPandas, merge ranks broadcast via closure, per-batch
    memoization of distinct-word encodings. ``carry_cols`` pass
    through unchanged (keeps downstream use join-free)."""
    import re

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    word_re = re.compile(_WORD_RE)
    carry = list(carry_cols or [])
    schema = T.StructType(
        BPE_SCHEMA.fields
        + [df.schema[c] for c in carry])

    def fn(batches):
        cache: dict[str, list[str]] = {}

        def enc(text):
            out = []
            for w in word_re.findall(text if isinstance(text, str) else ""):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        for pdf in batches:
            toks = [enc(t) for t in pdf[text_col]]
            out = pd.DataFrame({
                "doc_id": pdf[id_col].astype(str),
                "bpe_tokens": toks,
                "n_bpe": [len(t) for t in toks],
            })
            for c in carry:
                out[c] = pdf[c].values
            yield out

    return df.select(id_col, text_col, *carry).mapInPandas(fn, schema)


def bpe_decode_tokens(tokens: list[str]) -> str:
    """Inverse of the word-level encoding: concatenate and turn each
    end-of-word marker into a single space (the pre-tokenizer's
    whitespace is normalized, not preserved — stated contract)."""
    return "".join(tokens).replace(_EOW, " ").strip()


def bpe_vocab(merges: list[tuple[str, str]],
              base: set[str] | None = None) -> list[str]:
    """Vocabulary implied by a merge list: base symbols + one entry
    per merge, in rank order."""
    out = sorted(base) if base else []
    out.extend(a + b for a, b in merges)
    return out


def bpe_tokens_table(df: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text", id_col: str = "doc_id",
                     source_col: str = "source") -> DataFrame:
    """Raw text -> the engine's canonical tokens table
    (doc_id string, tokens array<int32>, n_tok int32, source string;
    BASELINE.json input_hint): encode with the merge list, then map
    token STRINGS to integer ids with a deterministic hash
    (xxhash64 folded to non-negative int32 — id assignment needs no
    vocabulary broadcast or join, so this stays one narrow pass).
    The ids feed rollup/compression exactly like pre-tokenized
    input — the end-to-end ingest bridge from a document corpus to
    the retention tiers.

    Trade-off: the hash fold means distinct subwords CAN collide onto
    one id (birthday bound: ~0.25% collision probability among 10^5
    distinct subwords over a 2e9 space; expected colliding pairs
    ~ V^2 / 4e9). That is fine for feeding the rollup/compression
    tiers (ids are opaque stream values there) but LOSSY if the ids
    are treated as a real vocabulary — for vocabulary-faithful ids,
    build a dense mapping from :func:`bpe_vocab` (rank = id) and join
    or broadcast it instead. Zero shuffle: one mapInPandas (source
    carried through, no join) followed by JVM-side
    transform/xxhash64 expressions."""
    src = (df.select(F.col(id_col).cast("string").alias("doc_id"),
                     F.col(text_col),
                     F.col(source_col).cast("string").alias("source"))
           if source_col in df.columns else
           df.select(F.col(id_col).cast("string").alias("doc_id"),
                     F.col(text_col), F.lit("corpus").alias("source")))
    enc = bpe_encode(src, merges, text_col=text_col, id_col="doc_id",
                     carry_cols=["source"])
    return enc.select(
        "doc_id",
        F.transform(
            "bpe_tokens",
            lambda t: F.pmod(F.xxhash64(t), F.lit(2_000_000_000))
            .cast("int")).alias("tokens"),
        F.col("n_bpe").alias("n_tok"),
        "source")
