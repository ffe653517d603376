"""BPE tokenizer (operators/bpe.py): training on the published
Sennrich et al. example, determinism, distributed-vs-local count
parity, encode/decode round trip, and compression sanity."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from kapra_spark.operators.bpe import (_encode_word, _train_merges,
                                       bpe_decode_tokens, bpe_encode,
                                       bpe_train, bpe_vocab, word_counts)


def test_sennrich_example_first_merges():
    # Sennrich, Haddow & Birch 2016 §3.2 worked example: with
    # {low:5, lower:2, newest:6, widest:3} the first merges are
    # ('e','s') then ('es','t') (counts 9), then the 'est' unit.
    merges = _train_merges(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert ("est", "</w>") in merges


def test_train_deterministic_and_tiebreak():
    freqs = {"ab": 2, "cd": 2}  # all pairs tied at 2 -> lexicographic
    m1 = _train_merges(dict(freqs), 2)
    m2 = _train_merges(dict(freqs), 2)
    assert m1 == m2
    assert m1[0] == ("a", "b")  # < ('c','d') lexicographically


def test_encode_reproduces_training_segmentation():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = _train_merges(freqs, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # training saw 'newest' often enough to fuse it completely
    assert _encode_word("newest", ranks) == ["newest</w>"]
    # unseen word falls back to learned subwords
    assert _encode_word("lowest", ranks) == ["low", "est</w>"]


def test_merge_exhaustion_stops_early():
    merges = _train_merges({"ab": 1}, 100)
    assert len(merges) <= 2  # (a,b) and (ab,</w>) at most


def test_word_counts_matches_local(spark):
    rows = [("d1", "the cat sat, the cat!"), ("d2", "cat cat cat")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["word"]: r["count"]
           for r in word_counts(df, "text").collect()}
    assert got == {"the": 2, "cat": 5, "sat": 1, ",": 1, "!": 1}
    pruned = {r["word"]: r["count"]
              for r in word_counts(df, "text", min_count=2).collect()}
    assert pruned == {"the": 2, "cat": 5}


def test_spark_train_encode_roundtrip(spark):
    import re

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text").limit(120).cache()
    merges = bpe_train(docs, n_merges=100, min_count=2)
    assert len(merges) == 100
    enc = bpe_encode(docs, merges).toPandas()
    src = docs.toPandas()
    wre = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")
    want = {str(r["doc_id"]): " ".join(wre.findall(r["text"]))
            for _, r in src.iterrows()}
    n_chars = n_toks = 0
    for _, r in enc.iterrows():
        assert bpe_decode_tokens(list(r["bpe_tokens"])) == want[r["doc_id"]]
        assert r["n_bpe"] == len(r["bpe_tokens"])
        n_toks += r["n_bpe"]
        n_chars += len(want[r["doc_id"]])
    # learned subwords must compress vs character-level
    assert n_toks < 0.6 * n_chars


def test_vocab_shape():
    merges = [("a", "b"), ("ab", "c")]
    assert bpe_vocab(merges, base={"a", "b", "c"}) == \
        ["a", "b", "c", "ab", "abc"]


def test_bpe_tokens_table_feeds_the_engine(spark):
    """documents -> bpe_tokens_table yields the canonical tokens
    schema (BASELINE.json input_hint), zero-shuffle, and flows
    through compress_tokens -> decompress unchanged — the end-to-end
    ingest bridge from raw text to the engine."""
    from kapra_spark import datagen
    from kapra_spark.operators.bpe import bpe_tokens_table
    from kapra_spark.operators.compress import (compress_tokens,
                                                decompress_tokens)

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text", "source").limit(60).cache())
    merges = bpe_train(docs, n_merges=80, min_count=2)
    tok = bpe_tokens_table(docs, merges)

    assert [(f.name, f.dataType.simpleString())
            for f in tok.schema.fields] == \
        [(f.name, f.dataType.simpleString())
         for f in datagen.TOKENS_SCHEMA.fields]
    plan = tok._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # ingest is one narrow pass

    pdf = tok.toPandas()
    assert len(pdf) == 60
    assert (pdf["n_tok"] == pdf["tokens"].map(len)).all()
    assert all(0 <= t < 2_000_000_000
               for toks in pdf["tokens"] for t in toks)

    # the ids behave like any pre-tokenized input downstream
    blocks = compress_tokens(tok.filter(F.col("n_tok") > 0))
    back = (decompress_tokens(blocks).orderBy("doc_id", "t0")
            .toPandas())
    got = {}
    for _, r in back.iterrows():
        got.setdefault(r["doc_id"], []).extend(
            int(x) for x in r["tokens"] if x is not None)
    want = {r["doc_id"]: [int(x) for x in r["tokens"]]
            for _, r in pdf.iterrows() if r["n_tok"] > 0}
    assert got == want


def test_bpe_roundtrip_property():
    """Hypothesis: for ANY corpus and any merge budget, encoding then
    decoding every word reproduces it exactly (kernel-level, no
    Spark)."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    wre = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")

    @settings(max_examples=40, deadline=None)
    @given(
        words=st.lists(st.text(
            alphabet="abcdef01!,. ", min_size=1, max_size=12),
            min_size=1, max_size=30),
        n_merges=st.integers(0, 60),
    )
    def inner(words, n_merges):
        toks = [w for t in words for w in wre.findall(t)]
        if not toks:
            return
        freqs = {}
        for w in toks:
            freqs[w] = freqs.get(w, 0) + 1
        ranks = {p: i for i, p in
                 enumerate(_train_merges(freqs, n_merges))}
        for w in set(toks):
            assert bpe_decode_tokens(_encode_word(w, ranks)) == w

    inner()
