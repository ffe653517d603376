"""Distributed (k,P)-anonymity end-to-end (operators/anonymize_dist):

- ROW-FOR-ROW equality between ``kp_anonymize_distributed`` (records
  distributed through C3/C4/C5/F9) and ``kp_anonymize_canonical`` (one
  in-memory kernel per source under the same order contract) — the
  round-4 'done' criterion for C4/C5 distribution.
- (k, P, l) invariants on a source LARGER than any single Arrow batch
  the pre-split path would have allowed, proving the scale path keeps
  reference semantics (groups may span the whole source).
- layout independence: repartitioned input produces identical rows.
"""

import numpy as np
import pandas as pd
import pytest

from kapra_spark import datagen
from kapra_spark.operators.anonymize_dist import (kp_anonymize_canonical,
                                                  kp_anonymize_distributed)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in ("lo", "hi"):
        df[c] = df[c].map(lambda v: None if v is None else tuple(v))
    return (df.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "source", "group_id", "sax", "as_perturbed",
              "lo", "hi", "suppressed"]])


@pytest.mark.parametrize("n,k,p,paa,l,seed", [
    (250, 8, 4, 4, 2, 11),    # mid-size, multi-source (4 sources)
    (120, 6, 3, 5, 1, 3),     # no l-diversity pressure, wider paa
    (90, 16, 8, 4, 2, 7),     # few big groups: maximize/TB-merge paths
])
def test_distributed_matches_canonical(spark, n, k, p, paa, l, seed):
    pdf = datagen.tokens_pdf(n, n_tok=13, seed=seed, gap_fraction=0.0)
    tokens = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)
    canon = _norm(kp_anonymize_canonical(tokens, k=k, p=p, paa=paa, l=l,
                                         seed=seed).toPandas())
    dist = _norm(kp_anonymize_distributed(tokens, k=k, p=p, paa=paa, l=l,
                                          seed=seed).toPandas())
    pd.testing.assert_frame_equal(canon, dist)


def test_distributed_layout_independent(spark):
    pdf = datagen.tokens_pdf(200, n_tok=13, seed=5, gap_fraction=0.0)
    tokens = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)
    a = _norm(kp_anonymize_distributed(tokens, k=8, p=4, paa=4, l=2)
              .toPandas())
    b = _norm(kp_anonymize_distributed(tokens.repartition(13, "doc_id"),
                                       k=8, p=4, paa=4, l=2).toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_distributed_giant_source_invariants(spark):
    """One hot source far larger than the pre-split path would allow in
    a single group (kp_anonymize(max_rows_per_split=256) would have cut
    it into 4+ independent splits, changing grouping semantics): the
    distributed path anonymizes it GLOBALLY and the (k, P, l)
    guarantees hold over the whole source."""
    k, p, l = 10, 5, 2
    pdf = datagen.tokens_pdf(1000, n_tok=13, seed=23, gap_fraction=0.0)
    pdf["source"] = "giant"
    tokens = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)
    out = kp_anonymize_distributed(tokens, k=k, p=p, paa=4, l=l).toPandas()

    assert len(out) == 1000
    assert out["doc_id"].nunique() == 1000
    grouped = out[~out["suppressed"]]
    # k-anonymity: every rendered group has >= k members
    sizes = grouped.groupby("group_id").size()
    assert (sizes >= k).all()
    # P-requirement: every (group, pattern) subgroup has >= P members
    psizes = grouped.groupby(["group_id", "sax"]).size()
    assert (psizes >= p).all()
    # suppression is the exception, not the rule
    assert out["suppressed"].sum() < 0.1 * len(out)
    # l-diversity: no equivalence class dominates its PS_R beyond 1/l
    for (_, _), sub in grouped.groupby(["group_id", "sax"]):
        vc = sub["as_perturbed"].value_counts()
        assert vc.iloc[0] <= np.floor(len(sub) / l) or vc.iloc[0] == 1
    # group envelopes actually bound the member series
    toks = {r.doc_id: np.asarray(r.tokens[:-1]) for r in pdf.itertuples()}
    for row in grouped.head(50).itertuples():
        v = toks[row.doc_id]
        assert (v >= np.asarray(row.lo)).all()
        assert (v <= np.asarray(row.hi)).all()


def test_c5_sharded_single_shard_equals_exact(spark):
    """The sharded C5 path with one shard covering every subgroup IS
    the exact core: same decision sequence, same k-group numbering
    (shard 0 * stride + local == exact index), same envelopes and
    l-diversity seeds — so the output is row-for-row equal to the
    exact driver-greedy path."""
    pdf = datagen.tokens_pdf(250, n_tok=13, seed=11, gap_fraction=0.0)
    tokens = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)
    exact = _norm(kp_anonymize_distributed(tokens, k=8, p=4, paa=4, l=2)
                  .toPandas())
    shard = _norm(kp_anonymize_distributed(tokens, k=8, p=4, paa=4, l=2,
                                           c5_exact_max=0,
                                           c5_shard_size=1_000_000)
                  .toPandas())
    pd.testing.assert_frame_equal(exact, shard)


def test_c5_sharded_multi_shard_invariants(spark):
    """Multi-shard C5 (the 10^12-sequence giant-source path, forced
    here with a tiny shard size): the grouping legitimately differs
    from the global greedy, but every (k, P, l) guarantee holds, every
    record is accounted for exactly once, the suppressed set equals
    the exact path's (shards always have >= shard_size >= k records,
    so no k-group-formation failures are introduced), and the result
    is independent of the input partition layout."""
    k, p, l = 8, 4, 2
    pdf = datagen.tokens_pdf(600, n_tok=13, seed=31, gap_fraction=0.0)
    pdf["source"] = "giant"
    tokens = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)
    out = kp_anonymize_distributed(tokens, k=k, p=p, paa=4, l=l,
                                   c5_exact_max=0, c5_shard_size=16
                                   ).toPandas()
    assert len(out) == 600
    assert out["doc_id"].nunique() == 600
    grouped = out[~out["suppressed"]]
    assert (grouped.groupby("group_id").size() >= k).all()
    assert (grouped.groupby(["group_id", "sax"]).size() >= p).all()
    for (_, _), sub in grouped.groupby(["group_id", "sax"]):
        vc = sub["as_perturbed"].value_counts()
        assert vc.iloc[0] <= np.floor(len(sub) / l) or vc.iloc[0] == 1
    toks = {r.doc_id: np.asarray(r.tokens[:-1]) for r in pdf.itertuples()}
    for row in grouped.head(50).itertuples():
        v = toks[row.doc_id]
        assert (v >= np.asarray(row.lo)).all()
        assert (v <= np.asarray(row.hi)).all()

    exact = kp_anonymize_distributed(tokens, k=k, p=p, paa=4, l=l).toPandas()
    assert (set(out[out["suppressed"]]["doc_id"])
            == set(exact[exact["suppressed"]]["doc_id"]))

    relay = _norm(kp_anonymize_distributed(
        tokens.repartition(13, "doc_id"), k=k, p=p, paa=4, l=l,
        c5_exact_max=0, c5_shard_size=16).toPandas())
    pd.testing.assert_frame_equal(_norm(out), relay)


def test_many_source_guard(spark):
    """kp_anonymize_distributed builds one distributed tree per source;
    above max_sources it must fail fast pointing at kp_anonymize
    instead of building an N-branch union plan."""
    pdf = datagen.tokens_pdf(30, n_tok=13, seed=1, gap_fraction=0.0)
    pdf["source"] = [f"s{i}" for i in range(len(pdf))]
    tokens = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)
    with pytest.raises(ValueError, match="max_sources"):
        kp_anonymize_distributed(tokens, k=4, p=2, paa=4, max_sources=10)


def test_distributed_small_source_suppressed(spark):
    """A source with fewer than k records cannot form any k-group: all
    its records come back suppressed (the reference refuses such input;
    suppression is the engine's privacy-safe resolution)."""
    pdf = datagen.tokens_pdf(5, n_tok=13, seed=2, gap_fraction=0.0)
    pdf["source"] = "tiny"
    tokens = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)
    out = kp_anonymize_distributed(tokens, k=8, p=4, paa=4).toPandas()
    assert len(out) == 5
    assert out["suppressed"].all()
