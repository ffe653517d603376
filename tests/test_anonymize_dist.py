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
