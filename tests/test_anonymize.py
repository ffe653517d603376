"""End-to-end (k,P)-anonymity pipeline tests: privacy guarantees,
partition properties, determinism, metric consistency, CSV compat."""

import numpy as np
import pandas as pd
import pytest

from kapra_spark import datagen
from kapra_spark.functions import metrics as M
from kapra_spark.operators.grouping import kp_anonymize

K, P, PAA, L = 8, 4, 4, 2
N = 120


@pytest.fixture(scope="module")
def tokens(spark):
    pdf = datagen.tokens_pdf(N, n_tok=13, seed=11, gap_fraction=0.0)
    return spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA).cache()


@pytest.fixture(scope="module")
def anon_kapra(spark, tokens):
    return kp_anonymize(tokens, k=K, p=P, paa=PAA, l=L,
                        algorithm="kapra").toPandas()


def test_partition_property(anon_kapra, tokens):
    """grouped + suppressed rows partition the input exactly."""
    ids = set(r.doc_id for r in tokens.select("doc_id").collect())
    assert set(anon_kapra["doc_id"]) == ids
    assert len(anon_kapra) == len(ids)  # no duplicates


def test_k_guarantee(anon_kapra):
    grouped = anon_kapra[~anon_kapra["suppressed"]]
    sizes = grouped.groupby("group_id").size()
    assert (sizes >= K).all(), sizes[sizes < K]


def test_p_guarantee(anon_kapra):
    """every P-subgroup (same group, same sax) has >= P members."""
    grouped = anon_kapra[~anon_kapra["suppressed"]]
    psub = grouped.groupby(["group_id", "sax"]).size()
    assert (psub >= P).all(), psub[psub < P]


def test_envelope_contains_series(anon_kapra, tokens):
    toks = {r.doc_id: np.array(r.tokens[:-1]) for r in tokens.collect()}
    for _, row in anon_kapra[~anon_kapra["suppressed"]].iterrows():
        s = toks[row["doc_id"]]
        assert (s >= np.array(row["lo"])).all()
        assert (s <= np.array(row["hi"])).all()


def test_groups_within_source(anon_kapra):
    grouped = anon_kapra[~anon_kapra["suppressed"]]
    for gid, grp in grouped.groupby("group_id"):
        assert grp["source"].nunique() == 1
        assert gid.startswith(grp["source"].iloc[0] + "#")


def test_determinism(spark, tokens, anon_kapra):
    again = kp_anonymize(tokens.repartition(7), k=K, p=P, paa=PAA, l=L,
                         algorithm="kapra").toPandas()
    a = anon_kapra.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    for c in ("group_id", "sax", "as_perturbed", "suppressed"):
        av = a[c].astype(object).where(a[c].notna(), None).tolist()
        bv = b[c].astype(object).where(b[c].notna(), None).tolist()
        assert av == bv, c


def test_naive_path(spark, tokens):
    anon = kp_anonymize(tokens, k=K, p=P, paa=PAA, l=L,
                        algorithm="naive").toPandas()
    assert not anon["suppressed"].any()  # naive never suppresses
    assert len(anon) == N
    assert anon["sax"].notna().all()


def test_value_loss_consistency(spark, tokens, anon_kapra):
    """Spark HOF aggregate equals the NumPy reference formula."""
    from kapra_spark.operators.grouping import kp_anonymize as _
    from kapra_spark.operators.metrics_ops import group_value_loss

    anon_df = spark.createDataFrame(anon_kapra)
    vl_spark = {r["group_id"]: r["vl"]
                for r in group_value_loss(anon_df).collect()}
    grouped = anon_kapra[~anon_kapra["suppressed"]]
    for gid, grp in grouped.groupby("group_id"):
        lo = np.array(grp["lo"].iloc[0], dtype=float)
        hi = np.array(grp["hi"].iloc[0], dtype=float)
        expect = M.value_loss_given_bounds(
            np.zeros((len(grp), len(lo))), hi, lo)
        assert abs(vl_spark[gid] - expect) < 1e-6 * max(1, expect)


def test_pattern_loss_runs(spark, tokens):
    from kapra_spark.operators.metrics_ops import global_pattern_loss

    anon = kp_anonymize(tokens, k=K, p=P, paa=PAA, l=L, algorithm="kapra")
    row = global_pattern_loss(tokens, anon).collect()[0]
    assert 0.0 <= row["avg_pattern_loss"] <= 1.0


def test_l_diversity_guarantee(anon_kapra):
    """after perturbation every P-subgroup's dominant sensitive value
    has frequency <= 1/L (the reference enforces <= |PS_R|/l via
    x_i perturbations; verify the resulting distribution)."""
    grouped = anon_kapra[~anon_kapra["suppressed"]]
    viol = 0
    for (gid, sax), grp in grouped.groupby(["group_id", "sax"]):
        vc = grp["as_perturbed"].value_counts()
        if vc.iloc[0] / len(grp) > 1 / L:
            viol += 1
    # perturbation guarantees uniqueness of new values, so violations
    # can only remain when a class was already dominant beyond repair;
    # on this fixture none should remain
    assert viol == 0


def test_csv_compat_roundtrip(spark, tmp_path, tokens):
    from kapra_spark.sources.csv_compat import (parse_envelope_strings,
                                                read_wide_csv,
                                                write_anonymized_csv)

    anon = kp_anonymize(tokens, k=K, p=P, paa=PAA, l=L, algorithm="kapra")
    out = str(tmp_path / "anon_csv")
    write_anonymized_csv(anon, out)
    back = spark.read.csv(out, header=True)
    assert back.count() == N
    # suppressed rows render as the reference's " - " placeholder
    suppressed_csv = back.filter("trim(envelopes) = '-'").count()
    suppressed_orig = anon.filter("suppressed").count()
    assert suppressed_csv == suppressed_orig
    parsed = parse_envelope_strings(
        back.filter("trim(envelopes) != '-'")).select("doc_id", "lo", "hi").toPandas()
    orig = anon.filter("NOT suppressed").select("doc_id", "lo", "hi").toPandas()
    a = parsed.sort_values("doc_id").reset_index(drop=True)
    b = orig.sort_values("doc_id").reset_index(drop=True)
    for x, y in zip(a["lo"], b["lo"]):
        assert list(x) == list(y)
    for x, y in zip(a["hi"], b["hi"]):
        assert list(x) == list(y)

    # wide-CSV reader shape check against the reference's own dataset
    wide = read_wide_csv(
        spark, "/root/reference/data/sales_transactions_dataset_weekly.csv")
    r = wide.limit(1).collect()[0]
    assert len(r.tokens) == 52 and r.n_tok == 52


# ---------------------------------------------------------------------------
# salted sub-source pre-split (hot-source scale bound)
# ---------------------------------------------------------------------------

def test_presplit_hot_source(spark):
    """A source bigger than max_rows_per_split is salted into
    independent sub-sources; (k,P) invariants hold per split and the
    result is partition-layout independent."""
    pdf = datagen.tokens_pdf(600, n_tok=13, seed=17, gap_fraction=0.0)
    pdf["source"] = "hot"  # one giant source
    tokens = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)

    anon = kp_anonymize(tokens, k=K, p=P, paa=PAA, l=L, algorithm="kapra",
                        max_rows_per_split=150).toPandas()

    # partition property: every input row exactly once
    assert sorted(anon["doc_id"]) == sorted(pdf["doc_id"])

    grouped = anon[~anon["suppressed"]]
    # multiple splits actually created (600 rows / 150 -> 4 salted splits)
    splits = grouped["group_id"].str.extract(r"^(hot~\d+)#")[0]
    assert splits.nunique() >= 2
    # k-guarantee per group, P-guarantee per (group, sax)
    sizes = grouped.groupby("group_id").size()
    assert (sizes >= K).all(), sizes[sizes < K]
    psub = grouped.groupby(["group_id", "sax"]).size()
    assert (psub >= P).all(), psub[psub < P]

    # deterministic under a different physical layout
    anon2 = kp_anonymize(tokens.repartition(13), k=K, p=P, paa=PAA, l=L,
                         algorithm="kapra", max_rows_per_split=150).toPandas()
    a = anon.sort_values("doc_id").reset_index(drop=True)
    b = anon2.sort_values("doc_id").reset_index(drop=True)
    assert (a["group_id"].fillna("") == b["group_id"].fillna("")).all()
    assert (a["sax"].fillna("") == b["sax"].fillna("")).all()


def test_presplit_guard(spark):
    pdf = datagen.tokens_pdf(50, n_tok=13, seed=17, gap_fraction=0.0)
    tokens = spark.createDataFrame(pdf, schema=datagen.TOKENS_SCHEMA)
    with pytest.raises(ValueError):
        kp_anonymize(tokens, k=K, p=P, paa=PAA, l=L,
                     max_rows_per_split=K)  # < 4*k


def test_experiment_grid(spark, tokens, tmp_path):
    """Grid runner mirrors the reference's experiments/__main__.py:
    sweep cells in one session, append metrics rows, capture per-cell
    errors without aborting the sweep."""
    from kapra_spark.experiments import run_grid

    res_path = str(tmp_path / "grid_results")
    results, errors = run_grid(
        spark, {"synthetic": tokens},
        k_p_pairs=[(K, P), (2, 4)],  # second cell violates k >= P
        paa=PAA, l=L, results_path=res_path)

    assert len(results) == 2   # (naive|kapra) x the valid pair
    assert len(errors) == 2    # (naive|kapra) x the invalid pair
    assert all(e["k"] == 2 and "k must be >= P" in e["error"]
               for e in errors)
    for r in results:
        assert r["dataset"] == "synthetic"
        assert 0.0 <= r["avg_pattern_loss"] <= 1.0
        assert r["eta"] > 0
    stored = spark.read.parquet(res_path)
    assert stored.count() == 2
    assert {"algorithm", "k", "p", "avg_pattern_loss",
            "avg_value_loss"} <= set(stored.columns)
