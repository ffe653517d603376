"""PRODUCT-level golden vs the reference: run the reference's whole
CLI pipeline (k_P_anonymity.py:28-103 — Naive/KAPRA -> anonymized CSV
-> VL/PL metrics) and our engine's product path (read_wide_csv ->
run_kp_anonymity, the body of kapra_spark.cli) on the SAME input with
the SAME random sequence, and assert:

- identical anonymized output: per-record envelope arrays, sax string,
  sensitive value, suppression, and the group PARTITION (labels are
  numbering-scheme-local, so groups compare as sets of doc-id sets);
- equal tot/avg value loss and tot/avg pattern loss (3 decimals, the
  reference's own rounding).

This closes the gap between "parity-tested kernels" and a
"parity-tested product" (VERDICT r2 #1): any divergence in ANY layer —
ingest, grouping, l-diversity, render, metrics — fails here.

Shared randomness: the reference draws from the global ``random``
module (includes/common.py:144,179); our worker builds
``NumpyRandomSource(stable_seed(seed, source))``
(operators/grouping.py:69). The test patches ``random.randint`` /
``random.shuffle`` to delegate to an identically-seeded
NumpyRandomSource, so both products consume one sequence. (The only
other reference RNG — the unseeded generator in l_diversity.py:57 —
never fires at l=1, the golden config.)

Record order: the reference keeps CSV file order; our product sorts by
doc_id string. The tmp copy relabels ids zero-padded in file order
(P0001..) so both orders coincide — a labeling change only.
"""

import os

import numpy as np
import pandas as pd
import pytest

from kapra_spark.functions import clustering as C
from tests.reference_harness import load_reference

ref = load_reference()

SALES = "/root/reference/data/sales_transactions_dataset_weekly.csv"
SEED = 42


def _prepare_input(tmp_path, n_rows=None):
    """Tmp copy of the sales CSV with zero-padded ids in file order."""
    df = pd.read_csv(SALES)
    if n_rows is not None:
        df = df.head(n_rows)
    ids = [f"P{i:04d}" for i in range(len(df))]
    df[df.columns[0]] = ids
    name = "sales_product_golden"
    csv_path = tmp_path / f"{name}.csv"
    df.to_csv(csv_path, index=False)
    os.makedirs(tmp_path / "anonymized", exist_ok=True)
    return str(csv_path), name


def _patch_reference_rng(monkeypatch, scope):
    import random

    rnd = C.NumpyRandomSource(C.stable_seed(SEED, scope))
    monkeypatch.setattr(random, "randint", rnd.randint)
    monkeypatch.setattr(random, "shuffle", rnd.shuffle)


def _run_reference(algorithm, k, p, paa, l, csv_path):
    """The body of k_P_anonymity.py minus argv/results-file plumbing."""
    import importlib

    naive_mod = importlib.import_module("includes.naive")
    kapra_mod = importlib.import_module("includes.kapra")
    pl_mod = importlib.import_module("includes.pattern_loss")
    metric_mod = importlib.import_module("includes.metric")
    if algorithm == "naive":
        naive_mod.Naive(k, p, paa, l, csv_path)
    else:
        kapra_mod.KAPRA(k, p, paa, l, csv_path)
    tot_pl, avg_pl = pl_mod.global_pattern_loss(csv_path, algorithm)
    anon_path = pl_mod.generate_output_path(csv_path, algorithm)
    tot_vl, avg_vl = metric_mod.global_anon_value_loss(anon_path)
    return str(anon_path), {
        "tot_pattern_loss": round(float(tot_pl), 3),
        "avg_pattern_loss": round(float(avg_pl), 3),
        "tot_value_loss": round(float(tot_vl), 3),
        "avg_value_loss": round(float(avg_vl), 3),
    }


def _parse_reference_output(anon_path):
    """id -> (env_lo_tuple, env_hi_tuple, sax, as, suppressed) plus the
    group partition as a set of frozensets of ids."""
    df = pd.read_csv(anon_path, dtype=str)
    id_col = df.columns[0]
    env_cols = [c for c in df.columns if c not in (id_col, "sax", "as", "group")]
    rows, groups = {}, {}
    for _, r in df.iterrows():
        rid = r[id_col]
        if r["group"].strip() == "-":
            rows[rid] = (None, None, None, None, True)
            continue
        lo = tuple(int(c.split("|")[0].lstrip("[")) for c in (r[c2] for c2 in env_cols))
        hi = tuple(int(c.split("|")[1].rstrip("]")) for c in (r[c2] for c2 in env_cols))
        rows[rid] = (lo, hi, r["sax"], int(float(r["as"])), False)
        groups.setdefault(r["group"], set()).add(rid)
    return rows, {frozenset(v) for v in groups.values()}


def _parse_engine_output(spark, parquet_path):
    pdf = spark.read.parquet(parquet_path).toPandas()
    rows, groups = {}, {}
    for r in pdf.itertuples():
        if r.suppressed:
            rows[r.doc_id] = (None, None, None, None, True)
            continue
        rows[r.doc_id] = (tuple(int(x) for x in r.lo),
                          tuple(int(x) for x in r.hi),
                          r.sax, int(r.as_perturbed), False)
        groups.setdefault(r.group_id, set()).add(r.doc_id)
    return rows, {frozenset(v) for v in groups.values()}


@pytest.mark.parametrize("algorithm,k,p,n_rows", [
    ("kapra", 16, 12, None),   # the golden config of
    #   results/Matteo/kapra_sales_..._k16_P12_paa6_l1.csv, full table
    ("naive", 16, 12, 200),    # naive product path on a head slice
    #   (naive's NCP scan is O(n^2 T); full-table naive is minutes)
])
def test_product_golden_vs_reference(spark, tmp_path, monkeypatch,
                                     algorithm, k, p, n_rows):
    paa, l = 6, 1
    csv_path, scope = _prepare_input(tmp_path, n_rows)

    # --- reference product, sharing our worker's random sequence ---
    _patch_reference_rng(monkeypatch, scope)
    anon_path, ref_metrics = _run_reference(algorithm, k, p, paa, l, csv_path)
    ref_rows, ref_groups = _parse_reference_output(anon_path)

    # --- our product (the kapra_spark.cli body) on the same CSV ---
    from kapra_spark.plans.anonymize_plan import run_kp_anonymity
    from kapra_spark.sources.csv_compat import read_wide_csv

    tokens = read_wide_csv(spark, csv_path)
    out_path = str(tmp_path / "anon_parquet")
    row = run_kp_anonymity(spark, algorithm, k, p, paa, l, tokens,
                           output_path=out_path)
    got_rows, got_groups = _parse_engine_output(spark, out_path)

    # --- row-for-row anonymized output equality ---
    assert set(got_rows) == set(ref_rows)
    n_diff = sum(1 for i in ref_rows if got_rows[i] != ref_rows[i])
    assert n_diff == 0, (
        f"{n_diff} rows diverge, e.g. "
        f"{next((i, ref_rows[i], got_rows[i]) for i in ref_rows if got_rows[i] != ref_rows[i])}")
    assert got_groups == ref_groups

    # --- metric equality (reference rounds to 3 decimals) ---
    got_metrics = {m: round(float(row[m]), 3) for m in ref_metrics}
    assert got_metrics == pytest.approx(ref_metrics, abs=2e-3), (
        got_metrics, ref_metrics)
