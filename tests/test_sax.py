"""SAX kernel unit + golden tests (SURVEY.md §5.2 unit layer)."""

import numpy as np
import pandas as pd
import pytest

from kapra_spark.functions import sax as S

SALES = "/root/reference/data/sales_transactions_dataset_weekly.csv"
ANON = "/root/reference/data/anonymized/sales_transactions_dataset_weekly_anon.csv"


def test_cuts_match_gaussian_quantiles():
    for a in range(2, 21):
        cuts = S.cuts_for_asize(a)
        assert cuts[0] == -np.inf
        for i, c in enumerate(cuts[1:], start=1):
            assert abs(c - S._norm_ppf(i / a)) < 5e-7


def test_znorm_identity_branch():
    flat = np.array([5.0, 5.0, 5.0, 5.001])
    assert np.array_equal(S.znorm(flat), flat)  # std < 0.01 -> identity
    v = np.array([1.0, 2.0, 3.0, 4.0])
    z = S.znorm(v)
    assert abs(z.mean()) < 1e-12 and abs(z.std() - 1) < 1e-12


def test_paa_cases():
    v = np.arange(6, dtype=float)
    assert np.array_equal(S.paa(v, 6), v)            # n == w
    assert np.allclose(S.paa(v, 3), [0.5, 2.5, 4.5])  # divisible
    v5 = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    res = np.zeros(3)
    for i in range(15):  # fractional virtual-point semantics
        res[i // 5] += v5[i // 3]
    assert np.allclose(S.paa(v5, 3), res / 5)


def test_sax_boundary_rule():
    cuts = S.cuts_for_asize(4)  # [-inf, -0.6744898, 0, 0.6744898]
    # value exactly on a cut: >=0 maps DOWN, <0 maps UP
    assert S.ts_to_string(np.array([0.0]), cuts) == "b"
    assert S.ts_to_string(np.array([0.6744898]), cuts) == "c"
    assert S.ts_to_string(np.array([-0.6744898]), cuts) == "b"
    assert S.ts_to_string(np.array([-0.7, 0.7]), cuts) == "ad"


def test_sax2d_equals_1d_on_reference_data():
    orig = pd.read_csv(SALES)
    vals = orig[orig.columns[1:-1]].to_numpy(dtype=float)
    for lvl in (2, 3, 4, 5):
        batch = S.sax2d(vals, 6, lvl)
        ones = [S.sax_by_chunking(vals[i], 6, lvl) for i in range(len(vals))]
        assert batch == ones


def test_golden_sax_strings_vs_reference_artifact():
    """Every SAX string in the reference's shipped anonymized output is
    reproducible from the original series at the inferred level."""
    anon = pd.read_csv(ANON)
    orig = pd.read_csv(SALES).set_index("Product_Code")
    cols = orig.columns[:-1]
    checked = 0
    for _, row in anon.iterrows():
        rid, saxs = row.iloc[0], row["sax"]
        if not isinstance(saxs, str) or saxs.strip() == "-" or rid not in orig.index:
            continue
        saxs = saxs.strip()
        ser = orig.loc[rid, cols].to_numpy(dtype=float)
        level = max(ord(c) - 97 for c in saxs) + 1
        mine = S.sax_by_chunking(ser, len(saxs), level) if level > 1 else "a" * len(saxs)
        assert mine == saxs, rid
        checked += 1
    assert checked > 700


def test_reconstruction_deterministic():
    m1 = S.reconstruct_paa("abcba")
    S._MEDIAN_CACHE.clear()
    m2 = S.reconstruct_paa("abcba")
    assert np.array_equal(m1, m2)
    assert np.array_equal(S.reconstruct_paa("aaaa"), np.zeros(4))
    assert m1[0] == m1[4] and m1[1] == m1[3]  # symmetric letters


def test_hamming():
    assert S.hamming("abc", "abd") == 1
    assert S.hamming("aaa", "aaa") == 0
