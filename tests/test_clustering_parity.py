"""Golden parity: run the reference's actual clustering code (with
stubbed deps, see reference_harness.py) against our vectorized kernels
on identical inputs and identical random sequences.

Fixtures use T=8 columns so NumPy reductions stay sequential (pairwise
summation starts above 8 elements) and float tie-breaking matches the
reference's pure-Python accumulation exactly.
"""

import random

import numpy as np
import pandas as pd
import pytest

from kapra_spark.functions import clustering as C
from tests.fixtures import int_series_matrix
from tests.reference_harness import load_reference

ref = load_reference()


def _as_dict(values: np.ndarray) -> dict:
    return {i: list(values[i]) for i in range(len(values))}


def _groups_to_ids(groups):
    return [sorted(g) for g in groups]


@pytest.fixture(scope="module")
def values():
    return int_series_matrix(n=48, t=8).astype(np.float64)


# ---------------------------------------------------------------------------
# C3/C4: create_tree (fully deterministic — no randomness involved)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("algorithm,p_value,paa", [
    ("kapra", 4, 4), ("kapra", 6, 5), ("naive", 4, 4), ("naive", 6, 5),
])
def test_create_tree_parity_synthetic(values, algorithm, p_value, paa):
    pr_ref: dict = {}
    p_groups_ref, suppressed_ref = ref.common.create_tree(
        algorithm, _as_dict(values), pr_ref, p_value, paa)

    mine = C.create_tree(algorithm, values, list(range(len(values))), p_value, paa)

    assert [sorted(g.keys()) for g in p_groups_ref] == [sorted(g) for g in mine.p_groups]
    assert [list(g.keys()) for g in p_groups_ref] == mine.p_groups  # order too
    assert [list(g.keys()) for g in suppressed_ref] == mine.suppressed
    assert pr_ref == mine.patterns


def test_create_tree_parity_sales_kapra():
    """Full-size golden: the real sales table, kapra parameters."""
    orig = pd.read_csv("/root/reference/data/sales_transactions_dataset_weekly.csv")
    vals = orig[orig.columns[1:-1]].to_numpy(dtype=np.float64)
    pr_ref: dict = {}
    p_groups_ref, suppressed_ref = ref.common.create_tree(
        "kapra", _as_dict(vals), pr_ref, 12, 6)
    mine = C.create_tree("kapra", vals, list(range(len(vals))), 12, 6)
    assert [list(g.keys()) for g in p_groups_ref] == mine.p_groups
    assert [list(g.keys()) for g in suppressed_ref] == mine.suppressed
    assert pr_ref == mine.patterns


# ---------------------------------------------------------------------------
# C1: top-down greedy (randomized — drive both with the same sequence)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("algorithm,size,seed", [
    ("kapra", 4, 1), ("kapra", 6, 2), ("naive", 4, 3), ("naive", 8, 4),
])
def test_top_down_parity(values, algorithm, size, seed):
    gmax = values.max(axis=0)
    gmin = values.min(axis=0)

    random.seed(seed)
    ref_groups, ref_labels = [], []
    ref.common.top_down_greedy_clustering(
        algorithm, _as_dict(values), size, ref_groups, ref_labels, "o",
        list(gmax), list(gmin))

    random.seed(seed)
    my_groups, my_labels = [], []
    C.top_down_greedy(algorithm, list(range(len(values))), size, values,
                      my_groups, my_labels, C.PyRandomSource(),
                      "o", gmax, gmin)

    assert [list(g.keys()) for g in ref_groups] == my_groups
    assert ref_labels == my_labels


# ---------------------------------------------------------------------------
# C2: postprocessing (deterministic given the clustered input)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("algorithm,size,seed", [
    ("kapra", 6, 5), ("naive", 6, 6), ("kapra", 8, 7),
])
def test_postprocessing_parity(values, algorithm, size, seed):
    gmax = values.max(axis=0)
    gmin = values.min(axis=0)

    random.seed(seed)
    ref_groups, ref_labels = [], []
    ref.common.top_down_greedy_clustering(
        algorithm, _as_dict(values), size, ref_groups, ref_labels, "o",
        list(gmax), list(gmin))
    ref_post = []
    ref.common.postprocessing(algorithm, size, list(ref_groups), list(ref_labels),
                              ref_post, list(gmax), list(gmin))

    random.seed(seed)
    my_groups, my_labels = [], []
    C.top_down_greedy(algorithm, list(range(len(values))), size, values,
                      my_groups, my_labels, C.PyRandomSource(), "o", gmax, gmin)
    my_post = []
    C.postprocess_groups(algorithm, size, my_groups, my_labels, my_post,
                         values, gmax, gmin)

    assert [list(g.keys()) for g in ref_post] == my_post


# ---------------------------------------------------------------------------
# C5: bottom-up k-group formation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("p_value,k_value,paa,seed", [
    (4, 8, 4, 11), (4, 12, 4, 12), (6, 12, 5, 13),
])
def test_bottom_up_parity(values, p_value, k_value, paa, seed):
    pr_ref: dict = {}
    p_groups_ref, _ = ref.common.create_tree("kapra", _as_dict(values),
                                             pr_ref, p_value, paa)
    mine_tree = C.create_tree("kapra", values, list(range(len(values))),
                              p_value, paa)
    assert [list(g.keys()) for g in p_groups_ref] == mine_tree.p_groups

    random.seed(seed)
    gl_ref: list = []
    ref.k_anonymity.k_anonymity_bottom_up(
        [dict(g) for g in p_groups_ref], p_value, k_value, gl_ref)

    random.seed(seed)
    gl_mine, unplaced = C.bottom_up_kgroups(
        values, [list(g) for g in mine_tree.p_groups],
        p_value, k_value, C.PyRandomSource())

    assert unplaced == []
    assert [list(g.keys()) for g in gl_ref] == gl_mine


# ---------------------------------------------------------------------------
# F9: l-diversity (randomized via numpy default_rng + random.shuffle)
# ---------------------------------------------------------------------------

def test_l_diversity_parity(values, monkeypatch):
    p_value, k_value, paa, l_value = 4, 8, 4, 2
    tree = C.create_tree("kapra", values, list(range(len(values))), p_value, paa)
    random.seed(21)
    k_groups, _ = C.bottom_up_kgroups(values, [list(g) for g in tree.p_groups],
                                      p_value, k_value, C.PyRandomSource())

    # low-cardinality sensitive values force perturbation
    rng = np.random.default_rng(99)
    sens = {i: int(rng.integers(0, 3)) for i in range(len(values))}

    real_default_rng = np.random.default_rng

    def seeded_rng(*a, **k):
        if a or k:
            return real_default_rng(*a, **k)
        return real_default_rng(777)

    monkeypatch.setattr(np.random, "default_rng", seeded_rng)

    random.seed(31)
    sens_ref = dict(sens)
    ref.l_diversity.enforce_l_diversity(
        dict(tree.patterns), sens_ref,
        [{i: list(values[i]) for i in g} for g in k_groups], l_value)

    random.seed(31)
    sens_mine = dict(sens)
    C.enforce_l_diversity(dict(tree.patterns), sens_mine,
                          [list(g) for g in k_groups], l_value,
                          C.PyRandomSource())

    assert sens_ref == sens_mine
