"""GPLVM tests.

Oracles: the multi-output NLML reduces to the single-output NLML at
p=1 and to a sum over columns; the Linear-kernel MAP recovers the PCA
principal subspace (Lawrence 2005 §3.1); an RBF GPLVM un-rolls a
nonlinear 1-D manifold embedded in 5-D (rank-correlation recovery of
the latent ordering).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pygpr_tpu import Linear, RBF, Sum, WhiteNoise
from pygpr_tpu.models import gplvm
from pygpr_tpu.models.likelihood import nlml


def test_nlml_multi_reductions(rng):
    n, d, p = 20, 2, 3
    x = jnp.asarray(rng.uniform(size=(n, d)))
    Y = jnp.asarray(rng.normal(size=(n, p)))
    cov = Sum((RBF(), WhiteNoise()))
    theta = 0.5 + jnp.asarray(rng.uniform(size=cov.n_params(d)))
    joint = float(gplvm.nlml_multi(cov, theta, x, Y))
    # column sum of single-output NLMLs (identical gram, same jitter)
    parts = sum(float(nlml(cov, theta, x, Y[:, j])) for j in range(p))
    np.testing.assert_allclose(joint, parts, rtol=1e-8)
    # p=1 exact reduction
    np.testing.assert_allclose(
        float(gplvm.nlml_multi(cov, theta, x, Y[:, :1])),
        float(nlml(cov, theta, x, Y[:, 0])),
        rtol=1e-9,
    )


def _subspace_alignment(a, b):
    """Max principal-angle cosine overlap between column spaces."""
    qa, _ = np.linalg.qr(a - a.mean(0))
    qb, _ = np.linalg.qr(b - b.mean(0))
    s = np.linalg.svd(qa.T @ qb, compute_uv=False)
    return s.min()  # smallest canonical cosine


def test_linear_kernel_recovers_pca_subspace(rng):
    """Linear-kernel GPLVM == probabilistic PCA: the learned latent
    subspace must align with the top-q PCA subspace."""
    n, p, q = 60, 5, 2
    # low-rank data: 2 latent directions + small noise
    t = rng.normal(size=(n, q))
    W = rng.normal(size=(q, p))
    Y = t @ W + 0.05 * rng.normal(size=(n, p))
    res = gplvm.fit(
        Sum((Linear(), WhiteNoise())), jnp.asarray(Y), q=q,
        max_iter=400,
    )
    lat = np.asarray(res.latents)
    align = _subspace_alignment(lat, gplvm.pca_init(Y, q))
    assert align > 0.99, align
    # and the latents explain the data: reconstruction error small
    mean, _ = gplvm.reconstruct(
        Sum((Linear(), WhiteNoise())), res.params, res.latents,
        jnp.asarray(Y),
    )
    rel = float(
        np.linalg.norm(np.asarray(mean) - Y) / np.linalg.norm(Y)
    )
    assert rel < 0.1, rel


def test_rbf_gplvm_unrolls_nonlinear_manifold(rng):
    """5-D observations on a nonlinear 1-D curve: the recovered 1-D
    latent must preserve the ordering of the true parameter."""
    n = 80
    t = np.sort(rng.uniform(-2, 2, n))
    Y = np.stack(
        [
            np.sin(t), np.cos(t), np.sin(2 * t),
            0.5 * t, np.cos(2 * t),
        ],
        axis=1,
    ) + 0.02 * rng.normal(size=(n, 5))
    model = gplvm.GPLVM(Y, q=1).train(max_iter=400)
    lat = np.asarray(model.latents)[:, 0]
    from scipy.stats import spearmanr

    rho = abs(spearmanr(lat, t).statistic)
    assert rho > 0.95, rho
    mean, var = model.reconstruct()
    rel = float(
        np.linalg.norm(np.asarray(mean) - Y) / np.linalg.norm(Y)
    )
    assert rel < 0.15, rel
    assert np.isfinite(np.asarray(var)).all()


def test_prior_weight_bounds_latent_scale(rng):
    """The standard-normal latent prior keeps MAP latents at O(1)
    scale (the degeneracy it exists to break)."""
    n = 40
    t = np.sort(rng.uniform(-2, 2, n))
    Y = np.stack([np.sin(t), np.cos(t), t], axis=1)
    res = gplvm.fit(
        Sum((RBF(), WhiteNoise())), jnp.asarray(Y), q=1, max_iter=200
    )
    lat = np.asarray(res.latents)
    assert lat.std() < 3.0
    assert np.isfinite(float(res.value))
