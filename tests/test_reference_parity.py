"""Head-to-head numerical parity against the LIVE reference.

The reference (torch/SciPy PyGPR, mounted read-only at /root/reference)
runs under the torch in this image, so instead of trusting transcribed
formulas, these tests execute **both implementations on identical f64
data** and compare outputs directly: kernel matrices and gradients,
exact-GP posterior mean/variance/covariance, the NLML and its
hyperparameter gradient, and the full grBCM aggregate.

Skipped automatically if the reference checkout or torch is absent.
"""

import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

sys.path.insert(0, "/root/reference")
tc = pytest.importorskip("torch")
PyGPR = pytest.importorskip("PyGPR")

import pygpr_tpu as gp

ATOL = 1e-9


def _data(rng, n=40, dim=2):
    x = rng.uniform(size=(n, dim))
    y = np.sin(-x.sum(-1))
    return x, y


def _both_kernels():
    ref = PyGPR.Compose([PyGPR.Squared_exponential(), PyGPR.White_noise()])
    ours = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    return ref, ours


def test_kernel_matrix_parity(rng):
    x, _ = _data(rng)
    hp = rng.uniform(size=4)
    ref, ours = _both_kernels()
    K_ref = ref.kernel(tc.from_numpy(hp), tc.from_numpy(x)).numpy()
    K_our = np.asarray(ours.kernel(jnp.asarray(hp), jnp.asarray(x)))
    np.testing.assert_allclose(K_our, K_ref, atol=ATOL)

    xp = rng.uniform(size=(15, 2))
    Kc_ref = ref.kernel(
        tc.from_numpy(hp), tc.from_numpy(x), tc.from_numpy(xp)
    ).numpy()
    Kc_our = np.asarray(
        ours.kernel(jnp.asarray(hp), jnp.asarray(x), jnp.asarray(xp))
    )
    np.testing.assert_allclose(Kc_our, Kc_ref, atol=ATOL)


def test_kernel_grad_parity(rng):
    x, _ = _data(rng, n=25)
    hp = 0.5 + rng.uniform(size=4)
    ref, ours = _both_kernels()
    K_ref, dK_ref = ref.kernel_and_grad(tc.from_numpy(hp), tc.from_numpy(x))
    K_our, dK_our = ours.kernel_and_grad(jnp.asarray(hp), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(K_our), K_ref.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(dK_our), dK_ref.numpy(), atol=ATOL)


def test_exact_gp_predict_parity(rng):
    x, y = _data(rng)
    xp = rng.uniform(size=(12, 2))
    ref_cov = PyGPR.Compose(
        [PyGPR.Squared_exponential(), PyGPR.White_noise()]
    )
    ref_gp = PyGPR.Exact_GP(tc.from_numpy(x), tc.from_numpy(y), ref_cov)
    ys_ref, cov_ref = ref_gp.predict(tc.from_numpy(xp), var="full")

    our_gp = gp.ExactGP(jnp.asarray(x), jnp.asarray(y),
                        gp.Sum((gp.RBF(), gp.WhiteNoise())))
    ys_our, cov_our = our_gp.predict(jnp.asarray(xp), var="full")

    np.testing.assert_allclose(np.asarray(ys_our), ys_ref.numpy(), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(cov_our), cov_ref.numpy(), atol=1e-7
    )


def test_exact_gp_var_parity(rng):
    """Diag path — up to our f32-safety clamp at the jitter floor."""
    x, y = _data(rng)
    ref_cov = PyGPR.Compose(
        [PyGPR.Squared_exponential(), PyGPR.White_noise()]
    )
    ref_gp = PyGPR.Exact_GP(tc.from_numpy(x), tc.from_numpy(y), ref_cov)
    xp = rng.uniform(size=(20, 2))
    _, var_ref = ref_gp.predict(tc.from_numpy(xp), var="diag")

    our_gp = gp.ExactGP(jnp.asarray(x), jnp.asarray(y),
                        gp.Sum((gp.RBF(), gp.WhiteNoise())))
    _, var_our = our_gp.predict(jnp.asarray(xp), var="diag")
    clamped_ref = np.maximum(var_ref.numpy(), 1e-7)
    np.testing.assert_allclose(np.asarray(var_our), clamped_ref, atol=1e-7)


def test_nlml_and_grad_parity(rng):
    x, y = _data(rng, n=35)
    params = 0.5 + rng.uniform(size=4)

    ref_cov = PyGPR.Compose(
        [PyGPR.Squared_exponential(), PyGPR.White_noise()]
    )
    ref_gp = PyGPR.Exact_GP(tc.from_numpy(x), tc.from_numpy(y), ref_cov)
    ref_loss = PyGPR.MLE(ref_gp)
    v_ref, g_ref = ref_loss.loss_and_grad(params)

    our_cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    v_our, g_our = gp.nlml_value_and_grad(
        our_cov, jnp.asarray(params), jnp.asarray(x), jnp.asarray(y)
    )
    np.testing.assert_allclose(float(v_our), float(v_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_our), g_ref, atol=1e-7)


def test_grbcm_predict_parity(rng):
    nc, n, ng, dim = 3, 20, 12, 2
    xl = rng.uniform(size=(nc, n, dim))
    yl = np.sin(xl.sum(-1))
    xg = rng.uniform(size=(ng, dim))
    yg = np.sin(xg.sum(-1))
    xs = rng.uniform(size=(9, dim))

    ref_cov = PyGPR.Compose(
        [PyGPR.Squared_exponential(), PyGPR.White_noise()]
    )
    ref_model = PyGPR.GRBCM(
        tc.from_numpy(xl), tc.from_numpy(yl),
        tc.from_numpy(xg), tc.from_numpy(yg), ref_cov,
    )
    ys_ref, var_ref = ref_model.predict(tc.from_numpy(xs), var="diag")

    our_model = gp.GRBCM(
        jnp.asarray(xl), jnp.asarray(yl),
        jnp.asarray(xg), jnp.asarray(yg),
        gp.Sum((gp.RBF(), gp.WhiteNoise())),
    )
    ys_our, var_our = our_model.predict(jnp.asarray(xs), var="diag")

    # Tolerances: our predictive variances are clamped at the jitter
    # floor (f32 protection, exact_gp._predict_var_one) while the
    # reference's can sink below it at training points; the clamp
    # perturbs β and hence the aggregate at the ~1e-5 level.
    np.testing.assert_allclose(
        np.asarray(ys_our), ys_ref.numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(var_our), var_ref.numpy(), rtol=1e-4, atol=1e-7
    )
    # β weights and precisions match wherever the reference variance is
    # above our clamp floor (below it, prec saturates at 1/1e-7 by
    # design and β follows — compare only the unclamped entries).
    prec_ref = ref_model.prec.numpy()
    unclamped = prec_ref < 1e7 / 1.5
    np.testing.assert_allclose(
        np.asarray(our_model.prec)[unclamped], prec_ref[unclamped],
        rtol=1e-6,
    )
    beta_ref = ref_model.beta.numpy()
    beta_ok = np.ones_like(beta_ref, bool)
    # β rows 1: depend on prec rows 1:; β row 0 depends on all of them
    beta_ok[1:] = unclamped[1:]
    beta_ok[0] = unclamped[1:].all(axis=0)
    np.testing.assert_allclose(
        np.asarray(our_model.beta)[beta_ok], beta_ref[beta_ok],
        rtol=1e-5, atol=1e-6,
    )
