"""State-space (Kalman) GP tests.

The two exactness anchors: (1) the O(n) filter NLML equals the dense
O(n³) ``likelihood.nlml`` with ``Sum((Matern(ν), WhiteNoise))`` for all
three ν, both for the sequential lax.scan filter and the parallel
associative-scan formulation; (2) the merged-chain RTS smoother equals
the dense exact-GP posterior at off-grid query times.  Plus FD
gradients through the associative scan, irregular/duplicate time
points, end-to-end fit, and a large-n sanity run the dense path could
not touch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp, likelihood
from pygpr_tpu.models import statespace as ss


def _series(n=120, seed=0, noise=0.2):
    rng = np.random.default_rng(seed)
    t = jnp.asarray(np.sort(rng.uniform(0, 6, n)))
    y = jnp.asarray(
        np.sin(2 * np.asarray(t)) + noise * rng.normal(size=n)
    )
    return t, y


#: fold the dense pipeline's fixed 1e-7 jitter into the SSM noise so
#: the parity is exact (the state-space path needs no jitter)
_P_SS = [1.1, 0.8, float(np.sqrt(0.25**2 + 1e-7))]
_P_DENSE = [1.1, 0.8, 0.25]


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
@pytest.mark.parametrize("parallel", [False, True])
def test_nlml_matches_dense(nu, parallel):
    t, y = _series()
    v_ss = float(ss.nlml_ss(
        nu, jnp.asarray(_P_SS), t, y, parallel=parallel
    ))
    cov = gp.Sum((gp.Matern(nu), gp.WhiteNoise()))
    v_d = float(likelihood.nlml(cov, jnp.asarray(_P_DENSE),
                                t[:, None], y))
    np.testing.assert_allclose(v_ss, v_d, rtol=1e-10)


@pytest.mark.parametrize("parallel", [False, True])
def test_posterior_matches_dense(parallel):
    nu = 1.5
    t, y = _series()
    rng = np.random.default_rng(3)
    tq = jnp.asarray(np.sort(rng.uniform(0.2, 5.8, 17)))
    m_ss, v_ss = ss.posterior_ss(
        nu, jnp.asarray(_P_SS), t, y, tq, parallel=parallel
    )
    cov = gp.Sum((gp.Matern(nu), gp.WhiteNoise()))
    se = exact_gp.factorize(cov, jnp.asarray(_P_DENSE), t[:, None], y)
    m_e, v_e = exact_gp.predict(cov, se, tq[:, None], "diag")
    np.testing.assert_allclose(
        np.asarray(m_ss), np.asarray(m_e), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(v_ss), np.asarray(v_e) - 0.0625, atol=1e-9
    )


def test_duplicate_and_irregular_times():
    """Δt = 0 steps (duplicate stamps) must stay exact — A = I, Q = 0."""
    nu = 1.5
    rng = np.random.default_rng(4)
    t_base = np.sort(rng.uniform(0, 4, 40))
    t_dup = np.sort(np.concatenate([t_base, t_base[::7]]))  # dups
    t = jnp.asarray(t_dup)
    y = jnp.asarray(np.sin(2 * t_dup) + 0.1 * rng.normal(size=t_dup.size))
    p_ss = jnp.asarray([1.0, 1.0, float(np.sqrt(0.01 + 1e-7))])
    v_seq = float(ss.nlml_ss(nu, p_ss, t, y, parallel=False))
    v_par = float(ss.nlml_ss(nu, p_ss, t, y, parallel=True))
    cov = gp.Sum((gp.Matern(nu), gp.WhiteNoise()))
    v_d = float(likelihood.nlml(
        cov, jnp.asarray([1.0, 1.0, 0.1]), t[:, None], y
    ))
    np.testing.assert_allclose(v_seq, v_d, rtol=1e-9)
    np.testing.assert_allclose(v_par, v_d, rtol=1e-9)


def test_nlml_fd_gradients_through_assoc_scan():
    nu = 2.5
    t, y = _series(n=60, seed=5)

    def obj(u):
        return ss.nlml_ss(nu, jnp.exp(u), t, y)

    u0 = jnp.log(jnp.asarray([1.0, 1.2, 0.3]))
    g = jax.grad(obj)(u0)
    eps = 1e-6
    for i in range(3):
        e = jnp.zeros(3).at[i].set(eps)
        fd = (float(obj(u0 + e)) - float(obj(u0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-5,
                                   atol=1e-8)


def test_fit_and_wrapper():
    nu = 1.5
    t, y = _series(n=300, seed=6, noise=0.15)
    model = ss.StateSpaceGP(t, y, nu=nu)
    res = model.train(max_iter=120)
    assert np.isfinite(float(res.nlml))
    # recovered noise near the generating 0.15
    assert 0.08 < float(res.params[-1]) < 0.3

    tq = jnp.asarray(np.linspace(0.2, 5.8, 64))
    mean, var = model.predict(tq)
    truth = np.sin(2 * np.asarray(tq))
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)))
    assert rmse < 0.1, rmse
    assert np.all(np.asarray(var) > 0)
    # observation-space variance adds σₙ²
    _, var_obs = model.predict(tq, observation=True)
    np.testing.assert_allclose(
        np.asarray(var_obs) - np.asarray(var),
        float(res.params[-1]) ** 2,
        rtol=1e-6,
    )


def test_large_n_runs_fast_and_finite():
    """n = 200k exact NLML — the dense pipeline would need a 320 GB
    gram; the parallel filter handles it in one jit call."""
    rng = np.random.default_rng(7)
    n = 200_000
    t = jnp.asarray(np.sort(rng.uniform(0, 100, n)))
    y = jnp.asarray(
        np.sin(2 * np.asarray(t)) + 0.1 * rng.normal(size=n)
    )
    v = float(jax.jit(
        lambda p: ss.nlml_ss(1.5, p, t, y)
    )(jnp.asarray([1.0, 1.0, 0.1])))
    assert np.isfinite(v)
    # NLML per point should be O(1) and roughly the noise entropy
    assert -1.0 < v / n < 2.0, v / n


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
def test_forward_mode_gradients_match_reverse(nu):
    """The two large-n gradient paths — the forward-mode custom VJP
    (`nlml_ss_fwdgrad`, one jvp-augmented scan) and the two-program
    host-composed value+grad (`nlml_ss_value_and_grad`, elementwise
    stage A + scan-only stage B) — are exact: both match reverse-mode
    AD through the scan to round-off."""
    rng = np.random.default_rng(5)
    n = 384
    t = jnp.asarray(np.sort(rng.uniform(0, 40, n)))
    y = jnp.sin(0.7 * t) + 0.1 * jnp.asarray(rng.normal(size=n))
    p = jnp.asarray([1.1, 0.9, 0.2])

    v_ref, g_ref = jax.value_and_grad(
        lambda q: ss.nlml_ss(nu, q, t, y)
    )(p)
    v_f, g_f = jax.value_and_grad(
        lambda q: ss.nlml_ss_fwdgrad(nu, q, t, y)
    )(p)
    np.testing.assert_allclose(float(v_f), float(v_ref), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_ref), rtol=1e-9
    )
    v_2, g_2 = ss.nlml_ss_value_and_grad(nu, p, t, y)
    np.testing.assert_allclose(float(v_2), float(v_ref), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g_2), np.asarray(g_ref), rtol=1e-9
    )


def test_fit_ss_large_matches_fit_ss():
    """The SciPy-driven two-program fit lands on the same optimum as
    the jitted L-BFGS fit."""
    rng = np.random.default_rng(6)
    n = 400
    t = jnp.asarray(np.sort(rng.uniform(0, 60, n)))
    y = jnp.sin(0.5 * t) + 0.1 * jnp.asarray(rng.normal(size=n))
    r1 = ss.fit_ss(1.5, t, y, max_iter=150)
    r2 = ss.fit_ss_large(1.5, t, y, max_iter=100)
    assert bool(r2.converged)
    np.testing.assert_allclose(
        np.asarray(r2.params), np.asarray(r1.params), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(r2.nlml), float(r1.nlml), rtol=1e-6, atol=1e-4
    )


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
def test_adjoint_gradient_matches_reverse(nu):
    """The adjoint-scan gradient — the flat-compile n=10⁶ path — is
    EXACT: value and gradient match reverse-mode AD through the scan
    to f64 round-off, including chains with duplicate time stamps
    (θ-free deterministic transitions contribute zero through the
    linear functional, no special casing)."""
    rng = np.random.default_rng(7)
    n = 500
    t_base = np.sort(rng.uniform(0, 50, n))
    t_dup = np.sort(np.concatenate([t_base, t_base[::11]]))
    t = jnp.asarray(t_dup)
    y = jnp.sin(0.6 * t) + 0.1 * jnp.asarray(rng.normal(size=t.size))
    p = jnp.asarray([1.2, 0.8, 0.25])

    v_ref, g_ref = jax.value_and_grad(
        lambda q: ss.nlml_ss(nu, q, t, y)
    )(p)
    v_f, g_f = ss.nlml_ss_adjoint_value_and_grad(nu, p, t, y)
    np.testing.assert_allclose(float(v_f), float(v_ref), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_ref), rtol=1e-9
    )


def test_adjoint_gradient_f32_accuracy():
    """Measured f32 agreement of the adjoint gradient vs the f64 AD
    oracle at a realistically dense chain (small λ·Δt — the regime
    that destroyed the naive EM/Fisher surrogate, see the module's
    section comment): the adjoint form shares reverse-mode AD's
    arithmetic, so f32 must stay at ordinary f32 round-off levels."""
    rng = np.random.default_rng(8)
    n = 20_000
    t64 = np.sort(rng.uniform(0, 40.0, n))       # mean λ·Δt ~ 3e-3
    y64 = np.sin(0.7 * t64) + 0.1 * rng.normal(size=n)
    p64 = np.asarray([1.1, 0.9, 0.2])

    g_ref = jax.grad(
        lambda q: ss.nlml_ss(
            1.5, q, jnp.asarray(t64), jnp.asarray(y64)
        )
    )(jnp.asarray(p64))
    v32, g32 = ss.nlml_ss_adjoint_value_and_grad(
        1.5,
        jnp.asarray(p64, jnp.float32),
        jnp.asarray(t64, jnp.float32),
        jnp.asarray(y64, jnp.float32),
    )
    assert np.isfinite(float(v32))
    rel = np.abs(np.asarray(g32, np.float64) - np.asarray(g_ref)) / (
        np.abs(np.asarray(g_ref)) + 1e-3 * float(jnp.abs(g_ref).max())
    )
    assert rel.max() < 1e-3, (np.asarray(g32), np.asarray(g_ref))


def test_fit_ss_large_adjoint_matches_ad():
    """fit_ss_large(grad_method="adjoint") lands on the same optimum
    as the AD path ("fisher" is accepted as a legacy alias)."""
    rng = np.random.default_rng(9)
    n = 400
    t = jnp.asarray(np.sort(rng.uniform(0, 60, n)))
    y = jnp.sin(0.5 * t) + 0.1 * jnp.asarray(rng.normal(size=n))
    r_ad = ss.fit_ss_large(1.5, t, y, max_iter=100, grad_method="ad")
    r_fi = ss.fit_ss_large(
        1.5, t, y, max_iter=100, grad_method="adjoint"
    )
    assert bool(r_fi.converged)
    np.testing.assert_allclose(
        np.asarray(r_fi.params), np.asarray(r_ad.params), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(r_fi.nlml), float(r_ad.nlml), rtol=1e-6, atol=1e-4
    )
