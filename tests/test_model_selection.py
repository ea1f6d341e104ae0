"""LOO-CV diagnostics (metrics.loo_cv / loo_nlpd) + pivoted inducing
selection (sgpr.init_inducing_pivoted).

Oracles: the closed-form LOO posterior (R&W §5.4.2) == n brute-force
leave-one-out refits; LOO-NLPD is a working differentiable fit
objective; greedy pivots beat a random subset on the Nyström residual.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp, metrics, sgpr
from pygpr_tpu.optimize.lbfgs import fit_mle

COV = gp.Sum((gp.RBF(), gp.WhiteNoise()))


def test_loo_cv_matches_brute_force(rng):
    n = 24
    x = jnp.asarray(rng.uniform(0, 4, (n, 2)))
    y = jnp.sin(2.0 * x.sum(-1)) + 0.1 * jnp.asarray(rng.normal(size=n))
    p = jnp.asarray([1.0, 0.8, 0.8, 0.3])
    state = exact_gp.factorize(COV, p, x, y)
    mean, var = metrics.loo_cv(state)
    for i in range(n):
        keep = np.arange(n) != i
        st_i = exact_gp.factorize(COV, p, x[keep], y[keep])
        m_i, v_i = exact_gp.predict(COV, st_i, x[i][None], "diag")
        np.testing.assert_allclose(
            float(mean[i]), float(m_i[0]), rtol=1e-6, atol=1e-9
        )
        np.testing.assert_allclose(
            float(var[i]), float(v_i[0]), rtol=1e-4
        )
    # serving-state path (tinv) gives identical results
    mean_t, var_t = metrics.loo_cv(exact_gp.precompute_tinv(state))
    np.testing.assert_allclose(np.asarray(mean_t), np.asarray(mean),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var_t), np.asarray(var),
                               rtol=1e-10)


def test_loo_nlpd_fit_objective(rng):
    n = 96
    x = jnp.asarray(rng.uniform(0, 4, (n, 1)))
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))
    p0 = jnp.ones((3,), x.dtype)
    before = float(metrics.loo_nlpd(COV, p0, x, y))
    res = fit_mle(COV, p0, x, y, objective=metrics.loo_nlpd, max_iter=80)
    after = float(metrics.loo_nlpd(COV, res.params, x, y))
    assert np.isfinite(np.asarray(res.params)).all()
    assert after < before - 0.3, (before, after)
    # the LOO-selected model actually regresses
    state = exact_gp.factorize(COV, res.params, x, y)
    xs = jnp.asarray(rng.uniform(0, 4, (64, 1)))
    m, _ = exact_gp.predict(COV, state, xs, "diag")
    rmse = float(jnp.sqrt(jnp.mean(
        (m - jnp.sin(2.0 * xs[:, 0])) ** 2)))
    assert rmse < 0.1, rmse


def test_pivoted_inducing_beats_random_nystrom(rng):
    """Greedy pivoted selection must leave a smaller Nyström residual
    trace(K − K_nm K_mm⁻¹ K_mn) than a random subset on clumpy data."""
    # three tight clumps + sparse spread: random subsets oversample
    # clumps, greedy pivots spread out
    clumps = [rng.normal(c, 0.05, (60, 2)) for c in (0.0, 2.0, 4.0)]
    spread = rng.uniform(-1, 5, (20, 2))
    x = np.concatenate(clumps + [spread]).astype(np.float64)
    theta = jnp.asarray([1.0, 1.0, 1.0])
    kern = gp.RBF()
    m = 12

    def nystrom_residual(z):
        z = jnp.asarray(z)
        kuu = kern.matrix(theta, z)
        kuf = kern.matrix(theta, jnp.asarray(x), z)       # [m, n]
        sol = jnp.linalg.solve(
            kuu + 1e-9 * jnp.eye(m), kuf
        )
        q_diag = jnp.sum(kuf * sol, axis=0)
        return float(jnp.sum(kern.diag(theta, jnp.asarray(x)) - q_diag))

    z_piv = sgpr.init_inducing_pivoted(kern, x, m, theta=theta)
    assert z_piv.shape == (m, 2)
    assert len({tuple(r) for r in np.round(z_piv, 9)}) == m  # distinct
    r_piv = nystrom_residual(z_piv)
    r_rand = np.median(
        [
            nystrom_residual(sgpr.init_inducing(x, m, seed=s))
            for s in range(5)
        ]
    )
    assert r_piv < 0.75 * r_rand, (r_piv, r_rand)
