"""Unit tests for the driver-bench building blocks (bench.py +
pygpr_tpu.bench): the streamed grbcm-1M aggregation must equal the
reference-semantics ``models/grbcm.predict``, and the final summary
recap line (the driver's ``parsed`` artifact) must be self-contained.
"""

import importlib.util
import json
import pathlib

import jax.numpy as jnp
import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load_bench_driver():
    spec = importlib.util.spec_from_file_location(
        "bench_driver", REPO / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_grbcm_million_serving_parity_tiny():
    """The in-scan β-precision aggregation of the streamed serving
    bench equals ``grbcm.predict`` (gr_bcm.py:116-149 semantics,
    pinned communication expert included) on identical data."""
    import pygpr_tpu as gp
    from pygpr_tpu.bench import bench_grbcm_million_serving
    from pygpr_tpu.models import exact_gp, grbcm

    nc, nls, ng, nq, dim, chunk = 8, 16, 8, 64, 2, 4
    rec, mean_s, var_s = bench_grbcm_million_serving(
        nc=nc, nls=nls, ng=ng, nq=nq, dim=dim, chunk=chunk,
        reps=1, rounds=1, return_posterior=True,
    )
    assert np.isfinite(rec["value"])
    json.dumps(rec)  # every emitted record must be JSON-serializable

    # reconstruct the same data (same seed, same rng call order)
    rng = np.random.default_rng(0)

    def f(x):
        return np.sin(2.0 * x.sum(-1))

    xl = rng.uniform(0, 4, (nc, nls, dim)).astype(np.float32)
    yl = (f(xl) + 0.1 * rng.normal(size=(nc, nls))).astype(np.float32)
    xg = rng.uniform(0, 4, (ng, dim)).astype(np.float32)
    yg = (f(xg) + 0.1 * rng.normal(size=ng)).astype(np.float32)
    xs = rng.uniform(0, 4, (nq, dim)).astype(np.float32)

    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    params = np.ones((cov.n_params(dim),), np.float32)
    params[-1] = 0.3
    p = jnp.asarray(params)
    x_aug, y_aug = grbcm.augment(
        jnp.asarray(xl), jnp.asarray(yl),
        jnp.asarray(xg), jnp.asarray(yg),
    )
    sg = exact_gp.precompute_tinv(
        exact_gp.factorize(cov, p, jnp.asarray(xg), jnp.asarray(yg))
    )
    sl = exact_gp.precompute_tinv(
        exact_gp.factorize(cov, p, x_aug, y_aug)
    )
    res = grbcm.predict(cov, p, p, sg, sl, jnp.asarray(xs), "diag")
    np.testing.assert_allclose(
        mean_s, np.asarray(res.mean), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        var_s, np.asarray(res.covar), rtol=2e-4, atol=2e-4
    )


def test_bench_summary_recap_self_contained():
    """``_build_summary`` puts the flagship headline + cross-checks +
    skip reasons in ONE json-serializable record — the artifact
    contract the driver's ``parsed`` field relies on."""
    mod = _load_bench_driver()
    records = [
        {
            "metric": "lml_grad_evals_per_s_n2048",
            "value": 700.0,
            "vs_baseline": 429.4,
            "pct_f32_roofline": 27.8,
        },
        {
            "metric": "roofline_tflops_f32_highest_measured",
            "value": 30.1,
            "flagship2048_pct_live_roofline": 27.7,
        },
        {
            "metric": "reference_lml_grad_evals_per_s_n2048_cpu",
            "value": 1.3,
            "flagship_vs_baseline_live": 538.5,
        },
        {
            "metric": "statespace_exact_nlml_grad_n1e6_single_chip",
            "value": 2.5,
            "adjoint_grad_seconds_per_eval": 1.2,
            "adjoint_grad_n": 1000000,
        },
        {"metric": "lml_grad_evals_per_s_n4096", "value": 160.0,
         "pct_f32_roofline": 50.0},
        {"metric": "kron", "skipped": "budget"},
        {"metric": "ski", "skipped": "timeout"},
    ]
    s = mod._build_summary(records, 660.0)
    assert s["metric"] == "summary"
    assert s["lml_grad_evals_per_s_n2048"] == 700.0
    assert s["flagship_vs_baseline_cached"] == 429.4
    assert s["flagship_pct_f32_roofline_cached"] == 27.8
    assert s["flagship2048_pct_live_roofline"] == 27.7
    assert s["flagship_vs_baseline_live"] == 538.5
    assert s["statespace_adjoint_grad_seconds_per_eval"] == 1.2
    assert (
        s["lml_grad_evals_per_s_n4096_pct_roofline_cached"] == 50.0
    )
    assert s["skipped"] == ["kron:budget", "ski:timeout"]
    json.dumps(s)


def test_bench_summary_empty_run():
    """A run that produced nothing still emits a valid summary."""
    mod = _load_bench_driver()
    s = mod._build_summary([], 660.0)
    assert s["metric"] == "summary"
    json.dumps(s)
