"""Data-parallel SGPR over a device mesh — the GSPMD path.

The committee layer (``parallel/sharded.py``) uses explicit
``shard_map`` + ``psum`` because grBCM's structure IS the collective
(β-aggregation over experts).  SGPR's structure is the opposite: one
global model whose sufficient statistics are plain sums over the data
axis —

    B  = I + Σᵢ aᵢaᵢᵀ      (A = L⁻¹K_uf/σₙ, columns aᵢ per data point)
    Ay = Σᵢ aᵢyᵢ,  yᵀy,  Σᵢ k_ff,ii,  Σᵢ ‖aᵢ‖²

so the idiomatic TPU recipe is the *other* one from the scaling book:
**annotate the shardings and let XLA insert the collectives.**  We
shard ``x``/``y`` (and only them) along n over the mesh, keep
``z``/params replicated, and run the UNCHANGED ``models.sgpr``
functions under jit: XLA partitions the tall [m, n] GEMMs column-wise
and emits one [m, m]-sized all-reduce per statistic — O(m²)
communication independent of n, riding ICI.  The gradient needs no
hand-written transpose rules: XLA differentiates through its own
collectives (contrast the ``custom_vjp`` psum plumbing that
``grbcm_fit_sharded`` needs inside ``shard_map``).

Every function here is a thin placement wrapper; the math lives in
``models/sgpr.py`` and is tested against the exact GP.  The invariant
*sharded == single-device* is tested on the 8-virtual-device CPU mesh
(``tests/test_sgpr_sharded.py``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models import sgpr
from pygpr_tpu.ops.kernels import Kernel
from pygpr_tpu.parallel.mesh import EXPERT_AXIS

Array = jax.Array


def _place(mesh: Mesh, x: Array, y: Array, axis: str):
    """Shard the data axis; everything else stays replicated."""
    data = NamedSharding(mesh, P(axis))
    return jax.device_put(x, data), jax.device_put(y, data)


def sgpr_neg_elbo_dp(
    kern: Kernel,
    params: Array,
    x: Array,
    y: Array,
    z: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    config: Config = DEFAULT,
) -> Array:
    """Collapsed bound with the n axis sharded over ``axis``."""
    xs, ys = _place(mesh, x, y, axis)
    f = jax.jit(
        lambda p, xx, yy, zz: sgpr.neg_elbo(kern, p, xx, yy, zz, config)
    )
    return f(params, xs, ys, z)


def sgpr_fit_dp(
    kern: Kernel,
    params0: Array,
    x: Array,
    y: Array,
    z: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    opt_inducing: bool = False,
    config: Config = DEFAULT,
    max_iter: int = 200,
    tol: float = 1e-4,
):
    """Data-parallel ELBO L-BFGS: one XLA program, n sharded over the
    mesh, parameters (and optionally inducing locations) replicated.

    Per L-BFGS evaluation each device touches n/D data columns; the
    all-reduced tensors are the [m, m] statistic and three m/scalar
    sums — communication is O(m²) regardless of n, which is what makes
    the weak-scaling story trivial here (double the chips, double n,
    same bytes on the wire).
    """
    xs, ys = _place(mesh, x, y, axis)
    f = jax.jit(
        lambda p, xx, yy, zz: sgpr.fit(
            kern, p, xx, yy, zz,
            opt_inducing=opt_inducing, config=config,
            max_iter=max_iter, tol=tol,
        )
    )
    return f(params0, xs, ys, z)


def svgp_fit_dp(
    kern: Kernel,
    lik,
    x: Array,
    y: Array,
    z0: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    config: Config = DEFAULT,
    **fit_kw,
):
    """Data-parallel SVGP training: every Adam minibatch shards over
    the mesh's data axis (``svgp.fit``'s ``batch_sharding`` hook), the
    variational/hyper parameters stay replicated, and XLA all-reduces
    the O(m²) gradient statistics — the uncollapsed twin of
    :func:`sgpr_fit_dp`.  Deterministic: the host-side batch schedule
    is identical to the single-device run, so sharded == single-device
    to round-off (tested on the 8-virtual-device mesh)."""
    from pygpr_tpu.models import svgp

    batch = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    xr = jax.device_put(x, rep)
    yr = jax.device_put(y, rep)
    return svgp.fit(
        kern, lik, xr, yr, z0,
        config=config, batch_sharding=batch, **fit_kw,
    )


def sgpr_predict_dp(
    kern: Kernel,
    state: sgpr.SGPRState,
    xp: Array,
    mesh: Mesh,
    *,
    var: str = "diag",
    axis: str = EXPERT_AXIS,
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """Query-parallel serving: the m-sized state replicates everywhere
    (it is tiny), the query batch shards over the mesh, and each device
    predicts its slice with zero collectives — embarrassingly parallel
    throughput scaling for the serving path.  (``var="full"`` needs the
    dense [nq, nq] cross block and is deliberately not sharded here.)
    """
    if var == "full":
        raise ValueError(
            "sgpr_predict_dp shards the query axis; full covariance "
            "couples queries — use models.sgpr.predict on one device."
        )
    rep = NamedSharding(mesh, P())
    st = jax.device_put(state, rep)
    xq = jax.device_put(xp, NamedSharding(mesh, P(axis)))
    f = jax.jit(
        lambda s, q: sgpr.predict(kern, s, q, var, config)
    )
    return f(st, xq)
