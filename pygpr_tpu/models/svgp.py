"""SVGP — stochastic (uncollapsed) variational GP, minibatch-trained.

Beyond the reference: PyGPR handles Gaussian regression only (the LML
``loss.py:49-51`` *is* its likelihood).  SVGP (Hensman et al. 2013/15)
is the standard scalable path to everything else — classification,
counts, heteroscedastic models — and to datasets too large for even
one collapsed-bound pass:

    q(u) = N(m_u, S)  over f at m inducing points z,
    ELBO = Σᵢ E_{q(fᵢ)}[log p(yᵢ | fᵢ)] − KL(q(u) ‖ p(u)),

with the data term estimated on minibatches (unbiased: scaled n/|B|).

TPU-first design decisions:

  * **Whitened parameterization** ``u = L v``, ``q(v) = N(m_w, S_w)``
    (L = chol K_uu): the KL becomes the closed form against N(0, I),
    conditioning no longer depends on K_uu's spectrum, and the
    Adam init S_w = I *is* the prior.
  * The per-batch math is two tall GEMMs (``A = L⁻¹K_uf`` via the
    stored triangular inverse — same inverse-GEMM trade as SGPR,
    ``sgpr.py::_common``) + one [m, nb] GEMM for the variational
    variance.  All static shapes; the scan over minibatches is one XLA
    program.
  * Variational expectations are closed-form (Gaussian, Poisson) or
    32-node Gauss-Hermite (Bernoulli) — ``models/obs.py``; the GH sum
    is a single [nb, 32] broadcast, no data-dependent control flow.
  * **Minibatch indices are precomputed on the host** (NumPy, seeded)
    and passed as one [n_steps, nb] int32 array: device RNG has no
    business in the data pipeline (CLAUDE.md), and gathers with static
    shapes shard trivially under the data-parallel axis.

The collapsed SGPR bound (``models/sgpr.py``) is the Gaussian-likelihood
special case optimized over (m_w, S_w) in closed form —
:func:`optimal_q_gaussian` constructs that optimum explicitly, and the
test suite pins ``neg_elbo(optimal q) == sgpr.neg_elbo`` to f64
round-off.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models.sgpr import _check_noise_free, init_inducing
from pygpr_tpu.ops import linalg
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


class SVGPParams(NamedTuple):
    """Trainable state (an optax-ready pytree).

    ``ls_raw`` parameterizes the whitened covariance factor as
    ``L_s = strict_tril(ls_raw) + diag(exp(diag(ls_raw)))`` — the diag
    is log-space so L_s stays a valid Cholesky factor under
    unconstrained updates; zeros init gives ``S_w = I`` (the prior).
    """

    log_theta: Array  #: kernel hyperparameters, log-space [nhp]
    lik: Array        #: likelihood parameters (unconstrained) [nl]
    z: Array          #: inducing locations [m, d]
    m_w: Array        #: whitened variational mean [m]
    ls_raw: Array     #: raw whitened factor [m, m]


def _ls(ls_raw: Array) -> Array:
    d = jnp.diagonal(ls_raw)
    return jnp.tril(ls_raw, -1) + jnp.diag(jnp.exp(d))


def init_variational(
    kern: Kernel, lik, x: Array, z: Array, config: Config = DEFAULT
) -> SVGPParams:
    """All-ones kernel init (house policy), q(v) = prior N(0, I)."""
    theta = kern.init_params(x, config)
    m = z.shape[0]
    return SVGPParams(
        log_theta=jnp.log(jnp.abs(theta)),
        lik=lik.init_params(x.dtype),
        z=jnp.asarray(z, x.dtype),
        m_w=jnp.zeros((m,), x.dtype),
        ls_raw=jnp.zeros((m, m), x.dtype),
    )


def _latent_marginals(kern, theta, vp, xb, config):
    """q(f) marginals at xb: μ = Aᵀm_w, σ² = k − ΣA² + Σ(L_sᵀA)²."""
    kuu = kern.matrix(theta, vp.z, config=config)
    res = linalg.safe_cholesky(kuu, config)
    T = linalg.tri_inverse_doubling(res.chol)
    kuf = kern.matrix(theta, xb, vp.z, config=config)       # [m, nb]
    A = jnp.matmul(T, kuf, precision=config.precision)
    mu = jnp.dot(A.T, vp.m_w, precision=config.precision)
    SA = jnp.matmul(_ls(vp.ls_raw).T, A, precision=config.precision)
    kdiag = kern.diag(theta, xb, config=config)
    var = kdiag - jnp.sum(A * A, 0) + jnp.sum(SA * SA, 0)
    var = jnp.maximum(var, jnp.asarray(config.jitter, var.dtype))
    return mu, var, res.ok


def kl_whitened(vp: SVGPParams) -> Array:
    """KL(N(m_w, L_sL_sᵀ) ‖ N(0, I)) in closed form."""
    Ls = _ls(vp.ls_raw)
    m = vp.m_w.shape[0]
    return 0.5 * (
        jnp.dot(vp.m_w, vp.m_w)
        + jnp.sum(Ls * Ls)
        - m
    ) - jnp.sum(jnp.diagonal(vp.ls_raw))


def neg_elbo(
    kern: Kernel,
    lik,
    vp: SVGPParams,
    xb: Array,
    yb: Array,
    *,
    scale: float = 1.0,
    config: Config = DEFAULT,
) -> Array:
    """Minibatch negative ELBO: ``KL − scale · Σ_batch E[log p(y|f)]``.

    ``scale = n_total / batch`` makes the estimator unbiased in the
    batch (tested: the mean over a disjoint batch partition equals the
    full-data bound exactly).
    """
    theta = jnp.exp(vp.log_theta)
    mu, var, _ = _latent_marginals(kern, theta, vp, xb, config)
    ell = jnp.sum(lik.expected_log_lik(vp.lik, yb, mu, var))
    return kl_whitened(vp) - scale * ell


def predict(
    kern: Kernel,
    lik,
    vp: SVGPParams,
    xp: Array,
    space: str = "y",
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """Posterior predictive at xp.

    ``space="f"`` returns the latent marginals (μ, σ²);
    ``space="y"`` maps them through the likelihood — predictive
    (mean, variance) for regression/counts, (p, p(1−p)) for binary.
    """
    theta = jnp.exp(vp.log_theta)
    mu, var, _ = _latent_marginals(kern, theta, vp, xp, config)
    if space == "f":
        return mu, var
    return lik.predict(vp.lik, mu, var)


def optimal_q_gaussian(
    kern: Kernel,
    vp: SVGPParams,
    x: Array,
    y: Array,
    config: Config = DEFAULT,
) -> SVGPParams:
    """Closed-form optimal (m_w, S_w) for the GAUSSIAN likelihood:

        S_w = (I + A Aᵀ/σₙ²)⁻¹,   m_w = S_w A y / σₙ²,   A = L⁻¹K_uf.

    Substituted back, the ELBO equals Titsias' collapsed SGPR bound —
    the bridge between the two sparse models (pinned by the tests).
    """
    theta = jnp.exp(vp.log_theta)
    sn2 = jnp.exp(2.0 * vp.lik[0])
    kuu = kern.matrix(theta, vp.z, config=config)
    T = linalg.tri_inverse_doubling(linalg.safe_cholesky(kuu, config).chol)
    A = jnp.matmul(
        T, kern.matrix(theta, x, vp.z, config=config),
        precision=config.precision,
    )
    P = linalg.add_diag(
        jnp.matmul(A, A.T, precision=config.precision) / sn2, 1.0
    )
    Lp = linalg.safe_cholesky(P, config).chol
    S = linalg.inv_from_chol(Lp)
    m_w = jnp.dot(S, jnp.dot(A, y), precision=config.precision) / sn2
    Ls = linalg.safe_cholesky(S, config).chol
    ls_raw = jnp.tril(Ls, -1) + jnp.diag(jnp.log(jnp.diagonal(Ls)))
    return vp._replace(m_w=m_w, ls_raw=ls_raw)


class SVGPFit(NamedTuple):
    params: SVGPParams  #: final variational + hyper parameters
    losses: Array       #: per-step minibatch −ELBO trace [n_steps]


def make_batches(
    n: int, batch: int, n_steps: int, seed: int = 0
) -> np.ndarray:
    """Host-side (NumPy) minibatch index schedule ``[n_steps, batch]``:
    reshuffled epoch permutations, wrapped cyclically."""
    rng = np.random.default_rng(seed)
    per_epoch = max(n // batch, 1)
    idx = []
    while len(idx) < n_steps:
        perm = rng.permutation(n)
        for b in range(per_epoch):
            idx.append(perm[b * batch: (b + 1) * batch])
            if len(idx) == n_steps:
                break
    return np.stack(idx).astype(np.int32)


def fit(
    kern: Kernel,
    lik,
    x: Array,
    y: Array,
    z0: Array,
    *,
    vp0: Optional[SVGPParams] = None,
    batch_size: Optional[int] = None,
    n_steps: int = 500,
    learning_rate: float = 0.05,
    opt_z: bool = True,
    seed: int = 0,
    config: Config = DEFAULT,
    batch_sharding=None,
    segment_steps: Optional[int] = None,
) -> SVGPFit:
    """Adam on the minibatch negative ELBO — ONE jitted ``lax.scan``
    over a host-precomputed index schedule (no per-step dispatch, no
    device RNG).  ``opt_z=False`` freezes the inducing locations.

    ``batch_sharding`` (a ``NamedSharding`` over the batch axis)
    enables the GSPMD data-parallel path: each gathered minibatch is
    constraint-sharded over the mesh, XLA splits the tall [m, nb]
    GEMMs column-wise and all-reduces the O(m²) gradient statistics —
    see ``parallel/data_parallel.py::svgp_fit_dp``.

    ``segment_steps`` breaks the scan into host-synced segments of that
    many steps (one compiled executable reused for all segments) —
    needed on remote/tunneled TPU runtimes whose watchdog kills any
    single device call past a wall-clock limit (~200 s observed, see
    CLAUDE.md).  Adam state carries across segments unchanged, so the
    trajectory is IDENTICAL to the unsegmented scan (tested);
    ``n_steps`` is rounded up to a whole number of segments."""
    import optax

    _check_noise_free(kern)
    n = x.shape[0]
    nb = batch_size or min(n, 512)
    if vp0 is None:
        vp0 = init_variational(kern, lik, x, jnp.asarray(z0), config)
    if segment_steps is not None:
        n_segs = -(-n_steps // segment_steps)
        n_steps = n_segs * segment_steps
    sched = jnp.asarray(make_batches(n, nb, n_steps, seed))
    scale = n / nb
    opt = optax.adam(learning_rate)

    def loss_fn(vp, xb, yb):
        return neg_elbo(kern, lik, vp, xb, yb, scale=scale, config=config)

    def step(carry, idx):
        vp, ostate = carry
        xb, yb = x[idx], y[idx]
        if batch_sharding is not None:
            xb = jax.lax.with_sharding_constraint(xb, batch_sharding)
            yb = jax.lax.with_sharding_constraint(yb, batch_sharding)
        val, g = jax.value_and_grad(loss_fn)(vp, xb, yb)
        if not opt_z:
            g = g._replace(z=jnp.zeros_like(g.z))
        updates, ostate = opt.update(g, ostate, vp)
        vp = optax.apply_updates(vp, updates)
        return (vp, ostate), val

    carry0 = (vp0, opt.init(vp0))
    if segment_steps is None:
        (vp, _), losses = jax.lax.scan(step, carry0, sched)
        return SVGPFit(vp, losses)

    seg_fn = jax.jit(lambda c, s: jax.lax.scan(step, c, s))
    carry = carry0
    parts = []
    for k in range(n_steps // segment_steps):
        lo = k * segment_steps
        carry, ls = seg_fn(carry, sched[lo: lo + segment_steps])
        ls.block_until_ready()
        float(ls[-1])  # host fetch = real device sync over the tunnel
        parts.append(ls)
    return SVGPFit(carry[0], jnp.concatenate(parts))


def fit_streamed(
    kern: Kernel,
    lik,
    dataset,
    z0: Array,
    *,
    vp0: Optional[SVGPParams] = None,
    batch_size: int = 1024,
    epochs: int = 1,
    learning_rate: float = 0.05,
    opt_z: bool = True,
    seed: int = 0,
    sync_every: int = 50,
    config: Config = DEFAULT,
) -> SVGPFit:
    """Minibatch Adam over an **out-of-core** dataset.

    ``dataset`` is a :class:`~pygpr_tpu.utils.dataset.BinaryDataset`
    (or anything with ``.n``, ``.x`` and a ``minibatches`` iterator):
    batches are gathered from the memory-mapped file by the native
    prefetch loader on a background thread while the TPU runs the
    previous step — the data never has to fit in host RAM, let alone
    HBM (contrast :func:`fit`, whose single-scan design gathers from a
    device-resident ``x``).  One jitted step function is compiled once
    (static batch shape, ``drop_last``); ``sync_every`` bounds the
    in-flight work with a periodic host fetch (remote-TPU rule:
    never queue unbounded work, CLAUDE.md).
    """
    import optax

    _check_noise_free(kern)
    n = dataset.n
    if vp0 is None:
        head = jnp.asarray(
            np.array(dataset.x[: max(4 * batch_size, 1024)])
        )
        vp0 = init_variational(kern, lik, head, jnp.asarray(z0), config)
    scale = n / batch_size
    opt = optax.adam(learning_rate)

    @jax.jit
    def step(carry, xb, yb):
        vp, ostate = carry
        val, g = jax.value_and_grad(
            lambda v: neg_elbo(
                kern, lik, v, xb, yb, scale=scale, config=config
            )
        )(vp)
        if not opt_z:
            g = g._replace(z=jnp.zeros_like(g.z))
        updates, ostate = opt.update(g, ostate, vp)
        vp = optax.apply_updates(vp, updates)
        return (vp, ostate), val

    carry = (vp0, opt.init(vp0))
    losses = []
    k = 0
    for xb, yb in dataset.minibatches(
        batch_size, seed=seed, epochs=epochs
    ):
        carry, val = step(carry, jnp.asarray(xb), jnp.asarray(yb))
        losses.append(val)
        k += 1
        if k % sync_every == 0:
            float(val)  # bound in-flight device work
    if not losses:
        raise ValueError("dataset yielded no full batches")
    return SVGPFit(carry[0], jnp.stack(losses))


class SVGP:
    """Stateful wrapper in the house OO style (cf. :class:`SGPR`).

    >>> model = SVGP(x, y, RBF(), BernoulliLogit(), m=128)
    >>> model.train(n_steps=1000)
    >>> p, _ = model.predict(xs)          # class-1 probability
    """

    def __init__(
        self,
        x,
        y,
        cov: Kernel,
        lik,
        m: int = 128,
        z=None,
        seed: int = 0,
        config: Config = DEFAULT,
    ):
        _check_noise_free(cov)
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.cov, self.lik, self.config = cov, lik, config
        z = z if z is not None else init_inducing(x, m, seed)
        self.vp = init_variational(
            cov, lik, self.x, jnp.asarray(z, self.x.dtype), config
        )

    def train(self, **kw) -> SVGPFit:
        res = fit(
            self.cov, self.lik, self.x, self.y, self.vp.z,
            vp0=self.vp, config=self.config, **kw,
        )
        self.vp = res.params
        return res

    def predict(self, xp, space: str = "y"):
        return predict(
            self.cov, self.lik, self.vp, jnp.asarray(xp), space,
            self.config,
        )

    def neg_elbo(self) -> Array:
        return neg_elbo(
            self.cov, self.lik, self.vp, self.x, self.y,
            config=self.config,
        )
