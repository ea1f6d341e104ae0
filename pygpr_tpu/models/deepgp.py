"""Deep GP — doubly stochastic variational inference (Salimbeni &
Deisenroth, NeurIPS 2017).

Beyond the reference: PyGPR is a single-layer Gaussian-likelihood
engine (``loss.py:49-51``); a deep GP composes GP layers
``f = f_L ∘ … ∘ f_1`` for non-stationary / compositional functions
(step changes, regime warps, sharp transitions) that a single
stationary kernel cannot represent.  Each layer is a whitened sparse
variational GP (exactly the machinery of ``models/svgp.py``); the
evidence bound samples through the hidden layers (the "doubly
stochastic" part) and takes the final-layer expectation analytically:

    ELBO = E_{q(f_1..L)}[ Σᵢ E[log p(yᵢ | f_L,i)] ] − Σ_l KL_l.

TPU-first shape:

  * One whitened SVGP layer = two tall GEMMs + a [w, m, nb] batched
    GEMM over the layer width ``w`` (vmap) — all MXU, static shapes.
  * **All randomness is host-precomputed NumPy**: the minibatch index
    schedule (``svgp.make_batches``) and the reparameterization noise
    ``ε [n_steps, S, Σw_l, nb]`` are passed in as arrays, so the whole
    fit is one ``lax.scan`` with zero device RNG (house rule — device
    threefry compiles are minutes over the remote tunnel) and the
    trajectory is bit-reproducible.
  * Hidden layers carry the standard **identity/linear skip mean**
    (Salimbeni §3.1, fixed, not trained): the layer-l posterior starts
    at the identity map instead of collapsing to the zero function —
    with whitened init q(v) = N(0, εI) the network begins as a
    near-deterministic identity stack plus the final GP.
  * Layer kernels default to :class:`~pygpr_tpu.ops.kernels.RBF`; any
    house kernel works (the layer only calls matrix/diag).

Oracle wired into the tests: a depth-1 "deep" GP has no sampled
layers, so its bound must equal ``svgp.neg_elbo`` exactly, and with
``optimal_q_gaussian`` it reproduces the collapsed SGPR bound — the
deep model degenerates to the shallow ones it generalizes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models.svgp import _ls, make_batches
from pygpr_tpu.ops import linalg
from pygpr_tpu.ops.kernels import RBF, Kernel

Array = jax.Array


class LayerParams(NamedTuple):
    """Trainable state of one whitened SVGP layer of width ``w``."""

    log_theta: Array  #: kernel hyperparameters, log-space [nhp]
    z: Array          #: inducing locations [m, d_in]
    m_w: Array        #: whitened variational means [w, m]
    ls_raw: Array     #: raw whitened factors [w, m, m]


class DGPParams(NamedTuple):
    layers: Tuple[LayerParams, ...]
    lik: Array        #: likelihood parameters (unconstrained)


def _skip_weight(d_in: int, w: int, dtype) -> np.ndarray:
    """Fixed linear mean W [d_in, w]: identity padded/truncated
    (Salimbeni's mean function with PCA replaced by coordinate
    selection — exact identity when d_in == w)."""
    W = np.zeros((d_in, w), dtype=np.dtype(dtype).name)
    for j in range(w):
        W[j % d_in, j] = 1.0
    return W


def skip_means(
    widths: Sequence[int], d_in: int, dtype=np.float32
) -> Tuple[np.ndarray, ...]:
    """Per-hidden-layer fixed skip means for a width schedule."""
    means = []
    d = d_in
    for w in widths:
        means.append(_skip_weight(d, w, dtype))
        d = w
    return tuple(means)


def init_deep(
    kerns: Sequence[Kernel],
    lik,
    x: Array,
    widths: Sequence[int],
    m: int = 32,
    *,
    seed: int = 0,
    config: Config = DEFAULT,
) -> DGPParams:
    """Initialize an L-layer deep GP (L = len(kerns); the final layer
    has width 1, ``widths`` are the hidden widths, len = L − 1).

    Inducing inputs: an m-point subset of x for layer 1, propagated
    through the fixed skip means for deeper layers (host NumPy).
    Hidden layers start near-deterministic (S_w = 1e-4·I, Salimbeni's
    small-variance init); the final layer starts at the prior
    (S_w = I).
    """
    assert len(widths) == len(kerns) - 1
    rng = np.random.default_rng(seed)
    xn = np.asarray(x)
    n, d = xn.shape
    sel = rng.choice(n, size=min(m, n), replace=False)
    z = xn[sel]
    means = skip_means(widths, d, xn.dtype)
    layers = []
    all_w = list(widths) + [1]
    for li, (kern, w) in enumerate(zip(kerns, all_w)):
        zj = jnp.asarray(z)
        theta = kern.init_params(zj, config)
        mm = z.shape[0]
        hidden = li < len(kerns) - 1
        ls0 = np.log(1e-2 if hidden else 1.0)
        layers.append(
            LayerParams(
                log_theta=jnp.log(jnp.abs(theta)),
                z=zj,
                m_w=jnp.zeros((w, mm), zj.dtype),
                ls_raw=jnp.tile(
                    (ls0 * jnp.eye(mm, dtype=zj.dtype))[None], (w, 1, 1)
                ),
            )
        )
        if hidden:
            z = z @ means[li]  # propagate through the skip mean
    return DGPParams(layers=tuple(layers), lik=lik.init_params(x.dtype))


def _layer_marginals(kern, lp: LayerParams, xb, config):
    """q(f) marginals of one layer at xb: μ [w, nb], σ² [w, nb]."""
    theta = jnp.exp(lp.log_theta)
    kuu = kern.matrix(theta, lp.z, config=config)
    T = linalg.tri_inverse_doubling(
        linalg.safe_cholesky(kuu, config).chol
    )
    kuf = kern.matrix(theta, xb, lp.z, config=config)        # [m, nb]
    A = jnp.matmul(T, kuf, precision=config.precision)        # [m, nb]
    mu = jnp.matmul(lp.m_w, A, precision=config.precision)    # [w, nb]
    SA = jax.vmap(
        lambda lr: jnp.matmul(
            _ls(lr).T, A, precision=config.precision
        )
    )(lp.ls_raw)                                              # [w, m, nb]
    kdiag = kern.diag(theta, xb, config=config)               # [nb]
    var = (
        kdiag[None]
        - jnp.sum(A * A, 0)[None]
        + jnp.sum(SA * SA, axis=1)
    )
    return mu, jnp.maximum(var, jnp.asarray(config.jitter, var.dtype))


def _kl_layer(lp: LayerParams) -> Array:
    """Σ over layer units of KL(N(m_w, L_sL_sᵀ) ‖ N(0, I))."""
    def one(m_w, lr):
        Ls = _ls(lr)
        mm = m_w.shape[0]
        return 0.5 * (
            jnp.dot(m_w, m_w) + jnp.sum(Ls * Ls) - mm
        ) - jnp.sum(jnp.diagonal(lr))

    return jnp.sum(jax.vmap(one)(lp.m_w, lp.ls_raw))


def propagate(
    kerns, params: DGPParams, means, xb: Array, eps: Array,
    config: Config = DEFAULT,
):
    """One sampled pass through the hidden layers; returns the FINAL
    layer's analytic marginals (μ [nb], σ² [nb]).

    ``eps [Σw_hidden, nb]`` is the (host-drawn) reparameterization
    noise for this sample, split per hidden layer.
    """
    h = xb
    off = 0
    for li, kern in enumerate(kerns[:-1]):
        lp = params.layers[li]
        mu, var = _layer_marginals(kern, lp, h, config)       # [w, nb]
        w = mu.shape[0]
        e = eps[off: off + w]
        off += w
        f = mu + jnp.sqrt(var) * e                            # [w, nb]
        h = f.T + jnp.matmul(
            h, jnp.asarray(means[li], h.dtype),
            precision=config.precision,
        )                                                     # [nb, w]
    mu, var = _layer_marginals(kerns[-1], params.layers[-1], h, config)
    return mu[0], var[0]


def neg_elbo(
    kerns,
    lik,
    params: DGPParams,
    means,
    xb: Array,
    yb: Array,
    eps: Array,
    *,
    scale: float = 1.0,
    config: Config = DEFAULT,
) -> Array:
    """Doubly stochastic minibatch −ELBO.  ``eps [S, Σw_hidden, nb]``
    carries S through-the-network samples (S can be 1 when there are
    no hidden layers — the bound is then exact and sample-free)."""
    def one(e):
        mu, var = propagate(kerns, params, means, xb, e, config)
        return jnp.sum(lik.expected_log_lik(params.lik, yb, mu, var))

    if len(kerns) == 1:
        ell = one(eps[0])
    else:
        ell = jnp.mean(jax.vmap(one)(eps))
    kl = sum(_kl_layer(lp) for lp in params.layers)
    return kl - scale * ell


class DGPFit(NamedTuple):
    params: DGPParams
    losses: Array


def fit(
    kerns,
    lik,
    x: Array,
    y: Array,
    *,
    widths: Sequence[int] = (1,),
    m: int = 32,
    params0: Optional[DGPParams] = None,
    n_samples: int = 3,
    batch_size: Optional[int] = None,
    n_steps: int = 400,
    learning_rate: float = 0.02,
    seed: int = 0,
    config: Config = DEFAULT,
) -> DGPFit:
    """Adam on the doubly stochastic bound — ONE jitted ``lax.scan``
    over host-precomputed minibatch indices AND reparameterization
    noise (no device RNG anywhere).
    """
    import optax

    n = x.shape[0]
    nb = batch_size or min(n, 256)
    if params0 is None:
        params0 = init_deep(
            kerns, lik, x, widths, m, seed=seed, config=config
        )
    else:
        # fail at the API boundary, not deep inside the scan trace: a
        # params0 built with a different width schedule would silently
        # misroute the skip means below
        got = tuple(
            lp.m_w.shape[0] for lp in params0.layers[:-1]
        )
        if len(params0.layers) > 1 and got != tuple(widths):
            raise ValueError(
                f"params0 hidden-layer widths {got} do not match "
                f"widths={tuple(widths)}; pass the widths the params "
                "were initialized with"
            )
    means = skip_means(widths, x.shape[-1], np.asarray(x).dtype)
    sched = jnp.asarray(make_batches(n, nb, n_steps, seed))
    w_hid = int(sum(widths)) if len(kerns) > 1 else 1
    rng = np.random.default_rng(seed + 1)
    noise = jnp.asarray(
        rng.standard_normal((n_steps, n_samples, w_hid, nb)),
        x.dtype,
    )
    scale = n / nb
    opt = optax.adam(learning_rate)

    def step(carry, inp):
        vp, ostate = carry
        idx, eps = inp
        val, g = jax.value_and_grad(
            lambda p: neg_elbo(
                kerns, lik, p, means, x[idx], y[idx], eps,
                scale=scale, config=config,
            )
        )(vp)
        updates, ostate = opt.update(g, ostate, vp)
        vp = optax.apply_updates(vp, updates)
        return (vp, ostate), val

    (vp, _), losses = jax.lax.scan(
        step, (params0, opt.init(params0)), (sched, noise)
    )
    return DGPFit(vp, losses)


def predict(
    kerns,
    lik,
    params: DGPParams,
    means,
    xp: Array,
    *,
    n_samples: int = 20,
    seed: int = 0,
    space: str = "y",
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """Posterior predictive: propagate S host-noise samples, mixture
    moments by the law of total variance.  ``space="f"`` returns the
    latent mixture; ``space="y"`` maps each sample through the
    likelihood first (probabilities for classification, y-moments for
    regression/counts)."""
    L = len(kerns)
    w_hid = int(
        sum(lp.m_w.shape[0] for lp in params.layers[:-1])
    ) if L > 1 else 1
    rng = np.random.default_rng(seed)
    S = n_samples if L > 1 else 1
    eps = jnp.asarray(
        rng.standard_normal((S, w_hid, xp.shape[0])), xp.dtype
    )

    def one(e):
        mu, var = propagate(kerns, params, means, xp, e, config)
        if space == "f":
            return mu, var
        return lik.predict(params.lik, mu, var)

    mus, vars_ = jax.vmap(one)(eps)                           # [S, np]
    mean = jnp.mean(mus, 0)
    var = jnp.mean(vars_ + jnp.square(mus), 0) - jnp.square(mean)
    return mean, jnp.maximum(var, 0.0)


class DeepGP:
    """OO wrapper: ``DeepGP(x, y, widths=(1,)).train().predict(xq)``.

    ``depth = len(widths) + 1`` GP layers, RBF kernels by default, any
    ``models/obs.py`` likelihood (classification, counts, robust
    regression) via ``lik=``.
    """

    def __init__(
        self,
        x,
        y,
        widths: Sequence[int] = (1,),
        kerns: Optional[Sequence[Kernel]] = None,
        lik=None,
        m: int = 32,
        config: Config = DEFAULT,
    ):
        from pygpr_tpu.models.obs import GaussianLik

        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.widths = tuple(widths)
        self.kerns = tuple(kerns) if kerns is not None else tuple(
            RBF() for _ in range(len(self.widths) + 1)
        )
        assert len(self.kerns) == len(self.widths) + 1
        self.lik = lik if lik is not None else GaussianLik()
        self.m = m
        self.config = config
        self.means = skip_means(
            self.widths, self.x.shape[-1], np.asarray(x).dtype
        )
        self.params: Optional[DGPParams] = None
        self.losses: Optional[Array] = None

    def train(self, **kw) -> "DeepGP":
        res = fit(
            self.kerns, self.lik, self.x, self.y,
            widths=self.widths, m=self.m, config=self.config, **kw,
        )
        self.params, self.losses = res.params, res.losses
        return self

    def predict(self, xp, **kw):
        assert self.params is not None, "call train() first"
        return predict(
            self.kerns, self.lik, self.params, self.means,
            jnp.asarray(xp), config=self.config, **kw,
        )
