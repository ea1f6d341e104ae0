"""Deep kernel learning: a neural feature map under any base kernel.

Beyond the reference (fixed parametric kernels only): DKL
(Wilson et al., AISTATS 2016) composes a small MLP ``φ_W`` with a
standard kernel,

    K(x, x') = k_base(φ_W(x), φ_W(x'))

and learns ``W`` jointly with the kernel hyperparameters by maximizing
the marginal likelihood — non-stationarity, sharp transitions, and
low-dimensional structure are absorbed by the warp while the GP keeps
calibrated uncertainty.

TPU-native design: :class:`DeepKernel` is *just a kernel* whose flat
parameter vector packs ``[W₁,b₁,…,W_L,b_L, θ_base]`` — so the exact-GP
engine composes unchanged, and in particular the solve-free fast NLML
gradient (``likelihood._nlml_vg_fast_one``) backpropagates through the
MLP in its single gram-build VJP: the extractor's GEMMs run on the MXU
inside the same jitted objective, no separate NN framework needed.
Hidden layers are tanh (smooth features keep K differentiable and
bounded); the final layer is linear into the feature space the base
kernel sees.

``fit_dkl`` optimizes jointly with Adam under a mixed transform —
log-space for the base kernel's positive scales (house convention,
``optimize/lbfgs.py::fit_mle``), raw space for the signed network
weights.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


class DeepKernel(Kernel):
    """MLP feature extractor under ``base``.

    ``DeepKernel(RBF(), widths=(16, 2))`` maps ``[n, d] → tanh GEMM →
    [n, 16] → linear GEMM → [n, 2]`` and evaluates the base kernel in
    the 2-D feature space.  ``n_params(dim)`` = MLP weights/biases +
    ``base.n_params(widths[-1])``.
    """

    def __init__(
        self, base: Kernel, widths: Sequence[int], seed: int = 0
    ):
        if isinstance(base, DeepKernel):
            raise ValueError("nested DeepKernel is not supported")
        if len(widths) < 1:
            raise ValueError("widths must name at least the output size")
        self.base = base
        self.widths = tuple(int(w) for w in widths)
        self.seed = int(seed)

    def __hash__(self):
        return hash((type(self), self.base, self.widths, self.seed))

    def __eq__(self, other):
        return (
            type(other) is DeepKernel
            and other.base == self.base
            and other.widths == self.widths
            and other.seed == self.seed
        )

    # -- parameter packing -------------------------------------------------
    def _layer_dims(self, dim: int) -> Tuple[Tuple[int, int], ...]:
        sizes = (dim,) + self.widths
        return tuple(zip(sizes[:-1], sizes[1:]))

    def n_mlp_params(self, dim: int) -> int:
        return sum((i + 1) * o for i, o in self._layer_dims(dim))

    def n_params(self, dim: int) -> int:
        return self.n_mlp_params(dim) + self.base.n_params(self.widths[-1])

    def init_params(self, x: Array, config: Config = DEFAULT) -> Array:
        """Glorot-uniform MLP init (host NumPy RNG, seeded — data prep
        never traces, house rule) ++ the base kernel's init."""
        dim = x.shape[-1]
        rng = np.random.default_rng(self.seed)
        parts = []
        for i, o in self._layer_dims(dim):
            lim = math.sqrt(6.0 / (i + o))
            parts.append(rng.uniform(-lim, lim, size=i * o))
            parts.append(np.zeros(o))
        w = jnp.asarray(np.concatenate(parts), dtype=x.dtype)
        zf = jnp.zeros((1, self.widths[-1]), dtype=x.dtype)
        pb = self.base.init_params(zf, config)
        flat = jnp.concatenate([w, pb])
        batch = x.shape[:-2]
        return flat * jnp.ones(batch + flat.shape, dtype=x.dtype)

    def split(self, params: Array, dim: int) -> Tuple[Array, Array]:
        nm = self.n_mlp_params(dim)
        return params[..., :nm], params[..., nm:]

    # -- forward -----------------------------------------------------------
    def features(
        self, params: Array, x: Array, *, config: Config = DEFAULT
    ) -> Array:
        """``φ_W(x)``: tanh hidden layers, linear final layer."""
        w, _ = self.split(params, x.shape[-1])
        dims = self._layer_dims(x.shape[-1])
        z = x
        off = 0
        for li, (i, o) in enumerate(dims):
            W = w[off: off + i * o].reshape(i, o)
            off += i * o
            b = w[off: off + o]
            off += o
            z = jnp.matmul(z, W, precision=config.precision) + b
            if li < len(dims) - 1:
                z = jnp.tanh(z)
        return z

    # -- Kernel API ----------------------------------------------------------
    def matrix(
        self,
        params: Array,
        x: Array,
        xp: Optional[Array] = None,
        *,
        config: Config = DEFAULT,
    ) -> Array:
        _, pb = self.split(params, x.shape[-1])
        fx = self.features(params, x, config=config)
        fxp = (
            None
            if xp is None
            else self.features(params, xp, config=config)
        )
        return self.base.matrix(pb, fx, fxp, config=config)

    def diag(self, params: Array, x: Array, *, config: Config = DEFAULT):
        _, pb = self.split(params, x.shape[-1])
        return self.base.diag(
            pb, self.features(params, x, config=config), config=config
        )

    def matrix_and_grad(
        self, params: Array, x: Array, *, config: Config = DEFAULT
    ):
        krn = self.matrix(params, x, config=config)
        jac = jax.jacfwd(lambda p: self.matrix(p, x, config=config))(params)
        return krn, jnp.moveaxis(jac, -1, 0)


class DKLFit(NamedTuple):
    params: Array       #: joint [W…, θ_base] at the last step
    nlml: Array         #: objective trace [n_steps]
    converged: Array    #: ‖grad‖∞ < tol at exit


def fit_dkl(
    kern: DeepKernel,
    x: Array,
    y: Array,
    params0: Optional[Array] = None,
    *,
    config: Config = DEFAULT,
    n_steps: int = 300,
    learning_rate: float = 3e-2,
    tol: float = 1e-4,
) -> DKLFit:
    """Joint Adam MLE of MLP weights + base hyperparameters.

    Full-batch NLML through the solve-free fast gradient
    (``likelihood.nlml_fast`` — one Cholesky + one gram-build VJP per
    step, the MLP backprop riding inside the VJP).  Mixed transform:
    base scales in log-space, weights raw.  One ``lax.scan`` — the
    whole fit is a single device program.

    Initialization caveat: the default ``init_params`` keeps the
    reference's σₙ=1e-4 noise init for any ``WhiteNoise`` term, which
    makes the initial NLML landscape catastrophically scaled (measured
    6.5e7 vs 2.7e3 at σₙ=0.1 on the test problem).  As everywhere else
    in this engine, start the noise at ~0.1:
    ``params0 = kern.init_params(x).at[-1].set(0.1)``.
    """
    import optax

    from pygpr_tpu.models.likelihood import nlml_fast

    dim = x.shape[-1]
    nm = kern.n_mlp_params(dim)
    if params0 is None:
        params0 = kern.init_params(x, config)

    def pack(p):
        return jnp.concatenate([p[:nm], jnp.log(p[nm:])])

    def unpack(u):
        return jnp.concatenate([u[:nm], jnp.exp(u[nm:])])

    def objective(u):
        return nlml_fast(kern, unpack(u), x, y, config)

    opt = optax.adam(learning_rate)
    u0 = pack(params0)

    def step(carry, _):
        u, opt_state = carry
        val, g = jax.value_and_grad(objective)(u)
        updates, opt_state = opt.update(g, opt_state, u)
        u = optax.apply_updates(u, updates)
        return (u, opt_state), (val, jnp.max(jnp.abs(g)))

    (u, _), (vals, gnorms) = jax.lax.scan(
        step, (u0, opt.init(u0)), None, length=n_steps
    )
    return DKLFit(unpack(u), vals, gnorms[-1] < tol)
