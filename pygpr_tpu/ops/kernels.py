"""Covariance kernels as pure functions over pytree parameter vectors.

Re-design of the reference kernel layer (``PyGPR/covar.py``) for
JAX/XLA/TPU:

  * Kernels are **stateless singleton objects** whose methods are pure
    functions — no in-place mutation (the reference mutates caller
    tensors, e.g. ``covar.py:119-123``), no hidden dtype globals.
  * The core methods operate on **unbatched** ``[n, d]`` inputs; the
    leading "committee" batch axis of the reference (``covar.py:104``,
    ``:133-135``) is recovered with ``jax.vmap`` — see
    :func:`kernel_matrix` / :func:`kernel_and_grad`.  vmap is also what
    makes expert sharding correct: a sharded map over experts equals the
    batched single-device computation.
  * The squared-distance matrix uses one MXU matmul (the
    ``-2·a·bᵀ + ‖a‖² + ‖b‖²`` trick, reference ``covar.py:110``) at
    configurable precision, clamped at zero for f32 safety.

Parameterization parity with the reference (``covar.py:84-206``):

  * :class:`RBF` (ARD squared-exponential):
    ``K(x, x') = σ² · exp(−‖(x − x') ⊙ ℓ‖²)``
    with **inverse-lengthscale** parameterization (the params multiply
    x, ``covar.py:140``) and **no ½ factor** in the exponent
    (``covar.py:147-149``).  Params ``[σ, ℓ₁..ℓ_d]``, init all-ones
    (``covar.py:96-100``).
  * :class:`WhiteNoise`: ``K = σₙ² I`` on the train block
    (``covar.py:227-240``); the cross-kernel block is identically zero
    (``covar.py:242-243``).  One param, init 1e-4 (``covar.py:221-225``).
  * :class:`Sum`: sum-of-kernels combinator with concatenated parameter
    vectors (``covar.py:28-81``) — unlike the reference it evaluates each
    sub-kernel's ``kernel_and_grad`` once, not twice (``covar.py:76-77``).

Analytic hyperparameter gradients (``kernel_and_grad``) follow the
reference formulas (``covar.py:189``, ``:191-199``, ``:262-264``):
``∂K/∂σ = 2K/σ``, ``∂K/∂ℓⱼ = −2ℓⱼ (xⱼ−x'ⱼ)² K``, ``∂K/∂σₙ = 2σₙ I``,
with output layout ``[nhp, n, n]`` (``covar.py:184``).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config

Array = jax.Array


def sq_distance(
    x: Array,
    xp: Optional[Array] = None,
    *,
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    """Pairwise squared Euclidean distance via the matmul trick.

    ``x: [n, d]``, ``xp: [m, d]`` → ``[m, n]`` (rows index xp, matching
    the reference's cross-kernel orientation, ``covar.py:119``).
    With ``xp=None`` returns the symmetric ``[n, n]`` matrix.

    The single ``dot`` is the MXU-hot op; the clamp at zero guards
    against f32 round-off producing small negative squared distances.
    """
    x2 = jnp.sum(jnp.square(x), axis=-1)
    if xp is None:
        g = jnp.dot(x, x.T, precision=precision)
        sqd = x2[:, None] + x2[None, :] - 2.0 * g
    else:
        xp2 = jnp.sum(jnp.square(xp), axis=-1)
        g = jnp.dot(xp, x.T, precision=precision)
        sqd = xp2[:, None] + x2[None, :] - 2.0 * g
    # Straight-through clamp: the true sqd is ≥ 0, so mathematically
    # the clamp is the identity — pass the exact polynomial's gradient
    # through it.  A plain jnp.maximum halves derivatives at the
    # sqd == 0 tie (lax.max's 0.5 tie rule), which corrupts the
    # second input-derivatives the gradient-enhanced GP
    # (models/derivative.py) takes at coincident points.
    return sqd + jax.lax.stop_gradient(jnp.maximum(sqd, 0.0) - sqd)


class Kernel:
    """Stateless covariance kernel. Instances are static under jit."""

    def n_params(self, dim: int) -> int:
        raise NotImplementedError

    def init_params(self, x: Array, config: Config = DEFAULT) -> Array:
        """All-ones / reference-parity initial hyperparameters.

        Handles a leading batch axis the way the reference's
        ``get_params_shape`` does (``covar.py:36-42``): ``[nc, n, d]``
        inputs yield ``[nc, nhp]`` parameters.
        """
        nhp = self.n_params(x.shape[-1])
        batch = x.shape[:-2]
        return self._init_flat(nhp, x.dtype, config) * jnp.ones(
            batch + (nhp,), dtype=x.dtype
        )

    def _init_flat(self, nhp: int, dtype, config: Config) -> Array:
        return jnp.ones((nhp,), dtype=dtype)

    def matrix(
        self,
        params: Array,
        x: Array,
        xp: Optional[Array] = None,
        *,
        config: Config = DEFAULT,
    ) -> Array:
        """Unbatched kernel matrix. ``[n,n]`` or cross ``[m,n]``."""
        raise NotImplementedError

    def matrix_and_grad(
        self, params: Array, x: Array, *, config: Config = DEFAULT
    ) -> Tuple[Array, Array]:
        """Unbatched ``(K [n,n], dK [nhp,n,n])`` analytic gradients."""
        raise NotImplementedError

    def diag(self, params: Array, x: Array, *, config: Config = DEFAULT) -> Array:
        """Diagonal of the train-block kernel, ``[n]``."""
        return jnp.diagonal(self.matrix(params, x, config=config))

    def gram_adjoint(
        self, params: Array, x: Array, abar: Array,
        *, config: Config = DEFAULT,
    ) -> Optional[Array]:
        """``⟨Abar, ∂K/∂θ⟩`` for the train gram as MATVEC-shaped
        contractions, or ``None`` when no specialization exists (the
        caller falls back to AD through the gram build).

        This is the fast-gradient path's tail
        (``likelihood._nlml_vg_fast_one``): the generic gram-build VJP
        materializes per-dimension ``(xᵢⱼ−xᵢ'ⱼ)²`` n×n passes, while
        the ARD radial family collapses every lengthscale component to
        Σᵢⱼ mᵢⱼ(xᵢⱼ−xᵢ'ⱼ)² = (r₁+r₂)ᵀqⱼ − 2 xⱼᵀ(m xⱼ) — one
        elementwise pass for ``m`` plus one [n,n]×[n,d] GEMM, HBM
        passes independent of d.  ``abar`` must be the full (dense)
        adjoint; symmetry is not required.
        """
        return None

    # -- reference-parity method API (covar.py:9-25) ----------------------
    def get_params_shape(self, x: Array):
        """Parameter-shape query (reference ``covar.py:15``):
        ``[*batch, nhp]`` from the sample tensor's shape."""
        return list(x.shape[:-2]) + [self.n_params(x.shape[-1])]

    def kernel(self, params: Array, x: Array, xp: Optional[Array] = None):
        """Reference instance API (``covar.py:21``) — batched via the
        module-level :func:`kernel_matrix`."""
        return kernel_matrix(self, params, x, xp)

    def kernel_and_grad(self, params: Array, x: Array):
        """Reference instance API (``covar.py:24``) — returns
        ``[K, dK]`` with dK layout ``[..., nhp, n, n]``."""
        krn, dkrn = kernel_and_grad(self, params, x)
        return [krn, dkrn]

    # -- ergonomics -------------------------------------------------------
    def __add__(self, other: "Kernel") -> "Sum":
        a = self.kernels if isinstance(self, Sum) else (self,)
        b = other.kernels if isinstance(other, Sum) else (other,)
        return Sum(a + b)

    def __mul__(self, other: "Kernel") -> "Product":
        a = self.kernels if isinstance(self, Product) else (self,)
        b = other.kernels if isinstance(other, Product) else (other,)
        return Product(a + b)

    def __hash__(self):  # static leaves under jit
        return hash((type(self),))

    def __eq__(self, other):
        return type(self) is type(other)


def _ard_sqd_adjoint(abar, x, ls, w, precision):
    """Lengthscale components of :meth:`Kernel.gram_adjoint` for any
    radial kernel ``K = f(sqd)``, ``sqd = Σⱼ ℓⱼ²(xᵢⱼ−xᵢ'ⱼ)²``:

      ∂K/∂ℓⱼ = (∂K/∂sqd)·2ℓⱼ(xᵢⱼ−xᵢ'ⱼ)²  ⇒
      ⟨Abar, ∂K/∂ℓⱼ⟩ = 2ℓⱼ Σᵢᵢ' mᵢᵢ' (xᵢⱼ−xᵢ'ⱼ)²,  m = Abar∘(∂K/∂sqd)

    expanded GEMM-style: (r₁+r₂)ᵀqⱼ − 2 xⱼᵀ(m xⱼ) with q = x², so the
    d components share ONE elementwise pass over m and ONE [n,n]×[n,d]
    GEMM.  The diagonal of m is zeroed first: its analytic
    contribution is exactly zero (diff² = 0) but the three partial
    sums would otherwise carry it separately (catastrophic for
    kernels whose ∂K/∂sqd is clamped-singular at r = 0, e.g.
    Matérn-½)."""
    n = x.shape[-2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    m = jnp.where(rows == cols, 0.0, abar * w)
    r12 = jnp.sum(m, axis=-1) + jnp.sum(m, axis=-2)       # [n]
    q = jnp.square(x)                                     # [n, d]
    u = jnp.matmul(m, x, precision=precision)             # [n, d]
    s = jnp.matmul(r12, q, precision=precision) - 2.0 * jnp.sum(
        x * u, axis=-2
    )                                                     # [d]
    return 2.0 * ls * s


class RBF(Kernel):
    """ARD squared-exponential, reference ``Squared_exponential``.

    ``K = σ² exp(−‖(x−x')⊙ℓ‖²)``; params ``[σ, ℓ₁..ℓ_d]``
    (``covar.py:84-206``).
    """

    def n_params(self, dim: int) -> int:
        return dim + 1

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        sig = params[0]
        ls = params[1:]
        xl = x * ls
        xpl = None if xp is None else xp * ls
        sqd = sq_distance(xl, xpl, precision=config.precision)
        return jnp.square(sig) * jnp.exp(-sqd)

    def gram_adjoint(self, params, x, abar, *, config: Config = DEFAULT):
        sig = params[0]
        ls = params[1:]
        xl = x * ls
        sqd = sq_distance(xl, None, precision=config.precision)
        e = jnp.exp(-sqd)
        dsig = 2.0 * sig * jnp.sum(abar * e)
        dls = _ard_sqd_adjoint(
            abar, x, ls, -jnp.square(sig) * e, config.precision
        )
        return jnp.concatenate([dsig[None], dls])

    def diag(self, params, x, *, config: Config = DEFAULT):
        sig = params[0]
        return jnp.full((x.shape[-2],), jnp.square(sig), dtype=x.dtype)

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        sig = params[0]
        ls = params[1:]
        krn = self.matrix(params, x, config=config)
        # ∂K/∂σ = 2 K / σ  (covar.py:189)
        dsig = krn * (2.0 / sig)
        # ∂K/∂ℓⱼ = −2 ℓⱼ (xⱼ − x'ⱼ)² K  (covar.py:191-199)
        diff = x.T[:, :, None] - x.T[:, None, :]            # [d, n, n]
        dls = (-2.0 * ls[:, None, None]) * jnp.square(diff) * krn[None]
        dkrn = jnp.concatenate([dsig[None], dls], axis=0)   # [d+1, n, n]
        return krn, dkrn


class WhiteNoise(Kernel):
    """Observation-noise kernel, reference ``White_noise``.

    ``K = σₙ² I`` on the train block; zero on cross blocks
    (``covar.py:209-269``).  Init 1e-4 (``covar.py:224``).
    """

    def n_params(self, dim: int) -> int:
        return 1

    def _init_flat(self, nhp, dtype, config: Config):
        return jnp.full((nhp,), config.noise_init, dtype=dtype)

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        n = x.shape[-2]
        if xp is None:
            return jnp.square(params[0]) * jnp.eye(n, dtype=x.dtype)
        return jnp.zeros((xp.shape[-2], n), dtype=x.dtype)

    def diag(self, params, x, *, config: Config = DEFAULT):
        return jnp.full((x.shape[-2],), jnp.square(params[0]), dtype=x.dtype)

    def gram_adjoint(self, params, x, abar, *, config: Config = DEFAULT):
        # ∂K/∂σₙ = 2σₙ·I ⇒ ⟨Abar, ·⟩ = 2σₙ·tr(Abar)
        return (2.0 * params[0] * jnp.trace(abar))[None]

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        n = x.shape[-2]
        eye = jnp.eye(n, dtype=x.dtype)
        krn = jnp.square(params[0]) * eye
        # ∂K/∂σₙ = 2 σₙ I  (covar.py:262-264)
        dkrn = (2.0 * params[0] * eye)[None]
        return krn, dkrn


class Matern(Kernel):
    """ARD Matérn kernel, ν ∈ {1/2, 3/2, 5/2} (beyond-reference
    capability — the reference ships only SE + noise).

    Same inverse-lengthscale convention as :class:`RBF`:
    ``r = ‖(x − x')⊙ℓ‖``, params ``[σ, ℓ₁..ℓ_d]``, and

      ν=1/2:  K = σ² exp(−r)
      ν=3/2:  K = σ² (1 + √3 r) exp(−√3 r)
      ν=5/2:  K = σ² (1 + √5 r + 5r²/3) exp(−√5 r)

    Hyperparameter gradients come from autodiff (``matrix_and_grad``
    falls back to ``jax.jacfwd`` — exactness tested against FD).
    """

    def __init__(self, nu: float = 1.5):
        assert nu in (0.5, 1.5, 2.5), "Matern supports nu in {0.5,1.5,2.5}"
        self.nu = nu

    def __hash__(self):
        return hash((type(self), self.nu))

    def __eq__(self, other):
        return type(other) is Matern and other.nu == self.nu

    def n_params(self, dim: int) -> int:
        return dim + 1

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        sig = params[0]
        ls = params[1:]
        xl = x * ls
        xpl = None if xp is None else xp * ls
        sqd = sq_distance(xl, xpl, precision=config.precision)
        # sqrt has an infinite derivative at 0: clamp for grad safety
        # (the diagonal r=0 would otherwise produce NaN gradients).
        r = jnp.sqrt(jnp.maximum(sqd, 1e-30))
        if self.nu == 0.5:
            shape = 1.0
            scale = 1.0
        elif self.nu == 1.5:
            c = jnp.sqrt(jnp.asarray(3.0, r.dtype))
            shape = 1.0 + c * r
            scale = c
        else:
            c = jnp.sqrt(jnp.asarray(5.0, r.dtype))
            shape = 1.0 + c * r + (5.0 / 3.0) * sqd
            scale = c
        return jnp.square(sig) * shape * jnp.exp(-scale * r)

    def diag(self, params, x, *, config: Config = DEFAULT):
        return jnp.full((x.shape[-2],), jnp.square(params[0]), dtype=x.dtype)

    def gram_adjoint(self, params, x, abar, *, config: Config = DEFAULT):
        sig = params[0]
        ls = params[1:]
        xl = x * ls
        sqd = sq_distance(xl, None, precision=config.precision)
        r = jnp.sqrt(jnp.maximum(sqd, 1e-30))
        s2 = jnp.square(sig)
        if self.nu == 0.5:
            k_own = s2 * jnp.exp(-r)
            w = -k_own / (2.0 * r)
        elif self.nu == 1.5:
            c = jnp.sqrt(jnp.asarray(3.0, r.dtype))
            e = jnp.exp(-c * r)
            k_own = s2 * (1.0 + c * r) * e
            # dK/dr = −σ²c²r·e  ⇒  ∂K/∂sqd = −σ²c²e/2 (regular)
            w = -1.5 * s2 * e
        else:
            c = jnp.sqrt(jnp.asarray(5.0, r.dtype))
            e = jnp.exp(-c * r)
            k_own = s2 * (1.0 + c * r + (5.0 / 3.0) * sqd) * e
            # dK/dr = −(5/3)σ²r(1+√5r)e ⇒ ∂K/∂sqd = −(5/6)σ²(1+√5r)e
            w = -(5.0 / 6.0) * s2 * (1.0 + c * r) * e
        # parity with AD's clamped-sqrt chain (zero inside the clamp;
        # analytically irrelevant — diff² = 0 there)
        w = jnp.where(sqd > 1e-30, w, 0.0)
        dsig = (2.0 / sig) * jnp.sum(abar * k_own)
        dls = _ard_sqd_adjoint(abar, x, ls, w, config.precision)
        return jnp.concatenate([dsig[None], dls])

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        krn = self.matrix(params, x, config=config)
        jac = jax.jacfwd(lambda p: self.matrix(p, x, config=config))(params)
        return krn, jnp.moveaxis(jac, -1, 0)


class _Compose(Kernel):
    """Shared machinery for kernel combinators: concatenated parameter
    vectors split by per-kernel chunk sizes (reference ``Compose``,
    ``covar.py:45-48``, ``:54-55``)."""

    def __init__(self, kernels: Sequence[Kernel]):
        self.kernels: Tuple[Kernel, ...] = tuple(kernels)

    def __hash__(self):
        return hash((type(self), self.kernels))

    def __eq__(self, other):
        return (
            type(other) is type(self) and self.kernels == other.kernels
        )

    def n_params(self, dim: int) -> int:
        return sum(k.n_params(dim) for k in self.kernels)

    def _splits(self, dim: int):
        sizes = [k.n_params(dim) for k in self.kernels]
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)
        return sizes, offs

    def _init_flat(self, nhp, dtype, config: Config):
        raise NotImplementedError  # init_params overridden below

    def init_params(self, x: Array, config: Config = DEFAULT) -> Array:
        parts = [k.init_params(x, config) for k in self.kernels]
        return jnp.concatenate(parts, axis=-1)


class Sum(_Compose):
    """Sum-of-kernels combinator, reference ``Compose`` (``covar.py:28``).

    Hyperparameter vectors of the sub-kernels are concatenated along the
    last axis (``covar.py:45-48``) and split by per-kernel chunk sizes
    (``covar.py:54-55``); gradients concatenate along the ``nhp`` axis
    (``covar.py:71-81``).
    """

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        _, offs = self._splits(dim)
        out = None
        for k, lo, hi in zip(self.kernels, offs[:-1], offs[1:]):
            term = k.matrix(params[lo:hi], x, xp, config=config)
            out = term if out is None else out + term
        return out

    def gram_adjoint(self, params, x, abar, *, config: Config = DEFAULT):
        # a sum's adjoint splits per child; specialized only when
        # EVERY child is (otherwise the whole gradient falls back)
        dim = x.shape[-1]
        _, offs = self._splits(dim)
        parts = []
        for k, lo, hi in zip(self.kernels, offs[:-1], offs[1:]):
            ga = k.gram_adjoint(params[lo:hi], x, abar, config=config)
            if ga is None:
                return None
            parts.append(ga)
        return jnp.concatenate(parts, axis=-1)

    def diag(self, params, x, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        _, offs = self._splits(dim)
        out = None
        for k, lo, hi in zip(self.kernels, offs[:-1], offs[1:]):
            term = k.diag(params[lo:hi], x, config=config)
            out = term if out is None else out + term
        return out

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        _, offs = self._splits(dim)
        krn = None
        dkrns = []
        for k, lo, hi in zip(self.kernels, offs[:-1], offs[1:]):
            km, dk = k.matrix_and_grad(params[lo:hi], x, config=config)
            krn = km if krn is None else krn + km
            dkrns.append(dk)
        return krn, jnp.concatenate(dkrns, axis=0)


class Product(_Compose):
    """Element-wise product of kernels (beyond-reference capability —
    the reference's ``Compose`` supports sums only, ``covar.py:57-62``).

    Same concatenated-parameter convention as :class:`Sum`.  Gradients
    use the product rule, reusing each sub-kernel's analytic
    ``matrix_and_grad``: ``∂(∏Kⱼ)/∂θᵢ = (∂Kᵢ/∂θᵢ) ⊙ ∏_{j≠i} Kⱼ``.
    """

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        _, offs = self._splits(dim)
        out = None
        for k, lo, hi in zip(self.kernels, offs[:-1], offs[1:]):
            term = k.matrix(params[lo:hi], x, xp, config=config)
            out = term if out is None else out * term
        return out

    def diag(self, params, x, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        _, offs = self._splits(dim)
        out = None
        for k, lo, hi in zip(self.kernels, offs[:-1], offs[1:]):
            term = k.diag(params[lo:hi], x, config=config)
            out = term if out is None else out * term
        return out

    def gram_adjoint(self, params, x, abar, *, config: Config = DEFAULT):
        # product rule in adjoint form: ⟨Abar, ∂(∏K)/∂θᵢ⟩ =
        # ⟨Abar ∘ ∏_{j≠i} Kⱼ, ∂Kᵢ/∂θᵢ⟩ — each child sees the
        # other-factors-weighted adjoint through its OWN contraction
        dim = x.shape[-1]
        _, offs = self._splits(dim)
        spans = list(zip(self.kernels, offs[:-1], offs[1:]))
        mats = [
            k.matrix(params[lo:hi], x, config=config)
            for k, lo, hi in spans
        ]
        parts = []
        for i, (k, lo, hi) in enumerate(spans):
            others = None
            for j, m in enumerate(mats):
                if j == i:
                    continue
                others = m if others is None else others * m
            ab_i = abar if others is None else abar * others
            ga = k.gram_adjoint(params[lo:hi], x, ab_i, config=config)
            if ga is None:
                return None
            parts.append(ga)
        return jnp.concatenate(parts, axis=-1)

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        _, offs = self._splits(dim)
        ks, dks = [], []
        for k, lo, hi in zip(self.kernels, offs[:-1], offs[1:]):
            km, dk = k.matrix_and_grad(params[lo:hi], x, config=config)
            ks.append(km)
            dks.append(dk)
        m = len(ks)
        # prefix[i] = K₀⊙…⊙Kᵢ₋₁, suffix[i] = Kᵢ₊₁⊙…⊙K_{m−1}
        prefix, suffix = [None] * m, [None] * m
        acc = None
        for i in range(m):
            prefix[i] = acc
            acc = ks[i] if acc is None else acc * ks[i]
        krn = acc
        acc = None
        for i in reversed(range(m)):
            suffix[i] = acc
            acc = ks[i] if acc is None else ks[i] * acc
        dkrns = []
        for i in range(m):
            rest = prefix[i]
            if suffix[i] is not None:
                rest = suffix[i] if rest is None else rest * suffix[i]
            dkrns.append(dks[i] if rest is None else dks[i] * rest[None])
        return krn, jnp.concatenate(dkrns, axis=0)


class ArcCosine(Kernel):
    """Arc-cosine (infinite-width neural network) kernel of order
    n ∈ {0, 1, 2} (Cho & Saul, NeurIPS 2009) — beyond-reference
    capability and the classic non-stationary complement to the
    radial family:

        K = σ²/π · ‖x̃‖ⁿ‖x̃′‖ⁿ · J_n(θ),  x̃ = x⊙ℓ,
        θ = ∠(x̃, x̃′),
        J₀ = π − θ
        J₁ = sin θ + (π − θ)·cos θ
        J₂ = 3 sinθ cosθ + (π − θ)(1 + 2cos²θ)

    the exact kernel of an infinite ReLU⁰/ReLU¹/ReLU² layer on the
    ℓ-weighted inputs.  Params ``[σ, ℓ₁..ℓ_d]`` (house inverse-
    lengthscale convention), init all-ones.  cos θ is clamped inside
    (−1, 1) so autodiff of arccos stays finite on the diagonal
    (θ = 0); the O(√ε) bias is below f32 resolution of the kernel
    value.  All ops are one Gram matmul + elementwise — MXU-friendly,
    no pairwise-difference tensor.  Gradients via forward-mode
    autodiff (FD-checked).
    """

    def __init__(self, order: int = 1):
        assert order in (0, 1, 2), "ArcCosine supports order 0, 1, 2"
        self.order = order

    def __hash__(self):
        return hash((type(self), self.order))

    def __eq__(self, other):
        return type(other) is ArcCosine and other.order == self.order

    def n_params(self, dim: int) -> int:
        return dim + 1

    def _core(self, params, x, xp, config: Config):
        sig, ls = params[0], params[1:]
        xl = x * ls
        xpl = xl if xp is None else xp * ls
        ip = jnp.dot(xpl, xl.T, precision=config.precision)  # [m, n]
        nx = jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.square(xl), -1), 1e-36
        ))                                                    # [n]
        nxp = jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.square(xpl), -1), 1e-36
        ))                                                    # [m]
        # dtype-aware clamp: keeps arccos AD finite on the diagonal
        # (θ=0) with an O(√eps) value bias below dtype resolution
        ceps = 30.0 * float(jnp.finfo(x.dtype).eps)
        cos = jnp.clip(
            ip / (nxp[:, None] * nx[None, :]), -1.0 + ceps, 1.0 - ceps
        )
        theta = jnp.arccos(cos)
        sin = jnp.sqrt(jnp.maximum(1.0 - jnp.square(cos), 0.0))
        if self.order == 0:
            j = math.pi - theta
            amp = 1.0
        elif self.order == 1:
            j = sin + (math.pi - theta) * cos
            amp = nxp[:, None] * nx[None, :]
        else:
            j = 3.0 * sin * cos + (math.pi - theta) * (
                1.0 + 2.0 * jnp.square(cos)
            )
            amp = jnp.square(nxp)[:, None] * jnp.square(nx)[None, :]
        return jnp.square(sig) / math.pi * amp * j

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        return self._core(params, x, xp, config)

    def diag(self, params, x, *, config: Config = DEFAULT):
        sig, ls = params[0], params[1:]
        n2 = jnp.maximum(jnp.sum(jnp.square(x * ls), -1), 1e-36)
        if self.order == 0:
            amp = jnp.ones_like(n2)
            j0 = math.pi
        elif self.order == 1:
            amp = n2
            j0 = math.pi
        else:
            amp = jnp.square(n2)
            j0 = 3.0 * math.pi
        return jnp.square(sig) / math.pi * amp * j0

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        krn = self.matrix(params, x, config=config)
        jac = jax.jacfwd(lambda p: self.matrix(p, x, config=config))(params)
        return krn, jnp.moveaxis(jac, -1, 0)


class RationalQuadratic(Kernel):
    """ARD rational-quadratic kernel (beyond-reference capability).

    ``K = σ² (1 + r²/α²)^(−α²)`` with ``r² = ‖(x−x')⊙ℓ‖²`` — a scale
    mixture of :class:`RBF` kernels over lengthscales; recovers this
    package's RBF (which has **no ½ factor** in the exponent, matching
    the reference ``covar.py:147-149``) as α→∞.  Params
    ``[σ, α, ℓ₁..ℓ_d]`` (nhp = d+2), init all-ones.
    The mixture index enters as α² so every parameter is sign-invariant,
    matching the house convention (σ and ℓ enter squared too) — the
    log-space optimizer (``fit_mle``) then needs no special casing.
    Gradients via forward-mode autodiff (FD-checked).
    """

    def n_params(self, dim: int) -> int:
        return dim + 2

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        sig, alpha = params[0], params[1]
        ls = params[2:]
        xl = x * ls
        xpl = None if xp is None else xp * ls
        sqd = sq_distance(xl, xpl, precision=config.precision)
        # clamp α² away from under/overflow: a2→0 gives 0·log1p(inf)=NaN
        # and a2→inf gives inf·log1p(0)=NaN, both reachable when the
        # log-space optimizer's line search probes extreme exponents
        # (f32).  The bound must keep a2² inside f32 range too — the
        # quotient-rule JVP divides by a2², and 1e-40 underflows to a
        # 0/0 NaN.  At the clamp ends the kernel smoothly saturates to
        # the constant (a2→0) / RBF (a2→inf) limits.
        a2 = jnp.clip(jnp.square(alpha), 1e-12, 1e12)
        return jnp.square(sig) * jnp.exp(-a2 * jnp.log1p(sqd / a2))

    def diag(self, params, x, *, config: Config = DEFAULT):
        return jnp.full((x.shape[-2],), jnp.square(params[0]), dtype=x.dtype)

    def gram_adjoint(self, params, x, abar, *, config: Config = DEFAULT):
        sig, alpha = params[0], params[1]
        ls = params[2:]
        xl = x * ls
        sqd = sq_distance(xl, None, precision=config.precision)
        a2 = jnp.clip(jnp.square(alpha), 1e-12, 1e12)
        s = sqd / a2
        k_own = jnp.square(sig) * jnp.exp(-a2 * jnp.log1p(s))
        dsig = (2.0 / sig) * jnp.sum(abar * k_own)
        # dK/da2 = K·(s/(1+s) − log1p(s)); clip passes gradient only
        # strictly inside its bounds (AD-parity)
        inside = jnp.logical_and(
            jnp.square(alpha) > 1e-12, jnp.square(alpha) < 1e12
        ).astype(sqd.dtype)
        dalpha = (
            2.0
            * alpha
            * inside
            * jnp.sum(abar * k_own * (s / (1.0 + s) - jnp.log1p(s)))
        )
        dls = _ard_sqd_adjoint(
            abar, x, ls, -k_own / (1.0 + s), config.precision
        )
        return jnp.concatenate([dsig[None], dalpha[None], dls])

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        krn = self.matrix(params, x, config=config)
        jac = jax.jacfwd(lambda p: self.matrix(p, x, config=config))(params)
        return krn, jnp.moveaxis(jac, -1, 0)


class Periodic(Kernel):
    """ARD exp-sine-squared kernel (beyond-reference capability),
    computed MXU-first through an explicit feature map.

    ``K = σ² exp(−2 Σⱼ ℓⱼ² sin²(π ωⱼ (xⱼ−x'ⱼ)))`` with inverse periods
    ωⱼ multiplying x (the house inverse-lengthscale convention).  Params
    ``[σ, ℓ₁..ℓ_d, ω₁..ω_d]`` (nhp = 2d+1), init all-ones.

    Instead of materializing the ``[d, m, n]`` pairwise-difference
    tensor, the exponent is rewritten via
    ``−2ℓ²sin²(u/2) = ℓ²(cos u − 1)`` and the angle-difference identity
    into a single ``[m, 2d]·[2d, n]`` MXU matmul of the feature map
    ``φ(x) = [ℓ⊙cos(2πω⊙x), ℓ⊙sin(2πω⊙x)]``:
    ``K = σ² exp(φ(x')φ(x)ᵀ − ‖ℓ‖²)`` — the same structural trick as the
    squared-distance matmul (``covar.py:110``).  Gradients via
    forward-mode autodiff (FD-checked).
    """

    def n_params(self, dim: int) -> int:
        return 2 * dim + 1

    def _features(self, params, x):
        dim = x.shape[-1]
        ls = params[1 : 1 + dim]
        om = params[1 + dim :]
        u = (2.0 * jnp.pi) * (x * om)
        return jnp.concatenate([ls * jnp.cos(u), ls * jnp.sin(u)], axis=-1)

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        sig = params[0]
        ls = params[1 : 1 + dim]
        fx = self._features(params, x)
        fxp = fx if xp is None else self._features(params, xp)
        g = jnp.dot(fxp, fx.T, precision=config.precision)
        expo = jnp.minimum(g - jnp.sum(jnp.square(ls)), 0.0)
        return jnp.square(sig) * jnp.exp(expo)

    def diag(self, params, x, *, config: Config = DEFAULT):
        return jnp.full((x.shape[-2],), jnp.square(params[0]), dtype=x.dtype)

    def gram_adjoint(self, params, x, abar, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        sig = params[0]
        ls = params[1 : 1 + dim]
        om = params[1 + dim :]
        u = (2.0 * jnp.pi) * (x * om)
        c, s = jnp.cos(u), jnp.sin(u)                     # [n, d]
        fx = jnp.concatenate([ls * c, ls * s], axis=-1)
        g = jnp.dot(fx, fx.T, precision=config.precision)
        expo_raw = g - jnp.sum(jnp.square(ls))
        expo = jnp.minimum(expo_raw, 0.0)
        k_own = jnp.square(sig) * jnp.exp(expo)
        dsig = (2.0 / sig) * jnp.sum(abar * k_own)
        # the min-clamp passes gradient only where the exponent is
        # strictly negative (off-diagonal); the diagonal's analytic
        # contribution is zero anyway
        m = jnp.where(expo_raw < 0.0, abar * k_own, 0.0)
        # one [n,n]·[n,4d] GEMM feeds every ℓ and ω component:
        feats = jnp.concatenate([c, s, x * c, x * s], axis=-1)
        pm = jnp.matmul(m, feats, precision=config.precision)
        pc, ps, pxc, pxs = (
            pm[:, :dim], pm[:, dim:2*dim],
            pm[:, 2*dim:3*dim], pm[:, 3*dim:],
        )
        # ∂E/∂ℓⱼ = 2ℓⱼ(cos(uₐⱼ−u_bⱼ) − 1):
        cosq = jnp.sum(c * pc + s * ps, axis=-2)          # [d]
        dls = 2.0 * ls * (cosq - jnp.sum(m))
        # ∂E/∂ωⱼ = −2πℓⱼ²·sin(uₐⱼ−u_bⱼ)(xₐⱼ−x_bⱼ):
        t_sum = (
            jnp.sum((x * s) * pc, axis=-2)                # (x∘s)ᵀm c
            - jnp.sum((x * c) * ps, axis=-2)              # −(x∘c)ᵀm s
            - jnp.sum(s * pxc, axis=-2)                   # −sᵀm(x∘c)
            + jnp.sum(c * pxs, axis=-2)                   # +cᵀm(x∘s)
        )
        dom = -(2.0 * jnp.pi) * jnp.square(ls) * t_sum
        return jnp.concatenate([dsig[None], dls, dom])

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        krn = self.matrix(params, x, config=config)
        jac = jax.jacfwd(lambda p: self.matrix(p, x, config=config))(params)
        return krn, jnp.moveaxis(jac, -1, 0)


class Constant(Kernel):
    """Constant (bias) kernel ``K = σ²·𝟙𝟙ᵀ`` (beyond-reference):
    a learned constant offset under ``Sum`` (the GP mean-level term —
    this engine, like the reference, is zero-mean, so ``RBF() +
    Constant() + WhiteNoise()`` is how a non-zero baseline is
    absorbed), and the additive bias factor in ``Product`` trees.
    One param ``[σ]``, init 1.  ``∂K/∂σ = 2σ·𝟙𝟙ᵀ``.

    Fit note: for data whose level is far from zero, start σ near
    that level (or center y first) — from the all-ones init the NLML's
    all-noise basin can capture the fit before the constant term
    grows to the offset."""

    def n_params(self, dim: int) -> int:
        return 1

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        m = x.shape[-2] if xp is None else xp.shape[-2]
        return jnp.full(
            (m, x.shape[-2]), jnp.square(params[0]), dtype=x.dtype
        )

    def diag(self, params, x, *, config: Config = DEFAULT):
        return jnp.full(
            (x.shape[-2],), jnp.square(params[0]), dtype=x.dtype
        )

    def gram_adjoint(self, params, x, abar, *, config: Config = DEFAULT):
        # ∂K/∂σ = 2σ·𝟙𝟙ᵀ ⇒ ⟨Abar, ·⟩ = 2σ·ΣAbar
        return (2.0 * params[0] * jnp.sum(abar))[None]

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        n = x.shape[-2]
        krn = self.matrix(params, x, config=config)
        dkrn = jnp.full((1, n, n), 2.0 * params[0], dtype=x.dtype)
        return krn, dkrn


class SpectralMixture(Kernel):
    """Spectral mixture kernel (Wilson & Adams 2013) — a Q-component
    Gaussian spectral density, the expressive stationary kernel for
    pattern discovery/extrapolation (beyond-reference capability):

        K(τ) = Σ_q w_q² · exp(−‖τ ⊙ s_q‖²) · cos(2π μ_qᵀ τ),  τ = x−x'

    (the textbook form with per-dim bandwidths v_q has s_q = √(2π²v_q);
    s multiplies x, the house inverse-lengthscale convention).  Params
    ``[w (Q), μ (Q·d), s (Q·d)]``, nhp = Q(1+2d), init all-ones.

    MXU form — no ``[d, n, n]`` difference tensor: per component, one
    scaled squared-distance matmul (``sq_distance``) plus the cosine of
    a phase difference expanded as a rank-2 outer product,
    ``cos(aᵢ−bⱼ) = cos aᵢ cos bⱼ + sin aᵢ sin bⱼ`` with
    ``a = 2π x μ_q``.  Q is static, so the component loop unrolls into
    one fused XLA program.  Gradients via forward-mode AD (FD-checked).

    ``init_from_data`` is the standard spectral initialization (means
    uniform up to the Nyquist frequency of the median sample spacing,
    bandwidths at the data range) — SM likelihoods are multimodal and
    the all-ones protocol init is rarely in the right basin.
    """

    def __init__(self, q: int = 2):
        if q < 1:
            raise ValueError("SpectralMixture needs q >= 1")
        self.q = int(q)

    def __hash__(self):
        return hash((type(self), self.q))

    def __eq__(self, other):
        return type(other) is SpectralMixture and other.q == self.q

    def n_params(self, dim: int) -> int:
        return self.q * (1 + 2 * dim)

    def _split(self, params, dim):
        qn = self.q
        w = params[..., :qn]
        mu = params[..., qn: qn + qn * dim].reshape(
            params.shape[:-1] + (qn, dim)
        )
        s = params[..., qn + qn * dim:].reshape(
            params.shape[:-1] + (qn, dim)
        )
        return w, mu, s

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        w, mu, s = self._split(params, dim)
        xq = x if xp is None else xp
        out = 0.0
        for k in range(self.q):
            sqd = sq_distance(
                x * s[k], None if xp is None else xp * s[k],
                precision=config.precision,
            )
            a = (2.0 * jnp.pi) * jnp.dot(
                x, mu[k], precision=config.precision
            )                                               # [n]
            b = a if xp is None else (2.0 * jnp.pi) * jnp.dot(
                xq, mu[k], precision=config.precision
            )                                               # [m]
            cosd = (
                jnp.cos(b)[:, None] * jnp.cos(a)[None, :]
                + jnp.sin(b)[:, None] * jnp.sin(a)[None, :]
            )
            out = out + jnp.square(w[k]) * jnp.exp(-sqd) * cosd
        return out

    def diag(self, params, x, *, config: Config = DEFAULT):
        w, _, _ = self._split(params, x.shape[-1])
        return jnp.full(
            (x.shape[-2],), jnp.sum(jnp.square(w)), dtype=x.dtype
        )

    def gram_adjoint(self, params, x, abar, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        w, mu, s = self._split(params, dim)
        dws, dmus, dss = [], [], []
        for k in range(self.q):
            sqd = sq_distance(x * s[k], None, precision=config.precision)
            e = jnp.exp(-sqd)
            a = (2.0 * jnp.pi) * jnp.dot(
                x, mu[k], precision=config.precision
            )
            ca, sa = jnp.cos(a), jnp.sin(a)
            cosd = ca[:, None] * ca[None, :] + sa[:, None] * sa[None, :]
            sind = sa[:, None] * ca[None, :] - ca[:, None] * sa[None, :]
            w2 = jnp.square(w[k])
            dws.append(2.0 * w[k] * jnp.sum(abar * e * cosd))
            # ∂C/∂μ_kj = −w²E sin(φ)·2π(xₐ−x_b)ⱼ: row/col-sum matvecs
            mt = abar * (w2 * e * sind) * (2.0 * jnp.pi)
            r1 = jnp.sum(mt, axis=-1)
            r2 = jnp.sum(mt, axis=-2)
            dmus.append(
                -jnp.matmul(r1 - r2, x, precision=config.precision)
            )
            # ∂C/∂sqd = −w²E cosφ → shared ARD contraction
            dss.append(
                _ard_sqd_adjoint(
                    abar, x, s[k], -w2 * e * cosd, config.precision
                )
            )
        return jnp.concatenate(
            [jnp.stack(dws)]
            + [jnp.concatenate(dmus)]
            + [jnp.concatenate(dss)]
        )

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        krn = self.matrix(params, x, config=config)
        jac = jax.jacfwd(lambda p: self.matrix(p, x, config=config))(params)
        return krn, jnp.moveaxis(jac, -1, 0)

    def init_from_data(self, x, seed: int = 0, n_restarts: int = 1):
        """Host-side (NumPy) spectral init: w = 1/√Q, frequencies μ_q
        log-uniform between the data-range scale 1/L and the Nyquist
        frequency of the median sample spacing (scale-even coverage of
        the resolvable spectrum), bandwidths s_q = 1/L.

        ``n_restarts > 1`` returns a stacked ``[R, nhp]`` batch — feed
        it straight to ``fit_mle`` (which vmaps restarts into one XLA
        program) and keep the ``argmin``-NLML row: the SM likelihood is
        multimodal and multi-restart is the standard workflow."""
        import numpy as np

        x = np.asarray(x)
        n, dim = x.shape
        rng = np.random.default_rng(seed)
        L = x.max(0) - x.min(0) + 1e-12
        f_lo = 1.0 / L
        nyq = np.empty(dim)
        for j in range(dim):
            dx = np.diff(np.sort(x[:, j]))
            dx = dx[dx > 0]
            nyq[j] = 0.5 / (np.median(dx) if dx.size else 1.0)
        nyq = np.maximum(nyq, 2.0 * f_lo)
        outs = []
        for _ in range(max(n_restarts, 1)):
            w = np.full(self.q, 1.0 / np.sqrt(self.q))
            u = rng.uniform(size=(self.q, dim))
            mu = f_lo * (nyq / f_lo) ** u            # log-uniform
            s = np.broadcast_to(1.0 / L, (self.q, dim)).copy()
            outs.append(
                np.concatenate([w, mu.ravel(), s.ravel()]).astype(x.dtype)
            )
        return outs[0] if n_restarts == 1 else np.stack(outs)


class Linear(Kernel):
    """ARD linear (dot-product) kernel (beyond-reference capability):
    Bayesian linear regression as a GP, and the polynomial-trend factor
    in products like ``Linear() * Periodic()``.

    ``K = σ² (x⊙ℓ)(x'⊙ℓ)ᵀ`` — one MXU matmul.  Params ``[σ, ℓ₁..ℓ_d]``,
    init all-ones.  Analytic gradients: ``∂K/∂σ = 2K/σ``,
    ``∂K/∂ℓⱼ = 2ℓⱼ σ² xⱼx'ⱼᵀ``.
    """

    def n_params(self, dim: int) -> int:
        return dim + 1

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        sig = params[0]
        ls = params[1:]
        xl = x * ls
        xpl = xl if xp is None else xp * ls
        return jnp.square(sig) * jnp.dot(
            xpl, xl.T, precision=config.precision
        )

    def diag(self, params, x, *, config: Config = DEFAULT):
        sig = params[0]
        return jnp.square(sig) * jnp.sum(
            jnp.square(x * params[1:]), axis=-1
        )

    def gram_adjoint(self, params, x, abar, *, config: Config = DEFAULT):
        sig = params[0]
        ls = params[1:]
        xl = x * ls
        g = jnp.dot(xl, xl.T, precision=config.precision)
        dsig = 2.0 * sig * jnp.sum(abar * g)
        # ⟨Abar, ∂K/∂ℓⱼ⟩ = 2ℓⱼσ² Σₐᵦ Abarₐᵦ xₐⱼx_bⱼ = 2ℓⱼσ²·xⱼᵀAbar xⱼ
        u = jnp.matmul(abar, x, precision=config.precision)
        dls = (
            2.0 * ls * jnp.square(sig) * jnp.sum(x * u, axis=-2)
        )
        return jnp.concatenate([dsig[None], dls])

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        sig = params[0]
        ls = params[1:]
        krn = self.matrix(params, x, config=config)
        dsig = krn * (2.0 / sig)
        outer = x.T[:, :, None] * x.T[:, None, :]            # [d, n, n]
        dls = (2.0 * jnp.square(sig) * ls[:, None, None]) * outer
        return krn, jnp.concatenate([dsig[None], dls], axis=0)


_SEPARABLE_PROFILES = {
    # r ≥ 0 ↦ correlation; each is a valid 1-D stationary kernel, so
    # the tensor product over dimensions is PSD (Schur product thm).
    "rbf": lambda r: jnp.exp(-jnp.square(r)),
    "exp": lambda r: jnp.exp(-r),                       # Matérn ν=1/2
    "matern32": lambda r: (1.0 + math.sqrt(3.0) * r)
    * jnp.exp(-math.sqrt(3.0) * r),
    "matern52": lambda r: (
        1.0 + math.sqrt(5.0) * r + (5.0 / 3.0) * jnp.square(r)
    ) * jnp.exp(-math.sqrt(5.0) * r),
}


class Separable(Kernel):
    """Tensor-product kernel from 1-D stationary profiles
    (beyond-reference capability):

        K = σ² · Π_j φ(ℓ_j·|x_j − x'_j|)

    with φ ∈ {rbf, exp, matern32, matern52}.  ``Separable("rbf")``
    coincides with :class:`RBF`; the Matérn profiles give rougher
    sample paths than the ARD Matérn *along each axis* while keeping
    the Kronecker factorization over a Cartesian grid that SKI
    (``models/ski.py``) exploits — the ARD (isotropic-radius) Matérn
    does not factorize, this one does by construction.

    Params ``[σ, ℓ₁..ℓ_d]`` (inverse lengthscales, house convention).
    Gradients via autodiff (``matrix_and_grad`` falls back to jacfwd).
    """

    def __init__(self, profile: str = "matern52"):
        if profile not in _SEPARABLE_PROFILES:
            raise ValueError(
                f"profile {profile!r} not in "
                f"{sorted(_SEPARABLE_PROFILES)}"
            )
        self.profile = profile

    def __hash__(self):
        return hash((type(self), self.profile))

    def __eq__(self, other):
        return (
            type(other) is Separable and other.profile == self.profile
        )

    def n_params(self, dim: int) -> int:
        return dim + 1

    def profile_fn(self, r: Array) -> Array:
        return _SEPARABLE_PROFILES[self.profile](r)

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        sig = params[0]
        ls = params[1:]
        xp_ = x if xp is None else xp
        # per-dimension |Δ| accumulated as a product of 1-D profiles
        out = jnp.square(sig) * jnp.ones(
            (xp_.shape[-2], x.shape[-2]), x.dtype
        )
        phi = _SEPARABLE_PROFILES[self.profile]
        for j in range(x.shape[-1]):
            r = jnp.abs(xp_[:, j][:, None] - x[:, j][None, :]) * jnp.abs(
                ls[j]
            )
            out = out * phi(r)
        return out

    def diag(self, params, x, *, config: Config = DEFAULT):
        sig = params[0]
        return jnp.full((x.shape[-2],), jnp.square(sig), dtype=x.dtype)

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        krn = self.matrix(params, x, config=config)
        jac = jax.jacfwd(lambda p: self.matrix(p, x, config=config))(
            params
        )
        return krn, jnp.moveaxis(jac, -1, 0)


class ActiveDims(Kernel):
    """Restrict a base kernel to a subset of input columns
    (beyond-reference capability — the reference's kernels always see
    every input dimension, ``covar.py:140``).

    ``ActiveDims(k, dims)`` evaluates ``k`` on ``x[:, dims]`` only; its
    parameter vector is the base kernel's vector for ``len(dims)``
    inputs.  This is the building block for **additive GP structure**
    (Duvenaud et al. 2011) over heterogeneous inputs::

        ActiveDims(RBF(), (0,)) + ActiveDims(Matern(2.5), (1, 2))

    and for products of per-group kernels (e.g. a periodic time axis
    times an RBF over space).  Column selection is a static gather —
    shapes stay static under jit, and the wrapper composes with every
    fit/predict/MCMC/committee path unchanged (it is just a kernel).

    Analytic gradients delegate to the base kernel's
    ``matrix_and_grad`` on the sliced inputs (the chain rule through a
    column selection is the identity on hyperparameters).
    """

    def __init__(self, base: Kernel, dims: Sequence[int]):
        self.base = base
        self.dims = tuple(int(d) for d in dims)
        if len(set(self.dims)) != len(self.dims):
            raise ValueError("ActiveDims dims must be unique")

    def __hash__(self):
        return hash((type(self), self.base, self.dims))

    def __eq__(self, other):
        return (
            type(other) is ActiveDims
            and other.base == self.base
            and other.dims == self.dims
        )

    def _slice(self, x: Optional[Array]) -> Optional[Array]:
        if x is None:
            return None
        return x[..., self.dims]

    def n_params(self, dim: int) -> int:
        return self.base.n_params(len(self.dims))

    def init_params(self, x: Array, config: Config = DEFAULT) -> Array:
        return self.base.init_params(self._slice(x), config)

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        return self.base.matrix(
            params, self._slice(x), self._slice(xp), config=config
        )

    def diag(self, params, x, *, config: Config = DEFAULT):
        return self.base.diag(params, self._slice(x), config=config)

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        return self.base.matrix_and_grad(
            params, self._slice(x), config=config
        )


class ChangePoint(Kernel):
    """Sigmoid changepoint between two kernels along one input axis
    (beyond-reference capability; Lloyd et al. 2014, the "CP" operator
    of the automatic statistician):

        K(x, x') = s(x)·s(x')·K₁(x, x')
                   + (1 − s(x))·(1 − s(x'))·K₂(x, x'),
        s(x) = σ(a²·(x_axis − c))

    — ``K₂`` governs the regime left of the changepoint location ``c``
    along ``axis``, ``K₁`` the regime right of it, with a learned
    transition sharpness ``a²`` (entering squared so the sign-invariant
    house convention holds).  PSD by construction: each term is a PSD
    kernel scaled by g(x)g(x').

    Params ``[c, a, θ₁…, θ₂…]`` (nhp = 2 + nhp₁ + nhp₂), init:
    ``c = 1``, ``a = 1``, sub-kernels at their own inits.  Under the
    default log-space ``fit_mle`` the location stays positive — shift
    the inputs so the candidate changepoint region is positive, or fit
    with ``log_space=False`` for a signed location.  Both sub-kernels
    see the **full** input vector (only the gate looks at ``axis``).

    Gradients via forward-mode autodiff (FD-checked).
    """

    def __init__(self, k1: Kernel, k2: Kernel, axis: int = 0):
        self.k1 = k1
        self.k2 = k2
        self.axis = int(axis)

    def __hash__(self):
        return hash((type(self), self.k1, self.k2, self.axis))

    def __eq__(self, other):
        return (
            type(other) is ChangePoint
            and other.k1 == self.k1
            and other.k2 == self.k2
            and other.axis == self.axis
        )

    def n_params(self, dim: int) -> int:
        return 2 + self.k1.n_params(dim) + self.k2.n_params(dim)

    def init_params(self, x: Array, config: Config = DEFAULT) -> Array:
        batch = x.shape[:-2]
        gate = jnp.ones(batch + (2,), dtype=x.dtype)
        return jnp.concatenate(
            [
                gate,
                self.k1.init_params(x, config),
                self.k2.init_params(x, config),
            ],
            axis=-1,
        )

    def init_from_data(
        self, x, n_restarts: int = 1, config: Config = DEFAULT
    ):
        """Host-side data-driven init (the changepoint likelihood is
        multimodal — like :meth:`SpectralMixture.init_from_data`, the
        protocol all-ones start is rarely in the right basin): gate
        location at the median of the gate axis (``n_restarts > 1``:
        at evenly spaced quantiles, stacked ``[R, nhp]`` — feed to
        ``fit_mle``, which vmaps the restarts into one XLA program,
        and keep the argmin-NLML row), sharpness ``a² = 4/range`` (the
        transition spans ~a quarter of the data), and the sub-kernels
        at their own inits."""
        import numpy as np

        xn = np.asarray(x)
        col = xn[..., self.axis].ravel()
        rng_ = max(float(col.max() - col.min()), 1e-6)
        a = float(np.sqrt(4.0 / rng_))
        sub = jnp.concatenate(
            [
                self.k1.init_params(jnp.asarray(x), config),
                self.k2.init_params(jnp.asarray(x), config),
            ],
            axis=-1,
        )
        if n_restarts == 1:
            qs = [0.5]
        else:
            qs = np.linspace(0.15, 0.85, n_restarts)
        rows = []
        bad_c = []
        # the default fit path (fit_mle, log-space) takes log of every
        # initial parameter: a non-positive gate location would NaN /
        # sign-flip far from here, so clamp it to a small positive
        # value derived from the data range instead of returning a
        # value known to break under the documented default.
        c_floor = 1e-3 * rng_
        for q in qs:
            c = float(np.quantile(col, q))
            if c <= 0.0:
                bad_c.append(c)
                c = c_floor
            gate = jnp.asarray([c, a], sub.dtype)
            rows.append(jnp.concatenate([gate, sub], axis=-1))
        if bad_c:
            import warnings

            warnings.warn(
                "ChangePoint.init_from_data: gate location(s) "
                f"{bad_c} were <= 0 because the gate-axis data spans "
                "non-positive values; clamped to "
                f"{c_floor:.3g} so the default log-space fit_mle "
                "stays finite.  For a genuinely non-positive change "
                "point, shift the inputs or fit with "
                "log_space=False.",
                stacklevel=2,
            )
        return rows[0] if n_restarts == 1 else jnp.stack(rows)

    def _gate(self, params, x):
        c, a = params[0], params[1]
        return jax.nn.sigmoid(jnp.square(a) * (x[..., self.axis] - c))

    def _split(self, params, dim):
        n1 = self.k1.n_params(dim)
        return params[2 : 2 + n1], params[2 + n1 :]

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        p1, p2 = self._split(params, dim)
        s_x = self._gate(params, x)                       # [n]
        s_q = s_x if xp is None else self._gate(params, xp)  # [m]
        k1 = self.k1.matrix(p1, x, xp, config=config)
        k2 = self.k2.matrix(p2, x, xp, config=config)
        return (
            s_q[:, None] * s_x[None, :] * k1
            + (1.0 - s_q)[:, None] * (1.0 - s_x)[None, :] * k2
        )

    def diag(self, params, x, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        p1, p2 = self._split(params, dim)
        s = self._gate(params, x)
        return jnp.square(s) * self.k1.diag(
            p1, x, config=config
        ) + jnp.square(1.0 - s) * self.k2.diag(p2, x, config=config)

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        krn = self.matrix(params, x, config=config)
        jac = jax.jacfwd(lambda p: self.matrix(p, x, config=config))(params)
        return krn, jnp.moveaxis(jac, -1, 0)


# ---------------------------------------------------------------------------
# Batched public entry points (the reference's leading-nc convention,
# covar.py:104, :133-135 — realized with vmap instead of view/squeeze).
# ---------------------------------------------------------------------------


def _batched(core, params, x, *rest, n_array_rest=0):
    """vmap ``core`` over a leading batch axis of x and/or params."""
    x_b = x.ndim == 3
    p_b = params.ndim == 2
    if not x_b and not p_b:
        return core(params, x, *rest)
    in_axes = (0 if p_b else None, 0 if x_b else None) + (None,) * n_array_rest
    return jax.vmap(lambda p, xx, *r: core(p, xx, *r), in_axes=in_axes)(
        params, x, *rest
    )


def kernel_matrix(
    kern: Kernel,
    params: Array,
    x: Array,
    xp: Optional[Array] = None,
    *,
    config: Config = DEFAULT,
) -> Array:
    """Batched kernel matrix.

    ``x: [n,d]`` or ``[nc,n,d]``; ``params: [nhp]`` or ``[nc,nhp]``;
    ``xp: [m,d]`` (never batched, matching the reference's "only one of
    x or xp batched" rule, ``covar.py`` distance docstring).

    Returns ``[n,n]`` / ``[m,n]`` or with a leading ``nc``.
    """
    if xp is None:
        core = lambda p, xx: kern.matrix(p, xx, config=config)
        return _batched(core, params, x)
    core = lambda p, xx, xpp: kern.matrix(p, xx, xpp, config=config)
    return _batched(core, params, x, xp, n_array_rest=1)


def kernel_diag(
    kern: Kernel, params: Array, x: Array, *, config: Config = DEFAULT
) -> Array:
    core = lambda p, xx: kern.diag(p, xx, config=config)
    return _batched(core, params, x)


def kernel_and_grad(
    kern: Kernel, params: Array, x: Array, *, config: Config = DEFAULT
) -> Tuple[Array, Array]:
    """Batched ``(K, dK)`` with dK layout ``[..., nhp, n, n]``
    (reference ``covar.py:184``)."""
    core = lambda p, xx: kern.matrix_and_grad(p, xx, config=config)
    return _batched(core, params, x)


def train_gram(
    kern: Kernel, params: Array, x: Array, config: Config = DEFAULT
) -> Array:
    """Unbatched train-block gram K(x, x), dispatching to the fused
    Pallas kernel when enabled and applicable (TPU, f32, canonical
    RBF+WhiteNoise).  Differentiable on both paths."""
    if config.use_pallas and x.dtype == jnp.float32:
        from pygpr_tpu.ops import pallas_kernels as pk

        if pk.matches_rbf_noise(kern) and pk.on_tpu():
            return pk.rbf_noise_gram(params, x)
    return kern.matrix(params, x, config=config)
