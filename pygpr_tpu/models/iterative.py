"""Matrix-free iterative exact GP — blocked matvec + PCG + SLQ logdet.

Beyond the reference: PyGPR's exact path materializes the n×n gram and
factorizes it with LAPACK (``/root/reference/PyGPR/gpr.py:67-69``,
``loss.py:96-97``), capping exact GPR at the memory/O(n³) wall; its
only escape is the grBCM committee (``gr_bcm.py``).  This module is the
third large-N strategy of this engine (committee ``models/grbcm.py``,
low-rank ``models/sgpr.py``, and now *iterative exact*): Krylov methods
on a **matrix-free** gram operator, the GPyTorch/mBCG recipe re-designed
for TPU:

  * :func:`gram_matvec` streams ``(K + σₙ²I)·V`` through HBM in
    ``block×n`` tiles under ``lax.map`` — each tile is one fused
    distance→exp→GEMM chain on the MXU and the n×n gram NEVER exists in
    memory (n = 262,144 needs 275 GB dense f32; the matvec needs the
    ``[block, n]`` tile only).
  * :func:`cg_solve` — batched preconditioned conjugate gradients in a
    ``lax.while_loop`` (one XLA program, all right-hand sides advance in
    lock-step as a single ``[n, k]`` GEMM pipeline).
  * :func:`pivoted_cholesky` / :func:`make_preconditioner` — on-device
    partial pivoted Cholesky ``K ≈ LᵀL`` (rank r) turned into a Woodbury
    preconditioner ``P = σₙ²I + LᵀL`` with O(nr) apply, its inverse
    square root, and an exact ``log|P|``.
  * :func:`slq_logdet` — stochastic Lanczos quadrature on the whitened
    operator ``M = P^{-1/2} K P^{-1/2}``:
    ``log|K| = log|P| + tr log M``, with ``tr log M`` estimated from
    Rademacher probes and the eigen-decomposition of the small Lanczos
    tridiagonals (fully reorthogonalized; m ≤ ~30).
  * :func:`nlml_value_and_grad` — the Hutchinson estimator of the NLML
    gradient with **no O(n³) term anywhere**:
    ``∂/∂θ ≈ −½ αᵀ(∂K)α + (1/2p) Σᵢ uᵢᵀ(∂K)zᵢ`` with ``α = K⁻¹y`` and
    ``uᵢ = K⁻¹zᵢ`` from ONE batched CG; the ``(∂K)``-contractions come
    from ``jax.grad`` of a two-matvec surrogate (reference analytic
    form: ``loss.py:107-121``).

Probes are **host-generated NumPy** (:func:`make_probes`) and passed as
arrays: device-side threefry compiles for minutes over the remote-TPU
tunnel, and fixed probes make the fit objective deterministic (common
random numbers), which is what lets a plain Adam loop converge.

Conventions follow ``models/sgpr.py``: the kernel is the noise-free
signal kernel, ``params = [θ_kernel…, σₙ]`` packed, predictive variance
includes σₙ² (house convention, ``gpr.py:96-120``).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models.sgpr import _check_noise_free, init_params  # noqa: F401
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array

__all__ = [
    "gram_matvec",
    "cross_matvec",
    "pivoted_cholesky",
    "Preconditioner",
    "make_preconditioner",
    "cg_solve",
    "slq_logdet",
    "make_probes",
    "nlml_value_and_grad",
    "fit",
    "predict",
    "IterativeGP",
    "init_params",
]


def make_probes(n: int, num: int = 16, seed: int = 0) -> np.ndarray:
    """Host-side Rademacher probe matrix ``[n, num]`` (float32).

    NumPy on purpose — see module docstring; convert with
    ``jnp.asarray`` at the jit boundary.
    """
    rng = np.random.default_rng(seed)
    return (
        2.0 * rng.integers(0, 2, size=(n, num)) - 1.0
    ).astype(np.float32)


def _blocked_rows(
    kern: Kernel,
    theta: Array,
    rows: Array,
    x: Array,
    v: Array,
    block: int,
    config: Config,
) -> Array:
    """``K(rows, x) @ v`` streamed in ``[block, n]`` tiles.

    ``rows: [m, d]``, ``x: [n, d]``, ``v: [n, k]`` → ``[m, k]``.
    ``lax.map`` keeps exactly one tile live; each tile is one
    MXU-dominated distance+GEMM chain.  Row padding is sliced off the
    output, so pad values are irrelevant.
    """
    m = rows.shape[0]
    nb = -(-m // block)
    pad = nb * block - m
    rows_p = jnp.pad(rows, ((0, pad), (0, 0)))
    tiles = rows_p.reshape(nb, block, rows.shape[-1])

    def body(tile):
        # matrix(θ, x, xp) rows index xp (reference orientation,
        # covar.py:119) — so the tile goes in the xp slot.
        kb = kern.matrix(theta, x, tile, config=config)  # [block, n]
        return jnp.matmul(kb, v, precision=config.precision)

    out = lax.map(body, tiles).reshape(nb * block, v.shape[-1])
    return out[:m]


def gram_matvec(
    kern: Kernel,
    params: Array,
    x: Array,
    v: Array,
    *,
    block: int = 2048,
    config: Config = DEFAULT,
) -> Array:
    """Matrix-free ``(K_signal(x,x) + (σₙ² + jitter)·I) @ v``.

    ``v`` may be ``[n]`` or ``[n, k]``.  Differentiable in ``params``
    (the gradient path the Hutchinson surrogate uses) — the tile loop
    is a ``lax.map`` scan, which JAX transposes block-by-block, so the
    VJP is matrix-free too.

    With ``Config(use_pallas=True)`` and a bare f32 RBF kernel the
    matvec runs the fused Pallas kernel (``ops/pallas_matvec.py``):
    distance→exp→tile@V entirely in VMEM, one HBM pass instead of the
    XLA path's materialize-tile-then-GEMM two passes.
    """
    theta, sn = params[..., :-1], params[..., -1]
    sn2 = sn * sn + jnp.asarray(config.jitter, x.dtype)
    vec = v.ndim == 1
    v2 = v[:, None] if vec else v
    if config.use_pallas:
        from pygpr_tpu.ops import pallas_matvec

        if pallas_matvec.supported(kern, x):
            out = pallas_matvec.rbf_gram_matvec(theta, x, v2) + sn2 * v2
            return out[:, 0] if vec else out
    out = _blocked_rows(kern, theta, x, x, v2, block, config) + sn2 * v2
    return out[:, 0] if vec else out


def cross_matvec(
    kern: Kernel,
    params: Array,
    xp: Array,
    x: Array,
    v: Array,
    *,
    block: int = 2048,
    config: Config = DEFAULT,
) -> Array:
    """Matrix-free ``K(xp, x) @ v`` (signal kernel only — the cross
    block carries no observation noise, reference ``covar.py:242-243``).
    """
    theta = params[..., :-1]
    vec = v.ndim == 1
    v2 = v[:, None] if vec else v
    out = _blocked_rows(kern, theta, xp, x, v2, block, config)
    return out[:, 0] if vec else out


def pivoted_cholesky(
    kern: Kernel,
    theta: Array,
    x: Array,
    rank: int,
    *,
    config: Config = DEFAULT,
    return_pivots: bool = False,
):
    """Partial pivoted Cholesky ``K_signal ≈ LᵀL`` with ``L: [rank, n]``.

    Greedy diagonal pivoting (Harbrecht et al.; the GPyTorch
    preconditioner).  Each of the ``rank`` steps evaluates ONE kernel
    row — O(rank·n·d) total, no n×n matrix.  Entirely on-device
    (``fori_loop`` with a static trip count) so it jits into the same
    program as the CG solve that consumes it.

    ``return_pivots=True`` additionally returns the pivot indices
    ``[rank]`` — the greedily most-informative points, used as the
    inducing-point initializer (``sgpr.init_inducing_pivoted``).
    """
    n = x.shape[0]
    diag = kern.diag(theta, x, config=config)
    L0 = jnp.zeros((rank, n), x.dtype)
    piv0 = jnp.zeros((rank,), jnp.int32)
    eps = jnp.asarray(1e-12, x.dtype)

    def body(i, carry):
        L, dres, pivs = carry
        p = jnp.argmax(dres)
        xp_row = jnp.take(x, p, axis=0)[None]               # [1, d]
        row = kern.matrix(theta, x, xp_row, config=config)[0]  # [n]
        lcol = jnp.take(L, p, axis=1)                       # [rank]
        row = row - jnp.matmul(
            lcol, L, precision=config.precision
        )
        piv = jnp.maximum(jnp.take(dres, p), eps)
        l = row / jnp.sqrt(piv)
        L = L.at[i].set(l)
        dres = jnp.maximum(dres - jnp.square(l), 0.0)
        return L, dres, pivs.at[i].set(p.astype(jnp.int32))

    L, _, pivs = lax.fori_loop(0, rank, body, (L0, diag, piv0))
    if return_pivots:
        return L, pivs
    return L


class Preconditioner(NamedTuple):
    """Woodbury form of ``P = σₙ²I + LᵀL`` from the pivoted Cholesky.

    Diagonalized once (``LLᵀ = W S² Wᵀ``, ``V = LᵀW S⁻¹`` orthonormal)
    so that inverse, inverse square root, and log-determinant are all
    O(n·r) closed forms — ``P = σₙ²I + V S² Vᵀ``.
    """

    v: Array            #: [n, r] orthonormal columns (zeroed if s²≈0)
    s2: Array           #: [r] eigenvalues of LLᵀ (≥ 0)
    sn2: Array          #: scalar noise variance
    half_logdet: Array  #: ½ log|P| (exact)

    def apply_inv(self, u: Array) -> Array:
        """``P⁻¹u = (u − V diag(s²/(σₙ²+s²)) Vᵀu) / σₙ²``.

        HIGHEST-precision GEMMs are load-bearing: with default (bf16)
        MXU passes the ~1e-3 projection error is amplified by 1/σₙ²,
        the apply becomes nonlinear at a scale PCG can feel, and CG
        stalls or diverges on TPU (observed at n=16k, σₙ≈0.08) while
        the identical f32 math converges on CPU.
        """
        coef = self.s2 / (self.sn2 + self.s2)
        hp = lax.Precision.HIGHEST
        proj = jnp.matmul(self.v.T, u, precision=hp) if u.ndim > 1 \
            else jnp.matmul(self.v.T, u[:, None], precision=hp)[:, 0]
        w = coef[:, None] * proj if u.ndim > 1 else coef * proj
        if u.ndim > 1:
            return (u - jnp.matmul(self.v, w, precision=hp)) / self.sn2
        return (u - jnp.matmul(self.v, w[:, None], precision=hp)[:, 0]
                ) / self.sn2

    def apply_inv_sqrt(self, u: Array) -> Array:
        """``P^{-1/2}u`` — symmetric, used to whiten the SLQ operator."""
        coef = jnp.sqrt(self.sn2 / (self.sn2 + self.s2)) - 1.0
        hp = lax.Precision.HIGHEST
        proj = jnp.matmul(self.v.T, u, precision=hp) if u.ndim > 1 \
            else jnp.matmul(self.v.T, u[:, None], precision=hp)[:, 0]
        w = coef[:, None] * proj if u.ndim > 1 else coef * proj
        if u.ndim > 1:
            return (u + jnp.matmul(self.v, w, precision=hp)
                    ) / jnp.sqrt(self.sn2)
        return (u + jnp.matmul(self.v, w[:, None], precision=hp)[:, 0]
                ) / jnp.sqrt(self.sn2)


def make_preconditioner(L: Array, sn2: Array, n: int) -> Preconditioner:
    """Build the Woodbury preconditioner from ``L: [r, n]``.

    ``log|P| = (n − r)·log σₙ² + Σₖ log(σₙ² + s²ₖ)`` — exact, so the SLQ
    estimator only has to handle the benign whitened spectrum.
    """
    r = L.shape[0]
    G = jnp.matmul(L, L.T, precision=lax.Precision.HIGHEST)
    s2, W = jnp.linalg.eigh(G)
    s2 = jnp.maximum(s2, 0.0)
    good = s2 > 1e-10 * jnp.maximum(jnp.max(s2), 1e-30)
    inv_s = jnp.where(
        good, 1.0 / jnp.sqrt(jnp.where(good, s2, 1.0)), 0.0
    )
    V = jnp.matmul(L.T, W * inv_s, precision=lax.Precision.HIGHEST)
    s2 = jnp.where(good, s2, 0.0)
    half_logdet = 0.5 * (
        (n - r) * jnp.log(sn2) + jnp.sum(jnp.log(sn2 + s2))
    )
    return Preconditioner(V, s2, sn2, half_logdet)


def cg_solve(
    matvec: Callable[[Array], Array],
    b: Array,
    *,
    precond_inv: Optional[Callable[[Array], Array]] = None,
    tol: float = 1e-6,
    max_iter: int = 512,
) -> Tuple[Array, Array]:
    """Batched preconditioned CG: solve ``A X = B`` for SPD ``A``.

    ``b: [n, k]`` — all k systems advance in lock-step so every
    iteration is one batched matvec (the TPU-efficient shape; the
    reference's LAPACK ``cholesky_solve`` analogue is ``loss.py:102``).
    Stops when every column satisfies ``‖r‖ ≤ tol·‖b‖``.  Returns
    ``(X, iterations)``.
    """
    minv = precond_inv if precond_inv is not None else (lambda u: u)
    bnorm = jnp.sqrt(jnp.sum(jnp.square(b), axis=0))
    target = tol * jnp.maximum(bnorm, 1e-30)
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = minv(r0)
    rz0 = jnp.sum(r0 * z0, axis=0)

    def cond(st):
        it, _, r, _, _ = st
        rn = jnp.sqrt(jnp.sum(jnp.square(r), axis=0))
        return (it < max_iter) & jnp.any(rn > target)

    def body(st):
        it, x, r, d, rz = st
        q = matvec(d)
        dq = jnp.sum(d * q, axis=0)
        alpha = jnp.where(dq > 0, rz / jnp.maximum(dq, 1e-30), 0.0)
        x = x + alpha * d
        r = r - alpha * q
        z = minv(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-30), 0.0)
        d = z + beta * d
        return it + 1, x, r, d, rz_new

    it, x, _, _, _ = lax.while_loop(
        cond, body, (jnp.int32(0), x0, r0, z0, rz0)
    )
    return x, it


def _lanczos_tridiag(
    matvec: Callable[[Array], Array], z: Array, m: int
) -> Tuple[Array, Array]:
    """Batched Lanczos with full reorthogonalization.

    ``z: [n, p]`` start probes → tridiagonal coefficients
    ``alphas [m, p]``, ``betas [m−1, p]``.  The Q history is
    ``[m, n, p]`` — SLQ needs only m ≈ 10–30 steps, so this stays small
    next to the matvec cost, and reorthogonalizing keeps the Ritz
    values honest in f32.
    """
    n, p = z.shape
    v = z / jnp.sqrt(jnp.sum(jnp.square(z), axis=0))
    Q0 = jnp.zeros((m, n, p), z.dtype)
    alphas0 = jnp.zeros((m, p), z.dtype)
    betas0 = jnp.zeros((m, p), z.dtype)

    def body(j, carry):
        Q, alphas, betas, v, v_prev, beta_prev = carry
        Q = Q.at[j].set(v)
        w = matvec(v) - beta_prev * v_prev
        alpha = jnp.sum(v * w, axis=0)
        w = w - alpha * v
        # full reorthogonalization against all stored vectors (zero
        # rows beyond j contribute nothing)
        # HIGHEST precision: bf16 reorthogonalization leaves O(1e-3)
        # residual overlap, which breaks the tridiagonal's eigenvalues
        proj = jnp.einsum(
            "mnp,np->mp", Q, w, precision=lax.Precision.HIGHEST
        )
        w = w - jnp.einsum(
            "mnp,mp->np", Q, proj, precision=lax.Precision.HIGHEST
        )
        beta = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(w), axis=0), 0.0))
        v_next = w / jnp.maximum(beta, 1e-30)
        alphas = alphas.at[j].set(alpha)
        betas = betas.at[j].set(beta)  # row m−1 unused below
        return Q, alphas, betas, v_next, v, beta

    init = (Q0, alphas0, betas0, v, jnp.zeros_like(v), jnp.zeros((p,), z.dtype))
    _, alphas, betas, _, _, _ = lax.fori_loop(0, m, body, init)
    return alphas, betas[: m - 1]


def slq_logdet(
    matvec: Callable[[Array], Array],
    probes: Array,
    *,
    num_lanczos: int = 20,
) -> Array:
    """Stochastic Lanczos quadrature estimate of ``tr log A``.

    ``tr log A ≈ (1/p) Σᵢ ‖zᵢ‖² · e₁ᵀ log(Tᵢ) e₁`` with ``Tᵢ`` the
    Lanczos tridiagonal of probe ``zᵢ`` (Ubaru–Chen–Saad).  The ``Tᵢ``
    are m×m — their eigen-decomposition is trivially small.
    """
    m = num_lanczos
    alphas, betas = _lanczos_tridiag(matvec, probes, m)     # [m,p],[m-1,p]
    p = probes.shape[1]
    T = (
        jnp.zeros((p, m, m), probes.dtype)
        + alphas.T[:, :, None] * jnp.eye(m, dtype=probes.dtype)
    )
    off = jnp.arange(m - 1)
    T = T.at[:, off, off + 1].set(betas.T)
    T = T.at[:, off + 1, off].set(betas.T)
    evals, evecs = jnp.linalg.eigh(T)
    evals = jnp.maximum(evals, 1e-30)
    weights = jnp.square(evecs[:, 0, :])                     # [p, m]
    quad = jnp.sum(weights * jnp.log(evals), axis=-1)        # [p]
    znorm2 = jnp.sum(jnp.square(probes), axis=0)
    return jnp.mean(znorm2 * quad)


def _default_matvec(kern, x, block, config):
    """The single-device matvec factory: ``mv(params, v)``."""
    return lambda p, v: gram_matvec(
        kern, p, x, v, block=block, config=config
    )


def _solver_pieces(kern, params, x, rank, block, config, matvec=None):
    """Preconditioner + matvec closures at STOPPED-gradient params —
    solver internals are implementation detail, not part of the
    differentiated objective.  ``matvec(params, v)`` may be injected
    (e.g. the mesh-sharded one, ``parallel/iterative_dp.py``)."""
    if matvec is None:
        matvec = _default_matvec(kern, x, block, config)
    p_sg = lax.stop_gradient(params)
    sn = p_sg[-1]
    sn2 = sn * sn + jnp.asarray(config.jitter, x.dtype)
    L = pivoted_cholesky(kern, p_sg[:-1], x, rank, config=config)
    pre = make_preconditioner(L, sn2, x.shape[0])
    mv = lambda v: matvec(p_sg, v)
    return pre, mv, matvec


def nlml_value_and_grad(
    kern: Kernel,
    params: Array,
    x: Array,
    y: Array,
    probes: Array,
    *,
    rank: int = 64,
    num_lanczos: int = 20,
    cg_tol: float = 1e-5,
    max_cg: int = 512,
    block: int = 2048,
    config: Config = DEFAULT,
    matvec: Optional[Callable[[Array, Array], Array]] = None,
) -> Tuple[Array, Array]:
    """Estimated NLML value and gradient with no O(n³) step.

    Value: ``½yᵀα + ½(log|P| + tr log P^{-1/2}KP^{-1/2}) + ½n log 2π``
    (exact quadratic term via CG, SLQ-estimated logdet — the dense
    counterpart is ``loss.py:107-109``).

    Gradient: Hutchinson estimator (dense counterpart
    ``loss.py:116-121``) via ``jax.grad`` of the two-matvec surrogate
    ``s(θ) = −½ α̂ᵀK(θ)α̂ + (1/2p) Σᵢ ûᵢᵀK(θ)ẑᵢ`` with ``α̂, ûᵢ``
    stop-gradiented CG solutions — unbiased for ∂NLML/∂θ given exact
    solves.
    """
    _check_noise_free(kern)
    n = y.shape[0]
    pre, mv, matvec = _solver_pieces(
        kern, params, x, rank, block, config, matvec
    )

    B = jnp.concatenate([y[:, None], probes], axis=1)
    sol, _ = cg_solve(
        mv, B, precond_inv=pre.apply_inv, tol=cg_tol, max_iter=max_cg
    )
    sol = lax.stop_gradient(sol)
    alpha, U = sol[:, 0], sol[:, 1:]

    white = lambda v: pre.apply_inv_sqrt(mv(pre.apply_inv_sqrt(v)))
    tr_log_m = slq_logdet(white, probes, num_lanczos=num_lanczos)
    value = (
        0.5 * jnp.dot(y, alpha, precision=lax.Precision.HIGHEST)
        + pre.half_logdet
        + 0.5 * tr_log_m
        + 0.5 * n * math.log(2.0 * math.pi)
    )

    num_probes = probes.shape[1]

    def surrogate(p):
        k_alpha = matvec(p, alpha)
        k_z = matvec(p, probes)
        quad = -0.5 * jnp.dot(alpha, k_alpha, precision=lax.Precision.HIGHEST)
        trace = 0.5 * jnp.sum(U * k_z) / num_probes
        return quad + trace

    grad = jax.grad(surrogate)(params)
    return value, grad


def fit(
    kern: Kernel,
    params0: Array,
    x: Array,
    y: Array,
    probes: Array,
    *,
    rank: int = 64,
    num_lanczos: int = 20,
    cg_tol: float = 1e-4,
    max_cg: int = 256,
    block: int = 2048,
    learning_rate: float = 0.05,
    iters: int = 100,
    config: Config = DEFAULT,
    matvec: Optional[Callable[[Array, Array], Array]] = None,
):
    """Adam in log-space on the estimated NLML gradient.

    Fixed probes = common random numbers, so the trajectory is
    deterministic; Adam (not L-BFGS) because the gradient is a
    stochastic estimate and the value/grad pair is not an AD-consistent
    scalar function.  One XLA program (``lax.scan``).  Returns
    ``(params, nlml_trace)``.
    """
    import optax

    _check_noise_free(kern)
    u0 = jnp.log(jnp.abs(params0))
    opt = optax.adam(learning_rate)

    def step(carry, _):
        u, ostate = carry
        p = jnp.exp(u)
        v, g = nlml_value_and_grad(
            kern, p, x, y, probes,
            rank=rank, num_lanczos=num_lanczos,
            cg_tol=cg_tol, max_cg=max_cg, block=block, config=config,
            matvec=matvec,
        )
        gu = g * p  # d/d(log p)
        upd, ostate = opt.update(gu, ostate, u)
        u = optax.apply_updates(u, upd)
        return (u, ostate), v

    (u, _), trace = lax.scan(step, (u0, opt.init(u0)), None, length=iters)
    return jnp.exp(u), trace


def predict(
    kern: Kernel,
    params: Array,
    x: Array,
    y: Array,
    xp: Array,
    *,
    var: str = "diag",
    rank: int = 64,
    cg_tol: float = 1e-6,
    max_cg: int = 512,
    block: int = 2048,
    query_chunk: int = 256,
    config: Config = DEFAULT,
) -> Tuple[Array, Optional[Array]]:
    """Matrix-free posterior mean and diagonal variance.

    Mean ``= K*ᵀ K⁻¹ y`` (reference ``gpr.py:80-83``) costs one CG
    solve + one cross matvec.  Diagonal variance (``gpr.py:96-106``)
    needs ``K⁻¹k*`` per query — solved by batched CG over query chunks
    of ``query_chunk`` right-hand sides under ``lax.map``.  Variance
    includes σₙ² (house convention).  ``var="full"`` is deliberately
    unsupported here: an nq×nq dense posterior defeats the matrix-free
    point — use ``models/exact_gp.py`` for small nq.
    """
    _check_noise_free(kern)
    if var == "full":
        raise ValueError(
            "iterative.predict is matrix-free; full posterior "
            "covariance is dense — use models.exact_gp for that."
        )
    pre, mv, _ = _solver_pieces(kern, params, x, rank, block, config)
    alpha, _ = cg_solve(
        mv, y[:, None], precond_inv=pre.apply_inv,
        tol=cg_tol, max_iter=max_cg,
    )
    mean = cross_matvec(
        kern, params, xp, x, alpha[:, 0], block=block, config=config
    )
    if var == "none":
        return mean, None

    theta, sn = params[..., :-1], params[..., -1]
    sn2 = sn * sn + jnp.asarray(config.jitter, x.dtype)
    nq = xp.shape[0]
    nb = -(-nq // query_chunk)
    pad = nb * query_chunk - nq
    xp_p = jnp.pad(xp, ((0, pad), (0, 0)))
    chunks = xp_p.reshape(nb, query_chunk, xp.shape[-1])

    def chunk_var(q):
        ks = kern.matrix(theta, x, q, config=config)        # [c, n]
        w, _ = cg_solve(
            mv, ks.T, precond_inv=pre.apply_inv,
            tol=cg_tol, max_iter=max_cg,
        )                                                    # [n, c]
        kd = kern.diag(theta, q, config=config)
        return kd - jnp.sum(ks.T * w, axis=0) + sn2

    v = lax.map(chunk_var, chunks).reshape(nb * query_chunk)[:nq]
    # the exact predictive variance is ≥ σₙ² (Schur complement of a PSD
    # block matrix); flooring there absorbs CG truncation error, which
    # otherwise lets k*ᵀw overshoot k** near training points
    return mean, jnp.maximum(v, sn2)


class IterativeGP:
    """Stateful wrapper in the house OO style (cf. :class:`ExactGP`,
    :class:`SGPR`).

    >>> model = IterativeGP(x, y, RBF(), num_probes=16)
    >>> model.train(iters=80)
    >>> mean, var = model.predict(xs)
    """

    def __init__(
        self,
        x,
        y,
        cov: Kernel,
        *,
        num_probes: int = 16,
        rank: int = 64,
        block: int = 2048,
        seed: int = 0,
        config: Config = DEFAULT,
    ):
        _check_noise_free(cov)
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.cov = cov
        self.config = config
        self.rank = rank
        self.block = block
        self._seed = seed
        self.probes = jnp.asarray(
            make_probes(self.x.shape[0], num_probes, seed),
            dtype=self.x.dtype,
        )
        self.params = init_params(cov, self.x, config)

    def set_params(self, params) -> None:
        self.params = jnp.asarray(params)

    def set_data(self, x, y) -> None:
        """Rebind training data (``gpr.py:28-31`` contract); probes are
        regenerated at the new n with the stored seed."""
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        if self.probes.shape[0] != self.x.shape[0]:
            self.probes = jnp.asarray(
                make_probes(
                    self.x.shape[0], self.probes.shape[1], self._seed
                ),
                dtype=self.x.dtype,
            )

    def nlml(self) -> Array:
        v, _ = nlml_value_and_grad(
            self.cov, self.params, self.x, self.y, self.probes,
            rank=self.rank, block=self.block, config=self.config,
        )
        return v

    def train(
        self,
        iters: Optional[int] = None,
        learning_rate: float = 0.05,
        max_iter: Optional[int] = None,
        **kw,
    ):
        """Adam fit; ``max_iter`` is accepted as an alias for ``iters``
        (the house OO-wrapper spelling, cf. ``SGPR.train``)."""
        iters = iters if iters is not None else (max_iter or 100)
        params, trace = fit(
            self.cov, self.params, self.x, self.y, self.probes,
            rank=self.rank, block=self.block,
            learning_rate=learning_rate, iters=iters,
            config=self.config, **kw,
        )
        self.params = params
        return trace

    def predict(self, xp, var: str = "diag"):
        return predict(
            self.cov, self.params, self.x, self.y, jnp.asarray(xp),
            var=var, rank=self.rank, block=self.block,
            config=self.config,
        )
