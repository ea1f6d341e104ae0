"""Distributed blocked Cholesky over a device mesh (SURVEY.md §5.7).

For a single expert whose kernel matrix exceeds one chip's HBM, the
reference has no answer at all (it is single-process CPU).  This is the
TPU-native one: **block-row sharding** of K over a mesh axis with a
fan-out right-looking factorization — the model-parallel (TP-analogue)
axis of SURVEY.md §2.10:

    per panel k (one panel per device row-band, B = n/D):
      1. the diagonal block is `psum`-broadcast (owner contributes, the
         rest contribute zeros) and factorized redundantly — a B×B
         Cholesky is cheap compared to one collective round-trip;
      2. every band computes its TRSM block L_ik = A_ik L_kk⁻ᵀ locally;
      3. the finished panel column is `all_gather`-ed so each band
         applies its trailing SYRK update with one local GEMM.

    Communication per factorization: D psums of B² + D all_gathers of
    n·B — O(n²) total, riding ICI; compute stays O(n³/D) per device.

Spurious trailing updates land only in the strictly-upper triangle
(rows of finished bands) and are zeroed at the end, which keeps every
step mask-free on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.parallel.mesh import EXPERT_AXIS

Array = jax.Array


def dist_cholesky(
    K: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    config: Config = DEFAULT,
) -> Array:
    """Cholesky of SPD ``K [n, n]`` block-row-sharded over ``axis``.

    ``n`` must be divisible by the axis size.  Input may be replicated
    or sharded; output is row-sharded (``P(axis)``) — keep it sharded
    for downstream distributed solves.
    """
    D = mesh.shape[axis]
    n = K.shape[-1]
    assert n % D == 0, "n must divide the mesh axis"
    B = n // D

    def local_fn(A):
        # A: [B, n] — this device's row band.
        idx = lax.axis_index(axis)

        def panel(k, A):
            # 1) broadcast + redundantly factorize the diagonal block
            my_block = lax.dynamic_slice(A, (0, k * B), (B, B))
            contrib = jnp.where(idx == k, my_block, jnp.zeros_like(my_block))
            Akk = lax.psum(contrib, axis)
            Lkk = lax.linalg.cholesky(Akk)

            # 2) local TRSM: X L_kkᵀ = A_ik  →  X = A_ik L_kk⁻ᵀ
            Aik = lax.dynamic_slice(A, (0, k * B), (B, B))
            Xik = lax.linalg.triangular_solve(
                Lkk, Aik, left_side=False, lower=True, transpose_a=True
            )
            # band k takes the factor itself; earlier bands are zero
            Lik = jnp.where(
                idx > k,
                Xik,
                jnp.where(idx == k, Lkk, jnp.zeros_like(Xik)),
            )
            A = lax.dynamic_update_slice(A, Lik, (0, k * B))

            # 3) gather the finished panel column, one trailing GEMM
            panel_col = lax.all_gather(Lik, axis)            # [D, B, B]
            panel_col = panel_col.reshape(n, B)
            U = jnp.matmul(
                Lik, panel_col.T, precision=config.precision
            )                                                 # [B, n]
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            trailing = cols >= (k + 1) * B
            return A - jnp.where(trailing, U, 0.0)

        A = lax.fori_loop(0, D, panel, A)
        # zero the strictly-upper triangle of this band
        rows = idx * B + jax.lax.broadcasted_iota(jnp.int32, (B, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
        return jnp.where(rows >= cols, A, 0.0)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(EXPERT_AXIS),) if axis == EXPERT_AXIS else (P(axis),),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(K)


def dist_cholesky_solve(
    L_sharded: Array,
    b: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    config: Config = DEFAULT,
) -> Array:
    """Solve ``K x = b`` given the row-sharded factor from
    :func:`dist_cholesky` — fully distributed block substitution, the
    factor never leaves its shards.

    Forward sweep (L z = b): band k solves its B×B diagonal block
    against ``b_k − acc_k`` and psum-broadcasts its z-block; every band
    folds the finished block into its local accumulator with one local
    matvec (upper-triangle blocks are zero, so no masking needed).
    Backward sweep (Lᵀ x = z) runs the bands in reverse, broadcasting
    each owner's ``Llocᵀ x_k`` contribution.  Communication is
    O(D·(B+n)) per solve vs the O(n²) of gathering the factor.
    """
    D = mesh.shape[axis]
    n = L_sharded.shape[-1]
    B = n // D

    def local_fn(Lloc, b):
        idx = lax.axis_index(axis)

        # ---- forward: L z = b -------------------------------------
        def fwd(k, carry):
            z, acc = carry
            bk = lax.dynamic_slice(b, (k * B,), (B,))
            Lkk = lax.dynamic_slice(Lloc, (0, k * B), (B, B))
            zk_loc = lax.linalg.triangular_solve(
                Lkk, (bk - acc)[:, None], left_side=True, lower=True
            )[:, 0]
            zk = lax.psum(
                jnp.where(idx == k, zk_loc, jnp.zeros_like(zk_loc)), axis
            )
            z = lax.dynamic_update_slice(z, zk, (k * B,))
            # bands ≤ k add a harmless zero/stale term (their block
            # column is upper-triangle-zero or their acc is done)
            Lik = lax.dynamic_slice(Lloc, (0, k * B), (B, B))
            acc = acc + jnp.matmul(Lik, zk, precision=config.precision)
            return z, acc

        z, _ = lax.fori_loop(
            0, D, fwd, (jnp.zeros_like(b), jnp.zeros((B,), b.dtype))
        )

        # ---- backward: Lᵀ x = z -----------------------------------
        def bwd(i, carry):
            x, r = carry
            k = D - 1 - i
            rk = lax.dynamic_slice(r, (k * B,), (B,))
            Lkk = lax.dynamic_slice(Lloc, (0, k * B), (B, B))
            xk_loc = lax.linalg.triangular_solve(
                Lkk, rk[:, None],
                left_side=True, lower=True, transpose_a=True,
            )[:, 0]
            xk = lax.psum(
                jnp.where(idx == k, xk_loc, jnp.zeros_like(xk_loc)), axis
            )
            x = lax.dynamic_update_slice(x, xk, (k * B,))
            # subtract band k's Lᵀ contribution from the running rhs
            contrib_loc = jnp.where(
                idx == k,
                jnp.matmul(Lloc.T, xk, precision=config.precision),
                jnp.zeros((n,), b.dtype),
            )
            r = r - lax.psum(contrib_loc, axis)
            return x, r

        x, _ = lax.fori_loop(0, D, bwd, (jnp.zeros_like(b), z))
        return x

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(L_sharded, b)


def dist_gram(
    kern,
    params: Array,
    x: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    config: Config = DEFAULT,
) -> Array:
    """Row-sharded train gram K(x, x) + jitter — no full K on any chip.

    Each band computes its rows as a cross-kernel against replicated x
    (``kern.matrix(params, x_full, xp=x_band)`` → ``[B, n]`` rows index
    the band).  The cross path misses diagonal-only terms (WhiteNoise
    returns a zero cross block, ``covar.py:242-243``), so the global
    diagonal is overwritten with ``kern.diag`` (the true train diagonal
    for any composition) plus the base jitter.
    """
    D = mesh.shape[axis]
    n = x.shape[0]
    assert n % D == 0
    B = n // D

    def gram_fn(xb, x_full):
        idx = lax.axis_index(axis)
        Kb = kern.matrix(params, x_full, xb, config=config)   # [B, n]
        dvals = kern.diag(params, xb, config=config)          # [B]
        rows = idx * B + jax.lax.broadcasted_iota(jnp.int32, (B, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
        jit = jnp.asarray(config.jitter, Kb.dtype)
        return jnp.where(rows == cols, dvals[:, None] + jit, Kb)

    return shard_map(
        gram_fn,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )(x, x)


def _dist_add_diag(
    gram: Array, extra: Array, mesh: Mesh, axis: str
) -> Array:
    """Add a scalar to the diagonal of a row-sharded gram **in shards**
    — no replicated n×n identity is ever materialized (this module
    exists for the doesn't-fit-one-chip regime)."""
    D = mesh.shape[axis]
    n = gram.shape[-1]
    B = n // D

    def add_fn(Aloc, extra):
        idx = lax.axis_index(axis)
        rows = idx * B + jax.lax.broadcasted_iota(jnp.int32, (B, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
        return jnp.where(rows == cols, Aloc + extra, Aloc)

    return shard_map(
        add_fn,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )(gram, extra)


def dist_cholesky_laddered(
    gram: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    config: Config = DEFAULT,
    factor_fn=None,
) -> Array:
    """Distributed Cholesky under the escalating jitter ladder.

    ``gram`` already carries the base jitter; on a non-finite factor the
    whole distributed factorization retries with an extra
    ``jitter·(10^k − 1)`` on the diagonal (so rung k totals
    ``jitter·10^k``, matching ``ops.linalg.safe_cholesky``).  The
    escalation adds the scalar to each shard's local diagonal — no
    replicated identity.

    ``factor_fn`` selects the schedule (default: the 1-D block-row
    :func:`dist_cholesky`; pass a closure over
    :func:`pygpr_tpu.parallel.dist_cyclic.dist_cholesky_cyclic` for the
    block-cyclic one — the scalar diagonal escalation is
    layout-invariant, so the ladder works unchanged for both).
    """
    dtype = gram.dtype
    base = jnp.asarray(config.jitter, dtype)
    if factor_fn is None:
        factor_fn = lambda g: dist_cholesky(  # noqa: E731
            g, mesh, axis=axis, config=config
        )

    def attempt(k):
        extra = base * ((10.0**k).astype(dtype) - 1.0)
        L = factor_fn(_dist_add_diag(gram, extra, mesh, axis))
        return L, jnp.all(jnp.isfinite(L))

    L0, ok0 = attempt(jnp.asarray(0, dtype))

    def cond(state):
        k, _, ok = state
        return jnp.logical_and(~ok, k < config.jitter_rungs - 1)

    def body(state):
        k, L, ok = state
        L2, ok2 = attempt((k + 1).astype(dtype))
        return k + 1, jnp.where(ok, L, L2), ok | ok2

    _, L, _ = lax.while_loop(cond, body, (jnp.asarray(0, dtype), L0, ok0))
    return L


def dist_cholesky_solve_cols(
    L_sharded: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    config: Config = DEFAULT,
) -> Array:
    """K⁻¹ from the row-sharded factor, returned **column-sharded**
    (``P(None, axis)``) — each device solves ``K X = I[:, band]`` for
    its own B identity columns, so the O(n³) inverse is spread evenly
    over the mesh and no device ever holds more than an [n, B] slab.

    Forward sweep (L Z = E): per panel k the column block of L
    (each band's local [B, B] slice) is ``all_gather``-ed — O(n·B)
    per step, O(n²) total — every device then runs one local
    triangular solve + one [n,B]×[B,B] GEMM on its own RHS slab.
    Backward sweep (Lᵀ X = Z): band k's rows are psum-broadcast from
    their owner and applied transposed.  Per-device compute is
    O(n²·B) = O(n³/D); this is the building block for the distributed
    NLML gradient (tr(K⁻¹ ∂K) needs K⁻¹ elementwise).
    """
    D = mesh.shape[axis]
    n = L_sharded.shape[-1]
    B = n // D

    def local_fn(Lloc):
        idx = lax.axis_index(axis)
        # this device's RHS slab: identity columns of its band
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, B), 0)
        cols = idx * B + jax.lax.broadcasted_iota(jnp.int32, (n, B), 1)
        E = (rows == cols).astype(Lloc.dtype)                # [n, B]

        # ---- forward: L Z = E -------------------------------------
        def fwd(k, R):
            Lblk = lax.dynamic_slice(Lloc, (0, k * B), (B, B))
            colk = lax.all_gather(Lblk, axis).reshape(n, B)  # [n, B]
            Lkk = lax.dynamic_slice(colk, (k * B, 0), (B, B))
            Rk = lax.dynamic_slice(R, (k * B, 0), (B, B))
            zk = lax.linalg.triangular_solve(
                Lkk, Rk, left_side=True, lower=True
            )
            # one update: clears rows of band k and eliminates the
            # trailing rows (rows above k·B multiply zero blocks)
            R = R - jnp.matmul(colk, zk, precision=config.precision)
            return lax.dynamic_update_slice(R, zk, (k * B, 0))

        Z = lax.fori_loop(0, D, fwd, E)

        # ---- backward: Lᵀ X = Z -----------------------------------
        def bwd(i, R):
            k = D - 1 - i
            band = lax.psum(
                jnp.where(idx == k, Lloc, jnp.zeros_like(Lloc)), axis
            )                                                # [B, n]
            Lkk = lax.dynamic_slice(band, (0, k * B), (B, B))
            Rk = lax.dynamic_slice(R, (k * B, 0), (B, B))
            xk = lax.linalg.triangular_solve(
                Lkk, Rk, left_side=True, lower=True, transpose_a=True
            )
            R = R - jnp.matmul(band.T, xk, precision=config.precision)
            return lax.dynamic_update_slice(R, xk, (k * B, 0))

        return lax.fori_loop(0, D, bwd, Z)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(L_sharded)


def _auto_cyclic_m(n: int, D: int, m_max: int = 4) -> int:
    """Largest power-of-two m ≤ m_max with n divisible by D·m."""
    m = 1
    while m * 2 <= m_max and n % (D * m * 2) == 0:
        m *= 2
    return m


def _factor_natural(kern, params, x, mesh, axis, config, schedule, m):
    """Row-sharded gram build + laddered factorization, returning the
    factor in NATURAL block-row order whichever schedule ran.

    ``schedule="cyclic"`` builds the gram directly in cyclic storage
    order (rows are just kernel evaluations against the permuted
    inputs — a permutation maps diagonal to diagonal, so the
    jitter/ladder diagonals are untouched), factorizes with the
    block-cyclic schedule (executed work ≈ 0.8·n³ vs the 1-D
    schedule's ~2n³, measured in docs/scaling.md), then permutes the
    factor back to natural order — an O(n²) reshuffle, the same order
    as the panel all-gathers the factorization itself already does —
    so the proven distributed solves and the analytic gradient run
    unchanged downstream.
    """
    if schedule == "cyclic":
        import numpy as np

        from pygpr_tpu.parallel import dist_cyclic

        D = mesh.shape[axis]
        n = x.shape[0]
        if m is None:
            m = _auto_cyclic_m(n, D)
        perm = dist_cyclic.cyclic_permutation(n, D, m)
        x_cyc = jnp.asarray(x)[jnp.asarray(perm)]
        gram = dist_gram(
            kern, params, x_cyc, mesh, axis=axis, config=config
        )
        L_cyc = dist_cholesky_laddered(
            gram, mesh, axis=axis, config=config,
            factor_fn=lambda g: dist_cyclic.dist_cholesky_cyclic(
                g, mesh, axis=axis, m=m, config=config
            ),
        )
        inv = jnp.asarray(np.argsort(perm))
        L = L_cyc[inv][:, inv]
        sh = jax.sharding.NamedSharding(mesh, P(axis))
        if isinstance(L, jax.core.Tracer):
            return jax.lax.with_sharding_constraint(L, sh)
        return jax.device_put(L, sh)
    gram = dist_gram(kern, params, x, mesh, axis=axis, config=config)
    return dist_cholesky_laddered(gram, mesh, axis=axis, config=config)


def _dist_nlml_value(
    kern, params, x, y, mesh, axis, config,
    schedule="block_row", m=None,
):
    import math

    D = mesh.shape[axis]
    n = x.shape[0]
    B = n // D

    L = _factor_natural(
        kern, params, x, mesh, axis, config, schedule, m
    )
    w = dist_cholesky_solve(L, y, mesh, axis=axis, config=config)

    def logdiag_fn(Lloc):
        idx = lax.axis_index(axis)
        rows = idx * B + jax.lax.broadcasted_iota(jnp.int32, (B, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
        diag = jnp.where(rows == cols, Lloc, 1.0)
        return lax.psum(jnp.sum(jnp.log(diag)), axis)

    half_logdet = shard_map(
        logdiag_fn,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(),
        check_vma=False,
    )(L)

    value = (
        0.5 * jnp.dot(w, y)
        + half_logdet
        + 0.5 * n * math.log(2.0 * math.pi)
    )
    return value, L, w


def _dist_nlml_grad(kern, params, x, y, L, w, mesh, axis, config):
    """Distributed analytic NLML gradient (reference closed form
    ``loss.py:84``): ∂/∂θₖ = −½ (wᵀ(∂K/∂θₖ)w − tr(K⁻¹ ∂K/∂θₖ)).

    ∂K/∂θ is built row-sharded by forward-mode AD of the band's gram
    rows (kernel-agnostic, nhp passes); K⁻¹ comes column-sharded from
    :func:`dist_cholesky_solve_cols`; both trace terms reduce with one
    psum each.  Everything a device touches is an [n, B]/[B, n] slab.
    """
    D = mesh.shape[axis]
    n = x.shape[0]
    B = n // D

    def band_gram(p, xb, x_full, idx):
        Kb = kern.matrix(p, x_full, xb, config=config)        # [B, n]
        dvals = kern.diag(p, xb, config=config)
        rows = idx * B + jax.lax.broadcasted_iota(jnp.int32, (B, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
        jit = jnp.asarray(config.jitter, Kb.dtype)
        return jnp.where(rows == cols, dvals[:, None] + jit, Kb)

    def local_fn(Kinv_cols, xb, x_full, w, p):
        idx = lax.axis_index(axis)
        # dK rows of this band: [nhp, B, n] via jacfwd over params
        dK = jax.jacfwd(
            lambda q: band_gram(q, xb, x_full, idx)
        )(p)                                                  # [B, n, nhp]
        dK = jnp.moveaxis(dK, -1, 0)                          # [nhp, B, n]

        wb = lax.dynamic_slice(w, (idx * B,), (B,))
        # tr1ₖ = wᵀ dKₖ w  (this band's rows, psum over bands)
        tr1 = lax.psum(
            jnp.einsum("i,kij,j->k", wb, dK, w), axis
        )
        # tr2ₖ = Σᵢⱼ (K⁻¹)ᵢⱼ (dKₖ)ᵢⱼ: device holds K⁻¹[:, band]
        # ([n, B]) and its band's dK rows; by symmetry
        # dKₖ[:, band] = dKₖ[band, :]ᵀ.
        tr2 = lax.psum(
            jnp.einsum("ij,kji->k", Kinv_cols, dK), axis
        )
        return -0.5 * (tr1 - tr2)

    Kinv = dist_cholesky_solve_cols(L, mesh, axis=axis, config=config)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(Kinv, x, x, w, params)


def dist_nlml(
    kern,
    params: Array,
    x: Array,
    y: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    config: Config = DEFAULT,
    schedule: str = "cyclic",
    m: int = None,
) -> Array:
    """NLML of one large expert with the gram build AND factorization
    distributed over ``axis`` (the "model-parallel" GP path): reference
    formula ``loss.py:49-51`` with a psum-reduced log-det.

    **Differentiable in ``params``** via a custom VJP that evaluates the
    reference's analytic gradient (``loss.py:84``) with distributed
    solves (:func:`dist_cholesky_solve_cols`) — reverse-mode AD cannot
    see through the laddered ``while_loop``, and the analytic form keeps
    every per-device buffer at [n, B].  The chosen jitter rung is
    treated as locally constant, matching ``ops.linalg.safe_cholesky``.

    ``schedule`` picks the factorization schedule: ``"cyclic"``
    (default — the block-cyclic recursion of
    ``parallel/dist_cyclic.py``, measured ~1.7× faster than the 1-D
    schedule at n=1024/D=8, docs/scaling.md) or ``"block_row"`` (the
    simpler 1-D fan-out).  ``m`` is the cyclic blocks-per-device
    (power of two; ``None`` = largest ≤ 4 dividing n/D).
    """

    @jax.custom_vjp
    def f(p):
        value, _, _ = _dist_nlml_value(
            kern, p, x, y, mesh, axis, config, schedule, m
        )
        return value

    def f_fwd(p):
        value, L, w = _dist_nlml_value(
            kern, p, x, y, mesh, axis, config, schedule, m
        )
        return value, (p, L, w)

    def f_bwd(res, g):
        p, L, w = res
        grad = _dist_nlml_grad(kern, p, x, y, L, w, mesh, axis, config)
        return (g * grad,)

    f.defvjp(f_fwd, f_bwd)
    return f(params)
