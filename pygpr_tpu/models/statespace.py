"""State-space (Kalman) GP: exact O(n) inference for 1-D Matérn GPs,
parallelized to O(log n) depth with ``jax.lax.associative_scan``.

A 1-D GP with a Matérn-ν kernel is exactly a linear-Gaussian
state-space model (Hartikainen & Särkkä 2010): the kernel's SDE has a
d-dimensional state (d = ν + ½ ∈ {1, 2, 3}), so Kalman filtering gives
the EXACT marginal likelihood and posterior in O(n·d³) — against the
dense pipeline's O(n³).  A million-point time series factorizes in
device milliseconds.

The classic filter is a sequential recursion — the worst possible
shape for a TPU (10⁶ dependent tiny steps).  This module therefore
implements BOTH:

  * :func:`_filter_seq` / :func:`_smooth_seq` — textbook ``lax.scan``
    recursions, the correctness oracle;
  * the **parallel-scan filter/smoother** (Särkkä & García-Fernández,
    IEEE TAC 2021): filtering rewritten as an associative operation on
    per-step elements (A, b, C, η, J) combined by
    ``jax.lax.associative_scan`` in log₂n parallel rounds — the
    TPU-native formulation and the production path.

**Layout is the TPU story here**: a [n, d, d] stack of tiny matrices
pads each d×d block to an (8,128) tile — a 64× HBM expansion that OOMs
one chip at n = 10⁶.  Everything below therefore carries matrices as
``[d, d, n]`` (state dims leading, time on the 128-lane axis): all
matrix algebra is d²-unrolled elementwise VPU work over n lanes, with
closed-form d ≤ 3 inverses instead of ``linalg.solve``.  That layout
is what lets a million-step exact filter fit in ~100 MB.

Exactness anchors (tested): ``nlml_ss`` equals the dense
``likelihood.nlml`` with ``Sum((Matern(ν), WhiteNoise))`` to f64
round-off, and the smoothed posterior equals the dense exact-GP
predict — same inverse-lengthscale convention (``r = ℓ|t−t′|``,
``ops/kernels.py::Matern``).

The reference has no temporal/structured path at all; its only
scalability story is the grBCM committee (SURVEY.md §5.7).

Time points must be SORTED ascending (sort on the host — data prep
stays in NumPy per the repo policy); duplicates are allowed (Δt = 0
steps carry A = I, Q = 0).

Compile-cost note (remote-TPU tunnel): the associative scan unrolls
log₂n combine rounds, so the first compile is heavy — measured ~20 s
at n = 16k, ~45 s at n = 200k, ~130 s at n = 10⁶ for the NLML program
(the filter+smoother posterior is larger still).  Steady-state
execution after compile is 0.1-0.8 s at those sizes.  Keep shapes
static across calls.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config

Array = jax.Array


# --------------------------------------------------------------------
# lane-major [d, d, n] small-matrix algebra
# --------------------------------------------------------------------


def _bmm(a: Array, b: Array) -> Array:
    """[d,d,n] @ [d,d,n] per lane — d²-unrolled multiply-adds.
    HIGHEST precision: on TPU the default routes these contractions
    through bf16, and the filter's cancellation-heavy recursions
    (Q = P∞ − AP∞Aᵀ with λΔt ≪ 1, the combine's I + CJ inverses)
    turn bf16 rounding into NaNs at n ≳ 10⁴."""
    return jnp.einsum(
        "ikn,kjn->ijn", a, b, precision=jax.lax.Precision.HIGHEST
    )


def _bmv(a: Array, v: Array) -> Array:
    """[d,d,n] @ [d,n] per lane (HIGHEST — see :func:`_bmm`)."""
    return jnp.einsum(
        "ikn,kn->in", a, v, precision=jax.lax.Precision.HIGHEST
    )


def _t(a: Array) -> Array:
    return jnp.swapaxes(a, 0, 1)


def _inv(m: Array) -> Array:
    """Closed-form inverse of [d,d,n] stacks, d ∈ {1,2,3} (adjugate /
    determinant — no LAPACK, no layout change, pure lanes)."""
    d = m.shape[0]
    if d == 1:
        return 1.0 / m
    if d == 2:
        det = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
        adj = jnp.stack([
            jnp.stack([m[1, 1], -m[0, 1]]),
            jnp.stack([-m[1, 0], m[0, 0]]),
        ])
        return adj / det
    c00 = m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1]
    c01 = m[0, 2] * m[2, 1] - m[0, 1] * m[2, 2]
    c02 = m[0, 1] * m[1, 2] - m[0, 2] * m[1, 1]
    c10 = m[1, 2] * m[2, 0] - m[1, 0] * m[2, 2]
    c11 = m[0, 0] * m[2, 2] - m[0, 2] * m[2, 0]
    c12 = m[0, 2] * m[1, 0] - m[0, 0] * m[1, 2]
    c20 = m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0]
    c21 = m[0, 1] * m[2, 0] - m[0, 0] * m[2, 1]
    c22 = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    det = m[0, 0] * c00 + m[0, 1] * c10 + m[0, 2] * c20
    adj = jnp.stack([
        jnp.stack([c00, c01, c02]),
        jnp.stack([c10, c11, c12]),
        jnp.stack([c20, c21, c22]),
    ])
    return adj / det


# --------------------------------------------------------------------
# SDE representation of the Matérn family (house convention r = ℓτ)
# --------------------------------------------------------------------


def _ssm_dim(nu: float) -> int:
    return {0.5: 1, 1.5: 2, 2.5: 3}[nu]


def _ssm_constants(nu: float, sig: Array, ls: Array, dtype):
    """(λ, P∞) for Matérn-ν with variance σ² and inverse lengthscale
    ℓ.  λ = √(2ν)·ℓ in the √(2ν)r convention of ``ops/kernels.Matern``;
    the observed coordinate is state 0."""
    d = _ssm_dim(nu)
    lam = jnp.sqrt(jnp.asarray(2.0 * nu, dtype)) * jnp.abs(ls)
    s2 = jnp.square(sig)
    if d == 1:
        p_inf = s2 * jnp.ones((1, 1), dtype)
    elif d == 2:
        p_inf = jnp.diag(jnp.stack([s2, s2 * jnp.square(lam)]))
    else:
        l2 = jnp.square(lam)
        k = s2 * l2 / 3.0
        z = jnp.zeros((), dtype)
        p_inf = jnp.stack([
            jnp.stack([s2, z, -k]),
            jnp.stack([z, k, z]),
            jnp.stack([-k, z, s2 * jnp.square(l2)]),
        ])
    return lam, p_inf


def _transitions(nu: float, lam: Array, p_inf: Array, dt: Array):
    """Lane-major (A, Q) over steps: A = e^{−λΔt}·Σ_k N^kΔt^k/k! with
    the nilpotent N = F + λI (the Matérn state matrix has one
    eigenvalue −λ of full multiplicity), Q = P∞ − A P∞ Aᵀ (stationary
    process).  Returns ``[d, d, n]`` pairs."""
    d = p_inf.shape[0]
    dtype = p_inf.dtype
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    if d == 1:
        n_mat = jnp.zeros((1, 1), dtype)
    elif d == 2:
        # N = F + λI for F = [[0,1],[−λ², −2λ]] — N² = 0
        n_mat = jnp.stack([
            jnp.stack([lam, one]),
            jnp.stack([-jnp.square(lam), -lam]),
        ])
    else:
        # N = F + λI for F = [[0,1,0],[0,0,1],[−λ³,−3λ²,−3λ]] — N³ = 0
        l2 = jnp.square(lam)
        n_mat = jnp.stack([
            jnp.stack([lam, one, zero]),
            jnp.stack([zero, lam, one]),
            jnp.stack([-l2 * lam, -3.0 * l2, -2.0 * lam]),
        ])

    eye = jnp.eye(d, dtype=dtype)
    decay = jnp.exp(-lam * dt)                        # [n]
    a = eye[:, :, None] + n_mat[:, :, None] * dt
    if d == 3:
        n2 = n_mat @ n_mat
        a = a + 0.5 * n2[:, :, None] * jnp.square(dt)
    a = decay * a                                     # [d, d, n]
    p_b = jnp.broadcast_to(
        p_inf[:, :, None], a.shape
    )
    q = p_b - _bmm(_bmm(a, p_b), _t(a))
    return a, q


def _prep(nu, params, t, y, config):
    dtype = y.dtype
    sig, ls, sn = params[0], params[1], params[2]
    lam, p_inf = _ssm_constants(nu, sig, ls, dtype)
    dt = jnp.diff(t, prepend=t[:1])                   # dt[0] = 0
    a_s, q_s = _transitions(nu, lam, p_inf, dt)
    # step 0 folds the stationary prior: A₀ ← 0 (kills the virtual
    # pre-sample state), Q₀ ← P∞ so P̄₁ = P∞ exactly.
    a_s = a_s.at[:, :, 0].set(0.0)
    q_s = q_s.at[:, :, 0].set(p_inf)
    return a_s, q_s, p_inf, jnp.square(sn)


# --------------------------------------------------------------------
# sequential filter / smoother (correctness oracle, lax.scan)
# --------------------------------------------------------------------


def _filter_seq(a_s, q_s, p0, y, r_var, mask):
    """Textbook Kalman filter as one lax.scan.  ``mask[i]=0`` skips the
    measurement update (prediction-only steps).  Lane-major in/out."""
    d = p0.shape[0]
    dtype = p0.dtype
    a_nd = jnp.moveaxis(a_s, -1, 0)                   # [n, d, d]
    q_nd = jnp.moveaxis(q_s, -1, 0)

    def step(carry, inp):
        m, p = carry
        a, q, yi, mi = inp
        m = a @ m
        p = a @ p @ a.T + q
        s = p[0, 0] + r_var
        v = yi - m[0]
        k = p[:, 0] / s
        m_u = m + mi * k * v
        p_u = p - mi * jnp.outer(k, k) * s
        ll = mi * 0.5 * (
            jnp.log(2.0 * jnp.asarray(math.pi, dtype) * s)
            + jnp.square(v) / s
        )
        return (m_u, p_u), (m_u, p_u, ll)

    init = (jnp.zeros((d,), dtype), p0)
    _, (ms, ps, lls) = jax.lax.scan(step, init, (a_nd, q_nd, y, mask))
    return (
        jnp.moveaxis(ms, 0, -1),                      # [d, n]
        jnp.moveaxis(ps, 0, -1),                      # [d, d, n]
        jnp.sum(lls),
    )


def _smooth_seq(a_s, q_s, ms, ps):
    """RTS smoother as one reverse lax.scan.  Lane-major in/out."""
    a_nd = jnp.moveaxis(a_s, -1, 0)
    q_nd = jnp.moveaxis(q_s, -1, 0)
    ms_nd = jnp.moveaxis(ms, -1, 0)
    ps_nd = jnp.moveaxis(ps, -1, 0)

    def step(carry, inp):
        m_next, p_next = carry
        a_next, q_next, m_f, p_f = inp
        p_pred = a_next @ p_f @ a_next.T + q_next
        g = jnp.linalg.solve(p_pred.T, (p_f @ a_next.T).T).T
        m_s = m_f + g @ (m_next - a_next @ m_f)
        p_s = p_f + g @ (p_next - p_pred) @ g.T
        return (m_s, p_s), (m_s, p_s)

    inps = (a_nd[1:], q_nd[1:], ms_nd[:-1], ps_nd[:-1])
    init = (ms_nd[-1], ps_nd[-1])
    _, (ms_s, ps_s) = jax.lax.scan(step, init, inps, reverse=True)
    ms_out = jnp.concatenate([ms_s, ms_nd[-1:]], axis=0)
    ps_out = jnp.concatenate([ps_s, ps_nd[-1:]], axis=0)
    return jnp.moveaxis(ms_out, 0, -1), jnp.moveaxis(ps_out, 0, -1)


# --------------------------------------------------------------------
# parallel (associative-scan) filter / smoother — the TPU path
# --------------------------------------------------------------------


def _filter_elements(a_s, q_s, y, r_var, mask):
    """Per-step filter elements (A, b, C, η, J) — vectors as [d,1,n]
    columns so every pytree leaf is rank-3 (associative_scan takes ONE
    axis index for the whole tree).  Masked steps (mask=0) degrade to
    pure prediction elements (A_i, 0, Q_i, 0, 0)."""
    s = q_s[0, 0] + r_var                             # [n]
    k = q_s[:, 0] / s                                 # [d, n]
    a_row = a_s[0]                                    # [d, n]  (HA)
    ikh_a = a_s - mask * k[:, None, :] * a_row[None, :, :]
    b = mask * k * y                                  # [d, n]
    c = q_s - mask * k[:, None, :] * q_s[0][None, :, :]
    eta = mask * a_row * (y / s)                      # [d, n]
    j = mask * a_row[:, None, :] * a_row[None, :, :] / s
    return ikh_a, b[:, None, :], c, eta[:, None, :], j


def _filter_combine(e1, e2):
    """Associative combination of filter elements (arg0 earlier)."""
    a1, b1, c1, eta1, j1 = e1
    a2, b2, c2, eta2, j2 = e2
    d = a1.shape[0]
    eye = jnp.eye(d, dtype=a1.dtype)[:, :, None]
    m_inv = _inv(eye + _bmm(c1, j2))
    a = _bmm(a2, _bmm(m_inv, a1))
    b_out = _bmm(a2, _bmm(m_inv, b1 + _bmm(c1, eta2))) + b2
    c_out = _bmm(a2, _bmm(_bmm(m_inv, c1), _t(a2))) + c2
    mt_inv = _inv(eye + _bmm(j2, c1))
    eta_out = _bmm(_t(a1), _bmm(mt_inv, eta2 - _bmm(j2, b1))) + eta1
    j_out = _bmm(_t(a1), _bmm(_bmm(mt_inv, j2), a1)) + j1
    return a, b_out, c_out, eta_out, j_out


def _filter_identity(d: int, n: int, dtype):
    """Left identity of the filter monoid: (I, 0, 0, 0, 0)."""
    eye = jnp.broadcast_to(
        jnp.eye(d, dtype=dtype)[:, :, None], (d, d, n)
    )
    zv = jnp.zeros((d, 1, n), dtype)
    zm = jnp.zeros((d, d, n), dtype)
    return eye, zv, zm, zv, zm


def _filter_assoc(a_s, q_s, p0, y, r_var, mask):
    """Parallel-scan Kalman filter (Särkkä & García-Fernández 2021,
    lemmas 7-8), combined in log₂n rounds; all algebra lane-major
    [d,d,n].  Returns filtered (m [d,n], P [d,d,n]).
    """
    elems = _filter_elements(a_s, q_s, y, r_var, mask)
    a_c, b_c, c_c, _, _ = jax.lax.associative_scan(
        _filter_combine, elems, axis=2
    )
    # prefix elements applied to (m₀ = 0, P₀ = p0); A₀ = 0 already
    # killed the p0 dependence, but keep the general form:
    p0_b = jnp.broadcast_to(p0[:, :, None], a_c.shape)
    ps = c_c + _bmm(a_c, _bmm(p0_b, _t(a_c)))
    return b_c[:, 0, :], ps


def _smooth_build(a_s, q_s, ms, ps):
    """Smoother gain/offset elements from the filtered states →
    ``(E [d,d,n], g [d,1,n], L [d,d,n])`` (last element = identity on
    the final filtered state)."""
    d, n = ms.shape
    a_next, q_next = a_s[:, :, 1:], q_s[:, :, 1:]
    m_f, p_f = ms[:, :-1], ps[:, :, :-1]
    p_pred = _bmm(_bmm(a_next, p_f), _t(a_next)) + q_next
    g = _bmm(_bmm(p_f, _t(a_next)), _inv(p_pred))     # [d, d, n−1]
    gm = m_f - _bmv(g, _bmv(a_next, m_f))
    l_mat = p_f - _bmm(_bmm(g, p_pred), _t(g))

    e_all = jnp.concatenate(
        [g, jnp.zeros((d, d, 1), ms.dtype)], axis=-1
    )
    g_all = jnp.concatenate([gm, ms[:, -1:]], axis=-1)[:, None, :]
    l_all = jnp.concatenate([l_mat, ps[:, :, -1:]], axis=-1)
    return e_all, g_all, l_all


def _smooth_scan(e_all, g_all, l_all):
    """Reversed associative scan over the affine smoother elements.

    Kept as its OWN jit unit on the host path: compiling this scan in
    the same XLA program as the filter that produces its operands makes
    the TPU compile scale linearly with n (28 s → 49 s → 108 s at
    8k/16k/32k, >10 min at 65k; an optimization_barrier does not help),
    while the same scan compiled standalone is flat ~7 s at any n.
    """

    def combine(suffix, elem):
        # reverse=True scans the reversed sequence forward, so arg0 is
        # the combined LATER suffix and arg1 the earlier element; the
        # smoother recursion x_i = f_i(x_{i+1}) composes as
        # f_elem ∘ f_suffix.  (g rides as a [d, 1, n] column.)
        ea, ga, la = suffix
        eb, gb, lb = elem
        return (
            _bmm(eb, ea),
            _bmm(eb, ga) + gb,
            _bmm(eb, _bmm(la, _t(eb))) + lb,
        )

    _, g_c, l_c = jax.lax.associative_scan(
        combine, (e_all, g_all, l_all), reverse=True, axis=2
    )
    return g_c[:, 0, :], l_c


def _smooth_assoc(a_s, q_s, ms, ps):
    """Parallel-scan RTS smoother (same paper, lemma 9-10) — build +
    reversed scan in one trace (the fallback used under an enclosing
    jit; the host path runs the two stages as separate programs)."""
    return _smooth_scan(*_smooth_build(a_s, q_s, ms, ps))


# --------------------------------------------------------------------
# public API
# --------------------------------------------------------------------


def nlml_ss(
    nu: float,
    params: Array,
    t: Array,
    y: Array,
    config: Config = DEFAULT,
    *,
    parallel: bool = True,
) -> Array:
    """Exact NLML of the 1-D Matérn-ν GP with observation noise —
    identical to the dense ``likelihood.nlml`` with
    ``Sum((Matern(ν), WhiteNoise))`` (tested to f64 round-off), at
    O(n) work / O(log n) depth.

    ``params = [σ, ℓ, σₙ]``; ``t`` sorted ascending, shape [n].
    ``parallel=True`` computes filtered states with the associative
    scan and recovers the innovation decomposition vectorized;
    ``parallel=False`` is the sequential lax.scan oracle.
    """
    dtype = y.dtype
    mask = jnp.ones_like(y)
    a_s, q_s, p_inf, r_var = _prep(nu, params, t, y, config)
    if not parallel:
        _, _, val = _filter_seq(a_s, q_s, p_inf, y, r_var, mask)
        return val
    ms, ps = _filter_assoc(a_s, q_s, p_inf, y, r_var, mask)
    # innovation decomposition from the filtered states, vectorized:
    # m̄_i = A_i m_{i−1}, P̄_i = A_i P_{i−1} A_iᵀ + Q_i (i=0: prior)
    m_prev = jnp.concatenate(
        [jnp.zeros((ms.shape[0], 1), dtype), ms[:, :-1]], axis=-1
    )
    p_prev = jnp.concatenate(
        [p_inf[:, :, None], ps[:, :, :-1]], axis=-1
    )
    m_bar = _bmv(a_s, m_prev)
    p_bar = _bmm(_bmm(a_s, p_prev), _t(a_s)) + q_s
    s = p_bar[0, 0] + r_var
    v = y - m_bar[0]
    return 0.5 * jnp.sum(
        jnp.log(2.0 * jnp.asarray(math.pi, dtype) * s)
        + jnp.square(v) / s
    )


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(0, 5))
def _posterior_core(nu, params, t_sorted, y_all, mask, parallel):
    """Single-program filter + smoother on a pre-merged chain — the
    traced fallback (under an enclosing jit).  NOTE: for the parallel
    path this compiles slowly at large n on TPU (see
    :func:`_smooth_scan`); the host path below splits the stages."""
    a_s, q_s, p_inf, r_var = _prep(nu, params, t_sorted, y_all, None)
    if parallel:
        ms, ps = _filter_assoc(a_s, q_s, p_inf, y_all, r_var, mask)
        ms_s, ps_s = _smooth_assoc(a_s, q_s, ms, ps)
    else:
        ms, ps, _ = _filter_seq(a_s, q_s, p_inf, y_all, r_var, mask)
        ms_s, ps_s = _smooth_seq(a_s, q_s, ms, ps)
    return ms_s[0], ps_s[0, 0]


@_partial(jax.jit, static_argnums=(0,))
def _posterior_stage_a(nu, params, t_sorted, y_all, mask):
    """Host-path stage A: prep + parallel filter + smoother-element
    build → (E, g, L)."""
    a_s, q_s, p_inf, r_var = _prep(nu, params, t_sorted, y_all, None)
    ms, ps = _filter_assoc(a_s, q_s, p_inf, y_all, r_var, mask)
    return _smooth_build(a_s, q_s, ms, ps)


@jax.jit
def _posterior_stage_b(e_all, g_all, l_all):
    """Host-path stage B: the reversed scan as its own XLA program
    (flat ~7 s TPU compile at any n — see :func:`_smooth_scan`)."""
    g_c, l_c = _smooth_scan(e_all, g_all, l_all)
    return g_c[0], l_c[0, 0]


def posterior_ss(
    nu: float,
    params: Array,
    t: Array,
    y: Array,
    tq: Array,
    config: Config = DEFAULT,
    *,
    parallel: bool = True,
) -> Tuple[Array, Array]:
    """Exact posterior mean/variance of the latent f at query times
    ``tq`` — merge the queries into the chain as unobserved steps
    (mask = 0: pure prediction), filter + RTS-smooth, read them back.

    The merge/sort happens on the HOST (NumPy) when the time arrays
    are concrete — sorting is data prep, and tracing it into the TPU
    program made the remote compile explode; the smoother core is a
    cached jitted program.  Under an enclosing ``jit`` (traced times)
    the fully-traced fallback is used.  Returns ``(mean [nq],
    var [nq])`` of the LATENT function (add σₙ² for the
    observation-space predictive).
    """
    dtype = y.dtype
    n, nq = t.shape[0], tq.shape[0]

    if isinstance(t, jax.core.Tracer) or isinstance(
        tq, jax.core.Tracer
    ) or isinstance(y, jax.core.Tracer):
        t_all = jnp.concatenate([t, tq])
        order = jnp.argsort(t_all)
        t_sorted = t_all[order]
        y_all = jnp.concatenate([y, jnp.zeros((nq,), dtype)])[order]
        mask = jnp.concatenate(
            [jnp.ones((n,), dtype), jnp.zeros((nq,), dtype)]
        )[order]
        m_all, v_all = _posterior_core.__wrapped__(
            nu, params, t_sorted, y_all, mask, parallel
        )
        qpos = jnp.argsort(order)[n:]
        return m_all[qpos], v_all[qpos]

    t_h = np.asarray(t)
    tq_h = np.asarray(tq)
    order = np.argsort(
        np.concatenate([t_h, tq_h]), kind="stable"
    )
    t_sorted = jnp.asarray(np.concatenate([t_h, tq_h])[order], dtype)
    y_all = jnp.asarray(
        np.concatenate([np.asarray(y), np.zeros(nq)])[order], dtype
    )
    mask = jnp.asarray(
        np.concatenate([np.ones(n), np.zeros(nq)])[order], dtype
    )
    qpos = np.argsort(order, kind="stable")[n:]

    if parallel:
        e_all, g_all, l_all = _posterior_stage_a(
            nu, params, t_sorted, y_all, mask
        )
        m_all, v_all = _posterior_stage_b(e_all, g_all, l_all)
    else:
        m_all, v_all = _posterior_core(
            nu, params, t_sorted, y_all, mask, False
        )
    return m_all[jnp.asarray(qpos)], v_all[jnp.asarray(qpos)]


def nlml_ss_fwdgrad(
    nu: float,
    params: Array,
    t: Array,
    y: Array,
    config: Config = DEFAULT,
) -> Array:
    """:func:`nlml_ss` with a custom VJP that computes ∂/∂θ by
    FORWARD mode (one jvp-augmented scan, nhp tangents together).

    Exact — same derivative as reverse-mode, different evaluation
    order (parity tested to 1e-13).  **Measured caveat on the current
    TPU toolchain**: the fatter jvp combine makes Mosaic/XLA compile
    WORSE than reverse mode (>15 min at n=125k where plain
    reverse-mode value_and_grad compiles in ~95 s; both exceed 25 min
    at n=10⁶), so reverse mode remains the production default
    everywhere (:func:`fit_ss`).  Kept because the formulation is the
    right asymptotic shape (scan count does not grow with AD) and
    wins on backends that don't pay the per-op × n compile tax.
    """

    @jax.custom_vjp
    def f(p):
        return nlml_ss(nu, p, t, y, config)

    def f_fwd(p):
        val, jac = _nlml_ss_value_and_jacfwd(p)
        return val, jac

    def f_bwd(jac, g):
        return (g * jac,)

    def _nlml_ss_value_and_jacfwd(p):
        basis = jnp.eye(p.shape[0], dtype=p.dtype)
        val, jac = jax.vmap(
            lambda e: jax.jvp(
                lambda q: nlml_ss(nu, q, t, y, config), (p,), (e,)
            )
        )(basis)
        return val[0], jac

    f.defvjp(f_fwd, f_bwd)
    return f(params)


@_partial(jax.jit, static_argnums=(0,))
def _nlml_vg_stage_a(nu, params, t, y):
    """Large-n value+grad stage A: prep + filter elements + their
    nhp-basis jvp tangents — purely elementwise, NO scan, so the TPU
    compile is flat in n (the compile-time discipline of
    :func:`_posterior_stage_a`/:func:`_posterior_stage_b` applied to
    the gradient).

    Tangents are a TUPLE of nhp bundles, never a stacked
    ``[nhp, d, d, n]`` array: a leading batch axis over the tiny state
    dims makes XLA pick a tiling that pads ~43× — 1.9 GB per
    temporary at n=10⁶ (the [n,d,d]-layout lesson again, in vmap
    form).  Every leaf here stays lane-major ``[d, ·, n]``.
    """
    mask = jnp.ones_like(y)

    def bundle_of(p):
        a_s, q_s, p_inf, r_var = _prep(nu, p, t, y, None)
        elems = _filter_elements(a_s, q_s, y, r_var, mask)
        return (elems, a_s, q_s, p_inf, r_var)

    primal = bundle_of(params)
    basis = jnp.eye(params.shape[0], dtype=params.dtype)
    tans = tuple(
        jax.jvp(bundle_of, (params,), (basis[k],))[1]
        for k in range(params.shape[0])
    )
    return primal, tans


def _filter_combine_jvp(p1, p2):
    """Combine for (element, nhp-tangent-tuple) pairs: the primal
    :func:`_filter_combine` linearized once, applied to every tangent
    direction — associative because the jvp of an associative op is
    associative on (primal, tangent) pairs."""
    e1, dts1 = p1
    e2, dts2 = p2
    out, lin = jax.linearize(_filter_combine, e1, e2)
    douts = tuple(lin(d1, d2) for d1, d2 in zip(dts1, dts2))
    return out, douts


@jax.jit
def _nlml_vg_stage_b(primal, tans, y):
    """Large-n value+grad stage B: ONE associative scan over
    (element, tangent-tuple) pairs + the innovation NLML and its
    tangents.  The scan is not fused with its producer, so the
    compile stays flat in n; no leaf ever grows a leading batch
    axis."""
    dtype = y.dtype
    elems, a_s, q_s, p_inf, r_var = primal
    tan_elems = tuple(tn[0] for tn in tans)

    prefix, dprefix = jax.lax.associative_scan(
        _filter_combine_jvp, (elems, tan_elems), axis=2
    )

    def H(pre, a_s, q_s, p_inf, r_var):
        a_c, b_c, c_c, _, _ = pre
        p0_b = jnp.broadcast_to(p_inf[:, :, None], a_c.shape)
        ps = c_c + _bmm(a_c, _bmm(p0_b, _t(a_c)))
        ms = b_c[:, 0, :]
        m_prev = jnp.concatenate(
            [jnp.zeros((ms.shape[0], 1), dtype), ms[:, :-1]], axis=-1
        )
        p_prev = jnp.concatenate(
            [p_inf[:, :, None], ps[:, :, :-1]], axis=-1
        )
        m_bar = _bmv(a_s, m_prev)
        p_bar = _bmm(_bmm(a_s, p_prev), _t(a_s)) + q_s
        s = p_bar[0, 0] + r_var
        v = y - m_bar[0]
        return 0.5 * jnp.sum(
            jnp.log(2.0 * jnp.asarray(math.pi, dtype) * s)
            + jnp.square(v) / s
        )

    val, lin_h = jax.linearize(H, prefix, a_s, q_s, p_inf, r_var)
    grads = [
        lin_h(dpre, tn[1], tn[2], tn[3], tn[4])
        for dpre, tn in zip(dprefix, tans)
    ]
    return val, jnp.stack(grads)


def nlml_ss_value_and_grad(
    nu: float,
    params: Array,
    t: Array,
    y: Array,
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """Exact (NLML, ∂NLML/∂θ) as TWO host-composed XLA programs:
    elementwise stage A (prep + elements + nhp tangent bundles, flat
    compile) and a scan-only stage B over (element, tangent) pairs.

    Exact (parity tested to 1e-13 against reverse-mode AD).
    **Measured caveat on the current TPU toolchain**: stage B's
    linearized combine still pays the per-op × n compile tax (>25 min
    at n=10⁶), so this does NOT unlock n=10⁶ gradients there —
    reverse-mode AD through :func:`nlml_ss` (95 s compile at n=125k)
    remains the practical TPU path up to a few hundred thousand
    points, and at n=10⁶ only the VALUE program is practical.  The
    two-program split IS the memory-safe formulation (every leaf
    stays lane-major [d,·,n]; a stacked [nhp,d,d,n] tangent array
    pads ~43× and OOMs HBM at n=10⁶) and is the right host-composed
    shape for watchdog-limited runtimes.

    Not traceable under an outer ``jit`` (two programs by design).
    """
    primal, tans = _nlml_vg_stage_a(nu, params, t, y)
    return _nlml_vg_stage_b(primal, tans, y)


# --------------------------------------------------------------------
# Adjoint-scan exact gradient — the n = 10⁶ TPU gradient path
# --------------------------------------------------------------------
#
# Why not the textbook EM / Fisher-identity gradient on smoothed
# moments (∂θ E[−log p(x,y|θ) | y])?  It was implemented and MEASURED
# here first: every transition term carries tr(Qᵢ⁻¹Mᵢ) with
# Mᵢ ≈ Qᵢ + O(ε·P), and for small λ·Δt the gram of Q collapses
# (det Q ~ Δt^{d²}) so the ε·P statistics error is amplified by
# ~κ(Q): at d=2, n=2·10⁴ over a dense chain the f64 gradient was off
# by 13% and f32 NaN'd; d=3 broke down even in f64 (52% at n=500).
# No whitening fixes it — the *fixed smoothed statistics themselves*
# carry P-scale absolute error that Q⁻¹ magnifies.
#
# The shipped formulation is the exact ADJOINT of the innovation
# (prediction-error) decomposition — mathematically the
# Koopman–Shephard exact score / disturbance-smoother route, derived
# here directly as reverse-mode differentiation of the filter
# recursion, reorganised as ONE backward associative scan:
#
#   NLML = Σₜ ½(log 2πSₜ + vₜ²/Sₜ),    eₜ = vₜ/Sₜ,
#   cₜ = ½(1/Sₜ − vₜ²/Sₜ²),            Λₜ = Aₜ₊₁(I − KₜH),
#   ḡₜ := ∂NLML/∂m̄ₜ = −Hᵀeₜ + Λₜᵀḡₜ₊₁,
#   Γₜ := ∂NLML/∂P̄ₜ = cₜHᵀH + sym(Λₜᵀḡₜ₊₁ eₜᵀH) + ΛₜᵀΓₜ₊₁Λₜ.
#
# The pair (ḡ, Γ) follows an affine backward recursion that CLOSES
# under composition with elements (E, u, C, h):
#   f(g, Γ) = (u + Eᵀg,  C + sym(Eᵀg hᵀ) + EᵀΓE),
#   (f_a ∘ f_b): E ← E_b E_a, u ← u_a + E_aᵀu_b,
#                C ← C_a + sym(E_aᵀu_b h_aᵀ) + E_aᵀC_b E_a,
#                h ← h_a + E_aᵀh_b                      (a=earlier),
# so one reversed associative scan yields every (ḡₜ, Γₜ).  The
# gradient then assembles ELEMENTWISE:
#   ∂NLML/∂θ = ∂θ[ Σₜ ḡₜᵀ(Aₜ(θ) mₜ₋₁)
#                  + Σₜ ⟨Γₜ, Aₜ(θ)Pₜ₋₁Aₜ(θ)ᵀ + Qₜ(θ)⟩
#                  + (Σₜ cₜ)·σₙ²(θ) ]          (adjoint method),
# with the filtered moments (mₜ₋₁, Pₜ₋₁) and (ḡ, Γ, c) held fixed.
# No Q⁻¹ appears anywhere: the arithmetic is the same as reverse-mode
# AD's, so it matches AD to round-off in BOTH f64 and f32 — at every
# chain density — while every one of the three programs compiles flat
# in n.  Tied steps (Δt = 0) need no special casing: A ≡ I, Q ≡ 0
# with zero θ-derivative contribute zero through the linear functional.


@_partial(jax.jit, static_argnums=(0,))
def _adj_stage_a(nu, params, t, y):
    """Adjoint-gradient stage A: prep + parallel filter + innovation
    NLML value + per-step adjoint elements, ONE XLA program whose only
    scan is the filter (flat TPU compile at any n).

    Returns ``(elems, m_prev, p_prev, c, val)`` with
    ``elems = (Λ [d,d,n], u [d,1,n], C [d,d,n], h [d,1,n])``.
    """
    dtype = y.dtype
    d = _ssm_dim(nu)
    n = y.shape[0]
    mask = jnp.ones_like(y)
    a_s, q_s, p_inf, r_var = _prep(nu, params, t, y, None)
    ms, ps = _filter_assoc(a_s, q_s, p_inf, y, r_var, mask)
    m_prev = jnp.concatenate(
        [jnp.zeros((d, 1), dtype), ms[:, :-1]], axis=-1
    )
    p_prev = jnp.concatenate(
        [p_inf[:, :, None], ps[:, :, :-1]], axis=-1
    )
    m_bar = _bmv(a_s, m_prev)
    p_bar = _bmm(_bmm(a_s, p_prev), _t(a_s)) + q_s
    s = p_bar[0, 0] + r_var
    v = y - m_bar[0]
    val = 0.5 * jnp.sum(
        jnp.log(2.0 * jnp.asarray(math.pi, dtype) * s)
        + jnp.square(v) / s
    )
    e_in = v / s
    c = 0.5 * (1.0 / s - jnp.square(v) / jnp.square(s))
    k = p_bar[:, 0] / s                                   # gain [d, n]
    # (I − K H): identity minus k in column 0
    eye_n = jnp.broadcast_to(
        jnp.eye(d, dtype=dtype)[:, :, None], (d, d, n)
    )
    col0 = (jnp.arange(d) == 0).astype(dtype)             # H row
    ikh = eye_n - k[:, None, :] * col0[None, :, None]
    a_next = jnp.concatenate(
        [a_s[:, :, 1:], jnp.zeros((d, d, 1), dtype)], axis=-1
    )                                                     # A_{t+1}; 0 at end
    lam = _bmm(a_next, ikh)
    u = -(col0[:, None, None] * e_in[None, None, :])      # −Hᵀe [d,1,n]
    h = -u                                                # +Hᵀe
    c_mat = (
        c[None, None, :]
        * col0[:, None, None] * col0[None, :, None]
    )                                                     # c·HᵀH [d,d,n]
    w_r = _bmv(a_next, k)                                 # A_{t+1}K_t
    return (lam, u, c_mat, h), m_prev, p_prev, (c, e_in, w_r), val


def _adj_combine(suffix, elem):
    """Composition of adjoint affine elements (see the derivation in
    the section comment).  ``reverse=True`` scan convention: arg0 is
    the combined LATER suffix, arg1 the earlier element; the result is
    f_elem ∘ f_suffix."""
    es, us, cs, hs = suffix
    ee, ue, ce, he = elem
    eet = _t(ee)
    g_mid = _bmm(eet, us)                   # E_eᵀ u_s  [d,1,n]
    cross = _bmm(g_mid, _t(he))             # outer(E_eᵀu_s, h_e)
    c_out = (
        ce + 0.5 * (cross + _t(cross)) + _bmm(eet, _bmm(cs, ee))
    )
    return (
        _bmm(es, ee),
        ue + g_mid,
        c_out,
        he + _bmm(eet, hs),
    )


@jax.jit
def _adj_stage_b(elems):
    """Adjoint-gradient stage B: the reversed associative scan over
    the (E, u, C, h) elements as its OWN XLA program (the same
    two-program compile discipline as :func:`_smooth_scan` — fusing a
    scan with the producer of its operands makes the TPU compile
    linear in n).  Returns ``(ḡ [d,n], Γ [d,d,n])``."""
    _, u_c, c_c, _ = jax.lax.associative_scan(
        _adj_combine, elems, reverse=True, axis=2
    )
    return u_c[:, 0, :], c_c


@_partial(jax.jit, static_argnums=(0,))
def _adj_stage_c(nu, params, t, y, gbar, gam, m_prev, p_prev, aux):
    """Adjoint-gradient stage C: assemble ∂NLML/∂θ as the θ-gradient
    of the LINEAR functional of (A(θ), Q(θ), σₙ²(θ)) whose
    coefficients are the fixed adjoints — purely elementwise in n, no
    scan, flat compile, one cheap reverse-mode sweep.

    The σₙ² coefficient has three parts: the direct Σcₜ, plus the two
    INDIRECT per-step paths of R through the gain — δmₜ = −Kₜeₜ·δR
    and δPₜ = KₜKₜᵀ·δR — weighted by the NEXT step's adjoints
    (wₜ = Aₜ₊₁Kₜ):  Σₜ[−eₜ·ḡₜ₊₁ᵀwₜ + wₜᵀΓₜ₊₁wₜ].
    """
    c, e_in, w_r = aux
    d = gbar.shape[0]
    dtype = y.dtype
    gbar_n = jnp.concatenate(
        [gbar[:, 1:], jnp.zeros((d, 1), dtype)], axis=-1
    )                                                     # ḡ_{t+1}
    gam_n = jnp.concatenate(
        [gam[:, :, 1:], jnp.zeros((d, d, 1), dtype)], axis=-1
    )                                                     # Γ_{t+1}
    r_coef = (
        jnp.sum(c)
        - jnp.sum(e_in * jnp.sum(gbar_n * w_r, axis=0))
        + jnp.sum(w_r[:, None, :] * gam_n * w_r[None, :, :])
    )

    def linear_functional(p):
        a_s, q_s, _p_inf, r_var = _prep(nu, p, t, y, None)
        m_bar = _bmv(a_s, m_prev)
        p_bar = _bmm(_bmm(a_s, p_prev), _t(a_s)) + q_s
        return (
            jnp.sum(gbar * m_bar)
            + jnp.sum(gam * p_bar)
            + r_coef * r_var
        )

    return jax.grad(linear_functional)(params)


def nlml_ss_adjoint_value_and_grad(
    nu: float,
    params: Array,
    t: Array,
    y: Array,
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """Exact (NLML, ∂NLML/∂θ) via the adjoint scan — THREE
    host-composed XLA programs, EVERY compile flat in n.  This is the
    practical n = 10⁶ exact-gradient path on TPU.

    Why a third formulation: reverse-mode AD *through* the associative
    scan compiles ∝ n×ops on the current Mosaic/XLA toolchain (95 s at
    n=125k, >25 min at n=10⁶; forward-mode and the linearized-combine
    two-program split are worse — see :func:`nlml_ss_value_and_grad`;
    and the naive EM/Fisher surrogate is numerically destroyed by
    Q⁻¹ conditioning — measured numbers in the section comment
    above).  The adjoint route differentiates NO scan: stage A is the
    filter (one scan), stage B is one backward affine scan over
    (E, u, C, h) adjoint elements, and stage C — the only
    differentiated program — is an elementwise linear functional.
    Because the arithmetic is reverse-mode AD's own, the result
    matches AD to round-off in f64 AND f32 at any chain density
    (parity + duplicate-stamp tests in tests/test_statespace.py).

    Not traceable under an outer ``jit`` (three programs by design) —
    use reverse-mode AD of :func:`nlml_ss` for small n instead.

    Reference contract: ``MLE.loss_and_grad``
    ``/root/reference/PyGPR/loss.py:84-128`` — the same exact
    quantities, at a scale (n=10⁶ on one chip) the dense reference
    pipeline cannot represent.
    """
    elems, m_prev, p_prev, aux, val = _adj_stage_a(nu, params, t, y)
    gbar, gam = _adj_stage_b(elems)
    grad = _adj_stage_c(
        nu, params, t, y, gbar, gam, m_prev, p_prev, aux
    )
    return val, grad


class FitSSResult(NamedTuple):
    params: Array
    nlml: Array
    converged: Array


def fit_ss(
    nu: float,
    t: Array,
    y: Array,
    params0: Optional[Array] = None,
    *,
    max_iter: int = 150,
    tol: float = 1e-4,
    config: Config = DEFAULT,
) -> FitSSResult:
    """L-BFGS on the O(n) exact NLML, log-space (``fit_mle`` policy)."""
    from pygpr_tpu.optimize.lbfgs import minimize_lbfgs

    if params0 is None:
        params0 = jnp.asarray([1.0, 1.0, 0.3], y.dtype)
    u0 = jnp.log(jnp.abs(params0))

    def objective(u):
        return nlml_ss(nu, jnp.exp(u), t, y, config)

    res = minimize_lbfgs(objective, u0, max_iter=max_iter, tol=tol)
    return FitSSResult(
        params=jnp.exp(res.params), nlml=res.value,
        converged=res.converged,
    )


def fit_ss_large(
    nu: float,
    t: Array,
    y: Array,
    params0: Optional[Array] = None,
    *,
    max_iter: int = 100,
    tol: Optional[float] = None,
    grad_method: str = "auto",
    config: Config = DEFAULT,
) -> FitSSResult:
    """Hyperparameter fit for large n: SciPy L-BFGS-B on the host
    driving jitted value+grad programs per iteration, log-space.

    ``tol`` is SciPy's ``ftol``; the default is dtype-aware (1e-9 for
    f64, 1e-6 for f32 — an f32 objective cannot satisfy f64-grade
    decrease tests, which would otherwise report ``converged=False``
    on a perfectly converged fit).

    ``grad_method``: ``"ad"`` is one reverse-mode value+grad program —
    best below ~2·10⁵ points but its TPU compile grows ∝ n (95 s at
    n=125k, >25 min at n=10⁶).  ``"adjoint"`` is
    :func:`nlml_ss_adjoint_value_and_grad` — three programs whose
    compiles are flat in n, the n=10⁶ path.  ``"auto"`` (default)
    picks adjoint from n ≥ 200k.

    vs :func:`fit_ss` (a single jitted while_loop): each device call
    here is a short eval — safe under remote-runtime watchdogs that
    kill long device executions — and the line search runs on the
    host.
    """
    import numpy as np
    from scipy.optimize import minimize

    if params0 is None:
        params0 = jnp.asarray([1.0, 1.0, 0.3], y.dtype)
    u0 = np.log(np.abs(np.asarray(params0, np.float64)))

    if grad_method == "auto":
        grad_method = "adjoint" if t.shape[0] >= 200_000 else "ad"

    if grad_method in ("adjoint", "fisher"):  # "fisher" kept as alias
        def f(u):
            p = jnp.exp(jnp.asarray(u, y.dtype))
            v, g = nlml_ss_adjoint_value_and_grad(nu, p, t, y, config)
            # chain rule to log-space: ∂/∂u = ∂/∂p · p
            return float(v), np.asarray(g, np.float64) * np.exp(u)
    else:
        # t/y ride as jit ARGUMENTS, never closed over: a closed-over
        # array is baked into the program as a constant and
        # re-uploaded with every compile over the remote tunnel —
        # exactly the large-n path this function exists for (repo
        # environment rule).
        vg = jax.jit(
            lambda u_j, t_j, y_j: jax.value_and_grad(
                lambda u: nlml_ss(nu, jnp.exp(u), t_j, y_j, config)
            )(u_j)
        )

        def f(u):
            v, g = vg(jnp.asarray(u, y.dtype), t, y)
            return float(v), np.asarray(g, np.float64)

    if tol is None:
        tol = 1e-9 if y.dtype == jnp.float64 else 1e-6
    res = minimize(
        f, u0, jac=True, method="L-BFGS-B",
        options={"maxiter": max_iter, "ftol": tol, "gtol": 1e-5},
    )
    return FitSSResult(
        params=jnp.exp(jnp.asarray(res.x, y.dtype)),
        nlml=jnp.asarray(res.fun, y.dtype),
        converged=jnp.asarray(bool(res.success)),
    )


class StateSpaceGP:
    """OO wrapper for 1-D Matérn time series.

    >>> gp = StateSpaceGP(t, y, nu=1.5)
    >>> gp.train()
    >>> mean, var = gp.predict(tq)
    """

    def __init__(self, t, y, nu: float = 1.5, params=None,
                 config: Config = DEFAULT):
        t = jnp.asarray(t)
        assert t.ndim == 1, "StateSpaceGP is for 1-D time series"
        self.t = t
        self.y = jnp.asarray(y)
        self.nu = nu
        self.config = config
        self.params = (
            jnp.asarray([1.0, 1.0, 0.3], self.y.dtype)
            if params is None else jnp.asarray(params)
        )

    def train(self, max_iter: int = 150, **kwargs) -> FitSSResult:
        res = fit_ss(
            self.nu, self.t, self.y, self.params,
            max_iter=max_iter, config=self.config, **kwargs,
        )
        self.params = res.params
        return res

    def nlml(self) -> float:
        return float(nlml_ss(
            self.nu, self.params, self.t, self.y, self.config
        ))

    def predict(self, tq, observation: bool = False):
        mean, var = posterior_ss(
            self.nu, self.params, self.t, self.y,
            jnp.asarray(tq), self.config,
        )
        if observation:
            var = var + jnp.square(self.params[-1])
        return mean, var
