"""Input-space sampling designs and partitioning.

Re-design of the reference ``PyGPR/sampler.py`` for JAX: explicit PRNG
keys instead of global ``tc.manual_seed`` (``sampler.py:12``, ``:26``),
and **jit-compatible fixed-shape loops** instead of data-dependent
Python ``while`` loops.

  * :class:`Uniform` — seeded uniform box sampling (``sampler.py:6-14``).
  * :class:`Matern1` — Matérn type-I hard-core (repulsive) point
    process (``sampler.py:17-63``): dart-throwing with a fixed candidate
    budget (``max_count``, reference default 5000 at ``sampler.py:21``),
    accepting a candidate iff its distance to every accepted point
    exceeds ``min_dist`` (tolerance 1e-5, ``sampler.py:41``);
    ``sample(n)`` shrinks ``min_dist`` ×0.9 until n points fit
    (``sampler.py:57-59``), starting from ``(vol/n)^(1/dim)``
    (``sampler.py:53``).
  * ``cluster_samples`` / ``partition`` — nearest-center partitioning of
    an oversampled uniform cloud (``sampler.py:65-91``, ``:103-119``) —
    **this is how grBCM expert shards are constructed**.  The reference
    leaves short clusters with uninitialized memory
    (``tc.empty`` + silent underfill, ``sampler.py:116-117``); here a
    short cluster is topped up with its nearest remaining points, so
    shapes stay static for SPMD (SURVEY.md §7 "ragged expert
    partitions").
  * :func:`sample_gp` — GP prior draw ``f = L·𝒩(0,I) (+ mean)``
    (``sampler.py:122-137``), rebuilt on the current kernel protocol
    (the reference version calls a long-gone callable API,
    ``sampler.py:125-127``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.ops import linalg
from pygpr_tpu.ops.kernels import Kernel, kernel_matrix, sq_distance

Array = jax.Array


def euclidean_dist(x: Array, y: Array) -> Array:
    """Squared-distance matrix ``[n, m]`` (reference
    ``sampler.py:94-100`` — note it returns the *squared* distance)."""
    return sq_distance(y, x)  # rows index x, matching the reference


class Uniform:
    """Seeded uniform box sampler (reference ``UNIFORM``).

    Design sampling is **host-side NumPy**: it is data preparation, not
    GP compute, and device RNG (threefry) costs minutes of compile over
    a remote-TPU link for zero benefit.  ``key`` arguments are accepted
    for reproducibility and folded into the NumPy seed.
    """

    def __init__(self, seed: int):
        self.seed = seed

    def key(self) -> Array:
        return jax.random.PRNGKey(self.seed)

    def _host_rng(
        self, key: Optional[Array], salt: int = 0
    ) -> np.random.Generator:
        # key_data is a plain bit-read (no threefry compile — critical
        # over a remote-TPU link where that compile costs minutes).
        if key is None:
            return np.random.default_rng([self.seed, salt])
        kd = np.asarray(jax.random.key_data(key), dtype=np.uint32)
        return np.random.default_rng(list(kd.ravel()) + [salt])

    def sample(
        self,
        n: int,
        mins,
        maxs,
        key: Optional[Array] = None,
        salt: int = 0,
    ) -> Array:
        rng = self._host_rng(key, salt)
        mins_h = np.asarray(mins, np.float64)
        maxs_h = np.asarray(maxs, np.float64)
        dim = mins_h.shape[-1]
        u = rng.uniform(size=(n, dim))
        out = mins_h + u * (maxs_h - mins_h)
        return jnp.asarray(out, dtype=jnp.asarray(mins).dtype)


class Sobol(Uniform):
    """Scrambled Sobol quasi-Monte-Carlo box design (beyond
    reference — the third input-design family next to ``Uniform`` and
    the hard-core ``Matern1``).

    QMC sequences fill the box with O((log n)^d / n) star discrepancy
    versus Monte Carlo's O(n^{-1/2}) — the right default for inducing
    points, BayesOpt initializers, and committee center seeding.
    Host-side SciPy (``scipy.stats.qmc.Sobol``), Owen-scrambled with
    the same seed/key discipline as :class:`Uniform`.
    """

    def sample(
        self,
        n: int,
        mins,
        maxs,
        key: Optional[Array] = None,
        salt: int = 0,
    ) -> Array:
        from scipy.stats import qmc

        rng = self._host_rng(key, salt)
        mins_h = np.asarray(mins, np.float64)
        maxs_h = np.asarray(maxs, np.float64)
        dim = mins_h.shape[-1]
        eng = qmc.Sobol(d=dim, scramble=True, rng=rng)
        u = eng.random(n)
        out = mins_h + u * (maxs_h - mins_h)
        return jnp.asarray(out, dtype=jnp.asarray(mins).dtype)


class Matern1(Uniform):
    """Matérn type-I hard-core repulsive sampler (reference ``MATERN1``)."""

    def __init__(self, seed: int, max_count: int = 5000):
        super().__init__(seed)
        self.min_dist: Optional[float] = None
        self.max_count = max_count

    def sample_repulsion(
        self, mins, maxs, min_dist, key: Optional[Array] = None
    ) -> Tuple[Array, Array]:
        """Fixed-budget dart throwing.  Returns ``(points, accepted_mask)``
        with static shape ``[max_count, dim]``.

        Runs **on the host in NumPy**: hard-core rejection is inherently
        sequential and O(max_count²·dim) scalar work — exactly the kind
        of loop that must not be traced onto (or compiled for) the TPU.
        Deterministic per seed (or per explicit key, folded via
        ``key_data`` — a plain bit-read, no device compile).
        """
        from pygpr_tpu import native

        rng = self._host_rng(key)
        mins_h = np.asarray(mins, dtype=np.float64)
        maxs_h = np.asarray(maxs, dtype=np.float64)
        dim = mins_h.shape[-1]
        cand = mins_h + rng.uniform(size=(self.max_count, dim)) * (
            maxs_h - mins_h
        )
        # C++ scan (ctypes) with a NumPy fallback — reference tolerance
        # semantics (sampler.py:41).
        cand_mask, k = native.hard_core_accept(
            cand, float(min_dist), tol=1e-5
        )
        # Compact: accepted points first (in acceptance order), mask
        # aligned with the returned buffer rows.
        accepted = np.zeros_like(cand)
        accepted[: int(k)] = cand[cand_mask]
        mask = np.zeros((self.max_count,), bool)
        mask[: int(k)] = True
        return jnp.asarray(accepted), jnp.asarray(mask)

    def sample(self, n: int, mins, maxs, key: Optional[Array] = None) -> Array:
        """Shrink ``min_dist`` ×0.9 until ≥ n accepted (``sampler.py:50-63``)."""
        mins_a = np.asarray(mins, dtype=np.float64)
        maxs_a = np.asarray(maxs, dtype=np.float64)
        vol = float(np.prod(maxs_a - mins_a))
        dim = mins_a.shape[-1]
        min_dist = float((vol / n) ** (1.0 / dim))

        pts, mask = self.sample_repulsion(mins_a, maxs_a, min_dist, key)
        while int(mask.sum()) < n:
            min_dist *= 0.9
            pts, mask = self.sample_repulsion(mins_a, maxs_a, min_dist, key)
        self.min_dist = min_dist
        pts_h = np.asarray(pts)[np.asarray(mask)]
        return jnp.asarray(pts_h[:n])

    def cluster_samples(
        self, xc: Array, ns: int, mins, maxs, key: Optional[Array] = None
    ) -> Array:
        """Oversample 10·ns·nc uniform points and split them among the
        centers (``sampler.py:65-84``)."""
        nc = xc.shape[0]
        # salt=1: an independent stream from the center draw
        x = Uniform.sample(self, 10 * ns * nc, mins, maxs, key, salt=1)
        return assign_clusters(x, xc, ns)

    def partition(
        self, nc: int, ns: int, mins, maxs, key: Optional[Array] = None
    ) -> Tuple[Array, Array]:
        """Repulsive centers + clustering → grBCM expert shards
        (``sampler.py:86-91``).  Returns ``(xpart [nc,ns,dim], xc)``."""
        xc = self.sample(nc, mins, maxs, key)
        return self.cluster_samples(xc, ns, mins, maxs, key), xc


def assign_clusters(x: Array, xc: Array, ns: int) -> Array:
    """Nearest-center assignment with static output shape ``[nc,ns,dim]``.

    Reference semantics (``sampler.py:75-84``): per center, take the
    first ``ns`` points assigned to it.  Short clusters are topped up
    with that center's nearest remaining points (the reference leaves
    uninitialized rows, ``sampler.py:116-117``).

    Host-side (C++ via ctypes, NumPy fallback): partitioning is data
    preparation (it feeds expert shards), and the argmin/argsort at
    these sizes is microseconds on CPU but minutes of sort-kernel
    compile over a remote-TPU link.
    """
    from pygpr_tpu import native

    orig = np.asarray(x)
    x_h = np.asarray(orig, np.float64)
    xc_h = np.asarray(xc, np.float64)
    n = x_h.shape[0]
    nc = xc_h.shape[0]
    d = native.sq_dist_matrix(x_h, xc_h)  # [n, nc]
    idx = native.nearest_center(x_h, xc_h)

    out = np.empty((nc, ns, orig.shape[-1]), dtype=orig.dtype)
    for i in range(nc):
        member = idx == i
        rank = np.where(member, np.arange(n, dtype=np.float64), n + d[:, i])
        order = np.argsort(rank, kind="stable")
        out[i] = orig[order[:ns]]
    return jnp.asarray(out)


def cluster_samples(x: Array, xc: Array) -> Array:
    """Free-function parity API (``sampler.py:103-119``): partition an
    existing x among centers, equal cluster sizes ``n // nc``."""
    n, nc = x.shape[-2], xc.shape[-2]
    assert n % nc == 0
    return assign_clusters(x, xc, n // nc)


def sample_gp(
    x: Array,
    cov: Kernel,
    hp: Optional[Array] = None,
    mean: Optional[Array] = None,
    key: Optional[Array] = None,
    config: Config = DEFAULT,
) -> Array:
    """GP prior draw at x: ``f = L·𝒩(0,I) (+ mean)``
    (``sampler.py:122-137``, fixed for the current kernel protocol)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if hp is None:
        hp = cov.init_params(x, config)
    krn = kernel_matrix(cov, hp, x, config=config)
    L = linalg.safe_cholesky(krn, config).chol
    z = jax.random.normal(key, (x.shape[-2],), dtype=x.dtype)
    f = L @ z
    return f if mean is None else f + mean
