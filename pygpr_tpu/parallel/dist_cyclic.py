"""Recursive block-cyclic distributed Cholesky (the scaling core).

The 1-D block-row factorization in ``dist_cholesky.py`` is correct but
executes ~2n³ flops of masked full-width trailing updates (every device
GEMMs the whole row band every panel, finished or not) — a poor story
for the model-parallel axis SURVEY.md §5.7 calls "the hard part".  This
module replaces the *schedule*, not the math:

  * **Cyclic layout**: the matrix is split into P = D·m row blocks of
    Bc = n/P rows; block j lives on device j mod D at local slot
    j div D.  A *superblock* is D consecutive blocks (one per device),
    so any superblock-aligned row range is spread evenly over the mesh
    — no device ever idles while others update.
  * **Static recursion** (superblock halves):

        chol([a,b)) = chol([a,c));
                      A[c:b, a:c] ← A[c:b, a:c) · L[a:c)⁻ᵀ   (TRSM)
                      A[c:b, c:b) −= L[c:b, a:c) · ᵀ          (SYRK)
                      chol([c,b))

    Every range is a compile-time constant, so every GEMM has a static
    shape sized to its level — no masked full-width updates.  Executed
    flops ≈ n³/3 (chol) + n³/6 (TRSM) + ≤n³/3 (SYRK incl. the upper
    half of the square) ≈ 0.8·n³ total vs 2n³+ for the 1-D schedule,
    and the big GEMMs sit on the MXU.
  * **Communication**: the base factorization does D psum+gather
    rounds per superblock (O(n·Bc) each); each recursion level
    all-gathers its TRSM/SYRK panel (O(area) once) — O(n² log m)
    total, riding ICI.

Layout helpers convert between natural and cyclic row order (pure
reshapes + a static permutation).  The gram can be *built* directly in
cyclic order (rows are computed from replicated x), so production
pipelines never pay a conversion.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.parallel.mesh import EXPERT_AXIS

Array = jax.Array


def cyclic_permutation(n: int, n_dev: int, m: int) -> np.ndarray:
    """``perm`` such that storage row i = system row ``perm[i]``.

    Storage order is device-major: device d's chunk holds its m slots
    contiguously, slot s = global block s·D + d.
    """
    Bc = n // (n_dev * m)
    perm = np.empty(n, np.int64)
    i = 0
    for d in range(n_dev):
        for s in range(m):
            j = s * n_dev + d
            perm[i : i + Bc] = np.arange(j * Bc, (j + 1) * Bc)
            i += Bc
    return perm


def to_cyclic(K: Array, n_dev: int, m: int) -> Array:
    """Natural → cyclic storage order (rows and columns)."""
    p = cyclic_permutation(K.shape[-1], n_dev, m)
    return K[p][:, p] if K.ndim == 2 else K[p]


def from_cyclic(K: Array, n_dev: int, m: int) -> Array:
    p = cyclic_permutation(K.shape[-1], n_dev, m)
    inv = np.argsort(p)
    return K[inv][:, inv] if K.ndim == 2 else K[inv]


def dist_cholesky_cyclic(
    K_cyc: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    m: int = 4,
    config: Config = DEFAULT,
) -> Array:
    """Cholesky of SPD ``K`` given (and returned) in **cyclic storage
    order** (see :func:`to_cyclic`), row-sharded over ``axis``.

    ``m`` (a power of two) is the number of row blocks per device;
    larger m ⇒ finer load balance and smaller redundant diagonal
    factorizations, at the cost of more (smaller) collective rounds.
    """
    D = mesh.shape[axis]
    n = K_cyc.shape[-1]
    assert m >= 1 and (m & (m - 1)) == 0, "m must be a power of two"
    assert n % (D * m) == 0
    Bc = n // (D * m)
    SB = D * Bc  # superblock rows

    # system column index of cyclic-storage column c, as a constant
    perm = cyclic_permutation(n, D, m)

    def local_fn(A):
        # A: [m*Bc, n] — device d's m slots; columns in CYCLIC order.
        idx = lax.axis_index(axis)

        # column range (in cyclic storage) of superblock range [a, b):
        # superblock S's columns are storage cols of blocks S*D..S*D+D
        # — NOT contiguous in cyclic storage.  To keep every slice
        # contiguous we store columns in SYSTEM order instead? No:
        # columns here are cyclic too, so superblock S's columns are
        # the union over devices of their slot-S chunks.  We avoid the
        # issue entirely by keeping all column arithmetic in *storage*
        # coordinates via the static maps below.
        col_of = perm  # storage col -> system col (unused numerically)

        def col_slice(sb_a, sb_b):
            """Storage columns of superblocks [sb_a, sb_b): per device
            chunk d, slots sb_a..sb_b.  Returns the list of static
            (start, width) runs."""
            runs = []
            for d in range(D):
                base = d * m * Bc
                runs.append((base + sb_a * Bc, (sb_b - sb_a) * Bc))
            return runs

        def gather_rows(Acur, sb_a, sb_b, runs):
            """All-gather rows of superblocks [sb_a, sb_b), restricted
            to the given column runs, in SYSTEM row order within the
            range.  Result: [(sb_b-sb_a)*SB, sum(widths)] replicated."""
            chunks = [
                lax.dynamic_slice(
                    Acur,
                    (sb_a * Bc, start),
                    ((sb_b - sb_a) * Bc, width),
                )
                for start, width in runs
            ]
            local = jnp.concatenate(chunks, axis=1)
            g = lax.all_gather(local, axis)        # [D, rows, cols]
            # system order within range: (slot, device, Bc)
            nsb = sb_b - sb_a
            g = g.reshape(D, nsb, Bc, local.shape[1])
            g = jnp.swapaxes(g, 0, 1).reshape(
                nsb * SB, local.shape[1]
            )
            return g

        def set_rows(Acur, sb_a, runs, vals):
            """Write vals into this device's rows sb_a.. over runs."""
            off = 0
            for start, width in runs:
                Acur = lax.dynamic_update_slice(
                    Acur,
                    lax.dynamic_slice(
                        vals, (0, off), (vals.shape[0], width)
                    ),
                    (sb_a * Bc, start),
                )
                off += width
            return Acur

        def get_rows(Acur, sb_a, sb_b, runs):
            chunks = [
                lax.dynamic_slice(
                    Acur,
                    (sb_a * Bc, start),
                    ((sb_b - sb_a) * Bc, width),
                )
                for start, width in runs
            ]
            return jnp.concatenate(chunks, axis=1)

        # -------------------------------------------------------------
        # base case: factor one superblock's diagonal [SB, SB]
        # (one Bc-block per device), D static panel steps.
        # -------------------------------------------------------------
        def base_chol(Acur, S):
            runs = col_slice(S, S + 1)  # this superblock's columns
            # local [Bc, SB] row: device d owns system block row d
            for k in range(D):
                # column chunk of device k within the superblock:
                ck = k * m * Bc + S * Bc
                diag_mine = lax.dynamic_slice(
                    Acur, (S * Bc, ck), (Bc, Bc)
                )
                contrib = jnp.where(
                    idx == k, diag_mine, jnp.zeros_like(diag_mine)
                )
                Akk = lax.psum(contrib, axis)
                Lkk = lax.linalg.cholesky(Akk)
                # every device TRSMs its block in this column
                X = lax.linalg.triangular_solve(
                    Lkk, diag_mine,
                    left_side=False, lower=True, transpose_a=True,
                )
                newblk = jnp.where(
                    idx > k, X,
                    jnp.where(idx == k, Lkk, jnp.zeros_like(X)),
                )
                Acur = lax.dynamic_update_slice(
                    Acur, newblk, (S * Bc, ck)
                )
                # gather column k of the superblock; trailing update
                # within the remaining columns of this superblock
                colk = lax.all_gather(newblk, axis)    # [D, Bc, Bc]
                for kp in range(k + 1, D):
                    ckp = kp * m * Bc + S * Bc
                    mine_kp = lax.dynamic_slice(
                        Acur, (S * Bc, ckp), (Bc, Bc)
                    )
                    upd = jnp.matmul(
                        newblk, colk[kp].T, precision=config.precision
                    )
                    # rows above the diagonal of block kp (idx < kp..)
                    # get spurious updates only in their strictly-upper
                    # region, which base_chol overwrites/zeroes later.
                    mine_kp = mine_kp - upd
                    Acur = lax.dynamic_update_slice(
                        Acur, mine_kp, (S * Bc, ckp)
                    )
            return Acur

        # -------------------------------------------------------------
        # TRSM: rows [ra, rb) ← rows · L[ca, cb)⁻ᵀ (recursion on cols)
        # -------------------------------------------------------------
        def trsm(Acur, ra, rb, ca, cb):
            if cb - ca == 1:
                runs = col_slice(ca, cb)
                # gather the [SB, SB] factor of superblock ca
                Lss = gather_rows(Acur, ca, ca + 1, runs)
                rows = get_rows(Acur, ra, rb, runs)
                X = lax.linalg.triangular_solve(
                    Lss, rows,
                    left_side=False, lower=True, transpose_a=True,
                )
                return set_rows(Acur, ra, runs, X)
            q = (ca + cb) // 2
            Acur = trsm(Acur, ra, rb, ca, q)
            # rows[:, q:cb] -= X1 @ L[q:cb, ca:q]ᵀ
            runs_l = col_slice(ca, q)
            runs_r = col_slice(q, cb)
            X1 = get_rows(Acur, ra, rb, runs_l)
            G = gather_rows(Acur, q, cb, runs_l)   # L[q:cb, ca:q]
            R = get_rows(Acur, ra, rb, runs_r)
            upd = jnp.matmul(X1, G.T, precision=config.precision)
            # upd columns follow G's SYSTEM row order (s, d); the
            # storage runs are device-major (d, s) — reorder.
            nsb = cb - q
            upd = upd.reshape(X1.shape[0], nsb, D, Bc)
            upd = jnp.swapaxes(upd, 1, 2).reshape(
                X1.shape[0], nsb * D * Bc
            )
            R = R - upd
            Acur = set_rows(Acur, ra, runs_r, R)
            return trsm(Acur, ra, rb, q, cb)

        # -------------------------------------------------------------
        # SYRK: A[c:b, c:b) -= L[c:b, a:c) · ᵀ   (full square; the
        # strictly-upper part is junk that later steps overwrite)
        # -------------------------------------------------------------
        def syrk(Acur, c, b, a):
            runs_l = col_slice(a, c)
            runs_t = col_slice(c, b)
            Xmine = get_rows(Acur, c, b, runs_l)     # my rows of panel
            G = gather_rows(Acur, c, b, runs_l)      # full panel
            T = get_rows(Acur, c, b, runs_t)
            # my target rows are system rows (slot, idx) — their
            # position within the gathered panel's system order:
            # slot s (c..b) ⇒ offset (s-c)*SB + idx*Bc.
            upd = jnp.matmul(Xmine, G.T, precision=config.precision)
            # upd columns are system-ordered rows of [c:b); map back to
            # storage column order of runs_t: storage col order is
            # device-major (d, s), system order is (s, d).
            nsb = b - c
            upd = upd.reshape(Xmine.shape[0], nsb, D, Bc)
            upd = jnp.swapaxes(upd, 1, 2).reshape(
                Xmine.shape[0], nsb * D * Bc
            )
            T = T - upd
            return set_rows(Acur, c, runs_t, T)

        def chol_range(Acur, a, b):
            if b - a == 1:
                return base_chol(Acur, a)
            c = (a + b) // 2
            Acur = chol_range(Acur, a, c)
            Acur = trsm(Acur, c, b, a, c)
            Acur = syrk(Acur, c, b, a)
            return chol_range(Acur, c, b)

        A = chol_range(A, 0, m)

        # zero everything strictly above the diagonal (storage coords
        # mapped through the system permutation)
        sys_row = jnp.asarray(perm)                   # [n]
        my_rows = lax.dynamic_slice(
            sys_row, (idx * m * Bc,), (m * Bc,)
        )
        rows_sys = my_rows[:, None] + jnp.zeros((1, n), jnp.int32)
        cols_sys = jnp.asarray(perm)[None, :] + jnp.zeros(
            (m * Bc, 1), jnp.int32
        )
        return jnp.where(rows_sys >= cols_sys, A, 0.0)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(K_cyc)
