"""Device-resident banded Cholesky: the sparse direct factorization.

Reference counterpart: the MKL-PARDISO sparse LDL^T
(``libsanm/sparse_solver.cpp:327-421`` — analyze once, factorize once
per continuation step, backsolve once per Taylor order).  PARDISO's
supernodal elimination is a CPU design: pointer-chased fronts, tiny
irregular dense blocks, threads.  The TPU-native equivalent built here
keeps the *analyze-once* structure but maps the numeric work onto the
MXU with static shapes:

* **Symbolic phase (host, once per topology)**: the stiffness sparsity
  is topology-static, so a reverse-Cuthill-McKee ordering of the DOF
  graph is computed once.  On the reference meshes RCM leaves a small
  band (measured: armadillo-small n=40995 -> semi-bandwidth 6104,
  human n=76977 -> 5228, bob n=23097 -> 3350), so a *banded* blocked
  Cholesky needs ~n*b^2 FLOPs and n*(2w+1)s memory — at armadillo
  scale ~8x fewer FLOPs and ~3x less HBM than the dense n^2 factor
  (and human, 23.7 GB dense, fits in 4.8 GB).  The phase emits static
  gather/scatter index maps; nothing symbolic happens per restart.
* **Numeric phase (device, once per restart)**: a ``fori_loop`` over
  block columns; each step is one s x s Cholesky, one batched
  triangular solve, and one (s, w*s) x (w*s, w*s) MXU update — all
  static shapes, no data-dependent control flow.
* **Backsolve (device, once per Taylor order)**: blocked forward /
  backward substitution touching one ((w+1)s, s) column panel per
  step; the whole factor streams through HBM once per substitution
  pass (~1.4 GB at armadillo scale vs 6.7 GB for the dense factor).

Two storage layouts are used:

* **Working band (factorization carry)**: block-row windows over the
  LOWER band only.  ``Bb[(i*s + r), c]`` holds
  ``A[i*s + r, (i - w)*s + c]`` for block-row ``i``, i.e. each block
  row stores its ``(w+1)s``-wide lower diagonal window (the matrix is
  symmetric and Cholesky reads only the lower triangle, so the upper
  nnz are simply not scattered).  The trailing update of block column
  ``j`` lands at *contiguous* window columns of each affected block
  row — for target row-block ``j+1+m`` only the ``p <= m`` column
  blocks are in the lower triangle, a contiguous ``(m+1)s``-wide strip
  (static width per unrolled ``m``).  This buffer is a transient
  inside the factor program, carried through a ``lax.scan`` whose
  per-step *outputs* are the factored column panels — outputs are
  written into a preallocated stack, so the persistent factor is never
  double-buffered the way a second loop carry would be.
* **Factor output (persistent, read by every backsolve)**: block-
  column panels ``Lc (nb, (w+1)s, s)`` — panel ``j`` stacks the
  diagonal block ``L[j,j]`` (rows 0:s) over the w subdiagonal blocks
  ``L[j+1+m, j]``.  Both substitution loops slice only the leading
  axis, so XLA keeps ONE layout for the factor; the first (band-row)
  design made the backward loop prefer the transposed layout and XLA
  materialized a full 2.8 GB transposed copy of the factor per solve
  (measured via ``memory_analysis`` at armadillo scale — the OOM /
  HBM-traffic root cause).  The panel layout is also ~45% smaller
  (no upper scratch): 1.4 GB vs 2.8 GB at armadillo n=40995.

Precision mirrors :class:`~sanm_tpu.solver.linear.DeviceCholSolver`:
f32 factorization (MXU) + f64 iterative refinement through the exact
sparse operator (``chol_refine_solve``), on the Jacobi-equilibrated,
sign-flipped system (elastic stiffness is negative definite at stable
states).  An indefinite state propagates NaN through the factor
diagonal; callers detect it and fall back to host LU exactly like the
dense path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import lax

from ..utils import sanm_assert


class BandPlan:
    """Host-side symbolic analysis: RCM ordering + band layout + the
    static assembly scatter map.  Built once per topology (the ANM
    analog of PARDISO phase 11 'analyze', which the reference likewise
    runs once and reuses, ``sparse_solver.cpp:340-352``)."""

    def __init__(self, csr_rowidx, csr_cols, n: int):
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        r = np.asarray(csr_rowidx, np.int64)
        c = np.asarray(csr_cols, np.int64)
        self.n = int(n)
        pat = sp.csr_matrix(
            (np.ones(r.size, np.float32), (r, c)), shape=(n, n)
        )
        perm = np.asarray(
            reverse_cuthill_mckee(pat, symmetric_mode=True), np.int64
        )
        invp = np.empty(n, np.int64)
        invp[perm] = np.arange(n)
        rp, cp = invp[r], invp[c]
        bw = int(np.abs(rp - cp).max()) if r.size else 1

        # block size: smallest power of two (>=256) with <=3 panel
        # blocks in the band — bigger panels mean fewer sequential
        # fori steps and larger MXU ops at slightly more junk FLOPs
        s = 256
        while s < 4096 and (bw + 1) / s > 3:
            s *= 2
        w = max(1, -(-bw // s))
        self.s, self.w = s, w
        self.bw = bw
        nb = -(-n // s)
        self.nb = nb
        self.nrow_tot = (nb + w) * s
        self.W = (w + 1) * s

        # assembly scatter: LOWER-triangle nnz entry e -> flat band
        # position.  Window column of global (r', c') in block-row
        # i = r'//s is c' - (i - w)*s; for r' >= c' it lies in
        # [0, (w+1)s) since r' - c' <= bw <= w*s.  The upper triangle
        # is never scattered (symmetric input, Cholesky reads lower).
        low = np.nonzero(rp >= cp)[0]
        self.band_sel = low.astype(
            np.int32 if r.size < 2**31 else np.int64
        )
        flat = rp[low] * self.W + (cp[low] - (rp[low] // s) * s + w * s)
        top = self.nrow_tot * self.W
        self.band_idx = (
            flat.astype(np.int32) if top < 2**31 else flat
        )
        # unit-diagonal pad positions (dofs n .. nrow_tot)
        d = np.arange(n, self.nrow_tot, dtype=np.int64)
        padflat = d * self.W + (d % s + w * s)
        self.pad_idx = (
            padflat.astype(np.int32) if top < 2**31 else padflat
        )
        # factor-diagonal gather (for the finite/indefinite check),
        # indexing the flattened column-panel factor Lc (nb, (w+1)s, s):
        # dof d -> panel d//s, local row d%s, column d%s
        dr = np.arange(n, dtype=np.int64)
        panel_sz = (w + 1) * s * s
        dflat = (dr // s) * panel_sz + (dr % s) * s + (dr % s)
        ftop = nb * panel_sz
        self.diag_idx = (
            dflat.astype(np.int32) if ftop < 2**31 else dflat
        )
        # permutation extended over the pad region (identity there),
        # for solves on chol_refine_solve's zero-extended RHS
        self.perm_ext = np.concatenate(
            [perm, np.arange(n, self.nrow_tot, dtype=np.int64)]
        ).astype(np.int32 if self.nrow_tot < 2**31 else np.int64)
        self.invp_ext = np.concatenate(
            [invp, np.arange(n, self.nrow_tot, dtype=np.int64)]
        ).astype(self.perm_ext.dtype)

    def mem_bytes(self) -> int:
        """Persistent factor bytes (column-panel layout, f32)."""
        return 4 * self.nb * (self.w + 1) * self.s * self.s

    def work_mem_bytes(self) -> int:
        """Transient working-band bytes during factorization (f32)."""
        return 4 * self.nrow_tot * self.W


def assemble_band_scaled_neg(plan: BandPlan, asm, data):
    """``-(D A D)`` scattered straight into band storage (f32), with
    ``D = diag(s)`` the Jacobi equilibration — the banded counterpart
    of ``SparseAssembler.assemble_dense_scaled_neg`` (same sign/scale
    conventions, documented there).  Returns ``(Bb, s)``."""
    pos, prow = asm._diag_nnz_pos()
    n = plan.n
    d = jnp.zeros((n,), data.dtype).at[jnp.asarray(prow)].set(
        data[jnp.asarray(pos)]
    )
    d = jnp.abs(d)
    s = lax.rsqrt(jnp.where(d > 0, d, 1.0))
    sel = jnp.asarray(plan.band_sel)
    rows = jnp.asarray(asm.csr_rowidx)[sel]
    cols = jnp.asarray(asm.csr_cols)[sel]
    vals = (-(data[sel] * s[rows] * s[cols])).astype(jnp.float32)
    flat = jnp.zeros((plan.nrow_tot * plan.W,), jnp.float32)
    flat = flat.at[jnp.asarray(plan.band_idx)].set(vals)
    flat = flat.at[jnp.asarray(plan.pad_idx)].set(1.0)
    return flat.reshape(plan.nrow_tot, plan.W), s


def band_cholesky(Bb, s_blk: int, w: int):
    """Right-looking blocked Cholesky of the band-stored SPD matrix.

    One ``fori_loop`` step per block column: factor the s x s diagonal
    block, solve the w subdiagonal panels against it, subtract the
    (w*s) x (w*s) outer product from the trailing windows.  The w inner
    updates are unrolled (w is a small static int).  NaNs from an
    indefinite input propagate to the factor diagonal.

    Returns the factor in column-panel layout ``Lc (nb, (w+1)s, s)``
    (see module docstring); the working band ``Bb`` is the scan carry
    the compiler updates in place and frees at return — factored
    panels leave the loop as scan outputs and are never written back
    into it (right-looking elimination reads each panel exactly once,
    at its own column step)."""
    nrow_tot, W = Bb.shape
    nb = nrow_tot // s_blk - w

    def step(Bb, j):
        c0 = j * s_blk
        D = lax.dynamic_slice(Bb, (c0, w * s_blk), (s_blk, s_blk))
        # no symmetrize: the window stores only the lower triangle, the
        # upper half of D is unscattered junk (jnp.linalg.cholesky
        # would average it in)
        Ljj = lax.linalg.cholesky(D, symmetrize_input=False)
        # subdiagonal panels: block (j+1+m, j) sits in block-row j+1+m
        # at window offset (w-1-m)*s
        P = jnp.stack([
            lax.dynamic_slice(
                Bb, ((j + 1 + m) * s_blk, (w - 1 - m) * s_blk),
                (s_blk, s_blk),
            )
            for m in range(w)
        ])
        T = jax.vmap(
            lambda Pm: jsl.solve_triangular(Ljj, Pm.T, lower=True).T
        )(P)
        # U[m] = T[m] @ [T_0 .. T_{w-1}]^T laid out as (s, w*s); block
        # (j+1+m, j+1+p) sits at window offset (w-m+p)*s.  Only the
        # p <= m blocks are in the lower band: a contiguous strip of
        # static width (m+1)s starting at (w-m)s.
        U = jnp.einsum(
            "mab,pcb->mapc", T, T, precision="highest"
        ).reshape(w, s_blk, w * s_blk)
        for m in range(w):
            r0 = (j + 1 + m) * s_blk
            coff = (w - m) * s_blk
            width = (m + 1) * s_blk
            seg = lax.dynamic_slice(Bb, (r0, coff), (s_blk, width))
            Bb = lax.dynamic_update_slice(
                Bb, seg - U[m, :, :width], (r0, coff)
            )
        panel = jnp.concatenate(
            [Ljj, T.reshape(w * s_blk, s_blk)], axis=0
        )
        return Bb, panel

    return lax.scan(step, Bb, jnp.arange(nb))[1]


def band_tri_solve(Lc, s_blk: int, w: int, rhs):
    """``(L L^T)^{-1} rhs`` through the column-panel factor: blocked
    forward then backward substitution, one ((w+1)s, s) panel per step.
    ``rhs`` is the full padded vector (``nrow_tot``,) in PERMUTED
    ordering; pad entries solve to exact zeros (unit diagonal, zero
    panels).  Both loops slice ``Lc`` only along axis 0, so the factor
    keeps a single layout (no transposed-copy materialization — see
    module docstring)."""
    nb = Lc.shape[0]

    def panel(j):
        Pf = lax.dynamic_slice(
            Lc, (j, 0, 0), (1, (w + 1) * s_blk, s_blk)
        )[0]
        return Pf[:s_blk], Pf[s_blk:]

    def fwd(j, r):
        c0 = j * s_blk
        Ljj, Pm = panel(j)
        rj = lax.dynamic_slice(r, (c0,), (s_blk,))
        yj = jsl.solve_triangular(Ljj, rj, lower=True)
        seg = lax.dynamic_slice(r, (c0 + s_blk,), (w * s_blk,))
        r = lax.dynamic_update_slice(r, seg - Pm @ yj, (c0 + s_blk,))
        return lax.dynamic_update_slice(r, yj, (c0,))

    y = lax.fori_loop(0, nb, fwd, rhs)

    def bwd(jj, y):
        j = nb - 1 - jj
        c0 = j * s_blk
        Ljj, Pm = panel(j)
        xs = lax.dynamic_slice(y, (c0 + s_blk,), (w * s_blk,))
        yj = lax.dynamic_slice(y, (c0,), (s_blk,)) - xs @ Pm
        xj = jsl.solve_triangular(Ljj, yj, lower=True, trans=1)
        return lax.dynamic_update_slice(y, xj, (c0,))

    return lax.fori_loop(0, nb, bwd, y)


def band_tri_solve_fn(plan: BandPlan):
    """The ``tri_solve(L, rf)`` hook for
    :func:`~sanm_tpu.solver.linear.chol_refine_solve`: gathers the
    zero-extended RHS into RCM ordering, runs the banded substitutions,
    and scatters back — the permutation lives entirely inside the
    factor's backsub, invisible to the refinement loop (whose residual
    matvec runs in original ordering)."""
    s_blk, w = plan.s, plan.w

    def tri(Lc, rf):
        pad = plan.nrow_tot - rf.shape[0]
        if pad:  # zero-extend to the padded length (exact-zero solves)
            rf = jnp.concatenate([rf, jnp.zeros((pad,), rf.dtype)])
        rfp = rf[jnp.asarray(plan.perm_ext)]
        yp = band_tri_solve(Lc, s_blk, w, rfp)
        return yp[jnp.asarray(plan.invp_ext)]

    return tri


class DeviceBandCholSolver:
    """Factorize-once / backsolve-N-times on the device, sparse-direct
    edition: drop-in sibling of
    :class:`~sanm_tpu.solver.linear.DeviceCholSolver` with the dense
    n^2 factor replaced by the RCM band factor.  Same external
    contract: ``factor_ok()`` flags an indefinite state (driver falls
    back to host LU), ``solve`` runs f32 backsub + f64 refinement."""

    def __init__(self, assembler, data, l2_penalty: float = 0.0,
                 refine_steps: int = 8):
        from .linear import chol_refine_solve
        from ..jit_util import jit_hoist_consts

        sanm_assert(l2_penalty == 0.0,
                    "band_chol: Tikhonov mode not supported")
        self.assembler = assembler
        self._data = data
        self.n = assembler.n
        self.refine_steps = int(refine_steps)
        self.plan = BandPlan(
            assembler.csr_rowidx, assembler.csr_cols, self.n
        )
        plan = self.plan
        tri = band_tri_solve_fn(plan)

        def factor(data):
            Bb, s = assemble_band_scaled_neg(plan, assembler, data)
            Lb = band_cholesky(Bb, plan.s, plan.w)
            return Lb, s

        self._factor_jit = jit_hoist_consts(factor)
        self._L, self._s = self._factor_jit(data)

        def solve(L, s, data, b):
            return chol_refine_solve(
                L, s, data, b, assembler.matvec, self.refine_steps,
                tri_solve=tri,
            )

        self._solve_jit = jit_hoist_consts(solve)

    def factor_ok(self) -> bool:
        diag = jax.jit(
            lambda L: jnp.isfinite(
                L.reshape(-1)[jnp.asarray(self.plan.diag_idx)]
            ).all()
        )(self._L)
        return bool(diag)

    def solve(self, b):
        return self._solve_jit(self._L, self._s, self._data,
                               jnp.asarray(b).reshape(-1))

    def apply(self, x):
        return self.assembler.matvec(self._data, jnp.asarray(x).reshape(-1))

    def coeff_l2(self):
        return jnp.sqrt(jnp.sum(self._data * self._data))
