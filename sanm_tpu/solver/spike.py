"""SPIKE-partitioned banded Cholesky: parallel sparse direct solve.

The skyline/banded factor (``solver/band.py``) loses above bob scale
for one measured reason (RESULTS round-5): the per-Taylor-order
substitution is a SEQUENTIAL chain of ``2 * n/s`` panel steps, and at
armadillo scale (n=40995, s=2048) that latency-bound chain — not
FLOPs, not bandwidth — dominates the solve.  The reference does not
have this problem: PARDISO's backsolve tree runs on a 32-thread CPU
with ~us dispatch latency (``libsanm/sparse_solver.cpp:154-180``).

The TPU-native fix is the classic SPIKE partitioning (Sameh et al.):
split the RCM-banded matrix into ``P`` diagonal blocks

    A = blkdiag(A_0..A_{P-1}) + adjacent couplings C_p,

where ``C_p`` (b x b, b = w*s >= semi-bandwidth) couples the bottom-b
rows of partition p with the top-b rows of partition p+1.  Then:

* **Local factors** (once per restart): each ``A_p`` (a principal
  submatrix, hence SPD) gets its own uniform-band blocked Cholesky.
  The P factorizations are *batched* with ``vmap`` — on one chip the
  partition axis becomes an MXU batch dimension, on a device mesh it
  is the natural shard axis.  Sequential chain: ``m/s`` steps instead
  of ``n/s``.
* **Spikes** (once per restart): ``V_p = A_p^{-1} [0; C_p^T]``,
  ``W_p = A_p^{-1} [C_{p-1}; 0]`` (m x b each), computed by the same
  batched banded backsolve with b right-hand sides — pure MXU GEMMs.
* **Reduced system** (once per restart): writing ``t_p/u_p`` for the
  top/bottom b rows of ``x_p``, eliminating the interior leaves the
  2Pb-unknown block-tridiagonal system

      t_p + Wt_p u_{p-1} + Vt_p t_{p+1} = gt_p
      u_p + Wb_p u_{p-1} + Vb_p t_{p+1} = gu_p .

  Block-Thomas elimination on it simplifies structurally: the Schur
  blocks ``S_p = [[K_p, 0], [-G_p, I]]`` are block lower-triangular
  with a single dense ``K_p = I - Wt_p Mhb_{p-1}`` (b x b) to
  LU-factor per partition — not 2b x 2b.
* **Per-order backsolve** (the hot path): one batched local banded
  solve (m/s chain), a P-step reduced Thomas recursion of b x b
  triangular solves/matvecs, and one batched rank-b recombination
  ``x_p = g_p - V_p t_{p+1} - W_p u_{p-1}``.  The sequential chain
  shrinks by ~P; everything widened to MXU-shaped GEMMs.

Cost model vs the skyline factor: SPIKE pays ~2x the factorization
FLOPs (spikes + reduced precompute, all once per restart, all batched
GEMMs) to cut the per-order *latency* chain by P.  Validity needs
``m >= b`` (couplings only reach the adjacent partition), which caps
``P <= n / (w*s)`` — 6 at armadillo scale, 14 at human scale.

Precision contract matches :class:`~sanm_tpu.solver.band.
DeviceBandCholSolver`: f32 factor of the Jacobi-equilibrated
sign-flipped system + f64 iterative refinement through the exact
sparse operator; NaN propagates to the factor on indefinite states
and callers fall back to host LU.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

import numpy as np

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import lax

from ..utils import sanm_assert


def default_nparts(n: int, b: int) -> int:
    """Partition count: SANM_SPIKE_P override, else the largest power
    of two <= min(8, n // b) (m >= b validity bound), at least 1."""
    env = int(os.environ.get("SANM_SPIKE_P", "0"))
    if env > 0:
        return env
    cap = max(1, n // max(b, 1))
    p = 1
    while p * 2 <= min(8, cap):
        p *= 2
    return p


class SpikePlan:
    """Host-side symbolic analysis (once per topology): RCM ordering,
    partition layout, and the static scatter maps into the per-
    partition band storage and the coupling corner blocks."""

    def __init__(self, csr_rowidx, csr_cols, n: int,
                 nparts: int | None = None):
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

        # block size: same heuristic as BandPlan (band.py:109-117)
        s = int(os.environ.get("SANM_BAND_S", "0"))
        if s <= 0:
            s = 256
            while s < 4096 and (bw + 1) / s > 3:
                s *= 2
        w = max(1, -(-bw // s))
        self.s, self.w = s, w
        self.bw = bw
        self.b = w * s  # coupling width (block-aligned)

        P = nparts if nparts is not None else default_nparts(n, self.b)
        # m: rows per partition — multiple of s, >= b (adjacency), and
        # P*m >= n
        m = max(self.b, -(-n // (P * s)) * s)
        self.P, self.m = int(P), int(m)
        sanm_assert(self.m >= self.b,
                    "spike: partition smaller than bandwidth")
        self.mb = m // s
        self.rows_loc = (self.mb + w) * s  # + trailing-update window
        self.W = (w + 1) * s
        ntot = P * m

        # ---- scatter maps (lower triangle) ---------------------------
        low = np.nonzero(rp >= cp)[0]
        lr_, lc_ = rp[low], cp[low]
        part = lr_ // m
        local = lc_ >= part * m
        # in-partition entries -> per-partition band storage
        # (same (row, window) layout as band.py's working band)
        il = np.nonzero(local)[0]
        p_i, r_i, c_i = part[il], lr_[il] - part[il] * m, \
            lc_[il] - part[il] * m
        off = c_i - (r_i // s) * s + w * s
        sanm_assert(int(off.min(initial=0)) >= 0
                    and int(off.max(initial=0)) < self.W,
                    "spike: local band offset out of range")
        flat = (p_i * self.rows_loc + r_i) * self.W + off
        self.loc_sel = low[il].astype(
            np.int32 if r.size < 2**31 else np.int64
        )
        top = P * self.rows_loc * self.W
        self.loc_idx = flat.astype(np.int32 if top < 2**31 else np.int64)
        # coupling entries -> corner blocks C_{p-1} (b x b): row in
        # partition p's top-b, col in partition p-1's bottom-b
        ic = np.nonzero(~local)[0]
        p_c, rr, cc = part[ic], lr_[ic], lc_[ic]
        sanm_assert(bool(np.all(cc >= (p_c - 1) * m)),
                    "spike: coupling spans non-adjacent partitions")
        rloc = rr - p_c * m
        cloc = cc - (p_c * m - self.b)
        sanm_assert(int(rloc.max(initial=0)) < self.b
                    and int(cloc.min(initial=0)) >= 0,
                    "spike: coupling outside corner block")
        cflat = ((p_c - 1) * self.b + rloc) * self.b + cloc
        self.coup_sel = low[ic].astype(self.loc_sel.dtype)
        ctop = max(1, (P - 1)) * self.b * self.b
        self.coup_idx = cflat.astype(
            np.int32 if ctop < 2**31 else np.int64
        )

        # unit-diagonal pad: global rows >= n plus per-partition
        # trailing-window extension rows (lr in [m, rows_loc))
        pads = []
        for p in range(P):
            lo = max(0, n - p * m)
            lr = np.arange(lo, self.rows_loc, dtype=np.int64)
            # skip real rows (global < n) in [0, m)
            lr = lr[(lr >= m) | (p * m + lr >= n)]
            pads.append(
                (p * self.rows_loc + lr) * self.W + (lr % s + w * s)
            )
        padflat = np.concatenate(pads) if pads else np.zeros(0, np.int64)
        self.pad_idx = padflat.astype(self.loc_idx.dtype)

        # permutation extended over the partition pad (identity there)
        self.perm_ext = np.concatenate(
            [perm, np.arange(n, ntot, dtype=np.int64)]
        ).astype(np.int32 if ntot < 2**31 else np.int64)
        self.invp_ext = np.concatenate(
            [invp, np.arange(n, ntot, dtype=np.int64)]
        ).astype(self.perm_ext.dtype)

        self._shim = SimpleNamespace(s=s, w=w, runs=[(0, self.mb, w)])

    def mem_bytes(self) -> int:
        """Persistent factor bytes (local panels + spikes + reduced)."""
        P, m, b = self.P, self.m, self.b
        panels = 4 * P * self.mb * self.W * self.s
        spikes = 4 * 2 * P * m * b
        reduced = 4 * P * b * b * 5  # lu, G, Mht, Mhb, Wt/Wb approx
        return panels + spikes + reduced


def assemble_spike_scaled_neg(plan: SpikePlan, asm, data):
    """``-(D A D)`` scattered into per-partition band storage plus the
    coupling corner blocks (f32); same equilibration/sign conventions
    as ``assemble_band_scaled_neg`` (band.py:225-244).  Returns
    ``(Bloc (P, rows_loc, W), C (P-1, b, b), s)``."""
    pos, prow = asm._diag_nnz_pos()
    n = plan.n
    d = jnp.zeros((n,), data.dtype).at[jnp.asarray(prow)].set(
        data[jnp.asarray(pos)]
    )
    d = jnp.abs(d)
    s = lax.rsqrt(jnp.where(d > 0, d, 1.0))
    rows = jnp.asarray(asm.csr_rowidx)
    cols = jnp.asarray(asm.csr_cols)

    def scaled(sel):
        sel = jnp.asarray(sel)
        return (-(data[sel] * s[rows[sel]] * s[cols[sel]])).astype(
            jnp.float32
        )

    flat = jnp.zeros((plan.P * plan.rows_loc * plan.W,), jnp.float32)
    flat = flat.at[jnp.asarray(plan.loc_idx)].set(scaled(plan.loc_sel))
    flat = flat.at[jnp.asarray(plan.pad_idx)].set(1.0)
    Bloc = flat.reshape(plan.P, plan.rows_loc, plan.W)
    nc = max(plan.P - 1, 0)
    cf = jnp.zeros((nc * plan.b * plan.b,), jnp.float32)
    if nc and plan.coup_sel.size:
        cf = cf.at[jnp.asarray(plan.coup_idx)].set(scaled(plan.coup_sel))
    C = cf.reshape(nc, plan.b, plan.b)
    return Bloc, C, s


def uband_tri_solve(shim, panels, R):
    """``(L L^T)^{-1} R`` through ONE uniform-width run of column
    panels (the local per-partition factor): blocked forward/backward
    substitution on a 2-D RHS ``R (rows_loc, k)`` — matrix edition of
    ``band_tri_solve`` (band.py:321-366), k right-hand sides per panel
    step so the substitutions are MXU GEMMs.

    All matmuls run at ``precision='highest'`` (enforced by the
    ``default_matmul_precision`` scope in the callers): the TPU's
    default f32 matmul is a bf16-pass approximation, measured to sink
    the f32 factor below the refinement gate's quality bar (the same
    rule band.py applies per-einsum)."""
    (j0, ln, wr), = shim.runs
    s_blk = shim.s

    def fwd(r, xs):
        Pf, j = xs
        c0 = j * s_blk
        inv, Pm = Pf[:s_blk], Pf[s_blk:]
        rj = lax.dynamic_slice(r, (c0, 0), (s_blk, r.shape[1]))
        yj = inv @ rj
        if wr:
            seg = lax.dynamic_slice(
                r, (c0 + s_blk, 0), (wr * s_blk, r.shape[1])
            )
            r = lax.dynamic_update_slice(
                r, seg - Pm @ yj, (c0 + s_blk, 0)
            )
        return lax.dynamic_update_slice(r, yj, (c0, 0)), None

    r = lax.scan(fwd, R, (panels, jnp.arange(j0, j0 + ln)))[0]

    def bwd(y, xs):
        Pf, j = xs
        c0 = j * s_blk
        inv, Pm = Pf[:s_blk], Pf[s_blk:]
        yj = lax.dynamic_slice(y, (c0, 0), (s_blk, y.shape[1]))
        if wr:
            below = lax.dynamic_slice(
                y, (c0 + s_blk, 0), (wr * s_blk, y.shape[1])
            )
            yj = yj - Pm.T @ below
        xj = inv.T @ yj
        return lax.dynamic_update_slice(y, xj, (c0, 0)), None

    return lax.scan(
        bwd, r, (panels, jnp.arange(j0, j0 + ln)), reverse=True
    )[0]


def spike_factor(plan: SpikePlan, Bloc, C):
    """Numeric phase (once per restart): batched local band Cholesky,
    spike computation, and the reduced block-Thomas precompute.
    Returns the factor pytree consumed by :func:`spike_tri_solve`."""
    with jax.default_matmul_precision("highest"):
        return _spike_factor_impl(plan, Bloc, C)


def _spike_factor_impl(plan: SpikePlan, Bloc, C):
    from .band import band_cholesky

    shim = plan._shim
    P, m, b, s_blk = plan.P, plan.m, plan.b, plan.s

    Lloc = jax.vmap(lambda Bb: band_cholesky(shim, Bb)[0])(Bloc)

    # spike right-hand sides: W_p <- C_{p-1} in the TOP b rows,
    # V_p <- C_p^T in the BOTTOM b rows (zero blocks at the chain ends
    # keep shapes static)
    zc = jnp.zeros((1, b, b), jnp.float32)
    Cw = jnp.concatenate([zc, C], axis=0) if P > 1 else zc[:P]
    Cv = (jnp.concatenate([jnp.swapaxes(C, 1, 2), zc], axis=0)
          if P > 1 else zc[:P])

    def local_solve(panels, R):
        return uband_tri_solve(shim, panels, R)

    # solve the 2b spike columns in s-sized chunks to bound the
    # substitution carry (rows_loc x b at b=6144 is ~0.6 GB/partition)
    def spike_solve(place_top: bool, Cblk):
        cols = []
        for c0 in range(0, b, s_blk):
            R = jnp.zeros((P, plan.rows_loc, s_blk), jnp.float32)
            blk = Cblk[:, :, c0:c0 + s_blk]
            at = 0 if place_top else m - b
            R = lax.dynamic_update_slice(R, blk, (0, at, 0))
            cols.append(jax.vmap(local_solve)(Lloc, R)[:, :m])
        return jnp.concatenate(cols, axis=2)

    Wsp = spike_solve(True, Cw)    # (P, m, b)
    Vsp = spike_solve(False, Cv)   # (P, m, b)
    Wt, Wb = Wsp[:, :b], Wsp[:, m - b:]
    Vt, Vb = Vsp[:, :b], Vsp[:, m - b:]

    # reduced block-Thomas precompute (P static, loop unrolled in jit):
    # S_p = [[K_p, 0], [-G_p, I]],  K_p = I - Wt_p @ Mhb_{p-1},
    # G_p = Wb_p @ Mhb_{p-1},  Mhat_p = S_p^{-1} [Vt_p; Vb_p]
    eye = jnp.eye(b, dtype=jnp.float32)
    lus, pivs, Gs, Mhts, Mhbs = [], [], [], [], []
    Mhb_prev = jnp.zeros((b, b), jnp.float32)
    for p in range(P):
        K = eye - Wt[p] @ Mhb_prev
        G = Wb[p] @ Mhb_prev
        lu, piv = jsl.lu_factor(K)
        Mht = jsl.lu_solve((lu, piv), Vt[p])
        Mhb = Vb[p] + G @ Mht
        lus.append(lu)
        pivs.append(piv)
        Gs.append(G)
        Mhts.append(Mht)
        Mhbs.append(Mhb)
        Mhb_prev = Mhb
    F = dict(
        Lloc=Lloc, V=Vsp, W=Wsp, Wt=Wt, Wb=Wb,
        lu=jnp.stack(lus), piv=jnp.stack(pivs), G=jnp.stack(Gs),
        Mht=jnp.stack(Mhts), Mhb=jnp.stack(Mhbs),
    )
    return F


def spike_factor_ok(F):
    """All-finite check (NaN from an indefinite local block propagates
    through the spikes and the reduced factors)."""
    ok = jnp.isfinite(F["Lloc"]).all()
    for k in ("V", "W", "lu", "G", "Mht", "Mhb"):
        ok = jnp.logical_and(ok, jnp.isfinite(F[k]).all())
    return ok


def spike_tri_solve(plan: SpikePlan, F, rf):
    """``A^{-1} rf`` through the SPIKE factor (f32, permuted handled
    internally): batched local solve, reduced Thomas recursion,
    rank-b recombination.  ``rf`` is length n (or longer, zero-pad
    tolerated); returns length ``P*m`` — callers slice ``[:n]``."""
    with jax.default_matmul_precision("highest"):
        return _spike_tri_solve_impl(plan, F, rf)


def _spike_tri_solve_impl(plan: SpikePlan, F, rf):
    P, m, b = plan.P, plan.m, plan.b
    ntot = P * m
    pad = ntot - rf.shape[0]
    if pad > 0:
        rf = jnp.concatenate([rf, jnp.zeros((pad,), rf.dtype)])
    rfp = rf[jnp.asarray(plan.perm_ext)].reshape(P, m)
    rext = jnp.concatenate(
        [rfp, jnp.zeros((P, plan.rows_loc - m), rf.dtype)], axis=1
    )

    shim = plan._shim
    g = jax.vmap(
        lambda panels, r: uband_tri_solve(shim, panels, r[:, None])[:, 0]
    )(F["Lloc"], rext)[:, :m]

    gt, gu = g[:, :b], g[:, m - b:]
    # forward: y_p = S_p^{-1} (r_p - [Wt_p yu_{p-1}; Wb_p yu_{p-1}])
    yts, yus = [], []
    yu_prev = jnp.zeros((b,), g.dtype)
    for p in range(P):
        ct = gt[p] - F["Wt"][p] @ yu_prev
        cu = gu[p] - F["Wb"][p] @ yu_prev
        yt = jsl.lu_solve((F["lu"][p], F["piv"][p]), ct)
        yu = cu + F["G"][p] @ yt
        yts.append(yt)
        yus.append(yu)
        yu_prev = yu
    # backward: z_p = y_p - Mhat_p @ zt_{p+1}
    zts = [None] * P
    zus = [None] * P
    zt_next = jnp.zeros((b,), g.dtype)
    for p in range(P - 1, -1, -1):
        zts[p] = yts[p] - F["Mht"][p] @ zt_next
        zus[p] = yus[p] - F["Mhb"][p] @ zt_next
        zt_next = zts[p]
    zt = jnp.stack(zts)          # (P, b) = t_p
    zu = jnp.stack(zus)          # (P, b) = u_p
    # recombination: x_p = g_p - V_p t_{p+1} - W_p u_{p-1}
    t_next = jnp.concatenate([zt[1:], jnp.zeros((1, b), g.dtype)])
    u_prev = jnp.concatenate([jnp.zeros((1, b), g.dtype), zu[:-1]])
    x = g - jnp.einsum("pmb,pb->pm", F["V"], t_next) \
        - jnp.einsum("pmb,pb->pm", F["W"], u_prev)
    return x.reshape(ntot)[jnp.asarray(plan.invp_ext)]


def spike_tri_solve_fn(plan: SpikePlan):
    """The ``tri_solve(F, rf)`` hook for ``chol_refine_solve`` —
    same contract as ``band_tri_solve_fn`` (band.py:369-385)."""

    def tri(F, rf):
        return spike_tri_solve(plan, F, rf)

    return tri


class DeviceSpikeBandSolver:
    """Factorize-once / backsolve-N-times, SPIKE edition: drop-in
    sibling of :class:`~sanm_tpu.solver.band.DeviceBandCholSolver`
    (same external contract) with the sequential skyline substitution
    replaced by the partition-batched SPIKE solve."""

    def __init__(self, assembler, data, l2_penalty: float = 0.0,
                 refine_steps: int = 8, nparts: int | None = None):
        from .linear import chol_refine_solve
        from ..jit_util import jit_hoist_consts

        sanm_assert(l2_penalty == 0.0,
                    "spike_band: Tikhonov mode not supported")
        self.assembler = assembler
        self._data = data
        self.n = assembler.n
        self.refine_steps = int(refine_steps)
        self.plan = SpikePlan(
            assembler.csr_rowidx, assembler.csr_cols, self.n,
            nparts=nparts,
        )
        plan = self.plan
        tri = spike_tri_solve_fn(plan)

        def factor(data):
            Bloc, C, s = assemble_spike_scaled_neg(plan, assembler, data)
            return spike_factor(plan, Bloc, C), s

        self._factor_jit = jit_hoist_consts(factor)
        self._F, self._s = self._factor_jit(data)

        def solve(F, s, data, b):
            return chol_refine_solve(
                F, s, data, b, assembler.matvec, self.refine_steps,
                tri_solve=tri,
            )

        self._solve_jit = jit_hoist_consts(solve)

    def factor_ok(self) -> bool:
        return bool(jax.jit(spike_factor_ok)(self._F))

    def solve(self, b):
        return self._solve_jit(self._F, self._s, self._data,
                               jnp.asarray(b).reshape(-1))

    def apply(self, x):
        return self.assembler.matvec(
            self._data, jnp.asarray(x).reshape(-1)
        )

    def coeff_l2(self):
        return jnp.sqrt(jnp.sum(self._data * self._data))
