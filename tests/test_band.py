"""Banded device Cholesky (solver/band.py): the sparse-direct
factorization path.  Counterpart of the reference's PARDISO coverage
(``tests/sparse_solver.cpp``): factor/solve correctness on synthetic
SPD systems plus end-to-end driver equality (the slow-tier
``test_solver_backends_match_dense`` covers ``band_chol`` too)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sanm_tpu.solver.band import (
    BandPlan,
    DeviceBandCholSolver,
    assemble_band_scaled_neg,
    band_cholesky,
    band_factor_ok,
    band_tri_solve,
    band_tri_solve_fn,
)
from sanm_tpu.solver.linear import chol_refine_solve

from helper import require_tensor_eq


def _random_sparse_spd(n, half_bw, rng, density=0.3):
    """Random SPD matrix with entries only inside |i-j| <= half_bw
    (in a scrambled ordering, so BandPlan's RCM has real work)."""
    import scipy.sparse as sp

    rows, cols, vals = [], [], []
    for i in range(n):
        for j in range(max(0, i - half_bw), i):
            if rng.uniform() < density:
                v = rng.standard_normal() * 0.3
                rows += [i, j]
                cols += [j, i]
                vals += [v, v]
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    # diagonal dominance => SPD; negate (the solver factors -A: the
    # elastic Jacobian convention, A = -K negative definite)
    d = np.abs(A).sum(axis=1).A1 + rng.uniform(1.0, 2.0, n)
    A = A + sp.diags(d)
    # scramble the ordering so the plan's RCM actually permutes
    p = rng.permutation(n)
    A = A[p][:, p].tocoo()
    return -sp.csr_matrix((A.data, (A.row, A.col)), shape=(n, n))


class _StubAssembler:
    """Minimal SparseAssembler facade over an explicit CSR matrix."""

    def __init__(self, A):
        coo = A.tocoo()
        self.n = self.n_rows = A.shape[0]
        self.csr_rowidx = coo.row.astype(np.int32)
        self.csr_cols = coo.col.astype(np.int32)
        self._vals = coo.data.copy()
        sel = np.nonzero(self.csr_rowidx == self.csr_cols)[0]
        self._diag = (sel.astype(np.int32),
                      self.csr_rowidx[sel].astype(np.int32))

    def data(self):
        return jnp.asarray(self._vals)

    def _diag_nnz_pos(self):
        return self._diag

    def matvec(self, data, x):
        contrib = data * x[jnp.asarray(self.csr_cols)]
        return jnp.zeros((self.n,), data.dtype).at[
            jnp.asarray(self.csr_rowidx)
        ].add(contrib)


def test_band_factor_solve_matches_numpy():
    rng = np.random.default_rng(0)
    n, half_bw = 601, 37  # prime-ish n: exercises block padding
    A = _random_sparse_spd(n, half_bw, rng)
    asm = _StubAssembler(A)
    plan = BandPlan(asm.csr_rowidx, asm.csr_cols, n)
    assert plan.w * plan.s >= plan.bw
    # runs tile the block columns exactly, widths within the band
    assert plan.runs[0][0] == 0
    assert sum(ln for _, ln, _ in plan.runs) == plan.nb
    for (j0, ln, wr), (j0n, _, _) in zip(plan.runs, plan.runs[1:]):
        assert j0 + ln == j0n
        assert 0 <= wr <= plan.w
    data = asm.data()
    Bb, s = assemble_band_scaled_neg(plan, asm, data)
    Lb = band_cholesky(plan, Bb)
    assert bool(band_factor_ok(Lb))

    b = rng.standard_normal(n)
    x = chol_refine_solve(
        Lb, s, data, jnp.asarray(b), asm.matvec, 6,
        tri_solve=band_tri_solve_fn(plan),
    )
    x_ref = np.linalg.solve(A.toarray(), b)
    require_tensor_eq(np.asarray(x), x_ref, 1e-10, msg="band solve")


def test_band_tri_solve_pad_zeros():
    # pad dofs (unit diagonal, zero off-band) must solve to exact zero
    rng = np.random.default_rng(1)
    n = 100
    A = _random_sparse_spd(n, 9, rng)
    asm = _StubAssembler(A)
    plan = BandPlan(asm.csr_rowidx, asm.csr_cols, n)
    Bb, s = assemble_band_scaled_neg(plan, asm, asm.data())
    Lb = band_cholesky(plan, Bb)
    rhs = jnp.zeros((plan.nrow_tot,), jnp.float32).at[:n].set(
        jnp.asarray(rng.standard_normal(n), jnp.float32)
    )
    y = band_tri_solve(plan, Lb, rhs)
    assert bool(jnp.all(y[n:] == 0.0))


def test_band_solver_class_and_indefinite_detect():
    rng = np.random.default_rng(2)
    n = 300
    A = _random_sparse_spd(n, 15, rng)
    asm = _StubAssembler(A)
    solver = DeviceBandCholSolver(asm, asm.data())
    assert solver.factor_ok()
    b = rng.standard_normal(n)
    x = np.asarray(solver.solve(jnp.asarray(b)))
    require_tensor_eq(
        x, np.linalg.solve(A.toarray(), b), 1e-10, msg="solver class"
    )
    # indefinite input (positive definite A => -A factor fails)
    asm2 = _StubAssembler(-A)
    solver2 = DeviceBandCholSolver(asm2, asm2.data())
    assert not solver2.factor_ok()


@pytest.mark.parametrize("seed,n,half_bw", [(3, 800, 61), (4, 257, 5)])
def test_band_plan_scatter_roundtrip(seed, n, half_bw):
    # every nnz must land at a unique in-range band position
    rng = np.random.default_rng(seed)
    A = _random_sparse_spd(n, half_bw, rng)
    asm = _StubAssembler(A)
    plan = BandPlan(asm.csr_rowidx, asm.csr_cols, n)
    idx = np.asarray(plan.band_idx, np.int64)
    assert idx.min() >= 0 and idx.max() < plan.nrow_tot * plan.W
    assert len(np.unique(idx)) == idx.size
