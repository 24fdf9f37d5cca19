"""SPIKE-partitioned banded Cholesky (solver/spike.py): correctness
of the partitioned sparse-direct path against dense NumPy solves —
the same synthetic-SPD coverage as test_band.py, plus partition-layout
invariants (adjacency-only coupling, scatter uniqueness) and the
degenerate P=1 (no-coupling) case."""

import numpy as np
import pytest

import jax.numpy as jnp

from sanm_tpu.solver.linear import chol_refine_solve
from sanm_tpu.solver.spike import (
    DeviceSpikeBandSolver,
    SpikePlan,
    assemble_spike_scaled_neg,
    spike_factor,
    spike_factor_ok,
    spike_tri_solve_fn,
)

from helper import require_tensor_eq
from test_band import _StubAssembler, _random_sparse_spd


@pytest.mark.parametrize("nparts", [1, 2, 3])
def test_spike_factor_solve_matches_numpy(nparts):
    rng = np.random.default_rng(10 + nparts)
    n, half_bw = 601, 37  # prime-ish n: block + partition padding
    A = _random_sparse_spd(n, half_bw, rng)
    asm = _StubAssembler(A)
    plan = SpikePlan(asm.csr_rowidx, asm.csr_cols, n, nparts=nparts)
    assert plan.b >= plan.bw
    assert plan.m >= plan.b and plan.P * plan.m >= n
    data = asm.data()
    Bloc, C, s = assemble_spike_scaled_neg(plan, asm, data)
    assert Bloc.shape == (plan.P, plan.rows_loc, plan.W)
    assert C.shape == (max(plan.P - 1, 0), plan.b, plan.b)
    F = spike_factor(plan, Bloc, C)
    assert bool(spike_factor_ok(F))

    b = rng.standard_normal(n)
    x = chol_refine_solve(
        F, s, data, jnp.asarray(b), asm.matvec, 8,
        tri_solve=spike_tri_solve_fn(plan),
    )
    x_ref = np.linalg.solve(A.toarray(), b)
    require_tensor_eq(np.asarray(x), x_ref, 1e-10, msg="spike solve")


def test_spike_plan_scatter_invariants():
    rng = np.random.default_rng(20)
    n, half_bw = 800, 61
    A = _random_sparse_spd(n, half_bw, rng)
    asm = _StubAssembler(A)
    plan = SpikePlan(asm.csr_rowidx, asm.csr_cols, n, nparts=2)
    # every lower-tri nnz lands exactly once, in range, in exactly one
    # of the two stores
    nlow = int(np.sum(np.asarray(asm.csr_rowidx)
                      >= np.asarray(asm.csr_cols)))
    assert plan.loc_sel.size + plan.coup_sel.size == nlow
    li = np.asarray(plan.loc_idx, np.int64)
    assert li.min() >= 0 and li.max() < plan.P * plan.rows_loc * plan.W
    assert len(np.unique(li)) == li.size
    if plan.coup_idx.size:
        ci = np.asarray(plan.coup_idx, np.int64)
        assert ci.min() >= 0 and ci.max() < (plan.P - 1) * plan.b ** 2
        assert len(np.unique(ci)) == ci.size
    # no scatter into the trailing-update extension rows (they must
    # stay inert zeros, see spike.py pad analysis)
    row_of = (li // plan.W) % plan.rows_loc
    assert int(row_of.max()) < plan.m


def test_spike_solver_class_and_indefinite_detect():
    rng = np.random.default_rng(21)
    n = 700
    A = _random_sparse_spd(n, 23, rng)
    asm = _StubAssembler(A)
    solver = DeviceSpikeBandSolver(asm, asm.data(), nparts=2)
    assert solver.factor_ok()
    b = rng.standard_normal(n)
    x = np.asarray(solver.solve(jnp.asarray(b)))
    require_tensor_eq(
        x, np.linalg.solve(A.toarray(), b), 1e-10, msg="spike class"
    )
    asm2 = _StubAssembler(-A)
    solver2 = DeviceSpikeBandSolver(asm2, asm2.data(), nparts=2)
    assert not solver2.factor_ok()


def test_spike_matches_band_solver():
    # same system through both sparse-direct paths
    from sanm_tpu.solver.band import DeviceBandCholSolver

    rng = np.random.default_rng(22)
    n = 500
    A = _random_sparse_spd(n, 17, rng)
    asm = _StubAssembler(A)
    b = rng.standard_normal(n)
    xs = np.asarray(
        DeviceSpikeBandSolver(asm, asm.data(), nparts=3).solve(
            jnp.asarray(b)
        )
    )
    xb = np.asarray(
        DeviceBandCholSolver(asm, asm.data()).solve(jnp.asarray(b))
    )
    require_tensor_eq(xs, xb, 1e-10, msg="spike vs band")
