"""Multi-device sharding tests.

Analog of the reference's multithread tier (``tests/symbolic.cpp:631-637``
re-runs solves under ``set_num_threads(2)`` and requires identical
results): the ANM solve with the element batch sharded over the 8-device
virtual mesh must match the unsharded solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sanm_tpu.fea import (
    DeformableBody,
    EnergyModel,
    MaterialProperty,
    TetrahedralMesh,
)
from sanm_tpu.fea.app import RMS_THRESH_FORCE_EQU, run_anm_eqn
from sanm_tpu.parallel import ElemSharding
from sanm_tpu.solver import ANMEqnSolver
from sanm_tpu.solver.anm import EqnHyperParam
from helper import require_tensor_eq

MATERIAL = MaterialProperty.from_young_poisson(1e7, 0.45)


def make_problem(nx=5, ny=3, nz=3, spacing=0.025):
    mesh = TetrahedralMesh.make_cuboid(nx, ny, nz, spacing)
    body = DeformableBody(MATERIAL, mesh)
    body.coord_fixed_mask[mesh.vertices[:, 0] <= spacing / 2, :] = True
    f_load = np.zeros((mesh.nr_vertices, 3))
    sel = mesh.vertices[:, 0] > (nx - 1) * spacing - spacing / 2
    f_load[sel, 2] = -30.0
    return body, f_load


def solve(body, f_load, em, shard=None):
    model = body.make_forward(em)
    f_sub = model.lt_inp.copy_vtx_values(f_load)
    hp = EqnHyperParam(order=6, use_pade=True)
    hp.converge_rms = RMS_THRESH_FORCE_EQU
    s = ANMEqnSolver(
        model.fn, model.lt_inp.remap, model.lt_out.remap, model.x0(),
        f_sub, hp, shard_elems=shard,
    )
    return np.asarray(run_anm_eqn(s, progress=False))


@pytest.mark.parametrize(
    "em", [EnergyModel.NEOHOOKEAN_C, EnergyModel.ARAP]
)
def test_sharded_solve_matches_unsharded(em):
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    body, f_load = make_problem()
    ref = solve(body, f_load, em)
    shard = ElemSharding(jax.devices()[:8])
    with shard.mesh:
        got = solve(body, f_load, em, shard=shard)
    require_tensor_eq(got, ref, 1e-9, msg="sharded vs unsharded")


def test_sharded_dense_chol_matches_unsharded():
    """solver=dense_chol under the element mesh: the devloop row-shards
    the dense factor over the same devices and substitutes through the
    blocked panel solves (multi-chip direct solve); result must match
    the unsharded dense_chol solve."""
    body, f_load = make_problem()

    def solve_chol(shard=None):
        model = body.make_forward(EnergyModel.NEOHOOKEAN_C)
        f_sub = model.lt_inp.copy_vtx_values(f_load)
        hp = EqnHyperParam(order=6, use_pade=True, solver="dense_chol")
        hp.converge_rms = RMS_THRESH_FORCE_EQU
        s = ANMEqnSolver(
            model.fn, model.lt_inp.remap, model.lt_out.remap, model.x0(),
            f_sub, hp, shard_elems=shard,
        )
        out = np.asarray(run_anm_eqn(s, progress=False))
        assert s._loop_mode() == "hybrid" and s._solver_mode() == "dense_chol"
        return out

    ref = solve_chol()
    shard = ElemSharding(jax.devices()[:8])
    with shard.mesh:
        got = solve_chol(shard=shard)
    require_tensor_eq(got, ref, 1e-9, msg="sharded dense_chol")


def test_sharded_implicit_matches_unsharded():
    """The implicit (prescribed-displacement continuation) driver under
    element sharding: the t*delta remap column, the grad_t assembly
    split and the hybrid host_lu path must produce the same expansion
    as unsharded (reference multithread-determinism tier,
    tests/symbolic.cpp:631-637)."""
    from sanm_tpu.solver import ANMImplicitSolver
    from sanm_tpu.solver.anm import HyperParam

    mesh = TetrahedralMesh.make_cuboid(5, 3, 3, 0.025)
    body = DeformableBody(MATERIAL, mesh)
    body.coord_fixed_mask[mesh.vertices[:, 0] <= 0.0125, :] = True
    far = mesh.vertices[:, 0] > 3 * 0.025 + 0.0125
    body.coord_fixed_mask[far, :] = True
    vtx_delta = np.zeros((mesh.nr_vertices, 3))
    vtx_delta[far, 2] = 0.01  # bend the far face up by t*delta

    def solve_impl(shard=None, solver="auto"):
        model = body.make_forward(
            EnergyModel.NEOHOOKEAN_C, mesh.vertices.copy(), vtx_delta
        )
        hp = HyperParam(order=6, use_pade=True, solver=solver)
        hp.solution_check_tol = 10.0  # continuation restarts (main.cpp:513)
        s = ANMImplicitSolver(
            model.fn, model.lt_inp.remap, model.lt_out.remap,
            model.x0(), 0.0, hp, shard_elems=shard,
        )
        s.update_approx()
        return np.asarray(s.xt_coeffs), float(s.get_t_upper())

    for solver in ("auto", "host_lu"):
        ref, t_ref = solve_impl(solver=solver)
        shard = ElemSharding(jax.devices()[:8])
        with shard.mesh:
            got, t_got = solve_impl(shard=shard, solver=solver)
        assert got.shape == ref.shape
        require_tensor_eq(
            got, ref, 1e-9, msg="sharded implicit (%s)" % solver
        )
        assert abs(t_got - t_ref) <= 1e-9 * max(1.0, abs(t_ref))
