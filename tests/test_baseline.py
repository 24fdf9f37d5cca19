"""Baseline solver tests (projected Newton, LevMar) — ports of the
reference baseline validation: the baseline and the ANM solver must
agree on the equilibrium of the same problem."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sanm_tpu.fea import (
    DeformableBody,
    EnergyModel,
    MaterialProperty,
    TetrahedralMesh,
)
from sanm_tpu.fea import baseline
from sanm_tpu.fea.app import RMS_THRESH_FORCE_EQU, run_anm_eqn
from sanm_tpu.solver import ANMEqnSolver
from sanm_tpu.solver.anm import EqnHyperParam
from helper import require_tensor_eq

MATERIAL = MaterialProperty.from_young_poisson(1e7, 0.45)


def make_problem(nx=3, ny=2, nz=2, spacing=0.025):
    mesh = TetrahedralMesh.make_cuboid(nx, ny, nz, spacing)
    body = DeformableBody(MATERIAL, mesh)
    body.coord_fixed_mask[mesh.vertices[:, 0] <= spacing / 2, :] = True
    f_load = np.zeros((mesh.nr_vertices, 3))
    sel = (mesh.vertices[:, 0] > (nx - 1) * spacing - spacing / 2) & (
        mesh.vertices[:, 2] < spacing / 2
    )
    f_load[sel, 2] = -50.0
    return body, f_load


def anm_solution(body, f_load, em):
    model = body.make_forward(em)
    f_sub = model.lt_inp.copy_vtx_values(f_load)
    hp = EqnHyperParam(order=8, use_pade=True)
    hp.converge_rms = RMS_THRESH_FORCE_EQU
    solver = ANMEqnSolver(
        model.fn, model.lt_inp.remap, model.lt_out.remap, model.x0(),
        f_sub, hp,
    )
    xt = run_anm_eqn(solver, progress=False)
    v = body.mesh.vertices.copy()
    v[~body.coord_fixed_mask] = np.asarray(xt)
    return v


@pytest.mark.parametrize(
    "em", [EnergyModel.NEOHOOKEAN_C, EnergyModel.ARAP]
)
def test_newton_matches_anm(em):
    body, f_load = make_problem()
    desc = (em, MATERIAL)
    stat = baseline.solve_energy_min(
        body.mesh.tets, body.mesh.vertices, body.mesh.vertices, f_load,
        body.coord_fixed_mask, desc, RMS_THRESH_FORCE_EQU,
    )
    assert stat.grad_rms_refine < RMS_THRESH_FORCE_EQU or (
        stat.grad_rms < RMS_THRESH_FORCE_EQU
    )
    v_anm = anm_solution(body, f_load, em)
    require_tensor_eq(stat.vtx, v_anm, 1e-6, msg="newton vs anm")


def test_levmar_matches_anm():
    em = EnergyModel.NEOHOOKEAN_C
    body, f_load = make_problem()
    desc = (em, MATERIAL)
    stat = baseline.solve_force_equ_levmar(
        body.mesh.tets, body.mesh.vertices, f_load,
        body.coord_fixed_mask, desc, RMS_THRESH_FORCE_EQU,
    )
    assert stat.grad_rms < RMS_THRESH_FORCE_EQU
    v_anm = anm_solution(body, f_load, em)
    require_tensor_eq(stat.vtx, v_anm, 1e-6, msg="levmar vs anm")


def test_levmar_sparse_path(monkeypatch):
    # force the CSR branch (production meshes all exceed the dense
    # threshold; reference LevMar is always sparse, baseline/main.cpp:392)
    em = EnergyModel.NEOHOOKEAN_C
    body, f_load = make_problem()
    desc = (em, MATERIAL)
    monkeypatch.setattr(baseline, "_SPARSE_THRESHOLD", 1)
    stat = baseline.solve_force_equ_levmar(
        body.mesh.tets, body.mesh.vertices, f_load,
        body.coord_fixed_mask, desc, RMS_THRESH_FORCE_EQU,
    )
    assert stat.grad_rms < RMS_THRESH_FORCE_EQU
    v_anm = anm_solution(body, f_load, em)
    require_tensor_eq(stat.vtx, v_anm, 1e-6, msg="levmar sparse vs anm")


def test_hessian_finite_difference():
    # port of the reference FD Hessian checker (hcheck.cpp:6-77)
    body, _ = make_problem()
    v = body.mesh.vertices.copy()
    v[:, 2] *= 0.9
    kern = baseline._Kernels(
        body.mesh.tets, body.mesh.vertices,
        EnergyModel.NEOHOOKEAN_C, MATERIAL, False, 0.0,
    )
    err = baseline.check_hessian_fd(kern, v, samples=4)
    assert err < 1e-4


def test_projected_hessian_descent():
    # the eigen-projected Hessian must give a descent direction even in
    # a compressed (indefinite-Hessian) configuration
    body, f_load = make_problem()
    v = body.mesh.vertices.copy()
    # squash to provoke indefiniteness
    v[:, 2] *= 0.4
    kern = baseline._Kernels(
        body.mesh.tets, body.mesh.vertices,
        EnergyModel.NEOHOOKEAN_C, MATERIAL, True, 0.0,
    )
    import jax.numpy as jnp

    K = np.asarray(kern.hess_blocks(jnp.asarray(v)))
    w = np.linalg.eigvalsh(0.5 * (K + K.transpose(0, 2, 1)))
    assert w.min() > -1e-6 * abs(w).max()
