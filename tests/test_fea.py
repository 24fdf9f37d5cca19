"""FEA end-to-end tests.

Ports/equivalents of the reference FEA validation: the NumPy oracle
``utils/check_single_tet.py`` becomes an autodiff cross-check (nodal
force from the stress/normal remap must equal minus the gradient of the
total elastic energy), plus small equilibrium solves mirroring
``test_cuboid`` / ``test_single_tet_inverse`` (``fea/main.cpp``) with
the paper's convergence target force-RMS 1e-10 (``fea/main.cpp:28``).
"""

import math

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
from sanm_tpu.fea.app import (
    RMS_THRESH_FORCE_EQU,
    run_and_save,
    run_anm_eqn,
    setup_solver_param,
)
from sanm_tpu.ops import batched_det
from sanm_tpu.solver import ANMEqnSolver
from sanm_tpu.solver.anm import EqnHyperParam
from helper import require_tensor_eq

MATERIAL = MaterialProperty.from_young_poisson(1e7, 0.45)  # silicone-ish


def small_cuboid_body(nx=3, ny=2, nz=2, spacing=0.025):
    mesh = TetrahedralMesh.make_cuboid(nx, ny, nz, spacing)
    body = DeformableBody(MATERIAL, mesh)
    body.coord_fixed_mask[mesh.vertices[:, 0] <= spacing / 2, :] = True
    return body


class TestMeshGeometry:
    def test_shape_matrix_remap_reconstruction(self):
        # remap(x0) + bias must reproduce the mesh shape matrices
        # (cf. reference shape-matrix check, fea/mesh_template.h:226-228)
        body = small_cuboid_body()
        from sanm_tpu.fea.remap import ShapeMatRemap

        tr = ShapeMatRemap(body.mesh, body.coord_fixed_mask)
        ds = np.asarray(tr.remap.apply(jnp.asarray(tr.x0))) + tr.bias
        require_tensor_eq(
            ds, body.mesh.shape_matrix, 1e-12, msg="shape matrix"
        )

    def test_volumes_and_normals(self):
        mesh = TetrahedralMesh.make_cuboid(3, 3, 3, 1.0)
        # total volume of a 2x2x2 cube
        assert mesh.tet_volumes.sum() == pytest.approx(8.0)
        # per-tet normals sum to zero (translation invariance)
        assert np.abs(mesh.vertex_norms.sum(axis=1)).max() < 1e-12
        # normals = -vol * D^{-T} for corners 1..3
        D = mesh.shape_matrix
        vol = mesh.tet_volumes
        dinv_t = np.transpose(np.linalg.inv(D), (0, 2, 1))
        require_tensor_eq(
            mesh.vertex_norms[:, 1:],
            np.transpose(-vol[:, None, None] * dinv_t, (0, 2, 1)),
            1e-10,
            msg="normals vs -vol D^-T",
        )

    def test_cuboid_mesh_structure(self):
        mesh = TetrahedralMesh.make_cuboid(3, 2, 2, 0.5)
        assert mesh.nr_vertices == 12
        assert mesh.nr_tet == 5 * 2
        # all tets have nonzero volume
        assert mesh.tet_volumes.min() > 0


class TestForceIsEnergyGradient:
    """The assembled nodal force must equal -d(total energy)/dx — an
    independent derivation connecting material, mesh and remaps (the
    reference validates the same chain with NumPy oracles,
    utils/check_single_tet.py)."""

    @pytest.mark.parametrize(
        "em", [EnergyModel.NEOHOOKEAN_C, EnergyModel.NEOHOOKEAN_I,
               EnergyModel.StVK_STRETCH]
    )
    def test_force_vs_energy_grad(self, em):
        body = small_cuboid_body()
        model = body.make_forward(em)
        mesh = body.mesh
        mu = MATERIAL.shear_modulus
        lam = MATERIAL.lame_first
        k = MATERIAL.bulk_modulus

        dm_inv = jnp.asarray(np.linalg.inv(mesh.shape_matrix))
        vols = jnp.asarray(mesh.tet_volumes)
        bias = jnp.asarray(model.lt_inp.bias)

        def energy(x):
            ds = model.lt_inp.remap.apply(x) + bias
            F = jnp.einsum("bij,bjk->bik", ds, dm_inv)
            J = batched_det(F)
            Ic = jnp.sum(F * F, axis=(1, 2))
            if em == EnergyModel.NEOHOOKEAN_C:
                psi = (
                    mu / 2 * (Ic - 3)
                    - mu * jnp.log(J)
                    + lam / 2 * jnp.log(J) ** 2
                )
            elif em == EnergyModel.NEOHOOKEAN_I:
                # psi = mu/2 (J^{-2/3} Ic - 3) + k/2 (J - 1)^2
                psi = mu / 2 * (J ** (-2.0 / 3.0) * Ic - 3) + k / 2 * (
                    J - 1
                ) ** 2
            else:  # StVK stretch term: mu/4 |F^T F - I|^2
                C = jnp.einsum("bji,bjk->bik", F, F)
                d = C - jnp.eye(3)
                psi = mu / 4 * jnp.sum(d * d, axis=(1, 2))
            return jnp.sum(psi * vols)

        # random perturbed configuration
        rng = np.random.default_rng(3)
        x = jnp.asarray(
            model.x0() + rng.uniform(-0.002, 0.002, model.x0().shape)
        )
        force = np.asarray(model.eval_force(x))
        grad = np.asarray(jax.grad(energy)(x))
        require_tensor_eq(force, -grad, 1e-8, msg=f"force vs -dE/dx ({em})")


class TestEquilibrium:
    def _solve(self, em, order=8, nx=3, ny=2, nz=2):
        spacing = 0.025
        body = small_cuboid_body(nx, ny, nz, spacing)
        mesh = body.mesh
        f_load_full = np.zeros((mesh.nr_vertices, 3))
        sel = (mesh.vertices[:, 0] > (nx - 1) * spacing - spacing / 2) & (
            mesh.vertices[:, 2] < spacing / 2
        )
        f_load_full[sel, 2] = -50.0
        model = body.make_forward(em)
        f_load_sub = model.lt_inp.copy_vtx_values(f_load_full)
        hp = EqnHyperParam(order=order, use_pade=True)
        hp.converge_rms = RMS_THRESH_FORCE_EQU
        hp.solution_check_tol = 1e-3
        solver = ANMEqnSolver(
            model.fn, model.lt_inp.remap, model.lt_out.remap,
            model.x0(), f_load_sub, hp,
        )
        xt = run_anm_eqn(solver, progress=False)
        rms = DeformableBody.compute_force_rms(
            model, xt, f_load_sub, None, False
        )
        assert rms < RMS_THRESH_FORCE_EQU * 5
        return body, xt

    def test_cuboid_neohookean_c(self):
        self._solve(EnergyModel.NEOHOOKEAN_C)

    def test_cuboid_neohookean_i(self):
        self._solve(EnergyModel.NEOHOOKEAN_I)

    def test_cuboid_arap(self):
        self._solve(EnergyModel.ARAP)

    def test_single_tet_inverse_roundtrip(self):
        # reference test_single_tet_inverse (fea/main.cpp:584-621) +
        # FEA_INVCHECK-style verification of the inverse solution
        spacing = 0.025
        angle = 2 * math.pi / 3
        coords = np.zeros((4, 3))
        for i in range(3):
            coords[i, 0] = math.cos(angle * i) * spacing
            coords[i, 1] = math.sin(angle * i) * spacing
        coords[3, 2] = spacing
        mesh = TetrahedralMesh(coords, np.arange(4)[None, :])
        body = DeformableBody(MATERIAL, mesh)
        body.coord_fixed_mask[:3, :] = True
        f_load_full = np.zeros((4, 3))
        f_load_full[3, 2] = -1000.0

        em = EnergyModel.NEOHOOKEAN_I
        model = body.make_inverse(em)
        f_load_sub = model.lt_inp.copy_vtx_values(f_load_full)
        hp = EqnHyperParam(order=8)
        hp.converge_rms = RMS_THRESH_FORCE_EQU
        solver = ANMEqnSolver(
            model.fn, model.lt_inp.remap, model.lt_out.remap,
            model.x0(), f_load_sub, hp,
        )
        xt = run_anm_eqn(solver, progress=False)
        rms = DeformableBody.compute_force_rms(
            model, xt, f_load_sub, None, False
        )
        assert rms < RMS_THRESH_FORCE_EQU * 5

        # roundtrip: solving the forward problem from the recovered rest
        # shape must reproduce the original (deformed) coordinates
        rest_mesh = mesh.copy()
        rest_mesh.replace_with_mask(body.coord_fixed_mask, xt)
        fwd_body = DeformableBody(MATERIAL, rest_mesh)
        fwd_body.coord_fixed_mask = body.coord_fixed_mask
        fwd_model = fwd_body.make_forward(em)
        fsolver = ANMEqnSolver(
            fwd_model.fn, fwd_model.lt_inp.remap, fwd_model.lt_out.remap,
            fwd_model.x0(), fwd_model.lt_inp.copy_vtx_values(f_load_full),
            hp,
        )
        xt_fwd = run_anm_eqn(fsolver, progress=False)
        orig_free = coords[~body.coord_fixed_mask]
        require_tensor_eq(
            np.asarray(xt_fwd).reshape(-1), orig_free, 1e-5,
            msg="inverse roundtrip",
        )
