"""The docs/GUIDE.md examples must run as written (README claims every
example is executed against the package)."""

import numpy as np
import pytest


def test_guide_anm_example():
    from sanm_tpu.solver import ANMEqnSolver, LinearRemap
    from sanm_tpu.solver.anm import EqnHyperParam

    n = 3
    fn = lambda x: x * x  # noqa: E731
    remap = LinearRemap.identity(n)
    hp = EqnHyperParam(order=8, use_pade=True)
    hp.converge_rms = 1e-10
    solver = ANMEqnSolver(
        fn, remap, remap, np.full(n, 1.0), np.full(n, -4.0), hp
    )
    it = 0
    while not solver.converged():
        solver.next_iter()
        it += 1
        assert it < 50
    np.testing.assert_allclose(np.asarray(solver.get_x()), 2.0, rtol=1e-9)


def test_guide_ano_example():
    import jax.numpy as jnp
    from sanm_tpu.solver.ano import ANOMinimizer, ANOHyperParam, CoeffSolver

    loss = lambda x: jnp.sum((x - 1.0) ** 2) + 0.1 * jnp.sum(x**4)  # noqa
    opt = ANOMinimizer(
        loss, np.zeros(4), CoeffSolver.make_grad_scale(),
        ANOHyperParam(order=8),
    )
    it = 0
    while opt.grad_l2() > 1e-8:
        opt.update_approx()
        it += 1
        assert it < 200
    # stationary point of 2(x-1) + 0.4 x^3 = 0
    np.testing.assert_allclose(opt.get_x(), 0.86883, rtol=1e-3)


@pytest.mark.slow
def test_guide_fea_example():
    from sanm_tpu.fea import (
        DeformableBody,
        EnergyModel,
        MaterialProperty,
        TetrahedralMesh,
    )
    from sanm_tpu.fea.app import run_anm_eqn
    from sanm_tpu.solver import ANMEqnSolver
    from sanm_tpu.solver.anm import EqnHyperParam

    mesh = TetrahedralMesh.make_cuboid(4, 3, 3, 0.025)
    body = DeformableBody(
        MaterialProperty.from_young_poisson(1e7, 0.45), mesh
    )
    body.coord_fixed_mask[mesh.vertices[:, 0] <= 0.0125, :] = True
    f_load = np.zeros((mesh.nr_vertices, 3))
    f_load[:, 2] = -9.8
    model = body.make_forward(EnergyModel.NEOHOOKEAN_C)
    hp = EqnHyperParam(order=8, use_pade=True)
    hp.converge_rms = 1e-10
    solver = ANMEqnSolver(
        model.fn, model.lt_inp.remap, model.lt_out.remap, model.x0(),
        model.lt_inp.copy_vtx_values(f_load), hp,
    )
    x = run_anm_eqn(solver, progress=False)
    assert np.isfinite(np.asarray(x)).all()
    assert solver.residual_rms() <= hp.converge_rms
