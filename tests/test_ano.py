"""ANO minimizer tests — ports of reference ``tests/ano.cpp``."""

import jax.numpy as jnp
import numpy as np
import pytest

from sanm_tpu.solver import ANOMinimizer, CoeffSolver


def run_minimize(amin, maxiter=20, grad_norm=1e-3):
    it = 0
    while amin.grad_l2() > grad_norm and it < maxiter:
        it += 1
        amin.update_approx()
    return it


class TestANO:
    def test_simple_two(self):
        # reference ANO.SimpleTwo: minimize
        # ((y-4)^2 (x-0.5)^3 + 2)^0.3 + ln((x-2)^2 + (x+y-3)^2 + 1)
        def loss(v):
            x = v[0:1]
            y = v[1:2]
            t = ((y - 4.0) ** 2 * (x - 0.5) ** 3 + 2.0) ** 0.3 + jnp.log(
                (x - 2.0) ** 2 + (x + y - 3.0) ** 2 + 1.0
            )
            return jnp.sum(t)

        amin = ANOMinimizer(
            loss, np.array([3.0, 3.0]), CoeffSolver.make_gd_approx(0.4)
        )
        loss0 = amin.loss()
        run_minimize(amin)
        assert amin.loss() < loss0 / 2

    def test_rosenbrock_scipy(self):
        # reference ANO.RosenbrockScipy: 5-var Rosenbrock from the scipy
        # docs; ANO reaches loss < 0.5 within 20 iters
        def loss(v):
            t = 0.0
            for i in range(4):
                t = (
                    t
                    + 100.0 * (v[i + 1 : i + 2] - v[i : i + 1] ** 2) ** 2
                    + (1.0 - v[i : i + 1]) ** 2
                )
            return jnp.sum(t)

        x0 = np.array([1.3, 0.7, 0.8, 1.9, 1.2])
        amin = ANOMinimizer(loss, x0, CoeffSolver.make_gd_approx(0.1))
        run_minimize(amin, maxiter=20)
        assert amin.loss() < 0.5

    def test_grad_scale_quadratic(self):
        # GradScale on a convex quadratic must reach the optimum
        A = np.diag([1.0, 4.0, 9.0])
        c = np.array([1.0, -2.0, 0.5])

        def loss(v):
            d = v - jnp.asarray(c)
            return jnp.sum(d * (jnp.asarray(A) @ d))

        from sanm_tpu.solver.ano import ANOHyperParam

        amin = ANOMinimizer(
            loss,
            np.zeros(3),
            CoeffSolver.make_grad_scale(),
            ANOHyperParam(maxr=1e-6, max_loss_diff=1e-2),
        )
        run_minimize(amin, maxiter=100, grad_norm=1e-5)
        assert np.allclose(amin.get_x(), c, atol=1e-3)

    @pytest.mark.slow
    def test_arap_potential_minimization(self):
        # ANO through the SVD-W primitive: minimize the ARAP energy of a
        # single perturbed tet frame; reverse-mode grad goes through the
        # custom primitive's linearized jvp
        from sanm_tpu.ops.svd_w import polar_w
        from sanm_tpu.solver.ano import ANOHyperParam

        rng = np.random.default_rng(5)
        target_rot = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(target_rot) < 0:
            target_rot[:, 0] = -target_rot[:, 0]

        def loss(v):
            F = v.reshape(1, 3, 3)
            d = F - polar_w(F, True)
            return 0.5 * jnp.sum(d * d)

        x0 = (target_rot * 1.3 + 0.1 * rng.normal(size=(3, 3))).reshape(-1)
        amin = ANOMinimizer(
            loss, x0, CoeffSolver.make_gd_approx(0.2),
            ANOHyperParam(maxr=1e-5, max_loss_diff=1e-2),
        )
        loss0 = amin.loss()
        run_minimize(amin, maxiter=40, grad_norm=1e-4)
        assert amin.loss() < loss0 / 10
        # at the minimum F is (close to) a rotation
        F = np.asarray(amin.get_x()).reshape(3, 3)
        s = np.linalg.svd(F, compute_uv=False)
        assert np.allclose(s, 1.0, atol=1e-2)

    def test_random_solver(self):
        def loss(v):
            return jnp.sum((v - 2.0) ** 2) * 0.5

        from sanm_tpu.solver.ano import ANOHyperParam

        amin = ANOMinimizer(
            loss,
            np.zeros(4),
            CoeffSolver.make_random(0.5, seed=7),
            ANOHyperParam(maxr=1e-6, max_loss_diff=1e-2),
        )
        run_minimize(amin, maxiter=100, grad_norm=1e-4)
        assert np.allclose(amin.get_x(), 2.0, atol=1e-2)
