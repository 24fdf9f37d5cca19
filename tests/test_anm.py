"""End-to-end ANM solver tests.

Ports of the reference solver tests (``tests/symbolic.cpp:560-884``):
generic equation solving with error correction, strict homotopy solving,
the implicit solver with a custom remap, polar-decomposition solving,
and the paper's geometric example.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sanm_tpu.solver import (
    ANMEqnSolver,
    ANMImplicitSolver,
    ANMSolverVecScale,
    EqnHyperParam,
    HyperParam,
    LinearRemap,
)
from sanm_tpu.ops import svd_w
from helper import tensor_rng, require_tensor_eq


def id_remaps(shape):
    n = int(np.prod(shape))
    return (
        LinearRemap.identity(n, out_shape=tuple(shape)),
        LinearRemap.identity(n),
    )


def anm_general_solve(fn, x0, y, maxiter=20, hp=None):
    """Solve fn(x) = y (reference ``anm_general_solve``,
    tests/symbolic.cpp:56-73): ANMEqnSolver solves f(x) + (-y) = 0."""
    rin, rout = id_remaps(x0.shape)
    hp = hp or EqnHyperParam()
    solver = ANMEqnSolver(fn, rin, rout, x0.reshape(-1), -y.reshape(-1), hp)
    it = 0
    while not solver.converged():
        it += 1
        assert it <= maxiter, f"no convergence, rms={solver.residual_rms()}"
        solver.next_iter()
    return solver.get_x().reshape(x0.shape)


def run_vecscale_to(solver, t_dst, maxiter=20):
    it = 0
    while solver.get_t_upper() <= t_dst:
        it += 1
        assert it <= maxiter
        solver.update_approx()
    x, t = solver.eval(solver.solve_a(t_dst))
    assert t == pytest.approx(t_dst)
    return x


def anm_general_solve_strict(fn, x0, y, maxiter=20):
    """No error correction (reference ``anm_general_solve_strict``,
    tests/symbolic.cpp:76-87): expand f(x)-f(x0) + t*(f(x0)-y) = 0 to
    t=1."""
    f0 = np.asarray(fn(jnp.asarray(x0)))

    def f_off(x):
        return fn(x) - jnp.asarray(f0)

    rin, rout = id_remaps(x0.shape)
    solver = ANMSolverVecScale(
        f_off, rin, rout, x0.reshape(-1), 0.0, (f0 - y).reshape(-1)
    )
    return run_vecscale_to(solver, 1.0, maxiter).reshape(x0.shape)


class TestGeneralSolve:
    def test_sqr(self):
        xsol = tensor_rng((10, 20), 0.2, 1.5)
        ysol = xsol * xsol
        xinit = xsol * tensor_rng(xsol.shape, 0.6, 1.5)
        xt = anm_general_solve(lambda x: x * x, xinit, ysol)
        require_tensor_eq(xt * xt, ysol, 1e-4, msg="sqr solution")

    def test_pow_log_pow_strict(self):
        xsol = tensor_rng((10, 20), 1.5, 4.3)

        def f(x):
            return jnp.log(x**2.3) ** 1.5

        ysol = np.asarray(f(jnp.asarray(xsol)))
        # keep x > 1 so log(x^2.3) stays positive (the fractional outer
        # power is undefined for negative bases)
        xinit = xsol * tensor_rng(xsol.shape, 0.8, 1.4)
        xt = anm_general_solve_strict(f, xinit, ysol)
        require_tensor_eq(
            np.asarray(f(jnp.asarray(xt))), ysol, 1e-4, msg="plp"
        )

    @pytest.mark.parametrize("exp", [2, 5, 6, 8, 15])
    def test_pow_zero_grad(self, exp):
        # pow with zero gradient points (reference pow-zg,
        # tests/symbolic.cpp:610-630)
        def f(x):
            return x**1.7 + jnp.log(x) ** exp

        xsol = tensor_rng((10, 8, 3), 0.8, 1.5)
        xinit = xsol * tensor_rng(xsol.shape, 0.8, 1.2)
        # NOTE the reference evaluates ysol BEFORE the xsol[2] mutation
        # (C++ init-list order, tests/symbolic.cpp:613-617): only the
        # START point sits at the zero-gradient log(1)=0
        ysol = np.asarray(f(jnp.asarray(xsol)))
        xsol.reshape(-1)[2] = 1.3
        xinit.reshape(-1)[2] = 1.0  # log -> 0: zero grad of integer pow
        xt = anm_general_solve(f, xinit, ysol)
        require_tensor_eq(
            np.asarray(f(jnp.asarray(xt))), ysol, 1e-4, msg="pow-zg"
        )

    def test_ln_vecscale(self):
        # reference Symbolic.SolveUnary ln: solve ln(x) = t*y0 to t=2
        x0 = tensor_rng((10, 20), 0.1, 2.5)
        y0 = np.log(x0)
        rin, rout = id_remaps(x0.shape)
        solver = ANMSolverVecScale(
            lambda x: jnp.log(x), rin, rout, x0.reshape(-1), 1.0,
            -y0.reshape(-1),
        )
        sol = run_vecscale_to(solver, 2.0).reshape(x0.shape)
        require_tensor_eq(np.log(sol), y0 * 2, 1e-4, msg="ln to t=2")


class TestPolarDecompSolve:
    @pytest.mark.slow
    @pytest.mark.parametrize("rot", [False, True])
    def test_simple(self, rot):
        # reference Symbolic.PolarDecompSolve (tests/symbolic.cpp:677-728).
        # Random 3x3 matrices can be nearly rank-deficient, which
        # legitimately shrinks the ANM validity range early on, so seeds
        # are fixed and the iteration cap generous.
        batch, n = 7, 3
        x0 = tensor_rng((batch, n, n), seed=100)
        dx = tensor_rng(x0.shape, -0.05, 0.05, seed=101)

        def f(x):
            return x - svd_w(x, rot)[2]

        xsol = x0 + dx
        ysol = np.asarray(f(jnp.asarray(xsol)))
        xt = anm_general_solve(f, x0, ysol, maxiter=60)
        require_tensor_eq(xt, xsol, 1e-3, msg="polar solve")

    @pytest.mark.slow
    def test_eq_singular_x0(self):
        batch, n = 7, 3
        x0 = tensor_rng((batch, n, n), seed=102)
        dx = tensor_rng(x0.shape, -0.05, 0.05, seed=103)

        def make_eq_singular(x, rot):
            u, s, w = [np.asarray(t) for t in svd_w(jnp.asarray(x), rot)]
            s = s.copy()
            s[:, 1] = s[:, 0]
            return np.einsum("bij,bj,bkj,bkl->bil", u, s, u, w)

        for rot in (False, True):
            x0d = make_eq_singular(x0, rot)

            def f(x):
                return x - svd_w(x, rot)[2]

            xsol = x0d + dx
            ysol = np.asarray(f(jnp.asarray(xsol)))
            # near the degenerate manifold the series radius is tiny;
            # the Pade extension is exactly what makes this tractable.
            # x - W(x) = y is multi-valued there, so check the equation
            # residual rather than a specific root.
            xt = anm_general_solve(
                f, x0d, ysol, maxiter=120,
                hp=EqnHyperParam(use_pade=True),
            )
            require_tensor_eq(
                np.asarray(f(jnp.asarray(xt))), ysol, 1e-4,
                msg=f"eq-singular rot={rot}",
            )


class TestImplicitSolver:
    def test_pow_delta(self):
        # reference Symbolic.ANMImplicitSolver (tests/symbolic.cpp:775-833):
        # remap [x; t] -> x + t*dx elementwise, f = pow(., 1.5);
        # continuation moves x by -dx while keeping f(x+t*dx) fixed.
        batch = 5
        x0 = tensor_rng((batch,), 1.0, 2.0)
        dx = tensor_rng((batch,), -2.0, -1.0)
        rows = [[(i, 1.0), (batch, float(dx[i]))] for i in range(batch)]
        rin = LinearRemap(rows, batch + 1, (batch,))
        rout = LinearRemap.identity(batch)

        solver = ANMImplicitSolver(
            lambda x: x**1.5, rin, rout, x0, 0.0
        )
        it = 0
        while solver.get_t_upper() < 1.0:
            it += 1
            assert it < 20
            solver.update_approx()
        xt, t = solver.eval(solver.solve_a(1.0))
        assert t == pytest.approx(1.0)
        require_tensor_eq(
            (np.asarray(xt) + dx) ** 1.5, x0**1.5, 1e-4, msg="implicit"
        )


class TestPaperGeoExample:
    def test_geo(self):
        # reference Symbolic.PaperGeoExample (tests/symbolic.cpp:835-884)
        def f_all(c):
            x = c[:, 0:1]
            y = c[:, 1:2]
            f0 = (
                2 * x**2 - 5 * x + y**2 - 4 * y - 2 * x * y - 5.0
            )
            f1 = (x + 1.0) ** 2 + y**2 - 2.0
            return jnp.concatenate([f0, f1], axis=1)

        coord_init = np.array([[0.0, -1.0]])
        df = np.array([[0.0, -6.0]])
        hp = HyperParam(order=20)
        rin, rout = id_remaps(coord_init.shape)
        solver = ANMSolverVecScale(
            f_all, rin, rout, coord_init.reshape(-1), 0.0,
            df.reshape(-1), hp,
        )
        it = 0
        while solver.get_t_upper() < 1.0:
            it += 1
            assert it < 30
            solver.update_approx()
        sol, t = solver.eval(solver.solve_a(1.0))
        err = np.asarray(f_all(jnp.asarray(sol.reshape(1, 2))))
        assert abs(err[0, 0]) < 1e-4
        assert abs(err[0, 1] - 6) < 1e-4

        # the eqn-solver route must agree (print_err path)
        sol2 = anm_general_solve(
            f_all, coord_init, -df, maxiter=20,
            hp=EqnHyperParam(order=20),
        )
        err2 = np.asarray(f_all(jnp.asarray(sol2)))
        assert abs(err2[0, 0]) < 1e-4
        assert abs(err2[0, 1] - 6) < 1e-4


class TestRosenbrockDer:
    def test_der_correctness(self):
        # reference Symbolic.Rosenbrock der_correctness
        # (tests/symbolic.cpp:730-772) vs scipy's documented values
        def rosen_der(x):
            xm = x[:, 1:-1]
            xm_m1 = x[:, :-2]
            xm_p1 = x[:, 2:]
            x0 = x[:, 0:1]
            x1 = x[:, 1:2]
            xp1 = x[:, -1:]
            xp2 = x[:, -2:-1]
            der0 = -400.0 * x0 * (x1 - x0**2) + 2 * x0 - 2.0
            der1 = (
                200.0 * xm
                - 200.0 * xm_m1**2
                - 400.0 * (xm_p1 - xm**2) * xm
                + 2 * xm
                - 2.0
            )
            der2 = 200.0 * xp1 - 200.0 * xp2**2
            return jnp.concatenate([der0, der1, der2], axis=1)

        x0 = np.array([[1.3, 0.7, 0.8, 1.9, 1.2]])
        want = np.array([[515.4, -285.4, -341.6, 2085.4, -482.0]])
        got = np.asarray(rosen_der(jnp.asarray(x0)))
        require_tensor_eq(got, want, 1e-10, msg="rosen der")
