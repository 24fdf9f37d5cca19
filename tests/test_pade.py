"""Pade approximant + polynomial utility tests.

Ports of reference ``tests/pade.cpp``."""

import numpy as np
import pytest

from sanm_tpu import polynomial
from sanm_tpu.pade import PadeApproximation
from helper import tensor_rng, require_tensor_eq


class TestPolynomial:
    def test_roots_with_known_factors(self):
        # reference Pade.UnaryPolynomialRoots: conv a random polynomial
        # with (x-3)(x+4) and verify all returned roots are roots
        N = 10
        cf0 = tensor_rng((N - 2,))
        cf0[N - 3] = 2.3
        rhs = [-12.0, 1.0, 1.0]
        coeffs = np.zeros(N)
        for i in range(N):
            s = 0.0
            for j in range(3):
                if j <= i and i - j < N - 2:
                    s += rhs[j] * cf0[i - j]
            coeffs[i] = s

        roots = polynomial.roots(coeffs, only_real=False)
        assert len(roots) == N - 1
        realr = []
        for r in roots:
            val = polynomial.eval_poly(coeffs, complex(r))
            assert abs(val) < 1e-4 * max(
                1.0, abs(np.polyval(coeffs[::-1], abs(r)))
            )
            if abs(r.imag) < 1e-9:
                realr.append(r.real)
        assert len(realr) >= 2
        assert any(abs(r - 3) < 1e-6 for r in realr)
        assert any(abs(r + 4) < 1e-6 for r in realr)

        roots_real = polynomial.roots(coeffs, only_real=True)
        assert len(roots_real) == len(realr)

    def test_solve_eqn_and_minimize(self):
        # p(x) = (x-1)^2 + 0.5 -> min at 1; p(x)=2 at x = 1 +- sqrt(1.5)
        coeffs = [1.5, -2.0, 1.0]
        x, v = polynomial.minimize(coeffs, -3, 4)
        assert x == pytest.approx(1.0, abs=1e-6)
        assert v == pytest.approx(0.5, abs=1e-9)
        r = polynomial.solve_eqn(coeffs, 1.0, 4.0, 2.0)
        assert r == pytest.approx(1 + np.sqrt(1.5), abs=1e-9)

    def test_stable_x_range(self):
        assert polynomial.stable_x_range(15) == pytest.approx(
            10 ** (15.0 / 15)
        )

    def test_solve_quad(self):
        assert polynomial.solve_quad(1.0, -3.0, 2.0) == pytest.approx(2.0)


class TestPade:
    def test_approx(self):
        # reference Pade.Approx (tests/pade.cpp:66-118)
        SIZE, N = 500, 9
        eps = 1e-5
        xs = np.stack(
            [tensor_rng((SIZE,)) * 0.5 ** (i + 1) for i in range(N)]
        )
        xs[1, SIZE - 1] = 2.3  # t_1 > 0

        range0 = (
            eps
            * np.linalg.norm(xs[1])
            / np.linalg.norm(xs[N - 1])
        ) ** (1.0 / (N - 2))
        pade = PadeApproximation(xs, anm_cond=False, sanity_check=True)
        assert pade.ok
        assert pade.estimate_valid_range(range0 / 10, eps)

        tmin = xs[0, SIZE - 1]
        tmax = pade.t_max
        assert tmax > tmin

        for div in (8.0, 3.0, 1.01):
            a = pade.t_max_a / div
            expect = polynomial.eval_tensor_poly(xs, a)
            got = pade.eval_xt(a)
            require_tensor_eq(
                expect[:-1], got[:-1], 1e-4, msg=f"pade eval a={a}"
            )
            assert got[-1] == pytest.approx(expect[-1], rel=1e-6)

        for frac in (1e-3, 0.27, 0.96):
            t = tmin * (1 - frac) + tmax * frac
            a = pade.solve_a(t)
            expect = polynomial.eval_tensor_poly(xs, a)
            got = pade.eval_xt(a)
            require_tensor_eq(
                expect[:-1], got[:-1], 1e-4, msg=f"pade solve_a t={t}"
            )
            assert pade.eval_t(a) == pytest.approx(t, rel=1e-6)

    def test_rejects_low_order(self):
        xs = np.stack([tensor_rng((100,)) for _ in range(4)])
        pade = PadeApproximation(xs, anm_cond=False)
        assert not pade.ok
