"""Asymptotic Numerical Optimizer (ANO).

Counterpart of reference ``libsanm/ano.{h,cpp}``: unconstrained
minimization of a scalar loss ``t = f(x)`` by expanding ``t(a)`` and
``x(a)`` with the Taylor machinery, minimizing the scalar polynomial
``t(a)`` over the validity range, and re-expanding at the minimizer.

The per-order system ``g^T x_k + b_k = t_k`` (g = gradient of f at x_0)
is under-determined; pluggable :class:`CoeffSolver` strategies pick
``x_k`` (reference ``ano.cpp:144-306``): GradScale (x_k parallel to g),
Random (angle-sampled directions), GDApprox (momentum direction, zero
higher orders).

Structure: the loss function takes a single flat (n,) vector (callers
pack their pytrees; the reference similarly flattens its TensorValueMap,
``ano.cpp:95-127``).  One jit evaluates loss + gradient + all per-order
biases cannot be fused since x_k depends on host-side strategy state
(randomness), so the engine runs per-order jits; losses here are tiny
graphs and this is not a performance path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import polynomial
from ..taylor import TaylorFn
from ..utils import SANMNumericalError, sanm_assert


@dataclass
class ANOHyperParam:
    """Reference ``ANOMinimizer::HyperParam`` (``libsanm/ano.h:22-27``)."""

    order: int = 8
    maxr: float = 1e-4
    max_loss_diff: float = 1e-3


@dataclass
class ANOStat:
    a_bound: float = 0.0
    a_m: float = 0.0
    loss_diff: float = 0.0


class CoeffSolver:
    """Strategy choosing (x_i, t_i) with t_i = g . x_i + b_i under the ANM
    constraints |x1|^2 + t1^2 = 1 and x_i . x1 + t_i t1 = 0
    (reference ``ANOMinimizer::CoeffSolver``, ``libsanm/ano.h:87-137``)."""

    def init(self, it: int, grad: np.ndarray):
        raise NotImplementedError

    def solve(self, order, b, xprev, tprev):
        raise NotImplementedError

    # ------------------------------------------------------------------
    @staticmethod
    def _solve_with_scale(r, grad, order, b, xprev, tprev):
        """x_i = k_i * r; see reference ``solve_with_scale``
        (``ano.cpp:148-173``)."""
        rg = float(r @ grad)
        if order == 1:
            assert b == 0
            xr1 = float(r @ r)
            ki = np.sqrt(1.0 / (xr1 + rg * rg))
        else:
            xr1 = float(r @ xprev[1])
            ki = -tprev[1] * b / (tprev[1] * rg + xr1)
        ti = ki * rg + b
        return r * ki, ti

    @staticmethod
    def make_grad_scale():
        return _GradScale()

    @staticmethod
    def make_random(max_angle: float, seed: int = 23):
        return _Random(max_angle, seed)

    @staticmethod
    def make_gd_approx(momentum: float):
        return _GDApprox(momentum)


class _GradScale(CoeffSolver):
    """All x_i along the gradient (reference ``ano.cpp:175-207``)."""

    def init(self, it, grad):
        self.grad = grad
        self.g2 = float(grad @ grad)

    def solve(self, order, b, xprev, tprev):
        if order == 1:
            assert b == 0
            self.k1 = np.sqrt(1.0 / (self.g2 * self.g2 + self.g2))
            self.t1 = self.k1 * self.g2
            return self.grad * self.k1, self.t1
        ti = b * self.k1 / (self.t1 + self.k1)
        ki = (ti - b) / self.g2
        return self.grad * ki, ti


class _Random(CoeffSolver):
    """Random directions at bounded angle to the gradient
    (reference ``ano.cpp:209-264``)."""

    def __init__(self, max_angle, seed):
        sanm_assert(0 < max_angle < np.pi / 2 * 0.95)
        self.max_angle = max_angle
        self.rng = np.random.default_rng(seed)

    def init(self, it, grad):
        self.grad = grad
        self.g2 = float(grad @ grad)
        # note: the gradient-magnitude check lives in solve(), so that a
        # converged point (grad ~ 0) reached at the end of an iteration
        # does not raise before the caller can observe convergence

    def _gen(self, angle):
        for _ in range(3):
            r = self.rng.standard_normal(self.grad.shape)
            k = float(r @ self.grad) / self.g2
            d = r - k * self.grad
            dn = float(np.linalg.norm(d))
            if dn >= 1e-4:
                dreq = np.sqrt(self.g2) * np.tan(angle)
                return d * (dreq / dn) + self.grad
        raise SANMNumericalError("failed to sample direction")

    def solve(self, order, b, xprev, tprev):
        sanm_assert(self.g2 > 1e-12, "gradient too small for Random solver")
        r = self.grad if order == 1 else self._gen(
            self.rng.uniform(0, self.max_angle)
        )
        return self._solve_with_scale(r, self.grad, order, b, xprev, tprev)


class _GDApprox(CoeffSolver):
    """t(a) ~= f(x0 + momentum-direction * a)
    (reference ``ano.cpp:266-293``)."""

    def __init__(self, momentum):
        self.mom_smooth = momentum
        self.mom = None

    def init(self, it, grad):
        if it == 0 or self.mom is None:
            self.mom = grad.copy()
        else:
            self.mom = self.mom * self.mom_smooth + grad
        self.grad = grad

    def solve(self, order, b, xprev, tprev):
        if order == 1:
            assert b == 0
            return self.mom.copy(), float(self.mom @ self.grad)
        return np.zeros_like(self.mom), b


class ANOMinimizer:
    """Reference ``ANOMinimizer`` (``libsanm/ano.h:20-79``).

    ``loss_fn``: scalar function of a flat (n,) vector."""

    def __init__(
        self,
        loss_fn: Callable,
        x0,
        coeff_solver: CoeffSolver,
        hyper_param: Optional[ANOHyperParam] = None,
    ):
        self.hp = hyper_param or ANOHyperParam()
        self.coeff_solver = coeff_solver
        x0 = np.asarray(x0, np.float64).reshape(-1)
        self.n = x0.size
        self.max_a_bound = polynomial.stable_x_range(self.hp.order)
        self.tfn = TaylorFn(
            loss_fn, jax.ShapeDtypeStruct((self.n,), jnp.float64)
        )
        self._grad_jit = jax.jit(jax.grad(lambda x: self.tfn(x).sum()))
        self._iter = 0
        self._init_grad(x0)

    # ------------------------------------------------------------------
    def _init_grad(self, x0):
        """Start a fresh expansion at x0 (reference ``init_grad``,
        ``ano.cpp:95-127``)."""
        self._eng = self.tfn.engine()
        loss0 = float(np.asarray(self._eng.start(jnp.asarray(x0))))
        self.grad = np.asarray(self._grad_jit(jnp.asarray(x0)))
        self.x_coeffs = [x0.copy()]
        self.t_coeffs = [loss0]
        self.coeff_solver.init(self._iter, self.grad)

    def _solve_expansion_coeffs(self):
        """Reference ``ano.cpp:44-59``."""
        for i in range(1, self.hp.order + 1):
            b = self._eng.order_bias()
            b = 0.0 if b is None else float(np.asarray(b).reshape(()))
            xi, ti = self.coeff_solver.solve(
                i, b, self.x_coeffs, self.t_coeffs
            )
            self.x_coeffs.append(np.asarray(xi))
            self.t_coeffs.append(float(ti))
            if i < self.hp.order:
                self._eng.push(jnp.asarray(xi))

    def _estimate_valid_range(self):
        """Reference ``ano.cpp:61-93``."""

        def norm(i):
            return np.sqrt(
                float(self.x_coeffs[i] @ self.x_coeffs[i])
                + self.t_coeffs[i] ** 2
            )

        xback = max(norm(len(self.x_coeffs) - 1), 1e-9)
        bound = (self.hp.maxr / xback * norm(1)) ** (
            1.0 / (self.hp.order - 1)
        )
        return min(bound, self.max_a_bound)

    # ------------------------------------------------------------------
    def update_approx(self) -> ANOStat:
        """One ANO iteration (reference ``ano.cpp:27-42``)."""
        self._iter += 1
        stat = ANOStat()
        self._solve_expansion_coeffs()
        stat.a_bound = self._estimate_valid_range()
        stat.a_m, t_next = polynomial.minimize(
            self.t_coeffs, -stat.a_bound, stat.a_bound
        )
        x_next = polynomial.eval_tensor_poly(
            np.stack(self.x_coeffs), stat.a_m
        )
        self._init_grad(np.asarray(x_next))
        stat.loss_diff = abs(self.t_coeffs[0] - t_next)
        if stat.loss_diff >= self.hp.max_loss_diff:
            raise SANMNumericalError(
                "loss_diff too large: approx=%g actual=%g a=%g/%g"
                % (t_next, self.t_coeffs[0], stat.a_m, stat.a_bound)
            )
        return stat

    def loss(self) -> float:
        return self.t_coeffs[0]

    def grad_l2(self) -> float:
        return float(np.linalg.norm(self.grad))

    def get_x(self) -> np.ndarray:
        return self.x_coeffs[0]
