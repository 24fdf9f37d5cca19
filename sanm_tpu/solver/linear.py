"""Linear system solvers preserving ANM's factorize-once / solve-N-times
structure.

Counterpart of the reference MKL-PARDISO wrapper
(``libsanm/sparse_solver.{h,cpp}``): ``prepare()`` = analysis +
factorization done once per continuation step, ``solve()`` = cheap
back-substitution repeated once per Taylor order
(``libsanm/anm.cpp:223-291`` does 1 ``prepare`` + N ``solve``).

TPU constraints shape the design: XLA on this TPU compiles f64
QR/Cholesky but not f64 LU (probed), and there is no sparse direct
factorization primitive.  Paths:

* :class:`DenseFactorSolver` — dense QR (general) or Cholesky
  (``A^T A + lambda I`` Tikhonov mode, reference
  ``sparse_solver.cpp:327-421``); exact, for small/medium systems.
* :class:`BlockJacobiCG` — matrix-free preconditioned conjugate
  gradient on the assembled operator with a block-Jacobi preconditioner
  built once; for systems too large to densify.  (The matrix-free
  matvec is gather -> batched 9x9 GEMM -> scatter, ideal TPU work.)

All solvers are jit-traceable: construction and solves happen inside the
jitted expansion kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..utils import SANMError, sanm_assert


class DenseFactorSolver:
    """Factor once (QR or Cholesky), back-substitute many times.

    ``l2_penalty``: Tikhonov mode — solve (A^T A + penalty*I) x = A^T b,
    mirroring the reference's ``xcoeff_l2_penalty``
    (``libsanm/sparse_solver.cpp:327-421`` via ``mkl_sparse_syrk``)."""

    def __init__(self, A, l2_penalty: float = 0.0):
        self.A = A
        self.l2_penalty = float(l2_penalty)
        n = A.shape[0]
        sanm_assert(A.shape[0] == A.shape[1], "square system required")
        if self.l2_penalty:
            G = A.T @ A + self.l2_penalty * jnp.eye(n, dtype=A.dtype)
            self._chol = jnp.linalg.cholesky(G)
            self._q = None
        else:
            # QR: robust for the unsymmetric systems PARDISO mtype=11
            # handles in the reference (sparse_solver.cpp:107-127)
            q, r = jnp.linalg.qr(A)
            self._q = q
            self._r = r
            self._chol = None

    def solve(self, b):
        b = b.reshape(-1)
        if self.l2_penalty:
            rhs = self.A.T @ b
            y = jsl.solve_triangular(self._chol, rhs, lower=True)
            return jsl.solve_triangular(self._chol.T, y, lower=False)
        return jsl.solve_triangular(self._r, self._q.T @ b, lower=False)

    def apply(self, x):
        """A @ x, for the solver-level sanity checks
        (reference ``SparseSolver::apply``, ``sparse_solver.cpp:182-215``)."""
        return self.A @ x.reshape(-1)

    def coeff_l2(self):
        """Frobenius norm of the system coefficients (reference
        ``SparseSolver::coeff_l2``)."""
        return jnp.sqrt(jnp.sum(self.A * self.A))


class BlockJacobiCG:
    """Matrix-free preconditioned CG with per-node block-Jacobi
    preconditioner, for systems too large for dense factorization.

    The operator is the assembled dense matrix-free triple product
    ``R_out · blockdiag(J_e) · R_in``; ``matvec`` closures are supplied
    by the caller (gather -> batched GEMM -> scatter: all MXU/VPU
    friendly and shardable over elements).  The block-diagonal of A is
    extracted once (the "factorization"); each per-order solve is a CG
    run with fixed iteration cap.

    NOTE: for symmetric-positive systems only; the ANM FEA stiffness is
    symmetric (energy Hessian) near stable equilibria.  Round-1 scale
    path; superseded by stronger preconditioners in later rounds.
    """

    def __init__(self, matvec, diag_blocks, block_size: int, n: int,
                 tol: float = 1e-12, max_iter: int = 400):
        self.matvec = matvec
        self.n = n
        self.bs = block_size
        self.tol = tol
        self.max_iter = max_iter
        # invert the (n/bs) blocks once
        nb = n // block_size
        blocks = diag_blocks.reshape(nb, block_size, block_size)
        self._binv = jnp.linalg.inv(blocks)

    def _precond(self, r):
        nb = self.n // self.bs
        return jnp.einsum(
            "nij,nj->ni", self._binv, r.reshape(nb, self.bs)
        ).reshape(-1)

    def solve(self, b):
        b = b.reshape(-1)

        def body(state):
            x, r, z, p, rz, it = state
            Ap = self.matvec(p)
            alpha = rz / jnp.vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = self._precond(r)
            rz_new = jnp.vdot(r, z)
            beta = rz_new / rz
            p = z + beta * p
            return x, r, z, p, rz_new, it + 1

        def cond(state):
            x, r, z, p, rz, it = state
            return (jnp.linalg.norm(r) > self.tol * jnp.linalg.norm(b)) & (
                it < self.max_iter
            )

        x0 = jnp.zeros_like(b)
        r0 = b
        z0 = self._precond(r0)
        state = (x0, r0, z0, z0, jnp.vdot(r0, z0), 0)
        x, r, *_ = jax.lax.while_loop(cond, body, state)
        return x

    def apply(self, x):
        return self.matvec(x.reshape(-1))

    def coeff_l2(self):
        return jnp.asarray(0.0)


def make_solver(A, l2_penalty: float = 0.0, mode: str = "dense"):
    if mode == "dense":
        return DenseFactorSolver(A, l2_penalty)
    raise SANMError(f"unknown solver mode {mode}")
