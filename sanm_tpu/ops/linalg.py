"""Batched small-matrix linear algebra as jnp compositions.

The reference implements these as atomic operators with hand-written
Taylor recurrences (``libsanm/oprs/linalg.cpp``, ``libsanm/tensor_linalg.cpp``).
Here they are closed-form compositions of +,*,/ — their order-k Taylor
coefficients then compose automatically in :mod:`sanm_tpu.taylor`, and
XLA fuses the elementwise graphs into a handful of VPU kernels.  All
functions take ``(B, n, n)`` arrays with n in {1, 2, 3} (the FEA app only
uses n == dim == 2 or 3; the reference's generic-n paths via LU/FFT exist
for library completeness and are provided by :mod:`sanm_tpu.ops.polymat`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import SANMError


def batched_transpose(x):
    """(B, m, n) -> (B, n, m); reference ``libsanm/oprs/linalg.cpp`` batch_transpose."""
    return jnp.swapaxes(x, -1, -2)


def batched_det(x):
    """Batched determinant via the Leibniz expansion (n <= 3).

    Composes through the Taylor engine as pure multiply/add — the
    reference instead propagates polynomial-matrix determinant
    coefficients (``libsanm/tensor_polymat.cpp:201-341``, m<=4 Leibniz
    path); for n<=3 the direct expansion is equivalent and cheaper."""
    n = x.shape[-1]
    if x.shape[-2] != n:
        raise SANMError("batched_det: not square")
    if n == 1:
        return x[..., 0, 0]
    if n == 2:
        return x[..., 0, 0] * x[..., 1, 1] - x[..., 0, 1] * x[..., 1, 0]
    if n == 3:
        return (
            x[..., 0, 0] * (x[..., 1, 1] * x[..., 2, 2] - x[..., 1, 2] * x[..., 2, 1])
            - x[..., 0, 1] * (x[..., 1, 0] * x[..., 2, 2] - x[..., 1, 2] * x[..., 2, 0])
            + x[..., 0, 2] * (x[..., 1, 0] * x[..., 2, 1] - x[..., 1, 1] * x[..., 2, 0])
        )
    raise SANMError("batched_det: n > 3 unsupported on the solver path")


def batched_cofactor(x):
    """Cofactor matrix C with C[i,j] = d det(x) / d x[i,j]
    (so ``det(x) * inv(x) == C^T``).  Reference: SVD-free equivalent of
    ``TensorND::as_batched_cofactor`` (``libsanm/tensor_linalg.cpp:355-392``)."""
    n = x.shape[-1]
    if n == 1:
        return jnp.ones_like(x)
    if n == 2:
        a, b = x[..., 0, 0], x[..., 0, 1]
        c, d = x[..., 1, 0], x[..., 1, 1]
        return jnp.stack(
            [
                jnp.stack([d, -c], axis=-1),
                jnp.stack([-b, a], axis=-1),
            ],
            axis=-2,
        )
    if n == 3:
        def minor(i, j):
            rows = [r for r in range(3) if r != i]
            cols = [c for c in range(3) if c != j]
            return (
                x[..., rows[0], cols[0]] * x[..., rows[1], cols[1]]
                - x[..., rows[0], cols[1]] * x[..., rows[1], cols[0]]
            )

        entries = [
            [minor(i, j) * ((-1.0) ** (i + j)) for j in range(3)]
            for i in range(3)
        ]
        return jnp.stack(
            [jnp.stack(row, axis=-1) for row in entries], axis=-2
        )
    raise SANMError("batched_cofactor: n > 3 unsupported")


def batched_inv(x):
    """Batched inverse via adjugate / determinant (n <= 3).

    Replaces the reference's ``batched_mat_inv_mul`` operator whose
    order-k recurrence is ``y_k = x0^-1 (a_k - sum x_i y_{k-i})``
    (``libsanm/oprs/linalg.cpp:146-197``); as adj/det it composes through
    the generic mul/div Taylor rules."""
    det = batched_det(x)
    adj = batched_transpose(batched_cofactor(x))
    return adj / det[..., None, None]


def batched_mul_eye(s, dim):
    """Batched scalar -> scalar * I_dim (reference batch_mul_eye,
    ``libsanm/oprs/linalg.h:15-247``).  ``s`` has shape (B,) or (B,1)."""
    s = s.reshape(s.shape[0])
    return s[:, None, None] * jnp.eye(dim, dtype=s.dtype)
