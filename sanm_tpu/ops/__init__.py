"""Tensor-level operator library.

Counterpart of the reference operator set (``libsanm/oprs.h``,
``libsanm/oprs/*``) — but most reference operators need no counterpart
here: batched determinant, cofactor, matrix inverse etc. are ordinary
``jax.numpy`` compositions whose Taylor rules compose automatically
through :mod:`sanm_tpu.taylor`.  Only genuinely non-composable ops get
custom primitives (SVD-W / polar decomposition).
"""

from .linalg import (  # noqa: F401
    batched_det,
    batched_cofactor,
    batched_inv,
    batched_mul_eye,
    batched_transpose,
)
from .svd_w import svd_w, polar_w  # noqa: F401
from . import polymat  # noqa: F401
