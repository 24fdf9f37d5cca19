"""Static sparse linear remaps between solver vectors and batched graph
tensors.

Counterpart of reference ``SparseLinearDesc`` /
``SparseLinearDescCompressed`` (``libsanm/anm.h:24-85``,
``libsanm/anm.cpp:19-88``): a biasless sparse linear map described row
by row.  On TPU the map is stored as *padded* index/coefficient arrays
(mesh topology is static), so ``apply`` is a gather + small contraction
and the assembled system matrix is a scatter-add — both SPMD-shardable
along the batch axis.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils import SANMError, sanm_assert


class LinearRemap:
    """out[o] = sum_s coef[o, s] * x[idx[o, s]].

    Construction happens on the host in NumPy once per topology; the
    padded arrays then live on device.  ``rows``: a list (len = number of
    output scalars) of lists of ``(input_index, coefficient)`` pairs.
    """

    def __init__(self, rows, inp_size: int, out_shape: Tuple[int, ...]):
        n_out = int(math.prod(out_shape))
        sanm_assert(len(rows) == n_out, "rows=%d out=%d", len(rows), n_out)
        width = max((len(r) for r in rows), default=1) or 1
        idx = np.zeros((n_out, width), np.int32)
        coef = np.zeros((n_out, width), np.float64)
        for o, row in enumerate(rows):
            for s, (i, c) in enumerate(row):
                idx[o, s] = i
                coef[o, s] = c
        self.idx = jnp.asarray(idx)
        self.coef = jnp.asarray(coef)
        self._np_idx = idx
        self._np_coef = coef
        self.inp_size = int(inp_size)
        self.out_shape = tuple(out_shape)
        self.n_out = n_out
        self._transposed = None

    # ------------------------------------------------------------------
    @staticmethod
    def identity(n: int, out_shape: Optional[Tuple[int, ...]] = None):
        """Reference ``SparseLinearDesc::make_identity``
        (``libsanm/anm.cpp:19-48``)."""
        rows = [[(i, 1.0)] for i in range(n)]
        return LinearRemap(rows, n, out_shape or (n,))

    # ------------------------------------------------------------------
    def apply(self, x):
        """Apply to a flat (inp_size,) vector; returns out_shape array.
        None (structural zero) passes through."""
        if x is None:
            return None
        x = x.reshape(-1)
        out = jnp.sum(self.coef * x[self.idx], axis=1)
        return out.reshape(self.out_shape)

    def apply_t(self, y):
        """Transpose map: (out_shape,) -> (inp_size,), via scatter-add."""
        if y is None:
            return None
        yflat = y.reshape(-1)
        contrib = self.coef * yflat[:, None]
        return jnp.zeros((self.inp_size,), contrib.dtype).at[self.idx].add(
            contrib
        )

    # ------------------------------------------------------------------
    def transposed_padded(self):
        """Per-input-position padded list of (output_row, coef):
        numpy arrays (inp_size, T).  Built once on host; used for system
        assembly (the reference instead walks output rows inside
        ``build_sparse_coeff``, ``libsanm/anm.cpp:362-438``).  Kept as
        numpy so a jitted caller never caches trace-scoped constants."""
        if self._transposed is not None:
            return self._transposed
        buckets = [[] for _ in range(self.inp_size)]
        n_out, width = self._np_idx.shape
        for o in range(n_out):
            for s in range(width):
                c = self._np_coef[o, s]
                if c != 0.0:
                    buckets[self._np_idx[o, s]].append((o, c))
        T = max((len(b) for b in buckets), default=1) or 1
        ridx = np.zeros((self.inp_size, T), np.int32)
        rcoef = np.zeros((self.inp_size, T), np.float64)
        for i, b in enumerate(buckets):
            for t, (o, c) in enumerate(b):
                ridx[i, t] = o
                rcoef[i, t] = c
        self._transposed = (ridx, rcoef)
        return self._transposed


def assemble_dense(
    remap_out: LinearRemap,
    jac,  # (B, odim, idim)
    remap_in: LinearRemap,
    n_cols: int,
):
    """Assemble A[r, c] = sum_{b,p,q} Rout[r,(b,p)] J[b,p,q] Rin[(b,q),c]
    as a dense (n_out, n_cols) matrix.

    TPU-native replacement of the reference's sharded CSR assembly
    (``ANMSolverVecScale::build_sparse_coeff``, ``libsanm/anm.cpp:362-438``):
    per-element stiffness contributions are formed as one batched einsum
    (MXU work) and scatter-added into the matrix."""
    B, odim, idim = jac.shape
    sanm_assert(remap_out.inp_size == B * odim)
    sanm_assert(remap_in.n_out == B * idim)
    outT_idx_np, outT_coef_np = remap_out.transposed_padded()
    outT_idx = jnp.asarray(outT_idx_np).reshape(B, odim, -1)
    outT_coef = jnp.asarray(outT_coef_np).reshape(B, odim, -1)
    in_idx = remap_in.idx.reshape(B, idim, -1)
    in_coef = remap_in.coef.reshape(B, idim, -1)

    # contributions (B, odim, T, idim, S)
    vals = jnp.einsum(
        "bpt,bpq,bqs->bptqs", outT_coef, jac, in_coef, precision="highest"
    )
    rows = jnp.broadcast_to(outT_idx[:, :, :, None, None], vals.shape)
    cols = jnp.broadcast_to(in_idx[:, None, None, :, :], vals.shape)
    A = jnp.zeros((remap_out.n_out, n_cols), vals.dtype)
    return A.at[rows.reshape(-1), cols.reshape(-1)].add(vals.reshape(-1))
