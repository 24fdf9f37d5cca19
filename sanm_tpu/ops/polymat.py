"""Polynomial-matrix determinant coefficients.

Library-completeness counterpart of reference
``libsanm/tensor_polymat.cpp`` (``compute_polymat_det_coeff``,
``libsanm/tensor.h:498-506``): the coefficient of a^order in
det(sum_i A_i a^i) for batched square matrix series.

The FEA application never needs this directly — determinants there are
3x3 Leibniz compositions whose Taylor coefficients propagate through the
engine.  It is exposed for parity with the reference library API:

* m <= 4 uses the permutation expansion with series convolution
  (reference ``tensor_polymat.cpp:201-341``);
* larger m evaluates the series at roots of unity, takes batched complex
  determinants, and inverse-DFTs (reference FFT path,
  ``tensor_polymat.cpp:30-136``).
"""

from __future__ import annotations

import itertools
import math

import jax.numpy as jnp
import numpy as np

from ..utils import SANMError


def _perm_sign(perm):
    sign = 1
    seen = [False] * len(perm)
    for i in range(len(perm)):
        if seen[i]:
            continue
        j = i
        clen = 0
        while not seen[j]:
            seen[j] = True
            j = perm[j]
            clen += 1
        if clen % 2 == 0:
            sign = -sign
    return sign


def _series_product_coeff(series_list, order):
    """Coefficient of a^order in the product of scalar series.

    Each element of ``series_list`` is a list of (B,) arrays (may be
    shorter than order+1; missing = 0)."""
    # fold pairwise, truncating at `order`
    cur = series_list[0][: order + 1]
    for nxt in series_list[1:]:
        nxt = nxt[: order + 1]
        out = [None] * (order + 1)
        for i, ci in enumerate(cur):
            if ci is None:
                continue
            for j, nj in enumerate(nxt):
                if nj is None or i + j > order:
                    continue
                t = ci * nj
                out[i + j] = t if out[i + j] is None else out[i + j] + t
        cur = out
    c = cur[order] if order < len(cur) else None
    return c


def polymat_det_coeff(mats, order: int):
    """Coefficient of a^order in det(sum_i mats[i] * a^i).

    ``mats``: sequence of (B, m, m) arrays.  Returns (B,) array."""
    mats = [jnp.asarray(m) for m in mats]
    B, m, m2 = mats[0].shape
    if m != m2:
        raise SANMError("polymat_det_coeff: square matrices required")
    L = len(mats)

    if m <= 4:
        total = None
        for perm in itertools.permutations(range(m)):
            sign = _perm_sign(perm)
            series_list = [
                [mats[t][:, i, perm[i]] for t in range(L)] for i in range(m)
            ]
            c = _series_product_coeff(series_list, order)
            if c is None:
                continue
            total = sign * c if total is None else total + sign * c
        if total is None:
            total = jnp.zeros((B,), mats[0].dtype)
        return total

    # FFT path: det is a polynomial of degree <= (L-1)*m
    deg = (L - 1) * m
    K = 1
    while K < deg + 1:
        K *= 2
    omega = np.exp(2j * np.pi / K)
    # evaluate at K roots of unity
    coeffs = jnp.zeros((B,), jnp.complex128)
    pts = []
    stack = jnp.stack([m_.astype(jnp.complex128) for m_ in mats])  # (L,B,m,m)
    powers = np.array(
        [[omega ** (j * t) for t in range(L)] for j in range(K)]
    )  # (K, L)
    for j in range(K):
        acc = jnp.einsum(
            "t,tbij->bij", jnp.asarray(powers[j]), stack
        )
        pts.append(jnp.linalg.det(acc))
    pts = jnp.stack(pts, axis=0)  # (K, B)
    idft = np.array([omega ** (-order * j) for j in range(K)]) / K
    coeffs = jnp.einsum("k,kb->b", jnp.asarray(idft), pts)
    return jnp.real(coeffs)
