"""Symmetric-paired convolutions must equal the plain full-range forms.

The SVD-W Taylor rules' self-convolutions (Bm = sum M_i M_{k-i}^T,
Bp = sum P_i P_{k-i}, Bu/Bw = sum X_i^T X_{k-i}; reference recurrences
``libsanm/tensor_svd.cpp:275-475``) pair their i and k-i terms as
matrix transposes, so only the i < k/2 half needs computing.  These
tests pin the paired forms (`ScanEngine.buf_conv_sym`,
`ops.svd_w._series_conv_sym`) to the unpaired originals for every
order, including the even-k middle term and the symmetric-series (P)
case.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sanm_tpu.ops.svd_w import (
    _matmul,
    _mm_T2,
    _T1_mm,
    _series_conv,
    _series_conv_sym,
)
from sanm_tpu.taylor_scan import ScanEngine

N = 9
B = 4


def _rng_buf(rng, symmetric=False):
    buf = rng.standard_normal((N + 1, B, 3, 3))
    if symmetric:
        buf = buf + np.swapaxes(buf, -1, -2)
    return jnp.asarray(buf)


def _mini_engine():
    eng = ScanEngine.__new__(ScanEngine)
    eng.N = N
    eng.cap = N
    return eng


def test_buf_conv_sym_matches_buf_conv():
    rng = np.random.default_rng(0)
    eng = _mini_engine()
    cases = [
        (_mm_T2, _rng_buf(rng)),  # bm: a b^T pairs on any series
        (_T1_mm, _rng_buf(rng)),  # bu/bw: a^T b pairs on any series
        (_matmul, _rng_buf(rng, symmetric=True)),  # bp: needs sym terms
    ]
    for combine, buf in cases:
        for k in range(1, N + 1):
            ref = eng.buf_conv(None, buf, buf, k, combine=combine)
            got = eng.buf_conv_sym(None, buf, k, combine=combine)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-12
            )


def test_buf_conv_sym_inside_jit_traced_k():
    rng = np.random.default_rng(1)
    eng = _mini_engine()
    buf = _rng_buf(rng)

    fn = jax.jit(lambda b, k: eng.buf_conv_sym(None, b, k, combine=_mm_T2))
    for k in (1, 2, 5, 8, N):
        ref = eng.buf_conv(None, buf, buf, k, combine=_mm_T2)
        np.testing.assert_allclose(
            np.asarray(fn(buf, k)), np.asarray(ref), rtol=1e-12, atol=1e-12
        )


def test_series_conv_sym_matches_series_conv():
    rng = np.random.default_rng(2)
    # series with None holes (pruned orders must drop their pair)
    xs = [jnp.asarray(rng.standard_normal((B, 3, 3))) for _ in range(N + 1)]
    xs[3] = None
    xs_sym = [None if x is None else x + jnp.swapaxes(x, -1, -2) for x in xs]
    for k in range(1, N + 1):
        ref = _series_conv(xs, xs, k, transpose_y=True)
        got = _series_conv_sym(xs, k, _mm_T2)
        if ref is None:
            assert got is None
        else:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-12
            )
        ref = _series_conv(xs_sym, xs_sym, k)
        got = _series_conv_sym(xs_sym, k, _matmul)
        if ref is None:
            assert got is None
        else:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-12
            )
