"""f64 precision island for ``sanm_svd_w`` inside the f32 pass.

The SVD-W order-k recurrences divide by singular-value sums/gaps
(``clip_div``, reference ``libsanm/tensor_svd.cpp:28-31``); on elements
with a near-zero singular value plus a reflection flip this amplifies
f32 input noise by ~1/sigma_min and the ARAP continuation stalls
(measured: armadillo-small/human stall at ~1e-3 force-RMS).  The fix
keeps the svd op, its upstream chain, and its cancellation-prone
add/sub consumers at f64 inside the f32 retrace
(``cast_taylor_fn(..., promote_prims=(svd_w_p,))``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanm_tpu.ops.svd_w import polar_w, svd_w_p
from sanm_tpu.taylor import TaylorFn, cast_taylor_fn, promote_island


def _arap_like():
    """(fn, C): F = g @ C, P = 2.5 (F - W(F)) — the ARAP pk1 shape."""
    rng = np.random.default_rng(11)
    C = jnp.asarray(np.eye(3) + 0.05 * rng.standard_normal((3, 3)))

    def fn(g):
        F = jnp.einsum("bij,jk->bik", g, C, precision="highest")
        return (F - polar_w(F, True)) * 2.5

    return fn, C


def _degenerate_g(B=12):
    """Batch of matrices with a tiny third singular value and det < 0:
    the require_rotation sign flip then produces s ~ [1, .8, -eps], so
    the pw-mode divisions (s_i+s_j, 1/s) amplify by ~1/eps."""
    rng = np.random.default_rng(5)
    gs = []
    for b in range(B):
        q1, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        q2, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        eps = 10.0 ** rng.uniform(-4, -2.5)
        m = q1 @ np.diag([1.0, 0.8, eps]) @ q2.T
        if np.linalg.det(m) > 0:
            m[:, 2] *= -1.0
        gs.append(m)
    return jnp.asarray(np.stack(gs))


def test_island_structure():
    fn, _ = _arap_like()
    g0 = _degenerate_g()
    tfn = TaylorFn(fn, g0)
    island_eqns, island_vars = promote_island(tfn, (svd_w_p,))
    assert island_eqns, "svd island not found"
    # the graph input feeds the island -> must be f64 in the retrace
    tfn32p = cast_taylor_fn(tfn, jnp.float32, promote_prims=(svd_w_p,))
    assert tfn32p.jaxpr.invars[0].aval.dtype == jnp.float64
    # the island extends through the elementwise consumers (`- W`,
    # `* 2.5`) to the output, so the per-order bias of an svd-bearing
    # model is assembled without an f32 rounding stage
    assert tfn32p.jaxpr.outvars[0].aval.dtype == jnp.float64
    # the svd eqn itself runs at f64
    svd_eqns = [
        e for e in tfn32p.jaxpr.eqns if e.primitive.name == "sanm_svd_w"
    ]
    assert svd_eqns and svd_eqns[0].invars[0].aval.dtype == jnp.float64
    # plain cast: everything f32
    tfn32 = cast_taylor_fn(tfn, jnp.float32)
    assert tfn32.jaxpr.invars[0].aval.dtype == jnp.float32


def _run_series(tfn, g0, xs, in_dtype):
    """Push the series xs through a fresh engine; collect order biases."""
    eng = tfn.engine()
    eng.start(jnp.asarray(g0, in_dtype))
    assert eng.order_bias() is None  # order-1 bias structurally zero
    eng.push(jnp.asarray(xs[0], in_dtype))
    biases = []
    for k in range(1, len(xs)):
        b = eng.order_bias()
        biases.append(np.zeros(g0.shape) if b is None else np.asarray(b))
        eng.push(jnp.asarray(xs[k], in_dtype))
    return biases


def test_island_accuracy_degenerate_spectrum():
    """Order-k biases through the promoted f32 graph must track the f64
    reference orders of magnitude closer than the plain f32 graph on a
    near-degenerate spectrum (the armadillo/human ARAP stall regime)."""
    fn, _ = _arap_like()
    g0 = _degenerate_g()
    rng = np.random.default_rng(7)
    order = 8
    xs = [
        jnp.asarray(0.01 * rng.standard_normal(g0.shape))
        for _ in range(order)
    ]
    tfn = TaylorFn(fn, g0)
    tfn32p = cast_taylor_fn(tfn, jnp.float32, promote_prims=(svd_w_p,))
    tfn32 = cast_taylor_fn(tfn, jnp.float32)

    ref = _run_series(tfn, g0, xs, jnp.float64)
    prom = _run_series(tfn32p, g0, xs, jnp.float64)
    plain = _run_series(tfn32, g0, xs, jnp.float32)

    for k, (r, p, q) in enumerate(zip(ref, prom, plain), start=2):
        scale = np.abs(r).max() + 1e-30
        err_prom = np.abs(p - r).max() / scale
        err_plain = np.abs(q - r).max() / scale
        # the promoted pass keeps the svd series at f64: only the final
        # downcast of P remains (~1e-7); the plain pass loses ~1/eps
        # more through the degenerate divisions
        assert err_prom < 1e-6, (k, err_prom)
        assert err_prom * 50 < err_plain + 1e-12, (
            k, err_prom, err_plain,
        )
