"""Unit tests for the adaptive noise-tail truncation and the
effective-order validity-range estimate (``_ANMDriverBase.
_truncate_noise_tail`` / ``_estimate_valid_range``).

These guards have no reference analog (the reference's all-f64 CPU
noise floor never surfaces in its series, SURVEY §5); they exist
because accelerator per-order bias noise amplified through A^{-1}
produces V-shaped coefficient tails (measured on armadillo-small ARAP:
decay to ~1e-6 at k~7, then ~16x regrowth per order).
"""

import numpy as np

from sanm_tpu import polynomial
from sanm_tpu.solver.anm import HyperParam, _ANMDriverBase


def _make_driver():
    drv = object.__new__(_ANMDriverBase)
    return drv


def _coeffs_from_norms(norms, n=5, t1=0.6):
    """Build (k+1, n+1) coefficient rows with the requested norms; the
    last column is the t-series (t1 > 0 so the range estimate's
    monotonicity check passes)."""
    k1 = len(norms)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((k1, n + 1))
    x[:, -1] = 0.0
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x *= np.asarray(norms)[:, None]
    # t-coefficients: decaying, t1 > 0
    x[1, -1] = t1 * norms[1]
    return x


def test_v_shaped_tail_truncated():
    # decay to a floor at k=8, then 16x geometric regrowth (the
    # measured armadillo ARAP shape)
    norms = [1.0] + [10.0 * 0.3**k for k in range(1, 9)]
    norms += [norms[-1] * 16.0 ** (k - 8) for k in range(9, 21)]
    drv = _make_driver()
    out = drv._truncate_noise_tail(_coeffs_from_norms(norms))
    assert drv._tail_truncated
    assert len(out) == 9  # cut at the V-bottom (argmin k=8)
    assert np.argmin([np.linalg.norm(c) for c in out]) == 8


def test_monotone_series_untouched():
    norms = [1.0] + [5.0 * 0.5**k for k in range(1, 21)]
    drv = _make_driver()
    c = _coeffs_from_norms(norms)
    out = drv._truncate_noise_tail(c)
    assert not drv._tail_truncated
    assert out is c


def test_plateau_within_envelope_untouched():
    # genuine series plateau/oscillate within ~10x of their envelope;
    # only >=100x regrowth is treated as noise
    norms = [1.0] + [2.0 * 0.6**k for k in range(1, 15)]
    floor = norms[-1]
    norms += [floor * 3, floor * 8, floor * 5, floor * 20, floor * 50]
    drv = _make_driver()
    c = _coeffs_from_norms(norms)
    out = drv._truncate_noise_tail(c)
    assert not drv._tail_truncated
    assert out is c


def test_short_series_untouched():
    norms = [1.0, 0.5, 0.1, 5.0, 400.0]
    drv = _make_driver()
    c = _coeffs_from_norms(norms)
    assert drv._truncate_noise_tail(c) is c
    assert not drv._tail_truncated


def test_early_minimum_untouched():
    # V-bottom below k=5 would leave too few informative orders; the
    # guard requires kmin >= 5
    norms = [1.0, 0.3, 0.01] + [0.02 * 3.0**k for k in range(18)]
    drv = _make_driver()
    c = _coeffs_from_norms(norms)
    assert drv._truncate_noise_tail(c) is c
    assert not drv._tail_truncated


def test_effective_order_range_estimate():
    """A truncated series must use stable_x_range(n_eff) and yield a
    LARGER validity range than the same series with its noise tail
    kept (the tail's huge |x_N| collapses a_max)."""
    norms = [1.0] + [10.0 * 0.3**k for k in range(1, 9)]
    norms += [norms[-1] * 16.0 ** (k - 8) for k in range(9, 21)]
    coeffs = _coeffs_from_norms(norms)

    def run(c):
        drv = _make_driver()
        drv.hp = HyperParam(order=20, use_pade=False)
        drv.max_a_bound = polynomial.stable_x_range(20)
        drv._iter = 0
        drv.xt_coeffs = c
        drv._estimate_valid_range()
        return drv._t_max_a

    drv = _make_driver()
    truncated = drv._truncate_noise_tail(coeffs)
    assert drv._tail_truncated
    a_trunc = run(truncated)
    a_noisy = run(coeffs)
    assert a_trunc > a_noisy * 3
    assert a_trunc <= polynomial.stable_x_range(len(truncated) - 1)
