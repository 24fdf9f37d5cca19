"""Test helpers: deterministic RNG + tensor comparison.

Ports the reference test scaffolding (``tests/helper.{h,cpp}``):
``TensorRNG`` seeded deterministic tensors and ``require_tensor_eq``
with eps/margin semantics."""

import numpy as np

_SEED = [20210921]


def tensor_rng(shape, lo=-1.0, hi=1.0, seed=None):
    if seed is None:
        _SEED[0] += 1
        seed = _SEED[0]
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=shape).astype(np.float64)


def require_tensor_eq(a, b, eps=1e-6, margin=1e-6, msg=""):
    """abs(a-b) <= eps * max(|a|,|b|,margin) elementwise
    (cf. tests/helper.cpp:23-48)."""
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, f"{msg}: shape {a.shape} vs {b.shape}"
    scale = np.maximum(np.maximum(np.abs(a), np.abs(b)), margin)
    err = np.abs(a - b) / scale
    worst = float(err.max()) if err.size else 0.0
    assert worst <= eps, (
        f"{msg}: max rel err {worst:.3e} > {eps:.3e} at "
        f"{np.unravel_index(np.argmax(err), err.shape)}"
    )
