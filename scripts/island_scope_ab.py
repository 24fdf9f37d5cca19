"""A/B the f64-island scope on the degenerate-spectrum ARAP oracle.

Question (RESULTS round 3, perf item): does the island's downstream
extension through elementwise consumers (``taylor.promote_island``)
actually carry accuracy, or would the seed+upstream closure suffice
(cheaper: the output remap contraction and the downstream convolutions
could then run f32)?

Method: the same oracle as tests/test_precision_island.py — the ARAP
pk1 shape ``P = 2.5 (F - W(F))`` on a batch with a near-zero singular
value and a reflection flip (the armadillo/human ARAP stall regime,
reference ``libsanm/tensor_svd.cpp:28-31`` clip_div) — comparing
per-order biases of three passes against the all-f64 reference:

* full   — seed + upstream + downstream extension (production)
* seed   — seed + upstream only (extend_downstream=False)
* plain  — no island (uniform f32)

Run: ``SANM_PLATFORM=cpu python scripts/island_scope_ab.py``
"""

import os
import sys

os.environ.setdefault("SANM_PLATFORM", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax.numpy as jnp
import numpy as np

import sanm_tpu  # noqa: F401  (platform setup)
from sanm_tpu import taylor
from sanm_tpu.ops.svd_w import svd_w_p
from sanm_tpu.taylor import TaylorFn, cast_taylor_fn

from test_precision_island import _arap_like, _degenerate_g, _run_series


def main():
    fn, _ = _arap_like()
    g0 = _degenerate_g()
    rng = np.random.default_rng(7)
    order = 8
    xs = [
        jnp.asarray(0.01 * rng.standard_normal(g0.shape))
        for _ in range(order)
    ]
    tfn = TaylorFn(fn, g0)

    passes = {}
    passes["full"] = cast_taylor_fn(tfn, jnp.float32,
                                    promote_prims=(svd_w_p,))
    orig = taylor.promote_island
    taylor.promote_island = (
        lambda t, p, extend_downstream=True: orig(t, p, False)
    )
    try:
        passes["seed"] = cast_taylor_fn(tfn, jnp.float32,
                                        promote_prims=(svd_w_p,))
    finally:
        taylor.promote_island = orig
    passes["plain"] = cast_taylor_fn(tfn, jnp.float32)

    ref = _run_series(tfn, g0, xs, jnp.float64)
    print("per-order max relative bias error vs all-f64 reference:")
    print("order | " + " | ".join(f"{n:>9}" for n in passes))
    errs = {}
    for name, tf in passes.items():
        dt = jnp.float32 if name == "plain" else jnp.float64
        got = _run_series(tf, g0, xs, dt)
        errs[name] = [
            float(np.abs(p - r).max() / (np.abs(r).max() + 1e-30))
            for p, r in zip(got, ref)
        ]
    for k in range(len(ref)):
        print(
            f"  {k + 2:3d} | "
            + " | ".join(f"{errs[n][k]:9.2e}" for n in passes)
        )


if __name__ == "__main__":
    main()
