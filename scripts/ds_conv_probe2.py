#!/usr/bin/env python
"""ds_conv_probe with forced serialization: each iteration's output is
written back into an input buffer, so the device cannot overlap or elide
iterations, and the final host fetch bounds the whole chain.  Reports
per-iteration time.  (Probe v1's free-running best-of-5 measured 0.10 ms
for the f64 variant — physically impossible for ~370 MB of traffic —
i.e. block_until_ready through the axon tunnel does not serialize.)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 78067
N = int(sys.argv[2]) if len(sys.argv) > 2 else 20
ITERS = 10

jax.config.update("jax_enable_x64", True)

from ds_conv_probe import make_step, to_ds  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.normal(size=(N + 1, B, 3, 3)))
    P = jnp.asarray(rng.normal(size=(N + 1, B, 3, 3)))
    W = jnp.asarray(rng.normal(size=(N + 1, B, 3, 3)))
    out64 = None
    for mode in ["f64", "f64_bsum", "f32", "ds"]:
        step = make_step(mode)

        if mode.startswith("ds"):
            Mh, Ml = to_ds(M)
            Ph, Pl = to_ds(P)
            Wh, Wl = to_ds(W)

            def chain(Mh, Ml, Ph, Pl, Wh, Wl, k):
                oh, ol = step(Mh, Ml, Ph, Pl, Wh, Wl, k)
                Mh = Mh.at[1].set(oh * 1e-6)
                Ml = Ml.at[1].set(ol * 1e-6)
                return Mh, Ml, (oh, ol)

            f = jax.jit(chain)
            args0 = (Mh, Ml, Ph, Pl, Wh, Wl)
            out = f(*args0, jnp.asarray(5))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            mh, ml = Mh, Ml
            for i in range(ITERS):
                mh, ml, o = f(mh, ml, Ph, Pl, Wh, Wl,
                              jnp.asarray(5 + (i % 10)))
            got = np.asarray(o[0], np.float64) + np.asarray(
                o[1], np.float64
            )
            dt = (time.perf_counter() - t0) / ITERS
        else:
            dt64 = jnp.float64 if mode != "f32" else jnp.float32
            Mx, Px, Wx = (x.astype(dt64) for x in (M, P, W))

            def chain(Mx, Px, Wx, k):
                o = step(Mx, Px, Wx, k)
                return Mx.at[1].set(o * 1e-6), o

            f = jax.jit(chain)
            out = f(Mx, Px, Wx, jnp.asarray(5))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            mx = Mx
            for i in range(ITERS):
                mx, o = f(mx, Px, Wx, jnp.asarray(5 + (i % 10)))
            got = np.asarray(o, np.float64)
            dt = (time.perf_counter() - t0) / ITERS
        if mode == "f64":
            out64 = got
            err = 0.0
        else:
            err = float(
                np.max(np.abs(got - out64))
                / max(1e-30, float(np.max(np.abs(out64))))
            )
        print(
            f"{mode:10s} per-iter={dt*1e3:8.2f} ms  "
            f"max_rel_err_vs_f64={err:.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
