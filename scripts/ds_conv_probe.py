#!/usr/bin/env python
"""Microbenchmark: the ARAP f64-island order-step convolutions.

VERDICT r4 item 1: the emulated-f64 SVD-island convolutions dominate
the ARAP per-order step (0.178 s/order at 42k tets).  This probe times
the three pw-mode convolutions of ``ops/svd_w.py:_svd_scan_rule`` in
isolation on the real chip, in several arithmetic/layout variants:

  f64        current form (emulated-f64 buffers, tensordot reduce)
  f64_bsum   f64 with the tensordot replaced by broadcast-multiply+sum
  f32        plain f32 (the floor; too inaccurate to ship)
  ds         double-single: (hi, lo) f32 pairs, Dekker two_prod without
             FMA, value-level error compensation
  ds_fast    double-single with product error only (no add renorm)

Run:  python scripts/ds_conv_probe.py [B] [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 78067
N = int(sys.argv[2]) if len(sys.argv) > 2 else 20

jax.config.update("jax_enable_x64", True)


def _matmul_vpu(a, b):
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _mm_T2(a, b):  # a @ b.T
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :].swapaxes(-1, -3),
                   axis=-2)


def conv_sym(buf, k, cap, reduce_mode="tensordot"):
    h = cap // 2 + 1
    idx = jnp.arange(h)
    mask = (idx >= 1) & (2 * idx < k)
    Bg = jnp.take(buf, jnp.clip(k - idx, 0, cap), axis=0)
    terms = jax.vmap(_matmul_vpu)(buf[:h], Bg)
    w = mask.astype(terms.dtype)
    if reduce_mode == "tensordot":
        C = jnp.tensordot(w, terms, axes=(0, 0))
    else:
        C = jnp.sum(w[:, None, None, None] * terms, axis=0)
    res = C + jnp.swapaxes(C, -1, -2)
    mid_i = k // 2
    a_mid = jax.lax.dynamic_index_in_dim(buf, mid_i, axis=0, keepdims=False)
    mid = _matmul_vpu(a_mid, a_mid)
    even = ((k % 2) == 0) & (mid_i >= 1)
    return res + jnp.where(even, 1, 0).astype(res.dtype) * mid


def conv_pair(bufA, bufB, k, cap, reduce_mode="tensordot"):
    idx = jnp.arange(cap + 1)
    mask = (idx >= 1) & (idx <= k - 1)
    Bg = jnp.take(bufB, jnp.clip(k - idx, 0, cap), axis=0)
    terms = jax.vmap(_matmul_vpu)(bufA, Bg)
    w = mask.astype(terms.dtype)
    if reduce_mode == "tensordot":
        return jnp.tensordot(w, terms, axes=(0, 0))
    return jnp.sum(w[:, None, None, None] * terms, axis=0)


# ---------------------------------------------------------------------------
# double-single arithmetic on (hi, lo) f32 pairs (Dekker splits; the TPU
# VPU has no IEEE FMA guarantee at the jnp level, so two_prod uses the
# classic 4097-split)
# ---------------------------------------------------------------------------

SPLIT = np.float32(4097.0)  # 2^12 + 1


def two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    s = a + b
    err = b - (s - a)
    return s, err


def split(a):
    c = SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def ds_mul(ah, al, bh, bl):
    p, e = two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return quick_two_sum(p, e)


def ds_add(ah, al, bh, bl):
    s, e = two_sum(ah, bh)
    e = e + (al + bl)
    return quick_two_sum(s, e)


def ds_matmul(Ah, Al, Bh, Bl):
    """(..., 3, 3) double-single matmul via broadcast-sum."""
    ah = Ah[..., :, :, None]
    al = Al[..., :, :, None]
    bh = Bh[..., None, :, :]
    bl = Bl[..., None, :, :]
    ph, pl = ds_mul(ah, al, bh, bl)
    # reduce over the contraction axis with compensated adds
    oh = ph[..., 0, :]
    ol = pl[..., 0, :]
    for j in range(1, ph.shape[-2]):
        oh, ol = ds_add(oh, ol, ph[..., j, :], pl[..., j, :])
    return oh, ol


def ds_conv_sym(bufh, bufl, k, cap):
    h = cap // 2 + 1
    idx = jnp.arange(h)
    mask = ((idx >= 1) & (2 * idx < k)).astype(jnp.float32)
    Bgh = jnp.take(bufh, jnp.clip(k - idx, 0, cap), axis=0)
    Bgl = jnp.take(bufl, jnp.clip(k - idx, 0, cap), axis=0)
    th, tl = jax.vmap(ds_matmul)(bufh[:h], bufl[:h], Bgh, Bgl)
    th = th * mask[:, None, None, None]
    tl = tl * mask[:, None, None, None]
    # compensated reduction over the window
    oh, ol = th[0], tl[0]
    for i in range(1, h):
        oh, ol = ds_add(oh, ol, th[i], tl[i])
    rh, rl = ds_add(oh, ol, jnp.swapaxes(oh, -1, -2),
                    jnp.swapaxes(ol, -1, -2))
    mid_i = k // 2
    amh = jax.lax.dynamic_index_in_dim(bufh, mid_i, axis=0, keepdims=False)
    aml = jax.lax.dynamic_index_in_dim(bufl, mid_i, axis=0, keepdims=False)
    mh, ml = ds_matmul(amh, aml, amh, aml)
    evenw = jnp.where(((k % 2) == 0) & (mid_i >= 1), 1.0, 0.0).astype(
        jnp.float32
    )
    return ds_add(rh, rl, evenw * mh, evenw * ml)


def make_step(mode):
    """One ARAP pw-mode conv set: 2x conv_sym + 1x conv_pair."""
    if mode in ("f64", "f64_bsum", "f32"):
        red = "bsum" if mode == "f64_bsum" else "tensordot"

        def step(M, P, W, k):
            bm = conv_sym(M, k, N, red)
            bp = conv_sym(P, k, N, red)
            bpw = conv_pair(P, W, k, N, red)
            return bm + bp + bpw

        return step
    if mode.startswith("ds"):

        def step(Mh, Ml, Ph, Pl, Wh, Wl, k):
            bmh, bml = ds_conv_sym(Mh, Ml, k, N)
            bph, bpl = ds_conv_sym(Ph, Pl, k, N)
            # pair conv in ds
            idx = jnp.arange(N + 1)
            mask = ((idx >= 1) & (idx <= k - 1)).astype(jnp.float32)
            Bgh = jnp.take(Wh, jnp.clip(k - idx, 0, N), axis=0)
            Bgl = jnp.take(Wl, jnp.clip(k - idx, 0, N), axis=0)
            th, tl = jax.vmap(ds_matmul)(Ph, Pl, Bgh, Bgl)
            th = th * mask[:, None, None, None]
            tl = tl * mask[:, None, None, None]
            oh, ol = th[0], tl[0]
            for i in range(1, N + 1):
                oh, ol = ds_add(oh, ol, th[i], tl[i])
            rh, rl = ds_add(bmh, bml, bph, bpl)
            rh, rl = ds_add(rh, rl, oh, ol)
            return rh, rl

        return step
    raise ValueError(mode)


def to_ds(x64):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def main():
    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.normal(size=(N + 1, B, 3, 3)))
    P = jnp.asarray(rng.normal(size=(N + 1, B, 3, 3)))
    W = jnp.asarray(rng.normal(size=(N + 1, B, 3, 3)))
    k = jnp.asarray(12)
    results = {}
    out64 = None
    for mode in ["f64", "f64_bsum", "f32", "ds"]:
        step = make_step(mode)
        if mode.startswith("ds"):
            args = (*to_ds(M), *to_ds(P), *to_ds(W), k)
        elif mode == "f32":
            args = (
                M.astype(jnp.float32), P.astype(jnp.float32),
                W.astype(jnp.float32), k,
            )
        else:
            args = (M, P, W, k)
        f = jax.jit(step)
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(*args)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        best = min(times)
        if mode == "f64":
            out64 = np.asarray(out, dtype=np.float64)
            err = 0.0
        else:
            if isinstance(out, tuple):
                got = np.asarray(out[0], np.float64) + np.asarray(
                    out[1], np.float64
                )
            else:
                got = np.asarray(out, np.float64)
            err = float(
                np.max(np.abs(got - out64))
                / max(1e-30, float(np.max(np.abs(out64))))
            )
        results[mode] = (best, compile_s, err)
        print(
            f"{mode:10s} best={best*1e3:8.2f} ms  compile={compile_s:6.1f} s"
            f"  max_rel_err_vs_f64={err:.3e}",
            flush=True,
        )
    import json

    print(json.dumps({m: {"best_s": r[0], "err": r[2]}
                      for m, r in results.items()}))


if __name__ == "__main__":
    main()
