#!/usr/bin/env python
"""Per-component timing + roofline estimate for the hybrid hot loop.

VERDICT round-2 item 6: "is the on-chip half actually fast?"  This
script times each piece of the per-order device step (apply_in, commit
pass, bias pass, apply_out, the fused step, and the Jacobian+assembly
prepare) standalone on the current backend, derives achieved HBM
bandwidth from the known buffer traffic, and prints the fraction of the
chip's roofline each piece reaches.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py \
        --mesh armadillo_small.json --energy neohookean_c --order 20
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def timed(fn, *args, reps=10, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", default="armadillo_small.json")
    p.add_argument("--energy", default="neohookean_c")
    p.add_argument("--order", type=int, default=20)
    p.add_argument("--hbm-gbps", type=float, default=819.0,
                   help="peak HBM bandwidth (v5e: 819 GB/s)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import sanm_tpu

    sanm_tpu.enable_compile_cache()
    from sanm_tpu.fea.app import (
        _gravity_load,
        make_material_property,
        read_json,
        setup_boundary_by_config,
        setup_solver_param,
    )
    from sanm_tpu.fea.material import EnergyModel
    from sanm_tpu.fea.mesh import TetrahedralMesh
    from sanm_tpu.fea.model import DeformableBody
    from sanm_tpu.solver import ANMEqnSolver

    config = read_json(os.path.join(REPO, "configs", args.mesh))
    config["energy_model"] = args.energy
    config["order"] = args.order
    material = make_material_property(config["material"], need_density=True)
    mesh_file = os.path.join(REPO, "configs", config["mesh"])
    mesh = TetrahedralMesh.from_tetgen_files(mesh_file)
    body = DeformableBody(material, mesh)
    if "scale" in config:
        mesh.resize_inplace(float(config["scale"]))
    g_acc = np.asarray(config["g"], float)
    bou = mesh_file + ".bou"
    if os.path.exists(bou):
        for tok in open(bou).read().split():
            body.coord_fixed_mask[int(tok) - 1, :] = True
    else:
        setup_boundary_by_config(body, -g_acc, config)
    f_load_full, _ = _gravity_load(mesh, material, g_acc)

    model = body.make_forward(EnergyModel.from_name(args.energy))
    f_sub = model.lt_inp.copy_vtx_values(f_load_full)
    hp = setup_solver_param(config, eqn=True)
    # build the driver without running a full solve
    drv = ANMEqnSolver.__new__(ANMEqnSolver)
    from sanm_tpu.solver.anm import _ANMDriverBase

    _ANMDriverBase.__init__(
        drv, model.fn, model.lt_inp.remap, model.lt_out.remap,
        len(model.x0()), hp,
    )
    drv.eqn_y = np.asarray(f_sub).reshape(-1)
    xt0 = jnp.asarray(np.concatenate([model.x0(), [0.0]]))

    jac_asm, step_small, promote, step_fn, prepare_light = drv._hybrid_fns()
    split = drv._hyb_split
    asm = drv._assembler()
    pdt = drv._pass_dtype()
    tfn_pass = drv._pass_tfn(pdt)
    in_dt = tfn_pass.jaxpr.invars[0].aval.dtype
    B = asm.B
    order = hp.order
    n = drv.n

    rows = {}

    t, (data, gt, _E) = timed(jac_asm, xt0, reps=3)
    rows["jac_asm (Jacobian+CSR assembly)"] = t
    t, (carry, aux) = timed(prepare_light, xt0, reps=3)
    rows["prepare_light (order-0/1 engine init)"] = t

    xt1 = jnp.asarray(np.random.default_rng(0).standard_normal(n + 1) * 1e-3)
    t, _ = timed(lambda: asm.apply_in(xt1, in_dt), reps=20)
    rows["apply_in (remap gather+contract)"] = t
    bshape = tfn_pass.jaxpr.outvars[0].aval
    bfake = jnp.zeros(bshape.shape, bshape.dtype)
    t, _ = timed(lambda: asm.apply_out(bfake), reps=20)
    rows["apply_out (contract+scatter-add)"] = t

    # fused per-order step (donates carry: rebuild each reading); with
    # the two-level loop active, time each stage program on its own
    # capacity and report the per-order average over a full expansion
    step1 = step_fn if split is None else step_small
    carry2, b_dev, caches = step1(carry, aux, 1, xt1, None)
    jax.block_until_ready(b_dev)
    if split is not None:
        t0 = time.perf_counter()
        reps = 0
        k = 2
        while reps < 10:
            carry2, b_dev, caches = step_small(
                carry2, aux, min(k, split), xt1, caches
            )
            k += 1
            reps += 1
        jax.block_until_ready(b_dev)
        small_t = (time.perf_counter() - t0) / reps
        rows["step_small (half-capacity, per order)"] = small_t
        carry2 = promote(carry2)
        kmin, kmax = split + 1, order - 1
    else:
        small_t = None
        kmin, kmax = 2, order - 1
    t0 = time.perf_counter()
    reps = 0
    k = kmin
    while reps < 10:
        carry2, b_dev, caches = step_fn(
            carry2, aux, min(k, kmax), xt1, caches
        )
        k += 1
        reps += 1
    jax.block_until_ready(b_dev)
    step_t = (time.perf_counter() - t0) / reps
    rows["step_fn (fused commit+bias, per order)"] = step_t
    if small_t is not None:
        # per-order average over orders 1..order-1 of the full loop
        n_small = split  # orders 1..split
        n_full = order - 1 - split
        rows["step_avg (two-level, per order)"] = (
            n_small * small_t + n_full * step_t
        ) / (n_small + n_full)

    # traffic model: every hist/userdata buffer is read across its
    # (N+1) window per order plus written once
    hist_bytes = 0
    for leaf in jax.tree_util.tree_leaves(carry):
        hist_bytes += leaf.size * leaf.dtype.itemsize
    rows_info = {
        "mesh": config["mesh"], "B_tets": int(B), "order": order,
        "n_dofs": int(n), "backend": jax.default_backend(),
        "pass_dtype": str(pdt.__name__ if hasattr(pdt, "__name__") else pdt),
        "carry_bytes_MB": hist_bytes / 1e6,
    }
    bw = hist_bytes / step_t / 1e9
    rows_info["step_achieved_GBps_on_carry"] = bw
    rows_info["step_pct_of_HBM_roofline"] = 100.0 * bw / args.hbm_gbps

    print(json.dumps(rows_info, indent=2))
    for name, t in rows.items():
        print(f"{name:<45} {t*1e3:9.2f} ms")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"info": rows_info, "timings_s": rows}, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
