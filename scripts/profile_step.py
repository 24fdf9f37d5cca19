#!/usr/bin/env python
"""Per-component timing + roofline estimate for the hybrid hot loop.

VERDICT round-2 item 6: "is the on-chip half actually fast?"  Earlier
versions timed each jitted piece standalone with block_until_ready
loops; on the remote axon backend those timings proved untrustworthy
(dispatch-only numbers for some calls, a second executable signature
compiling inside the timed region for others — the committed mid-r3
"2.0 s/order" artifact contradicted the in-cell wall-clock-consistent
profiler, which showed ~0.23 s/order warm).  This version measures the
REAL thing: it runs warm continuation restarts on a live solver with
``ScopedProfiler`` enabled (the same per-tag scopes every results cell
reports, each ending in a device drain), and derives per-order costs
and achieved HBM bandwidth from those wall-clock-consistent stats.

Usage (TPU):
    PYTHONPATH=/root/repo python scripts/profile_step.py \
        --mesh armadillo_small.json --energy arap --order 20
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", default="armadillo_small.json")
    p.add_argument("--energy", default="neohookean_c")
    p.add_argument("--order", type=int, default=20)
    p.add_argument("--warm-restarts", type=int, default=3)
    p.add_argument("--hbm-gbps", type=float, default=819.0,
                   help="peak HBM bandwidth (v5e: 819 GB/s)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    os.environ.setdefault("SANM_PROFILE", "1")

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
    from sanm_tpu.utils import ScopedProfiler

    config = read_json(os.path.join(REPO, "configs", args.mesh))
    config["energy_model"] = args.energy
    config["order"] = args.order
    if args.energy == "arap" and "armadillo" in args.mesh:
        # the reference protocol hardens the material for this cell
        # (render/cmp_with_baseline.sh:44-46); the soft default walks
        # into collapsing elements
        config.update(read_json(
            os.path.join(REPO, "configs", "override_stiff_material.json")
        ))
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

    # cold: constructor runs the first expansion (compiles everything)
    t0 = time.perf_counter()
    solver = ANMEqnSolver(
        model.fn, model.lt_inp.remap, model.lt_out.remap, model.x0(),
        np.asarray(f_sub).reshape(-1), hp,
    )
    cold_s = time.perf_counter() - t0

    # warm: timed continuation restarts, profiler isolated to this phase
    ScopedProfiler.reset()
    t0 = time.perf_counter()
    done = 0
    for _ in range(args.warm_restarts):
        if solver.converged():
            break
        solver.next_iter()
        done += 1
    warm_wall = time.perf_counter() - t0

    order = hp.order
    tags = [
        "eval_fx0_np", "build_sparse_coeff", "sparse_prep",
        "sparse_solve", "order_step", "bias_pull", "eqn_check_host",
        "pade_build", "pade_est",
    ]
    rows = {}
    accounted = 0.0
    for tag in tags:
        calls, tot = ScopedProfiler.stats(tag)
        if calls:
            rows[tag] = {"calls": calls, "tot_s": round(tot, 4),
                         "avg_s": round(tot / calls, 4)}
            accounted += tot

    # per-order device step cost + achieved bandwidth on the history
    # carry (each order reads the full convolution windows and writes
    # one slot; carry size from a prepare_light call)
    step_calls, step_tot = ScopedProfiler.stats("order_step")
    prepare_light = solver._hybrid_fns()[4]
    carry, _aux = prepare_light(jnp.asarray(solver.xt0))
    carry_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(carry)
    )
    step_avg = step_tot / step_calls if step_calls else None
    split = solver._hyb_split
    if split:
        # prepare_light built the half-capacity stage-1 carry; the
        # bandwidth model below wants the full-capacity size
        carry_bytes = carry_bytes * (order + 1) // (split + 1)

    info = {
        "mesh": config["mesh"],
        "energy": args.energy,
        "B_tets": int(mesh.nr_tet),
        "order": order,
        "n_dofs": int(solver.n),
        "backend": jax.default_backend(),
        "pass_dtype": str(np.dtype(solver._pass_dtype()).name),
        "two_level_split": split,
        "cold_first_expansion_s": round(cold_s, 2),
        "warm_restarts": done,
        "warm_wall_s": round(warm_wall, 3),
        "accounted_s": round(accounted, 3),
        "per_order_step_s": round(step_avg, 4) if step_avg else None,
        "carry_bytes_MB": round(carry_bytes / 1e6, 1),
    }
    if step_avg:
        # stage-1 orders read ~(split+1)/(order+1) of the carry; fold
        # that into the average window traffic per order
        if split:
            frac = (split * (split + 1) + (order - 1 - split) *
                    (order + 1)) / ((order - 1) * (order + 1))
        else:
            frac = 1.0
        bw = carry_bytes * frac / step_avg / 1e9
        info["step_achieved_GBps_on_carry"] = round(bw, 1)
        info["step_pct_of_HBM_roofline"] = round(
            100.0 * bw / args.hbm_gbps, 2
        )

    out = {"info": info, "tags": rows}
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
