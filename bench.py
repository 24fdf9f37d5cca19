"""Benchmark: reference ``test_cuboid`` workload on TPU.

Solves the reference config ``config/test_cuboid.json`` workload (20x8x8
cuboid, compressible Neo-Hookean, Taylor order 20, Pade on) to the
paper's convergence target force-RMS 1e-10 (``fea/main.cpp:28``) on the
TPU, and prints ONE JSON line.

``vs_baseline`` = host-CPU wall time of the *same* solver / TPU wall
time (the reference's headline protocol compares against a 32-thread
MKL CPU; until the reference binary is runnable here, the host-CPU run
of our own solver is the CPU reference proxy).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

NX, NY, NZ, SPACING = 20, 8, 8, 0.025
ORDER = 20


def build_problem():
    from sanm_tpu.fea import (
        DeformableBody,
        EnergyModel,
        MaterialProperty,
        TetrahedralMesh,
    )

    material = MaterialProperty.from_young_poisson(1e7, 0.45)
    mesh = TetrahedralMesh.make_cuboid(NX, NY, NZ, SPACING)
    body = DeformableBody(material, mesh)
    v = mesh.vertices
    body.coord_fixed_mask[v[:, 0] <= SPACING / 2, :] = True
    f_load_full = np.zeros((mesh.nr_vertices, 3))
    sel = (v[:, 0] > (NX // 2 - 1) * SPACING - SPACING / 2) & (
        v[:, 2] < SPACING / 2
    )
    f_load_full[sel, 2] = -50.0
    model = body.make_forward(EnergyModel.NEOHOOKEAN_C)
    return model, model.lt_inp.copy_vtx_values(f_load_full)


def run_solve():
    from sanm_tpu.fea.app import RMS_THRESH_FORCE_EQU
    from sanm_tpu.solver import ANMEqnSolver
    from sanm_tpu.solver.anm import EqnHyperParam

    model, f_load_sub = build_problem()
    hp = EqnHyperParam(order=ORDER, use_pade=True)
    hp.converge_rms = RMS_THRESH_FORCE_EQU
    hp.solution_check_tol = 1e-3

    # construction runs (and compiles) the first expansion
    t_compile0 = time.perf_counter()
    solver = ANMEqnSolver(
        model.fn, model.lt_inp.remap, model.lt_out.remap, model.x0(),
        f_load_sub, hp,
    )
    t_first = time.perf_counter() - t_compile0

    # timed full solve with warm caches: restart from scratch
    t0 = time.perf_counter()
    solver.reset()
    it = 0
    while not solver.converged():
        solver.next_iter()
        it += 1
        assert it < 200
    t_solve = time.perf_counter() - t0
    return t_solve, t_first, solver.get_nr_iter(), solver.residual_rms()


def main():
    import sanm_tpu

    if os.environ.get("SANM_BENCH_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    sanm_tpu.enable_compile_cache()
    t_solve, t_first, iters, rms = run_solve()
    if os.environ.get("SANM_BENCH_CPU"):
        print(json.dumps({"cpu_time_solve": t_solve}))
        return

    # host-CPU reference proxy in a subprocess (fresh backend)
    cpu_time = None
    try:
        env = dict(os.environ, SANM_BENCH_CPU="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                cpu_time = json.loads(line)["cpu_time_solve"]
    except Exception:
        pass

    result = {
        "metric": "time_solve test_cuboid 20x8x8 NHC order=20 to "
        "force-RMS 1e-10",
        "value": round(t_solve, 4),
        "unit": "s",
        "vs_baseline": round(cpu_time / t_solve, 3) if cpu_time else 0.0,
        "detail": {
            "iters": iters,
            "force_rms": rms,
            "first_solve_incl_compile_s": round(t_first, 2),
            "cpu_reference_s": round(cpu_time, 4) if cpu_time else None,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
