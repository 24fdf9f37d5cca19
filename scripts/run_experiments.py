#!/usr/bin/env python
"""Benchmark experiment harness.

Counterpart of the reference experiment scripts
(``render/cmp_with_baseline.sh``, ``render/Makefile.cmp_with_baseline``,
``render/run_armadillo_exprs.sh``): runs the solver matrix

    {sanm, sanm_no_pade, baseline, baseline_noproj, baseline_levmar}
      x {arap, neohookean_c, neohookean_i}
      x meshes x {gravity, deform}

writing each cell's stat JSON under ``--out`` with done-marker
resumability (reference ``run_armadillo_exprs.sh:19-24``).

Usage:
    python scripts/run_experiments.py --out results/ \
        --meshes bar bob --energies neohookean_c --solvers sanm baseline
"""

import argparse
import json
import os
import subprocess
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = os.path.join(REPO, "configs")

MESH_TASKS = {
    # mesh name -> (gravity task config, deform override or None)
    "armadillo_small": ("armadillo_small.json",
                        "armadillo_small_bend_override.json"),
    "bar": ("bar.json", None),
    # bar2: the reference's procedural-cuboid twist deform cell
    # (Makefile.cmp_with_baseline bar2-d -> cuboid_twist_baseline.json);
    # deform-only, the task config IS the deform config
    "bar2": ("cuboid_twist_baseline.json", ""),
    "bifur3": ("bifur3.json", "bifur3_bend_override.json"),
    "bob": ("bob.json", "bob_bend_override.json"),
    "human": ("human.json", "human_bend_override.json"),
    "jet": ("jet.json", None),
    "plant": ("plant.json", "plant_bend_override.json"),
}

ENERGY_OVERRIDES = {
    "arap": "override_arap.json",
    "neohookean_c": "override_neo_comp.json",
    "neohookean_i": "override_neo_incomp.json",
}

SOLVER_OVERRIDES = {
    "sanm": [],
    "sanm_no_pade": ["override_no_pade.json"],
    "baseline": ["override_baseline.json"],
    "baseline_noproj": ["override_baseline_noproj.json"],
    "baseline_levmar": ["override_baseline_levmar.json"],
    # linear-backend variants of the SANM solver (same math, different
    # factorization path; see sanm_tpu/solver/linear.py + band.py)
    "sanm_band": [],
    "sanm_dense_chol": [],
    "sanm_spike": [],
}

SOLVER_ENV = {
    "sanm_band": {"SANM_SOLVER": "band_chol"},
    "sanm_dense_chol": {"SANM_SOLVER": "dense_chol"},
    "sanm_spike": {"SANM_SOLVER": "spike_band"},
}


def protocol_na_reason(energy, solver, task):
    """The reference's own protocol gates (cmp_with_baseline.sh:48-53):
    Newton-family deform baselines run ONLY for ARAP — the NHC/NHI
    deform init has inverted elements and the reference baseline
    *throws* on J<=0 (neohookean_material.cpp:15-31 raise in
    EnergyDensity/StressTensor, called unguarded from the first
    get_stiffmat_and_force at baseline/main.cpp:269) — and LevMar runs
    only on the gravity (force-equilibrium) task.  Returns the N/A
    reason string, or None if the cell is in-protocol."""
    if solver in ("baseline", "baseline_noproj") and task == "deform" \
            and energy != "arap":
        return ("reference protocol runs deform Newton baselines only "
                "for ARAP (cmp_with_baseline.sh:48-50): the NHC/NHI "
                "deform init has inverted elements and the baseline "
                "material throws on J<=0 "
                "(neohookean_material.cpp:15-31, baseline/main.cpp:269)")
    if solver == "baseline_levmar" and task != "gravity":
        return ("reference protocol runs LevMar only on the gravity "
                "task (cmp_with_baseline.sh:51-53)")
    return None


def run_cell(out_dir, mesh, energy, solver, task, extra_env, timeout=None):
    cell = f"{mesh}-{energy}-{solver}-{task}"
    cell_dir = os.path.join(out_dir, cell)
    done = os.path.join(cell_dir, "done")
    if os.path.exists(done):
        print(f"[skip] {cell}")
        return True
    os.makedirs(cell_dir, exist_ok=True)
    na = protocol_na_reason(energy, solver, task)
    if na is not None:
        with open(os.path.join(cell_dir, "protocol_na.json"), "w") as nf:
            json.dump({"na": True, "reason": na, "solver": solver,
                       "mesh": mesh, "energy": energy, "task": task}, nf)
        open(done, "w").close()
        print(f"[n/a ] {cell} (reference-protocol N/A)")
        return True
    gravity_cfg, deform_cfg = MESH_TASKS[mesh]
    args = [
        sys.executable,
        "-m",
        "sanm_tpu.fea",
        os.path.join(CONFIGS, "sys.json"),
        os.path.join(CONFIGS, gravity_cfg),
    ]
    if task == "deform":
        if deform_cfg is None:
            print(f"[n/a ] {cell}")
            return True
        if deform_cfg:
            args.append(os.path.join(CONFIGS, deform_cfg))
    elif mesh == "bar2":
        print(f"[n/a ] {cell} (deform-only mesh)")
        return True
    args.append(os.path.join(CONFIGS, ENERGY_OVERRIDES[energy]))
    if task == "inverse":
        # inverse rest-shape design (reference config/override_inverse.json
        # on the gravity task, fea/main.cpp:660-662): gravity config +
        # inverse flag; exercises the inverted-element SVD path
        args.append(os.path.join(CONFIGS, "override_inverse.json"))
    if mesh == "armadillo_small" and energy == "arap" and task == "gravity":
        # the reference's own protocol hardens the material for exactly
        # this cell (cmp_with_baseline.sh:44-46 adds
        # override_stiff_material.json): with the default soft material
        # the continuation walks into collapsing elements and the SVD-W
        # expansion radius goes to zero — in f64 too (measured here AND
        # implied by the reference's special case)
        args.append(os.path.join(CONFIGS, "override_stiff_material.json"))
    for ov in SOLVER_OVERRIDES[solver]:
        args.append(os.path.join(CONFIGS, ov))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("SANM_WARM_TIMING", "1")
    # hierarchical profiler report in the cell log; gen_tables.py parses
    # it for the sparse-solver share statistic (the reference pipeline
    # does the same with its ScopedProfiler output,
    # render/gen_table_figs.py:328-339)
    env.setdefault("SANM_PROFILE", "1")
    env.update(SOLVER_ENV.get(solver, {}))
    env.update(extra_env)
    log = os.path.join(cell_dir, "log.txt")
    print(f"[run ] {cell}", flush=True)
    try:
        with open(log, "w") as lf:
            ret = subprocess.run(
                args, cwd=cell_dir, env=env, stdout=lf,
                stderr=subprocess.STDOUT, timeout=timeout,
            ).returncode
    except subprocess.TimeoutExpired:
        # For the baseline solver family, record the timeout as a
        # measured LOWER BOUND and mark the cell done: for the slow
        # baselines (LevMar's 1000-iter cap at mesh scale) "still
        # running after N seconds" is itself the datum the reference's
        # speedup table needs (README.md "thousands of times faster" is
        # a >=-bound claim there too) — and retrying a cell that
        # deterministically exceeds the budget would wedge the chain.
        # SANM-family timeouts stay retryable failures: a transient
        # tunnel stall or cache-wiped cold compile must not be
        # immortalized as a wrong ">= budget" datum in the speedup
        # ratios.
        if solver.startswith("baseline"):
            with open(os.path.join(cell_dir, "timeout.json"), "w") as tf:
                json.dump({"timeout_s": timeout, "solver": solver,
                           "mesh": mesh, "energy": energy, "task": task,
                           "note": "wall time lower bound; run killed"},
                          tf)
            open(done, "w").close()
            print(f"[TIME] {cell} (recorded as >= {timeout}s lower bound)")
            return True
        print(f"[TIME] {cell} (sanm-family timeout; left retryable)")
        return False
    if ret == 0:
        open(done, "w").close()
        return True
    # Deterministic infeasibility (not a transient failure): the
    # baseline cannot start from a configuration with inverted elements
    # — the reference baseline throws identically (see
    # protocol_na_reason).  Record it as the cell's datum.
    try:
        tail = open(log).read()[-4000:]
    except OSError:
        tail = ""
    if solver.startswith("baseline") and \
            "configuration with inverted elements" in tail:
        with open(os.path.join(cell_dir, "infeasible.json"), "w") as nf:
            json.dump({"na": True, "solver": solver, "mesh": mesh,
                       "energy": energy, "task": task,
                       "reason": "baseline infeasible: inverted elements "
                       "at init (J<=0); reference baseline throws "
                       "identically (neohookean_material.cpp:15-31)"}, nf)
        open(done, "w").close()
        print(f"[n/a ] {cell} (infeasible: inverted init)")
        return True
    print(f"[FAIL] {cell} (exit {ret}); see {log}")
    return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="results")
    p.add_argument("--meshes", nargs="+", default=["bar", "bob"])
    p.add_argument(
        "--energies", nargs="+", default=list(ENERGY_OVERRIDES)
    )
    p.add_argument(
        "--solvers", nargs="+", default=["sanm", "sanm_no_pade", "baseline"]
    )
    p.add_argument("--tasks", nargs="+", default=["gravity", "deform"])
    p.add_argument("--platform", default=None,
                   help="SANM_PLATFORM override (e.g. cpu)")
    p.add_argument("--cell-timeout", type=int, default=5400,
                   help="seconds per cell before giving up")
    args = p.parse_args()

    extra_env = {}
    if args.platform:
        extra_env["SANM_PLATFORM"] = args.platform

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from sanm_tpu.utils import probe_backend

    # only the default (remote-device) backend can hang; an explicit
    # --platform cpu run never touches the tunnel
    if not args.platform and not probe_backend():
        print("run_experiments: device backend failed to initialize "
              "(TPU tunnel down?) — aborting instead of hanging per cell",
              file=sys.stderr)
        sys.exit(2)

    ok = True
    for mesh in args.meshes:
        for energy in args.energies:
            for solver in args.solvers:
                for task in args.tasks:
                    ok &= run_cell(
                        args.out, mesh, energy, solver, task, extra_env,
                        timeout=args.cell_timeout,
                    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
