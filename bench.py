"""Benchmark: the reference's Armadillo-small gravity workload on TPU.

Solves the reference config ``config/armadillo_small.json`` (V=13665,
T=42288 tetrahedra, compressible Neo-Hookean, Taylor order 20, Padé on)
to the paper's convergence target force-RMS 1e-10 (``fea/main.cpp:28``)
and prints ONE JSON line.

``value`` is the *warm* solve time: a full re-solve on a long-lived
solver (compiled kernels + host assembler reused) — the analog of the
reference's in-process timing, excluding XLA compilation.
``vs_baseline`` = warm wall time of the projected-Newton baseline
(reference ``fea/baseline``, reimplemented in JAX) over the SANM warm
wall time, with BOTH solvers on the same accelerator — the reference's
headline protocol is SANM vs Newton at a fixed 1e-10 residual on shared
hardware (``render/cmp_with_baseline.sh``).  See RESULTS.md for the full
experiment matrix.
"""

import json
import os
import subprocess
import sys
import tempfile

CONFIG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "configs",
    "armadillo_small.json",
)


def run_solve(overrides=()):
    # best-of-3 warm re-solves: the remote-tunnel device has measured
    # +-30-50% session variance, so a single warm sample measures tunnel
    # weather, not code (round-3 driver bench: 34.5 s vs 13.6 s
    # in-session for identical code).  The minimum is the reference's
    # in-process timing semantics (fea/main.cpp:247-296 times a
    # long-lived process with MKL caches hot).
    os.environ["SANM_WARM_TIMING"] = "3"
    import sanm_tpu

    sanm_tpu.enable_compile_cache()
    from sanm_tpu.fea.app import TASKS, read_json

    config = read_json(CONFIG)
    for ov in overrides:
        config.update(read_json(ov))
    rootpath = os.path.dirname(CONFIG)
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as tmp:
        os.chdir(tmp)
        try:
            stat = TASKS[config["func"]](config, rootpath).stat
        finally:
            os.chdir(cwd)
    return stat


def _probe_backend(timeout_s: int = 240):
    """Fail fast with a parseable JSON line when the device backend
    cannot initialize (e.g. the remote axon TPU tunnel is down, in
    which case every JAX call — even ``jax.devices()`` — blocks
    forever; observed at the round-3 close when the tunnel relay died
    host-side).  A healthy tunnel initializes in well under a minute;
    a hung probe would otherwise stall the whole benchmark harness."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sanm_tpu.utils import probe_backend

    if probe_backend(timeout_s):
        return
    print(json.dumps({
        "metric": "warm time_solve Armadillo-small NHC gravity",
        "value": None,
        "unit": "s",
        "vs_baseline": None,
        "error": "device backend failed to initialize within %ds "
                 "(TPU tunnel down?) — benchmark not run" % timeout_s,
    }))
    sys.exit(1)


def main():
    if os.environ.get("SANM_BENCH_BASELINE"):
        # baseline leg: the reference's projected-Newton solver on the
        # same accelerator, same mesh / energy / 1e-10 target (the
        # reference's headline protocol is SANM vs Newton at fixed
        # residual, render/cmp_with_baseline.sh).  Runs in a subprocess
        # so its compiled kernels don't pollute the SANM process.
        ov = os.path.join(os.path.dirname(CONFIG), "override_baseline.json")
        stat = run_solve([ov])
        print(json.dumps({
            "newton_warm": stat.get("time_solve_warm", stat.get("time")),
            "newton_iters": stat.get("iter_tot"),
            "newton_force_rms": stat.get("force_rms_refine",
                                         stat.get("force_rms")),
        }))
        return

    _probe_backend()
    stat = run_solve()
    t_warm = stat["time_solve_warm"]

    # Newton-baseline leg in a subprocess (fresh backend, same device)
    newton = None
    try:
        env = dict(os.environ, SANM_BENCH_BASELINE="1")
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
                newton = json.loads(line)
    except Exception:
        pass

    import jax

    result = {
        "metric": "warm time_solve Armadillo-small NHC gravity order=20 "
        "to force-RMS 1e-10 (vs projected-Newton baseline, same device)",
        "value": round(t_warm, 4),
        "unit": "s",
        "vs_baseline": (
            round(newton["newton_warm"] / t_warm, 3) if newton else 0.0
        ),
        "detail": {
            "iters": stat["iter"],
            "warm_samples": stat.get("warm_samples"),
            "force_rms": stat["force_rms_recomp"],
            "cold_time_solve_s": round(stat["time_solve"], 2),
            "newton_baseline_warm_s": (
                round(newton["newton_warm"], 2) if newton else None
            ),
            "newton_iters": newton.get("newton_iters") if newton else None,
            "device": str(jax.devices()[0].device_kind),
            "host_cores": os.cpu_count(),
            "mesh": {"V": stat["mesh_V"], "T": stat["mesh_F"]},
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
