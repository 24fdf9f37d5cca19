#!/bin/bash
# Round-3 final-session trimmed chain (~1h wall budget, cold XLA cache
# after the workspace restore).  Runs ONLY the non-destructive,
# highest-value remainder of r3c_chain.sh:
#   1. profile redo (VERDICT item 6 — roofline evidence) + armadillo
#      dense_chol shootout retry with the memory-lean assembly;
#   2. the remaining sanm deform cells (completes the main sanm matrix).
# Deliberately SKIPS the r3c step-4 stale-ARAP re-wipe: with <1h of TPU
# time, wiping 18 measured (stale-but-valid, conservative) ARAP cells
# and re-measuring only a few would lose data.  Baselines/noproj
# (hours per cell) stay queued in r3c_chain.sh for round 4.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

# -- 1: profiles + shootout --------------------------------------------
[ -f $RT/profile_step_armadillo_arap.json ] || \
timeout 1500 python scripts/profile_step.py --mesh armadillo_small.json \
  --energy arap --order 20 \
  --out $RT/profile_step_armadillo_arap.json || true
[ -f $RT/profile_step_armadillo_nhc.json ] || \
timeout 1200 python scripts/profile_step.py --mesh armadillo_small.json \
  --energy neohookean_c --order 20 \
  --out $RT/profile_step_armadillo_nhc.json || true

# -- 2: remaining sanm deform cells (cheapest mesh first so a hard
# session stop loses the least) ----------------------------------------
python scripts/run_experiments.py --out $RT \
  --meshes bar2 --energies neohookean_c neohookean_i \
  --solvers sanm sanm_no_pade --tasks deform --cell-timeout 2400 || true
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies neohookean_c \
  --solvers sanm_no_pade --tasks deform --cell-timeout 2400 || true
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies neohookean_i \
  --solvers sanm sanm_no_pade --tasks deform --cell-timeout 2400 || true
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies arap \
  --solvers sanm sanm_no_pade --tasks deform --cell-timeout 3600 || true
python scripts/run_experiments.py --out $RT \
  --meshes human --energies neohookean_i \
  --solvers sanm sanm_no_pade --tasks deform --cell-timeout 3600 || true

# -- 3: armadillo shootout (after the matrix cells: it is a perf
# artifact, the matrix cells are protocol cells) ------------------------
[ -f $RT/solver_shootout_armadillo.json ] || \
timeout 3600 python scripts/bench_solvers.py --mesh armadillo_small.json \
  --solvers host_lu dense_chol \
  --out $RT/solver_shootout_armadillo.json || true

echo "R3D TRIMMED CHAIN COMPLETE"
