#!/bin/bash
# The reference protocol's remaining baseline variants
# (render/cmp_with_baseline.sh:49-53):
#   baseline_noproj — unprojected-Hessian Newton, run for every gravity
#     cell and for the arap deform cells;
#   baseline_levmar — Levenberg-Marquardt, gravity only, gated behind
#     RUN_LEVMAR in the reference (optional); demonstrated here on the
#     cheapest mesh (bar) since LevMar is the slowest solver by far.
# Resumable via done markers.  Cheapest meshes first so a partial run
# maximizes coverage.  The big meshes run once without the warm rerun
# (the same 1-core-host allowance used for the projected baselines).
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

# -- noproj gravity, small/mid meshes (warm-timed) --------------------
for m in bar bifur3 bob; do
  timeout 7200 python scripts/run_experiments.py --out $RT \
    --meshes $m --energies arap neohookean_c neohookean_i \
    --solvers baseline_noproj --tasks gravity --cell-timeout 2300 || true
done
# -- noproj deform (arap only, per the reference protocol) ------------
for m in bifur3 bob bar2; do
  timeout 7200 python scripts/run_experiments.py --out $RT \
    --meshes $m --energies arap --solvers baseline_noproj \
    --tasks deform --cell-timeout 2300 || true
done
# -- noproj, large meshes: single run, no warm rerun ------------------
for m in plant armadillo_small; do
  SANM_WARM_TIMING= timeout 14400 python scripts/run_experiments.py \
    --out $RT --meshes $m --energies arap neohookean_c neohookean_i \
    --solvers baseline_noproj --tasks gravity --cell-timeout 4400 || true
  SANM_WARM_TIMING= timeout 7200 python scripts/run_experiments.py \
    --out $RT --meshes $m --energies arap --solvers baseline_noproj \
    --tasks deform --cell-timeout 4400 || true
done
# -- levmar demonstration cells (reference gates these off by default:
#    RUN_LEVMAR, cmp_with_baseline.sh:52) -----------------------------
timeout 14400 python scripts/run_experiments.py --out $RT \
  --meshes bar --energies neohookean_c arap neohookean_i \
  --solvers baseline_levmar --tasks gravity --cell-timeout 4400 || true
# -- noproj human: the most expensive cells, last ---------------------
SANM_WARM_TIMING= timeout 28800 python scripts/run_experiments.py \
  --out $RT --meshes human --energies neohookean_c neohookean_i arap \
  --solvers baseline_noproj --tasks gravity --cell-timeout 9000 || true
SANM_WARM_TIMING= timeout 9000 python scripts/run_experiments.py \
  --out $RT --meshes human --energies arap --solvers baseline_noproj \
  --tasks deform --cell-timeout 8800 || true
echo "NOPROJ/LEVMAR CELLS COMPLETE"
