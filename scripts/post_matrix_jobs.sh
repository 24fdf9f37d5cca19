#!/bin/bash
# Post-matrix TPU jobs (run sequentially once the matrix halves finish,
# so none of them contend with timed cells):
#  1. Chen-2014 comparison cells with the shipped round-3 code
#  2. solver backend shootout incl. the new dense_chol (replaces the
#     stale round-2 artifact whose PCG entry predates the root-cause)
#  3. per-component roofline numbers for RESULTS.md
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
bash scripts/run_chen.sh
timeout 5400 python scripts/bench_solvers.py --mesh bob.json \
  --solvers host_lu dense_chol \
  --out results_tpu/solver_shootout_bob.json || true
timeout 3600 python scripts/profile_step.py --mesh armadillo_small.json \
  --energy neohookean_c --order 20 \
  --out results_tpu/profile_step_armadillo_nhc.json || true
timeout 3600 python scripts/profile_step.py --mesh armadillo_small.json \
  --energy arap --order 20 \
  --out results_tpu/profile_step_armadillo_arap.json || true
echo "POST-MATRIX JOBS COMPLETE"
