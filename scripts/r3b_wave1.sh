#!/bin/bash
# Round-3 continuation, wave 1 (sequential, single TPU + 1-core host —
# nothing else may touch the CPU while timed cells run):
#  1. solver shootout on the headline mesh (host_lu vs dense_chol at
#     n=41k via the blocked single-buffer Cholesky) — decides whether
#     dense_chol becomes the auto solver at this scale;
#  2. ARAP per-component profile (VERDICT r2 item 6; also measures the
#     symmetric-pairing + two-level-loop effect on the per-order step);
#  3. armadillo ARAP gravity pair with the shipped code (the committed
#     58.0/60.2 s cells predate the pairing and two-level changes);
#  4. human ARAP gravity pair re-measure (248.2/526.9 s committed,
#     same code skew).
# Resumable via done markers / output files.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

[ -f $RT/solver_shootout_armadillo.json ] || \
timeout 7200 python scripts/bench_solvers.py --mesh armadillo_small.json \
  --solvers host_lu dense_chol \
  --out $RT/solver_shootout_armadillo.json || true

[ -f $RT/profile_step_armadillo_arap.json ] || \
timeout 3600 python scripts/profile_step.py --mesh armadillo_small.json \
  --energy arap --order 20 \
  --out $RT/profile_step_armadillo_arap.json || true

for c in armadillo_small-arap-sanm-gravity \
         armadillo_small-arap-sanm_no_pade-gravity; do
  [ -f $RT/$c/done ] || rm -rf $RT/$c
done
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies arap \
  --solvers sanm sanm_no_pade --tasks gravity --cell-timeout 3600 || true

rm -rf $RT/human-arap-sanm-gravity $RT/human-arap-sanm_no_pade-gravity
python scripts/run_experiments.py --out $RT \
  --meshes human --energies arap \
  --solvers sanm sanm_no_pade --tasks gravity --cell-timeout 5200 || true

echo "WAVE1 COMPLETE"
