#!/bin/bash
# Round-3 continuation, wave 2 (run AFTER r3b_wave1.sh; sequential,
# nothing else may touch the CPU while timed cells run):
#  1. per-component profiles (ARAP + NHC) with the shipped code;
#  2. solver shootouts: armadillo re-run with the memory-fixed blocked
#     Cholesky, bob refresh (the committed artifact is the stale
#     round-2 one);
#  3. cached-cold bench re-measure (VERDICT r2 item 7 acceptance);
#  4. human NHC deform pair (the cell the round-3 outage interrupted)
#     + the Chen et al. 2014 comparison cells.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

[ -f $RT/profile_step_armadillo_arap.json ] || \
timeout 3600 python scripts/profile_step.py --mesh armadillo_small.json \
  --energy arap --order 20 \
  --out $RT/profile_step_armadillo_arap.json || true
[ -f $RT/profile_step_armadillo_nhc.json ] || \
timeout 3600 python scripts/profile_step.py --mesh armadillo_small.json \
  --energy neohookean_c --order 20 \
  --out $RT/profile_step_armadillo_nhc.json || true

# the wave-1 artifact recorded the pre-fix dense_chol OOM at n=41k;
# keep it as evidence and re-run with the row-panel trailing update
if grep -q '"error"' $RT/solver_shootout_armadillo.json 2>/dev/null && \
   [ ! -f $RT/solver_shootout_armadillo_oom_prefix.json ]; then
  mv $RT/solver_shootout_armadillo.json \
     $RT/solver_shootout_armadillo_oom_prefix.json
fi
[ -f $RT/solver_shootout_armadillo.json ] || \
timeout 7200 python scripts/bench_solvers.py --mesh armadillo_small.json \
  --solvers host_lu dense_chol \
  --out $RT/solver_shootout_armadillo.json || true
[ -f $RT/solver_shootout_bob_r3.json ] || \
timeout 7200 python scripts/bench_solvers.py --mesh bob.json \
  --solvers host_lu dense_chol cg \
  --out $RT/solver_shootout_bob_r3.json || true

if [ ! -f $RT/bench_cold_hoisted.json ]; then
  timeout 3600 python bench.py > /tmp/bench_hoist_1.json 2>/tmp/bench_hoist_1.log
  timeout 3600 python bench.py > /tmp/bench_hoist_2.json 2>/tmp/bench_hoist_2.log \
    && cp /tmp/bench_hoist_2.json $RT/bench_cold_hoisted.json
fi

for c in human-neohookean_c-sanm-deform human-neohookean_c-sanm_no_pade-deform; do
  [ -f $RT/$c/done ] || rm -rf $RT/$c
done
python scripts/run_experiments.py --out $RT \
  --meshes human --energies neohookean_c \
  --solvers sanm sanm_no_pade --tasks deform --cell-timeout 5200 || true

rm -rf $RT/chen-inv-bar $RT/chen-inv-plant
bash scripts/run_chen.sh

echo "WAVE2 COMPLETE"
