#!/bin/bash
# Round-4 chain, wave d — supersedes r4c stages 4-10.  Reprioritized
# after the column-panel band factor landed (commit e8dbfbf): the r4c
# band cells were measured on the OLD band-row layout whose backward
# substitution made XLA materialize a 2.8 GB transposed factor copy
# per solve (armadillo cell OOMed, bob paid ~2x).  Re-measuring those
# is worth more than hours of timeout-bounded baseline columns, which
# now run last, cheapest-first.
#
# Run detached, strictly solo (1-core host + 1 TPU chip):
#   nohup bash scripts/r4d_chain.sh [WAIT_PID] > /tmp/r4d_chain.log 2>&1 &
#   echo $! > /tmp/r4d_chain.pid
# Every stage is done-marker gated; safe to kill + re-run.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

# -- 0: wait for an in-flight cell from the previous chain (PID arg) --------
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# -- A: band cells on the column-panel factor -------------------------------
if [ ! -f $RT/.r4d_band_rewiped ]; then
  rm -rf $RT/armadillo_small-neohookean_c-sanm_band-gravity \
         $RT/bob-neohookean_c-sanm_band-gravity \
         $RT/bar-neohookean_c-sanm_band-gravity
  touch $RT/.r4d_band_rewiped
fi
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies neohookean_c \
  --solvers sanm_band --tasks gravity --cell-timeout 5400 || true
[ -f $RT/solver_shootout_armadillo_band.json ] || \
timeout 5400 python scripts/bench_solvers.py --mesh armadillo_small.json \
  --energy neohookean_c --solvers band_chol \
  --out $RT/solver_shootout_armadillo_band.json || true
python scripts/run_experiments.py --out $RT \
  --meshes bob bar --energies neohookean_c \
  --solvers sanm_band --tasks gravity --cell-timeout 5400 || true

# -- B: deform sanm completion (r4c stage 7 head) ----------------------------
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies arap neohookean_c neohookean_i \
  --solvers sanm sanm_no_pade --tasks deform --cell-timeout 5400 || true
python scripts/run_experiments.py --out $RT \
  --meshes human --energies neohookean_i --solvers sanm sanm_no_pade \
  --tasks deform --cell-timeout 5400 || true

# -- C: jet re-measure (old cell predates the CSR residual evaluator and
#       has no done marker; wipe for a clean log) ---------------------------
if [ ! -f $RT/.r4d_jet_rewiped ]; then
  rm -rf $RT/jet-neohookean_i-sanm-gravity
  touch $RT/.r4d_jet_rewiped
fi
python scripts/run_experiments.py --out $RT \
  --meshes jet --energies neohookean_i --solvers sanm --tasks gravity \
  --cell-timeout 5400 || true

# -- D: bob shootout, all three device-relevant backends (new band code) ----
[ -f $RT/solver_shootout_bob.json ] || \
timeout 7200 python scripts/bench_solvers.py --mesh bob.json \
  --energy neohookean_c --solvers host_lu dense_chol band_chol \
  --out $RT/solver_shootout_bob.json || true

# -- E: human at band scale (dense factor infeasible: 23.7 GB vs 4.8 GB) ----
python scripts/run_experiments.py --out $RT \
  --meshes human --energies neohookean_c \
  --solvers sanm_band --tasks gravity --cell-timeout 7200 || true

# -- F: ARAP-deform baselines (r4c stage 7 tail) ------------------------------
python scripts/run_experiments.py --out $RT \
  --meshes human armadillo_small --energies arap --solvers baseline \
  --tasks deform --cell-timeout 5400 || true

# -- G: remaining baseline columns, cheapest-first ---------------------------
python scripts/run_experiments.py --out $RT \
  --meshes bar --energies neohookean_c arap \
  --solvers baseline_levmar --tasks gravity --cell-timeout 3600 || true
python scripts/run_experiments.py --out $RT \
  --meshes bob --energies neohookean_c arap \
  --solvers baseline_noproj --tasks gravity --cell-timeout 4500 || true
python scripts/run_experiments.py --out $RT \
  --meshes bob --energies neohookean_c \
  --solvers baseline_levmar --tasks gravity --cell-timeout 3600 || true
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small bob --energies arap \
  --solvers baseline_levmar --tasks gravity --cell-timeout 3600 || true

touch $RT/.r4d_complete
echo "R4D CHAIN COMPLETE"
