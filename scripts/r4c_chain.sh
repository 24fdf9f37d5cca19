#!/bin/bash
# Round-4 consolidated priority chain — supersedes the unfinished tail
# of r4_chain.sh (stages 5-8) and all of r4b_chain.sh.  Reordering
# rationale: the fresh profiles (results_tpu/profile_step_armadillo_*.json)
# show host sparse_prep is ~50% of the warm solve and the per-order host
# crossings another ~25%, so validating the device band_chol path
# (VERDICT item 5 acceptance) is worth more than hours of
# timeout-bounded LevMar columns; those follow, cheapest-bound-first.
#
# Run detached, strictly solo (1-core host + 1 TPU chip):
#   nohup bash scripts/r4c_chain.sh > /tmp/r4c_chain.log 2>&1 &
#   echo $! > /tmp/r4c_chain.pid
# Every stage is done-marker gated; safe to kill + re-run.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

# -- 0: band acceptance shootout (VERDICT item 5: device factorize +
#       20 solves must beat host splu at armadillo-small) ------------------
if [ ! -f $RT/.r4c_shootout_rewiped ]; then
  mv -f $RT/solver_shootout_bob.json $RT/solver_shootout_bob_r3b.json \
    2>/dev/null
  touch $RT/.r4c_shootout_rewiped
fi
[ -f $RT/solver_shootout_armadillo.json ] || \
timeout 5400 python scripts/bench_solvers.py --mesh armadillo_small.json \
  --energy neohookean_c --solvers host_lu band_chol \
  --out $RT/solver_shootout_armadillo.json || true

# -- 1: band smoke at bar scale, then the band headline cells ---------------
python scripts/run_experiments.py --out $RT \
  --meshes bar --energies neohookean_c \
  --solvers sanm_band --tasks gravity --cell-timeout 3000 || true
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small bob --energies neohookean_c \
  --solvers sanm_band --tasks gravity --cell-timeout 5400 || true

# -- 2: ARAP pair re-measure solo (r4_chain's ran under builder pytest
#       contention; one-shot wipe) ------------------------------------------
if [ ! -f $RT/.r4c_arap_rewiped ]; then
  rm -rf $RT/armadillo_small-arap-sanm-gravity \
         $RT/armadillo_small-arap-sanm_no_pade-gravity
  touch $RT/.r4c_arap_rewiped
fi
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies arap \
  --solvers sanm sanm_no_pade --tasks gravity --cell-timeout 3600 || true

# -- 3: 5-solver table columns, headline mesh first --------------------------
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies neohookean_c arap \
  --solvers baseline_noproj --tasks gravity --cell-timeout 4500 || true
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies neohookean_c \
  --solvers baseline_levmar --tasks gravity --cell-timeout 3600 || true

# -- 4: bar column completion (levmar rerun carries the sparse-path fix) ----
python scripts/run_experiments.py --out $RT \
  --meshes bar --energies neohookean_c arap \
  --solvers baseline_levmar --tasks gravity --cell-timeout 3600 || true
python scripts/run_experiments.py --out $RT \
  --meshes bar --energies arap \
  --solvers baseline_noproj --tasks gravity --cell-timeout 3600 || true

# -- 5: bob columns -----------------------------------------------------------
python scripts/run_experiments.py --out $RT \
  --meshes bob --energies neohookean_c arap \
  --solvers baseline_noproj --tasks gravity --cell-timeout 4500 || true
python scripts/run_experiments.py --out $RT \
  --meshes bob --energies neohookean_c \
  --solvers baseline_levmar --tasks gravity --cell-timeout 3600 || true

# -- 6: jet NHI (never measured) ---------------------------------------------
python scripts/run_experiments.py --out $RT \
  --meshes jet --energies neohookean_i --solvers sanm --tasks gravity \
  --cell-timeout 5400 || true

# -- 7: sanm deform completion + ARAP-deform baselines ------------------------
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies arap neohookean_c neohookean_i \
  --solvers sanm sanm_no_pade --tasks deform --cell-timeout 5400 || true
python scripts/run_experiments.py --out $RT \
  --meshes human --energies neohookean_i --solvers sanm sanm_no_pade \
  --tasks deform --cell-timeout 5400 || true
python scripts/run_experiments.py --out $RT \
  --meshes human armadillo_small --energies arap --solvers baseline \
  --tasks deform --cell-timeout 5400 || true

# -- 8: bob shootout w/ all three device-relevant backends --------------------
[ -f $RT/solver_shootout_bob.json ] || \
timeout 7200 python scripts/bench_solvers.py --mesh bob.json \
  --energy neohookean_c --solvers host_lu dense_chol band_chol \
  --out $RT/solver_shootout_bob.json || true

# -- 9: human at band scale (dense factor infeasible: 23.7 GB vs 4.8 GB) -----
python scripts/run_experiments.py --out $RT \
  --meshes human --energies neohookean_c \
  --solvers sanm_band --tasks gravity --cell-timeout 7200 || true

# -- 10: ARAP levmar lower-bound cells (cheapest value last) ------------------
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small bob --energies arap \
  --solvers baseline_levmar --tasks gravity --cell-timeout 3600 || true

touch $RT/.r4c_complete
echo "R4C CHAIN COMPLETE"
