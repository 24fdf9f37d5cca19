#!/bin/bash
# Round-4 follow-up chain: band_chol TPU validation + re-measures.
# Run AFTER r4_chain.sh completes (strictly solo):
#   nohup bash scripts/r4b_chain.sh > /tmp/r4b_chain.log 2>&1 &
#   echo $! > /tmp/r4b_chain.pid
#
#  1. band_chol headline cells (armadillo NHC + bob NHC gravity): the
#     device-resident sparse direct factorization (solver/band.py) vs
#     the measured host_lu cells — VERDICT item 5 acceptance is
#     "device factorize + 20 solves beats host splu at armadillo".
#  2. ARAP gravity pair re-measure — the r4_chain cells were measured
#     under concurrent pytest runs (builder session contention).
#  3. Solver shootouts WITH band_chol (bob + armadillo), replacing the
#     host_lu/dense_chol-only artifacts.
#  4. human NHC sanm_band cell: the scale the dense factor cannot
#     reach (23.7 GB dense vs 4.8 GB band).
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

# -- 1: band headline cells -------------------------------------------------
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small bob --energies neohookean_c \
  --solvers sanm_band --tasks gravity --cell-timeout 5400 || true

# -- 2: ARAP pair re-measure (one-shot wipe) ---------------------------------
if [ ! -f $RT/.r4b_arap_rewiped ]; then
  rm -rf $RT/armadillo_small-arap-sanm-gravity \
         $RT/armadillo_small-arap-sanm_no_pade-gravity
  touch $RT/.r4b_arap_rewiped
fi
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies arap \
  --solvers sanm sanm_no_pade --tasks gravity --cell-timeout 3600 || true

# -- 3: shootouts with band_chol ---------------------------------------------
if [ ! -f $RT/.r4b_shootout_rewiped ]; then
  mv -f $RT/solver_shootout_bob.json $RT/solver_shootout_bob_r4a.json \
    2>/dev/null
  mv -f $RT/solver_shootout_armadillo.json \
        $RT/solver_shootout_armadillo_r4a.json 2>/dev/null
  touch $RT/.r4b_shootout_rewiped
fi
[ -f $RT/solver_shootout_bob.json ] || \
timeout 7200 python scripts/bench_solvers.py --mesh bob.json \
  --energy neohookean_c --solvers host_lu dense_chol band_chol \
  --out $RT/solver_shootout_bob.json || true
[ -f $RT/solver_shootout_armadillo.json ] || \
timeout 7200 python scripts/bench_solvers.py --mesh armadillo_small.json \
  --energy neohookean_c --solvers host_lu band_chol \
  --out $RT/solver_shootout_armadillo.json || true

# -- 4: human at band scale ---------------------------------------------------
python scripts/run_experiments.py --out $RT \
  --meshes human --energies neohookean_c \
  --solvers sanm_band --tasks gravity --cell-timeout 7200 || true

echo "R4B CHAIN COMPLETE"
