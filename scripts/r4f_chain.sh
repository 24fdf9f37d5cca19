#!/bin/bash
# Round-4 chain, wave f — supersedes r4e after the dual-chain discovery:
# a second r4d instance from the PREVIOUS session (launched with a
# WAIT_PID arg) resumed unnoticed and ran concurrently with this
# session's chain from ~14:10 to ~16:05, so every cell measured in that
# window carries 2-process contention (+30-50% measured inflation).
# This wave re-measures the contaminated cells strictly solo, in value
# order, then finishes the r4e items.
#
# Run detached, strictly solo (1-core host + 1 TPU chip):
#   nohup bash scripts/r4f_chain.sh > /tmp/r4f_chain.log 2>&1 &
#   echo $! > /tmp/r4f_chain.pid
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

# -- A: bob shootout re-measure (the band-story headline numbers) ------------
if [ ! -f $RT/.r4f_bob_shootout_rewiped ]; then
  rm -f $RT/solver_shootout_bob.json
  touch $RT/.r4f_bob_shootout_rewiped
fi
[ -f $RT/solver_shootout_bob.json ] || \
timeout 7200 python scripts/bench_solvers.py --mesh bob.json \
  --energy neohookean_c --solvers host_lu dense_chol band_chol \
  --out $RT/solver_shootout_bob.json || true

# -- B: armadillo NHC Pade deform (contention-skewed warm leg) ---------------
if [ ! -f $RT/.r4f_nhc_deform_rewiped ]; then
  rm -rf $RT/armadillo_small-neohookean_c-sanm-deform
  touch $RT/.r4f_nhc_deform_rewiped
fi
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies neohookean_c --solvers sanm \
  --tasks deform --cell-timeout 5400 || true

# -- C: jet re-run (band mis-dispatch fixed; auto now resolves host_lu) ------
if [ ! -f $RT/.r4f_jet_rewiped ]; then
  rm -rf $RT/jet-neohookean_i-sanm-gravity
  touch $RT/.r4f_jet_rewiped
fi
python scripts/run_experiments.py --out $RT \
  --meshes jet --energies neohookean_i --solvers sanm --tasks gravity \
  --cell-timeout 5400 || true

# -- D: NHI deform pairs re-measure (dual-chain window) ----------------------
if [ ! -f $RT/.r4f_nhi_deform_rewiped ]; then
  rm -rf $RT/armadillo_small-neohookean_i-sanm-deform \
         $RT/armadillo_small-neohookean_i-sanm_no_pade-deform \
         $RT/human-neohookean_i-sanm-deform \
         $RT/human-neohookean_i-sanm_no_pade-deform
  touch $RT/.r4f_nhi_deform_rewiped
fi
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies neohookean_i \
  --solvers sanm sanm_no_pade --tasks deform --cell-timeout 5400 || true
python scripts/run_experiments.py --out $RT \
  --meshes human --energies neohookean_i --solvers sanm sanm_no_pade \
  --tasks deform --cell-timeout 5400 || true

# -- E: human band retry, fixed-trip refinement (r4e A2 rationale) -----------
if [ ! -f $RT/.r4f_human_band_rewiped ]; then
  rm -rf $RT/human-neohookean_c-sanm_band-gravity
  touch $RT/.r4f_human_band_rewiped
fi
SANM_REFINE_STEPS=16 SANM_REFINE_RTOL=0 python scripts/run_experiments.py \
  --out $RT --meshes human --energies neohookean_c \
  --solvers sanm_band --tasks gravity --cell-timeout 7200 || true

# -- F: size scaling curves ---------------------------------------------------
[ -f $RT/size_scaling_band.json ] || \
python scripts/run_size_scaling.py --xs 20 80 320 --solver band_chol \
  --timeout 3600 --out $RT/size_scaling_band.json || true
[ -f $RT/size_scaling_hostlu.json ] || \
python scripts/run_size_scaling.py --xs 20 80 320 --solver host_lu \
  --timeout 3600 --out $RT/size_scaling_hostlu.json || true

# -- G: ARAP deform baselines re-measure (dual-chain window; one-shot
#       protocol cells — contention overstates OUR speedup) ------------------
if [ ! -f $RT/.r4f_arap_deform_baseline_rewiped ]; then
  rm -rf $RT/human-arap-baseline-deform \
         $RT/armadillo_small-arap-baseline-deform
  touch $RT/.r4f_arap_deform_baseline_rewiped
fi
python scripts/run_experiments.py --out $RT \
  --meshes human armadillo_small --energies arap --solvers baseline \
  --tasks deform --cell-timeout 5400 || true

# -- H: baseline columns, cheapest-first (r4d stage G remainder) --------------
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

touch $RT/.r4f_complete
echo "R4F CHAIN COMPLETE"
