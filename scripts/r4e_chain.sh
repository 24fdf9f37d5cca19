#!/bin/bash
# Round-4 chain, wave e — runs after r4d completes (or is preempted).
# 1: the never-measured problem-size scaling curves (band vs host_lu on
#    the constant-bandwidth growing beam — the TPU-native counterpart of
#    the reference thread-scalability experiment, see
#    scripts/run_size_scaling.py header);
# 2: re-issues r4d stage G (done-marker gated, so only missing
#    baseline-column cells actually run).
#
# Run detached, strictly solo (1-core host + 1 TPU chip):
#   nohup bash scripts/r4e_chain.sh [WAIT_PID] > /tmp/r4e_chain.log 2>&1 &
#   echo $! > /tmp/r4e_chain.pid
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# -- A0: re-measure the armadillo NHC Pade deform cell — its r4d warm leg
#        (214 s vs 53 s for the no-Pade twin) overlapped builder pytest
#        runs on the 1-core host and is contention-skewed -------------------
if [ ! -f $RT/.r4e_nhc_deform_rewiped ]; then
  rm -rf $RT/armadillo_small-neohookean_c-sanm-deform
  touch $RT/.r4e_nhc_deform_rewiped
fi
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies neohookean_c --solvers sanm \
  --tasks deform --cell-timeout 5400 || true

# -- A1: jet NHI gravity — the r4d run hit the band-factor orthogonality
#        failure (auto threshold mis-calibration, fixed + fallback added);
#        re-run with the corrected dispatch (jet now resolves host_lu) ------
if [ ! -f $RT/.r4e_jet_rewiped ]; then
  rm -rf $RT/jet-neohookean_i-sanm-gravity
  touch $RT/.r4e_jet_rewiped
fi
python scripts/run_experiments.py --out $RT \
  --meshes jet --energies neohookean_i --solvers sanm --tasks gravity \
  --cell-timeout 5400 || true

# -- A: size scaling, device band factor then host LU ------------------------
[ -f $RT/size_scaling_band.json ] || \
python scripts/run_size_scaling.py --xs 20 80 320 --solver band_chol \
  --timeout 3600 --out $RT/size_scaling_band.json || true
[ -f $RT/size_scaling_hostlu.json ] || \
python scripts/run_size_scaling.py --xs 20 80 320 --solver host_lu \
  --timeout 3600 --out $RT/size_scaling_hostlu.json || true

# -- A2: human band retry with deeper refinement — the r4d leg failed the
#        orthogonality gate at 1.15e-4 (vs the 1e-4 bound): the adaptive
#        refinement exits at ||r|| <= 1e-12||b||, but the SOLUTION error is
#        ~kappa*rtol, which at human scale is ~1e-4.  Disable the early
#        exit (RTOL=0 -> fixed trips) and raise the trip count. -------------
if [ ! -f $RT/.r4e_human_band_rewiped ]; then
  rm -rf $RT/human-neohookean_c-sanm_band-gravity
  touch $RT/.r4e_human_band_rewiped
fi
SANM_REFINE_STEPS=16 SANM_REFINE_RTOL=0 python scripts/run_experiments.py \
  --out $RT --meshes human --energies neohookean_c \
  --solvers sanm_band --tasks gravity --cell-timeout 7200 || true

# -- B: r4d stage G remainder (gated; no-ops on done cells) -------------------
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

touch $RT/.r4e_complete
echo "R4E CHAIN COMPLETE"
