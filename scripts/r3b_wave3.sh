#!/bin/bash
# Round-3 continuation, wave 3 (run AFTER r3b_wave2.sh):
#  1. re-measure every remaining ARAP sanm cell with the shipped code —
#     the symmetric-pairing (eb08b29) + two-level-loop (a897b76)
#     optimizations changed the svd-bearing per-order step cost, and
#     the committed numbers predate them (cheapest meshes first);
#  2. baseline_noproj variants, small meshes (reference protocol,
#     cmp_with_baseline.sh:49-53), then the larger single-run cells;
#  3. the levmar demonstration cells (bar).
# Human noproj singles are wave 4 (the most expensive family).
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

# -- 0: redo the profiles (the wave-2 artifacts came from the broken
# standalone-timing harness; profile_step.py was rewritten to measure
# live warm restarts) and retry the armadillo dense_chol shootout with
# the memory-lean scaled assembly (df494ce) -----------------------------
PROF_STAMP=/tmp/r3b_prof_redone
if [ ! -f $PROF_STAMP ]; then
  rm -f $RT/profile_step_armadillo_arap.json \
        $RT/profile_step_armadillo_nhc.json
  if grep -q '"error"' $RT/solver_shootout_armadillo.json 2>/dev/null; then
    mv $RT/solver_shootout_armadillo.json \
       $RT/solver_shootout_armadillo_oom_assembly.json
  fi
  touch $PROF_STAMP
fi
[ -f $RT/profile_step_armadillo_arap.json ] || \
timeout 3600 python scripts/profile_step.py --mesh armadillo_small.json \
  --energy arap --order 20 \
  --out $RT/profile_step_armadillo_arap.json || true
[ -f $RT/profile_step_armadillo_nhc.json ] || \
timeout 3600 python scripts/profile_step.py --mesh armadillo_small.json \
  --energy neohookean_c --order 20 \
  --out $RT/profile_step_armadillo_nhc.json || true
[ -f $RT/solver_shootout_armadillo.json ] || \
timeout 7200 python scripts/bench_solvers.py --mesh armadillo_small.json \
  --solvers host_lu dense_chol \
  --out $RT/solver_shootout_armadillo.json || true

# -- 1: stale ARAP cells (pairs share compiled kernels) ----------------
RE() {
  local cells=()
  while [ "$1" != "--" ]; do cells+=("$1"); shift; done
  shift
  for c in "${cells[@]}"; do [ -f "$RT/$c/done" ] || rm -rf "$RT/$c"; done
  python scripts/run_experiments.py --out $RT "$@" || true
}
STALE=/tmp/r3b_arap_stale
if [ ! -f $STALE ]; then
  # one-shot wipe of the pre-optimization ARAP cells, then resumable
  for m in bar bifur3 bob plant; do
    rm -rf $RT/$m-arap-sanm-gravity $RT/$m-arap-sanm_no_pade-gravity
  done
  for m in bifur3 bob bar2 plant human; do
    rm -rf $RT/$m-arap-sanm-deform $RT/$m-arap-sanm_no_pade-deform
  done
  touch $STALE
fi
for m in bar bifur3 bob plant; do
  RE $m-arap-sanm-gravity $m-arap-sanm_no_pade-gravity -- \
    --meshes $m --energies arap --solvers sanm sanm_no_pade \
    --tasks gravity --cell-timeout 5200
done
for m in bar2 bifur3 bob plant; do
  RE $m-arap-sanm-deform $m-arap-sanm_no_pade-deform -- \
    --meshes $m --energies arap --solvers sanm sanm_no_pade \
    --tasks deform --cell-timeout 5200
done

# -- 2: noproj, small/mid meshes (warm-timed) --------------------------
for m in bar bifur3 bob; do
  timeout 7200 python scripts/run_experiments.py --out $RT \
    --meshes $m --energies arap neohookean_c neohookean_i \
    --solvers baseline_noproj --tasks gravity --cell-timeout 2300 || true
done
for m in bifur3 bob bar2; do
  timeout 7200 python scripts/run_experiments.py --out $RT \
    --meshes $m --energies arap --solvers baseline_noproj \
    --tasks deform --cell-timeout 2300 || true
done

# -- human ARAP deform pair with shipped code (big display cell) -------
RE human-arap-sanm-deform human-arap-sanm_no_pade-deform -- \
  --meshes human --energies arap --solvers sanm sanm_no_pade \
  --tasks deform --cell-timeout 5200

# -- 3: noproj large singles + levmar ----------------------------------
for m in plant armadillo_small; do
  SANM_WARM_TIMING= timeout 14400 python scripts/run_experiments.py \
    --out $RT --meshes $m --energies arap neohookean_c neohookean_i \
    --solvers baseline_noproj --tasks gravity --cell-timeout 4400 || true
  SANM_WARM_TIMING= timeout 7200 python scripts/run_experiments.py \
    --out $RT --meshes $m --energies arap --solvers baseline_noproj \
    --tasks deform --cell-timeout 4400 || true
done
timeout 14400 python scripts/run_experiments.py --out $RT \
  --meshes bar --energies neohookean_c arap neohookean_i \
  --solvers baseline_levmar --tasks gravity --cell-timeout 4400 || true

echo "WAVE3 COMPLETE"
