#!/bin/bash
# Round-3 continuation chain (session restart after the tunnel outage +
# two API-dead sessions).  Priority-reordered union of r4_kickoff step 1,
# r3b_wave3, and r3b_wave4:
#   1. solo re-measure of the HEADLINE pair (armadillo NHC gravity +/-
#      Pade) — committed 19.8 s cell is contention-suspect (bench.py
#      measured 13.6 s solo with cached compile);
#   2. wave-3 stage 0: profile redo with the rewritten live-restart
#      harness + armadillo dense_chol shootout retry with the
#      memory-lean assembly (df494ce) — the VERDICT roofline item;
#   3. wave-4 item 1: the remaining sanm deform cells (completes the
#      main sanm matrix — higher value than noproj extras);
#   4. wave-3 stage 1: stale ARAP sanm re-measures (pre-optimization
#      numbers; symmetric pairing eb08b29 + two-level a897b76 landed
#      after they were measured);
#   5. the two Newton ARAP-deform baselines (main-matrix cells);
#   6. wave-3 stages 2/3: noproj small/mid + large singles + levmar;
#   7. wave-4 item 2: human noproj singles (most expensive family).
# Everything is done-marker gated; safe to re-run.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

RE() {
  local cells=()
  while [ "$1" != "--" ]; do cells+=("$1"); shift; done
  shift
  for c in "${cells[@]}"; do [ -f "$RT/$c/done" ] || rm -rf "$RT/$c"; done
  python scripts/run_experiments.py --out $RT "$@" || true
}

# -- 1: headline pair, solo (one-shot wipe guarded by a repo-side stamp
# so a chain restart does not re-wipe a completed re-measure) -----------
if [ ! -f $RT/.r3c_headline_rewiped ]; then
  rm -rf $RT/armadillo_small-neohookean_c-sanm-gravity \
         $RT/armadillo_small-neohookean_c-sanm_no_pade-gravity
  touch $RT/.r3c_headline_rewiped
fi
RE armadillo_small-neohookean_c-sanm-gravity \
   armadillo_small-neohookean_c-sanm_no_pade-gravity -- \
  --meshes armadillo_small --energies neohookean_c \
  --solvers sanm sanm_no_pade --tasks gravity --cell-timeout 3600

# -- 2: profile redo + shootout retry (wave-3 stage 0; stamp moved into
# the repo so the wiped /tmp cannot replay the one-shot deletes) --------
if [ ! -f $RT/.r3c_prof_redone ]; then
  rm -f $RT/profile_step_armadillo_arap.json \
        $RT/profile_step_armadillo_nhc.json
  if grep -q '"error"' $RT/solver_shootout_armadillo.json 2>/dev/null; then
    mv $RT/solver_shootout_armadillo.json \
       $RT/solver_shootout_armadillo_oom_assembly.json
  fi
  touch $RT/.r3c_prof_redone
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

# -- 3: remaining sanm deform cells (wave-4 item 1) ---------------------
python scripts/run_experiments.py --out $RT \
  --meshes bar2 --energies neohookean_c neohookean_i \
  --solvers sanm sanm_no_pade --tasks deform --cell-timeout 5200 || true
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies neohookean_c \
  --solvers sanm_no_pade --tasks deform --cell-timeout 5200 || true
python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies neohookean_i arap \
  --solvers sanm sanm_no_pade --tasks deform --cell-timeout 5200 || true
python scripts/run_experiments.py --out $RT \
  --meshes human --energies neohookean_i \
  --solvers sanm sanm_no_pade --tasks deform --cell-timeout 5200 || true

# -- 4: stale ARAP sanm re-measures (wave-3 stage 1) --------------------
if [ ! -f $RT/.r3c_arap_rewiped ]; then
  for m in bar bifur3 bob plant; do
    rm -rf $RT/$m-arap-sanm-gravity $RT/$m-arap-sanm_no_pade-gravity
  done
  for m in bifur3 bob bar2 plant human; do
    rm -rf $RT/$m-arap-sanm-deform $RT/$m-arap-sanm_no_pade-deform
  done
  touch $RT/.r3c_arap_rewiped
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
RE human-arap-sanm-deform human-arap-sanm_no_pade-deform -- \
  --meshes human --energies arap --solvers sanm sanm_no_pade \
  --tasks deform --cell-timeout 5200

# -- 5: Newton ARAP-deform baselines (main-matrix cells, single-run) ----
SANM_WARM_TIMING= timeout 14400 python scripts/run_experiments.py \
  --out $RT --meshes armadillo_small --energies arap \
  --solvers baseline --tasks deform --cell-timeout 7000 || true
SANM_WARM_TIMING= timeout 14400 python scripts/run_experiments.py \
  --out $RT --meshes human --energies arap \
  --solvers baseline --tasks deform --cell-timeout 7000 || true

# -- 6: noproj small/mid + large singles + levmar (wave-3 stages 2/3) ---
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

# -- 7: human noproj singles (wave-4 item 2) ----------------------------
for e in neohookean_c neohookean_i arap; do
  SANM_WARM_TIMING= timeout 14400 python scripts/run_experiments.py \
    --out $RT --meshes human --energies $e \
    --solvers baseline_noproj --tasks gravity --cell-timeout 7000 || true
done
SANM_WARM_TIMING= timeout 14400 python scripts/run_experiments.py \
  --out $RT --meshes human --energies arap \
  --solvers baseline_noproj --tasks deform --cell-timeout 7000 || true

echo "R3C CHAIN COMPLETE"
