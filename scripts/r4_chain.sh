#!/bin/bash
# Round-4 measurement chain (VERDICT r3 items 1-4, 7, 9 acceptance).
# Run detached, strictly solo (1-core host + 1 TPU chip; concurrent
# jobs inflate timings 30-50%):
#   nohup bash scripts/r4_chain.sh > /tmp/r4_chain.log 2>&1 &
#   echo $! > /tmp/r4_chain.pid
#
# Priority order:
#  1. HEADLINE NHC gravity pair re-measure — first cells to pick up the
#     round-4 perf code (Jacobian/factorization overlap e1c0af1, CSR
#     residual evaluator 8d10ff9, devloop scan fusion 463af0a).
#     Acceptance: warm <= 20 s, restart <= 3 s (VERDICT item 1).
#  2. ARAP gravity pair re-measure (stale: symmetric pairing eb08b29 +
#     two-level loop landed after the committed numbers; VERDICT item 7).
#  3. Fresh per-component profiles (NHC + ARAP) — the Pallas decision
#     data (VERDICT item 9) + RESULTS roofline refresh.
#  4. Inverse-design cells (BASELINE.json config #5; VERDICT item 3).
#  5. baseline_noproj / baseline_levmar columns (VERDICT item 3) —
#     timeouts recorded as lower bounds by run_experiments.py.
#  6. jet NHI cell (never completed).
#  7. sanm deform-matrix completion + the two ARAP-deform baselines.
#  8. dense_chol shootout at bob with the scan-fused devloop (VERDICT
#     item 4 acceptance: beat host_lu's 10.5 s warm) + armadillo retry.
# Every stage is done-marker gated; safe to kill + re-run.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

STAMP=$RT/.r4_epoch
[ -f $STAMP ] || touch $STAMP
fresh() { [ -f "$RT/$1/done" ] && [ "$RT/$1/done" -nt "$STAMP" ]; }
# RE <cells...> -- <run_experiments args...>: wipe any cell not measured
# after the round-4 epoch, then (re-)measure the block.
RE() {
  local cells=()
  while [ "$1" != "--" ]; do cells+=("$1"); shift; done
  shift
  local all=1
  for c in "${cells[@]}"; do fresh "$c" || all=0; done
  [ "$all" = 1 ] && return
  for c in "${cells[@]}"; do fresh "$c" || rm -rf "$RT/$c"; done
  python scripts/run_experiments.py --out $RT "$@" || true
}
# MEASURE-only (no wipe): for never-measured cells
M() { python scripts/run_experiments.py --out $RT "$@" || true; }

# -- 1: headline pair -----------------------------------------------------
RE armadillo_small-neohookean_c-sanm-gravity \
   armadillo_small-neohookean_c-sanm_no_pade-gravity -- \
  --meshes armadillo_small --energies neohookean_c \
  --solvers sanm sanm_no_pade --tasks gravity --cell-timeout 3600

# -- 2: ARAP pair ----------------------------------------------------------
RE armadillo_small-arap-sanm-gravity \
   armadillo_small-arap-sanm_no_pade-gravity -- \
  --meshes armadillo_small --energies arap \
  --solvers sanm sanm_no_pade --tasks gravity --cell-timeout 3600

# -- 3: fresh profiles (one-shot wipe per round-4 epoch) -------------------
if [ ! -f $RT/.r4_prof_rewiped ]; then
  rm -f $RT/profile_step_armadillo_nhc.json \
        $RT/profile_step_armadillo_arap.json
  touch $RT/.r4_prof_rewiped
fi
[ -f $RT/profile_step_armadillo_nhc.json ] || \
timeout 4000 python scripts/profile_step.py --mesh armadillo_small.json \
  --energy neohookean_c --order 20 \
  --out $RT/profile_step_armadillo_nhc.json || true
[ -f $RT/profile_step_armadillo_arap.json ] || \
timeout 4000 python scripts/profile_step.py --mesh armadillo_small.json \
  --energy arap --order 20 \
  --out $RT/profile_step_armadillo_arap.json || true

# -- 4: inverse cells ------------------------------------------------------
M --meshes armadillo_small --energies neohookean_c --solvers sanm \
  --tasks inverse --cell-timeout 7200
M --meshes bob --energies neohookean_i --solvers sanm \
  --tasks inverse --cell-timeout 7200

# -- 5: noproj / levmar columns --------------------------------------------
M --meshes bar --energies neohookean_c arap \
  --solvers baseline_noproj baseline_levmar --tasks gravity \
  --cell-timeout 3600
M --meshes bob --energies neohookean_c arap \
  --solvers baseline_noproj baseline_levmar --tasks gravity \
  --cell-timeout 5400
M --meshes armadillo_small --energies neohookean_c arap \
  --solvers baseline_noproj baseline_levmar --tasks gravity \
  --cell-timeout 5400

# -- 6: jet ----------------------------------------------------------------
M --meshes jet --energies neohookean_i --solvers sanm --tasks gravity \
  --cell-timeout 5400

# -- 7: sanm deform completion + ARAP-deform baselines ---------------------
M --meshes armadillo_small --energies arap neohookean_c neohookean_i \
  --solvers sanm sanm_no_pade --tasks deform --cell-timeout 5400
M --meshes human --energies neohookean_i --solvers sanm sanm_no_pade \
  --tasks deform --cell-timeout 5400
M --meshes human armadillo_small --energies arap --solvers baseline \
  --tasks deform --cell-timeout 5400

# -- 8: dense_chol shootouts (scan-fused devloop) --------------------------
if [ ! -f $RT/.r4_shootout_rewiped ]; then
  mv -f $RT/solver_shootout_bob.json $RT/solver_shootout_bob_r3b.json \
    2>/dev/null
  touch $RT/.r4_shootout_rewiped
fi
[ -f $RT/solver_shootout_bob.json ] || \
timeout 5400 python scripts/bench_solvers.py --mesh bob.json \
  --energy neohookean_c --solvers host_lu dense_chol \
  --out $RT/solver_shootout_bob.json || true
[ -f $RT/solver_shootout_armadillo.json ] || \
timeout 5400 python scripts/bench_solvers.py --mesh armadillo_small.json \
  --energy neohookean_c --solvers host_lu dense_chol \
  --out $RT/solver_shootout_armadillo.json || true

echo "R4 CHAIN COMPLETE"
