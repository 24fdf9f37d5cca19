#!/bin/bash
# Round-4 first action (see memory + PROGRESS.md "Remaining work"):
# priority-ordered TPU jobs, all resumable.  Run detached:
#   nohup bash scripts/r4_kickoff.sh > /tmp/r4_kickoff.log 2>&1 &
#   echo $! > /tmp/r4_kickoff.pid
#
# Order rationale:
#  1. solo re-measure of the HEADLINE pair (armadillo NHC gravity
#     ± Padé) — the committed 32.8 s cell is contention-inflated
#     (22.0 s solo in r2) and it's the bench.py cell;
#  2. ARAP gravity pair re-measure — picks up the symmetric-pairing
#     convolution change (eb08b29; expect the 0.68 s/order step to
#     drop) so the flagship ARAP numbers reflect shipped code;
#  3. ARAP per-component profile (roofline item);
#  4. the round-3 sequential chain (matrix completion + post jobs),
#     which also solo-re-measures every pre-15:45 cell.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

STAMP=/tmp/r4_epoch
[ -f $STAMP ] || touch $STAMP   # cells re-measured after kickoff are fresh
fresh() { [ -f "$RT/$1/done" ] && [ "$RT/$1/done" -nt "$STAMP" ]; }
RE() {
  local cells=()
  while [ "$1" != "--" ]; do cells+=("$1"); shift; done
  shift
  local all=1
  for c in "${cells[@]}"; do fresh "$c" || all=0; done
  [ "$all" = 1 ] && return
  for c in "${cells[@]}"; do rm -rf "$RT/$c"; done
  python scripts/run_experiments.py --out $RT "$@" || true
}

# 1: headline pair, solo
RE armadillo_small-neohookean_c-sanm-gravity \
   armadillo_small-neohookean_c-sanm_no_pade-gravity -- \
  --meshes armadillo_small --energies neohookean_c \
  --solvers sanm sanm_no_pade --tasks gravity --cell-timeout 3600

# 2: flagship ARAP pair with the paired convolutions
RE armadillo_small-arap-sanm-gravity \
   armadillo_small-arap-sanm_no_pade-gravity -- \
  --meshes armadillo_small --energies arap \
  --solvers sanm sanm_no_pade --tasks gravity --cell-timeout 3600

# 3: ARAP per-component profile (was queued in post_matrix_jobs)
[ -f $RT/profile_step_armadillo_arap.json ] || \
timeout 3600 python scripts/profile_step.py --mesh armadillo_small.json \
  --energy arap --order 20 \
  --out $RT/profile_step_armadillo_arap.json || true

# 4: everything else (matrix completion, Chen, shootouts, noproj,
#    cold re-measure, remaining solo cells)
bash scripts/rerun_r3_sequential.sh
echo "R4 KICKOFF COMPLETE"
