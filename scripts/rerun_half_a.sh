#!/bin/bash
# Round-3 matrix half A: gravity sanm cells (+ armadillo ARAP baseline).
# Resumable: cells whose done marker is newer than the last
# numerics-affecting commit (e122ac0, 2026-08-17 10:18:11 UTC) are
# already measured with the shipped code and are skipped.
set -x
cd "$(dirname "$0")/.."
RT=results_tpu
STAMP=/tmp/r3_epoch_a
touch -d '2026-08-17 10:18:11 UTC' "$STAMP"
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
for m in bar bifur3 bob plant; do
  for e in arap neohookean_c neohookean_i; do
    RE $m-$e-sanm-gravity $m-$e-sanm_no_pade-gravity -- \
      --meshes $m --energies $e --solvers sanm sanm_no_pade \
      --tasks gravity --cell-timeout 5200
  done
done
for m in armadillo_small human; do
  for e in neohookean_c neohookean_i; do
    RE $m-$e-sanm-gravity $m-$e-sanm_no_pade-gravity -- \
      --meshes $m --energies $e --solvers sanm sanm_no_pade \
      --tasks gravity --cell-timeout 5200
  done
done
# baseline runner is itself done-marker resumable (baseline code unchanged)
SANM_WARM_TIMING= python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies arap --solvers baseline \
  --tasks gravity --cell-timeout 10400 || true
echo "HALF A COMPLETE"
