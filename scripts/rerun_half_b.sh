#!/bin/bash
# Round-3 matrix half B: deform cells + bar2 + deform baselines.
# Resumable: cells whose done marker is newer than the last
# numerics-affecting commit (e122ac0, 2026-08-17 10:18:11 UTC) are
# already measured with the shipped code and are skipped.
set -x
cd "$(dirname "$0")/.."
RT=results_tpu
STAMP=/tmp/r3_epoch_b
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
for m in bifur3 bob; do
  for e in arap neohookean_c neohookean_i; do
    RE $m-$e-sanm-deform $m-$e-sanm_no_pade-deform -- \
      --meshes $m --energies $e --solvers sanm sanm_no_pade \
      --tasks deform --cell-timeout 5200
  done
done
RE bar2-arap-sanm-deform bar2-arap-sanm_no_pade-deform -- \
  --meshes bar2 --energies arap --solvers sanm sanm_no_pade \
  --tasks deform --cell-timeout 5200
SANM_WARM_TIMING= python scripts/run_experiments.py --out $RT \
  --meshes bar2 --energies arap --solvers baseline \
  --tasks deform --cell-timeout 10400 || true
for m in plant human armadillo_small; do
  for e in arap neohookean_c neohookean_i; do
    RE $m-$e-sanm-deform $m-$e-sanm_no_pade-deform -- \
      --meshes $m --energies $e --solvers sanm sanm_no_pade \
      --tasks deform --cell-timeout 5200
  done
  SANM_WARM_TIMING= python scripts/run_experiments.py --out $RT \
    --meshes $m --energies arap --solvers baseline \
    --tasks deform --cell-timeout 10400 || true
done
echo "HALF B COMPLETE"
