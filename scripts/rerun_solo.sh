#!/bin/bash
# Solo re-measurement of every sanm/sanm_no_pade matrix cell whose done
# marker predates 15:45:00 UTC 2026-08-17 — the moment the TPU became
# exclusively owned by one sequential runner.  Earlier round-3 cells
# were measured with 2-3 concurrent TPU processes (two leftover
# background halves from the previous session plus the sequential
# runner) and carry contention-inflated warm times.
# Resumable via done markers, cheapest meshes first.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu
STAMP=/tmp/r3_solo_epoch
touch -d '2026-08-17 15:45:00 UTC' "$STAMP"
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
for m in bar bifur3 bob plant armadillo_small human; do
  for e in arap neohookean_c neohookean_i; do
    RE $m-$e-sanm-gravity $m-$e-sanm_no_pade-gravity -- \
      --meshes $m --energies $e --solvers sanm sanm_no_pade \
      --tasks gravity --cell-timeout 5200
  done
done
for m in bifur3 bob bar2 plant armadillo_small human; do
  for e in arap neohookean_c neohookean_i; do
    RE $m-$e-sanm-deform $m-$e-sanm_no_pade-deform -- \
      --meshes $m --energies $e --solvers sanm sanm_no_pade \
      --tasks deform --cell-timeout 5200
  done
done
echo "SOLO RE-MEASURE COMPLETE"
