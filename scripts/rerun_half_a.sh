#!/bin/bash
# Round-3 matrix half A: gravity sanm cells.
set -x
cd "$(dirname "$0")/.."
RT=results_tpu
RE() {
  local cells=()
  while [ "$1" != "--" ]; do cells+=("$1"); shift; done
  shift
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
SANM_WARM_TIMING= python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small --energies arap --solvers baseline \
  --tasks gravity --cell-timeout 10400 || true
echo "HALF A COMPLETE"
