#!/bin/bash
# Round-3 matrix re-measurement: the island/pruning changes alter both
# numerics (ARAP) and per-order cost (all energies), so every sanm cell
# is re-measured with the shipped code.  Newton-baseline cells are kept
# from round 2 where the baseline code did not change; new baseline
# coverage (stiff armadillo ARAP, human ARAP, bar2) is added.
# Sequential on purpose: one TPU, and concurrent cells add ~30% timing
# noise (round-2 finding).
set -x
cd "$(dirname "$0")/.."

RT=results_tpu
RE() {  # RE <cells...> -- <runner args...>
  local cells=()
  while [ "$1" != "--" ]; do cells+=("$1"); shift; done
  shift
  for c in "${cells[@]}"; do rm -rf "$RT/$c"; done
  python scripts/run_experiments.py --out $RT "$@" || true
}

# gravity sanm re-runs (numerics/perf changed)
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

# deform sanm re-runs (incl. the formerly-skipped bob-arap-no_pade)
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

# new baseline coverage (reference protocol cells we lacked)
SANM_WARM_TIMING= python scripts/run_experiments.py --out $RT \
  --meshes armadillo_small human --energies arap --solvers baseline \
  --tasks gravity --cell-timeout 10400 || true
SANM_WARM_TIMING= python scripts/run_experiments.py --out $RT \
  --meshes bar2 --energies arap --solvers baseline \
  --tasks deform --cell-timeout 10400 || true

# new deform coverage: the reference protocol's plant/human/armadillo
# deform cells (sanm + no_pade + arap baseline)
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

echo "MATRIX RERUN COMPLETE"
