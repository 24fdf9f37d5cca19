#!/bin/bash
# Round-3 continuation, wave 4 (run AFTER r3b_wave3.sh): the cells that
# complete the reference protocol matrix
# (render/Makefile.cmp_with_baseline + cmp_with_baseline.sh:40-57):
#  1. the remaining sanm deform cells (armadillo_small arap+/-, nhc
#     no-Pade, nhi+/-; human nhi+/-; bar2 nhc+/- nhi+/- — the reference
#     runs all three energies on the bar2 twist cell);
#  2. human baseline_noproj singles (gravity x3 + arap deform) — the
#     most expensive family, single-run (no warm rerun);
#  3. the two Newton ARAP-deform baselines (armadillo_small, human),
#     single-run.
# Cheapest-first so an interrupt loses the least.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
RT=results_tpu

# -- 1: remaining sanm deform cells (warm-timed pairs) ------------------
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

# -- 2: human noproj singles (reference runs them; no warm rerun) -------
for e in neohookean_c neohookean_i arap; do
  SANM_WARM_TIMING= timeout 14400 python scripts/run_experiments.py \
    --out $RT --meshes human --energies $e \
    --solvers baseline_noproj --tasks gravity --cell-timeout 7000 || true
done
SANM_WARM_TIMING= timeout 14400 python scripts/run_experiments.py \
  --out $RT --meshes human --energies arap \
  --solvers baseline_noproj --tasks deform --cell-timeout 7000 || true

# -- 3: Newton ARAP-deform baselines (single-run) -----------------------
SANM_WARM_TIMING= timeout 14400 python scripts/run_experiments.py \
  --out $RT --meshes armadillo_small --energies arap \
  --solvers baseline --tasks deform --cell-timeout 7000 || true
SANM_WARM_TIMING= timeout 14400 python scripts/run_experiments.py \
  --out $RT --meshes human --energies arap \
  --solvers baseline --tasks deform --cell-timeout 7000 || true

echo "WAVE4 COMPLETE"
