#!/bin/bash
# Round-5 matrix-completion chain, re-targeted after the protocol
# audit: the reference's own 5-variant matrix (cmp_with_baseline.sh
# :40-57) runs Newton-family deform baselines ONLY for ARAP and LevMar
# ONLY on gravity — the NHC/NHI deform cells this repo (and VERDICT r4
# item 5) previously counted as "missing baselines" are N/A in the
# reference protocol too (its baseline throws on the inverted deform
# init, neohookean_material.cpp:15-31).  run_experiments.py now writes
# structured protocol_na/infeasible markers for those; stage 0 sweeps
# them so gen_tables renders explicit n/a cells.
#
# The genuinely missing in-protocol cells are the noproj gravity
# column, the noproj ARAP-deform row, and the levmar gravity column
# (mostly ">= budget" bound cells on this 1-core host).  Ordered
# cheapest/highest-value first so more cells COMPLETE under a bounded
# wall clock.  All cells run --platform cpu (never touch the TPU
# tunnel); the chain pauses while /tmp/r5_pause exists and is
# resumable via the done markers.
set -u
cd "$(dirname "$0")/.."
OUT=results_tpu

pause_gate() { while [ -f /tmp/r5_pause ]; do sleep 30; done; }
run() { # mesh energy solver task timeout
  pause_gate
  python scripts/run_experiments.py --out "$OUT" --platform cpu \
    --meshes "$1" --energies "$2" --solvers "$3" \
    --tasks "$4" --cell-timeout "$5"
}

# ---- stage 0: protocol-N/A marker sweep (instant, no solves) --------
for m in armadillo_small bar2 bifur3 bob human plant; do
  for e in neohookean_c neohookean_i; do
    run "$m" "$e" baseline        deform 60
    run "$m" "$e" baseline_noproj deform 60
  done
  for e in arap neohookean_c neohookean_i; do
    run "$m" "$e" baseline_levmar deform 60
  done
done

# ---- stage 1: noproj gravity, measured cells, small-to-large --------
run bar             neohookean_i baseline_noproj gravity 1200
for e in arap neohookean_c neohookean_i; do
  run bifur3 "$e" baseline_noproj gravity 1200
done
run armadillo_small neohookean_i baseline_noproj gravity 1800
for e in arap neohookean_c neohookean_i; do
  run bob "$e" baseline_noproj gravity 1800
done

# ---- stage 2: noproj ARAP deform (the in-protocol deform column) ----
run bifur3          arap baseline_noproj deform 1200
run bar2            arap baseline_noproj deform 1200
run armadillo_small arap baseline_noproj deform 1200
run bob             arap baseline_noproj deform 1200

# ---- stage 3: levmar gravity, small meshes (may converge) -----------
run bar neohookean_c baseline_levmar gravity 600
run bar neohookean_i baseline_levmar gravity 600
for e in arap neohookean_c neohookean_i; do
  run bifur3 "$e" baseline_levmar gravity 600
done
run armadillo_small arap         baseline_levmar gravity 600
run armadillo_small neohookean_i baseline_levmar gravity 600
for e in arap neohookean_c neohookean_i; do
  run bob "$e" baseline_levmar gravity 600
done

# ---- stage 4: human/plant noproj + levmar (bound cells @300s) -------
for m in human plant; do
  for e in arap neohookean_c neohookean_i; do
    run "$m" "$e" baseline_noproj gravity 300
  done
  run "$m" arap baseline_noproj deform 900
  for e in arap neohookean_c neohookean_i; do
    run "$m" "$e" baseline_levmar gravity 300
  done
done

# ---- stage 5: extra-mesh (jet) baselines, beyond-reference scale ----
run jet neohookean_c baseline gravity 1800
run jet neohookean_i baseline gravity 1800
run jet arap         baseline gravity 1800
