#!/bin/bash
# Round-5 matrix-completion chain (VERDICT r4 item 5): one sequential
# CPU chain, ordered by datum value — measured baseline deform/jet
# cells first (small meshes before big so more cells COMPLETE), then
# the noproj column, then the levmar column.  Cells that exceed their
# budget are recorded as ">= budget" lower bounds by
# run_experiments.py (baseline family only); that is the honest datum
# at meshes where Newton/LevMar costs hours on this 1-core host — the
# reference's own headline is "thousands of times faster"
# (README.md:13-15), so a bound cell still carries the comparison.
#
# All cells run --platform cpu (never touch the TPU tunnel).  The
# chain pauses while /tmp/r5_pause exists (solo TPU timing windows)
# and is resumable via the harness done markers.
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

# ---- stage A: baseline (projected Newton) measured-number attempts ----
run bar2            neohookean_c baseline deform  1800
run bar2            neohookean_i baseline deform  1800
run armadillo_small neohookean_c baseline deform  1800
run armadillo_small neohookean_i baseline deform  1800
run plant           neohookean_c baseline deform  1800
run plant           neohookean_i baseline deform  1800
run human           neohookean_c baseline deform  1800
run human           neohookean_i baseline deform  1800
run jet             neohookean_c baseline gravity 1800
run jet             neohookean_i baseline gravity 1800
run jet             arap         baseline gravity 1800

# ---- stage B: noproj column, small-to-large -------------------------
run bar    neohookean_i baseline_noproj gravity 900
for e in arap neohookean_c neohookean_i; do
  run bifur3 "$e" baseline_noproj gravity 900
  run bifur3 "$e" baseline_noproj deform  900
  run bar2   "$e" baseline_noproj deform  900
done
run armadillo_small neohookean_i baseline_noproj gravity 900
for e in arap neohookean_c neohookean_i; do
  run armadillo_small "$e" baseline_noproj deform 900
done
for e in arap neohookean_c neohookean_i; do
  run bob "$e" baseline_noproj gravity 900
  run bob "$e" baseline_noproj deform  900
done
for m in human plant; do
  for e in arap neohookean_c neohookean_i; do
    run "$m" "$e" baseline_noproj gravity 300
    run "$m" "$e" baseline_noproj deform  300
  done
done
for e in arap neohookean_c neohookean_i; do
  run jet "$e" baseline_noproj gravity 300
done

# ---- stage C: levmar column (mostly bound cells) --------------------
run bar neohookean_c baseline_levmar gravity 600
run bar neohookean_i baseline_levmar gravity 600
for e in arap neohookean_c neohookean_i; do
  run bifur3 "$e" baseline_levmar gravity 600
  run bifur3 "$e" baseline_levmar deform  600
  run bar2   "$e" baseline_levmar deform  600
done
for m in armadillo_small bob human plant; do
  for e in arap neohookean_c neohookean_i; do
    run "$m" "$e" baseline_levmar gravity 180
    run "$m" "$e" baseline_levmar deform  180
  done
done
for e in arap neohookean_c neohookean_i; do
  run jet "$e" baseline_levmar gravity 180
done

echo "r5 completion chain finished"
