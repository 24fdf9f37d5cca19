#!/bin/bash
# Round-5 bounds chain, part 1 of the matrix completion (VERDICT r4
# item 5): the LevMar column.  Calibration: armadillo_small NHC levmar
# timed out at 3600 s (results_tpu/...-baseline_levmar-gravity), so at
# mesh scale these cells land as recorded ">= budget" lower bounds —
# the datum the reference's own "thousands of times faster" claim is
# (README.md:13-15).  Small meshes (bar/bifur3) get a larger budget so
# they have a chance to complete as measured numbers.
#
# Ordering: possibly-completing small cells FIRST (clean window at
# round start), contention-immune big bound cells after.
# All baseline cells run --platform cpu (never touch the TPU tunnel).
set -u
cd "$(dirname "$0")/.."
OUT=results_tpu

pause_gate() { while [ -f /tmp/r5_pause ]; do sleep 30; done; }
run() { # mesh energy task timeout
  pause_gate
  python scripts/run_experiments.py --out "$OUT" --platform cpu \
    --meshes "$1" --energies "$2" --solvers baseline_levmar \
    --tasks "$3" --cell-timeout "$4"
}

# small meshes: real completion attempts
for e in arap neohookean_c neohookean_i; do
  run bar    "$e" gravity 600
  run bar2   "$e" deform  600
  run bifur3 "$e" gravity 600
  run bifur3 "$e" deform  600
done

# medium/large meshes: recorded >=bound cells
for m in bob armadillo_small human plant; do
  for e in arap neohookean_c neohookean_i; do
    run "$m" "$e" gravity 240
    run "$m" "$e" deform  240
  done
done

echo "r5 bounds chain complete"
