#!/bin/bash
# Round-3 matrix re-measurement, sequential edition: half A (gravity),
# then half B (deform), then the Chen-2014 cells and post-matrix jobs.
# Sequential so no two timed cells contend for the single TPU chip
# (PROGRESS.md: 3-way contention produced device errors and inflated
# warm times).  Every stage is resumable via done markers.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
bash scripts/rerun_half_a.sh
bash scripts/rerun_half_b.sh
bash scripts/post_matrix_jobs.sh
echo "R3 SEQUENTIAL MATRIX COMPLETE"
