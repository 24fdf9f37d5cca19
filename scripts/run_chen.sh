#!/bin/bash
# Chen et al. 2014 comparison cells (reference render/run_cmp_chen2014.sh):
# forward + inverse NHI solves of bar and plant, warm-timed.  The -mt4
# variants are skipped: thread count is an MKL-host knob with no analog
# on a single TPU chip.  Resumable via done markers.
set -x
cd "$(dirname "$0")/.."
RT=results_tpu
export SANM_WARM_TIMING=1
export PYTHONPATH="$PWD:$PYTHONPATH"
run_cell() {  # run_cell <name> <task.json> [overrides...]
  local name=$1; shift
  [ -f "$RT/$name/done" ] && return
  rm -rf "$RT/$name"; mkdir -p "$RT/$name"
  ( cd "$RT/$name" && timeout 4000 python -m sanm_tpu.fea \
      ../../configs/sys.json "$@" > log.txt 2>&1 && touch done ) || true
}
run_cell chen-fwd-bar   ../../configs/bar.json
run_cell chen-inv-bar   ../../configs/bar.json ../../configs/override_inverse.json
run_cell chen-fwd-plant ../../configs/plant.json
run_cell chen-inv-plant ../../configs/plant.json ../../configs/override_inverse.json
echo "CHEN CELLS COMPLETE"
