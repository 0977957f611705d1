#!/bin/bash
# Run all pending TPU measurements in one go (for when the tunnel returns
# after an outage). Logs to /tmp/tpu_queue.log; each step has its own
# timeout so one hang doesn't starve the rest.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_queue.log}
: > "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ===" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | grep -v axon | tail -12 | tee -a "$LOG"
  echo | tee -a "$LOG"
}

run "bench full" 900 python bench.py
run "joint-fit A/B (compaction)" 1800 python scripts/ab_jointfit_compact.py --iters 250
run "pose-opt app (pallas+bins+auto act)" 600 python apps/camera_pose_optimizer.py \
    --iters 500 --bin-size 16 --silhouette-impl pallas
run "720p batch depth (auto compaction)" 600 python apps/batch_render_bench.py --reps 6
run "720p batch depth (compaction off)" 600 python apps/batch_render_bench.py --reps 6 --active-tiles -1
echo "ALL DONE" | tee -a "$LOG"
