#!/bin/bash
# Round-5 follow-up silicon queue (run AFTER probe_queue_r5.sh): the
# seed-elision A/B (VERDICT r4 #7 / roadmap 3b) — ONE jax process at a
# time (nproc=1, CLAUDE.md).  Resumable: each probe is skipped once its
# log has content.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs

wait_tunnel() {
  timeout 14400 python scripts/tpu_wait.py --interval 120 --max-hours 3.8
}

run_probe() {
  local name="$1"; shift
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout 2400 "$@" > "bench_logs/${name}.log" 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ==="
}

for attempt in 1 2 3; do
  wait_tunnel || { echo "tunnel never came up (attempt $attempt)"; continue; }
  [ -s bench_logs/probe_reseed_r5.log ] && grep -q "ms/step" bench_logs/probe_reseed_r5.log || \
    run_probe probe_reseed_r5 python scripts/probe_reseed.py --steps 10 --reps 3
  # chunk-size scan at the exact 2D shapes (C=128): the longcurve probe's
  # C=256 arms don't transfer to the real 2D path (VERDICT weak #4)
  [ -s bench_logs/chunkscan_r5.log ] && grep -q "BEST" bench_logs/chunkscan_r5.log || \
    run_probe chunkscan_r5 python scripts/probe_chunkscan.py --reps 10
  if grep -q "summary" bench_logs/probe_reseed_r5.log 2>/dev/null && \
     grep -q "BEST" bench_logs/chunkscan_r5.log 2>/dev/null; then
    echo "R5B QUEUE DONE"; exit 0
  fi
done
echo "R5B QUEUE INCOMPLETE"
exit 1
