#!/bin/bash
# Round-5 silicon queue: wait for the axon tunnel, then (re-)capture the
# driver-visible perf record that BENCH_r04 lost to the tunnel outage
# (VERDICT r4 "What's missing" #3), ONE jax process at a time (nproc=1,
# CLAUDE.md).  Each probe is skipped once its log has content, so the
# queue is resumable across tunnel drops.
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

for attempt in 1 2 3 4 5 6; do
  wait_tunnel || { echo "tunnel never came up (attempt $attempt)"; continue; }
  # 1. THE deliverable: the driver bench line (carried auto-engages)
  [ -s bench_logs/bench_r5.log ] && grep -q '"metric"' bench_logs/bench_r5.log || \
    run_probe bench_r5 python bench.py
  # 2. 2D headline re-confirm (cheap)
  [ -s bench_logs/bench_r5_2d.log ] && grep -q '"metric"' bench_logs/bench_r5_2d.log || \
    run_probe bench_r5_2d python bench.py --case 2d1024
  # 3. carried-vs-per-step interleaved A/B on the round-5 tree (the r4
  #    win was logged pre-sharded-carried; confirm nothing regressed)
  [ -s bench_logs/probe_carried_r5.log ] && grep -q "ms/step" bench_logs/probe_carried_r5.log || \
    run_probe probe_carried_r5 python scripts/probe_carried.py --steps 10 --reps 2
  # 4. long-line cost curve, resident-ring (new default) vs round-2 ring
  #    (VERDICT #6: the measured curve + the structural fix's A/B)
  [ -s bench_logs/longcurve_r5.log ] && grep -q "ns/cell" bench_logs/longcurve_r5.log || \
    run_probe longcurve_r5 python scripts/probe_longcurve.py --reps 5
  [ -s bench_logs/longcurve_r5_old.log ] && grep -q "ns/cell" bench_logs/longcurve_r5_old.log || \
    run_probe longcurve_r5_old env CMCFS_LONG_RESIDENT=0 python scripts/probe_longcurve.py --reps 5
  # 5. 2D 2048^2 re-measure (the r4 −15%/cell case the ring targets)
  [ -s bench_logs/bench_r5_2d2048.log ] && grep -q '"metric"' bench_logs/bench_r5_2d2048.log || \
    run_probe bench_r5_2d2048 python bench.py --case 2d2048
  if grep -q '"metric"' bench_logs/bench_r5.log 2>/dev/null && \
     grep -q '"metric"' bench_logs/bench_r5_2d.log 2>/dev/null && \
     grep -q "ns/cell" bench_logs/longcurve_r5.log 2>/dev/null; then
    echo "ROUND-5 QUEUE DONE"; exit 0
  fi
done
echo "QUEUE INCOMPLETE"
exit 1
