#!/bin/bash
# Wait for the axon tunnel, then run the pending round-3 probes in
# sequence (ONE jax process at a time — see CLAUDE.md).  Each probe gets
# its own log under bench_logs/ and a bounded timeout so a tunnel drop
# mid-probe cannot wedge the queue.
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

for attempt in 1 2 3 4 5 6 7 8 9 10 11 12; do
  wait_tunnel || { echo "tunnel never came up (attempt $attempt)"; continue; }
  [ -s bench_logs/probe_glue_r3.log ] && grep -q "kernels-only\|ms/step" bench_logs/probe_glue_r3.log || \
    run_probe probe_glue_r3 python scripts/probe_glue.py --steps 10 --reps 2
  [ -s bench_logs/probe_stacked_r3.log ] && grep -q "ms/step" bench_logs/probe_stacked_r3.log || \
    run_probe probe_stacked_r3 python scripts/probe_nl_stacked.py --steps 10 --reps 2
  [ -s bench_logs/probe_pcr_r3.log ] && grep -q "pcr" bench_logs/probe_pcr_r3.log || \
    run_probe probe_pcr_r3 env PROBE_MODES=dma,comps,pcr,full python scripts/kernel_probe.py --reps 10
  [ -s bench_logs/ab_pcr_r3.log ] && grep -q "ms/step" bench_logs/ab_pcr_r3.log || \
    run_probe ab_pcr_r3 python scripts/ab_step.py --backends fused_nl,fused_pcr --steps 10 --reps 2
  [ -s bench_logs/ab_targeted_r3.log ] && grep -q "ms/step" bench_logs/ab_targeted_r3.log || \
    run_probe ab_targeted_r3 python scripts/probe_nl_targeted.py --steps 10 --reps 2
  [ -s bench_logs/bench_r3.log ] && grep -q "metric" bench_logs/bench_r3.log || \
    run_probe bench_r3 python bench.py
  # done when all three have content
  if grep -q "ms" bench_logs/probe_glue_r3.log 2>/dev/null && \
     grep -q "ms" bench_logs/probe_stacked_r3.log 2>/dev/null && \
     grep -q "pcr" bench_logs/probe_pcr_r3.log 2>/dev/null; then
    echo "ALL PROBES DONE"; exit 0
  fi
done
echo "QUEUE INCOMPLETE"
exit 1
