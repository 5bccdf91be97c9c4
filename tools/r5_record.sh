#!/bin/bash
# Round-5 final on-chip recording pass: runs the measurement tools
# sequentially over the TPU tunnel (they contend for the one chip, so
# never in parallel), each under its own timeout so one wedged remote
# call cannot sink the rest.  Most-valuable-first ordering.
set -u
cd /root/repo
LOG=/tmp/r5_record
mkdir -p "$LOG"

echo "=== parity exact $(date -u +%T)" | tee -a "$LOG/status"
timeout 3000 python3 tools/parity.py --mode exact --out /tmp/r5_record/PARITY_EXACT.json \
  > "$LOG/parity_exact.log" 2>&1
echo "parity-exact rc=$?" | tee -a "$LOG/status"

echo "=== tx perf $(date -u +%T)" | tee -a "$LOG/status"
timeout 2400 python3 tools/perf.py > "$LOG/perf.log" 2>&1
echo "perf rc=$?" | tee -a "$LOG/status"

echo "=== latency $(date -u +%T)" | tee -a "$LOG/status"
timeout 2400 python3 tools/latency.py --reps 20 --out LATENCY.json \
  > "$LOG/latency.log" 2>&1
echo "latency rc=$?" | tee -a "$LOG/status"

echo "=== bench $(date -u +%T)" | tee -a "$LOG/status"
timeout 2400 python3 bench.py > "$LOG/bench.log" 2>&1
echo "bench rc=$?" | tee -a "$LOG/status"

echo "=== parity production refresh $(date -u +%T)" | tee -a "$LOG/status"
timeout 3000 python3 tools/parity.py --mode production --out /tmp/r5_record/PARITY_PROD.json \
  > "$LOG/parity_prod.log" 2>&1
echo "parity-prod rc=$?" | tee -a "$LOG/status"
echo "=== DONE $(date -u +%T)" | tee -a "$LOG/status"
