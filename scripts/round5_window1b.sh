#!/bin/bash
# Window-1b: after window-1's profiler finishes, run the bf16 bench WITHOUT
# the anchor (pairs the w1 int8 number with a same-window bf16 number —
# VERDICT r4 weak #4: the int8 verdict needs a paired bf16 measurement),
# then unpause the training pipeline. The anchor pairing happens in a later
# full window (w3) and in the driver's end-of-round bench.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
log() { echo "=== window1b $* : $(date) ===" >> $L/round5_driver.log; }

# Wait for window-1 (bash PID in /tmp/r5window1.pid) to exit.
if [ -f /tmp/r5window1.pid ]; then
  while kill -0 "$(cat /tmp/r5window1.pid)" 2>/dev/null; do sleep 20; done
fi

log "bf16 bench (no anchor; pairs w1 int8)"
timeout 1800 python bench.py --no-anchor > results/bench_r5_w1.json.tmp 2>> $L/r5-window.log \
  && mv results/bench_r5_w1.json.tmp results/bench_r5_w1.json
log "bf16 rc=$?"

rm -f /tmp/r5_pause
log "pause lifted, training resumes"
