#!/bin/bash
# One chip measurement window (run while the training pipeline is paused
# via /tmp/r5_pause). Usage: round5_window.sh N [--with-int8] [--with-profile]
# Produces results/bench_r5_wN.json (+ int8/decode siblings) with the
# bf16 bench and anchor PAIRED in the same session (VERDICT r4 weak #1).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
W=${1:?window number}
shift
L=/root/repo/train_logs
log() { echo "=== window$W $* : $(date) ===" >> $L/round5_driver.log; }

log "bench bf16+anchor"
timeout 2000 python bench.py > results/bench_r5_w$W.json.tmp 2>> $L/r5-window.log \
  && mv results/bench_r5_w$W.json.tmp results/bench_r5_w$W.json
log "bench rc=$?"

log "bench decode"
timeout 900 python bench.py --decode > results/bench_decode_r5_w$W.json.tmp 2>> $L/r5-window.log \
  && mv results/bench_decode_r5_w$W.json.tmp results/bench_decode_r5_w$W.json
log "decode rc=$?"

if [[ " $* " == *" --with-int8 "* ]]; then
  log "bench int8 (paired with the bf16 run above)"
  timeout 1500 python bench.py --quant-int8 --no-anchor \
    > results/bench_int8_r5_w$W.json.tmp 2>> $L/r5-window.log \
    && mv results/bench_int8_r5_w$W.json.tmp results/bench_int8_r5_w$W.json
  log "int8 rc=$?"
fi

if [[ " $* " == *" --with-profile "* ]]; then
  log "phase breakdown profiler"
  timeout 1800 python scripts/profile_breakdown_r5.py >> $L/r5-profile.log 2>&1
  log "profiler rc=$?"
fi
log "window done"
