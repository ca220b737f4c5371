#!/bin/bash
# Decode-only measurement window: pause the training pipeline at the next
# queue-item boundary, run bench --decode (cheap, ~3-4 min), regenerate the
# decode decision rule, unpause. Gives the slim-transfer decode variants the
# additional time-separated windows the cross-window-median rule requires
# before a default can flip (results/decode_rule.md).
# Usage: round5_decode_window.sh N   (window number for the artifact name)
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
W=${1:?window number}
L=/root/repo/train_logs
log() { echo "=== decode-w$W $* : $(date) ===" >> $L/round5_driver.log; }

touch /tmp/r5_pause
log "pause requested; waiting for the current training item to finish"
# The pipeline checks the pause flag before each queue item; wait until no
# trainer owns the chip (poll the trainer's own PID file would be fragile —
# instead wait until no 'python -m nic_tpu' process exists).
for i in $(seq 1 720); do
  pgrep -f "python -m nic_tpu" > /dev/null 2>&1 || break
  sleep 10
done

log "chip free; bench --decode"
timeout 900 python bench.py --decode > results/bench_decode_r5_w$W.json.tmp 2>> $L/r5-window.log \
  && mv results/bench_decode_r5_w$W.json.tmp results/bench_decode_r5_w$W.json
log "decode rc=$?"
python scripts/decode_rule.py > /dev/null 2>> $L/r5-window.log
log "decode_rule regenerated"

rm -f /tmp/r5_pause
log "pause lifted"
