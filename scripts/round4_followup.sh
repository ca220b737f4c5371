#!/bin/bash
# Round-4 follow-up: full 6-method ordering sweep (paper Table 1 claim)
# at PRODUCTION scale — nf=192, lambda=0.01, 320k-step synth3 anchor, on
# the Kodak-difficulty-matched eval set. Rounds 1-3 only validated the
# method ordering at nf=128 on an uncalibrated corpus.
# Runs after the main round-4 pipeline releases the chip; hard-deadlined
# so the driver's end-of-round bench always finds the chip free.
set -u
cd /root/repo
exec 9>/tmp/r4followup.lock
flock -n 9 || { echo "round4_followup already running; exiting"; exit 0; }
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
DRIVER=$L/round4_driver.log
log() { echo "=== followup: $* : $(date) ===" >> $DRIVER; }

START_DEADLINE=$(date -d '2026-08-19 15:05 UTC' +%s)
i=0
until [ -f $L/ROUND4_PIPELINE_DONE ]; do
  if [ $(date +%s) -gt $START_DEADLINE ]; then
    log "main pipeline never finished by 15:05; skipping method sweep"
    exit 1
  fi
  sleep 60
done

budget=$(( $(date -d '2026-08-19 15:45 UTC' +%s) - $(date +%s) ))
if [ $budget -lt 600 ]; then log "no budget left for method sweep"; exit 1; fi
log "method sweep start (budget ${budget}s)"
timeout $budget python scripts/rd_curve.py data_synth3/eval_512x768.npy \
  --checkpoint_dir checkpoints_synth3 --out results/synth3_methods \
  --methods amortized,sga,map,ste,unoise,danneal \
  --num_filters 192 --lmbda 0.01 >> $L/r4-methods.log 2>&1
log "method sweep rc=$?"
touch $L/ROUND4_FOLLOWUP_DONE
