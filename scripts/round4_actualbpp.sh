#!/bin/bash
# Coding-grade verification for the synth3 checkpoints (VERDICT r3 item
# 5 applied to the round-4 curve): after the pipeline's aux-convergence
# phase, run one REAL `mbt2018 compress` per checkpoint on CPU and log
# estimated vs actual (rANS bitstream) bpp. CPU-only + nice so it can
# overlap the chip evals without starving the trainer host thread.
set -u
cd /root/repo
exec 9>/tmp/r4actualbpp.lock
flock -n 9 || exit 0
L=/root/repo/train_logs
OUT=$L/r4-actualbpp.log
log() { echo "=== actualbpp: $* : $(date) ===" >> $L/round4_driver.log; }

DEADLINE=$(date -d '2026-08-19 15:30 UTC' +%s)
until grep -q "aux convergence done" $L/round4_driver.log 2>/dev/null; do
  if [ $(date +%s) -gt $DEADLINE ]; then log "aux conv never finished; abort"; exit 1; fi
  sleep 60
done
log "start"
for d in checkpoints_synth3/mbt2018-num_filters=192-lmbda=*; do
  runname=$(basename "$d")
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nice -n 19 \
    timeout 1200 python -m nic_tpu --num_filters 192 \
    --checkpoint_dir checkpoints_synth3 mbt2018 compress \
    "$runname" /tmp/synth3_eval0.png /tmp/synth3_eval0_$runname.tfci \
    >> $OUT 2>&1
  echo "--- $runname rc=$? ---" >> $OUT
done
log "done"
