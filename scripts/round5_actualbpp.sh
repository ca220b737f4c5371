#!/bin/bash
# Coding-grade verification for the round-5 deepened checkpoints (VERDICT
# r4 next #2: "re-run converge_aux + actual-bpp checks"): after the
# pipeline's aux-convergence phase, run one REAL `mbt2018 compress` per
# checkpoint on CPU and log estimated vs actual (rANS bitstream) bpp.
# CPU-only + nice so it can overlap the chip evals without starving the
# eval host thread. bb checkpoints are covered by the bb eval's real
# BB-ANS round trips instead (they have no amortized compress CLI path).
set -u
cd /root/repo
exec 9>/tmp/r5actualbpp.lock
flock -n 9 || exit 0
L=/root/repo/train_logs
OUT=$L/r5-actualbpp.log
log() { echo "=== actualbpp: $* : $(date) ===" >> $L/round5_driver.log; }

DEADLINE=$(date -d '2026-08-20 02:30 UTC' +%s)
until grep -q "aux convergence done" $L/round5_driver.log 2>/dev/null; do
  if [ $(date +%s) -gt $DEADLINE ]; then log "aux conv never finished; abort"; exit 1; fi
  sleep 60
done
log "start"
for d in checkpoints_synth3/mbt2018-num_filters=192-lmbda=*; do
  runname=$(basename "$d")
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nice -n 19 \
    timeout 1800 python -m nic_tpu --num_filters 192 \
    --checkpoint_dir checkpoints_synth3 mbt2018 compress \
    "$runname" /tmp/synth3_eval0.png /tmp/r5_eval0_$runname.tfci \
    >> $OUT 2>&1
  echo "--- $runname rc=$? ---" >> $OUT
done
log "done"
