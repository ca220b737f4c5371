#!/bin/bash
# Follow-on for round-2 training: wait for the running sweep (PID $1) to
# finish lambda=0.04 and lambda=0.003, then redo lambda=0.01 from the last
# pre-blow-up checkpoint (ckpt-32000; later diverged checkpoints pruned)
# WITH --grad_clip 10 (the run blew up at steps ~11k/~42k/~93k unclipped;
# restore_or_init migrates the pre-clip optimizer state).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
WAIT_PID=$1
LAST=${2:-150000}

while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done

echo "=== REDO mbt2018 nf=192 lmbda=0.01 (grad_clip 10) -> $LAST steps: $(date) ===" >> $L/round2_driver.log
python -m nic_tpu --num_filters 192 --checkpoint_dir checkpoints_val2 \
  mbt2018 train --train_glob 'data_synth2/train/*.png' \
  --lambda 0.01 --batchsize 8 --patchsize 256 --last_step $LAST \
  --save_checkpoint_secs 600 --steps_per_call 64 --retries 12 --grad_clip 10 --divergence_threshold 500 \
  >> $L/r2-mbt2018-lmbda=0.01.log 2>&1
echo "=== lmbda=0.01 redo rc=$?: $(date) ===" >> $L/round2_driver.log
