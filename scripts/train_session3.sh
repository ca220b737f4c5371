#!/bin/bash
# Sequential RD-validation training runs (one v5e chip).
# Checkpoints land in checkpoints_val/ (gitignored); resumable by step, so
# each run retries after a crash/OOM kill and resumes from its latest
# checkpoint (the tunnel plugin leaks host memory per byte transferred;
# uint8 batches cut the rate 4x but long runs may still need a retry).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
run() {
  model=$1; lmbda=$2; last=$3
  for attempt in 1 2 3; do
    echo "=== $model lmbda=$lmbda -> $last steps (attempt $attempt): $(date) ==="
    python -m nic_tpu --num_filters 128 --checkpoint_dir checkpoints_val \
      $model train --train_glob 'data_synth/train/*.png' \
      --lambda $lmbda --batchsize 8 --patchsize 256 --last_step $last \
      --save_checkpoint_secs 600 --steps_per_call 64 \
      >> $L/$model-lmbda=$lmbda.log 2>&1
    rc=$?
    echo "=== $model lmbda=$lmbda rc=$rc: $(date) ==="
    [ $rc -eq 0 ] && break
  done
}
run mbt2018_bb 0.01 15000
run mbt2018 0.003 15000
run mbt2018 0.04 15000
run mbt2018 0.01 30000   # completes the OOM-killed first run (resumes ~20k)
echo "ALL DONE $(date)"
