#!/bin/bash
# Sequential RD-validation training runs (one v5e chip).
# Checkpoints land in checkpoints_val/ (gitignored); resumable by step.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
run() {
  model=$1; lmbda=$2; last=$3
  echo "=== $model lmbda=$lmbda -> $last steps: $(date) ==="
  python -m nic_tpu --num_filters 128 --checkpoint_dir checkpoints_val \
    $model train --train_glob 'data_synth/train/*.png' \
    --lambda $lmbda --batchsize 8 --patchsize 256 --last_step $last \
    --save_checkpoint_secs 600 \
    >> $L/$model-lmbda=$lmbda.log 2>&1
  echo "=== done $model lmbda=$lmbda rc=$?: $(date) ==="
}
run mbt2018 0.01 30000
run mbt2018_bb 0.01 15000
run mbt2018 0.003 15000
run mbt2018 0.04 15000
echo "ALL DONE $(date)"
