#!/bin/bash
# Round-2 RD-parity training: nf=192 on the photographic-statistics corpus
# (data_synth2), lambda sweep 0.01 -> 0.04 -> 0.003. Crash recovery now
# lives in the package (`--retries`, nic_tpu/train/supervisor.py) instead
# of a shell loop. Checkpoints land in checkpoints_val2/ (gitignored).
#
# lambda=0.01 resumes a pre-clip checkpoint so it keeps grad_clip off;
# the fresh runs enable --grad_clip 10 (inert except on blow-up steps —
# one cost ~15k steps of recovery in the first 0.01 session).
#
# Usage: scripts/train_round2.sh [LAST_STEP_001 [LAST_STEP_004 LAST_STEP_0003]]
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
mkdir -p $L
S1=${1:-150000}
S2=${2:-100000}
S3=${3:-100000}

run() {
  lmbda=$1; last=$2; shift 2
  echo "=== mbt2018 nf=192 lmbda=$lmbda -> $last steps: $(date) ===" >> $L/round2_driver.log
  python -m nic_tpu --num_filters 192 --checkpoint_dir checkpoints_val2 \
    mbt2018 train --train_glob 'data_synth2/train/*.png' \
    --lambda $lmbda --batchsize 8 --patchsize 256 --last_step $last \
    --save_checkpoint_secs 600 --steps_per_call 64 --retries 12 "$@" \
    >> $L/r2-mbt2018-lmbda=$lmbda.log 2>&1
  echo "=== lmbda=$lmbda rc=$?: $(date) ===" >> $L/round2_driver.log
}

run 0.01 $S1
run 0.04 $S2 --grad_clip 10
run 0.003 $S3 --grad_clip 10
echo "ALL DONE $(date)" >> $L/round2_driver.log
