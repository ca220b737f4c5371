#!/bin/bash
# Round-3 pipeline v5: curve-extension pass that waits for v4 to finish.
#
# v4 delivers 4 lambda points (0.003/0.01/0.04/0.08) + the bb run and the
# eval/measure artifacts. v5 widens the RD curve toward the reference's
# 7-point published curves (results/kodak/sga-psnr.csv has 7 rows):
#
#   1. Finetune lambda=0.001 from 0.003 (the reference's lowest-rate point,
#      README.md:105) and lambda=0.02 from 0.01 (fills the 0.01-0.04 gap).
#   2. EVAL C: rerun rd_curve on all three eval sets — rd_curve scans the
#      checkpoint dir, so the curves/BD reports rebuild with 6 lambda
#      points — and regenerate the BD-vs-golden report.
#
# Same discipline as v4: single JAX client at a time (waits for v4's DONE
# flag), tunnel probe before each phase, deadline-capped chip phases.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
mkdir -p $L

DEADLINE=${DEADLINE:-$(date -d '2026-08-18 15:30' +%s)}

log() { echo "[$(date '+%F %T')] $*" >> $L/round3_pipeline.log; }
remaining() { echo $(( DEADLINE - $(date +%s) )); }

probe() {
  timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((1024,1024), jnp.bfloat16)
(x@x).block_until_ready()
print('tunnel ok')
" >> $L/round3_probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    log "tunnel down, waiting 120s"
    sleep 120
  done
  log "tunnel up"
}

train() {
  model=$1; lmbda=$2; last=$3; shift 3
  rem=$(remaining)
  if [ "$rem" -lt 1200 ]; then
    log "SKIP TRAIN $model lmbda=$lmbda (deadline: ${rem}s left)"
    return
  fi
  log "TRAIN $model lmbda=$lmbda -> $last steps (budget ${rem}s)"
  timeout "$rem" python -m nic_tpu --num_filters 192 \
    --checkpoint_dir checkpoints_val2 \
    $model train --train_glob 'data_synth2/train/*.png' \
    --lambda $lmbda --batchsize 8 --patchsize 256 --last_step $last \
    --save_checkpoint_secs 600 --steps_per_call 64 --retries 12 \
    --grad_clip 10 --divergence_threshold 500 "$@" \
    >> $L/r3-$model-lmbda=$lmbda.log 2>&1
  log "TRAIN $model lmbda=$lmbda rc=$?"
}

log "=== round3 pipeline v5 queued (waiting for v4) ==="
until [ -f $L/ROUND3_PIPELINE_DONE ]; do sleep 60; done
log "=== round3 pipeline v5 start (deadline in $(remaining)s) ==="

wait_tunnel
train mbt2018 0.001 40000 \
  --init_from checkpoints_val2/mbt2018-num_filters=192-lmbda=0.003
touch $L/TRAIN001_DONE
wait_tunnel
train mbt2018 0.02 40000 \
  --init_from checkpoints_val2/mbt2018-num_filters=192-lmbda=0.01
touch $L/TRAIN02_DONE

wait_tunnel
log "EVAL C start"
timeout 5400 python scripts/rd_curve.py data_synth2/eval.npy \
  --checkpoint_dir checkpoints_val2 --out results/synth2 \
  --methods amortized,sga --its 2000 --num_filters 192 \
  >> $L/r3-eval-C.log 2>&1
log "EVAL C synth2 rc=$?"
timeout 3600 python scripts/rd_curve.py data_real/eval_photos.npy \
  --checkpoint_dir checkpoints_val2 --out results/photos \
  --methods amortized,sga --its 2000 --num_filters 192 \
  >> $L/r3-eval-C-photos.log 2>&1
log "EVAL C photos rc=$?"
timeout 5400 python scripts/rd_curve.py data_synth2/eval_576x768.npy \
  --checkpoint_dir checkpoints_val2 --out results/synth2_large \
  --methods amortized,sga --its 2000 --num_filters 192 \
  >> $L/r3-eval-C-large.log 2>&1
log "EVAL C synth2_large rc=$?"
{ python scripts/bd_report.py results/synth2
  python scripts/bd_report.py results/synth2_large --dataset tecnick
  python scripts/bd_report.py results/photos
} > results/synth2/bd_report_C.md 2>> $L/r3-eval-C.log
log "EVAL C bd_report rc=$?"
log "V5 ALL DONE"
touch $L/ROUND3_PIPELINE5_DONE
