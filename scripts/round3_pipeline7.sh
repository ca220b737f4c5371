#!/bin/bash
# Round-3 pipeline v7: curve extension, queued behind v6. Exploits the
# currently-fast tunnel (~400 img/s training, 50 steps/s at batch 8):
#   1. mbt2018_bb nf=192 via cross-model warm-start from the 160k
#      lambda=0.01 mbt2018 params (--init_from_partial) -> bb BD row.
#   2. lambda=0.001 finetune from 0.003 and lambda=0.02 from 0.01
#      (reference's lowest published rate point + the 0.01-0.04 gap).
#   3. Final evals: synth2 + photos rebuild with 5 lambda points; bb eval
#      on the bb checkpoint; BD report regeneration.
# All phases deadline-capped; commit-greedy ordering (bb row first — it is
# the only missing VERDICT item; extra lambda points second).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
mkdir -p $L

DEADLINE=${DEADLINE:-$(( $(date +%s) + 4500 ))}
log() { echo "[$(date '+%F %T')] $*" >> $L/round3_pipeline.log; }
remaining() { echo $(( DEADLINE - $(date +%s) )); }

train() {
  model=$1; lmbda=$2; last=$3; budget=$4; shift 4
  rem=$(remaining)
  [ "$rem" -lt 300 ] && { log "SKIP TRAIN $model $lmbda (${rem}s)"; return; }
  [ "$budget" -gt "$rem" ] && budget=$rem
  log "TRAIN $model lmbda=$lmbda -> $last (budget ${budget}s)"
  timeout "$budget" python -m nic_tpu --num_filters 192 \
    --checkpoint_dir checkpoints_val2 \
    $model train --train_glob 'data_synth2/train/*.png' \
    --lambda $lmbda --batchsize 8 --patchsize 256 --last_step $last \
    --save_checkpoint_secs 240 --steps_per_call 64 --retries 4 \
    --grad_clip 10 --divergence_threshold 500 "$@" \
    >> $L/r3-$model-lmbda=$lmbda.log 2>&1
  log "TRAIN $model lmbda=$lmbda rc=$?"
}

log "=== round3 pipeline v7 queued (waiting for v6) ==="
until [ -f $L/ROUND3_PIPELINE6_DONE ]; do sleep 30; done
log "=== v7 start (deadline in $(remaining)s) ==="

train mbt2018_bb 0.01 14000 900 \
  --init_from checkpoints_val2/mbt2018-num_filters=192-lmbda=0.01 \
  --init_from_partial
touch $L/TRAINBB_DONE

rem=$(remaining)
if [ "$rem" -gt 600 ]; then
  log "EVAL bb start"
  timeout 900 python scripts/rd_curve.py data_synth2/eval.npy \
    --checkpoint_dir checkpoints_val2 --out results/synth2_bb \
    --model mbt2018_bb --methods bb_plain,bb_sga --its 2000 \
    --num_filters 192 >> $L/r3-eval-bb.log 2>&1
  log "EVAL bb rc=$?"
fi
touch $L/EVALBB_DONE

train mbt2018 0.001 14000 800 \
  --init_from checkpoints_val2/mbt2018-num_filters=192-lmbda=0.003
train mbt2018 0.02 14000 800 \
  --init_from checkpoints_val2/mbt2018-num_filters=192-lmbda=0.01

rem=$(remaining)
if [ "$rem" -gt 300 ]; then
  b=$(( rem - 120 )); [ "$b" -gt 900 ] && b=900
  log "EVAL final synth2 (budget ${b}s)"
  timeout "$b" python scripts/rd_curve.py data_synth2/eval.npy \
    --checkpoint_dir checkpoints_val2 --out results/synth2 \
    --methods amortized,sga --its 2000 --num_filters 192 \
    >> $L/r3-eval-final.log 2>&1
  log "EVAL final synth2 rc=$?"
fi
rem=$(remaining)
if [ "$rem" -gt 300 ]; then
  b=$(( rem - 60 )); [ "$b" -gt 600 ] && b=600
  timeout "$b" python scripts/rd_curve.py data_real/eval_photos.npy \
    --checkpoint_dir checkpoints_val2 --out results/photos \
    --methods amortized,sga --its 2000 --num_filters 192 \
    >> $L/r3-eval-final.log 2>&1
  log "EVAL final photos rc=$?"
fi

{ python scripts/bd_report.py results/synth2
  [ -d results/photos ] && python scripts/bd_report.py results/photos
  [ -d results/synth2_large ] && python scripts/bd_report.py results/synth2_large --dataset tecnick
} > results/synth2/bd_report.md 2>> $L/r3-eval-final.log
log "V7 ALL DONE"
touch $L/ROUND3_PIPELINE7_DONE
