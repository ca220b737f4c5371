#!/bin/bash
# Round-3 pipeline v6: post-reboot recovery. The VM reset wiped train_logs/
# and the orbax checkpoints; what survived is what was committed —
# params npz archives for nf=192 lambda=0.003 (50k finetune) and
# lambda=0.01 (160k). lambda=0.04's params were lost before archival.
#
# Ordering is commit-greedy (most valuable artifact first, in case the
# round ends early):
#   1. EVAL A: rd_curve on data_synth2/eval.npy with the 2 surviving
#      checkpoints -> results/synth2 (the round-2 verdict's #1 item).
#   2. EVAL B: real photos (data_real/eval_photos.npy) -> results/photos.
#   3. TRAIN: re-finetune lambda=0.04 from the 160k lambda=0.01 params
#      (deadline-capped; periodic npz refresh archives progress).
#   4. EVAL C: rerun both evals (checkpoint scan picks up 0.04; compile
#      cache makes the second pass cheap) + large eval set if time.
#   5. BD report regeneration.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
mkdir -p $L

DEADLINE=${DEADLINE:-$(( $(date +%s) + 2700 ))}
log() { echo "[$(date '+%F %T')] $*" >> $L/round3_pipeline.log; }
remaining() { echo $(( DEADLINE - $(date +%s) )); }

run_eval() {
  name=$1; npy=$2; out=$3; budget=$4
  rem=$(remaining)
  [ "$rem" -lt 120 ] && { log "SKIP EVAL $name (${rem}s left)"; return; }
  [ "$budget" -gt "$rem" ] && budget=$rem
  log "EVAL $name start (budget ${budget}s)"
  timeout "$budget" python scripts/rd_curve.py "$npy" \
    --checkpoint_dir checkpoints_val2 --out "$out" \
    --methods amortized,sga --its 2000 --num_filters 192 \
    >> $L/r3-eval-$name.log 2>&1
  log "EVAL $name rc=$?"
}

log "=== round3 pipeline v6 start (deadline in $(remaining)s) ==="

run_eval synth2 data_synth2/eval.npy results/synth2 1500
touch $L/EVAL_A_DONE
run_eval photos data_real/eval_photos.npy results/photos 900
touch $L/EVAL_B_DONE

rem=$(remaining)
if [ "$rem" -gt 900 ]; then
  budget=$(( rem - 600 ))   # leave room for the re-eval
  [ "$budget" -gt 1100 ] && budget=1100
  log "TRAIN lambda=0.04 finetune (budget ${budget}s)"
  timeout "$budget" python -m nic_tpu --num_filters 192 \
    --checkpoint_dir checkpoints_val2 \
    mbt2018 train --train_glob 'data_synth2/train/*.png' \
    --lambda 0.04 --batchsize 8 --patchsize 256 --last_step 14000 \
    --save_checkpoint_secs 240 --steps_per_call 64 --retries 4 \
    --grad_clip 10 --divergence_threshold 500 \
    --init_from checkpoints_val2/mbt2018-num_filters=192-lmbda=0.01 \
    >> $L/r3-train-0.04.log 2>&1
  log "TRAIN lambda=0.04 rc=$?"
  touch $L/TRAIN004_DONE
  run_eval synth2b data_synth2/eval.npy results/synth2 600
  run_eval photosb data_real/eval_photos.npy results/photos 420
else
  log "SKIP TRAIN lambda=0.04 (${rem}s left)"
fi

run_eval large data_synth2/eval_576x768.npy results/synth2_large 1200

{ python scripts/bd_report.py results/synth2
  [ -d results/photos ] && python scripts/bd_report.py results/photos
  [ -d results/synth2_large ] && python scripts/bd_report.py results/synth2_large --dataset tecnick
} > results/synth2/bd_report.md 2>> $L/r3-eval-synth2.log
log "bd_report rc=$?"
log "V6 ALL DONE"
touch $L/ROUND3_PIPELINE6_DONE
