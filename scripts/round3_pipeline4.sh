#!/bin/bash
# Round-3 pipeline v4: resume after the session restart that killed v3.
# State at handoff: lambda=0.01 nf=192 trained from scratch to 100k steps
# (params-100000.npz archived); everything after it never ran. v4:
#
#   0. Extend lambda=0.01 to 160k steps (warm resume; ~20 min at the
#      measured 54 steps/s with the HBM-resident dataset).
#   1. Finetune lambda=0.003 and 0.04 from it (--init_from, 50k each).
#   2. EVAL A: rd_curve (amortized+sga) on all three eval sets + BD reports.
#   3. MEASURE: decode bench + int8 A/B + headline preview + SGA landscape.
#   4. Finetune lambda=0.08 from 0.04; partial-warm-start mbt2018_bb from
#      lambda=0.01; bb eval + 4-point EVAL B.
#
# Single JAX client against the tunnel chip at a time; tunnel probe before
# each phase; every chip phase is timeout- and deadline-capped so the
# driver's end-of-round bench gets an uncontended chip.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
mkdir -p $L results/synth2 results/synth2_large results/photos

DEADLINE=${DEADLINE:-$(date -d '2026-08-18 15:45' +%s)}

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

eval_phase() {
  tag=$1
  log "EVAL $tag start"
  timeout 5400 python scripts/rd_curve.py data_synth2/eval.npy \
    --checkpoint_dir checkpoints_val2 --out results/synth2 \
    --methods amortized,sga --its 2000 --num_filters 192 \
    >> $L/r3-eval-$tag.log 2>&1
  log "EVAL $tag synth2 rc=$?"
  timeout 3600 python scripts/rd_curve.py data_real/eval_photos.npy \
    --checkpoint_dir checkpoints_val2 --out results/photos \
    --methods amortized,sga --its 2000 --num_filters 192 \
    >> $L/r3-eval-$tag-photos.log 2>&1
  log "EVAL $tag photos rc=$?"
  timeout 5400 python scripts/rd_curve.py data_synth2/eval_576x768.npy \
    --checkpoint_dir checkpoints_val2 --out results/synth2_large \
    --methods amortized,sga --its 2000 --num_filters 192 \
    >> $L/r3-eval-$tag-large.log 2>&1
  log "EVAL $tag synth2_large rc=$?"
  { python scripts/bd_report.py results/synth2
    python scripts/bd_report.py results/synth2_large --dataset tecnick
    python scripts/bd_report.py results/photos
  } > results/synth2/bd_report_$tag.md 2>> $L/r3-eval-$tag.log
  log "EVAL $tag bd_report rc=$?"
  touch $L/EVAL_${tag}_DONE
}

measure_phase() {
  log "MEASURE start"
  timeout 1800 python bench.py --decode > results/decode_bench_r3.json \
    2>> $L/r3-measure.log
  log "MEASURE decode rc=$?"
  timeout 3600 python scripts/exp_int8.py --reps 2 \
    --checkpoint_dir checkpoints_val2 \
    --runname mbt2018-num_filters=192-lmbda=0.01 \
    > results/int8_ab_throughput_r3.json 2>> $L/r3-measure.log
  log "MEASURE int8-throughput rc=$?"
  timeout 1800 python scripts/exp_int8.py --reps 1 --batch 8 --its 2000 \
    --checkpoint_dir checkpoints_val2 \
    --runname mbt2018-num_filters=192-lmbda=0.01 \
    --eval_npy data_synth2/eval.npy \
    > results/int8_ab_rd_r3.json 2>> $L/r3-measure.log
  log "MEASURE int8-rd rc=$?"
  timeout 3000 python bench.py > results/bench_preview_r3.json \
    2>> $L/r3-measure.log
  log "MEASURE bench rc=$?"
  timeout 1800 python scripts/sga_landscape.py data_synth2/eval.npy \
    --checkpoint_dir checkpoints_val2 \
    --runname mbt2018-num_filters=192-lmbda=0.01 --num_filters 192 \
    --its 2000 --out results/sga_landscape.png >> $L/r3-measure.log 2>&1
  log "MEASURE landscape rc=$?"
  touch $L/MEASURE_DONE
}

log "=== round3 pipeline v4 start (deadline in $(remaining)s) ==="

wait_tunnel
train mbt2018 0.01 160000
touch $L/TRAIN01_EXT_DONE
wait_tunnel
train mbt2018 0.003 50000 \
  --init_from checkpoints_val2/mbt2018-num_filters=192-lmbda=0.01
touch $L/TRAIN003_DONE
wait_tunnel
train mbt2018 0.04 50000 \
  --init_from checkpoints_val2/mbt2018-num_filters=192-lmbda=0.01
touch $L/TRAIN04_DONE
wait_tunnel
eval_phase A
wait_tunnel
measure_phase
wait_tunnel
train mbt2018 0.08 30000 \
  --init_from checkpoints_val2/mbt2018-num_filters=192-lmbda=0.04
touch $L/TRAIN08_DONE
wait_tunnel
train mbt2018_bb 0.01 40000 --init_from_partial \
  --init_from checkpoints_val2/mbt2018-num_filters=192-lmbda=0.01
touch $L/TRAINBB_DONE
wait_tunnel
if [ "$(remaining)" -gt -3600 ]; then
  timeout 3600 python scripts/rd_curve.py data_synth2/eval.npy \
    --checkpoint_dir checkpoints_val2 --out results/synth2_bb \
    --model mbt2018_bb --methods bb_plain,bb_sga --its 2000 --num_filters 192 \
    >> $L/r3-eval-bb.log 2>&1
  log "EVAL bb rc=$?"
  eval_phase B
  python scripts/bd_report.py results/synth2_bb --methods bb_sga:bb_sga \
    >> results/synth2/bd_report_B.md 2>> $L/r3-eval-bb.log
fi
log "ALL DONE"
touch $L/ROUND3_PIPELINE_DONE
