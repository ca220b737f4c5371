#!/bin/bash
# Round-3 pipeline v2: like round3_pipeline.sh but with a bench/int8/decode
# measurement phase inserted after EVAL A (the chip is otherwise occupied by
# training end-to-end, and VERDICT r2 items 2/3/6 need uncontended chip
# time), plus a wall-clock deadline so the driver's end-of-round bench.py
# run never contends with a still-running training process.
#
#   1. finish mbt2018 lambda=0.01 nf=192 -> 150k steps (VERDICT item 4)
#   2. EVAL PHASE A: rd_curve on both eval sets over the 3 finished lambda
#      points + BD-vs-golden reports (VERDICT item 1)
#   3. MEASURE: bench.py headline preview + --decode + int8 A/B w/ RD delta
#      (VERDICT items 2, 3, 6)
#   4. train mbt2018 lambda=0.08 nf=192 -> 100k (item 7, deadline-capped)
#   5. train mbt2018_bb lambda=0.01 nf=192 -> 100k (item 7, deadline-capped)
#   6. EVAL PHASE B: 4-point curves + bb_sga point + refreshed BD reports
#
# Never runs eval and training concurrently (two JAX clients on the one
# tunnel chip contend/fail). Probes the tunnel before every phase and
# waits out outages (~1h hangs observed where even jax.devices() blocks).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
mkdir -p $L results/synth2 results/synth2_large

# Hard deadline: leave >1h of chip headroom before the driver's bench run.
DEADLINE=${DEADLINE:-$(date -d '2026-08-18 10:45' +%s)}

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
  python scripts/rd_curve.py data_synth2/eval.npy \
    --checkpoint_dir checkpoints_val2 --out results/synth2 \
    --methods amortized,sga --its 2000 --num_filters 192 \
    >> $L/r3-eval-$tag.log 2>&1
  log "EVAL $tag synth2 rc=$?"
  python scripts/rd_curve.py data_synth2/eval_576x768.npy \
    --checkpoint_dir checkpoints_val2 --out results/synth2_large \
    --methods amortized,sga --its 2000 --num_filters 192 \
    >> $L/r3-eval-$tag-large.log 2>&1
  log "EVAL $tag synth2_large rc=$?"
  # Real photographs (bundled JPEGs, scripts/make_photo_eval.py): the only
  # non-synthetic content available offline; compared against the Kodak
  # golden curve in the BD report.
  python scripts/rd_curve.py data_real/eval_photos.npy \
    --checkpoint_dir checkpoints_val2 --out results/photos \
    --methods amortized,sga --its 2000 --num_filters 192 \
    >> $L/r3-eval-$tag-photos.log 2>&1
  log "EVAL $tag photos rc=$?"
  { python scripts/bd_report.py results/synth2
    python scripts/bd_report.py results/synth2_large --dataset tecnick
    python scripts/bd_report.py results/photos
  } > results/synth2/bd_report_$tag.md 2>> $L/r3-eval-$tag.log
  log "EVAL $tag bd_report rc=$?"
  touch $L/EVAL_${tag}_DONE
}

measure_phase() {
  log "MEASURE start"
  timeout 2400 python bench.py > results/bench_preview_r3.json \
    2>> $L/r3-measure.log
  log "MEASURE bench rc=$?"
  timeout 1200 python bench.py --decode > results/decode_bench_r3.json \
    2>> $L/r3-measure.log
  log "MEASURE decode rc=$?"
  # int8 A/B (VERDICT item 3): throughput at bench shapes with the trained
  # nf=192 params, then RD delta on the real eval set.
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
  # Parity artifact: the reference's SGA-landscape figure on the real
  # nf=192 checkpoint (reference ships results/sga_landscape.png).
  timeout 1800 python scripts/sga_landscape.py data_synth2/eval.npy \
    --checkpoint_dir checkpoints_val2 \
    --runname mbt2018-num_filters=192-lmbda=0.01 --num_filters 192 \
    --its 2000 --out results/sga_landscape.png >> $L/r3-measure.log 2>&1
  log "MEASURE landscape rc=$?"
  touch $L/MEASURE_DONE
}

log "=== round3 pipeline v2 start (deadline in $(remaining)s) ==="
wait_tunnel
train mbt2018 0.01 150000
wait_tunnel
eval_phase A
wait_tunnel
measure_phase
wait_tunnel
train mbt2018 0.08 100000
wait_tunnel
train mbt2018_bb 0.01 100000
wait_tunnel
# bb curve: bb_plain (amortized analog) + bb_sga on the bb checkpoint.
if [ "$(remaining)" -gt -3600 ]; then
  python scripts/rd_curve.py data_synth2/eval.npy \
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
