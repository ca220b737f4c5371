#!/bin/bash
# Round-5 main pipeline (single chip, everything deadlined).
#   1. Deepen the synth3 curve ends (VERDICT r4 next #2): lambda=0.08 /
#      0.001 / 0.04 / 0.003 -> 320k steps (reference trains its top rate
#      longest, README.md:105-106).
#   2. Fill the bits-back family to 5 lambdas at >=120k steps.
#   3. Aux convergence (CPU) + evals (synth4 held-out set, synth3
#      re-eval, bb 5-point, tecnick-analog 1200x1200, photos) via
#      scripts/round5_evals.sh (editable while training runs).
# Chip sharing: before each queue item the pipeline waits while
# /tmp/r5_pause exists, so interactive measurement windows (bench
# anchor/int8/decode, profiling) can claim the chip between items.
set -u
cd /root/repo
exec 9>/tmp/r5pipe.lock
flock -n 9 || { echo "round5_pipeline already running; exiting"; exit 0; }
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
mkdir -p $L
DRIVER=$L/round5_driver.log

now() { date +%s; }
# Round started ~15:05 UTC Aug 19, ends ~03:05 UTC Aug 20. Leave >=1h
# for the driver's end-of-round bench + commits.
TRAIN_DEADLINE=$(date -d '2026-08-19 23:45 UTC' +%s)
EVAL_DEADLINE=$(date -d '2026-08-20 02:10 UTC' +%s)

log() { echo "=== $* : $(date) ===" >> $DRIVER; }

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((1024,1024), jnp.bfloat16)
(x@x).block_until_ready()
print('tunnel ok')
" >> $L/round5_probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    log "tunnel down, waiting 120s"
    sleep 120
  done
}

wait_pause() {
  while [ -f /tmp/r5_pause ]; do
    sleep 30
  done
}

trainrun() {
  model=$1; lmbda=$2; last=$3; shift 3
  # Skip if already at/beyond target (idempotent resume).
  d=checkpoints_synth3/$model-num_filters=192-lmbda=$lmbda
  if [ -f "$d/metrics.jsonl" ]; then
    cur=$(tail -1 "$d/metrics.jsonl" | python -c "import sys,json;print(json.load(sys.stdin).get('step',0))" 2>/dev/null || echo 0)
    if [ "${cur:-0}" -ge "$last" ]; then log "skip $model lmbda=$lmbda (already $cur >= $last)"; return 0; fi
  fi
  remaining=$(( TRAIN_DEADLINE - $(now) ))
  if [ $remaining -lt 900 ]; then log "skip $model lmbda=$lmbda (deadline)"; return 1; fi
  wait_pause
  wait_tunnel
  log "train $model lmbda=$lmbda -> $last (budget ${remaining}s)"
  timeout $remaining python -m nic_tpu --num_filters 192 \
    --checkpoint_dir checkpoints_synth3 $model train \
    --train_glob 'data_synth3/train/*.png' \
    --lambda $lmbda --batchsize 8 --patchsize 256 --last_step $last \
    --save_checkpoint_secs 600 --steps_per_call 64 --retries 12 \
    --grad_clip 10 --divergence_threshold 500 "$@" \
    >> $L/r5-$model-lmbda=$lmbda.log 2>&1
  rc=$?
  log "train $model lmbda=$lmbda rc=$rc"
  return $rc
}

log "round5 pipeline start"

# ---- 1. deepen the main curve (ends first: BD interpolation is most
#         sensitive there; both ends are currently the weakest at 80k) ----
trainrun mbt2018 0.08  320000
trainrun mbt2018 0.001 320000
trainrun mbt2018 0.04  320000
trainrun mbt2018 0.003 320000

# ---- 2. fill the bits-back family to 5 lambdas ---------------------------
trainrun mbt2018_bb 0.003 120000
trainrun mbt2018_bb 0.01  120000
trainrun mbt2018_bb 0.04  120000 \
  --init_from checkpoints_synth3/mbt2018_bb-num_filters=192-lmbda=0.01
trainrun mbt2018_bb 0.08  120000 \
  --init_from checkpoints_synth3/mbt2018_bb-num_filters=192-lmbda=0.04
trainrun mbt2018_bb 0.001 120000 \
  --init_from checkpoints_synth3/mbt2018_bb-num_filters=192-lmbda=0.003

# ---- 3. aux convergence (CPU, data-independent quantile repair) -----------
log "aux convergence"
for d in checkpoints_synth3/mbt2018-num_filters=192-lmbda=*; do
  [ -d "$d" ] || continue
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nice -n 19 \
    python scripts/converge_aux.py "$d" --threshold 3 --steps 30000 \
    >> $L/r5-auxconv.log 2>&1
done
log "aux convergence done"

# ---- 4. evals (separate script, refined while training ran) ---------------
export R5_EVAL_DEADLINE=$EVAL_DEADLINE
wait_pause
bash scripts/round5_evals.sh >> $DRIVER 2>&1

log "pipeline complete"
touch $L/ROUND5_PIPELINE_DONE
