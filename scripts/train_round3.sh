#!/bin/bash
# Round-3 training driver: finish the lambda=0.01 nf=192 redo (131.2k ->
# 150k steps, grad_clip 10 carried over from train_round2b.sh), then extend
# RD coverage (VERDICT r2 item 7): lambda=0.08 mbt2018 and lambda=0.01
# mbt2018_bb, both nf=192. Probes the TPU tunnel first and waits out
# outages (observed ~1h hangs where even jax.devices() blocks).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
mkdir -p $L

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((1024,1024), jnp.bfloat16)
(x@x).block_until_ready()
print('tunnel ok')
" >> $L/round3_probe.log 2>&1
}

echo "=== round3 driver start: $(date) ===" >> $L/round3_driver.log
until probe; do
  echo "tunnel down, waiting 120s: $(date)" >> $L/round3_driver.log
  sleep 120
done
echo "tunnel up: $(date)" >> $L/round3_driver.log

run() {
  model=$1; lmbda=$2; last=$3; shift 3
  echo "=== $model nf=192 lmbda=$lmbda -> $last steps: $(date) ===" >> $L/round3_driver.log
  python -m nic_tpu --num_filters 192 --checkpoint_dir checkpoints_val2 \
    $model train --train_glob 'data_synth2/train/*.png' \
    --lambda $lmbda --batchsize 8 --patchsize 256 --last_step $last \
    --save_checkpoint_secs 600 --steps_per_call 64 --retries 12 \
    --grad_clip 10 --divergence_threshold 500 "$@" \
    >> $L/r3-$model-lmbda=$lmbda.log 2>&1
  echo "=== $model lmbda=$lmbda rc=$?: $(date) ===" >> $L/round3_driver.log
}

# 1. Finish the default-lambda run (VERDICT r2 missing item 4).
run mbt2018 0.01 150000
# 2. New lambda point toward the 7-point curve (item 7). The reference
#    trains 3M steps at 0.08 (README.md:105-106); 100k matches the other
#    synth2 budget points.
run mbt2018 0.08 100000
# 3. bb model at the default lambda so bb_sga gets a BD row (item 7).
run mbt2018_bb 0.01 100000
echo "ALL DONE $(date)" >> $L/round3_driver.log
