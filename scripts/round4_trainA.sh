#!/bin/bash
# Round-4 phase A: resume the synth2 lambda=0.01 nf=192 depth experiment
# (196.8k -> 320k steps). Controlled "was it steps?" datum for VALIDATION.md
# (VERDICT r3 item 1). Probes the tunnel, waits out outages, retries.
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
" >> $L/round4_probe.log 2>&1
}

echo "=== round4 phase A start: $(date) ===" >> $L/round4_driver.log
until probe; do
  echo "tunnel down, waiting 120s: $(date)" >> $L/round4_driver.log
  sleep 120
done
echo "tunnel up: $(date)" >> $L/round4_driver.log

python -m nic_tpu --num_filters 192 --checkpoint_dir checkpoints_val2 \
  mbt2018 train --train_glob 'data_synth2/train/*.png' \
  --lambda 0.01 --batchsize 8 --patchsize 256 --last_step 320000 \
  --save_checkpoint_secs 600 --steps_per_call 64 --retries 12 \
  --grad_clip 10 --divergence_threshold 500 \
  >> $L/r4-mbt2018-lmbda=0.01-synth2.log 2>&1
echo "=== phase A rc=$?: $(date) ===" >> $L/round4_driver.log
touch $L/ROUND4_PHASEA_DONE
