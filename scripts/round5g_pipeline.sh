#!/bin/bash
# Round-5 session-3 tail. Inherits round5f's unfinished work (the VM/session
# ended mid lambda=0.04 tecnick eval) plus the r5e stretch items:
#   1. tecnick-analog eval lambda=0.04,0.08 -> results/synth4_tecnick
#      (completes the 5-point curve; VERDICT r4 missing #2)
#   2. bd_report vs golden tecnick
#   3. bb eval refresh at the current 120k checkpoints for lambda=0.003,0.01
#      (rows were evaluated at 60k/100k)
#   4. photos re-eval at 320k -> results/photos_synth3
# Tunnel was down at 08:15 UTC; every chip step waits for it to return.
set -u
cd /root/repo
exec 9>/tmp/r5pipe_g.lock
flock -n 9 || { echo "round5g already running; exiting"; exit 0; }
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
mkdir -p $L
DRIVER=$L/round5g_driver.log

now() { date +%s; }
CHIP_DEADLINE=$(date -d '2026-08-20 10:30 UTC' +%s)

log() { echo "=== $* : $(date -u) ===" >> $DRIVER; }

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((1024,1024), jnp.bfloat16)
(x@x).block_until_ready()
print('tunnel ok')
" >> $L/round5g_probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    remaining=$(( CHIP_DEADLINE - $(now) ))
    [ $remaining -lt 300 ] && { log "tunnel still down at deadline"; return 1; }
    log "tunnel down, waiting 120s"
    sleep 120
  done
}

chiprun() {
  cap=$1; lname=$2; shift 2
  remaining=$(( CHIP_DEADLINE - $(now) ))
  if [ $remaining -lt 300 ]; then log "skip $lname (deadline, ${remaining}s left)"; return 1; fi
  [ $cap -gt $remaining ] && cap=$remaining
  wait_tunnel || return 1
  log "start $lname (cap ${cap}s)"
  timeout $cap "$@" >> $L/$lname.log 2>&1
  rc=$?
  log "done $lname rc=$rc"
  return $rc
}

bdreport() {  # bdreport OUTDIR [extra args...]
  d=$1; shift
  [ -f "$d/sga-psnr.csv" ] || [ -f "$d/bb_sga-psnr.csv" ] || return 0
  nice -n 19 python scripts/bd_report.py "$d" "$@" \
    > "$d/bd_report.md.tmp" 2>> $L/r5g-bd.log \
    && mv "$d/bd_report.md.tmp" "$d/bd_report.md"
}

log "round5g start"

# 1. Finish the tecnick-analog curve (one process = one compile for both).
chiprun 2400 r5g-tecnick python scripts/rd_curve.py \
  data_synth4/eval_1200.npy --checkpoint_dir checkpoints_synth3 \
  --out results/synth4_tecnick --methods amortized,sga \
  --num_filters 192 --lmbda 0.04,0.08
bdreport results/synth4_tecnick --dataset tecnick

# 2. Refresh the stale bb rows (checkpoints now at 120k; rows at 60k/100k).
chiprun 2000 r5g-bbeval python scripts/rd_curve.py \
  data_synth3/eval_512x768.npy --checkpoint_dir checkpoints_synth3 \
  --out results/synth3_bb --model mbt2018_bb --methods bb_plain,bb_sga \
  --num_filters 192 --lmbda 0.003,0.01
bdreport results/synth3_bb --methods bb_sga:bb_sga

# 3. Photos re-eval at the 320k checkpoints (old results/photos used
#    older checkpoints; keep both so the delta is visible).
chiprun 2400 r5g-photos python scripts/rd_curve.py \
  data_real/eval_photos.npy --checkpoint_dir checkpoints_synth3 \
  --out results/photos_synth3 --methods amortized,sga --num_filters 192
bdreport results/photos_synth3

PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nice -n 19 \
  python scripts/cross_report.py >> $L/r5g-bd.log 2>&1 || true

log "round5g complete"
touch $L/ROUND5G_DONE
