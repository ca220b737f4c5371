#!/bin/bash
# Round-5 final tail (session 2): the 900s tecnick cap lost lambda=0.001's
# sga work mid-run (compile-cold chunks), so caps are raised and the lost
# lambda is retried before the stretch items. Waits for the in-flight
# lambda=0.08 tecnick eval inherited from round5d.
set -u
cd /root/repo
exec 9>/tmp/r5pipe_e.lock
flock -n 9 || { echo "round5e already running; exiting"; exit 0; }
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
mkdir -p $L
DRIVER=$L/round5e_driver.log

now() { now_=$(date +%s); echo $now_; }
CHIP_DEADLINE=$(date -d '2026-08-20 07:04 UTC' +%s)

log() { echo "=== $* : $(date -u) ===" >> $DRIVER; }

chiprun() {
  cap=$1; lname=$2; shift 2
  remaining=$(( CHIP_DEADLINE - $(date +%s) ))
  if [ $remaining -lt 240 ]; then log "skip $lname (deadline, ${remaining}s left)"; return 1; fi
  [ $cap -gt $remaining ] && cap=$remaining
  log "start $lname (cap ${cap}s)"
  timeout $cap "$@" >> $L/$lname.log 2>&1
  rc=$?
  log "done $lname rc=$rc"
  return $rc
}

log "round5e start"

# Wait for the inherited lambda=0.08 tecnick eval (round5d's child).
PID=$(cat /tmp/cur_eval.pid 2>/dev/null || echo "")
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 20; done
log "inherited tecnick eval finished"

tecnick() {
  chiprun $2 "r5e-tecnick" python scripts/rd_curve.py \
    data_synth4/eval_1200.npy --checkpoint_dir checkpoints_synth3 \
    --out results/synth4_tecnick --methods amortized,sga \
    --num_filters 192 --lmbda $1
}

# Warm compile cache now: ~500s/lambda expected; give slack for tunnel drift.
tecnick 0.01 780
tecnick 0.003 780
tecnick 0.04 780
tecnick 0.001 900   # the lost one (pays nothing extra now the cache is warm)

# Stretch: refresh old bb rows at 120k, then photos.
for lm in 0.003 0.01; do
  chiprun 800 "r5e-bbeval-$lm" python scripts/rd_curve.py \
    data_synth3/eval_512x768.npy --checkpoint_dir checkpoints_synth3 \
    --out results/synth3_bb --model mbt2018_bb --methods bb_plain,bb_sga \
    --num_filters 192 --lmbda $lm
done

chiprun 1500 r5e-photos python scripts/rd_curve.py \
  data_real/eval_photos.npy --checkpoint_dir checkpoints_synth3 \
  --out results/photos_synth3 --methods amortized,sga --num_filters 192

# ---- CPU follow-ups ---------------------------------------------------------
log "bd reports"
if [ -f results/synth4_tecnick/sga-psnr.csv ]; then
  python scripts/bd_report.py results/synth4_tecnick --dataset tecnick \
    > results/synth4_tecnick/bd_report.md.tmp 2>> $L/r5e-bd.log \
    && mv results/synth4_tecnick/bd_report.md.tmp results/synth4_tecnick/bd_report.md
fi
python scripts/bd_report.py results/synth3_bb --methods bb_sga:bb_sga \
  > results/synth3_bb/bd_report.md.tmp 2>> $L/r5e-bd.log \
  && mv results/synth3_bb/bd_report.md.tmp results/synth3_bb/bd_report.md
if [ -f results/photos_synth3/sga-psnr.csv ]; then
  python scripts/bd_report.py results/photos_synth3 \
    > results/photos_synth3/bd_report.md.tmp 2>> $L/r5e-bd.log \
    && mv results/photos_synth3/bd_report.md.tmp results/photos_synth3/bd_report.md
fi
PYTHONPATH=/root/repo JAX_PLATFORMS=cpu nice -n 19 \
  python scripts/cross_report.py >> $L/r5e-bd.log 2>&1 || true

log "round5e complete"
touch $L/ROUND5E_DONE
