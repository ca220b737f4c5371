#!/bin/bash
# Round-5 eval phase, invoked by round5_pipeline.sh after training.
# Separate file so eval targets can be refined while training runs.
# Expects R5_EVAL_DEADLINE (epoch secs) in the environment.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
L=/root/repo/train_logs
DEADLINE=${R5_EVAL_DEADLINE:?}
# Mid-round override (the pipeline exports the deadline it computed at its
# own start; this lets a later session extend it without touching the
# running pipeline process).
[ -f /tmp/r5_eval_deadline ] && DEADLINE=$(cat /tmp/r5_eval_deadline)

now() { date +%s; }
log() { echo "=== $* : $(date) ===" >> $L/round5_driver.log; }

evalrun() {
  mins=$1; shift
  remaining=$(( DEADLINE - $(now) ))
  if [ $remaining -lt $(( mins * 30 )) ]; then
    log "skip eval $* (deadline: ${remaining}s left, wanted $((mins*60)))"
    return 1
  fi
  cap=$(( mins * 60 )); [ $cap -gt $remaining ] && cap=$remaining
  log "eval $*"
  timeout $cap python scripts/rd_curve.py "$@" >> $L/r5-eval.log 2>&1
  log "eval rc=$?"
}

# Ordered most-judge-critical first so a deadline squeeze drops the least
# important items (the caps are generous vs measured eval times; the real
# risk is the queue tail).

# 1. The held-out synth4 set (VERDICT r4 missing #1 prong a): disjoint
#    texture sources + different compositing statistics, JPEG-matched to
#    Kodak. No probe dependency — this is the headline held-out number.
if [ -f data_synth4/eval_512x768.npy ]; then
  evalrun 35 data_synth4/eval_512x768.npy --checkpoint_dir checkpoints_synth3 \
    --out results/synth4 --methods amortized,sga --num_filters 192
else
  log "data_synth4/eval_512x768.npy missing — skipped"
fi

# 2. Re-eval synth3 with the deepened checkpoints (all 5 lambdas >=320k).
evalrun 35 data_synth3/eval_512x768.npy --checkpoint_dir checkpoints_synth3 \
  --out results/synth3 --methods amortized,sga --num_filters 192

# 3. Full 5-point bits-back curve (VERDICT r4 missing #3).
evalrun 30 data_synth3/eval_512x768.npy --checkpoint_dir checkpoints_synth3 \
  --out results/synth3_bb --model mbt2018_bb --methods bb_plain,bb_sga \
  --num_filters 192

# 4. Tecnick analog: 1200x1200 difficulty-matched set (VERDICT r4 missing #2).
if [ -f data_synth4/eval_1200.npy ]; then
  evalrun 60 data_synth4/eval_1200.npy --checkpoint_dir checkpoints_synth3 \
    --out results/synth4_tecnick --methods amortized,sga --num_filters 192
else
  log "data_synth4/eval_1200.npy missing — skipped"
fi

# 5. Cross-generator probe (the 2x2 experiment): an mbt2018 lambda=0.01
#    model trained from scratch on the synth4 (held-out generator) corpus.
#    Evaluating {synth3-trained, synth4-trained} x {synth3-eval, synth4-eval}
#    directly measures the same-generator advantage that confounds the
#    +2.4 dB headline (VERDICT r4 missing #1 / weak #3). 120k steps is
#    enough for the 2x2 (the depth bias cancels in the cross mean).
if [ -d data_synth4/train ]; then
  remaining=$(( DEADLINE - $(now) ))
  budget=$(( remaining - 1500 ))   # leave >=25 min for the probe cells
  if [ $budget -gt 1200 ]; then
    [ $budget -gt 2700 ] && budget=2700
    log "probe train mbt2018 lmbda=0.01 on synth4 (budget ${budget}s)"
    timeout $budget python -m nic_tpu --num_filters 192 \
      --checkpoint_dir checkpoints_synth4 mbt2018 train \
      --train_glob 'data_synth4/train/*.png' \
      --lambda 0.01 --batchsize 8 --patchsize 256 --last_step 120000 \
      --save_checkpoint_secs 600 --steps_per_call 64 --retries 6 \
      --grad_clip 10 --divergence_threshold 500 \
      >> $L/r5-probe-synth4.log 2>&1
    log "probe train rc=$?"
  else
    log "skip probe train (deadline)"
  fi
fi

# 6. The probe's two cells of the 2x2 (synth4-trained model on both eval
#    sets, amortized+sga at its single lambda).
if [ -d checkpoints_synth4 ] && [ -f data_synth4/eval_512x768.npy ]; then
  evalrun 15 data_synth4/eval_512x768.npy --checkpoint_dir checkpoints_synth4 \
    --out results/synth4_probe --methods amortized,sga --num_filters 192
  evalrun 15 data_synth3/eval_512x768.npy --checkpoint_dir checkpoints_synth4 \
    --out results/synth4_probe_on_synth3 --methods amortized,sga \
    --num_filters 192
fi

# 7. Real photos with the deepened synth3 models (held-out real content).
evalrun 20 data_real/eval_photos.npy --checkpoint_dir checkpoints_synth3 \
  --out results/photos_synth3 --methods amortized,sga --num_filters 192

# ---- reports ---------------------------------------------------------------
log "bd reports"
for d in results/synth4 results/synth3 results/photos_synth3 ; do
  [ -f $d/sga-psnr.csv ] || continue
  python scripts/bd_report.py "$d" > "$d/bd_report.md.tmp" 2>> $L/r5-bd.log \
    && mv "$d/bd_report.md.tmp" "$d/bd_report.md"
done
if [ -f results/synth4_tecnick/sga-psnr.csv ]; then
  python scripts/bd_report.py results/synth4_tecnick --dataset tecnick \
    > results/synth4_tecnick/bd_report.md.tmp 2>> $L/r5-bd.log \
    && mv results/synth4_tecnick/bd_report.md.tmp results/synth4_tecnick/bd_report.md
fi
for d in results/synth3_bb; do
  [ -f $d/bb_sga-psnr.csv ] || continue
  python scripts/bd_report.py "$d" --methods bb_sga:bb_sga \
    > "$d/bd_report.md.tmp" 2>> $L/r5-bd.log \
    && mv "$d/bd_report.md.tmp" "$d/bd_report.md"
done
# Cross-generator 2x2 + difficulty-anchor report (needs the probe cells).
python scripts/cross_report.py >> $L/r5-cross.log 2>&1 \
  && log "cross_report written" || log "cross_report failed (see r5-cross.log)"

log "evals complete"
