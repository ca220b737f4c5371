#!/bin/bash
# Round-2 RD evaluation: after the nf=192 sweep (scripts/train_round2.sh +
# train_round2b.sh), produce reference-format RD curves on both synthetic
# eval sets (Kodak-analog 256x384 + Tecnick-analog 576x768), the standing
# BD-PSNR-vs-golden report, and the int8 A/B.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

python scripts/rd_curve.py data_synth2/eval.npy \
  --checkpoint_dir checkpoints_val2 --out results/synth2 \
  --methods amortized,sga --its 2000 --num_filters 192 \
  2>&1 | tee /tmp/rd_curve_r2.log

python scripts/rd_curve.py data_synth2/eval_576x768.npy \
  --checkpoint_dir checkpoints_val2 --out results/synth2_large \
  --methods amortized,sga --its 2000 --num_filters 192 \
  2>&1 | tee /tmp/rd_curve_r2_large.log

python scripts/bd_report.py results/synth2 | tee /tmp/bd_report_r2.md
python scripts/bd_report.py results/synth2_large --dataset tecnick | tee -a /tmp/bd_report_r2.md
