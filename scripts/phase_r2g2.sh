#!/bin/bash
# Round-2 phase G, v2 (replaces phase_r2g.sh — killed before running any
# TPU work). The CPU pilot (runs/r2pcfg_cpu/contrast.log, 85k steps,
# n=128/arm) REFUTED the CFG-for-Kekule hypothesis: conditioning peri
# generation on the oracle VALID label moves mol_valid by <4pp across
# cfg-weight 0/0.5/1/2/4 and even conditioning on VALID=0 matches
# VALID=1 — the label carries no signal the centroid-space denoiser can
# exploit. Decision recorded in QUALITY.md; the 1.8h TPU CFG campaign is
# cancelled and this slot goes to the proven round-3 lever instead:
# extending the cata low-t fine-tune (QUALITY.md: model-only ~89%
# mol-stable, "extending the low-t fine-tune is the natural lever").
cd /root/repo || exit 1
LOG=runs/phase_r2.log
echo "phase_r2g2 start $(date)" >> $LOG
while ! grep -q "PHASE_R2F DONE" $LOG 2>/dev/null; do sleep 120; done

# 1. cata low-t fine-tune extension: stage r2lt -> r2lt2, lower lr,
#    tighter t-bias window (score precision near t=0 is the residual gap)
mkdir -p runs/r2lt2/summary
rm -rf runs/r2lt2/summary/longrun-edm
cp -r runs/r2lt/summary/longrun-edm runs/r2lt2/summary/
rm -rf runs/r2lt2/summary/longrun-edm/eval
cp runs/r2lt/cata.csv runs/r2lt2/ 2>/dev/null
cp -r runs/r2lt/cata-xyz runs/r2lt2/ 2>/dev/null
cp -r runs/r2lt/cata-xyz_tpu_cache runs/r2lt2/ 2>/dev/null
timeout 6600 python scripts/longrun_tpu.py --root runs/r2lt2 --dataset cata \
  --molecules 30000 --max-hours 1.5 --ema 0.9999 --lr 5e-5 \
  --round-epochs 60 --t-bias-frac 0.6 --t-bias-cap 0.05 \
  > runs/r2lt2/driver.log 2>&1
echo "cata low-t extension done $(date)" >> $LOG

# 2. model-only finals on the extended model (the number this run chases)
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2lt2/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --plots 0 > runs/r2lt2/eval_raw.log 2>&1
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2lt2/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 --polish-decay 0.6 \
  --plots 0 > runs/r2lt2/eval_polish.log 2>&1
echo "cata low-t extension finals done $(date)" >> $LOG

echo "PHASE_R2G DONE $(date)" >> $LOG
