#!/bin/bash
# After the GAP-conditioned cata CPU pilot (runs/r2gcfg_cpu) finishes:
# oracle-measured dose-response evals (scripts/probe_cfg_property.py).
# Judges whether classifier-free guidance steers a real-valued property
# (GAP_eV) — the use the CFG machinery was built for after the
# VALID-label negative result (QUALITY.md). Appends JSON lines to
# runs/r2gcfg_cpu/contrast.log.
cd /root/repo || exit 1
LOG=runs/r2gcfg_cpu/contrast.log
while ! grep -q "LONGRUN DONE" runs/r2gcfg_cpu/driver.log 2>/dev/null; do
  sleep 180
done
echo "gap contrast start $(date)" >> $LOG
EXP=runs/r2gcfg_cpu/summary/longrun-edm
# T=300 pilot: n-steps 60 = the K=100-equivalent stride; n=128/arm.
# Targets at mean +/- 1.3 sigma of the label distribution (1.72 +/- 0.54).
timeout 14400 nice -n 10 python scripts/probe_cfg_property.py \
  --exp-dir $EXP --n 128 --n-steps 60 --seed 31 --platform cpu \
  --targets 1.0,1.7,2.4 --cfg-weights 0,1,2 \
  --guide-predictor-dir runs/r2s/psummary/r2-pred --guide-scale 0.6 \
  >> $LOG 2>&1
echo "PILOT GAP CONTRAST DONE $(date)" >> $LOG
