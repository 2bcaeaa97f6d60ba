#!/bin/bash
# Round-3 stage 2 (chains on r5_cata.sh): export the trained cata EDM to a
# committed artifact, then run the 1,024-sample TPU confirmations of the
# round-2 headline claims (VERDICT r2 next-steps #1/#3/#4):
#   raw reference semantics | model-only polish | planarity-guided polish
# plus the data-uniqueness ceiling probe and rejection-resampling at n=512.
cd /root/repo || exit 1
LOG=runs/r5_confirm.log
echo "r5_confirm start $(date)" >> $LOG

EXP=runs/r4/summary/longrun-edm

timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir $EXP --out artifacts/cata-edm \
  --note "round-3 retrain at HEAD (post EMA fix): 16k synthetic cata, main+low-t fine-tune" \
  >> $LOG 2>&1
for i in 1 2 3 4 5; do
  if git add artifacts/cata-edm && \
     git commit -q -m "Artifact: cata EDM (round-3 retrain, main + low-t fine-tune)

Self-contained weights.npz (live+EMA params, train-split stats) exported
from the runs/r4 longrun at HEAD. Trained post EMA-warmup fix; recipe:
16k synthetic cata molecules, batch 256, ema 0.9999, then t_bias_frac=0.5
t_bias_cap=0.1 low-t fine-tune (the round-2 r2lt recipe).

No-Verification-Needed: committed binary artifact + provenance note only" \
     -- artifacts/cata-edm; then break; fi
  sleep 20
done
echo "ARTIFACT COMMITTED $(date)" >> $LOG

# 1,024-sample TPU confirmations (reference eval semantics, eval_validity.py:24-103)
timeout 4800 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXP --n-samples 1024 --batch-size 512 --plots 0 \
  > runs/r4/eval1k_raw.log 2>&1
echo "RAW1024 DONE $(date)" >> $LOG

timeout 4800 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXP --n-samples 1024 --batch-size 512 --plots 0 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 --polish-decay 0.6 \
  > runs/r4/eval1k_polish.log 2>&1
echo "POLISH1024 DONE $(date)" >> $LOG

timeout 4800 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXP --n-samples 1024 --batch-size 512 --plots 0 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 --polish-decay 0.6 \
  --polish-guide planarity --polish-guide-scale 100 \
  > runs/r4/eval1k_guided.log 2>&1
echo "GUIDED1024 DONE $(date)" >> $LOG

# rejection-resampling production mode at n=512 (round-2 numbers were n=64 CPU)
timeout 4800 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 --polish-decay 0.6 \
  --polish-guide planarity --polish-guide-scale 100 \
  --reject 4 --reject-criterion both \
  > runs/r4/eval512_reject.log 2>&1
echo "REJECT512 DONE $(date)" >> $LOG

# data-uniqueness ceiling at n=1024 (host-only; answers VERDICT r2 weak #5)
timeout 2400 python scripts/uniqueness_baseline.py --root runs/r4 \
  --dataset cata --n 1024 > runs/r4/uniq_baseline.json 2>>$LOG
echo "UNIQ DONE $(date)" >> $LOG
echo "r5_confirm done $(date)" >> $LOG
