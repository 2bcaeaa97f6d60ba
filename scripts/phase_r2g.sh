#!/bin/bash
# Round-2 phase G (runs only if TPU time remains after phase F): peri
# conditioned on the oracle VALID label with classifier-free guidance.
# Motivation (QUALITY.md): peri raw validity ~50% is bound by Kekule
# feasibility of the sampled topology; a NOISY-input classifier measurably
# cannot represent it (negative result), but a CONDITIONAL generator only
# has to correlate clean-data structure with the label — CFG tests exactly
# that hypothesis. Trains on labeled (unfiltered, ~27%-valid) peri data,
# evals condition on VALID=1 with a cfg-weight sweep.
cd /root/repo || exit 1
LOG=runs/phase_r2.log
echo "phase_r2g start $(date)" >> $LOG
mkdir -p runs/r2pcfg
while ! grep -q "PHASE_R2F DONE" $LOG 2>/dev/null; do sleep 120; done

# 1. conditional peri campaign (labeled data, VALID conditioning)
timeout 7800 python scripts/longrun_tpu.py --root runs/r2pcfg --dataset peri \
  --molecules 24000 --max-hours 1.8 --ema 0.9999 --round-epochs 60 \
  --labeled --target-features "GAP_eV,HOMO_eV,VALID" \
  --context-features VALID --context-dropout 0.15 \
  --eval-context-set VALID=1 --eval-cfg-weight 1.0 \
  > runs/r2pcfg/driver.log 2>&1
echo "peri CFG campaign done $(date)" >> $LOG

# 2. cfg-weight sweep at 512 samples (0 = plain conditional)
for W in 0 0.5 1 2 4; do
  timeout 2400 python -m gaudi_tpu.cli.eval_validity \
    --exp-dir runs/r2pcfg/summary/longrun-edm --n-samples 512 \
    --batch-size 512 --context-set VALID=1 --cfg-weight $W --plots 0 \
    > runs/r2pcfg/eval_cfg_w$W.log 2>&1
done
echo "peri CFG sweep done $(date)" >> $LOG

# 3. best-effort production stack on top (polish + rejection at w=1)
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2pcfg/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --context-set VALID=1 --cfg-weight 1 --polish 3 --polish-t 0.05 \
  --polish-noise 0.3 --reject 3 --reject-criterion valid --plots 0 \
  > runs/r2pcfg/eval_cfg_stack.log 2>&1
echo "PHASE_R2G DONE $(date)" >> $LOG
