#!/bin/bash
# Round-2 phase F: after phase E lands — push hetro toward the >=85%-valid
# bar (extension to plateau + low-t fine-tune, the knob that crossed the
# 90% stability bar on cata), peri low-t fine-tune, production
# rejection-resampling evals (--reject), final bench re-warm.
cd /root/repo || exit 1
LOG=runs/phase_r2.log
echo "phase_r2f start $(date)" >> $LOG
while ! grep -q "PHASE_R2E DONE" $LOG 2>/dev/null; do sleep 120; done

# 1. hetro extension to plateau (quality.jsonl showed +valid still rising
#    at 415k steps)
timeout 9600 python scripts/longrun_tpu.py --root runs/r2h --dataset hetro \
  --molecules 30000 --max-hours 2.4 --ema 0.9999 --round-epochs 60 \
  >> runs/r2h/driver.log 2>&1
echo "hetro extension-2 done $(date)" >> $LOG

# 2. hetro low-t fine-tune (staged copy, biased t-sampling)
mkdir -p runs/r2hlt/summary
rm -rf runs/r2hlt/summary/longrun-edm
cp -r runs/r2h/summary/longrun-edm runs/r2hlt/summary/
rm -rf runs/r2hlt/summary/longrun-edm/eval
cp runs/r2h/hetro.csv runs/r2hlt/ 2>/dev/null
cp -r runs/r2h/hetro-xyz runs/r2hlt/ 2>/dev/null
cp -r runs/r2h/hetro-xyz_tpu_cache runs/r2hlt/ 2>/dev/null
timeout 5400 python scripts/longrun_tpu.py --root runs/r2hlt --dataset hetro \
  --molecules 30000 --max-hours 1.2 --ema 0.9999 --lr 1e-4 \
  --round-epochs 60 --t-bias-frac 0.5 --t-bias-cap 0.1 \
  > runs/r2hlt/driver.log 2>&1
echo "hetro low-t fine-tune done $(date)" >> $LOG

# 3. hetro finals on the fine-tuned model
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2hlt/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --std 0.5 > runs/r2hlt/eval_raw.log 2>&1
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2hlt/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  > runs/r2hlt/eval_polish.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2hlt/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --std 0.5 --guide-predictor-dir runs/vclf_hetro/psummary/vclf-bce \
  --guide-target max:VALID --guide-scale 1.0 --guide-t-window 0.25 \
  --guide-prob --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  > runs/r2hlt/eval_guided_polish.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2hlt/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --reject 3 --reject-criterion valid \
  > runs/r2hlt/eval_reject.log 2>&1
echo "hetro finals done $(date)" >> $LOG

# 4. peri low-t fine-tune + finals (incl. rejection: validity ~50% raw is
#    Kekule-feasibility-bound, so rejection is the production path)
mkdir -p runs/r2plt/summary
rm -rf runs/r2plt/summary/longrun-edm
cp -r runs/r2p/summary/longrun-edm runs/r2plt/summary/
rm -rf runs/r2plt/summary/longrun-edm/eval
cp runs/r2p/peri.csv runs/r2plt/ 2>/dev/null
cp -r runs/r2p/peri-xyz runs/r2plt/ 2>/dev/null
cp -r runs/r2p/peri-xyz_tpu_cache runs/r2plt/ 2>/dev/null
timeout 4200 python scripts/longrun_tpu.py --root runs/r2plt --dataset peri \
  --molecules 24000 --max-hours 0.9 --ema 0.9999 --lr 1e-4 \
  --round-epochs 60 --t-bias-frac 0.5 --t-bias-cap 0.1 \
  > runs/r2plt/driver.log 2>&1
echo "peri low-t fine-tune done $(date)" >> $LOG
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2plt/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  > runs/r2plt/eval_polish.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2plt/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --reject 4 --reject-criterion valid \
  > runs/r2plt/eval_reject.log 2>&1
echo "peri finals done $(date)" >> $LOG

# 5. cata production stack + rejection (expected ~100/100 at tiny overhead)
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2lt/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --n-steps 100 --polish 3 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  --reject 2 --reject-criterion both \
  > runs/r2lt/eval_reject.log 2>&1
echo "cata rejection eval done $(date)" >> $LOG

# 6. re-warm the bench graph for the driver's end-of-round run
timeout 2400 python bench.py > runs/bench_r2f_final.json 2>>$LOG
echo "PHASE_R2F DONE $(date): $(cat runs/bench_r2f_final.json)" >> $LOG
