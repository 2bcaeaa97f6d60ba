#!/bin/bash
# Round-2 phase C: after phase B finishes — low-t fine-tune the cata model,
# run the final 1,024-sample evals (raw / model polish / physics-guided
# polish), and extend the hetro campaign with leftover budget.
cd /root/repo || exit 1
LOG=runs/phase_r2.log
echo "phase_r2c start $(date)" >> $LOG

# 0. wait for phase_r2b's final bench marker
while ! grep -q "PHASE_R2B DONE" $LOG 2>/dev/null; do sleep 60; done
echo "r2b finished, starting low-t fine-tune $(date)" >> $LOG

# 1. low-t fine-tune on the small-amplitude cata data (checkpoint staged
#    from r2s; half of each batch draws t in [0, 0.1*T]) — targets the
#    z-contraction deficit diagnosed in QUALITY.md
timeout 5400 python scripts/longrun_tpu.py --root runs/r2lt --max-hours 1.2 \
  --ema 0.9999 --lr 1e-4 --round-epochs 60 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 > runs/r2lt/driver.log 2>&1
echo "r2lt fine-tune done $(date)" >> $LOG

# 2. final cata evals, 1,024 samples each:
#    (a) fine-tuned, raw        (b) fine-tuned, model polish
#    (c) fine-tuned, physics-guided polish   (d) r2s, guided polish
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2lt/summary/longrun-edm --n-samples 1024 --batch-size 512 \
  > runs/r2lt/eval1k_raw.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2lt/summary/longrun-edm --n-samples 1024 --batch-size 512 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 --polish-decay 0.6 \
  > runs/r2lt/eval1k_polish.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2lt/summary/longrun-edm --n-samples 1024 --batch-size 512 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 --polish-decay 0.6 \
  --polish-guide planarity --polish-guide-scale 100 --novelty \
  > runs/r2lt/eval1k_guided.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2s/summary/longrun-edm --n-samples 1024 --batch-size 512 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 --polish-decay 0.6 \
  --polish-guide planarity --polish-guide-scale 100 --novelty \
  > runs/r2s/eval1k_guided.log 2>&1
echo "cata final evals done $(date)" >> $LOG

# 3. extend hetro with the leftover budget
timeout 6000 python scripts/longrun_tpu.py --root runs/r2h --dataset hetro \
  --molecules 30000 --max-hours 1.5 --ema 0.9999 --round-epochs 60 \
  >> runs/r2h/driver.log 2>&1
echo "hetro extension done $(date)" >> $LOG
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2h/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  > runs/r2h/eval_final.log 2>&1
echo "PHASE_R2C DONE $(date)" >> $LOG
