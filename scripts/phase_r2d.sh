#!/bin/bash
# Round-2 phase D: after phase C — production fast-path measurement,
# hetro validity-classifier probe + final guided eval, peri extension,
# final bench warm.
cd /root/repo || exit 1
LOG=runs/phase_r2.log
echo "phase_r2d start $(date)" >> $LOG
while ! grep -q "PHASE_R2C DONE" $LOG 2>/dev/null; do sleep 60; done

# 1. production fast path: strided sampler + physics-guided polish
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2lt/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --n-steps 100 --polish 3 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  > runs/r2lt/eval_faststack.log 2>&1
echo "fast-path eval done $(date)" >> $LOG

# 2. hetro validity-classifier guidance probe (scale sweep), then final
#    guided eval at the better scale if it helps (checked by hand later)
timeout 3600 python scripts/probe_validity_guided.py \
  --edm-dir runs/r2h/summary/longrun-edm \
  --predictor-dir runs/vclf_hetro/psummary/vclf-bce \
  --n 256 --std 0.5 --scale 0 0.3 1.0 --polish 3 > /tmp/probe_hguided.log 2>&1
echo "hetro guided probe done $(date)" >> $LOG

# 3. peri extension with remaining budget
timeout 4800 python scripts/longrun_tpu.py --root runs/r2p --dataset peri \
  --molecules 24000 --max-hours 1.2 --ema 0.9999 --round-epochs 60 \
  >> runs/r2p/driver.log 2>&1
echo "peri extension done $(date)" >> $LOG
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2p/summary/longrun-edm --n-samples 512 --batch-size 512 \
  > runs/r2p/eval_final_raw.log 2>&1
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2p/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  > runs/r2p/eval_final_polish.log 2>&1
echo "peri final evals done $(date)" >> $LOG

# 4. re-warm the bench graph for the driver's end-of-round run
timeout 2400 python bench.py > runs/bench_r2_final.json 2>>$LOG
echo "PHASE_R2D DONE $(date): $(cat runs/bench_r2_final.json)" >> $LOG
