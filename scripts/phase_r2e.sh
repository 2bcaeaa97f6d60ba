#!/bin/bash
# Round-2 phase E: recovery chain after the TPU tunnel died at ~20:05.
# Waits for the device to come back, then runs the remaining round-2
# measurements in priority order.
cd /root/repo || exit 1
LOG=runs/phase_r2.log
echo "phase_r2e start $(date)" >> $LOG

# 0. wait for the TPU tunnel to heal
while true; do
  if timeout 180 python - <<'PY' > /tmp/tpu_probe.log 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))
PY
  then break; fi
  sleep 240
done
echo "TPU back $(date)" >> $LOG

# 1. cata finals (1,024 samples)
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
echo "cata finals done $(date)" >> $LOG

# 2. production fast path: strided + guided polish
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2lt/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --n-steps 100 --polish 3 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  > runs/r2lt/eval_faststack.log 2>&1
echo "fast-path eval done $(date)" >> $LOG

# 3. hetro finals: probability-space windowed classifier guidance
#    (probed recipe: +8pp validity at scale 1, t<0.25, sigmoid space)
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2h/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --std 0.5 --guide-predictor-dir runs/vclf_hetro/psummary/vclf-bce \
  --guide-target max:VALID --guide-scale 1.0 --guide-t-window 0.25 \
  --guide-prob > runs/r2h/eval_guided.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2h/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --std 0.5 --guide-predictor-dir runs/vclf_hetro/psummary/vclf-bce \
  --guide-target max:VALID --guide-scale 1.0 --guide-t-window 0.25 \
  --guide-prob --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  > runs/r2h/eval_guided_polish.log 2>&1
echo "hetro guided finals done $(date)" >> $LOG

# 4. peri extension + finals
timeout 4200 python scripts/longrun_tpu.py --root runs/r2p --dataset peri \
  --molecules 24000 --max-hours 1.0 --ema 0.9999 --round-epochs 60 \
  >> runs/r2p/driver.log 2>&1
echo "peri extension done $(date)" >> $LOG
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2p/summary/longrun-edm --n-samples 512 --batch-size 512 \
  > runs/r2p/eval_final_raw.log 2>&1
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2p/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  > runs/r2p/eval_final_polish.log 2>&1
echo "peri finals done $(date)" >> $LOG

# 5. re-warm the bench graph for the driver's end-of-round run
timeout 2400 python bench.py > runs/bench_r2_final.json 2>>$LOG
echo "PHASE_R2E DONE $(date): $(cat runs/bench_r2_final.json)" >> $LOG
