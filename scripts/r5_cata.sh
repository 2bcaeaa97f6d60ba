#!/bin/bash
# Round-3 stage 1: retrain the cata EDM from scratch at HEAD (post EMA-warmup
# fix, commit dcf2755) on the existing runs/r4 16k synthetic dataset, then
# low-t fine-tune (the round-2 r2lt recipe: t_bias_frac=0.5, t_bias_cap=0.1,
# QUALITY.md:330). Training only — export/eval/commit are driven interactively.
cd /root/repo || exit 1
LOG=runs/r5_cata.log
mkdir -p runs
echo "r5_cata start $(date)" >> $LOG

# TPU wait loop (tunnel flaps; bounded at ~3h)
for i in $(seq 1 45); do
  if timeout 240 python - <<'PY' > /tmp/tpu_probe_r5.log 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))
PY
  then echo "TPU up $(date) (attempt $i)" >> $LOG; break; fi
  echo "TPU probe failed attempt $i $(date)" >> $LOG
  sleep 200
done

# main train: ~1.8h wall
timeout 8400 python scripts/longrun_tpu.py --root runs/r4 --dataset cata \
  --molecules 16000 --max-hours 1.8 --ema 0.9999 --round-epochs 50 \
  >> runs/r4/driver.log 2>&1
echo "CATA_MAIN DONE $(date)" >> $LOG

# low-t fine-tune (resumes from the same root's checkpoint).
# lr 1e-4 is part of the proven r2lt recipe (QUALITY.md:330) — fine-tuning
# at the full 1e-3 would perturb the converged weights instead of
# sharpening the low-t score.
timeout 4200 python scripts/longrun_tpu.py --root runs/r4 --dataset cata \
  --molecules 16000 --max-hours 0.8 --lr 1e-4 --ema 0.9999 --round-epochs 25 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 \
  >> runs/r4/driver.log 2>&1
echo "CATA_FT DONE $(date)" >> $LOG
