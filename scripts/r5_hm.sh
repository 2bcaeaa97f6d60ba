#!/bin/bash
# Round-3 merged-data hetro leg (chains on r5_vclf2 + r5_dgen2):
# the raw-validity lever left after the continuation — more training
# data. Merges the 16k seed-0 train set, the labeled set's ~6.7k
# oracle-valid molecules (seed 1) and the fresh 16k seed-2 set into one
# ~39k root, resumes the step-316k checkpoint on it, reruns the low-t
# fine-tune, re-exports artifacts/hetro-edm and re-runs the n=512 evals
# (the vclf-guided arm now sees the v2 classifier).
cd /root/repo || exit 1
LOG=runs/r5_hm.log
if ! mkdir /tmp/r5_hm.lock 2>/dev/null; then
  echo "r5_hm: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r5_hm start $(date)" >> $LOG

for i in $(seq 1 210); do
  grep -q "r5_vclf2 done" runs/r5_vclf2.log 2>/dev/null && break
  sleep 120
done
echo "r5_vclf2 observed done $(date)" >> $LOG
for i in $(seq 1 60); do
  grep -q "DGEN2 DONE" runs/r5_dgen2.log 2>/dev/null && break
  sleep 60
done

# TPU wait loop (tunnel flaps; bounded ~1.5h)
for i in $(seq 1 20); do
  if timeout 240 python - <<'PY' > /tmp/tpu_probe_hm.log 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))
PY
  then echo "TPU up $(date) (attempt $i)" >> $LOG; break; fi
  echo "TPU probe failed attempt $i $(date)" >> $LOG
  sleep 200
done

SRC="--src runs/r5h:0 --src runs/r5h_lab:900000"
if [ -f runs/r5h2/hetro.csv ]; then
  SRC="$SRC --src runs/r5h2:500000"
else
  echo "seed-2 set missing; merging without it" >> $LOG
fi
timeout 1800 python scripts/merge_hetro.py --out runs/r5h_merged $SRC >> $LOG 2>&1 || exit 1
mkdir -p runs/r5h_merged/summary
rm -rf runs/r5h_merged/summary/longrun-edm
cp -r runs/r5h/summary/longrun-edm runs/r5h_merged/summary/ || exit 1
echo "MERGE DONE $(date)" >> $LOG

timeout 8000 python scripts/longrun_tpu.py --root runs/r5h_merged --dataset hetro \
  --molecules 39000 --max-hours 1.4 --ema 0.9999 --round-epochs 25 \
  >> runs/r5hm_driver.log 2>&1
echo "HM_CONT DONE $(date)" >> $LOG
timeout 4200 python scripts/longrun_tpu.py --root runs/r5h_merged --dataset hetro \
  --molecules 39000 --max-hours 0.65 --lr 1e-4 --ema 0.9999 --round-epochs 10 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 \
  >> runs/r5hm_driver.log 2>&1
echo "HM_FT DONE $(date)" >> $LOG

timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r5h_merged/summary/longrun-edm --out artifacts/hetro-edm \
  --note "round-3 hetro EDM: merged 39k set (16k seed-0 + 6.7k oracle-valid labeled + 16k seed-2), continuation from step 316k + low-t fine-tune (lr 1e-4, t_bias 0.5/0.1)" >> $LOG 2>&1
for i in 1 2 3 4 5; do
  git add artifacts/hetro-edm && git commit -q -m "Artifact: hetro EDM (round-3, merged 39k-molecule continuation)

No-Verification-Needed: committed binary artifact + provenance note only" -- artifacts/hetro-edm && break
  sleep 20
done

EXPH=runs/r5h_merged/summary/longrun-edm
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  > runs/r5hm_eval_raw.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  > runs/r5hm_eval_polish.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --guide-predictor-dir artifacts/hetro-vclf \
  --guide-target max:VALID --guide-scale 1.0 --guide-t-window 0.25 \
  --guide-prob > runs/r5hm_eval_vclf.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --reject 3 --reject-criterion valid \
  > runs/r5hm_eval_reject.log 2>&1
echo "HM_EVALS DONE $(date)" >> $LOG
echo "r5_hm done $(date)" >> $LOG
rmdir /tmp/r5_hm.lock
