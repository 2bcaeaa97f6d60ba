#!/bin/bash
# Round-3 closing leg: second continuation on the merged 39k hetro set.
# The r5_hm leg's internal curve kept climbing through its 1.4h budget
# (raw valid 0.61 -> ~0.67-0.70 at step 445k), so the remaining TPU
# hours go to more plain training + a fresh low-t fine-tune, then the
# artifact re-export and the same n=512 eval battery. Chains on r5_pf
# so it only touches the TPU once the peri leg is done.
cd /root/repo || exit 1
LOG=runs/r5_hc2.log
if ! mkdir /tmp/r5_hc2.lock 2>/dev/null; then
  echo "r5_hc2: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r5_hc2 start $(date)" >> $LOG

# wait for the r5_pf chain (bounded ~10h), then a TPU probe retry loop
for i in $(seq 1 300); do
  grep -q "r5_pf done" runs/r5_pf.log 2>/dev/null && break
  sleep 120
done
echo "r5_pf observed done $(date)" >> $LOG
for i in $(seq 1 20); do
  if timeout 300 python - <<'PY' > /tmp/tpu_probe_hc2.log 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))
PY
  then echo "TPU up $(date) (attempt $i)" >> $LOG; break; fi
  echo "TPU probe failed attempt $i $(date)" >> $LOG
  sleep 200
done

# plain continuation (resumes the post-FT checkpoint; lr back to 1e-3)
timeout 7200 python scripts/longrun_tpu.py --root runs/r5h_merged --dataset hetro \
  --molecules 39000 --max-hours 1.3 --ema 0.9999 --round-epochs 25 \
  >> runs/r5hc2_driver.log 2>&1
echo "HC2_CONT DONE $(date)" >> $LOG
# fresh low-t fine-tune on top
timeout 3600 python scripts/longrun_tpu.py --root runs/r5h_merged --dataset hetro \
  --molecules 39000 --max-hours 0.5 --lr 1e-4 --ema 0.9999 --round-epochs 10 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 \
  >> runs/r5hc2_driver.log 2>&1
echo "HC2_FT DONE $(date)" >> $LOG

timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r5h_merged/summary/longrun-edm --out artifacts/hetro-edm \
  --note "round-3 hetro EDM: merged 39k set, two continuation legs + low-t fine-tune (lr 1e-4, t_bias 0.5/0.1)" >> $LOG 2>&1
for i in 1 2 3 4 5; do
  git add artifacts/hetro-edm && git commit -q -m "Artifact: hetro EDM (round-3, second merged-data continuation)

No-Verification-Needed: committed binary artifact + provenance note only" -- artifacts/hetro-edm && break
  sleep 20
done

EXPH=runs/r5h_merged/summary/longrun-edm
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  > runs/r5hc2_eval_raw.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  > runs/r5hc2_eval_polish.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --guide-predictor-dir artifacts/hetro-vclf \
  --guide-target max:VALID --guide-scale 1.0 --guide-t-window 0.25 \
  --guide-prob > runs/r5hc2_eval_vclf.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --reject 3 --reject-criterion valid \
  > runs/r5hc2_eval_reject.log 2>&1
echo "HC2_EVALS DONE $(date)" >> $LOG

# self-commit the evidence (the watcher exits after hm_evals)
cp -f runs/r5h_merged/quality.jsonl runs/r5hm_quality.jsonl 2>/dev/null
for f in runs/r5hc2_eval_raw.log runs/r5hc2_eval_polish.log \
         runs/r5hc2_eval_vclf.log runs/r5hc2_eval_reject.log \
         runs/r5hm_quality.jsonl runs/r5_hc2.log; do
  [ -f "$f" ] && grep -av "cpu_aot_loader" "$f" > "evidence/r3/$(basename "$f")"
done
for i in 1 2 3 4 5; do
  git add evidence/r3 && git commit -q -m "Evidence: hc2 second hetro continuation eval logs (round-3)

No-Verification-Needed: committed eval-log evidence only" -- evidence/r3 && break
  sleep 20
done
echo "r5_hc2 done $(date)" >> $LOG
rmdir /tmp/r5_hc2.lock
