#!/bin/bash
# Round-3 overnight leg: peri low-t fine-tune. cata (+8pp raw stable,
# 0.787->0.869) and hetro (+3.5pp, 0.846->0.881) both gained from the
# lr 1e-4 / t_bias 0.5/0.1 fine-tune; peri's 1.5h budget ended at the
# flat-lr phase (raw stable 0.856-0.889 band, QUALITY.md). Resume the
# runs/r5p checkpoint with the same recipe, re-export artifacts/peri-edm,
# and re-run the raw + polish n=512 evals. Chains on r5_hm so it only
# touches the TPU once the merged-hetro leg is done.
cd /root/repo || exit 1
LOG=runs/r5_pf.log
if ! mkdir /tmp/r5_pf.lock 2>/dev/null; then
  echo "r5_pf: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r5_pf start $(date)" >> $LOG

# wait for the r5_hm chain (bounded ~14h), then a TPU probe retry loop
for i in $(seq 1 420); do
  grep -q "r5_hm done" runs/r5_hm.log 2>/dev/null && break
  sleep 120
done
echo "r5_hm observed done $(date)" >> $LOG
for i in $(seq 1 20); do
  if timeout 300 python - <<'PY' > /tmp/tpu_probe_pf.log 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))
PY
  then echo "TPU up $(date) (attempt $i)" >> $LOG; break; fi
  echo "TPU probe failed attempt $i $(date)" >> $LOG
  sleep 200
done

timeout 4200 python scripts/longrun_tpu.py --root runs/r5p --dataset peri \
  --molecules 10216 --max-hours 0.8 --lr 1e-4 --ema 0.9999 --round-epochs 25 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 \
  >> runs/r5p_driver.log 2>&1
echo "PF_FT DONE $(date)" >> $LOG

timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r5p/summary/longrun-edm --out artifacts/peri-edm \
  --note "round-3 peri EDM: 10.2k synthetic (salvaged), 1.5h main + low-t fine-tune (lr 1e-4, t_bias 0.5/0.1)" >> $LOG 2>&1
for i in 1 2 3 4 5; do
  git add artifacts/peri-edm && git commit -q -m "Artifact: peri EDM (round-3, + low-t fine-tune)

No-Verification-Needed: committed binary artifact + provenance note only" -- artifacts/peri-edm && break
  sleep 20
done

EXPP=runs/r5p/summary/longrun-edm
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPP --n-samples 512 --batch-size 512 --plots 0 \
  > runs/r5pf_eval_raw.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  > runs/r5pf_eval_polish.log 2>&1
echo "PF_EVALS DONE $(date)" >> $LOG
# persist the eval logs (the evidence watcher may have exited by then)
cp -f runs/r5pf_eval_raw.log runs/r5pf_eval_polish.log evidence/r3/ 2>/dev/null
cp -f runs/r5p/quality.jsonl runs/r5p_quality.jsonl 2>/dev/null
cp -f runs/r5p_quality.jsonl evidence/r3/ 2>/dev/null
for i in 1 2 3 4 5; do
  git add evidence/r3 && git commit -q -m "Evidence: peri fine-tune eval logs (round-3 overnight leg)

No-Verification-Needed: committed eval-log evidence only" -- evidence/r3 && break
  sleep 20
done
echo "r5_pf done $(date)" >> $LOG
rmdir /tmp/r5_pf.lock
