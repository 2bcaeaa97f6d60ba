#!/bin/bash
# Round-3 fix-up chain (replaces the tail of r5_rest.sh after its two
# datagen timeouts): the interrupted datasets were salvaged from their
# streamed xyz trees (scripts/salvage_csv.py), so every stage here starts
# from data that already exists on disk.
#   V  : hetro validity classifier (BCE) on the salvaged labeled data
#   H2 : hetro EDM continuation (resume runs/r5h) + low-t fine-tune
#        (the proven cata r2lt recipe: lr 1e-4, t_bias 0.5/0.1)
#   HE : hetro n=512 TPU evals — raw / polish / vclf-guided / reject
#   R  : peri EDM train on the salvaged 10.2k dataset
#   RE : peri n=512 TPU evals — raw / polish / reject
cd /root/repo || exit 1
LOG=runs/r5_fix.log
if ! mkdir /tmp/r5_fix.lock 2>/dev/null; then
  echo "r5_fix: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r5_fix start $(date)" >> $LOG

commit_artifact () {  # commit_artifact <dir> <msg>
  for i in 1 2 3 4 5; do
    if git add "$1" && git commit -q -m "$2

No-Verification-Needed: committed binary artifact + provenance note only" -- "$1"; then
      return 0
    fi
    sleep 20
  done
}

# TPU wait loop (tunnel flaps; bounded at ~3h)
for i in $(seq 1 45); do
  if timeout 240 python - <<'PY' > /tmp/tpu_probe_fix.log 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))
PY
  then echo "TPU up $(date) (attempt $i)" >> $LOG; break; fi
  echo "TPU probe failed attempt $i $(date)" >> $LOG
  sleep 200
done

# ---------------- stage V: hetro validity classifier ----------------
timeout 3600 python -m gaudi_tpu.cli.train_predictor \
  --dataset hetro --data-root runs/r5h_lab --max-nodes 10 \
  --target-features VALID --loss bce --name vclf-bce \
  --save-dir runs/r5h_lab/psummary --epochs 200 --batch-size 256 \
  --dtype bfloat16 >> $LOG 2>&1
echo "VCLF_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r5h_lab/psummary/vclf-bce --out artifacts/hetro-vclf \
  --predictor --note "round-3 hetro validity classifier (BCE, salvaged 8.8k labeled set, 76.8% valid)" >> $LOG 2>&1
commit_artifact artifacts/hetro-vclf "Artifact: hetro validity classifier (round-3)"

# ---------------- stage H2: hetro EDM continuation + low-t ft ----------------
timeout 4500 python scripts/longrun_tpu.py --root runs/r5h --dataset hetro \
  --molecules 16000 --max-hours 1.0 --ema 0.9999 --round-epochs 50 \
  >> runs/r5h_driver.log 2>&1
echo "HETRO_CONT DONE $(date)" >> $LOG
timeout 4200 python scripts/longrun_tpu.py --root runs/r5h --dataset hetro \
  --molecules 16000 --max-hours 0.8 --lr 1e-4 --ema 0.9999 --round-epochs 25 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 \
  >> runs/r5h_driver.log 2>&1
echo "HETRO_FT DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r5h/summary/longrun-edm --out artifacts/hetro-edm \
  --note "round-3 hetro EDM: 16k synthetic, ema 0.9999 warmup-capped, + continuation + low-t fine-tune (lr 1e-4, t_bias 0.5/0.1)" >> $LOG 2>&1
commit_artifact artifacts/hetro-edm "Artifact: hetro EDM (round-3, continuation + low-t fine-tune)"

# ---------------- stage HE: hetro evals ----------------
EXPH=runs/r5h/summary/longrun-edm
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  > runs/r5h_eval_raw2.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  > runs/r5h_eval_polish2.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --guide-predictor-dir artifacts/hetro-vclf \
  --guide-target max:VALID --guide-scale 1.0 --guide-t-window 0.25 \
  --guide-prob > runs/r5h_eval_vclf2.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --reject 3 --reject-criterion valid \
  > runs/r5h_eval_reject2.log 2>&1
echo "HETRO_EVALS DONE $(date)" >> $LOG

# ---------------- stage R: peri (salvaged csv already present) ----------------
timeout 7200 python scripts/longrun_tpu.py --root runs/r5p --dataset peri \
  --molecules 10216 --max-hours 1.5 --ema 0.9999 --round-epochs 50 \
  >> runs/r5p_driver.log 2>&1
echo "PERI_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r5p/summary/longrun-edm --out artifacts/peri-edm \
  --note "round-3 peri EDM: 10.2k synthetic (salvaged), ema 0.9999 warmup-capped" >> $LOG 2>&1
commit_artifact artifacts/peri-edm "Artifact: peri EDM (round-3 retrain)"

# ---------------- stage RE: peri evals ----------------
EXPP=runs/r5p/summary/longrun-edm
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPP --n-samples 512 --batch-size 512 --plots 0 \
  > runs/r5p_eval_raw.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  > runs/r5p_eval_polish.log 2>&1
timeout 4800 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --reject 4 --reject-criterion valid \
  > runs/r5p_eval_reject.log 2>&1
echo "PERI_EVALS DONE $(date)" >> $LOG
echo "r5_fix done $(date)" >> $LOG
rmdir /tmp/r5_fix.lock
