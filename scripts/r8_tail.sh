#!/bin/bash
# Round-4 tail chain: gentle peri fine-tune + evals + bench warm.
#
# Replaces r7_train.sh's PF stage after its legA suffered a loss spike at
# round 18 (train_loss 0.117 -> 0.136, mol_valid 0.43 -> 0.0 and never
# recovered; runs/r7pf_driver.log) — the chain was killed before legB
# could export the broken state over the committed artifact. This tail
# restarts peri from the committed artifacts/peri-edm at HALF the lr
# (5e-5) with warmup, going straight to the low-t-biased fine-tune that
# helped peri in round 3, with --max-rounds bounding exposure.
cd /root/repo || exit 1
EV=evidence/r4
mkdir -p $EV runs
LOG=runs/r8_tail.log
if ! mkdir /tmp/r8_tail.lock 2>/dev/null; then
  echo "r8_tail: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r8_tail start $(date)" >> $LOG

commit_paths() {
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    git add "$@" && git commit -q -m "$msg" -- "$@" && break
    sleep 20
  done
}

tpu_probe() {
  for i in $(seq 1 20); do
    if timeout 240 python - <<'PY' > /tmp/tpu_probe_r8t.log 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))
PY
    then echo "TPU up $(date) (attempt $i)" >> $LOG; return 0; fi
    sleep 120
  done
  echo "TPU never came up $(date)" >> $LOG
  return 1
}

tpu_probe

# ---------------- stage PF2: gentle peri low-t fine-tune -----------------
timeout 2700 python scripts/longrun_tpu.py --root runs/r6p --dataset peri \
  --molecules 16000 --restore artifacts/peri-edm \
  --max-hours 0.55 --lr 5e-5 --lr-warmup 500 --ema 0.9999 --round-epochs 10 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 \
  > runs/r8pf_driver.log 2>&1
echo "PF2_TRAIN DONE $(date)" >> $LOG
# export ONLY if the final probe round still samples sanely
LASTVALID=$(grep '"round"' runs/r8pf_driver.log | tail -1 | sed 's/.*"mol_valid": \([0-9.]*\).*/\1/')
echo "PF2 last probe mol_valid=$LASTVALID" >> $LOG
if python -c "import sys; sys.exit(0 if float('$LASTVALID' or 0) >= 0.30 else 1)"; then
  timeout 1800 python -m gaudi_tpu.cli.export_params \
    --exp-dir runs/r6p/summary/longrun-edm --out artifacts/peri-edm \
    --note "round-4 peri EDM: low-t fine-tune of the step-176k artifact on the identity-deduped salvaged 11.9k set (artifacts/data/r6p_peri.tgz) at lr 5e-5 + 500-step warmup (an lr-1e-4 leg loss-spiked and was discarded; QUALITY.md round 4)" >> $LOG 2>&1
  commit_paths "Artifact: peri EDM round-4 low-t fine-tune (deduped data)" artifacts/peri-edm
  PEXP=runs/r6p/summary/longrun-edm
else
  echo "PF2 probe degraded; evaluating the committed artifact instead $(date)" >> $LOG
  PEXP=artifacts/peri-edm
fi
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  > $EV/pf_eval_raw.log 2>&1
echo "PF2_RAW DONE $(date)" >> $LOG
commit_paths "Evidence: peri round-4 raw eval" $EV/pf_eval_raw.log
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  > $EV/pf_eval_polish.log 2>&1
echo "PF2_POLISH DONE $(date)" >> $LOG
commit_paths "Evidence: peri round-4 polish eval" $EV/pf_eval_polish.log
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --reject 3 --reject-criterion valid \
  > $EV/pf_eval_reject.log 2>&1
echo "PF2_EVALS DONE $(date)" >> $LOG
commit_paths "Evidence: peri round-4 reject eval" $EV/pf_eval_reject.log

# ---------------- stage BW: bench warm (production pipeline) -------------
tpu_probe
timeout 4800 python bench.py > runs/bench_warm_r4.json 2>runs/bench_warm_r4.err
cp -f runs/bench_warm_r4.json $EV/bench_warm_r4.json 2>/dev/null
echo "BENCH_WARM $(date): $(cat runs/bench_warm_r4.json)" >> $LOG
commit_paths "Evidence: round-4 bench warm (production polish pipeline)" $EV/bench_warm_r4.json
echo "r8_tail done $(date)" >> $LOG
rmdir /tmp/r8_tail.lock
