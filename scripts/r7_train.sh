#!/bin/bash
# Round-4 TPU training chain, take 2 (replaces the CE/HM/PF tail of
# scripts/r6_train.sh, whose stages P5+OPV completed and are committed).
#
# Why take 2: r6_train.sh restored weights-only artifacts at lr 3e-4 with
# a cold optimizer — amsgrad second moments restart at zero, the first
# full-lr steps are sign-like, and the restored cata EDM measurably fell
# 0.92 -> 0.32 mol_valid within 1000 steps (runs/r6ce_driver.log, killed
# at round 3 of the leg). This chain restores with --lr 1e-4 --lr-warmup
# 500 (scripts/longrun_tpu.py; tests/test_optim_warmup.py) and keeps the
# proven low-t fine-tune legs, which resume WARM from the same root's
# orbax checkpoint.
#
#   CE : cata continuation on the deduped set + low-t ft -> artifacts/cata-edm
#   HM : hetro continuation on the deduped 30k set + ft -> artifacts/hetro-edm
#   PF : peri continuation + low-t ft               -> artifacts/peri-edm
#   BW : bench warm for the driver's end-of-round bench
# Eval logs land in committed evidence/r4/; artifacts re-exported+committed.
cd /root/repo || exit 1
EV=evidence/r4
mkdir -p $EV runs
LOG=runs/r7_train.log
if ! mkdir /tmp/r7_train.lock 2>/dev/null; then
  echo "r7_train: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r7_train start $(date)" >> $LOG

commit_paths() {  # commit_paths <msg> <paths...>
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    git add "$@"
    # nothing staged -> a no-op, not a transient failure: don't retry
    git diff --cached --quiet -- "$@" && break
    git commit -q -m "$msg" -- "$@" && break
    sleep 20
  done
}

wait_marker() {  # wait_marker <log> <marker> <max_iters>
  local f=$1 m=$2 n=$3
  for i in $(seq 1 "$n"); do
    grep -q "$m" "$f" 2>/dev/null && return 0
    sleep 60
  done
  echo "TIMEOUT waiting for $m in $f $(date)" >> $LOG
  return 1
}

tpu_probe() {
  for i in $(seq 1 30); do
    if timeout 240 python - <<'PY' > /tmp/tpu_probe_r7t.log 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))
PY
    then echo "TPU up $(date) (attempt $i)" >> $LOG; return 0; fi
    sleep 180
  done
  echo "TPU never came up $(date)" >> $LOG
  return 1
}

tpu_probe

# ---------------- stage CE: cata continuation on deduped data ------------
rm -rf runs/r6c/summary   # r6 leg's damaged checkpoint, if present
timeout 4500 python scripts/longrun_tpu.py --root runs/r6c --dataset cata \
  --molecules 16000 --restore artifacts/cata-edm \
  --max-hours 0.8 --lr 1e-4 --lr-warmup 500 --ema 0.9999 --round-epochs 20 \
  > runs/r7ce_driver.log 2>&1
timeout 2400 python scripts/longrun_tpu.py --root runs/r6c --dataset cata \
  --molecules 16000 --max-hours 0.35 --lr 1e-4 --ema 0.9999 --round-epochs 10 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 \
  >> runs/r7ce_driver.log 2>&1
echo "CE_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r6c/summary/longrun-edm --out artifacts/cata-edm \
  --note "round-4 cata EDM: continuation of the step-261k artifact on the identity-deduped 12.6k set (every train row a distinct chemical identity; artifacts/data/r6c_cata.tgz) at lr 1e-4 + 500-step warmup, + low-t fine-tune" >> $LOG 2>&1
commit_paths "Artifact: cata EDM round-4 continuation (identity-deduped data)" artifacts/cata-edm
CEXP=runs/r6c/summary/longrun-edm
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $CEXP --n-samples 1024 --batch-size 512 --plots 0 \
  > $EV/ce_eval_raw.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $CEXP --n-samples 1024 --batch-size 512 --plots 0 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  > $EV/ce_eval_polish.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $CEXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  --reject 2 --reject-criterion both \
  > $EV/ce_eval_reject.log 2>&1
echo "CE_EVALS DONE $(date)" >> $LOG
commit_paths "Evidence: cata round-4 continuation evals" \
  $EV/ce_eval_raw.log $EV/ce_eval_polish.log $EV/ce_eval_reject.log

# ---------------- stage HM: hetro continuation on deduped 30k ------------
tpu_probe
timeout 6000 python scripts/longrun_tpu.py --root runs/r6h --dataset hetro \
  --molecules 30000 --restore artifacts/hetro-edm \
  --max-hours 1.2 --lr 1e-4 --lr-warmup 500 --ema 0.9999 --round-epochs 15 \
  > runs/r7hm_driver.log 2>&1
timeout 3000 python scripts/longrun_tpu.py --root runs/r6h --dataset hetro \
  --molecules 30000 --max-hours 0.5 --lr 1e-4 --ema 0.9999 --round-epochs 6 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 \
  >> runs/r7hm_driver.log 2>&1
echo "HM_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r6h/summary/longrun-edm --out artifacts/hetro-edm \
  --note "round-4 hetro EDM: continuation of the step-316k artifact on a single identity-deduped 30k set (artifacts/data/r6h_hetro.tgz; replaces round-3's merged 16k+6.7k+16k plan) at lr 1e-4 + 500-step warmup, + low-t fine-tune" >> $LOG 2>&1
commit_paths "Artifact: hetro EDM round-4 continuation (deduped 30k set)" artifacts/hetro-edm
HEXP=runs/r6h/summary/longrun-edm
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $HEXP --n-samples 512 --batch-size 512 --plots 0 \
  > $EV/hm_eval_raw.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $HEXP --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  > $EV/hm_eval_polish.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $HEXP --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --reject 3 --reject-criterion valid \
  > $EV/hm_eval_reject.log 2>&1
echo "HM_EVALS DONE $(date)" >> $LOG
commit_paths "Evidence: hetro round-4 continuation evals (deduped 30k)" \
  $EV/hm_eval_raw.log $EV/hm_eval_polish.log $EV/hm_eval_reject.log

# ---------------- stage PF: peri continuation ----------------------------
PF_OK=1
wait_marker runs/r6_datagen.log "PERI16K DONE" 90 || PF_OK=0
[ -f runs/r6p/peri.csv ] || PF_OK=0
if [ "$PF_OK" = 1 ]; then
tpu_probe
timeout 3600 python scripts/longrun_tpu.py --root runs/r6p --dataset peri \
  --molecules 16000 --restore artifacts/peri-edm \
  --max-hours 0.6 --lr 1e-4 --lr-warmup 500 --ema 0.9999 --round-epochs 15 \
  > runs/r7pf_driver.log 2>&1
timeout 2400 python scripts/longrun_tpu.py --root runs/r6p --dataset peri \
  --molecules 16000 --max-hours 0.35 --lr 1e-4 --ema 0.9999 --round-epochs 8 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 \
  >> runs/r7pf_driver.log 2>&1
echo "PF_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r6p/summary/longrun-edm --out artifacts/peri-edm \
  --note "round-4 peri EDM: continuation of the step-176k artifact on the identity-deduped set at lr 1e-4 + 500-step warmup, + low-t fine-tune" >> $LOG 2>&1
commit_paths "Artifact: peri EDM round-4 continuation + low-t fine-tune" artifacts/peri-edm
PEXP=runs/r6p/summary/longrun-edm
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  > $EV/pf_eval_raw.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  > $EV/pf_eval_polish.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --reject 3 --reject-criterion valid \
  > $EV/pf_eval_reject.log 2>&1
echo "PF_EVALS DONE $(date)" >> $LOG
commit_paths "Evidence: peri round-4 continuation evals" \
  $EV/pf_eval_raw.log $EV/pf_eval_polish.log $EV/pf_eval_reject.log
else
  echo "PF SKIPPED (no data) $(date)" >> $LOG
fi

# ---------------- stage BW: bench warm (production pipeline) -------------
tpu_probe
timeout 4800 python bench.py > runs/bench_warm_r4.json 2>runs/bench_warm_r4.err
cp -f runs/bench_warm_r4.json $EV/bench_warm_r4.json 2>/dev/null
echo "BENCH_WARM $(date): $(cat runs/bench_warm_r4.json)" >> $LOG
commit_paths "Evidence: round-4 bench warm (production polish pipeline)" $EV/bench_warm_r4.json
echo "r7_train done $(date)" >> $LOG
rmdir /tmp/r7_train.lock
