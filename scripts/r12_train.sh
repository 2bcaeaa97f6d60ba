#!/bin/bash
# Round-5 RESTART chain (the 13:07 VM recycle killed r10/r11 mid-flight;
# runs/ was lost — datasets were already committed to artifacts/data).
#
# Changes vs r10: the from-scratch cata leg on the 45% deduped split was
# learning ~7x slower than round-3's curve (mol_valid 0.057 @ 32k steps;
# evidence/r5/cata_quality.jsonl) — uniform sampling over the deduped
# identity space weights the ~80% hard fjord/helicene shapes heavily.
# This leg adds planarity-weighted sampling (--planar-boost, the
# "duplicate-weighted sampling" lever VERDICT r4 #1 named) to recover the
# easy-planar weighting dedup removed, with the holdout untouched.
#
# TPU stages are strictly serial (two concurrent TPU clients once killed
# the axon tunnel). Order puts guaranteed-value stages (OPV levers on the
# round-4 artifacts) right after the cata leg.
cd /root/repo || exit 1
LOG=runs/r12_train.log
EV=evidence/r5
mkdir -p runs $EV
if ! mkdir /tmp/r12_train.lock 2>/dev/null; then
  echo "r12_train: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r12_train start $(date)" >> $LOG

commit_paths() {  # commit_paths <msg> <paths...>
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    git add "$@"
    git diff --cached --quiet -- "$@" && break   # nothing staged -> done
    git commit -q -m "$msg" -- "$@" && break
    sleep 20
  done
}

# ---------- stage A1: cata from-scratch main leg (weighted sampling) ----
if [ ! -f runs/r9cs/A1.done ]; then
  timeout 7200 python scripts/longrun_tpu.py --root runs/r9cs --dataset cata \
    --max-hours 1.55 --batch-size 256 --lr 1e-3 --ema 0.9999 --seed 20 \
    --planar-boost 0.9 --planar-tau 0.06 \
    --n-samples 256 --round-epochs 60 >> runs/r12_cata_driver.log 2>&1
  touch runs/r9cs/A1.done
fi
echo "A1_MAIN DONE $(date)" >> $LOG

# ---------- stage A2: cata low-t fine-tune ------------------------------
if [ ! -f runs/r9cs/A2.done ]; then
  timeout 3600 python scripts/longrun_tpu.py --root runs/r9cs --dataset cata \
    --max-hours 0.45 --batch-size 256 --lr 1e-4 --ema 0.9999 --seed 20 \
    --planar-boost 0.9 --planar-tau 0.06 \
    --t-bias-frac 0.5 --t-bias-cap 0.1 \
    --n-samples 256 --round-epochs 60 >> runs/r12_cata_driver.log 2>&1
  touch runs/r9cs/A2.done
fi
echo "A2_FT DONE $(date)" >> $LOG

# export gated on probe health; gate failure does NOT kill the chain
python - >> $LOG 2>&1 <<'PY'
import json, subprocess, sys
last = json.loads(open("runs/r9cs/quality.jsonl").read().splitlines()[-1])
print("cata final probe:", last, flush=True)
if last["mol_valid"] < 0.4:
    sys.exit("cata export GATED OFF: final probe mol_valid %.3f" % last["mol_valid"])
subprocess.run([sys.executable, "-m", "gaudi_tpu.cli.export_params",
                "--exp-dir", "runs/r9cs/summary/longrun-edm",
                "--out", "artifacts/cata-edm-r5"], check=True)
print("cata-edm-r5 exported", flush=True)
PY
[ -d artifacts/cata-edm-r5 ] && commit_paths "Round-5 cata EDM artifact: from-scratch, planarity-weighted sampling on holdout-split data" artifacts/cata-edm-r5
cp runs/r9cs/quality.jsonl $EV/cata_quality_r12.jsonl 2>/dev/null
commit_paths "Evidence: round-5 restarted cata training curve (weighted sampling)" $EV/cata_quality_r12.jsonl
echo "A3_EXPORT DONE $(date)" >> $LOG

# ---------- stage OPV: scale-0.6 combo with round-5 levers --------------
# Round-4 artifacts for comparability with the 63.3% scale-0.6 baseline.
OPV="--edm-dir artifacts/cata-edm --predictor-dir artifacts/cata-predictor5
  --batch-size 512 --n-nodes 10 --target 1*aIP_eV+1*aEA_eV+3*GAP_eV
  --polish 5 --polish-t 0.15 --polish-noise 0.3
  --polish-guide planarity --polish-guide-scale 100 --out-dir runs/r5best"
if [ ! -f $EV/opv_s06_both.log ]; then
  timeout 3000 python -m gaudi_tpu.cli.generate $OPV --scale 0.6 \
    --grad-norm-per-property --anneal cos2:0.1 > $EV/opv_s06_both.log 2>&1
fi
echo "OPV_BOTH DONE $(date)" >> $LOG
commit_paths "Evidence: OPV scale 0.6 + per-property grad norm + cos2 annealing" $EV/opv_s06_both.log
if [ ! -f $EV/opv_s06_gnorm.log ]; then
  timeout 3000 python -m gaudi_tpu.cli.generate $OPV --scale 0.6 \
    --grad-norm-per-property > $EV/opv_s06_gnorm.log 2>&1
fi
echo "OPV_GNORM DONE $(date)" >> $LOG
commit_paths "Evidence: OPV scale 0.6 + per-property grad normalization" $EV/opv_s06_gnorm.log

# ---------- stage CA: cata r5 evals + novelty-vs-holdout ----------------
CEXP=runs/r9cs/summary/longrun-edm
HOLD=runs/r9cs/cata_holdout.csv
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $CEXP --n-samples 1024 --batch-size 512 --plots 0 \
  --novelty --holdout-csv $HOLD \
  > $EV/r5c_eval_raw.log 2>&1
echo "CA_RAW DONE $(date)" >> $LOG
commit_paths "Evidence: cata round-5 raw eval + novelty-vs-holdout" $EV/r5c_eval_raw.log
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $CEXP --n-samples 1024 --batch-size 512 --plots 0 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  --novelty --holdout-csv $HOLD \
  > $EV/r5c_eval_polish.log 2>&1
echo "CA_POLISH DONE $(date)" >> $LOG
commit_paths "Evidence: cata round-5 polish eval + novelty-vs-holdout" $EV/r5c_eval_polish.log
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $CEXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  --reject 2 --reject-criterion both \
  > $EV/r5c_eval_reject.log 2>&1
echo "CA_EVALS DONE $(date)" >> $LOG
commit_paths "Evidence: cata round-5 reject eval" $EV/r5c_eval_reject.log

# ---------- stage B: peri (gated on datagen landing in time) ------------
if grep -q "PERI_R9 DONE" runs/r9_datagen.log 2>/dev/null; then
  tar czf artifacts/data/r9_peri.tgz -C runs r9p/peri.csv r9p/peri-xyz \
    && commit_paths "Round-5 peri dataset: small-amplitude deduped set" artifacts/data/r9_peri.tgz
  if [ ! -f runs/r9p/B1.done ]; then
    timeout 4500 python scripts/longrun_tpu.py --root runs/r9p --dataset peri \
      --max-hours 0.8 --batch-size 256 --lr 1e-4 --lr-warmup 500 --ema 0.9999 \
      --seed 21 --restore artifacts/peri-edm --planar-boost 0.6 --planar-tau 0.1 \
      --n-samples 256 --round-epochs 60 >> runs/r12_peri_driver.log 2>&1
    touch runs/r9p/B1.done
  fi
  echo "B1_MAIN DONE $(date)" >> $LOG
  if [ ! -f runs/r9p/B2.done ]; then
    timeout 2400 python scripts/longrun_tpu.py --root runs/r9p --dataset peri \
      --max-hours 0.35 --batch-size 256 --lr 5e-5 --ema 0.9999 --seed 21 \
      --planar-boost 0.6 --planar-tau 0.1 \
      --t-bias-frac 0.5 --t-bias-cap 0.1 \
      --n-samples 256 --round-epochs 60 >> runs/r12_peri_driver.log 2>&1
    touch runs/r9p/B2.done
  fi
  echo "B2_FT DONE $(date)" >> $LOG
  python - >> $LOG 2>&1 <<'PY'
import json, subprocess, sys
last = json.loads(open("runs/r9p/quality.jsonl").read().splitlines()[-1])
print("peri final probe:", last, flush=True)
if last["mol_valid"] < 0.30:
    sys.exit("peri export GATED OFF: final probe mol_valid %.3f" % last["mol_valid"])
subprocess.run([sys.executable, "-m", "gaudi_tpu.cli.export_params",
                "--exp-dir", "runs/r9p/summary/longrun-edm",
                "--out", "artifacts/peri-edm-r5"], check=True)
print("peri-edm-r5 exported", flush=True)
PY
  [ -d artifacts/peri-edm-r5 ] && commit_paths "Round-5 peri EDM artifact: continuation on small-amplitude data" artifacts/peri-edm-r5
  cp runs/r9p/quality.jsonl $EV/peri_quality_r12.jsonl 2>/dev/null
  commit_paths "Evidence: round-5 peri training curve" $EV/peri_quality_r12.jsonl
  PEXP=runs/r9p/summary/longrun-edm
else
  echo "B: peri datagen not done — evaluating the round-4 artifact instead $(date)" >> $LOG
  PEXP=artifacts/peri-edm
fi
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  > $EV/r5p_eval_raw.log 2>&1
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  > $EV/r5p_eval_polish.log 2>&1
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --reject 3 --reject-criterion valid \
  > $EV/r5p_eval_reject.log 2>&1
echo "PA_EVALS DONE $(date)" >> $LOG
commit_paths "Evidence: peri round-5 evals" \
  $EV/r5p_eval_raw.log $EV/r5p_eval_polish.log $EV/r5p_eval_reject.log

# ---------- stage CTL: matched-config JAX run ---------------------------
REFSTEPS=$(python - <<'PY'
import json
try:
    recs = [json.loads(l) for l in open("runs/refctl/quality.jsonl")]
    print(max(r["step"] for r in recs))
except Exception:
    print(0)
PY
)
echo "CTL: matching reference steps=$REFSTEPS" >> $LOG
if [ "$REFSTEPS" -gt 500 ]; then
  mkdir -p runs/ctl_jax
  [ -e runs/ctl_jax/cata.csv ] || cp runs/r9cs/cata.csv runs/ctl_jax/cata.csv
  [ -e runs/ctl_jax/cata-xyz ] || ln -s "$(pwd)/runs/r9c/cata-xyz" runs/ctl_jax/cata-xyz
  EPR=$(( REFSTEPS / 720 )); [ "$EPR" -lt 1 ] && EPR=1
  timeout 4200 python scripts/longrun_tpu.py --root runs/ctl_jax \
    --dataset cata --batch-size 64 --lr 1e-3 --ema 0 --dtype float32 \
    --nf 96 --n-layers 4 --seed 0 --max-hours 0.9 \
    --n-samples 256 --round-epochs $EPR --max-rounds 10 \
    > runs/ctl_jax/driver.log 2>&1
  cp runs/ctl_jax/quality.jsonl $EV/ctl_jax_quality.jsonl 2>/dev/null
  cp runs/refctl/quality.jsonl $EV/ctl_ref_quality.jsonl 2>/dev/null
  commit_paths "Evidence: matched-config control (reference torch vs this framework, same data/steps)" \
    $EV/ctl_jax_quality.jsonl $EV/ctl_ref_quality.jsonl
fi
echo "CTL DONE $(date)" >> $LOG

# ---------- stage BW: bench warm + MFU experiments ----------------------
timeout 3600 python bench.py > runs/bench_warm_r5.json 2>runs/bench_warm_r5.err
cp -f runs/bench_warm_r5.json $EV/bench_warm_r5.json 2>/dev/null
echo "BENCH_WARM $(date): $(cat runs/bench_warm_r5.json)" >> $LOG
commit_paths "Evidence: round-5 bench warm" $EV/bench_warm_r5.json
for exp in "UNROLL=2" "UNROLL=4" "REMAT=1"; do
  k="GAUDI_BENCH_${exp%%=*}"; v="${exp##*=}"
  env $k=$v GAUDI_BENCH_POLISH=0 timeout 2400 python bench.py \
    > runs/bench_${exp%%=*}_$v.json 2>/dev/null
  echo "BENCH_$exp $(date): $(cat runs/bench_${exp%%=*}_$v.json)" >> $LOG
done
GAUDI_BENCH_POLISH=0 timeout 2400 python bench.py > runs/bench_base_nopolish.json 2>/dev/null
echo "BENCH_BASE $(date): $(cat runs/bench_base_nopolish.json)" >> $LOG
cp -f runs/bench_UNROLL_2.json runs/bench_UNROLL_4.json runs/bench_REMAT_1.json \
  runs/bench_base_nopolish.json $EV/ 2>/dev/null
commit_paths "Evidence: round-5 MFU experiments (scan unroll, predictor remat)" \
  $EV/bench_UNROLL_2.json $EV/bench_UNROLL_4.json $EV/bench_REMAT_1.json \
  $EV/bench_base_nopolish.json
echo "R12 ALL DONE $(date)" >> $LOG
rmdir /tmp/r12_train.lock
