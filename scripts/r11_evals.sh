#!/bin/bash
# Round-5 eval chain — strictly serial after the r10 training chain (two
# concurrent TPU clients once killed the axon tunnel; QUALITY.md round-2
# ops note). Stages:
#   CA : cata r5 evals (raw / polish / reject) + novelty-vs-holdout
#   PA : peri r5 evals (raw / polish / reject)
#   OPV: scale-0.6 OPV combo with the round-5 guidance levers
#        (t-annealing, per-property grad normalization) on the ROUND-4
#        artifacts for comparability with the 63.3% baseline
#   CTL: matched-config JAX run (4x96, the ref_control config) on the
#        same data for the reference-on-synthetic comparison
#   BW : bench warm + measured MFU experiments (unroll / remat)
cd /root/repo || exit 1
LOG=runs/r11_evals.log
EV=evidence/r5
mkdir -p runs $EV
if ! mkdir /tmp/r11_evals.lock 2>/dev/null; then
  echo "r11_evals: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r11_evals start $(date)" >> $LOG

commit_paths() {
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    git add "$@"
    git diff --cached --quiet -- "$@" && break
    git commit -q -m "$msg" -- "$@" && break
    sleep 20
  done
}

wait_marker() {
  local f=$1 m=$2 n=$3
  for i in $(seq 1 "$n"); do
    grep -q "$m" "$f" 2>/dev/null && return 0
    sleep 60
  done
  echo "TIMEOUT waiting for $m in $f $(date)" >> $LOG
  return 1
}

wait_marker runs/r10_train.log "R10 ALL DONE" 480 || exit 1

# ---------------- stage CA: cata r5 evals --------------------------------
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
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $CEXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  --reject 2 --reject-criterion both \
  > $EV/r5c_eval_reject.log 2>&1
echo "CA_EVALS DONE $(date)" >> $LOG
commit_paths "Evidence: cata round-5 reject eval" $EV/r5c_eval_reject.log

# ---------------- stage PA: peri r5 evals --------------------------------
if [ -d runs/r9p/summary/longrun-edm/model ]; then PEXP=runs/r9p/summary/longrun-edm; else PEXP=artifacts/peri-edm; fi
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  > $EV/r5p_eval_raw.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  > $EV/r5p_eval_polish.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --reject 3 --reject-criterion valid \
  > $EV/r5p_eval_reject.log 2>&1
echo "PA_EVALS DONE $(date)" >> $LOG
commit_paths "Evidence: peri round-5 evals" \
  $EV/r5p_eval_raw.log $EV/r5p_eval_polish.log $EV/r5p_eval_reject.log

# ---------------- stage OPV: scale-0.6 combo with round-5 levers ---------
# Round-4 artifacts for comparability with the 63.3% scale-0.6 baseline
OPV="--edm-dir artifacts/cata-edm --predictor-dir artifacts/cata-predictor5
  --batch-size 512 --n-nodes 10 --target 1*aIP_eV+1*aEA_eV+3*GAP_eV
  --polish 5 --polish-t 0.15 --polish-noise 0.3
  --polish-guide planarity --polish-guide-scale 100 --out-dir runs/r5best"
timeout 4800 python -m gaudi_tpu.cli.generate $OPV --scale 0.6 \
  --anneal cos2:0.1 > $EV/opv_s06_anneal.log 2>&1
echo "OPV_ANNEAL DONE $(date)" >> $LOG
commit_paths "Evidence: OPV scale 0.6 + cos2 annealing" $EV/opv_s06_anneal.log
timeout 4800 python -m gaudi_tpu.cli.generate $OPV --scale 0.6 \
  --grad-norm-per-property > $EV/opv_s06_gnorm.log 2>&1
echo "OPV_GNORM DONE $(date)" >> $LOG
commit_paths "Evidence: OPV scale 0.6 + per-property grad normalization" $EV/opv_s06_gnorm.log
timeout 4800 python -m gaudi_tpu.cli.generate $OPV --scale 0.6 \
  --grad-norm-per-property --anneal cos2:0.1 > $EV/opv_s06_both.log 2>&1
echo "OPV_BOTH DONE $(date)" >> $LOG
commit_paths "Evidence: OPV scale 0.6 + both levers" $EV/opv_s06_both.log

# ---------------- stage CTL: matched-config JAX run ----------------------
# Same config as scripts/ref_control.py (4 layers x 96, batch 64, lr 1e-3,
# no EMA, f32), same csv, step budget matched to the reference run's
# (see runs/refctl/quality.jsonl) — trains in minutes on the chip.
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
  # ~72 steps/epoch at batch 64 on the 4.5k-row train split; spread the
  # matched step budget over 10 rounds so the quality curve has points
  EPR=$(( REFSTEPS / 720 )); [ "$EPR" -lt 1 ] && EPR=1
  timeout 5400 python scripts/longrun_tpu.py --root runs/ctl_jax \
    --dataset cata --batch-size 64 --lr 1e-3 --ema 0 --dtype float32 \
    --nf 96 --n-layers 4 --seed 0 --max-hours 1.2 \
    --round-epochs $EPR --max-rounds 10 \
    > runs/ctl_jax/driver.log 2>&1
  cp runs/ctl_jax/quality.jsonl $EV/ctl_jax_quality.jsonl 2>/dev/null
  cp runs/refctl/quality.jsonl $EV/ctl_ref_quality.jsonl 2>/dev/null
  commit_paths "Evidence: matched-config control (reference torch vs this framework, same data/steps)" \
    $EV/ctl_jax_quality.jsonl $EV/ctl_ref_quality.jsonl
fi
echo "CTL DONE $(date)" >> $LOG

# ---------------- stage BW: bench warm + MFU experiments -----------------
timeout 4800 python bench.py > runs/bench_warm_r5.json 2>runs/bench_warm_r5.err
cp -f runs/bench_warm_r5.json $EV/bench_warm_r5.json 2>/dev/null
echo "BENCH_WARM $(date): $(cat runs/bench_warm_r5.json)" >> $LOG
commit_paths "Evidence: round-5 bench warm" $EV/bench_warm_r5.json
for exp in "UNROLL=2" "UNROLL=4" "REMAT=1"; do
  k="GAUDI_BENCH_${exp%%=*}"; v="${exp##*=}"
  env $k=$v GAUDI_BENCH_POLISH=0 timeout 4800 python bench.py \
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
echo "r11_evals done $(date)" >> $LOG
rmdir /tmp/r11_evals.lock
