#!/bin/bash
# Round-5 final TPU phase (manual takeover after r12's CA stage): the
# scripted stage-B budgets (0.8h+0.35h peri legs + 3 evals + CTL + bench)
# no longer fit the remaining wall-clock, so this compresses: one
# polish-only OPV run (isolating the round-4 lever regression), a single
# combined peri continuation leg, two peri evals, the matched-config
# control, and the MFU bench experiments.
cd /root/repo || exit 1
LOG=runs/r13_manual.log
EV=evidence/r5
mkdir -p runs $EV
echo "r13 start $(date)" >> $LOG

commit_paths() {
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    git add "$@"
    git diff --cached --quiet -- "$@" && break
    git commit -q -m "$msg" -- "$@" && break
    sleep 20
  done
}

# ---------- OPV scale-0.6, polish only (no guidance levers) -------------
# Round-4 baseline (design_opv.log) is scale 0.6 with NO polish: 63.3%.
# The r5 lever runs measured 36.7% (anneal+gnorm) and 13.1% (gnorm) WITH
# polish — i.e. the levers hurt. This isolates polish alone at the
# reference's scale.
if [ ! -f $EV/opv_s06_polish.log ]; then
  timeout 1800 python -m gaudi_tpu.cli.generate \
    --edm-dir artifacts/cata-edm --predictor-dir artifacts/cata-predictor5 \
    --batch-size 512 --n-nodes 10 --target "1*aIP_eV+1*aEA_eV+3*GAP_eV" \
    --scale 0.6 --polish 5 --polish-t 0.15 --polish-noise 0.3 \
    --polish-guide planarity --polish-guide-scale 100 \
    --out-dir runs/r5best > $EV/opv_s06_polish.log 2>&1
fi
echo "OPV_POLISH DONE $(date)" >> $LOG
commit_paths "Evidence: OPV scale 0.6 with polish only (lever-free)" $EV/opv_s06_polish.log

# ---------- peri: single combined continuation leg ----------------------
if [ ! -f runs/r9p/B.done ]; then
  timeout 2700 python scripts/longrun_tpu.py --root runs/r9p --dataset peri \
    --max-hours 0.5 --batch-size 256 --lr 1e-4 --lr-warmup 500 --ema 0.9999 \
    --seed 21 --restore artifacts/peri-edm --planar-boost 0.6 --planar-tau 0.1 \
    --t-bias-frac 0.3 --t-bias-cap 0.1 \
    --n-samples 256 --round-epochs 60 >> runs/r13_peri_driver.log 2>&1
  touch runs/r9p/B.done
fi
echo "B_PERI DONE $(date)" >> $LOG
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
[ -d artifacts/peri-edm-r5 ] && commit_paths "Round-5 peri EDM artifact: continuation on salvaged small-amplitude data" artifacts/peri-edm-r5
cp runs/r9p/quality.jsonl $EV/peri_quality_r13.jsonl 2>/dev/null
commit_paths "Evidence: round-5 peri training curve" $EV/peri_quality_r13.jsonl

if [ -d artifacts/peri-edm-r5 ]; then PEXP=runs/r9p/summary/longrun-edm; else PEXP=artifacts/peri-edm; fi
timeout 1800 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  > $EV/r5p_eval_raw.log 2>&1
echo "P_RAW DONE $(date)" >> $LOG
commit_paths "Evidence: peri round-5 raw eval" $EV/r5p_eval_raw.log
timeout 1800 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $PEXP --n-samples 512 --batch-size 512 --plots 0 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --reject 2 --reject-criterion valid \
  > $EV/r5p_eval_polish_reject.log 2>&1
echo "P_POLISH DONE $(date)" >> $LOG
commit_paths "Evidence: peri round-5 polish+reject eval" $EV/r5p_eval_polish_reject.log

# ---------- CTL: matched-config JAX run on TPU --------------------------
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
if [ "$REFSTEPS" -gt 500 ] && [ ! -f $EV/ctl_jax_quality.jsonl ]; then
  mkdir -p runs/ctl_jax
  [ -e runs/ctl_jax/cata.csv ] || cp runs/r9cs/cata.csv runs/ctl_jax/cata.csv
  [ -e runs/ctl_jax/cata-xyz ] || ln -s "$(pwd)/runs/r9c/cata-xyz" runs/ctl_jax/cata-xyz
  EPR=$(( REFSTEPS / 720 )); [ "$EPR" -lt 1 ] && EPR=1
  timeout 2400 python scripts/longrun_tpu.py --root runs/ctl_jax \
    --dataset cata --batch-size 64 --lr 1e-3 --ema 0 --dtype float32 \
    --nf 96 --n-layers 4 --seed 0 --max-hours 0.35 \
    --n-samples 128 --round-epochs $EPR --max-rounds 10 \
    > runs/ctl_jax/driver.log 2>&1
  cp runs/ctl_jax/quality.jsonl $EV/ctl_jax_quality.jsonl 2>/dev/null
  cp runs/refctl/quality.jsonl $EV/ctl_ref_quality.jsonl 2>/dev/null
  commit_paths "Evidence: matched-config control (reference torch vs this framework, same data/steps)" \
    $EV/ctl_jax_quality.jsonl $EV/ctl_ref_quality.jsonl
fi
echo "CTL DONE $(date)" >> $LOG

# ---------- bench MFU experiments ---------------------------------------
GAUDI_BENCH_POLISH=0 timeout 2400 python bench.py > runs/bench_base_nopolish.json 2>/dev/null
echo "BENCH_BASE $(date): $(cat runs/bench_base_nopolish.json)" >> $LOG
GAUDI_BENCH_UNROLL=4 GAUDI_BENCH_POLISH=0 timeout 2400 python bench.py \
  > runs/bench_UNROLL_4.json 2>/dev/null
echo "BENCH_UNROLL4 $(date): $(cat runs/bench_UNROLL_4.json)" >> $LOG
cp -f runs/bench_base_nopolish.json runs/bench_UNROLL_4.json $EV/ 2>/dev/null
commit_paths "Evidence: round-5 MFU experiment (scan unroll vs base, no-polish bench)" \
  $EV/bench_base_nopolish.json $EV/bench_UNROLL_4.json
echo "R13 ALL DONE $(date)" >> $LOG
