#!/bin/bash
# Round-3 stage 3 (chains on r5_confirm_cata.sh): cata predictor + guided
# design end-to-end + trained-weights bench, then hetro (EDM + validity
# classifier + confirmation evals), then peri. Each training stage ends in
# a committed self-contained artifact (VERDICT r2 next-steps #1/#4/#5/#6).
cd /root/repo || exit 1
LOG=runs/r5_rest.log
# single-instance guard: the 09:12 instance (pid 14676) is the authoritative
# run this round; a chained duplicate invocation must exit immediately.
if kill -0 14676 2>/dev/null; then
  echo "r5_rest: original instance (pid 14676) still running; duplicate exits $(date)" >> $LOG
  exit 0
fi
if ! mkdir /tmp/r5_rest.lock 2>/dev/null; then
  echo "r5_rest: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r5_rest start $(date)" >> $LOG

commit_artifact () {  # commit_artifact <dir> <msg>
  for i in 1 2 3 4 5; do
    if git add "$1" && git commit -q -m "$2

No-Verification-Needed: committed binary artifact + provenance note only" -- "$1"; then
      return 0
    fi
    sleep 20
  done
}

# ---------------- stage P: cata predictor + flagship design ----------------
timeout 3600 python -m gaudi_tpu.cli.train_predictor \
  --dataset cata --data-root runs/r4 --max-nodes 11 \
  --target-features GAP_eV,HOMO_eV --name cata-pred --save-dir runs/r4/psummary \
  --epochs 300 --batch-size 256 --dtype bfloat16 >> $LOG 2>&1
echo "PRED_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r4/psummary/cata-pred --out artifacts/cata-predictor \
  --predictor --note "round-3 cata predictor (GAP_eV,HOMO_eV), 300 epochs" >> $LOG 2>&1
commit_artifact artifacts/cata-predictor "Artifact: cata property predictor (round-3)"
timeout 1800 python -m gaudi_tpu.cli.eval_predictor \
  --exp-dir runs/r4/psummary/cata-pred --n-levels 11 \
  > runs/r4/pred_eval.log 2>&1
# flagship guided design end-to-end on the committed artifacts
timeout 3600 python -m gaudi_tpu.cli.generate \
  --edm-dir artifacts/cata-edm --predictor-dir artifacts/cata-predictor \
  --batch-size 512 --scale 0.6 --n-nodes 10 --target max:GAP_eV \
  --out-dir runs/r4/design > runs/r4/design.log 2>&1
echo "DESIGN DONE $(date)" >> $LOG
# trained-weights end-to-end bench (loads artifacts/cata-{edm,predictor})
timeout 4800 python bench.py > runs/bench_trained.json 2>runs/bench_trained.err
echo "BENCH_TRAINED $(date): $(cat runs/bench_trained.json)" >> $LOG

# ---------------- stage H: hetro ----------------
if [ ! -f runs/r5h/hetro.csv ]; then
  timeout 3600 python - <<'PY' >> $LOG 2>&1
from gaudi_tpu.data.synthetic import generate_dataset
generate_dataset('runs/r5h', 'hetro', n_molecules=16000, seed=0)
PY
fi
if [ ! -f runs/r5h_lab/hetro.csv ]; then
  timeout 3600 python - <<'PY' >> $LOG 2>&1
from gaudi_tpu.data.synthetic import generate_dataset
generate_dataset('runs/r5h_lab', 'hetro', n_molecules=16000, seed=1, labeled=True)
PY
fi
echo "HETRO DATA DONE $(date)" >> $LOG

timeout 7200 python scripts/longrun_tpu.py --root runs/r5h --dataset hetro \
  --molecules 16000 --max-hours 1.5 --ema 0.9999 --round-epochs 50 \
  >> runs/r5h_driver.log 2>&1
echo "HETRO_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r5h/summary/longrun-edm --out artifacts/hetro-edm \
  --note "round-3 hetro EDM: 16k synthetic, ema 0.9999, post EMA fix" >> $LOG 2>&1
commit_artifact artifacts/hetro-edm "Artifact: hetro EDM (round-3 retrain)"

timeout 3600 python -m gaudi_tpu.cli.train_predictor \
  --dataset hetro --data-root runs/r5h_lab --max-nodes 10 \
  --target-features VALID --loss bce --name vclf-bce \
  --save-dir runs/r5h_lab/psummary --epochs 200 --batch-size 256 \
  --dtype bfloat16 >> $LOG 2>&1
echo "VCLF_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r5h_lab/psummary/vclf-bce --out artifacts/hetro-vclf \
  --predictor --note "round-3 hetro validity classifier (BCE, labeled data)" >> $LOG 2>&1
commit_artifact artifacts/hetro-vclf "Artifact: hetro validity classifier (round-3)"

EXPH=runs/r5h/summary/longrun-edm
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  > runs/r5h_eval_raw.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  > runs/r5h_eval_polish.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --guide-predictor-dir artifacts/hetro-vclf \
  --guide-target max:VALID --guide-scale 1.0 --guide-t-window 0.25 \
  --guide-prob > runs/r5h_eval_vclf.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --reject 3 --reject-criterion valid \
  > runs/r5h_eval_reject.log 2>&1
echo "HETRO_EVALS DONE $(date)" >> $LOG

# ---------------- stage R: peri ----------------
if [ ! -f runs/r5p/peri.csv ]; then
  timeout 3600 python - <<'PY' >> $LOG 2>&1
from gaudi_tpu.data.synthetic import generate_dataset
generate_dataset('runs/r5p', 'peri', n_molecules=16000, seed=0)
PY
fi
timeout 7200 python scripts/longrun_tpu.py --root runs/r5p --dataset peri \
  --molecules 16000 --max-hours 1.5 --ema 0.9999 --round-epochs 50 \
  >> runs/r5p_driver.log 2>&1
echo "PERI_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r5p/summary/longrun-edm --out artifacts/peri-edm \
  --note "round-3 peri EDM: 16k synthetic, ema 0.9999, post EMA fix" >> $LOG 2>&1
commit_artifact artifacts/peri-edm "Artifact: peri EDM (round-3 retrain)"

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
echo "r5_rest done $(date)" >> $LOG
