#!/bin/bash
# Round-2 machine schedule. Waits for the running cata lr-3e-4 phase, then:
# cata lr-1e-4 phase -> predictor retrain -> hetro campaign -> peri campaign
# -> final 1k evals (raw + polish + novelty) -> guidance run -> benches.
# Each stage logs under runs/; re-runnable (longrun resumes from checkpoints).
cd /root/repo || exit 1
LOG=runs/phase_r2.log
echo "phase_r2 start $(date)" >> $LOG

# 0. wait for the current cata phase (PID passed as $1)
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "cata lr3e-4 phase done $(date)" >> $LOG

# 1. cata final phase at lr 1e-4
timeout 5400 python scripts/longrun_tpu.py --root runs/r2 --max-hours 1.0 \
  --ema 0.9999 --lr 1e-4 --round-epochs 100 >> runs/r2/driver.log 2>&1
echo "cata lr1e-4 phase done $(date)" >> $LOG

# 2. predictor retrain on the round-2 (deformed) cata data
timeout 3600 python -m gaudi_tpu.cli.train_predictor \
  --dataset cata --csv-file runs/r2/cata.csv --xyz-root runs/r2/cata-xyz \
  --save-dir runs/r2/psummary --name r2-pred --epochs 400 \
  --target-features LUMO_eV,GAP_eV,Erel_eV,aIP_eV,aEA_eV \
  > runs/r2/pred.log 2>&1
echo "predictor done $(date)" >> $LOG

# 3. hetro campaign (resumes the round-1 checkpoint on new filtered data)
timeout 7200 python scripts/longrun_tpu.py --root runs/r2h --dataset hetro \
  --molecules 30000 --max-hours 1.6 --ema 0.9999 --round-epochs 60 \
  > runs/r2h/driver.log 2>&1
echo "hetro done $(date)" >> $LOG

# 4. peri campaign (angle windows now active end to end)
timeout 6000 python scripts/longrun_tpu.py --root runs/r2p --dataset peri \
  --molecules 24000 --max-hours 1.2 --ema 0.9999 --round-epochs 60 \
  > runs/r2p/driver.log 2>&1
echo "peri done $(date)" >> $LOG

# 5. final evals: raw (reference-comparable) and polished (framework mode)
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2/summary/longrun-edm --n-samples 1024 --batch-size 512 \
  --novelty > runs/r2/eval1k_raw.log 2>&1
echo "eval raw done $(date)" >> $LOG
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2/summary/longrun-edm --n-samples 1024 --batch-size 512 \
  --polish 5 --polish-t 0.05 --novelty \
  > runs/r2/eval1k_polish.log 2>&1
echo "eval polish done $(date)" >> $LOG
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2h/summary/longrun-edm --n-samples 512 --batch-size 512 \
  > runs/r2h/eval.log 2>&1
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2p/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --polish 5 --polish-t 0.05 > runs/r2p/eval.log 2>&1
echo "hetro/peri evals done $(date)" >> $LOG

# 6. guided design with the retrained predictor (+ polish)
timeout 3600 python -m gaudi_tpu.cli.generate \
  --edm-dir runs/r2/summary/longrun-edm --predictor-dir runs/r2/psummary/r2-pred \
  --batch-size 512 --scale 0.2 --n-nodes 10 --target min:GAP_eV \
  --polish 3 --out-dir runs/r2/best > runs/r2/generate.log 2>&1
echo "generate done $(date)" >> $LOG

# 7. predictor MAE-vs-noise curve
timeout 2400 python -m gaudi_tpu.cli.eval_predictor \
  --exp-dir runs/r2/psummary/r2-pred > runs/r2/eval_pred.log 2>&1

# 8. benches: batch sweep + single-pipeline e2e + headline warm
timeout 3600 python scripts/bench_sweep.py sweep >> $LOG 2>&1
timeout 2400 python scripts/bench_sweep.py e2e \
  --exp-dir runs/r2/summary/longrun-edm --n 1024 --chunk 256 >> $LOG 2>&1
timeout 2400 python bench.py > runs/r2/bench_final.json 2>> $LOG
echo "PHASE_R2 DONE $(date): $(cat runs/r2/bench_final.json)" >> $LOG
