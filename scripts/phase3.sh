#!/bin/bash
# Phase-3 TPU pipeline: waits for phase2 (PID in /tmp/phase2.pid), then:
# peri-dataset training smoke, predictor MAE-vs-noise eval, final bench.
cd /root/repo || exit 1

while kill -0 "$(cat /tmp/phase2.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
echo "phase2 finished at $(date)" >> runs/phase3.log

# 1. peri (peri-condensed lattice, same machinery, third model family)
mkdir -p runs/peri
timeout 7200 python scripts/longrun_tpu.py --root runs/peri --dataset peri \
  --molecules 12000 --max-hours 1.0 --round-epochs 80 \
  > runs/peri/driver.log 2>&1
echo "peri done $(date)" >> runs/phase3.log

# 2. predictor MAE-vs-noise-level curve (reference eval_cond_predictor)
timeout 3600 python -m gaudi_tpu.cli.eval_predictor \
  --exp-dir runs/longrun/psummary/longrun-pred \
  > runs/longrun/eval_pred.log 2>&1
echo "eval_predictor done $(date)" >> runs/phase3.log

# 3. final headline bench (warm cache for the driver's end-of-round run)
timeout 2400 python bench.py > runs/bench_final.json 2>> runs/phase3.log
echo "PHASE3 DONE $(date): $(cat runs/bench_final.json)" >> runs/phase3.log
