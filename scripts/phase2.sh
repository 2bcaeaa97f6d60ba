#!/bin/bash
# Phase-2 TPU pipeline: waits for the cata longrun (PID in /tmp/longrun.pid)
# to finish, then chains bench -> predictor training -> guidance/strided
# sweeps -> 1k-sample eval -> hetro training campaign. Each stage logs under
# runs/.
cd /root/repo || exit 1
R=runs/longrun

while kill -0 "$(cat /tmp/longrun.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
echo "longrun finished at $(date)" >> runs/phase2.log

# 1. headline bench (also warms the persistent compile cache for the driver)
timeout 2400 python bench.py > runs/bench_phase2.json 2>> runs/phase2.log
echo "bench done $(date): $(cat runs/bench_phase2.json)" >> runs/phase2.log

# 2. property predictor on the same dataset (reference 5-target config)
timeout 7200 python -m gaudi_tpu.cli.train_predictor --dataset cata \
  --csv-file $R/cata.csv --xyz-root $R/cata-xyz --name longrun-pred \
  --save-dir $R/psummary --epochs 400 --batch-size 256 --dtype bfloat16 \
  --target-features LUMO_eV,GAP_eV,Erel_eV,aIP_eV,aEA_eV --max-nodes 11 \
  > $R/pred.log 2>&1
echo "predictor done $(date)" >> runs/phase2.log

# 3. guidance-scale + strided sweeps
timeout 10800 python scripts/sweep_tpu.py --edm-dir $R/summary/longrun-edm \
  --predictor-dir $R/psummary/longrun-pred > $R/sweep.log 2>&1
echo "sweep done $(date)" >> runs/phase2.log

# 4. Table-1-style eval: 1k samples, uniqueness + novelty, plots, chain gif
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $R/summary/longrun-edm --n-samples 1024 --batch-size 512 \
  --novelty --plots 5 --chain-gif > $R/eval1k.log 2>&1
echo "eval1k done $(date)" >> runs/phase2.log

# 5. hetro campaign (orientation mode at scale)
mkdir -p runs/hetro
timeout 10800 python scripts/longrun_tpu.py --root runs/hetro --dataset hetro \
  --molecules 24000 --max-hours 2.0 --round-epochs 60 \
  > runs/hetro/driver.log 2>&1
echo "PHASE2 DONE $(date)" >> runs/phase2.log
