#!/bin/bash
# Revised round-2 schedule (supersedes phase_r2.sh): switch cata training to
# the small-amplitude deformation data (runs/r2s) once its cache is warm,
# then predictor/hetro/peri campaigns and final evals.
# $1 = PID of the running cata phase to stop once r2s is ready.
cd /root/repo || exit 1
LOG=runs/phase_r2.log
echo "phase_r2b start $(date)" >> $LOG

# 0. wait for the r2s preprocessing cache
while ! grep -q "^preprocessed" /tmp/r2s_gen.log 2>/dev/null; do sleep 30; done
echo "r2s cache ready $(date)" >> $LOG

# 1. stop the big-deformation cata phase, carry its weights over
if [ -n "$1" ]; then kill "$1" 2>/dev/null; sleep 10; fi
mkdir -p runs/r2s/summary
rm -rf runs/r2s/summary/longrun-edm
cp -r runs/r2/summary/longrun-edm runs/r2s/summary/
rm -rf runs/r2s/summary/longrun-edm/eval
echo "weights carried to r2s $(date)" >> $LOG

# 2. cata fine-tune on small-amplitude data
timeout 6000 python scripts/longrun_tpu.py --root runs/r2s --max-hours 1.2 \
  --ema 0.9999 --lr 3e-4 --round-epochs 100 > runs/r2s/driver.log 2>&1
echo "r2s lr3e-4 done $(date)" >> $LOG
timeout 4200 python scripts/longrun_tpu.py --root runs/r2s --max-hours 0.7 \
  --ema 0.9999 --lr 1e-4 --round-epochs 100 >> runs/r2s/driver.log 2>&1
echo "r2s lr1e-4 done $(date)" >> $LOG

# 3. predictor retrain on the same data
timeout 3600 python -m gaudi_tpu.cli.train_predictor \
  --dataset cata --csv-file runs/r2s/cata.csv --xyz-root runs/r2s/cata-xyz \
  --save-dir runs/r2s/psummary --name r2-pred --epochs 400 \
  --target-features LUMO_eV,GAP_eV,Erel_eV,aIP_eV,aEA_eV \
  > runs/r2s/pred.log 2>&1
echo "predictor done $(date)" >> $LOG

# 4. hetro campaign
timeout 6600 python scripts/longrun_tpu.py --root runs/r2h --dataset hetro \
  --molecules 30000 --max-hours 1.5 --ema 0.9999 --round-epochs 60 \
  > runs/r2h/driver.log 2>&1
echo "hetro done $(date)" >> $LOG

# 5. peri campaign
timeout 5400 python scripts/longrun_tpu.py --root runs/r2p --dataset peri \
  --molecules 24000 --max-hours 1.0 --ema 0.9999 --round-epochs 60 \
  > runs/r2p/driver.log 2>&1
echo "peri done $(date)" >> $LOG

# 6. final evals
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2s/summary/longrun-edm --n-samples 1024 --batch-size 512 \
  --novelty > runs/r2s/eval1k_raw.log 2>&1
echo "eval raw done $(date)" >> $LOG
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2s/summary/longrun-edm --n-samples 1024 --batch-size 512 \
  --polish 5 --polish-t 0.05 --polish-noise 0.5 --novelty \
  > runs/r2s/eval1k_polish.log 2>&1
echo "eval polish done $(date)" >> $LOG
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2h/summary/longrun-edm --n-samples 512 --batch-size 512 \
  > runs/r2h/eval.log 2>&1
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2h/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --polish 5 --polish-t 0.05 --polish-noise 0.5 > runs/r2h/eval_polish.log 2>&1
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2p/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --polish 5 --polish-t 0.05 --polish-noise 0.5 > runs/r2p/eval.log 2>&1
echo "hetro/peri evals done $(date)" >> $LOG

# 7. guided design with the retrained predictor (+ polish)
timeout 3600 python -m gaudi_tpu.cli.generate \
  --edm-dir runs/r2s/summary/longrun-edm --predictor-dir runs/r2s/psummary/r2-pred \
  --batch-size 512 --scale 0.2 --n-nodes 10 --target min:GAP_eV \
  --polish 3 --out-dir runs/r2s/best > runs/r2s/generate.log 2>&1
echo "generate done $(date)" >> $LOG

# 8. predictor MAE curve
timeout 2400 python -m gaudi_tpu.cli.eval_predictor \
  --exp-dir runs/r2s/psummary/r2-pred > runs/r2s/eval_pred.log 2>&1

# 9. benches
timeout 3600 python scripts/bench_sweep.py sweep >> $LOG 2>&1
timeout 2400 python scripts/bench_sweep.py e2e \
  --exp-dir runs/r2s/summary/longrun-edm --n 1024 --chunk 256 >> $LOG 2>&1
timeout 2400 python bench.py > runs/r2s/bench_final.json 2>> $LOG
echo "PHASE_R2B DONE $(date): $(cat runs/r2s/bench_final.json)" >> $LOG
