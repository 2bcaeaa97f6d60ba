#!/bin/bash
# Round-2 phase H (chains on G): DPM-Solver++ ODE sampler validation on the
# trained headline checkpoint (runs/r2lt, cata low-t fine-tuned model).
# Questions: (1) where is the quality knee in denoiser calls for dpmpp vs
# the strided ancestral sampler (K=100 knee, QUALITY.md)? (2) guided dpmpp
# throughput vs the 752 mol/s strided-guided number (PERF.md).
cd /root/repo || exit 1
LOG=runs/phase_r2.log
echo "phase_r2h start $(date)" >> $LOG
while ! grep -q "PHASE_R2G DONE" $LOG 2>/dev/null; do sleep 120; done

EXP=runs/r2lt/summary/longrun-edm

# 1. quality sweep: dpmpp order 2 at K in {10, 15, 25, 50}, order 1 at 25
#    (DDIM control), vs the ancestral K=100 knee re-measured at same seed
for K in 10 15 25 50; do
  timeout 2400 python -m gaudi_tpu.cli.eval_validity \
    --exp-dir $EXP --n-samples 256 --batch-size 256 --seed 23 --plots 0 \
    --solver dpmpp --n-steps $K > runs/r2lt/eval_dpmpp_k$K.log 2>&1
done
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXP --n-samples 256 --batch-size 256 --seed 23 --plots 0 \
  --solver dpmpp --solver-order 1 --n-steps 25 \
  > runs/r2lt/eval_ddim_k25.log 2>&1
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXP --n-samples 256 --batch-size 256 --seed 23 --plots 0 \
  --n-steps 100 > runs/r2lt/eval_ancestral_k100.log 2>&1

# 2. production stack on the ODE sampler: polish + planarity guide
timeout 2400 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXP --n-samples 256 --batch-size 256 --seed 23 --plots 0 \
  --solver dpmpp --n-steps 25 --polish 5 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  > runs/r2lt/eval_dpmpp_polish.log 2>&1

echo "PHASE_R2H DONE $(date)" >> $LOG
