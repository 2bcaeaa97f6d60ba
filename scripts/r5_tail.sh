#!/bin/bash
# Round-3 tail queue (chains on r5_fix.sh): the two VERDICT r2 #4 sub-items
# not covered by the retrain chain —
#   S : DPM-Solver++ quality table at n=512 on the committed cata artifact
#       (round-2 table was n=64 CPU; confirm the K=25+planarity-polish stack)
#   T : the production rejection path timed under `serve` (hetro artifact,
#       std 0.5 + polish 3 + angles3, judged only_valid requests)
cd /root/repo || exit 1
LOG=runs/r5_tail.log
if ! mkdir /tmp/r5_tail.lock 2>/dev/null; then
  echo "r5_tail: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r5_tail start $(date)" >> $LOG

# wait for the r5_fix chain to finish (bounded ~8h)
for i in $(seq 1 240); do
  grep -q "r5_fix done" runs/r5_fix.log 2>/dev/null && break
  sleep 120
done
echo "r5_fix observed done $(date)" >> $LOG

CATA=artifacts/cata-edm
# ---------------- stage S: dpmpp n=512 confirmations ----------------
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $CATA --n-samples 512 --batch-size 512 --plots 0 --seed 23 \
  --solver ancestral --n-steps 100 \
  > runs/r5s_anc_k100.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $CATA --n-samples 512 --batch-size 512 --plots 0 --seed 23 \
  --solver dpmpp --n-steps 25 \
  > runs/r5s_dpmpp_k25_raw.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $CATA --n-samples 512 --batch-size 512 --plots 0 --seed 23 \
  --solver dpmpp --n-steps 25 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  > runs/r5s_dpmpp_k25_polish.log 2>&1
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $CATA --n-samples 512 --batch-size 512 --plots 0 --seed 23 \
  --solver dpmpp --n-steps 10 \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  > runs/r5s_dpmpp_k10_polish.log 2>&1
echo "SOLVER_CONFIRM DONE $(date)" >> $LOG

# ---------------- stage T: serve-path rejection timing ----------------
timeout 4800 python scripts/serve_timing.py --exp-dir artifacts/hetro-edm \
  --n 512 --requests 3 --batch-size 512 --std 0.5 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 --max-rounds 4 \
  > runs/r5t_serve_hetro.log 2>&1
echo "SERVE_TIMING DONE $(date)" >> $LOG
echo "r5_tail done $(date)" >> $LOG
rmdir /tmp/r5_tail.lock
