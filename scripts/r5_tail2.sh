#!/bin/bash
# Round-3 tail-2 (chains on r5_tail.sh): polished flagship guided design.
# The stage-P design run (runs/r4/design.log) sampled at guidance scale 0.6
# with no polish and landed at 51% valid — the guidance gradient drags
# samples off-manifold, exactly what the planarity-guided polish repairs on
# the unconditional pipeline (0.915 -> 0.996 valid at n=1024). This run
# composes design + polish for the production design demo.
cd /root/repo || exit 1
LOG=runs/r5_tail2.log
if ! mkdir /tmp/r5_tail2.lock 2>/dev/null; then
  echo "r5_tail2: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r5_tail2 start $(date)" >> $LOG
for i in $(seq 1 300); do
  grep -q "r5_tail done" runs/r5_tail.log 2>/dev/null && break
  sleep 120
done
echo "r5_tail observed done $(date)" >> $LOG

timeout 4800 python -m gaudi_tpu.cli.generate \
  --edm-dir artifacts/cata-edm --predictor-dir artifacts/cata-predictor \
  --batch-size 512 --scale 0.6 --n-nodes 10 --target max:GAP_eV \
  --polish 5 --polish-t 0.15 --polish-noise 0.3 \
  --polish-guide planarity --polish-guide-scale 100 \
  --out-dir runs/r4/design_polished > runs/r4/design_polished.log 2>&1
echo "DESIGN_POLISHED DONE $(date)" >> $LOG
echo "r5_tail2 done $(date)" >> $LOG
rmdir /tmp/r5_tail2.lock
