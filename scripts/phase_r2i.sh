#!/bin/bash
# Round-2 phase I (chains on H): 512-sample TPU confirmations of the
# angles3 physics prior in guided polish. CPU probes (n=64, strided
# K=100): hetro polish-3 0.953 -> 0.969 mol_stable, angle-window
# saturated across scales 30-300 (runs/r2h/probe_angles3_v2.log);
# peri numbers in runs/r2p/probe_angles3.log.
cd /root/repo || exit 1
LOG=runs/phase_r2.log
echo "phase_r2i start $(date)" >> $LOG
while ! grep -q "PHASE_R2H DONE" $LOG 2>/dev/null; do sleep 120; done

timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2h/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 --plots 0 \
  > runs/r2h/eval_angles3.log 2>&1
echo "hetro angles3 final done $(date)" >> $LOG

timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir runs/r2p/summary/longrun-edm --n-samples 512 --batch-size 512 \
  --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 --plots 0 \
  > runs/r2p/eval_angles3.log 2>&1
echo "PHASE_R2I DONE $(date)" >> $LOG
