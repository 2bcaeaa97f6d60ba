#!/bin/bash
# Round-3: extra hetro training data (seed 2, 16k molecules), generated
# on the host CPU while the TPU runs the peri eval / tail stages. Waits
# for the peri TRAIN leg to finish so the heavy host-side datagen never
# overlaps an active training round (host contention visibly degrades
# round time on this 1-CPU box).
cd /root/repo || exit 1
LOG=runs/r5_dgen2.log
if ! mkdir /tmp/r5_dgen2.lock 2>/dev/null; then
  echo "r5_dgen2: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r5_dgen2 start $(date)" >> $LOG

for i in $(seq 1 90); do
  grep -q "PERI_TRAIN DONE" runs/r5_fix.log 2>/dev/null && break
  sleep 60
done
echo "peri train observed done $(date)" >> $LOG

JAX_PLATFORMS=cpu timeout 7200 python - >> $LOG 2>&1 <<'PY'
import time
from gaudi_tpu.data.synthetic import generate_dataset
t0 = time.time()
generate_dataset("runs/r5h2", "hetro", n_molecules=16000, seed=2)
print(f"hetro seed-2 datagen done in {time.time()-t0:.0f}s", flush=True)
PY
echo "DGEN2 DONE $(date)" >> $LOG
rmdir /tmp/r5_dgen2.lock
