#!/bin/bash
# Round-4 datagen chain, leg 3 (final): all three sets with the
# clash-rescue + identity-dedup generator (data/synthetic.py) — every row
# a distinct chemical identity, helicene-like fjord shapes recovered via
# targeted out-of-plane resolution (~5x the planar-valid space, ~1150
# accepts/min sustained). Order: cata (gates P5/OPV/CE), hetro (gates
# HM), peri (gates PF). Markers match scripts/r6_train.sh.
cd /root/repo || exit 1
LOG=runs/r6_datagen.log
mkdir -p runs
if ! mkdir /tmp/r6_datagen3.lock 2>/dev/null; then
  echo "r6_datagen3: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r6_datagen3 start $(date)" >> $LOG

gen() {  # gen <root> <dataset> <n> <seed>
  local root=$1 ds=$2 n=$3 seed=$4
  [ -f "$root/$ds.csv" ] && { echo "$root/$ds.csv exists, skip" >> $LOG; return 0; }
  JAX_PLATFORMS=cpu nice -n 2 timeout 18000 python - >> $LOG 2>&1 <<PY
import time
from gaudi_tpu.data.synthetic import generate_dataset
t0 = time.time()
csv = generate_dataset("$root", "$ds", n_molecules=$n, seed=$seed)
print(f"$ds n=$n seed=$seed done in {time.time()-t0:.0f}s -> {csv}", flush=True)
PY
  [ -f "$root/$ds.csv" ]
}

if gen runs/r6c cata 16000 10; then
  echo "CATA16K DONE $(date)" >> $LOG
else
  echo "CATA16K FAILED $(date)" >> $LOG
fi
if gen runs/r6h hetro 30000 12; then
  echo "HETRO39K DONE $(date)" >> $LOG
else
  echo "HETRO39K FAILED $(date)" >> $LOG
fi
if gen runs/r6p peri 16000 11; then
  echo "PERI16K DONE $(date)" >> $LOG
else
  echo "PERI16K FAILED $(date)" >> $LOG
fi
echo "r6_datagen done $(date)" >> $LOG
rmdir /tmp/r6_datagen3.lock
