#!/bin/bash
# Round-4 host datagen chain (CPU-only; runs at nice 2 so the TPU legs' host
# side stays responsive on this 1-CPU box). All three sets use the new
# identity-dedup generator (data/synthetic.py), so every row is a distinct
# chemical identity — the round-3 uniqueness ceiling (15.6% distinct train
# identities) disappears at the source.
#   A: cata 16k  (5-target predictor + cata EDM continuation + uniqueness)
#   B: peri 16k  (peri low-t fine-tune continuation)
#   C: hetro 39k (merged-equivalent single set for the hetro continuation —
#      round-3 merged 16k+6.7k+16k with duplicates; one deduped 39k draw
#      strictly dominates it)
cd /root/repo || exit 1
LOG=runs/r6_datagen.log
mkdir -p runs
if ! mkdir /tmp/r6_datagen.lock 2>/dev/null; then
  echo "r6_datagen: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r6_datagen start $(date)" >> $LOG

gen() {  # gen <root> <dataset> <n> <seed> — DONE only if the csv exists
  local root=$1 ds=$2 n=$3 seed=$4
  [ -f "$root/$ds.csv" ] && { echo "$root/$ds.csv exists, skip" >> $LOG; return 0; }
  JAX_PLATFORMS=cpu nice -n 2 timeout 14400 python - >> $LOG 2>&1 <<PY
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
if gen runs/r6p peri 16000 11; then
  echo "PERI16K DONE $(date)" >> $LOG
else
  echo "PERI16K FAILED $(date)" >> $LOG
fi
if gen runs/r6h hetro 39000 12; then
  echo "HETRO39K DONE $(date)" >> $LOG
else
  echo "HETRO39K FAILED $(date)" >> $LOG
fi
echo "r6_datagen done $(date)" >> $LOG
rmdir /tmp/r6_datagen.lock
