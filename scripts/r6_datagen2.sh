#!/bin/bash
# Round-4 datagen chain, leg 2 (replaces the tail of r6_datagen.sh while
# its cata generation keeps running): hetro BEFORE peri — hetro is the
# long pole and gates the HM training stage, while peri's PF stage runs
# last anyway. Hetro target trimmed 39k -> 30k: with identity dedup every
# row is distinct, and 30k distinct molecules already exceeds the
# distinct content of round-3's merged-39k plan; the tail of a bigger
# draw costs disproportionate generator time (dup spins).
# Markers stay the ones scripts/r6_train.sh waits for.
cd /root/repo || exit 1
LOG=runs/r6_datagen.log
if ! mkdir /tmp/r6_datagen2.lock 2>/dev/null; then
  echo "r6_datagen2: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r6_datagen2 start $(date)" >> $LOG

# wait for the in-flight cata generation (bounded ~4h)
for i in $(seq 1 240); do
  [ -f runs/r6c/cata.csv ] && break
  sleep 60
done
if [ -f runs/r6c/cata.csv ]; then
  echo "CATA16K DONE $(date)" >> $LOG
else
  echo "CATA16K FAILED $(date)" >> $LOG
fi

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
rmdir /tmp/r6_datagen2.lock
