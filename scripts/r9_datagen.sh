#!/bin/bash
# Round-5 datagen: identity-deduped sets at the TRAINED deformation regime
# (bend 0.02 / twist 0.015, the round-2 finding QUALITY.md documents as the
# fittable one — round-4's sets silently used the generator's broad 0.08/0.07
# defaults, the likely root cause of the raw-axis regression).
cd /root/repo || exit 1
LOG=runs/r9_datagen.log
mkdir -p runs
echo "r9_datagen start $(date)" >> $LOG

gen() {  # gen <root> <dataset> <n> <seed>
  local root=$1 ds=$2 n=$3 seed=$4
  [ -f "$root/$ds.csv" ] && { echo "$root/$ds.csv exists, skip" >> $LOG; return 0; }
  nice -n 2 timeout 14400 python - >> $LOG 2>&1 <<PY
import time, jax
jax.config.update("jax_platforms", "cpu")
from gaudi_tpu.data.synthetic import generate_dataset
t0 = time.time()
csv = generate_dataset("$root", "$ds", n_molecules=$n, seed=$seed,
                       bend_scale=0.02, twist_scale=0.015)
print(f"$ds n=$n seed=$seed done in {time.time()-t0:.0f}s -> {csv}", flush=True)
PY
  [ -f "$root/$ds.csv" ]
}

if gen runs/r9c cata 16000 20; then echo "CATA_R9 DONE $(date)" >> $LOG; else echo "CATA_R9 FAILED $(date)" >> $LOG; fi
if gen runs/r9p peri 14000 21; then echo "PERI_R9 DONE $(date)" >> $LOG; else echo "PERI_R9 FAILED $(date)" >> $LOG; fi
echo "r9_datagen done $(date)" >> $LOG
