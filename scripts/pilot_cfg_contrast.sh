#!/bin/bash
# After the CPU pilot (runs/r2pcfg_cpu) finishes: contrast evals that judge
# the CFG-for-Kekule hypothesis. All CPU, strided K=100-equivalent on the
# pilot's T=300 (n-steps 60), n=128. Appends one JSON block per setting to
# runs/r2pcfg_cpu/contrast.log.
cd /root/repo || exit 1
LOG=runs/r2pcfg_cpu/contrast.log
while ! grep -q "LONGRUN DONE" runs/r2pcfg_cpu/driver.log 2>/dev/null; do
  sleep 180
done
echo "pilot contrast start $(date)" >> $LOG
EXP=runs/r2pcfg_cpu/summary/longrun-edm
run() {
  echo "=== $* ===" >> $LOG
  timeout 2400 python -m gaudi_tpu.cli.eval_validity \
    --exp-dir $EXP --n-samples 128 --batch-size 128 --n-steps 60 \
    --plots 0 --platform cpu --seed 17 "$@" >> $LOG 2>&1
}
run --context-set VALID=1 --cfg-weight 0
run --context-set VALID=1 --cfg-weight 1
run --context-set VALID=1 --cfg-weight 2
run --context-set VALID=1 --cfg-weight 4
run --context-set VALID=0 --cfg-weight 1   # negative control
run --cfg-weight 0                          # histogram-marginal control
echo "PILOT CONTRAST DONE $(date)" >> $LOG
