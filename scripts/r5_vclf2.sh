#!/bin/bash
# Round-3 vclf v2 (chains on r5_tail2): retrain the hetro validity
# classifier on the n_rings-patched labeled csv. The v1 classifier trained
# on the pre-patch salvaged csv, whose cyclomatic n_rings over-counted on
# B-rich invalid skeletons: the loader's n_rings<=10 prefilter silently
# dropped 866 rows — ALL invalid (42% of the invalid class). v2 sees the
# full 8,788-row set (76.8% valid), then the vclf-guided hetro eval reruns
# with the stronger classifier.
cd /root/repo || exit 1
LOG=runs/r5_vclf2.log
if ! mkdir /tmp/r5_vclf2.lock 2>/dev/null; then
  echo "r5_vclf2: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r5_vclf2 start $(date)" >> $LOG
for i in $(seq 1 360); do
  grep -q "r5_tail2 done" runs/r5_tail2.log 2>/dev/null && break
  sleep 120
done
echo "r5_tail2 observed done $(date)" >> $LOG

timeout 3600 python -m gaudi_tpu.cli.train_predictor \
  --dataset hetro --data-root runs/r5h_lab --max-nodes 10 \
  --target-features VALID --loss bce --name vclf-bce-v2 \
  --save-dir runs/r5h_lab/psummary --epochs 300 --batch-size 256 \
  --dtype bfloat16 >> $LOG 2>&1
echo "VCLF2_TRAIN DONE $(date)" >> $LOG
timeout 1800 python -m gaudi_tpu.cli.export_params \
  --exp-dir runs/r5h_lab/psummary/vclf-bce-v2 --out artifacts/hetro-vclf \
  --predictor --note "round-3 hetro validity classifier v2 (BCE, full 8.8k labeled set incl. the 866 invalid rows the pre-patch n_rings filter dropped)" >> $LOG 2>&1
for i in 1 2 3; do
  git add artifacts/hetro-vclf && git commit -q -m "Artifact: hetro validity classifier v2 (full invalid class restored)

No-Verification-Needed: committed binary artifact + provenance note only" -- artifacts/hetro-vclf && break
  sleep 20
done

EXPH=runs/r5h/summary/longrun-edm
timeout 3600 python -m gaudi_tpu.cli.eval_validity \
  --exp-dir $EXPH --n-samples 512 --batch-size 512 --plots 0 \
  --std 0.5 --polish 3 --polish-t 0.05 --polish-noise 0.3 \
  --polish-guide angles3 --polish-guide-scale 100 \
  --guide-predictor-dir artifacts/hetro-vclf \
  --guide-target max:VALID --guide-scale 1.0 --guide-t-window 0.25 \
  --guide-prob > runs/r5h_eval_vclf3.log 2>&1
echo "VCLF2_EVAL DONE $(date)" >> $LOG
echo "r5_vclf2 done $(date)" >> $LOG
rmdir /tmp/r5_vclf2.lock
