#!/bin/bash
# Round-5 training chain.
#
# Program (VERDICT r4 next-round items #1/#3/#5):
#   A. cata: 45/55 identity split of the r9 small-amplitude deduped set
#      (train coverage <50% of the reachable space -> novelty measurable),
#      FROM-SCRATCH train (restoring a round-3/4 artifact would contaminate
#      the holdout: those models saw the whole identity space), then low-t
#      fine-tune. Export gated on probe health (r8_tail pattern).
#   B. peri: continuation of the committed artifact on the r9 peri set
#      (small-amplitude regime; the round-4 raw-validity regression traced
#      to the generator's broad 0.08/0.07 defaults), lr warmup for the
#      weights-only restore, then low-t fine-tune at 5e-5.
# Each stage commits its artifact + logs as soon as it lands.
cd /root/repo || exit 1
LOG=runs/r10_train.log
mkdir -p runs evidence/r5
if ! mkdir /tmp/r10_train.lock 2>/dev/null; then
  echo "r10_train: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "r10_train start $(date)" >> $LOG

commit_paths() {  # commit_paths <msg> <paths...>
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    git add "$@"
    git diff --cached --quiet -- "$@" && break
    git commit -q -m "$msg" -- "$@" && break
    sleep 20
  done
}

wait_marker() {  # wait_marker <log> <marker> <max_minutes>
  local f=$1 m=$2 n=$3
  for i in $(seq 1 "$n"); do
    grep -q "$m" "$f" 2>/dev/null && return 0
    sleep 60
  done
  echo "TIMEOUT waiting for $m in $f $(date)" >> $LOG
  return 1
}

# ---------- stage A0: wait for cata datagen, split, snapshot ----------
wait_marker runs/r9_datagen.log "CATA_R9 DONE" 90 || exit 1
if [ ! -f runs/r9cs/cata.csv ]; then
  python - >> $LOG 2>&1 <<'PY'
import os, numpy as np, pandas as pd
src = "runs/r9c"; dst = "runs/r9cs"
os.makedirs(dst, exist_ok=True)
df = pd.read_csv(src + "/cata.csv")
rng = np.random.default_rng(42)
idx = rng.permutation(len(df))
n_train = int(0.45 * len(df))
tr, ho = df.iloc[idx[:n_train]], df.iloc[idx[n_train:]]
tr.to_csv(dst + "/cata.csv", index=False)
ho.to_csv(dst + "/cata_holdout.csv", index=False)
if not os.path.exists(dst + "/cata-xyz"):
    os.symlink(os.path.abspath(src + "/cata-xyz"), dst + "/cata-xyz")
print(f"r9 split: {len(df)} identities -> train {len(tr)} ({len(tr)/len(df):.1%} coverage), holdout {len(ho)}", flush=True)
PY
fi
tar czf artifacts/data/r9_cata.tgz -C runs r9c/cata.csv r9c/cata-xyz \
  && cp runs/r9cs/cata_holdout.csv artifacts/data/r9_cata_holdout.csv \
  && commit_paths "Round-5 cata dataset: small-amplitude deduped set + 45/55 identity holdout split" \
       artifacts/data/r9_cata.tgz artifacts/data/r9_cata_holdout.csv
echo "A0_SPLIT DONE $(date)" >> $LOG

# ---------- stage A1: cata from-scratch main leg ----------
if [ ! -f runs/r9cs/A1.done ]; then
  timeout 10800 python scripts/longrun_tpu.py --root runs/r9cs --dataset cata \
    --max-hours 2.5 --batch-size 256 --lr 1e-3 --ema 0.9999 --seed 20 \
    --round-epochs 100 >> runs/r10_cata_driver.log 2>&1
  touch runs/r9cs/A1.done
fi
echo "A1_MAIN DONE $(date)" >> $LOG

# ---------- stage A2: cata low-t fine-tune ----------
if [ ! -f runs/r9cs/A2.done ]; then
  timeout 5400 python scripts/longrun_tpu.py --root runs/r9cs --dataset cata \
    --max-hours 1.0 --batch-size 256 --lr 1e-4 --ema 0.9999 --seed 20 \
    --t-bias-frac 0.5 --t-bias-cap 0.1 --round-epochs 100 \
    >> runs/r10_cata_driver.log 2>&1
  touch runs/r9cs/A2.done
fi
echo "A2_FT DONE $(date)" >> $LOG

# gate export on probe health: last quality round must sample sanely
python - >> $LOG 2>&1 <<'PY'
import json, subprocess, sys
last = json.loads(open("runs/r9cs/quality.jsonl").read().splitlines()[-1])
print("cata final probe:", last, flush=True)
if last["mol_valid"] < 0.5:
    sys.exit("cata export GATED OFF: final probe mol_valid %.3f" % last["mol_valid"])
subprocess.run([sys.executable, "-m", "gaudi_tpu.cli.export_params",
                "--exp-dir", "runs/r9cs/summary/longrun-edm",
                "--out", "artifacts/cata-edm-r5"], check=True)
print("cata-edm-r5 exported", flush=True)
PY
[ -d artifacts/cata-edm-r5 ] && commit_paths "Round-5 cata EDM artifact: from-scratch on holdout-split small-amplitude data" artifacts/cata-edm-r5
cp runs/r9cs/quality.jsonl evidence/r5/cata_quality.jsonl 2>/dev/null
commit_paths "Evidence: round-5 cata training curve" evidence/r5/cata_quality.jsonl
echo "A3_EXPORT DONE $(date)" >> $LOG

# ---------- stage B0: wait for peri datagen ----------
wait_marker runs/r9_datagen.log "PERI_R9 DONE" 120 || exit 1
tar czf artifacts/data/r9_peri.tgz -C runs r9p/peri.csv r9p/peri-xyz \
  && commit_paths "Round-5 peri dataset: small-amplitude deduped set" artifacts/data/r9_peri.tgz

# ---------- stage B1: peri continuation (weights-only restore + warmup) ----------
if [ ! -f runs/r9p/B1.done ]; then
  timeout 9000 python scripts/longrun_tpu.py --root runs/r9p --dataset peri \
    --max-hours 1.6 --batch-size 256 --lr 1e-4 --lr-warmup 500 --ema 0.9999 \
    --seed 21 --restore artifacts/peri-edm --round-epochs 100 \
    >> runs/r10_peri_driver.log 2>&1
  touch runs/r9p/B1.done
fi
echo "B1_MAIN DONE $(date)" >> $LOG

# ---------- stage B2: peri low-t fine-tune ----------
if [ ! -f runs/r9p/B2.done ]; then
  timeout 5400 python scripts/longrun_tpu.py --root runs/r9p --dataset peri \
    --max-hours 0.8 --batch-size 256 --lr 5e-5 --ema 0.9999 --seed 21 \
    --t-bias-frac 0.5 --t-bias-cap 0.1 --round-epochs 100 \
    >> runs/r10_peri_driver.log 2>&1
  touch runs/r9p/B2.done
fi
echo "B2_FT DONE $(date)" >> $LOG

python - >> $LOG 2>&1 <<'PY'
import json, subprocess, sys
last = json.loads(open("runs/r9p/quality.jsonl").read().splitlines()[-1])
print("peri final probe:", last, flush=True)
if last["mol_valid"] < 0.30:
    sys.exit("peri export GATED OFF: final probe mol_valid %.3f" % last["mol_valid"])
subprocess.run([sys.executable, "-m", "gaudi_tpu.cli.export_params",
                "--exp-dir", "runs/r9p/summary/longrun-edm",
                "--out", "artifacts/peri-edm-r5"], check=True)
print("peri-edm-r5 exported", flush=True)
PY
[ -d artifacts/peri-edm-r5 ] && commit_paths "Round-5 peri EDM artifact: continuation on small-amplitude data" artifacts/peri-edm-r5
cp runs/r9p/quality.jsonl evidence/r5/peri_quality.jsonl 2>/dev/null
commit_paths "Evidence: round-5 peri training curve" evidence/r5/peri_quality.jsonl
echo "B3_EXPORT DONE $(date)" >> $LOG

echo "R10 ALL DONE $(date)" >> $LOG
rmdir /tmp/r10_train.lock
