#!/bin/bash
# Evidence watcher: the round-3 chains write eval results into gitignored
# runs/ and commit only the .npz artifacts. A VM recycle between sessions
# would destroy those logs (it destroyed every round-2 checkpoint —
# QUALITY.md "checkpoint loss"). This watcher tails the chain markers and,
# as each leg completes, copies its small result logs into the committed
# evidence/ tree so the numbers survive any recycle and the next session
# can consolidate QUALITY.md from git alone.
#
# Runs standalone (nohup); never edits or signals the running chains.
cd /root/repo || exit 1
LOG=runs/evidence_watch.log
if ! mkdir /tmp/evidence_watch.lock 2>/dev/null; then
  echo "evidence_watch: lock held; duplicate exits $(date)" >> $LOG
  exit 0
fi
echo "evidence_watch start $(date)" >> $LOG

mkdir -p evidence/r3

# commit_leg <name> <marker_log> <marker> <file...>
commit_leg() {
  local name=$1 mlog=$2 marker=$3; shift 3
  [ -f "evidence/r3/.done_$name" ] && return 0
  grep -q "$marker" "$mlog" 2>/dev/null || return 1
  local copied=0
  for f in "$@"; do
    if [ -f "$f" ]; then
      # strip XLA cpu_aot_loader spam; keep logs small and readable
      grep -av "cpu_aot_loader" "$f" > "evidence/r3/$(basename "$f")" && copied=1
    fi
  done
  [ "$copied" = 1 ] || return 1
  date > "evidence/r3/.done_$name"
  for i in 1 2 3 4 5; do
    git add evidence/r3 && git commit -q -m "Evidence: $name result logs (round-3 queued chain)

No-Verification-Needed: committed eval-log evidence only" -- evidence/r3 && break
    sleep 30
  done
  echo "committed $name $(date)" >> $LOG
  return 0
}

for i in $(seq 1 500); do
  # distinct basenames: the hm legs' quality.jsonl must not collide with
  # peri's (evidence/ keys files by basename)
  [ -f runs/r5p/quality.jsonl ] && cp -f runs/r5p/quality.jsonl runs/r5p_quality.jsonl
  [ -f runs/r5h_merged/quality.jsonl ] && cp -f runs/r5h_merged/quality.jsonl runs/r5hm_quality.jsonl
  commit_leg peri_evals runs/r5_fix.log "PERI_EVALS DONE" \
    runs/r5p_eval_raw.log runs/r5p_eval_polish.log runs/r5p_eval_reject.log \
    runs/r5p_quality.jsonl
  commit_leg solver_confirm runs/r5_tail.log "SOLVER_CONFIRM DONE" \
    runs/r5s_anc_k100.log runs/r5s_dpmpp_k25_raw.log \
    runs/r5s_dpmpp_k25_polish.log runs/r5s_dpmpp_k10_polish.log
  commit_leg serve_timing runs/r5_tail.log "SERVE_TIMING DONE" \
    runs/r5t_serve_hetro.log
  commit_leg design_polished runs/r5_tail2.log "DESIGN_POLISHED DONE" \
    runs/r4/design_polished.log
  commit_leg vclf2 runs/r5_vclf2.log "VCLF2_EVAL DONE" \
    runs/r5h_eval_vclf3.log runs/r5_vclf2.log
  commit_leg hm_cont runs/r5_hm.log "HM_FT DONE" \
    runs/r5hm_quality.jsonl runs/r5_hm.log
  commit_leg hm_evals runs/r5_hm.log "HM_EVALS DONE" \
    runs/r5hm_eval_raw.log runs/r5hm_eval_polish.log \
    runs/r5hm_eval_vclf.log runs/r5hm_eval_reject.log \
    runs/r5hm_quality.jsonl runs/r5_hm.log
  if [ -f evidence/r3/.done_hm_evals ]; then
    echo "all legs committed $(date)" >> $LOG
    break
  fi
  sleep 120
done
echo "evidence_watch end $(date)" >> $LOG
rmdir /tmp/evidence_watch.lock
