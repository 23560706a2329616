#!/bin/bash
# Phase 4: shared-kv rerank with the gather-scheduling barrier +
# regression check of the barrier on the training path.
cd /root/repo
LOG=${1:-/tmp/ft_phase4.log}
run() {
  local label="$1"; local mode="$2"; shift 2
  echo "### $label" >> "$LOG"
  timeout 2400 env "$@" python scripts/bench_finetune.py "$mode" >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

run "rerank shared-kv (gather barrier)" retrieval_rerank XFM_EVAL_SHARED_KV=1
run "vqa_rank shared-kv (gather barrier)" vqa_rank XFM_EVAL_SHARED_KV=1
run "retrieval train shared_kv (barrier regression check)" retrieval_train
echo "### PHASE4 DONE" >> "$LOG"
