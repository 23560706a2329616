#!/bin/bash
# Phase 3: salted vqa_rank reruns + fused-MLP A/Bs (480px + pretrain shape).
cd /root/repo
LOG=${1:-/tmp/ft_phase3.log}
run() {
  local label="$1"; local mode="$2"; shift 2
  echo "### $label" >> "$LOG"
  timeout 2400 env "$@" python scripts/bench_finetune.py "$mode" >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

run "vqa_rank repeat (salted)" vqa_rank XFM_EVAL_SHARED_KV=0
run "vqa_rank shared-kv (salted)" vqa_rank XFM_EVAL_SHARED_KV=1
run "rerank repeat (single-call)" retrieval_rerank XFM_EVAL_SHARED_KV=0
run "rerank shared-kv (single-call)" retrieval_rerank XFM_EVAL_SHARED_KV=1
run "vqa B=24 loopq + fused MLP (erf via phi-hat)" vqa_train XFM_MLP_FUSED=1

echo "### bench.py + fused MLP (pretrain shape, tanh recipe)" >> "$LOG"
timeout 2400 env XFM_MLP_FUSED=1 python bench.py >> "$LOG" 2>&1
echo "" >> "$LOG"
echo "### beit_large B=16 + fused MLP" >> "$LOG"
timeout 2400 env XFM_MLP_FUSED=1 XFM_FT_BATCH=16 python scripts/bench_finetune.py beit_large >> "$LOG" 2>&1
echo "" >> "$LOG"
echo "### PHASE3 DONE" >> "$LOG"
