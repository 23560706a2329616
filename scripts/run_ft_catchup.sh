#!/bin/bash
# Catch-up VQA configs (failed mid-matrix during the loopq kernel fix)
# + block-size and fused-MLP A/Bs at the 480px shape.
cd /root/repo
LOG=${1:-/tmp/ft_catchup.log}
run() {
  local label="$1"; shift
  echo "### $label" >> "$LOG"
  timeout 2400 env "$@" python scripts/bench_finetune.py vqa_train >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

run "vqa B=24 loopq default"
run "vqa B=32 loopq" XFM_FT_BATCH=32
run "vqa B=24 loopq fwd_qblk 304x3" XFM_FWD_QBLK_CAP=304
run "vqa B=24 loopq bwd_qblk 160" XFM_BWD_QBLK=160
run "vqa B=24 loopq bwd_qblk 240" XFM_BWD_QBLK=240
run "vqa B=24 loopq + fused MLP" XFM_MLP_FUSED=1
run "vqa B=24 xla attn + attn-remat" XFM_DISABLE_FLASH=1 XFM_ATTN_REMAT=1

echo "### vqa_rank repeat (fixed harness)" >> "$LOG"
timeout 2400 env XFM_EVAL_SHARED_KV=0 python scripts/bench_finetune.py vqa_rank >> "$LOG" 2>&1
echo "" >> "$LOG"
echo "### vqa_rank shared-kv (fixed harness)" >> "$LOG"
timeout 2400 env XFM_EVAL_SHARED_KV=1 python scripts/bench_finetune.py vqa_rank >> "$LOG" 2>&1
echo "" >> "$LOG"
echo "### rerank repeat (fixed harness)" >> "$LOG"
timeout 2400 env XFM_EVAL_SHARED_KV=0 python scripts/bench_finetune.py retrieval_rerank >> "$LOG" 2>&1
echo "" >> "$LOG"
echo "### rerank shared-kv (fixed harness)" >> "$LOG"
timeout 2400 env XFM_EVAL_SHARED_KV=1 python scripts/bench_finetune.py retrieval_rerank >> "$LOG" 2>&1
echo "" >> "$LOG"
echo "### grounding B=20 480px" >> "$LOG"
timeout 2400 env XFM_FT_RES=480 python scripts/bench_finetune.py grounding_train >> "$LOG" 2>&1
echo "" >> "$LOG"
echo "### CATCHUP DONE" >> "$LOG"
