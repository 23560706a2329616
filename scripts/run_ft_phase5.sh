#!/bin/bash
# Phase 5: fine-tune shapes with the reference-faithful unclipped AdamW.
cd /root/repo
LOG=${1:-/tmp/ft_phase5.log}
run() {
  local label="$1"; local mode="$2"; shift 2
  echo "### $label" >> "$LOG"
  timeout 2400 env "$@" python scripts/bench_finetune.py "$mode" >> "$LOG" 2>&1
  echo "" >> "$LOG"
}
run "vqa B=24 no-clip" vqa_train
run "vqa B=24 clip (A/B)" vqa_train XFM_FT_CLIP=1
run "retrieval B=32 no-clip (auto shared-kv)" retrieval_train
run "grounding 480px B=20 no-clip" grounding_train XFM_FT_RES=480
run "grounding 384px B=20 no-clip" grounding_train
run "beit_large B=32 remat no-clip" beit_large XFM_FT_BATCH=32 XFM_REMAT=1 XFM_REMAT_POLICY=attn_out
echo "### PHASE5 DONE" >> "$LOG"
