#!/bin/bash
# Phase 6: bf16 rel-pos bias A/B at the 480px shapes.
cd /root/repo
LOG=${1:-/tmp/ft_phase6.log}
run() {
  local label="$1"; local mode="$2"; shift 2
  echo "### $label" >> "$LOG"
  timeout 2400 env "$@" python scripts/bench_finetune.py "$mode" >> "$LOG" 2>&1
  echo "" >> "$LOG"
}
run "vqa B=24 bf16 relpos (default)" vqa_train
run "vqa B=24 f32 relpos" vqa_train XFM_BF16_RELPOS=0
run "grounding 480 bf16 relpos" grounding_train XFM_FT_RES=480
echo "### PHASE6 DONE" >> "$LOG"
