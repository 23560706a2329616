#!/bin/bash
# Final round-4 numbers: pure defaults, no env overrides.
cd /root/repo
LOG=${1:-/tmp/ft_final.log}
for m in vqa_train grounding_train retrieval_train; do
  echo "### $m (defaults)" >> "$LOG"
  timeout 2400 python scripts/bench_finetune.py "$m" >> "$LOG" 2>&1
  echo "" >> "$LOG"
done
echo "### grounding 480 (defaults)" >> "$LOG"
timeout 2400 env XFM_FT_RES=480 python scripts/bench_finetune.py grounding_train >> "$LOG" 2>&1
echo "### bench.py (final)" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1
echo "### FINAL DONE" >> "$LOG"
