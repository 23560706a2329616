#!/bin/bash
cd /root/repo
LOG=${1:-/tmp/ft_phase7.log}
run() {
  local label="$1"; local mode="$2"; shift 2
  echo "### $label" >> "$LOG"
  timeout 2400 env "$@" python scripts/bench_finetune.py "$mode" >> "$LOG" 2>&1
  echo "" >> "$LOG"
}
run "vqa single-block bwd (48M vmem, blk 928)" vqa_train XFM_KERNEL_VMEM_MB=48 XFM_BWD_QBLK=928
run "vqa single-block fwd+bwd (64M vmem)" vqa_train XFM_KERNEL_VMEM_MB=64 XFM_BWD_QBLK=928 XFM_FWD_QBLK_CAP=928
run "vqa bwd blk 608 (48M)" vqa_train XFM_KERNEL_VMEM_MB=48 XFM_BWD_QBLK=608
echo "### PHASE7 DONE" >> "$LOG"
