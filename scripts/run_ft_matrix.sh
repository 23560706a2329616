#!/bin/bash
# Round-4 fine-tune-shape A/B matrix on the real chip (VERDICT items 1-2).
# Serial runs; each line of the log is "### <label>" then the bench JSON.
cd /root/repo
LOG=${1:-/tmp/ft_matrix.log}
run() {
  local label="$1"; shift
  echo "### $label" >> "$LOG"
  timeout 2400 env "$@" python scripts/bench_finetune.py "$MODE" >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

# --- VQA 480px (N=901): the failing 36.4% MFU shape ---
MODE=vqa_train
run "vqa B=24 baseline"
run "vqa B=24 shared_cross_kv" XFM_SHARED_CROSS_KV=1
run "vqa B=24 remat attn_out" XFM_REMAT=1 XFM_REMAT_POLICY=attn_out
run "vqa B=32" XFM_FT_BATCH=32
run "vqa B=48 remat attn_out" XFM_FT_BATCH=48 XFM_REMAT=1 XFM_REMAT_POLICY=attn_out
run "vqa B=24 xla attn + attn-remat" XFM_DISABLE_FLASH=1 XFM_ATTN_REMAT=1
run "vqa B=24 jax-flash" XFM_ATTN_IMPL=jaxflash

# --- Grounding 384px (reference B=20) + 480px variant ---
MODE=grounding_train
run "grounding B=20 384px baseline"
run "grounding B=20 480px" XFM_FT_RES=480
run "grounding B=20 480px shared_kv" XFM_FT_RES=480 XFM_SHARED_CROSS_KV=1

# --- Retrieval 384px: the predicted shared-kv win (baseline 153.7) ---
MODE=retrieval_train
run "retrieval B=32 baseline re-run"
run "retrieval B=32 shared_cross_kv" XFM_SHARED_CROSS_KV=1

echo "### MATRIX DONE" >> "$LOG"
