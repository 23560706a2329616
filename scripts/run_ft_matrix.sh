#!/bin/bash
# Round-4 fine-tune-shape + eval-path matrix on the real chip (VERDICT r3
# items 1-3, 5). Serial runs; log lines: "### <label>" then the bench JSON.
cd /root/repo
LOG=${1:-/tmp/ft_matrix.log}
run() {
  local label="$1"; shift
  echo "### $label" >> "$LOG"
  timeout 2400 env "$@" python scripts/bench_finetune.py "$MODE" >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

# --- Phase A: VQA 480px (N=901) — the 36.4%-MFU shape ---
MODE=vqa_train
run "vqa B=24 bwd=partials (r3 scheme)" XFM_BWD_PARTIALS=1
run "vqa B=24 bwd=loopq (new default)"
run "vqa B=24 loopq fwd_qblk 304x3" XFM_FWD_QBLK_CAP=304
run "vqa B=32 loopq" XFM_FT_BATCH=32
run "vqa B=48 loopq remat attn_out" XFM_FT_BATCH=48 XFM_REMAT=1 XFM_REMAT_POLICY=attn_out

# --- Grounding (reference Grounding_bbox.yaml: 384px B=20; 480px variant) ---
MODE=grounding_train
run "grounding B=20 384px"
run "grounding B=20 480px" XFM_FT_RES=480

# --- Retrieval 384px (r3: 153.7 with partials) ---
MODE=retrieval_train
run "retrieval B=32 loopq"
run "retrieval B=32 loopq shared_cross_kv" XFM_SHARED_CROSS_KV=1

# --- Phase B: eval paths (VERDICT r3 #2) ---
MODE=retrieval_rerank
run "rerank repeat (reference formulation)" XFM_EVAL_SHARED_KV=0
run "rerank shared-kv (unique images)" XFM_EVAL_SHARED_KV=1
MODE=vqa_rank
run "vqa_rank repeat" XFM_EVAL_SHARED_KV=0
run "vqa_rank shared-kv" XFM_EVAL_SHARED_KV=1
MODE=caption_decode
run "caption greedy+beam3"

# --- Phase C: head-dim verdict + beit2-large ---
echo "### headdim" >> "$LOG"
timeout 2400 python scripts/bench_headdim.py >> "$LOG" 2>&1
echo "" >> "$LOG"
MODE=beit_large
run "beit_large B=16" XFM_FT_BATCH=16
run "beit_large B=32 remat attn_out" XFM_FT_BATCH=32 XFM_REMAT=1 XFM_REMAT_POLICY=attn_out
run "beit_large B=16 bf16+master" XFM_FT_BATCH=16 XFM_BF16_PARAMS=1

echo "### bench.py (pretrain regression check)" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1
echo "### MATRIX DONE" >> "$LOG"
