#!/bin/bash
# Full-system e2e evaluation protocols (round 3). Records the EXACT
# invocations behind every artifacts_r3/e2e_*.json so future rounds can
# reproduce and compare (the r2 artifacts never recorded their args).
#
#   bash scripts/eval_protocols.sh <det_ckpt> <enc_ckpt> <refine_ckpt> <outdir>
#
# Protocols (matching the r2 rows in README so numbers stay comparable):
#   headline — multicard occlusion: cards ≥8% of frame, ≤4 cards, 1024-card
#              index (r2: e2e_headline_v2_rhlr.json)
#   refdist  — reference scene statistics: cards down to ~700 px², 512-card
#              index (r2: e2e_refdist_v2_rhlr.json)
#   refparity— the reference's ACTIVE training distribution (jitter 0.7,
#              cards up to half off-frame, 10% pure-background frames):
#              edge-clipped recall + background FP probe (new in r3)
#   singlecard — serving scenario: one card ≥10% of frame
#   oracle_refdist — GT-corner appearance ceiling on the refdist protocol
set -euo pipefail
# persist compiles across the five invocations (each is a fresh process;
# over the tunneled TPU an uncached compile costs ~90 s+ of service latency)
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
DET=${1:-artifacts_r3/det_seg}
ENC=${2:-artifacts_r2/enc_long}
RH=${3:-artifacts_r3/refine_head}
OUT=${4:-artifacts_r3}
mkdir -p "$OUT"
# --refine-head-flip n = quality-first serving config (head corrects corners,
# dual-orientation embedding + index match decides 180° orientation): measured
# r3, the head's flip logit collapses off-distribution (refparity flip 0.37 →
# 0.30, refdist 0.11 → 0.033, top-1 0.835 → 0.901) while costing only the 2×
# encoder pass. The throughput-first config drops the flag (bench.py).
COMMON=(--det "$DET" --enc "$ENC" --enc-model cnvnxt2ae_nano --n-scenes 40
        --refine-head "$RH" --refine-redewarp y --refine-iters 3
        --refine-head-flip n)

python -m mtgvision_tpu.eval.system "${COMMON[@]}" \
  --n-cards 1024 --min-area-ratio 0.08 --max-cards 4 \
  --json-out "$OUT/e2e_headline.json" --details-out "$OUT/e2e_headline_details.jsonl"

python -m mtgvision_tpu.eval.system "${COMMON[@]}" \
  --n-cards 512 --min-area-ratio 0.02 --max-cards 4 \
  --json-out "$OUT/e2e_refdist.json" --details-out "$OUT/e2e_refdist_details.jsonl"

python -m mtgvision_tpu.eval.system "${COMMON[@]}" \
  --n-cards 512 --min-area-ratio 0.02 --max-cards 4 \
  --jitter 0.7 --min-visible-edge 0.0 --ratio-bg 0.1 \
  --json-out "$OUT/e2e_refparity.json" --details-out "$OUT/e2e_refparity_details.jsonl"

python -m mtgvision_tpu.eval.system "${COMMON[@]}" \
  --n-cards 1024 --min-area-ratio 0.10 --max-cards 1 \
  --json-out "$OUT/e2e_singlecard.json" --details-out "$OUT/e2e_singlecard_details.jsonl"

python -m mtgvision_tpu.eval.system "${COMMON[@]}" \
  --n-cards 512 --min-area-ratio 0.02 --max-cards 4 --oracle y \
  --json-out "$OUT/e2e_oracle_refdist.json"
