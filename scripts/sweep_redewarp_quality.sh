#!/bin/bash
# r5 config sweep: how much headline top-1 does re-dewarping before embedding
# recover, and at what fps (scripts/probe_redewarp_fps.py measures the fps
# side: baseline 552.8 / full-redewarp 406.9 / sel2 468.3 fps)?
#
#   bash scripts/sweep_redewarp_quality.sh [outdir]
set -euo pipefail
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
DET=${DET:-artifacts_r3/det_seg}
ENC=${ENC:-artifacts_r4/enc_conf}
RH=${RH:-artifacts_r4/refine_head}
OUT=${1:-artifacts_r5/sweep}
mkdir -p "$OUT"
COMMON=(--det "$DET" --enc "$ENC" --enc-model cnvnxt2ae_nano --n-scenes 40
        --refine-head "$RH" --flip-aware-index y --refine-head-flip n
        --score-thresh 0.15 --n-cards 1024 --min-area-ratio 0.08 --max-cards 4)

python -m mtgvision_tpu.eval.system "${COMMON[@]}" \
  --refine-iters 1 --refine-redewarp n --sel-redewarp 2 \
  --json-out "$OUT/headline_sel2.json" --details-out "$OUT/headline_sel2.jsonl"

python -m mtgvision_tpu.eval.system "${COMMON[@]}" \
  --refine-iters 1 --refine-redewarp y \
  --json-out "$OUT/headline_rdw1.json" --details-out "$OUT/headline_rdw1.jsonl"

python -m mtgvision_tpu.eval.system "${COMMON[@]}" \
  --refine-iters 2 --refine-redewarp y \
  --json-out "$OUT/headline_rdw2.json" --details-out "$OUT/headline_rdw2.jsonl"
