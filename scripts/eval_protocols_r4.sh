#!/bin/bash
# Full-system e2e evaluation protocols (round 4). Same five protocols as
# scripts/eval_protocols.sh (r3) so numbers stay comparable, but the serving
# flags are a single SERVING_CONFIG block shared by every protocol AND by
# bench.py — the r3 verdict's top finding was that the benched config and the
# quality-table config were two different pipelines; r4's contract is ONE.
#
#   bash scripts/eval_protocols_r4.sh <det> <enc> <refine_head> <outdir>
#
# SERVING_CONFIG (overridable via env) defaults to the r4 unified serving
# config: single-orientation refine-head flip + 1 refine pass, i.e. EXACTLY
# what bench.py times.
set -euo pipefail
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
# det_seg is the r3 parity-distribution detector (unchanged in r4 — the r4
# detection gains came from score-threshold calibration, not retraining)
DET=${1:-artifacts_r3/det_seg}
ENC=${2:-artifacts_r4/enc_conf}
RH=${3:-artifacts_r4/refine_head}
OUT=${4:-artifacts_r4}
mkdir -p "$OUT"
# r4 unified serving config == bench.py's pipeline: refine-head corner
# correction (1 pass), FLIP-AWARE index (one encoder pass; the matched row
# half decides the 180° orientation), detector score threshold 0.15
SERVING_CONFIG=${SERVING_CONFIG:---flip-aware-index y --refine-head-flip n --refine-iters 1 --refine-redewarp n --score-thresh 0.15}
echo "serving config: $SERVING_CONFIG" >&2
COMMON=(--det "$DET" --enc "$ENC" --enc-model cnvnxt2ae_nano --n-scenes 40
        --refine-head "$RH" $SERVING_CONFIG)

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
