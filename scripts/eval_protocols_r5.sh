#!/bin/bash
# Full-system e2e evaluation protocols (round 5). Same underlying protocols
# as r4 (numbers stay comparable) plus the NEW track-level protocols — the
# serving system's user-facing accuracy is per-TRACK (temporal fusion,
# reference server.py:133-205), which single-frame protocols understate.
#
#   bash scripts/eval_protocols_r5.sh <det> <enc> <refine_head> <outdir>
#
# ONE serving config (bench.py times exactly this): flip-aware index +
# refine-head corner correction + SELECTIVE redewarp on the 2 hardest slots
# per frame + top-3 flip vote + detector score threshold 0.15.
set -euo pipefail
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
DET=${1:-artifacts_r5/det_seg}
ENC=${2:-artifacts_r5/enc_conf}
RH=${3:-artifacts_r4/refine_head}
OUT=${4:-artifacts_r5}
mkdir -p "$OUT"
SERVING_CONFIG=${SERVING_CONFIG:---flip-aware-index y --refine-head-flip n --refine-iters 1 --refine-redewarp n --sel-redewarp 2 --flip-vote-m 3 --dewarp-window 160 --score-thresh 0.15}
echo "serving config: $SERVING_CONFIG" >&2
COMMON=(--det "$DET" --enc "$ENC" --enc-model cnvnxt2ae_nano --n-scenes 40
        --refine-head "$RH" $SERVING_CONFIG)

# single-frame protocols (r4 parity)
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

# oracle under the REFPARITY distribution (jitter 0.7, half off-frame):
# the appearance ceiling of the hardest protocol — splits "corners can't
# recover under heavy jitter" from "the crop is unidentifiable anyway"
python -m mtgvision_tpu.eval.system "${COMMON[@]}" \
  --n-cards 512 --min-area-ratio 0.02 --max-cards 4 --oracle y \
  --jitter 0.7 --min-visible-edge 0.0 \
  --json-out "$OUT/e2e_oracle_refparity.json"

# NEW track-level protocols: N-frame jittered sequences, scored per TRACK
# through the real tracker + EWMA fusion (eval/track_eval.py)
python -m mtgvision_tpu.eval.system "${COMMON[@]}" \
  --n-cards 1024 --min-area-ratio 0.08 --max-cards 4 --track-frames 8 \
  --json-out "$OUT/e2e_headline_tracked.json" \
  --details-out "$OUT/e2e_headline_tracked_details.jsonl"

python -m mtgvision_tpu.eval.system "${COMMON[@]}" \
  --n-cards 512 --min-area-ratio 0.02 --max-cards 4 --track-frames 8 \
  --jitter 0.7 --min-visible-edge 0.0 --ratio-bg 0.1 \
  --json-out "$OUT/e2e_refparity_tracked.json" \
  --details-out "$OUT/e2e_refparity_tracked_details.jsonl"

# real-data-path e2e under the SAME unified config (one-config contract)
python scripts/e2e_scryfall_fixture.py --det "$DET" --enc "$ENC" \
  --refine-head "$RH" --sel-redewarp 2 --flip-vote-m 3 --dewarp-window 160 \
  --out "$OUT/e2e_scryfall_fixture.json" \
  --details-out "$OUT/e2e_scryfall_fixture_details.jsonl"

# obb-kind detector scored at FULL protocol scale on TPU (the r4 claim was a
# 20-scene CPU probe — VERDICT r4 weak #5). Same headline distribution and
# serving tail as the seg flagship.
OBB_DET=${OBB_DET:-artifacts_r3/det_obb}
if [ -d "$OBB_DET" ]; then
python -m mtgvision_tpu.eval.system --det "$OBB_DET" --det-kind obb \
  --enc "$ENC" --enc-model cnvnxt2ae_nano --n-scenes 40 \
  --refine-head "$RH" $SERVING_CONFIG \
  --n-cards 1024 --min-area-ratio 0.08 --max-cards 4 \
  --json-out "$OUT/e2e_headline_obb.json" \
  --details-out "$OUT/e2e_headline_obb_details.jsonl"
fi
