#!/bin/bash
# Round-5 training continuations. Both warm-start from the committed slim
# exports (train dirs are gitignored and do not survive rounds) and are
# checkpoint-resumable: rerunning the same command after a tunnel wedge
# resumes from the last saved step (ROUND4.md environment note).
#
#   bash scripts/train_r5.sh det   # detector occlusion-weighted fine-tune
#   bash scripts/train_r5.sh enc   # confusable-encoder continuation
set -euo pipefail
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"

case "${1:?det|enc}" in
det)
  # Occlusion-weighted fine-tune of the r3 parity detector (VERDICT r4 task
  # 1b — the knobs landed in r4, never exercised): num_cards_min=3 forces
  # most scenes into the multi-card overlap regime (placement allows up to
  # 50% pairwise occlusion), everything else stays at the reference-parity
  # active config (od_datasets.py:861-873). The GT masks are amodal
  # (analytic full-card notch polygons), so heavier occlusion exposure
  # trains the proto masks to stay amodal under occluders — the corner
  # misregistration source the r4 headline lost 0.36 top-1 to.
  exec python -m mtgvision_tpu.train.od_train \
    --init-params artifacts_r3/det_seg \
    --ckpt-dir ckpts_det_r5 \
    --max-steps 12000 --learning-rate 4e-4 --warmup-steps 300 \
    --num-cards-min 3 \
    --ratio-bg 0.1 --jitter-ratio 0.7 --min-visible-edge 0.0 \
    --scene-pool 2048 --scan-steps 50 \
    --pool-cache .run/det_r5_pool.npz
  ;;
enc)
  # Confusable-encoder continuation (VERDICT r4 task 3): 4k-card census
  # where same-name printings differ only in the set-symbol glyph;
  # similar-neg 0.4 forces glyph-level discrimination. Contrastive-only —
  # the slim export has no decoder, and recon grads through a fresh-init
  # decoder would corrupt the warm-started encoder.
  exec python -m mtgvision_tpu.train.encoder_train \
    --init-params artifacts_r4/enc_conf \
    --ckpt-dir ckpts_enc_r5 --checkpoint ckpts_enc_r5 \
    --confusable y --n-cards 4096 \
    --similar-neg-prob 0.4 \
    --loss-recon none \
    --max-steps 12000 --learning-rate 5e-4 \
    --scan-steps 20 --ckpt-every 1000
  ;;
esac
