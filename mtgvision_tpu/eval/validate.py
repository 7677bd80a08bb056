"""Retrieval accuracy validation — encoder_validate parity.

Rebuild of mtgvision/encoder_validate.py:22-118: for N cards, embed three
input variants — plain resized scan ("orig"), 2%-border crop ("crop"), and a
full synthetic composite ("virtual") — query top-k against the index, count
top-1 / top-5 hits per variant.

Batched: each variant is embedded and queried in device batches instead of
the reference's one-card-at-a-time CoreML loop.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from mtgvision_tpu.data.catalog import Backgrounds, CardCatalog
from mtgvision_tpu.data.encoder_gen import make_cropped_batch, make_virtual_batch
from mtgvision_tpu.index.store import VectorStore
from mtgvision_tpu.ops.image import resize


@dataclasses.dataclass
class Stat:
    """top-1/top-5 counters (encoder_validate.py:58-83)."""

    name: str
    top1: int = 0
    top5: int = 0
    total: int = 0

    def update(self, target_id: str, result_ids: list[str]):
        self.total += 1
        if result_ids[:1] == [target_id]:
            self.top1 += 1
        if target_id in result_ids[:5]:
            self.top5 += 1

    @property
    def acc1(self) -> float:
        return self.top1 / max(self.total, 1)

    @property
    def acc5(self) -> float:
        return self.top5 / max(self.total, 1)

    def __str__(self):
        return f"{self.name}: top1={self.acc1:.3f} top5={self.acc5:.3f} (n={self.total})"


def validate_retrieval(
    store: VectorStore,
    catalog: CardCatalog,
    backgrounds: Backgrounds,
    encode_batch: Callable[[np.ndarray], np.ndarray],
    n: int = 1000,
    batch_size: int = 64,
    crop_hw: tuple[int, int] = (192, 128),
    modes: tuple[str, ...] = ("orig", "crop", "virtual"),
    k: int = 5,
    seed: int = 0,
) -> dict[str, Stat]:
    """Per-mode retrieval accuracy (encoder_validate.py:41-99 variants)."""
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    cards = list(catalog)
    idxs = rng.permutation(len(cards))[: min(n, len(cards))]
    stats = {m: Stat(m) for m in modes}

    for off in range(0, len(idxs), batch_size):
        chunk = [cards[i] for i in idxs[off : off + batch_size]]
        imgs = jnp.asarray(np.stack([catalog.get_image(c) for c in chunk]))
        variants = {}
        if "orig" in modes:
            variants["orig"] = resize(imgs, crop_hw)
        if "crop" in modes:
            variants["crop"] = make_cropped_batch(imgs, size_hw=crop_hw)
        if "virtual" in modes:
            bgs = jnp.asarray(
                np.stack([backgrounds.ran_image(rng) for _ in chunk])
            )
            key, sub = jax.random.split(key)
            variants["virtual"] = make_virtual_batch(sub, imgs, bgs, size_hw=crop_hw)
        for mode, batch in variants.items():
            zs = np.asarray(encode_batch(np.asarray(batch)))
            results = store.query_nearby_batch(zs, k=k, with_payload=False)
            for c, res in zip(chunk, results):
                stats[mode].update(c.id, [r.id for r in res])
    return stats
