"""Index population: embed the card census into the vector store.

Replaces mtgvision/qdrant_populate.py (4 multiprocessing workers × batch 32,
each doing download → crop → CoreML embed → HTTP upsert, :29-134) and
qdrant_populate_card_info.py (payload backfill, :40-49).

TPU-first restructuring: no worker processes — one device does the embedding
at thousands of cards/s, so the pipeline is a simple batched loop:
catalog images → ``make_cropped_batch`` → encoder → ``save_points``.
Resumability is preserved: already-indexed ids are skipped
(qdrant_populate.py:73-75), so a crashed run continues where it stopped.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from mtgvision_tpu.data.catalog import CardCatalog
from mtgvision_tpu.data.encoder_gen import make_cropped_batch
from mtgvision_tpu.index.store import VectorPoint, VectorStore


def populate_index(
    store: VectorStore,
    catalog: CardCatalog,
    encode_batch: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 64,
    crop_hw: tuple[int, int] = (192, 128),
    limit: Optional[int] = None,
    progress: bool = False,
) -> int:
    """Embed + upsert every catalog card not yet indexed. Returns #added.

    ``encode_batch``: (B,H,W,3) float32 → (B, D) embeddings (e.g.
    ``Encoder.predict_batch`` or a jitted apply).
    """
    cards = list(catalog)[: limit or None]
    existing = {p.id for p in store.retrieve([c.id for c in cards], with_payload=False)}
    todo = [c for c in cards if c.id not in existing]
    it = range(0, len(todo), batch_size)
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(it, desc="populate")
        except ImportError:
            pass
    added = 0
    flip_aware = getattr(store, "flip_aware", False)
    for off in it:
        chunk = todo[off : off + batch_size]
        imgs = np.stack([catalog.get_image(c) for c in chunk])
        crops = np.asarray(make_cropped_batch(jnp.asarray(imgs), size_hw=crop_hw))
        zs = np.asarray(encode_batch(crops))
        fzs = [None] * len(chunk)
        if flip_aware:
            # 180°-rotated embeddings fill the store's flipped half: serving
            # then decides crop orientation from ONE encoder pass (the top
            # match's row half) instead of embedding both orientations
            fzs = np.asarray(encode_batch(np.rot90(crops, 2, axes=(1, 2)).copy()))
        store.save_points(
            [
                VectorPoint(id=c.id, vector=z, flip_vector=fz,
                            payload={"name": c.name, "set": c.set_code})
                for c, z, fz in zip(chunk, zs, fzs)
            ]
        )
        added += len(chunk)
    return added


def populate_card_info(store: VectorStore, catalog: CardCatalog) -> int:
    """Backfill full raw card payloads (qdrant_populate_card_info.py:40-49);
    errors on individual cards are skipped (catch-and-continue :44-49)."""
    n = 0
    for info in catalog.yield_raw_info():
        try:
            store.update_payload(info["id"], info)
            n += 1
        except Exception:
            continue
    return n
