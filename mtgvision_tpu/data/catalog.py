"""Card catalog + background providers (host side).

Replaces the reference's external ``mtgdata``/``doorway`` stack
(mtgvision/encoder_datasets.py:421-668: ``SyntheticBgFgMtgImages`` wrapping
ScryfallDataset with id/name/set indexes, similar-card lookup, lazy image
download; ``IlsvrcImages``/``CocoValImages`` background dirs):

- :class:`ScryfallCatalog` — offline-first: reads a Scryfall bulk-data JSON
  (``default_cards``/``unique_artwork`` dump) and a local image cache dir
  ``{root}/images/{card_id}.jpg``. This container has zero egress, so there is
  deliberately no downloader; point ``root`` at a pre-fetched dump. The
  indexing/labeling semantics mirror encoder_datasets.py:561-630.
- :class:`ProceduralCatalog` — deterministic synthetic "cards" so the whole
  training/eval stack runs hermetically: each card id renders a unique layered
  card face (frame, art box, title/text bars) from a hash-seeded RNG; printings
  of the same *name* share art but differ in frame color — preserving the
  hard-negative structure ``get_similar_card`` relies on
  (encoder_datasets.py:619-630).
- Background providers mirroring IlsvrcImages/CocoValImages (:421-494):
  :class:`ImageDirBackgrounds` (any local image dir) and
  :class:`ProceduralBackgrounds` (smooth random fields).

Labels: every card maps to an int triple (card_idx, name_idx, set_idx) exactly
like ``card_get_labels`` (encoder_datasets.py:586-599).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import pathlib
from typing import Iterator, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class Card:
    """Minimal card record (mirror of the ScryfallCardFace fields the
    reference actually uses)."""

    id: str
    name: str
    set_code: str
    raw: dict | None = None


class CardCatalog:
    """Index + image access over a card census."""

    def __init__(self, cards: Sequence[Card], card_hw: tuple[int, int] = (448, 320)):
        self.card_hw = card_hw
        self._cards = list(cards)
        self._by_id = {c.id: i for i, c in enumerate(self._cards)}
        # name/set integer label spaces (encoder_datasets.py:561-599)
        names = sorted({c.name for c in self._cards})
        sets = sorted({c.set_code for c in self._cards})
        self._name_idx = {n: i for i, n in enumerate(names)}
        self._set_idx = {s: i for i, s in enumerate(sets)}
        self._by_name: dict[str, list[int]] = {}
        for i, c in enumerate(self._cards):
            self._by_name.setdefault(c.name, []).append(i)

    # -- census -------------------------------------------------------------

    def __len__(self) -> int:
        return len(self._cards)

    def __iter__(self) -> Iterator[Card]:
        return iter(self._cards)

    @property
    def num_names(self) -> int:
        return len(self._name_idx)

    @property
    def num_sets(self) -> int:
        return len(self._set_idx)

    def card_by_index(self, i: int) -> Card:
        return self._cards[i]

    def get_card_by_id(self, id_: str) -> Card:
        return self._cards[self._by_id[id_]]

    def ran_card(self, rng: np.random.Generator) -> Card:
        return self._cards[int(rng.integers(len(self._cards)))]

    def card_get_labels(self, card: Card) -> tuple[int, int, int]:
        """(card_idx, name_idx, set_idx) int labels (encoder_datasets.py:586-599)."""
        return (
            self._by_id[card.id],
            self._name_idx[card.name],
            self._set_idx[card.set_code],
        )

    def get_similar_card(self, card: Card, rng: np.random.Generator) -> Card:
        """Same-name different-printing — hard negative (encoder_datasets.py:619-630).
        Falls back to the card itself if it's the only printing."""
        idxs = self._by_name[card.name]
        if len(idxs) == 1:
            return card
        me = self._by_id[card.id]
        choice = me
        while choice == me:
            choice = idxs[int(rng.integers(len(idxs)))]
        return self._cards[choice]

    def yield_raw_info(self) -> Iterator[dict]:
        """Raw per-card payload stream (qdrant_populate_card_info.py:43-49)."""
        for c in self._cards:
            yield c.raw if c.raw is not None else {
                "id": c.id, "name": c.name, "set": c.set_code,
            }

    # -- images -------------------------------------------------------------

    def get_image(self, card: Card) -> np.ndarray:
        """(H, W, 3) float32 [0,1] card face at ``self.card_hw``."""
        raise NotImplementedError


class ScryfallCatalog(CardCatalog):
    """Offline Scryfall bulk-data catalog.

    ``root`` layout::

        root/bulk.json            # scryfall bulk list (array of card objects)
        root/images/{id}.jpg|png  # pre-fetched card images

    Image decode prefers PIL, falls back to cv2 if available.
    """

    def __init__(self, root: str | pathlib.Path, card_hw: tuple[int, int] = (448, 320)):
        self.root = pathlib.Path(root)
        bulk = self.root / "bulk.json"
        if not bulk.exists():
            raise FileNotFoundError(
                f"{bulk} not found — ScryfallCatalog is offline-only; pre-fetch a "
                "scryfall bulk dump (or use ProceduralCatalog for hermetic runs)"
            )
        records = json.loads(bulk.read_text())
        cards = [
            Card(id=r["id"], name=r["name"], set_code=r.get("set", "unk"), raw=r)
            for r in records
        ]
        super().__init__(cards, card_hw)

    def get_image(self, card: Card) -> np.ndarray:
        for ext in (".jpg", ".png", ".jpeg"):
            p = self.root / "images" / f"{card.id}{ext}"
            if p.exists():
                return _load_resize(p, self.card_hw)
        raise FileNotFoundError(f"no image for card {card.id} under {self.root}/images")


def _load_resize(path: pathlib.Path, hw: tuple[int, int]) -> np.ndarray:
    if path.suffix.lower() in (".jpg", ".jpeg"):
        # native fused DCT-scaled decode+resize (utils/native.py)
        from mtgvision_tpu.utils.native import decode_jpeg_resize

        try:
            return decode_jpeg_resize(path.read_bytes(), hw).astype(np.float32) / 255.0
        except Exception:
            pass
    from PIL import Image

    im = Image.open(path).convert("RGB").resize((hw[1], hw[0]), Image.BILINEAR)
    return np.asarray(im, np.float32) / 255.0


def _seed_from(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "little")


class ProceduralCatalog(CardCatalog):
    """Deterministic synthetic card census for hermetic training/eval.

    ``n_cards`` cards over ``n_names`` names (same-name printings share art)
    across ``n_sets`` sets. Rendering is pure numpy from a per-card hash
    seed, so any card can be regenerated anywhere.

    ``confusable``: controls how much same-name printings differ.
    - False (legacy): frame color and text box are printing-specific —
      printings differ over ~50% of the card's pixels, which saturated the
      retrieval benchmark (r2 validate_10k top-1 = 1.000 everywhere).
    - True: frame, art, title AND text box are all name-specific; printings
      differ ONLY in a small set-symbol glyph patch (~1% of the card, right
      edge between art and text box) — the real-Scryfall regime where
      same-name printings are near-identical scans distinguished by the set
      symbol (reference encoder_validate.py:56-99 difficulty).
    """

    def __init__(
        self,
        n_cards: int = 512,
        n_names: int | None = None,
        n_sets: int = 8,
        card_hw: tuple[int, int] = (448, 320),
        confusable: bool = False,
    ):
        n_names = n_names or max(1, n_cards // 2)  # avg 2 printings per name
        cards = [
            Card(
                id=f"proc-{i:06d}",
                name=f"name-{i % n_names:06d}",
                set_code=f"s{i % n_sets:02d}",
            )
            for i in range(n_cards)
        ]
        self.confusable = confusable
        super().__init__(cards, card_hw)

    def get_image(self, card: Card) -> np.ndarray:
        h, w = self.card_hw
        art_rng = np.random.default_rng(_seed_from("art:" + card.name))
        # confusable mode: every printing-varying region except the set
        # symbol draws from the NAME stream, so printings are near-identical
        id_rng = (
            np.random.default_rng(_seed_from("art2:" + card.name))
            if self.confusable
            else np.random.default_rng(_seed_from("id:" + card.id))
        )

        yy, xx = np.meshgrid(
            np.linspace(0, 1, h, dtype=np.float32),
            np.linspace(0, 1, w, dtype=np.float32),
            indexing="ij",
        )
        # frame color — printing-specific
        frame = id_rng.random(3).astype(np.float32) * 0.6 + 0.2
        img = np.broadcast_to(frame, (h, w, 3)).copy()

        # art box (name-specific): sum of random sinusoids
        a0, a1 = int(0.10 * h), int(0.55 * h)
        m0, m1 = int(0.07 * w), int(0.93 * w)
        art = np.zeros((a1 - a0, m1 - m0, 3), np.float32)
        ayy, axx = yy[a0:a1, m0:m1], xx[a0:a1, m0:m1]
        for _ in range(6):
            fy, fx, ph = art_rng.uniform(1, 9, 3)
            col = art_rng.random(3).astype(np.float32)
            art += col * (0.5 + 0.5 * np.sin(fy * ayy * 6.28 + fx * axx * 6.28 + ph))[..., None]
        img[a0:a1, m0:m1] = art / art.max()

        # title bar (name-specific glyph stripes) + text box (id-specific)
        t0, t1 = int(0.02 * h), int(0.09 * h)
        stripes = (np.sin(xx[t0:t1, m0:m1] * art_rng.uniform(30, 90)) > art_rng.uniform(-0.5, 0.5))
        img[t0:t1, m0:m1] = np.where(stripes[..., None], 0.9, 0.1)
        b0, b1 = int(0.60 * h), int(0.95 * h)
        dots = id_rng.random((8, 16)) > 0.5
        dots = np.kron(dots, np.ones(((b1 - b0) // 8 + 1, (m1 - m0) // 16 + 1)))[
            : b1 - b0, : m1 - m0
        ]
        img[b0:b1, m0:m1] = np.where(dots[..., None], 0.85, 0.15)

        if self.confusable:
            # set-symbol glyph — the ONLY printing-specific region (~1% of
            # pixels): a 6×8 binary glyph at the right edge between art and
            # text box, like a real MTG set symbol
            sym_rng = np.random.default_rng(_seed_from("sym:" + card.id))
            s0, s1 = int(0.555 * h), int(0.595 * h)
            c0, c1 = int(0.84 * w), int(0.93 * w)
            glyph = sym_rng.random((6, 8)) > 0.5
            glyph = np.kron(
                glyph, np.ones(((s1 - s0) // 6 + 1, (c1 - c0) // 8 + 1))
            )[: s1 - s0, : c1 - c0]
            col = sym_rng.random(3).astype(np.float32) * 0.7 + 0.15
            img[s0:s1, c0:c1] = np.where(glyph[..., None], col, 0.05)

        return np.clip(img, 0.0, 1.0).astype(np.float32)


# ---------------------------------------------------------------------------
# backgrounds (encoder_datasets.py:421-494)
# ---------------------------------------------------------------------------


class Backgrounds:
    def ran_image(self, rng: np.random.Generator) -> np.ndarray:
        raise NotImplementedError


class ImageDirBackgrounds(Backgrounds):
    """Random images from a local dir — IlsvrcImages/CocoValImages equivalent
    (encoder_datasets.py:421-494), any flat or nested image dir."""

    EXTS = (".jpg", ".jpeg", ".png", ".bmp")

    def __init__(self, root: str | pathlib.Path, bg_hw: tuple[int, int] = (256, 256)):
        self.root = pathlib.Path(root)
        self.bg_hw = bg_hw
        self.paths = sorted(
            p for p in self.root.rglob("*") if p.suffix.lower() in self.EXTS
        )
        if not self.paths:
            raise FileNotFoundError(f"no images under {self.root}")

    def __len__(self):
        return len(self.paths)

    def ran_path(self, rng: np.random.Generator) -> pathlib.Path:
        return self.paths[int(rng.integers(len(self.paths)))]

    def ran_image(self, rng: np.random.Generator) -> np.ndarray:
        return _load_resize(self.ran_path(rng), self.bg_hw)


class IlsvrcImages(ImageDirBackgrounds):
    """ILSVRC-2010 validation images as backgrounds (encoder_datasets.py:421-478).

    Point ``root`` at the extracted val dir; any nested layout works."""

    def __init__(self, root: str | pathlib.Path, bg_hw: tuple[int, int] = (256, 256)):
        super().__init__(root, bg_hw)


class CocoValImages(ImageDirBackgrounds):
    """COCO-2017 val images as backgrounds (encoder_datasets.py:480-494)."""

    def __init__(self, root: str | pathlib.Path, bg_hw: tuple[int, int] = (256, 256)):
        super().__init__(root, bg_hw)


class MixedBackgrounds(Backgrounds):
    """Weighted mix of background sources — the reference samples ILSVRC vs
    COCO with weights (od_datasets.py:663-668 ilsvrc_vs_coco_sample_weights)."""

    def __init__(self, sources: Sequence[Backgrounds], weights: Sequence[float] | None = None):
        self.sources = list(sources)
        w = np.asarray(weights if weights is not None else [1.0] * len(self.sources), float)
        self.p = w / w.sum()

    def ran_image(self, rng: np.random.Generator) -> np.ndarray:
        src = self.sources[int(rng.choice(len(self.sources), p=self.p))]
        return src.ran_image(rng)


class ProceduralBackgrounds(Backgrounds):
    """Smooth random color fields (low-freq sinusoid mixtures) — hermetic
    stand-in for ILSVRC/COCO background photos."""

    def __init__(self, bg_hw: tuple[int, int] = (256, 256)):
        self.bg_hw = bg_hw

    def ran_image(self, rng: np.random.Generator) -> np.ndarray:
        h, w = self.bg_hw
        yy, xx = np.meshgrid(
            np.linspace(0, 1, h, dtype=np.float32),
            np.linspace(0, 1, w, dtype=np.float32),
            indexing="ij",
        )
        img = np.zeros((h, w, 3), np.float32)
        for _ in range(4):
            fy, fx, ph = rng.uniform(0.5, 5, 3)
            col = rng.random(3).astype(np.float32)
            img += col * (0.5 + 0.5 * np.sin(fy * yy * 6.28 + fx * xx * 6.28 + ph))[..., None]
        img /= img.max() + 1e-6
        # sprinkle texture
        img = np.clip(img + rng.normal(0, 0.03, img.shape).astype(np.float32), 0, 1)
        return img
