"""File utilities — mtgvision/util/files.py parity.

``get_image_paths`` (:35-54, recursive image listing with extension filter and
optional shuffling) and ``init_dir`` (:57-62). Plus host image IO
(``imread_float``/``imwrite`` — util/image.py:96-130) on the native JPEG codec
with PIL fallback.
"""

from __future__ import annotations

import pathlib
from typing import Sequence

import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def get_image_paths(
    root: str | pathlib.Path,
    exts: Sequence[str] = IMAGE_EXTS,
    recursive: bool = True,
    shuffle_seed: int | None = None,
) -> list[pathlib.Path]:
    """Sorted (or seeded-shuffled) image files under ``root`` (files.py:35-54)."""
    root = pathlib.Path(root)
    it = root.rglob("*") if recursive else root.glob("*")
    paths = sorted(p for p in it if p.suffix.lower() in exts and p.is_file())
    if shuffle_seed is not None:
        rng = np.random.default_rng(shuffle_seed)
        paths = [paths[i] for i in rng.permutation(len(paths))]
    return paths


def init_dir(path: str | pathlib.Path, is_file: bool = False) -> pathlib.Path:
    """mkdir -p the dir (or the file's parent) and return the path (files.py:57-62)."""
    path = pathlib.Path(path)
    (path.parent if is_file else path).mkdir(parents=True, exist_ok=True)
    return path


def imread_float(path: str | pathlib.Path) -> np.ndarray:
    """(H,W,3) float32 [0,1] from disk (util/image.py:107-130), native jpeg path."""
    path = pathlib.Path(path)
    if path.suffix.lower() in (".jpg", ".jpeg"):
        from mtgvision_tpu.utils.native import decode_jpeg

        try:
            return decode_jpeg(path.read_bytes()).astype(np.float32) / 255.0
        except Exception:
            pass
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def imwrite(path: str | pathlib.Path, img: np.ndarray) -> None:
    """Write a float [0,1] or uint8 image (util/image.py:96-104)."""
    path = init_dir(path, is_file=True)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    if path.suffix.lower() in (".jpg", ".jpeg"):
        from mtgvision_tpu.utils.native import encode_jpeg

        path.write_bytes(encode_jpeg(img, quality=92))
        return
    from PIL import Image

    Image.fromarray(img).save(path)
