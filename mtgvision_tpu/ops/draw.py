"""Debug drawing + misc cv2-util parity (host-side numpy).

Rebuilds mtgvision/util/cv2.py: polygon convexity check (:38), upright quad
flip (:54), polygon expand (:67) / center (:76), debug drawing
``draw_poly``/``draw_arrow``/``draw_text`` (:129-179), ``lerp_color`` (:117),
plus ``image2base64`` (util/image.py:168). Drawing writes into numpy arrays
directly — no cv2 dependency in the hot path (vis only)."""

from __future__ import annotations

import base64
import io

import numpy as np


def is_convex(poly: np.ndarray) -> bool:
    """True if the polygon's turns all share a sign (util/cv2.py:38-51)."""
    n = len(poly)
    signs = []
    for i in range(n):
        a, b, c = poly[i], poly[(i + 1) % n], poly[(i + 2) % n]
        cr = (b[0] - a[0]) * (c[1] - b[1]) - (b[1] - a[1]) * (c[0] - b[0])
        if abs(cr) > 1e-9:
            signs.append(np.sign(cr))
    return len(set(signs)) <= 1


def flip_upright(quad: np.ndarray) -> np.ndarray:
    """Reorder a 4-point quad so it reads upright: roll so the topmost-left
    point leads and winding is clockwise in screen coords (util/cv2.py:54-64)."""
    quad = np.asarray(quad, np.float64)
    # ensure clockwise (positive shoelace in y-down coords)
    x, y = quad[:, 0], quad[:, 1]
    if 0.5 * np.sum(x * np.roll(y, -1) - y * np.roll(x, -1)) < 0:
        quad = quad[::-1]
    start = int(np.argmin(quad[:, 0] + quad[:, 1]))
    return np.roll(quad, -start, axis=0)


def expand_poly(poly: np.ndarray, amount: float) -> np.ndarray:
    """Scale a polygon outward about its centroid (util/cv2.py:67-74)."""
    c = poly.mean(0)
    return c + (poly - c) * (1.0 + amount)


def poly_center(poly: np.ndarray) -> np.ndarray:
    return np.asarray(poly, np.float64).mean(0)


def lerp_color(a, b, t: float):
    """Linear color blend (util/cv2.py:117-126)."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return tuple(a + (b - a) * float(np.clip(t, 0, 1)))


def _stroke(img: np.ndarray, a, b, color, thickness: int = 1):
    a, b = np.asarray(a, float), np.asarray(b, float)
    n = int(max(abs(b - a).max(), 1)) + 1
    xs = np.linspace(a[0], b[0], n)
    ys = np.linspace(a[1], b[1], n)
    h, w = img.shape[:2]
    r = max(0, thickness // 2)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            xi = np.clip(xs + dx, 0, w - 1).astype(int)
            yi = np.clip(ys + dy, 0, h - 1).astype(int)
            img[yi, xi] = color


def draw_poly(img: np.ndarray, poly: np.ndarray, color=(0, 1, 0), thickness: int = 1):
    """In-place polygon outline (util/cv2.py:129-142)."""
    poly = np.asarray(poly)
    for i in range(len(poly)):
        _stroke(img, poly[i], poly[(i + 1) % len(poly)], color, thickness)
    return img


def draw_arrow(img: np.ndarray, a, b, color=(1, 0, 0), thickness: int = 1):
    """In-place arrow a→b with a simple head (util/cv2.py:145-160)."""
    a, b = np.asarray(a, float), np.asarray(b, float)
    _stroke(img, a, b, color, thickness)
    d = b - a
    n = np.linalg.norm(d)
    if n > 1e-6:
        d = d / n
        perp = np.asarray([-d[1], d[0]])
        size = min(10.0, n * 0.3)
        _stroke(img, b, b - d * size + perp * size * 0.5, color, thickness)
        _stroke(img, b, b - d * size - perp * size * 0.5, color, thickness)
    return img


_GLYPHS = {  # minimal 3×5 bitmap font for debug labels (digits + few letters)
    "0": "111101101101111", "1": "010110010010111", "2": "111001111100111",
    "3": "111001111001111", "4": "101101111001001", "5": "111100111001111",
    "6": "111100111101111", "7": "111001001001001", "8": "111101111101111",
    "9": "111101111001111", ".": "000000000000010", "-": "000000111000000",
    "#": "101111101111101", "?": "111001010000010", " ": "000000000000000",
}


def draw_text(img: np.ndarray, org, text: str, color=(1, 1, 1), scale: int = 2):
    """In-place tiny bitmap text (debug only; util/cv2.py:163-179)."""
    x0, y0 = int(org[0]), int(org[1])
    h, w = img.shape[:2]
    for ci, ch in enumerate(str(text)):
        bits = _GLYPHS.get(ch, _GLYPHS["?"])
        for i, bit in enumerate(bits):
            if bit == "1":
                yy = y0 + (i // 3) * scale
                xx = x0 + ci * 4 * scale + (i % 3) * scale
                if 0 <= yy < h - scale and 0 <= xx < w - scale:
                    img[yy : yy + scale, xx : xx + scale] = color
    return img


def image2base64(img: np.ndarray, fmt: str = "jpeg", quality: int = 85) -> str:
    """float [0,1] or uint8 image → base64 string (util/image.py:168-182)."""
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if fmt.lower() in ("jpg", "jpeg"):
        from mtgvision_tpu.utils.native import encode_jpeg

        return base64.b64encode(encode_jpeg(img, quality)).decode()
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format=fmt.upper())
    return base64.b64encode(buf.getvalue()).decode()
