"""Host-side polygon geometry (numpy) — the shapely/GEOS replacement.

The reference leans on shapely for two jobs:
1. placement collision tests during detector scene-gen
   (mtgvision/od_datasets.py:354-371: intersection/difference areas,
   containment), and
2. the orientation-recovery morphological close (mtgvision/od_export.py:61-73)
   — that part is rebuilt on-device in mtgvision_tpu/infer/orient.py.

Here: Sutherland–Hodgman clipping + shoelace areas, enough for the rejection
sampler. These run on the host inside the (cheap) placement loop; the
heavy per-pixel work stays on device. Cards are near-convex quads (radial
corner jitter ≤ 30%), so convex clipping is exact for the visibility test and
a tight approximation for card-vs-card overlap.
"""

from __future__ import annotations

import numpy as np


def poly_area(pts: np.ndarray) -> float:
    """Shoelace area of an (N,2) polygon (absolute)."""
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def clip_poly(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` (N,2) by CONVEX ``clip`` (M,2).

    Returns the (K,2) clipped polygon (possibly empty). Clip orientation is
    normalized internally.
    """
    # ensure counter-clockwise clip polygon
    x, y = clip[:, 0], clip[:, 1]
    signed = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    if signed < 0:
        clip = clip[::-1]

    out = list(subject.astype(np.float64))
    m = len(clip)
    for i in range(m):
        a, b = clip[i], clip[(i + 1) % m]
        edge = b - a
        if not out:
            break
        inp = out
        out = []

        def inside(p):
            return edge[0] * (p[1] - a[1]) - edge[1] * (p[0] - a[0]) >= 0

        def intersect(p, q):
            d = q - p
            denom = edge[0] * d[1] - edge[1] * d[0]
            if abs(denom) < 1e-12:
                return q
            t = (edge[0] * (a[1] - p[1]) - edge[1] * (a[0] - p[0])) / denom
            return p + t * d

        s = inp[-1]
        for e in inp:
            if inside(e):
                if not inside(s):
                    out.append(intersect(np.asarray(s), np.asarray(e)))
                out.append(e)
            elif inside(s):
                out.append(intersect(np.asarray(s), np.asarray(e)))
            s = e
    return np.asarray(out) if out else np.zeros((0, 2))


def poly_intersection_area(a: np.ndarray, b: np.ndarray) -> float:
    """Area of a ∩ b (b must be convex; a arbitrary simple polygon)."""
    return poly_area(clip_poly(a, b))


def _cross2(a, b) -> float:
    return a[0] * b[1] - a[1] * b[0]


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain hull, (N,2) → (H,2) counter-clockwise."""
    pts = np.unique(pts.round(9), axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and _cross2(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def poly_contains(outer: np.ndarray, inner: np.ndarray, tol: float = 1e-6) -> bool:
    """True if convex ``outer`` fully contains ``inner`` (area test)."""
    ia = poly_area(inner)
    if ia == 0:
        return True
    return poly_intersection_area(inner, outer) >= ia * (1.0 - tol)
