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


def mask_contour(
    mask: np.ndarray, thresh: float = 0.5, simplify: bool = True, max_pts: int = 64
) -> np.ndarray:
    """Outer boundary polygon of a binary mask — the masks.xy equivalent the
    reference gets from ultralytics (od_export.py:150-153) and serves as the
    raw ``polygon`` wire field (server.py:59-82).

    Pure numpy: extract all oriented boundary edges (inside kept on the
    right, y-down screen coords) and chain them into loops; return the
    largest loop's vertices as (N, 2) float xy in PIXEL CENTER coordinates
    (vertex grid shifted by -0.5). Collinear runs are dropped and the result
    subsampled to ``max_pts``. Empty mask → (0, 2).
    """
    b = np.asarray(mask) > thresh
    if not b.any():
        return np.zeros((0, 2), np.float32)
    p = np.pad(b, 1)
    ii, jj = np.nonzero(p)
    # oriented boundary edges between lattice corners (x=j, y=i)
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(a, bpt):
        edges.setdefault(a, []).append(bpt)

    up = ~p[ii - 1, jj]
    dn = ~p[ii + 1, jj]
    lf = ~p[ii, jj - 1]
    rt = ~p[ii, jj + 1]
    for i, j, u, d, l, r in zip(ii, jj, up, dn, lf, rt):
        if u:
            add((j, i), (j + 1, i))  # top edge → +x (inside below/right)
        if d:
            add((j + 1, i + 1), (j, i + 1))  # bottom edge → −x
        if l:
            add((j, i + 1), (j, i))  # left edge → −y
        if r:
            add((j + 1, i), (j + 1, i + 1))  # right edge → +y

    loops = []
    while edges:
        start = next(iter(edges))
        loop = [start]
        cur = start
        for _ in range(4 * len(b.ravel())):
            nxts = edges.get(cur)
            if not nxts:
                break
            nxt = nxts.pop()
            if not nxts:
                edges.pop(cur, None)
            loop.append(nxt)
            cur = nxt
            if cur == start:
                break
        if len(loop) > 3 and loop[0] == loop[-1]:
            loops.append(np.asarray(loop[:-1], np.float32))

    if not loops:
        return np.zeros((0, 2), np.float32)
    pts = max(loops, key=poly_area)
    pts = pts - 1.5  # un-pad (1) + lattice corner → pixel-center (0.5)
    if simplify and len(pts) > 4:
        d1 = pts - np.roll(pts, 1, 0)
        d2 = np.roll(pts, -1, 0) - pts
        turn = np.abs(d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]) > 1e-9
        if turn.any():
            pts = pts[turn]  # drop collinear run interiors
    if len(pts) > max_pts:
        sel = np.linspace(0, len(pts) - 1, max_pts).astype(int)
        pts = pts[sel]
    return pts.astype(np.float32)
