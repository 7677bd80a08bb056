"""Oriented-corner recovery from notched card masks — on-device, batched.

Reference algorithm (mtgvision/od_export.py:52-93, `InstanceSeg._orient`):
shapely buffer(+d).buffer(−d) morphological close of the U-shaped mask
polygon, centroid(orig)−centroid(closed) as the top→bottom direction,
cv2.approxPolyN 4-corner fit, ray–edge intersection to find the bottom edge,
np.roll so corner 0 = top-left.

TPU-native redesign — same outputs, closed-form moment math instead of
GEOS/iterative polygon ops (no dynamic shapes, vmaps over detections):

1. image moments of the mask → centroid + covariance → principal axis
   (the card's long axis), eigendecomposition in closed form (2×2).
2. notch-side disambiguation: the bottom-center cutout shifts the centroid
   toward the top, so the max projection along the axis (distance centroid→
   edge) is LARGER toward the bottom → sign(extent) picks the true
   top→bottom direction (replaces the buffer-close + centroid-diff trick).
3. corners = extreme mask pixels along the two diagonal directions of the
   oriented frame (argmax of ±u±v over mask pixels) — exact for convex
   quads under perspective (replaces approxPolyN + ray test), returned
   rolled to [TL, TR, BR, BL] like the reference (:89-93).

`extract_dewarped` then matches od_export.py:95-110: homography from the 5%%-
expanded corner quad to the (192,128) card frame, bilinear warp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mtgvision_tpu.ops.warp import (
    apply_transform_points,
    perspective_from_quads,
    warp_perspective,
)


def orient_corners(mask: jnp.ndarray, sign_mode: str = "notch"):
    """(H, W) float mask → (corners (4,2) xy [TL,TR,BR,BL], ok flag).

    ``sign_mode`` selects the top/bottom disambiguation: "notch" (coverage
    difference in the central-strip end bands — see below) or "extent" (the
    r1 centroid-extent sign, kept for A/B evaluation).

    Fully differentiable-free forward math; NaN-safe for empty masks
    (ok=False and corners=0).
    """
    h, w = mask.shape
    m = mask.astype(jnp.float32)
    area = jnp.sum(m)
    ok = area > 8.0
    denom = jnp.maximum(area, 1e-6)

    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    cx = jnp.sum(m * xx) / denom
    cy = jnp.sum(m * yy) / denom
    dx = xx - cx
    dy = yy - cy

    # central second moments → principal axis (closed-form 2×2 eig)
    mxx = jnp.sum(m * dx * dx) / denom
    myy = jnp.sum(m * dy * dy) / denom
    mxy = jnp.sum(m * dx * dy) / denom
    # largest-eigenvalue eigenvector of [[mxx, mxy], [mxy, myy]]
    tr = mxx + myy
    det = mxx * myy - mxy * mxy
    lam = tr / 2.0 + jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    # eigenvector: (mxy, lam - mxx), fall back to (1,0)/(0,1) for axis-aligned
    v = jnp.where(
        jnp.abs(mxy) > 1e-6,
        jnp.stack([mxy, lam - mxx]),
        jnp.where(mxx >= myy, jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 1.0])),
    )
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-9)  # long (vertical) card axis

    # projections of mask pixels on the axis
    proj = dx * v[0] + dy * v[1]
    big = 1e9
    pmax = jnp.max(jnp.where(m > 0.5, proj, -big))
    pmin = jnp.min(jnp.where(m > 0.5, proj, big))

    # --- notch-side disambiguation -------------------------------------
    # The reference's U-shaped GT mask has a bottom-CENTER cutout
    # (od_datasets.py:491-516), so inside the central strip along the short
    # axis the mask covers LESS area at the notched (bottom) end. Compare
    # soft-mask coverage in the two end bands of that strip — far more
    # robust than the old centroid-extent sign (r1 flip_rate 0.14,
    # VERDICT weak #7), which leaned on a second-order asymmetry.
    perp = jnp.stack([v[1], -v[0]])
    uproj = dx * perp[0] + dy * perp[1]
    umax = jnp.max(jnp.where(m > 0.5, uproj, -big))
    umin = jnp.min(jnp.where(m > 0.5, uproj, big))
    ucen = 0.5 * (umax + umin)
    uhw = jnp.maximum(0.5 * (umax - umin), 1e-3)
    strip = m * (jnp.abs(uproj - ucen) < 0.18 * uhw)
    ext = jnp.maximum(pmax - pmin, 1e-3)
    band = 0.10 * ext
    cov_pos = jnp.sum(strip * (proj > pmax - band))
    cov_neg = jnp.sum(strip * (proj < pmin + band))
    # notch ⇒ less coverage at the bottom end; fall back to the extent sign
    # when the coverage difference is negligible (degenerate/clipped masks)
    asym = cov_neg - cov_pos  # >0 ⇒ +axis end is the notched (bottom) side
    ext_sign = jnp.where(pmax >= -pmin, 1.0, -1.0)
    rel = jnp.abs(asym) / jnp.maximum(cov_pos + cov_neg, 1e-3)
    if sign_mode == "extent":
        sign = ext_sign
    else:
        sign = jnp.where(rel > 0.04, jnp.sign(asym), ext_sign)
    down = v * sign  # unit vector pointing top→bottom of the card
    # left→right axis: down rotated −90° in y-DOWN screen coordinates
    right = jnp.stack([down[1], -down[0]])

    u = dx * right[0] + dy * right[1]
    t = dx * down[0] + dy * down[1]

    def extreme(score):
        idx = jnp.argmax(jnp.where(m > 0.5, score, -big))
        iy, ix = jnp.unravel_index(idx, (h, w))
        return jnp.stack([ix.astype(jnp.float32), iy.astype(jnp.float32)])

    tl = extreme(-u - t)
    tr_ = extreme(u - t)
    br = extreme(u + t)
    bl = extreme(-u + t)
    corners = jnp.stack([tl, tr_, br, bl])
    return jnp.where(ok, corners, jnp.zeros_like(corners)), ok


def refine_corners(mask: jnp.ndarray, corners: jnp.ndarray, iters: int = 2):
    """Subpixel corner refinement: weighted total-least-squares LINE fits to
    the four quad edges of the mask boundary, intersected pairwise.

    The extreme-pixel corners from ``orient_corners`` quantize to the mask
    grid (±1 px at proto res = ±4 px at frame res — the r1 ~15-19 px quad
    error, VERDICT weak #8). Under a homography card edges stay straight
    lines, so fitting each edge to ALL its boundary pixels (gradient-
    magnitude weighted, notch/corner regions excluded) and intersecting
    adjacent lines localizes corners well below pixel pitch. Pure
    reductions — no gathers, vmap/jit friendly.

    mask: (H, W) float; corners: (4, 2) coarse [TL,TR,BR,BL] (mask-res xy).
    Returns refined (4, 2) corners; falls back to the coarse corner when an
    edge fit is degenerate or the refinement moves a corner implausibly far.
    """
    h, w = mask.shape
    m = mask.astype(jnp.float32)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    # boundary weight = central-difference gradient magnitude
    gx = 0.5 * (jnp.roll(m, -1, 1) - jnp.roll(m, 1, 1))
    gy = 0.5 * (jnp.roll(m, -1, 0) - jnp.roll(m, 1, 0))
    bw = jnp.sqrt(gx * gx + gy * gy)
    # roll wraps the border row/col — zero them out
    edge_mask = jnp.zeros((h, w)).at[1:-1, 1:-1].set(1.0)
    bw = bw * edge_mask
    px = jnp.stack([xx + 0.0 * yy, yy + 0.0 * xx], -1)  # (H,W,2) pixel xy

    # edge windows along the edge direction (fractions of edge length):
    # exclude rounded corners everywhere; exclude the bottom-center notch
    # (scene_gen: qx∈[0.4w,0.6w] cutout) from the bottom edge
    lo = jnp.asarray([0.10, 0.10, 0.10, 0.10])
    hi = jnp.asarray([0.90, 0.90, 0.90, 0.90])
    notch = jnp.asarray([0.0, 0.0, 1.0, 0.0])  # edge 2 = bottom (BR→BL)

    def fit_lines(cs):
        a = cs  # (4,2) edge start = corner i
        b = jnp.roll(cs, -1, axis=0)  # edge end = corner i+1
        d = b - a
        length = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
        d = d / length  # (4,2) unit edge dirs
        n = jnp.stack([-d[:, 1], d[:, 0]], -1)  # normals
        rel = px[None] - a[:, None, None]  # (4,H,W,2)
        s = jnp.einsum("ehwc,ec->ehw", rel, n)  # signed dist to line
        t = jnp.einsum("ehwc,ec->ehw", rel, d) / length[:, None]  # along [0,1]
        prox = jnp.exp(-((s / 2.5) ** 2))
        win = (t > lo[:, None, None]) & (t < hi[:, None, None])
        notch_ex = notch[:, None, None] * ((t > 0.28) & (t < 0.72))
        wgt = bw[None] * prox * win * (1.0 - notch_ex)  # (4,H,W)
        tot = jnp.sum(wgt, (1, 2))  # (4,)
        denom = jnp.maximum(tot, 1e-6)[:, None]
        c = jnp.einsum("ehw,hwc->ec", wgt, px) / denom  # centroids
        rc = px[None] - c[:, None, None]
        cxx = jnp.sum(wgt * rc[..., 0] * rc[..., 0], (1, 2))
        cyy = jnp.sum(wgt * rc[..., 1] * rc[..., 1], (1, 2))
        cxy = jnp.sum(wgt * rc[..., 0] * rc[..., 1], (1, 2))
        # principal direction of the weighted scatter (2×2 closed form)
        tr_half = 0.5 * (cxx + cyy)
        disc = jnp.sqrt(jnp.maximum(tr_half**2 - (cxx * cyy - cxy * cxy), 0.0))
        lam = tr_half + disc
        dd = jnp.stack([cxy, lam - cxx], -1)
        # axis-aligned fallback when cxy ~ 0
        aa = jnp.where(
            (cxx >= cyy)[:, None],
            jnp.broadcast_to(jnp.asarray([1.0, 0.0]), (4, 2)),
            jnp.broadcast_to(jnp.asarray([0.0, 1.0]), (4, 2)),
        )
        dd = jnp.where((jnp.abs(cxy) > 1e-6)[:, None], dd, aa)
        dd = dd / jnp.maximum(jnp.linalg.norm(dd, axis=-1, keepdims=True), 1e-9)
        return c, dd, tot

    def intersect(c1, d1, c2, d2):
        """Intersection of lines (c1 + t·d1) and (c2 + s·d2)."""
        cross = d1[0] * d2[1] - d1[1] * d2[0]
        rhs = c2 - c1
        t = (rhs[0] * d2[1] - rhs[1] * d2[0]) / jnp.where(
            jnp.abs(cross) < 1e-6, jnp.inf, cross
        )
        return c1 + t * d1

    cs = corners.astype(jnp.float32)
    for _ in range(iters):
        c, d, tot = fit_lines(cs)
        # corner i = edge (i-1) ∩ edge i  (TL = left∩top, TR = top∩right, …)
        new = jnp.stack(
            [intersect(c[(i - 1) % 4], d[(i - 1) % 4], c[i], d[i]) for i in range(4)]
        )
        # guards: both edges need boundary support; don't jump implausibly far
        support = jnp.stack([(tot[(i - 1) % 4] > 1.0) & (tot[i] > 1.0) for i in range(4)])
        near = jnp.linalg.norm(new - cs, axis=-1) < 6.0
        good = support & near & jnp.all(jnp.isfinite(new), -1)
        cs = jnp.where(good[:, None], new, cs)
    return cs


@functools.partial(jax.jit, static_argnames=("out_hw",))
def extract_dewarped(
    frame: jnp.ndarray,
    corners: jnp.ndarray,
    out_hw: tuple[int, int] = (192, 128),
    expand_ratio: float = 0.05,
):
    """Perspective-rectify the card given [TL,TR,BR,BL] frame-space corners
    (od_export.py:95-110: getPerspectiveTransform + warpPerspective to
    (192,128) with 5% outward expansion)."""
    oh, ow = out_hw
    e = expand_ratio
    dst = jnp.asarray(
        [
            [ow * e, oh * e],
            [ow * (1 - e), oh * e],
            [ow * (1 - e), oh * (1 - e)],
            [ow * e, oh * (1 - e)],
        ],
        jnp.float32,
    )
    m = perspective_from_quads(corners.astype(jnp.float32), dst)
    return warp_perspective(frame, m, out_hw)


def refine_quad_from_crop(
    crop: jnp.ndarray,
    corners: jnp.ndarray,
    out_hw: tuple[int, int] = (192, 128),
    expand_ratio: float = 0.05,
    search_px: float = 9.0,
    max_move: float = 8.0,
):
    """FULL-RESOLUTION corner refinement in dewarped-crop space.

    Mask-based corners quantize to the proto grid (H/4): ~3 px there = ~12 px
    at frame res — the r1/r2 quad-error floor. But the dewarped crop ALREADY
    resamples the frame at full card resolution: if the corners were exact,
    the card's physical edges would sit exactly on the ``expand_ratio``
    margin lines of the crop. So measure where the edges actually are —
    image-gradient profiles reduced along each edge (two half-bands per edge
    → a line each), pure row/column reductions, NO gathers — intersect the
    four lines for corrected crop-space corners, and map them back to frame
    space through the known crop→frame homography.

    The reference has no equivalent (it trusts approxPolyN on the full-res
    ultralytics mask, od_export.py:75-88); this is the TPU-native route to
    sub-proto-grid corners without touching full-res masks.

    crop: (OH, OW, 3) float; corners: (4, 2) frame-space [TL,TR,BR,BL] that
    PRODUCED the crop. Returns refined (4, 2) frame-space corners; falls back
    per-edge when the gradient peak is weak/ambiguous, and clamps the total
    correction to ``max_move`` crop px.
    """
    oh, ow = out_hw
    e = expand_ratio
    gray = jnp.mean(crop.astype(jnp.float32), -1)
    # central-difference gradients (roll wrap rows/cols are outside every
    # search window — the windows live ≥1 px inside the border)
    gx = jnp.abs(jnp.roll(gray, -1, 1) - jnp.roll(gray, 1, 1))
    gy = jnp.abs(jnp.roll(gray, -1, 0) - jnp.roll(gray, 1, 0))

    xs = jnp.arange(ow, dtype=jnp.float32)
    ys = jnp.arange(oh, dtype=jnp.float32)

    def edge_offset(profile, coords, center, halfw, outward):
        """Outermost significant gradient peak inside [center±halfw].

        A card has TWO strong parallel lines near each edge (the physical
        edge and the inner frame line, often stronger) — a plain soft-argmax
        blends them and bites the inner line. Instead: threshold at half the
        window max, take the peak FARTHEST toward the crop border
        (``outward`` = −1 for left/top, +1 for right/bottom), then localize
        with a ±1.5 px local soft-argmax. Returns (position, peakiness)."""
        win = (jnp.abs(coords - center) <= halfw).astype(jnp.float32)
        p = profile * win
        peak = jnp.max(p)
        sig = (p >= 0.5 * peak).astype(jnp.float32)
        idx = jnp.argmax(sig * (outward * coords + 2.0 * halfw + center))
        c0 = coords[idx]
        local = p * (jnp.abs(coords - c0) <= 1.5)
        pos = jnp.sum(local * coords) / jnp.maximum(jnp.sum(local), 1e-6)
        mean_bg = jnp.sum(p) / jnp.maximum(jnp.sum(win), 1.0)
        return pos, peak / jnp.maximum(mean_bg, 1e-6)  # peakiness ratio

    # vertical edges (left at x≈e·W, right at x≈(1−e)·W): reduce |gx| over
    # two row half-bands → two points each; horizontal edges likewise
    y_in = ((ys > 0.15 * oh) & (ys < 0.85 * oh)).astype(jnp.float32)
    x_in = ((xs > 0.15 * ow) & (xs < 0.85 * ow)).astype(jnp.float32)
    y_hi = y_in * (ys < 0.5 * oh)
    y_lo = y_in * (ys >= 0.5 * oh)
    x_hi = x_in * (xs < 0.5 * ow)
    x_lo = x_in * (xs >= 0.5 * ow)

    def vline(x_center, band, outward):
        prof = jnp.einsum("hw,h->w", gx, band) / jnp.maximum(jnp.sum(band), 1.0)
        return edge_offset(prof, xs, x_center, search_px, outward)

    def hline(y_center, band, outward):
        prof = jnp.einsum("hw,w->h", gy, band) / jnp.maximum(jnp.sum(band), 1.0)
        return edge_offset(prof, ys, y_center, search_px, outward)

    yc_hi = jnp.sum(y_hi * ys) / jnp.maximum(jnp.sum(y_hi), 1.0)
    yc_lo = jnp.sum(y_lo * ys) / jnp.maximum(jnp.sum(y_lo), 1.0)
    xc_hi = jnp.sum(x_hi * xs) / jnp.maximum(jnp.sum(x_hi), 1.0)
    xc_lo = jnp.sum(x_lo * xs) / jnp.maximum(jnp.sum(x_lo), 1.0)

    min_peak = 1.6  # peak must stand out of its window to count as an edge

    def fit_v(x_center, outward):
        (xa, pa) = vline(x_center, y_hi, outward)
        (xb, pb) = vline(x_center, y_lo, outward)
        xa = jnp.where(pa > min_peak, xa, x_center)
        xb = jnp.where(pb > min_peak, xb, x_center)
        # line through (xa, yc_hi), (xb, yc_lo):  x(y) = x0 + slope·y
        slope = (xb - xa) / jnp.maximum(yc_lo - yc_hi, 1.0)
        x0 = xa - slope * yc_hi
        return x0, slope

    def fit_h(y_center, outward):
        (ya, pa) = hline(y_center, x_hi, outward)
        (yb, pb) = hline(y_center, x_lo, outward)
        ya = jnp.where(pa > min_peak, ya, y_center)
        yb = jnp.where(pb > min_peak, yb, y_center)
        slope = (yb - ya) / jnp.maximum(xc_lo - xc_hi, 1.0)
        y0 = ya - slope * xc_hi
        return y0, slope

    lx0, lsl = fit_v(e * ow, -1.0)
    rx0, rsl = fit_v((1 - e) * ow, 1.0)
    ty0, tsl = fit_h(e * oh, -1.0)
    by0, bsl = fit_h((1 - e) * oh, 1.0)

    def xsect(x0, xsl, y0, ysl):
        """x = x0 + xsl·y with y = y0 + ysl·x."""
        y = (y0 + ysl * x0) / jnp.maximum(1.0 - ysl * xsl, 1e-3)
        return jnp.stack([x0 + xsl * y, y])

    new_crop = jnp.stack(
        [
            xsect(lx0, lsl, ty0, tsl),  # TL
            xsect(rx0, rsl, ty0, tsl),  # TR
            xsect(rx0, rsl, by0, bsl),  # BR
            xsect(lx0, lsl, by0, bsl),  # BL
        ]
    )
    dst = jnp.asarray(
        [[ow * e, oh * e], [ow * (1 - e), oh * e],
         [ow * (1 - e), oh * (1 - e)], [ow * e, oh * (1 - e)]],
        jnp.float32,
    )
    move = jnp.linalg.norm(new_crop - dst, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, max_move / jnp.maximum(move, 1e-6))
    new_crop = dst + (new_crop - dst) * scale  # clamp runaway corrections
    # back-project: crop→frame homography = inverse of the dewarp's
    m = perspective_from_quads(corners.astype(jnp.float32), dst)
    m_inv = jnp.linalg.inv(m)
    out = apply_transform_points(m_inv, new_crop)
    ok = jnp.all(jnp.isfinite(out))
    return jnp.where(ok, out, corners)


def orient_batch(masks: jnp.ndarray):
    """(D, H, W) masks → ((D,4,2) corners, (D,) ok)."""
    return jax.vmap(orient_corners)(masks)


def enforce_quad_aspect(corners: jnp.ndarray, margin: float = 1.1) -> jnp.ndarray:
    """Roll 90°-mislabeled quads so the long axis maps to the crop height.

    Principal-axis mis-assignment repair: the mask-moment axis
    (orient_corners) can pick the card's SHORT axis on degraded/occluded
    masks. The extreme-point corners are the same 4 pixels either way (the
    ±diagonal score sets coincide under a 90° axis rotation), so the failure
    is pure LABELING — the dewarp then produces a sideways crop the encoder
    cannot match (measured: 3/12 headline failures with roll_best 1/3).
    Cards are physically ~1.4× taller than wide (print sheet geometry the
    reference also relies on, od_export.py:95-110 fixed 192×128 dst), so
    when the labeled top+bottom edges exceed ``margin``× the left+right
    edges, roll the labeling by one. The remaining 180° ambiguity is exactly
    what the flip-aware index (or dual-orientation match) resolves.

    corners (..., 4, 2) [TL,TR,BR,BL] → same shape.
    """
    top = jnp.linalg.norm(
        corners[..., 0, :] - corners[..., 1, :], axis=-1
    ) + jnp.linalg.norm(corners[..., 2, :] - corners[..., 3, :], axis=-1)
    side = jnp.linalg.norm(
        corners[..., 1, :] - corners[..., 2, :], axis=-1
    ) + jnp.linalg.norm(corners[..., 3, :] - corners[..., 0, :], axis=-1)
    swap = top > margin * side
    return jnp.where(
        swap[..., None, None], jnp.roll(corners, 1, axis=-2), corners
    )
