"""Scene generator + polygon util tests (statistical placement validity,
label ranges — SURVEY.md §4 rebuild strategy)."""

import numpy as np
import pytest

from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
from mtgvision_tpu.data.scene_gen import (
    SceneGenerator,
    card_bbox,
    corner_jitter,
    cover_rotate_matrix,
    create_yolo_dataset,
    apply_m,
    obb_keypoints,
    place_card,
    seg_notch_polygon,
)
from mtgvision_tpu.ops.polygon import (
    clip_poly,
    convex_hull,
    poly_area,
    poly_contains,
    poly_intersection_area,
)


# -- polygon math -----------------------------------------------------------


def test_poly_area_square():
    sq = np.asarray([(0, 0), (10, 0), (10, 10), (0, 10)], float)
    assert poly_area(sq) == 100.0
    assert poly_area(sq[::-1]) == 100.0  # orientation-independent


def test_clip_poly_overlap():
    a = np.asarray([(0, 0), (10, 0), (10, 10), (0, 10)], float)
    b = np.asarray([(5, 5), (15, 5), (15, 15), (5, 15)], float)
    inter = clip_poly(a, b)
    assert np.isclose(poly_area(inter), 25.0)
    assert np.isclose(poly_intersection_area(a, b), 25.0)


def test_clip_poly_disjoint():
    a = np.asarray([(0, 0), (1, 0), (1, 1), (0, 1)], float)
    b = np.asarray([(5, 5), (6, 5), (6, 6), (5, 6)], float)
    assert poly_intersection_area(a, b) == 0.0


def test_contains():
    outer = np.asarray([(0, 0), (10, 0), (10, 10), (0, 10)], float)
    inner = np.asarray([(2, 2), (4, 2), (4, 4), (2, 4)], float)
    assert poly_contains(outer, inner)
    assert not poly_contains(inner, outer)


def test_convex_hull():
    pts = np.asarray([(0, 0), (10, 0), (10, 10), (0, 10), (5, 5)], float)
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert np.isclose(poly_area(hull), 100.0)


# -- card geometry ----------------------------------------------------------


def test_seg_notch_polygon():
    poly = seg_notch_polygon((100, 70))
    assert poly.shape == (8, 2)
    # area = full rect minus notch (0.2w × 0.5h)
    assert np.isclose(poly_area(poly), 70 * 100 - (0.2 * 70) * (0.5 * 100))


def test_obb_keypoints():
    kps = obb_keypoints((100, 70))
    assert kps.shape == (3, 4, 2)
    # top box upper half, bottom box lower half
    assert kps[1][:, 1].max() <= 51
    assert kps[2][:, 1].min() >= 49


def test_corner_jitter_bounded():
    rng = np.random.default_rng(0)
    pts = card_bbox((100, 70))
    out = corner_jitter(rng, pts, 0.3)
    center = pts.mean(0)
    r0 = np.linalg.norm(pts - center, axis=1)
    r1 = np.linalg.norm(out - center, axis=1)
    assert ((r1 >= 0.7 * r0 - 1e-9) & (r1 <= 1.3 * r0 + 1e-9)).all()


# -- placement (statistical validity) ---------------------------------------


def test_place_card_valid_placements():
    rng = np.random.default_rng(0)
    bg_hw = (640, 640)
    frame = np.asarray([(0, 0), (640, 0), (640, 640), (0, 640)], float)
    placed = []
    n_ok = 0
    for _ in range(20):
        m = place_card(rng, (448, 320), bg_hw, placed, max_attempts=10)
        if m is None:
            continue
        quad = apply_m(card_bbox((448, 320)), m)
        qa = poly_area(quad)
        # fully visible (min_visible_edge=1.0 default)
        assert poly_intersection_area(quad, frame) / qa > 0.99
        # pairwise overlap ≤ 50% of either card
        for p in placed:
            inter = poly_intersection_area(quad, convex_hull(p))
            assert inter / qa <= 0.5 + 1e-6
            assert inter / poly_area(p) <= 0.5 + 1e-6
        placed.append(quad)
        n_ok += 1
    assert n_ok >= 3  # rejection sampling succeeds a reasonable fraction


def test_cover_rotate_matrix_covers():
    rng = np.random.default_rng(0)
    for _ in range(5):
        m = cover_rotate_matrix(rng, (256, 256), (640, 640))
        # the warped input quad must contain the output frame
        quad = apply_m(np.asarray([(0, 0), (256, 0), (256, 256), (0, 256)], float), m)
        frame = np.asarray([(0, 0), (640, 0), (640, 640), (0, 640)], float)
        assert poly_contains(convex_hull(quad), frame, tol=1e-3)


# -- full generator ---------------------------------------------------------


@pytest.fixture(scope="module")
def gen():
    cat = ProceduralCatalog(n_cards=8, card_hw=(112, 80))
    return SceneGenerator(
        cat, ProceduralBackgrounds(bg_hw=(96, 96)), bg_size_hw=(160, 160),
        num_cards_min=1, num_cards_max=3, kind="seg", seed=0,
    )


def test_scene_sample(gen):
    s = gen.random()
    assert s["image"].shape == (160, 160, 3)
    assert np.isfinite(s["image"]).all()
    assert 0 <= s["image"].min() and s["image"].max() <= 1
    assert len(s["keypoints"]) == len(s["keypoints_labels"])
    for pts in s["keypoints"]:
        assert pts.shape == (8, 2)  # seg notch polygon


def test_scene_obb_labels():
    cat = ProceduralCatalog(n_cards=8, card_hw=(112, 80))
    g = SceneGenerator(
        cat, ProceduralBackgrounds(bg_hw=(96, 96)), bg_size_hw=(160, 160),
        num_cards_min=1, num_cards_max=2, kind="obb", seed=3,
    )
    s = g.random()
    if len(s["keypoints"]):
        assert len(s["keypoints"]) % 3 == 0  # card/top/bottom triplets
        assert set(np.unique(s["keypoints_labels"])) <= {0, 1, 2}


def test_yolo_dataset_writer(gen, tmp_path):
    yaml_path = create_yolo_dataset(gen, tmp_path / "ds", num_train=2, num_val=1)
    assert yaml_path.exists()
    imgs = list((tmp_path / "ds" / "images" / "train").glob("*.png"))
    lbls = list((tmp_path / "ds" / "labels" / "train").glob("*.txt"))
    assert len(imgs) == 2 and len(lbls) == 2
    for line in lbls[0].read_text().splitlines():
        vals = line.split()
        assert vals[0] == "0"
        coords = np.asarray([float(v) for v in vals[1:]])
        assert len(coords) == 16  # 8 points × 2
        assert (coords >= 0).all() and (coords <= 1).all()


def test_place_card_native_parity():
    """Native placement honors the same validity contract as the numpy path."""
    from mtgvision_tpu.utils import native

    native._load()
    if not native.HAVE_NATIVE:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    frame = np.asarray([(0, 0), (640, 0), (640, 640), (0, 640)], float)
    placed = []
    n_ok = 0
    for _ in range(20):
        m = place_card(rng, (448, 320), (640, 640), placed, use_native=True)
        if m is None:
            continue
        quad = apply_m(card_bbox((448, 320)), m)
        qa = poly_area(quad)
        assert poly_intersection_area(quad, frame) / qa > 0.99
        for p in placed:
            inter = poly_intersection_area(quad, convex_hull(p))
            assert inter / qa <= 0.5 + 1e-6
            assert inter / poly_area(p) <= 0.5 + 1e-6
        placed.append(quad)
        n_ok += 1
    assert n_ok >= 3


def test_place_card_native_speed():
    from mtgvision_tpu.utils import native
    import time

    native._load()
    if not native.HAVE_NATIVE:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    placed = []
    t0 = time.perf_counter()
    for _ in range(50):
        m = place_card(rng, (448, 320), (640, 640), placed, use_native=True)
        if m is not None and len(placed) < 8:
            placed.append(apply_m(card_bbox((448, 320)), m))
    dt_native = time.perf_counter() - t0
    rng = np.random.default_rng(1)
    placed = []
    t0 = time.perf_counter()
    for _ in range(50):
        m = place_card(rng, (448, 320), (640, 640), placed, use_native=False)
        if m is not None and len(placed) < 8:
            placed.append(apply_m(card_bbox((448, 320)), m))
    dt_py = time.perf_counter() - t0
    assert dt_native < dt_py  # native must actually be faster


def test_mask_contour_notched_card():
    """mask_contour traces the outer boundary of a notched card mask: area
    parity with the mask, all vertices on the boundary, notch indentation
    present (the raw ``polygon`` wire field, server.py:59-82)."""
    from mtgvision_tpu.ops.polygon import mask_contour, poly_area

    from tests.test_orient import render_notched_mask

    dst = np.asarray([(40, 30), (130, 42), (120, 165), (32, 150)], float)
    mask = render_notched_mask((200, 200), dst)
    pts = mask_contour(mask, max_pts=256)
    assert pts.shape[1] == 2 and len(pts) >= 8
    # polygon area ~ mask area
    assert abs(poly_area(pts) - mask.sum()) / mask.sum() < 0.05
    # every vertex sits on the mask boundary (a true pixel with a false 4-nbr)
    for x, y in pts[:: max(1, len(pts) // 32)]:
        xi, yi = int(round(x)), int(round(y))
        patch = mask[max(0, yi - 1) : yi + 2, max(0, xi - 1) : xi + 2]
        assert patch.min() == 0.0 and patch.max() == 1.0, (x, y)
    # the notch indents the contour vs the convex quad: some boundary point
    # lies well inside the quad's bottom edge region
    from mtgvision_tpu.ops.polygon import poly_intersection_area

    quad_area = poly_area(dst)
    assert poly_area(pts) < quad_area * 0.98


def test_mask_contour_empty_and_tiny():
    from mtgvision_tpu.ops.polygon import mask_contour

    assert mask_contour(np.zeros((8, 8))).shape == (0, 2)
    one = np.zeros((8, 8))
    one[3, 4] = 1.0
    pts = mask_contour(one)
    assert len(pts) == 4  # unit square around the pixel
    assert np.allclose(pts.mean(0), [4.0, 3.0], atol=0.6)


def test_mask_contour_max_pts():
    from mtgvision_tpu.ops.polygon import mask_contour

    big = np.zeros((128, 128))
    big[10:118, 12:116] = 1.0
    pts = mask_contour(big, max_pts=16)
    assert len(pts) <= 16


def test_place_card_small_frame_and_edge_coverage():
    """Placement must work when the frame is smaller than the NATIVE card
    (the proposal pad uses the scaled footprint) and card centers must cover
    the frame, not just its middle — both native and python samplers."""
    import numpy as np

    from mtgvision_tpu.data.scene_gen import apply_m, card_bbox, place_card

    chw = (448, 320)  # native card larger than the 320px frame
    for use_native in (True, False):
        rng = np.random.default_rng(3)
        centers = []
        n_ok = 0
        for _ in range(100):
            m = place_card(rng, chw, (320, 320), [], use_native=use_native)
            if m is None:
                continue
            n_ok += 1
            centers.append(apply_m(card_bbox(chw), m).mean(0))
        assert n_ok >= 90, n_ok
        c = np.asarray(centers)
        # centers span well beyond a central box
        assert c[:, 0].min() < 100 and c[:, 0].max() > 220
        assert c[:, 1].min() < 100 and c[:, 1].max() > 220


def test_place_card_native_small_frame_and_edge_coverage():
    """Regression for a stale native build: the pre-fix C++ sampler padded
    proposals by the NATIVE card diagonal, which places nothing at 320px
    frames and confines centers to a central box at 640px. The fixed sampler
    must place at small frame sizes and reach the frame edges."""
    from mtgvision_tpu.utils import native

    native._load()
    if not native.HAVE_NATIVE:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    n_ok = sum(
        place_card(rng, (448, 320), (320, 320), [], use_native=True) is not None
        for _ in range(50)
    )
    assert n_ok >= 25, f"native sampler placed only {n_ok}/50 at 320px"

    centers = []
    for _ in range(200):
        m = place_card(rng, (448, 320), (640, 640), [], use_native=True)
        if m is not None:
            centers.append(apply_m(card_bbox((448, 320)), m).mean(0))
    centers = np.asarray(centers)
    # pre-fix behavior: every center inside a ~90px-wide central box
    assert centers.min() < 200 and centers.max() > 440, (
        centers.min(),
        centers.max(),
    )


def test_scene_random_return_cards(gen):
    """return_cards=True exposes the placed (card, M) GT pairs, consistent
    with the keypoint labels (one seg polygon per placed card)."""
    s = gen.random(return_cards=True)
    assert "cards" in s
    assert len(s["cards"]) == len(s["keypoints"])
    for card, m in s["cards"]:
        quad = apply_m(card_bbox((112, 80)), m)
        assert np.isfinite(quad).all()
        assert quad[:, 0].min() > -160 and quad[:, 0].max() < 320


def test_occluded_frac_union():
    """Union semantics: stacked occluders must not double-count coverage."""
    from mtgvision_tpu.eval.e2e_eval import _occluded_frac

    quad = np.asarray([(0, 0), (100, 0), (100, 100), (0, 100)], float)
    cover = np.asarray([(-10, -10), (110, -10), (110, 110), (-10, 110)], float)
    half = np.asarray([(0, 0), (50, 0), (50, 100), (0, 100)], float)
    far = np.asarray([(500, 500), (600, 500), (600, 600), (500, 600)], float)
    assert _occluded_frac(quad, []) == 0.0
    assert _occluded_frac(quad, [far]) == 0.0
    assert _occluded_frac(quad, [cover]) == 1.0
    # the same half-covering quad twice: still 0.5, not 1.0
    f2 = _occluded_frac(quad, [half, half])
    assert abs(f2 - 0.5) < 0.05, f2
    # reversed winding must also count
    assert _occluded_frac(quad, [cover[::-1].copy()]) == 1.0
