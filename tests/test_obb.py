"""infer.obb: oriented quad recovery from 3-class keypoint AABBs."""

import jax.numpy as jnp
import numpy as np

from mtgvision_tpu.infer.obb import obb_card_corners


def _rot(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.asarray([[c, -s], [s, c]])


def _card_dets(center, w, h, theta, score=0.9):
    """Analytic card/top/bottom AABBs for a rotated (w,h) rect — the obb
    dataset's GT geometry (scene_gen.obb_keypoints, margins ignored)."""
    r = _rot(theta)

    def quad(cx_lo, cy_lo, cx_hi, cy_hi):
        pts = np.asarray(
            [[cx_lo, cy_lo], [cx_hi, cy_lo], [cx_hi, cy_hi], [cx_lo, cy_hi]],
            np.float64,
        )
        pts = pts @ r.T + center
        return pts

    full = quad(-w / 2, -h / 2, w / 2, h / 2)
    top = quad(-w / 2, -h / 2, w / 2, 0.0)
    bot = quad(-w / 2, 0.0, w / 2, h / 2)

    def aabb(q):
        return [q[:, 0].min(), q[:, 1].min(), q[:, 0].max(), q[:, 1].max()]

    boxes = [aabb(full), aabb(top), aabb(bot)]
    return full, boxes


def test_obb_corners_recover_rotated_rect():
    w, h = 146.0, 204.0
    for theta in (0.0, 0.4, np.pi / 4, 1.2, np.pi / 2, 2.5, np.pi):
        full, boxes = _card_dets(np.asarray([300.0, 260.0]), w, h, theta)
        boxes = np.asarray(boxes + [[0, 0, 1, 1]] * 5, np.float32)  # pad slots
        scores = np.asarray([0.9, 0.8, 0.8, 0, 0, 0, 0, 0], np.float32)
        classes = np.asarray([0, 1, 2, 0, 0, 0, 0, 0], np.int32)
        valid = np.asarray([1, 1, 1, 0, 0, 0, 0, 0], bool)
        corners, ok, _ = obb_card_corners(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
            jnp.asarray(valid), max_cards=4,
        )
        corners, ok = np.asarray(corners), np.asarray(ok)
        assert ok[0] and not ok[1:].any()
        err = np.linalg.norm(corners[0] - full, axis=-1).mean()
        assert err < 8.0, f"theta={theta}: corner err {err:.1f}px"


def test_obb_corners_association_multi_card():
    """Two cards + a stray top box: each card associates with ITS OWN
    top/bottom (centers inside the card box), stray ignored."""
    f1, b1 = _card_dets(np.asarray([150.0, 150.0]), 140, 200, 0.3)
    f2, b2 = _card_dets(np.asarray([480.0, 300.0]), 140, 200, -1.0)
    boxes = np.asarray(b1 + b2 + [[600, 600, 630, 640]], np.float32)
    scores = np.asarray([0.9, 0.8, 0.8, 0.85, 0.7, 0.7, 0.95], np.float32)
    classes = np.asarray([0, 1, 2, 0, 1, 2, 1], np.int32)
    valid = np.ones(7, bool)
    corners, ok, _ = obb_card_corners(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(valid), max_cards=4,
    )
    corners, ok = np.asarray(corners), np.asarray(ok)
    assert ok[:2].all() and not ok[2:].any()
    # card slots sorted by score: slot0 = card1 (0.9), slot1 = card2 (0.85)
    assert np.linalg.norm(corners[0] - f1, axis=-1).mean() < 8.0
    assert np.linalg.norm(corners[1] - f2, axis=-1).mean() < 8.0


def test_obb_corners_missing_keypoint():
    """A card whose top box was never detected comes back ok=False."""
    _, b = _card_dets(np.asarray([200.0, 200.0]), 140, 200, 0.5)
    boxes = np.asarray([b[0], b[2]], np.float32)  # card + bottom only
    corners, ok, _ = obb_card_corners(
        jnp.asarray(boxes),
        jnp.asarray([0.9, 0.8], np.float32),
        jnp.asarray([0, 2], np.int32),
        jnp.asarray([1, 1], bool),
        max_cards=2,
    )
    assert not np.asarray(ok).any()
