"""Draw/cv2-util parity tests."""

import numpy as np

from mtgvision_tpu.ops.draw import (
    draw_arrow,
    draw_poly,
    draw_text,
    expand_poly,
    flip_upright,
    image2base64,
    is_convex,
    lerp_color,
    poly_center,
)


def test_is_convex():
    sq = np.asarray([(0, 0), (10, 0), (10, 10), (0, 10)], float)
    assert is_convex(sq)
    concave = np.asarray([(0, 0), (10, 0), (5, 5), (10, 10), (0, 10)], float)
    assert not is_convex(concave)


def test_flip_upright():
    q = np.asarray([(10, 10), (0, 10), (0, 0), (10, 0)], float)  # ccw, odd start
    out = flip_upright(q)
    assert tuple(out[0]) == (0, 0)  # top-left first
    # clockwise in y-down coords
    x, y = out[:, 0], out[:, 1]
    assert 0.5 * np.sum(x * np.roll(y, -1) - y * np.roll(x, -1)) > 0


def test_expand_center():
    sq = np.asarray([(0, 0), (10, 0), (10, 10), (0, 10)], float)
    assert np.allclose(poly_center(sq), (5, 5))
    big = expand_poly(sq, 0.2)
    assert np.allclose(poly_center(big), (5, 5))
    assert big[0][0] < 0  # grew outward


def test_lerp_color():
    assert lerp_color((0, 0, 0), (1, 1, 1), 0.5) == (0.5, 0.5, 0.5)


def test_drawing_writes_pixels():
    img = np.zeros((32, 32, 3), np.float32)
    draw_poly(img, [(2, 2), (28, 2), (28, 28), (2, 28)], color=(0, 1, 0), thickness=1)
    assert img[2, 10, 1] == 1.0
    draw_arrow(img, (5, 5), (25, 25), color=(1, 0, 0))
    assert img.sum() > 0
    draw_text(img, (4, 4), "42", color=(1, 1, 1))
    assert (img == 1.0).any()


def test_image2base64():
    img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    s = image2base64(img)
    import base64

    raw = base64.b64decode(s)
    assert raw[:2] == b"\xff\xd8"  # JPEG
    s2 = image2base64(img, fmt="png")
    assert base64.b64decode(s2)[:4] == b"\x89PNG"


def test_file_utils(tmp_path):
    from mtgvision_tpu.utils.files import get_image_paths, imread_float, imwrite, init_dir

    # smooth gradient — JPEG obliterates white noise regardless of quality
    yy, xx = np.meshgrid(np.linspace(0, 1, 24), np.linspace(0, 1, 32), indexing="ij")
    img = np.stack([yy, xx, (yy + xx) / 2], -1).astype(np.float32)
    imwrite(tmp_path / "a/b.jpg", img)
    imwrite(tmp_path / "c.png", img)
    paths = get_image_paths(tmp_path)
    assert [p.name for p in paths] == ["b.jpg", "c.png"]
    back = imread_float(tmp_path / "c.png")
    assert back.shape == (24, 32, 3)
    assert np.abs(back - img).max() < 0.01  # png lossless (8-bit quantization)
    jback = imread_float(tmp_path / "a/b.jpg")
    assert np.abs(jback - img).mean() < 0.1
    d = init_dir(tmp_path / "x/y")
    assert d.is_dir()


def test_seed_all():
    import random

    from mtgvision_tpu.utils.random import seed_all

    k1 = seed_all(5)
    a, b = random.random(), np.random.rand()
    k2 = seed_all(5)
    assert (random.random(), np.random.rand()) == (a, b)
    assert (np.asarray(k1) == np.asarray(k2)).all()
