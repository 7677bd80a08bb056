"""Native JPEG codec tests (builds the C++ lib; falls back to cv2 paths)."""

import numpy as np
import pytest

from mtgvision_tpu.utils import native


@pytest.fixture(scope="module")
def jpeg_bytes():
    rng = np.random.default_rng(0)
    # smooth content compresses predictably
    yy, xx = np.meshgrid(np.linspace(0, 1, 120), np.linspace(0, 1, 90), indexing="ij")
    img = (np.stack([yy, xx, (yy + xx) / 2], -1) * 255).astype(np.uint8)
    return native.encode_jpeg(img, quality=90), img


def test_native_builds():
    native._load()
    # the toolchain exists in this image, so the native path must come up
    assert native.HAVE_NATIVE, "native lib failed to build"


def test_decode_roundtrip(jpeg_bytes):
    data, img = jpeg_bytes
    out = native.decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 6  # q90 lossy


def test_decode_resize(jpeg_bytes):
    data, img = jpeg_bytes
    out = native.decode_jpeg_resize(data, (60, 45))
    assert out.shape == (60, 45, 3)
    # downsampled content still matches a naive downsample
    ref = img[::2, ::2]
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 20


def test_decode_batch(jpeg_bytes):
    data, _ = jpeg_bytes
    out, status = native.decode_jpeg_batch([data] * 5, (32, 32), threads=2)
    assert out.shape == (5, 32, 32, 3)
    assert (status == 0).all()
    assert np.allclose(out[0], out[4])


def test_decode_batch_bad_input(jpeg_bytes):
    data, _ = jpeg_bytes
    out, status = native.decode_jpeg_batch([data, b"not a jpeg"], (16, 16))
    assert status[0] == 0 and status[1] != 0


def test_decode_garbage_raises():
    with pytest.raises(ValueError):
        native.decode_jpeg(b"\x00\x01\x02garbage")


def test_encode_quality_ordering(jpeg_bytes):
    _, img = jpeg_bytes
    lo = native.encode_jpeg(img, quality=20)
    hi = native.encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    assert lo[:2] == b"\xff\xd8"  # JPEG SOI marker
