"""ctypes bindings for the native IO library (native/mtgv_native.cpp).

Auto-builds ``libmtgv_native.so`` with g++ on first use (no pybind11 in the
image; plain C ABI + ctypes). Every entry point has a pure-Python/cv2
fallback so the framework works without a toolchain; ``HAVE_NATIVE`` reports
which path is active.

API:
- ``decode_jpeg(data) -> (H,W,3) uint8``
- ``decode_jpeg_resize(data, hw) -> (h,w,3) uint8``  (fused DCT-scaled decode)
- ``encode_jpeg(rgb_u8, quality) -> bytes``
- ``decode_jpeg_batch(list[bytes], hw, threads) -> (N,h,w,3) uint8``
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "build" / "libmtgv_native.so"
_lib: Optional[ctypes.CDLL] = None
HAVE_NATIVE = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, HAVE_NATIVE
    if _lib is not None:
        return _lib
    try:
        # ALWAYS invoke make, not just when the .so is missing: make is
        # mtime-based, so this is a no-op when the binary is fresh and a
        # rebuild when any .cpp changed after the checked-in binary was
        # built (a stale committed .so once shipped the pre-fix placement
        # sampler for a day of runs). If make is unavailable but a binary
        # exists, fall through and load it.
        subprocess.run(
            ["make", "-s", "build/libmtgv_native.so"],
            cwd=_NATIVE_DIR, check=False, capture_output=True,
        )
        if not _SO.exists():
            raise FileNotFoundError(_SO)
        lib = ctypes.CDLL(str(_SO))
        lib.mtgv_decode_jpeg.restype = ctypes.c_int
        lib.mtgv_decode_jpeg_resize.restype = ctypes.c_int
        lib.mtgv_encode_jpeg.restype = ctypes.c_long
        lib.mtgv_decode_jpeg_batch.restype = ctypes.c_int
        lib.mtgv_place_card.restype = ctypes.c_int
        assert lib.mtgv_version() == 1
        _lib = lib
        HAVE_NATIVE = True
    except Exception:
        _lib = None
        HAVE_NATIVE = False
    return _lib


def decode_jpeg(data: bytes) -> np.ndarray:
    lib = _load()
    if lib is None:
        return _cv2_decode(data)
    buf = np.frombuffer(data, np.uint8)
    cap = 8192 * 8192 * 3
    out = np.empty(cap, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.mtgv_decode_jpeg(
        buf.ctypes.data_as(ctypes.c_char_p), len(data),
        out.ctypes.data_as(ctypes.c_char_p), cap,
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise ValueError(f"jpeg decode failed (rc={rc})")
    return out[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def decode_jpeg_resize(data: bytes, hw: tuple[int, int]) -> np.ndarray:
    lib = _load()
    th, tw = hw
    if lib is None:
        import cv2

        return cv2.resize(_cv2_decode(data), (tw, th), interpolation=cv2.INTER_AREA)
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((th, tw, 3), np.uint8)
    rc = lib.mtgv_decode_jpeg_resize(
        buf.ctypes.data_as(ctypes.c_char_p), len(data), th, tw,
        out.ctypes.data_as(ctypes.c_char_p),
    )
    if rc != 0:
        raise ValueError(f"jpeg decode failed (rc={rc})")
    return out


def encode_jpeg(rgb_u8: np.ndarray, quality: int = 50) -> bytes:
    lib = _load()
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    if lib is None:
        import cv2

        ok, enc = cv2.imencode(
            ".jpg", cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, quality],
        )
        return enc.tobytes()
    h, w = rgb_u8.shape[:2]
    cap = h * w * 3 + 4096
    out = np.empty(cap, np.uint8)
    size = lib.mtgv_encode_jpeg(
        rgb_u8.ctypes.data_as(ctypes.c_char_p), h, w, quality,
        out.ctypes.data_as(ctypes.c_char_p), cap,
    )
    if size < 0:
        raise ValueError(f"jpeg encode failed ({size})")
    return out[:size].tobytes()


def decode_jpeg_batch(
    datas: Sequence[bytes], hw: tuple[int, int], threads: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """→ ((N,h,w,3) uint8, (N,) int32 status — 0 = ok)."""
    lib = _load()
    th, tw = hw
    n = len(datas)
    if lib is None:
        out = np.zeros((n, th, tw, 3), np.uint8)
        status = np.zeros(n, np.int32)
        for i, d in enumerate(datas):
            try:
                out[i] = decode_jpeg_resize(d, hw)
            except Exception:
                status[i] = -1
        return out, status
    arrs = [np.frombuffer(d, np.uint8) for d in datas]
    ptrs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in arrs])
    lens = (ctypes.c_size_t * n)(*[len(d) for d in datas])
    out = np.empty((n, th, tw, 3), np.uint8)
    status = np.empty(n, np.int32)
    lib.mtgv_decode_jpeg_batch(
        ptrs, lens, n, th, tw,
        out.ctypes.data_as(ctypes.c_char_p),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        threads,
    )
    return out, status


def _cv2_decode(data: bytes) -> np.ndarray:
    import cv2

    bgr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    if bgr is None:
        raise ValueError("jpeg decode failed (cv2)")
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)


def place_card_native(
    rng,
    card_hw,
    bg_hw,
    existing,
    *,
    min_area_ratio=0.02,
    max_area_ratio=0.9,
    size_sample_mode="log_uniform",
    min_visible=0.5,
    min_visible_edge=1.0,
    no_contains=True,
    jitter_ratio=0.3,
    max_attempts=10,
):
    """Native rejection-sampling placement (native/mtgv_place.cpp); returns
    the (3,3) homography or None. Signature mirrors scene_gen.place_card."""
    lib = _load()
    if lib is None:
        return None  # caller falls back to the numpy path
    ex = (
        np.ascontiguousarray(np.stack(existing), np.float64)
        if existing
        else np.zeros((0, 4, 2), np.float64)
    )
    out_m = np.empty(9, np.float64)
    out_quad = np.empty(8, np.float64)
    rc = lib.mtgv_place_card(
        ctypes.c_double(card_hw[0]), ctypes.c_double(card_hw[1]),
        ctypes.c_double(bg_hw[0]), ctypes.c_double(bg_hw[1]),
        ex.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(ex),
        ctypes.c_double(min_area_ratio), ctypes.c_double(max_area_ratio),
        1 if size_sample_mode == "log_uniform" else 0,
        ctypes.c_double(min_visible), ctypes.c_double(min_visible_edge),
        1 if no_contains else 0,
        ctypes.c_double(jitter_ratio), int(max_attempts),
        ctypes.c_uint64(int(rng.integers(1, 2**63))),
        out_m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_quad.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 1:
        return None
    return out_m.reshape(3, 3)
